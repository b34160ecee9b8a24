"""Pallas backward compositor vs the XLA reverse-walk backward (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops import binning_fast, gaussian, rasterize_pallas
from gaustudio_tpu.ops import rasterize_pallas_bwd as BW
from gaustudio_tpu.ops import rasterize_ref
from tests.test_rasterize import _make_scene

_ON_TPU = jax.devices()[0].platform != "cpu"


def _interp():
    if _ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("bwd_dot3", [False, True])
def test_pallas_backward_matches_xla_reverse_walk(monkeypatch, bwd_dot3):
    monkeypatch.setattr(BW, "BWD_DOT3", bwd_dot3)
    s = _make_scene(n=60, seed=4, w=48, h=32)
    st = s["settings"]
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16
    T1 = gx * gy + 1
    pre = gaussian.preprocess(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]),
        st.viewmatrix, st.projmatrix, st.campos,
        st.image_width, st.image_height, st.tanfovx, st.tanfovy,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    rng = np.random.default_rng(0)
    bg = jnp.asarray([0.2, 0.4, 0.1], jnp.float32)

    with _interp():
        binned = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
        packed = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(b, gx, gy)
        )(binned)

    # random cotangents on color/depth/median/finalT
    ct = rasterize_ref.CompositeOut(
        color=jnp.asarray(rng.normal(size=(T1, 256, 3)).astype(np.float32)),
        depth=jnp.asarray(rng.normal(size=(T1, 256)).astype(np.float32)),
        median_depth=jnp.asarray(rng.normal(size=(T1, 256)).astype(np.float32)),
        median_weight=jnp.zeros((T1, 256), jnp.float32),
        median_id=jnp.zeros((T1, 256), jnp.float32),
        final_T=jnp.asarray(rng.normal(size=(T1, 256)).astype(np.float32)),
        n_contrib=jnp.zeros((T1, 256), jnp.int32),
    )

    # XLA reverse walk (reference implementation of the gradient)
    from gaustudio_tpu.ops.binning_fast import compat_arrays

    gid, tile, valid, tile_start = compat_arrays(binned, gx, gy)
    final_T_t1 = rasterize_pallas._packed_to_tilemajor(packed, gx * gy).final_T
    nc_t1 = rasterize_pallas._packed_to_tilemajor(packed, gx * gy).n_contrib
    res = (pre.means2d, pre.conic, pre.colors, pre.depths, pre.opacities, bg,
           gid, tile, valid, tile_start, final_T_t1, nc_t1)
    want = rasterize_ref._composite_bwd(gx, gy, 256, res, ct)

    # Pallas backward
    ct_tiles = jnp.concatenate(
        [
            ct.color[:-1].transpose(0, 2, 1),
            ct.depth[:-1][:, None, :],
            -ct.final_T[:-1][:, None, :],
            ct.median_depth[:-1][:, None, :],
            packed[:, 7:8, :],
            packed[:, 8:9, :],
        ],
        axis=1,
    )
    # NB: dO = -d(final_T) convention handled by caller; here ct.final_T is
    # the raw final_T cotangent, so dO = -ct.final_T
    with _interp():
        grad_blocks = jax.jit(
            lambda b, c: BW.composite_backward_pallas(b, c, bg, gx, gy)
        )(binned, ct_tiles)
        got = BW.reduce_entry_grads(grad_blocks, binned, pre.means2d.shape[0])

    names = ["means2d", "conic", "colors", "depths", "opac"]
    # dot3 mode: 3-plane bf16 power/moments leave ~1e-4-scale residuals
    atol = 2e-4 if bwd_dot3 else 2e-5
    for name, a, b in zip(names, got, want[:5]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-3, atol=atol,
                                   err_msg=name)


def test_segreduce_dot3_matches_highest(monkeypatch):
    """dot3-mode segment reduce == HIGHEST-mode within ~1ulp."""
    s = _make_scene(n=60, seed=7, w=48, h=32)
    st = s["settings"]
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16
    pre = gaussian.preprocess(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]),
        st.viewmatrix, st.projmatrix, st.campos,
        st.image_width, st.image_height, st.tanfovx, st.tanfovy,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    rng = np.random.default_rng(3)
    with _interp():
        binned = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
    K = binned.flat_entries.shape[1]
    grads_flat = jnp.asarray(rng.normal(size=(16, K)).astype(np.float32))

    with _interp():
        ref = jax.jit(
            lambda g, b: BW.reduce_entry_grads(g, b, pre.means2d.shape[0])
        )(grads_flat, binned)
        monkeypatch.setattr(binning_fast, "SELECT_DOT3", True)
        got = jax.jit(
            lambda g, b: BW.reduce_entry_grads(g, b, pre.means2d.shape[0])
        )(grads_flat, binned)

    for a, b in zip(got, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=1e-6, atol=3e-7)
