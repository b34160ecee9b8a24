"""Pallas fast path vs the XLA golden compositor (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops import binning, gaussian, rasterize_ref
from gaustudio_tpu.ops import binning_fast, rasterize_pallas
from tests.test_rasterize import _make_scene

_ON_TPU = jax.devices()[0].platform != "cpu"


def _interp():
    if _ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


@pytest.fixture(scope="module")
def preprocessed():
    s = _make_scene(n=60, seed=4, w=48, h=32)
    st = s["settings"]
    pre = gaussian.preprocess(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]),
        st.viewmatrix, st.projmatrix, st.campos,
        st.image_width, st.image_height, st.tanfovx, st.tanfovy,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    return pre, st


@pytest.mark.parametrize("num_tiles", [100, 1024, 2048])
def test_tile_ranges_matches_searchsorted(num_tiles):
    """Boundary-scan tile_ranges == searchsorted, including num_tiles that
    land the last bucket row past a non-8-multiple hi_dim (1024: the 8-row
    RMW window used to run out of the output block and, clamped by
    interpret mode, zeroed the tail positions)."""
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, num_tiles, size=4096)).astype(np.int32)
    with _interp():
        got = np.asarray(jax.jit(
            lambda k: binning_fast.tile_ranges(k, num_tiles)
        )(jnp.asarray(keys)))
    want = np.searchsorted(keys, np.arange(num_tiles + 1))
    np.testing.assert_array_equal(got, want)


def test_fast_binning_matches_reference(preprocessed):
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16
    ref = binning.bin_gaussians(pre, gx, gy, 4096)

    with _interp():
        fast = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)

    # ellipse/tile culling may drop sub-1/255 entries, never add any
    assert int(fast.num_rendered) <= int(ref.num_rendered)
    assert (np.asarray(fast.tile_count) <= np.asarray(ref.tile_count)).all()
    # per-tile gid sequences must be order-preserving subsequences of ref's
    ref_gid = np.asarray(ref.gauss_id)
    ref_start = np.asarray(ref.tile_start)
    ref_count = np.asarray(ref.tile_count)
    fast_count = np.asarray(fast.tile_count)
    flat = np.asarray(fast.flat_entries).T
    start = np.asarray(fast.tile_start)
    for t in range(gx * gy):
        cnt = fast_count[t]
        want = list(ref_gid[ref_start[t] : ref_start[t] + ref_count[t]])
        got = flat[start[t] : start[t] + cnt, 10].astype(np.int32)
        it = iter(want)
        assert all(g in it for g in got), f"tile {t}: not a subsequence"
        if cnt:
            assert (flat[start[t] : start[t] + cnt, 11] > 0.5).all()


def test_pallas_composite_matches_reference(preprocessed):
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    ref_bin = binning.bin_gaussians(pre, gx, gy, 4096)
    ref = rasterize_ref.composite(
        gx, gy, 256, pre.means2d, pre.conic, pre.colors, pre.depths,
        pre.opacities, jnp.zeros(3), ref_bin.gauss_id, ref_bin.tile_id,
        ref_bin.entry_valid, ref_bin.tile_start,
    )

    with _interp():
        packed, _ = jax.jit(
            lambda p: rasterize_pallas.rasterize_tiles_fast(p, gx, gy, 4096)
        )(pre)
    packed = np.asarray(packed).transpose(0, 2, 1)  # [T, 256, 16]

    T1 = gx * gy
    np.testing.assert_allclose(
        packed[:, :, 0:3], np.asarray(ref.color)[:T1], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        packed[:, :, 3], np.asarray(ref.depth)[:T1], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        packed[:, :, 4], np.asarray(ref.median_depth)[:T1], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        packed[:, :, 5], np.asarray(ref.median_weight)[:T1], rtol=2e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        packed[:, :, 6].astype(np.int32), np.asarray(ref.median_id)[:T1].astype(np.int32)
    )
    np.testing.assert_allclose(
        packed[:, :, 7], np.asarray(ref.final_T)[:T1], rtol=2e-4, atol=2e-5
    )
    # n_contrib counts positions within the (culled) per-tile list, so it can
    # only shrink; zero stays zero
    ref_nc = np.asarray(ref.n_contrib)[:T1]
    got_nc = packed[:, :, 8].astype(np.int32)
    assert (got_nc <= ref_nc).all()
    np.testing.assert_array_equal(got_nc == 0, ref_nc == 0)


def test_lean_modes_match_full(preprocessed, monkeypatch):
    """with_median=False / carry_slot=False keep color/depth/final_T
    bit-identical to the full pipeline (with f16 payload packing disabled);
    median rows keep their defaults."""
    monkeypatch.setattr(binning_fast, "PACK_F16", False)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    with _interp():
        full_bin = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
        full = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(b, gx, gy)
        )(full_bin)
        lean_bin = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(
                p, gx, gy, 4096, carry_gid=False, carry_slot=False
            )
        )(pre)
        lean = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(
                b, gx, gy, with_median=False
            )
        )(lean_bin)

    full_np, lean_np = np.asarray(full), np.asarray(lean)
    # rows 0-3 color+depth, 7 final_T, 8 n_contrib: identical
    np.testing.assert_array_equal(lean_np[:, 0:4], full_np[:, 0:4])
    np.testing.assert_array_equal(lean_np[:, 7:9], full_np[:, 7:9])
    # median rows stay at their init defaults
    assert (lean_np[:, 4] == rasterize_pallas.rasterize_pallas_median_default()).all()
    assert (lean_np[:, 5] == 0).all() and (lean_np[:, 6] == 0).all()
    # the lean binning still yields identical entry geometry
    np.testing.assert_array_equal(
        np.asarray(lean_bin.tile_count), np.asarray(full_bin.tile_count)
    )
    np.testing.assert_array_equal(
        np.asarray(lean_bin.flat_entries)[0:10],
        np.asarray(full_bin.flat_entries)[0:10],
    )


def test_power_dot3_extreme_coords():
    """_power_dot3 precision at the workload extremes: tile-local means up
    to ~2000 px (a tile at the far corner of a 1080p frame compositing a
    huge splat) and tiny splats with conics up to ~1. The 3-plane bf16
    plane-sum must stay within ~1e-3 absolute of the direct VPU power."""
    rng = np.random.default_rng(1)
    rows = 256
    qx = np.tile(np.arange(16, dtype=np.float32), 16)[None, :]
    qy = np.repeat(np.arange(16, dtype=np.float32), 16)[None, :]
    G = jnp.asarray(np.concatenate(
        [qx * qx, qy * qy, qx * qy, qx, qy, np.ones_like(qx),
         np.zeros_like(qx), np.zeros_like(qx)], axis=0
    ), jnp.bfloat16)

    # mixed population: huge far splats + tiny near splats
    far = rng.uniform(-2000, 2000, (rows // 2, 1)).astype(np.float32)
    near = rng.uniform(-20, 36, (rows // 2, 1)).astype(np.float32)
    mxl = np.concatenate([far, near]).astype(np.float32)
    myl = np.concatenate([near, far]).astype(np.float32)
    sig = np.where(np.abs(mxl) > 100, np.abs(mxl) / 3.0, rng.uniform(
        0.7, 8.0, (rows, 1))).astype(np.float32)
    ca = (1.0 / (sig * sig)).astype(np.float32)
    cc = (1.0 / (sig * sig) * rng.uniform(0.5, 2.0, (rows, 1))).astype(
        np.float32)
    cb = (0.3 * np.sqrt(ca * cc) * rng.uniform(-1, 1, (rows, 1))).astype(
        np.float32)

    got = np.asarray(rasterize_pallas._power_dot3(
        jnp.asarray(mxl), jnp.asarray(myl), jnp.asarray(ca), jnp.asarray(cb),
        jnp.asarray(cc), G))
    dx = mxl - qx
    dy = myl - qy
    want = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # only powers near the visible range matter (alpha floor 1/255 is
    # power ~ -5.5; anything below -12 composites to exactly 0 either way)
    m = want > -12.0
    assert m.any()
    np.testing.assert_allclose(got[m], want[m], atol=2e-3, rtol=0)


def test_need_grads_false_backward_raises(preprocessed):
    """Differentiating a need_grads=False render must fail loudly: the
    binning dropped the slot operand the backward reduction needs."""
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    def loss(colors):
        binned = binning_fast.bin_gaussians_fast(
            jax.tree.map(jax.lax.stop_gradient, pre), gx, gy, 4096,
            carry_slot=False,
        )
        out = rasterize_pallas.composite_fast(
            gx, gy, 256, True, False, pre.means2d, pre.conic, colors,
            pre.depths, pre.opacities, jnp.zeros(3), binned,
        )
        return jnp.sum(out.color ** 2)

    with _interp(), pytest.raises(ValueError, match="need_grads"):
        jax.grad(loss)(pre.colors)


@pytest.mark.slow
def test_comp_dot3_power_close(preprocessed, monkeypatch):
    """GS_COMP_DOT3: the 3-plane bf16 MXU power matmul matches the VPU
    power within ~1e-3 absolute on composited output."""
    monkeypatch.setattr(binning_fast, "PACK_F16", False)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    def run():
        with _interp():
            binned = jax.jit(
                lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
            )(pre)
            return np.asarray(
                jax.jit(
                    lambda b: rasterize_pallas.composite_pallas(b, gx, gy)
                )(binned)
            )

    monkeypatch.setattr(rasterize_pallas, "COMP_DOT3", False)
    exact = run()
    monkeypatch.setattr(rasterize_pallas, "COMP_DOT3", True)
    fast = run()
    # color/depth/median rows and final_T within a few bf16-plane ulps
    np.testing.assert_allclose(fast[:, 0:8], exact[:, 0:8], atol=4e-3, rtol=0)
    # n_contrib counts may flip only on alpha-threshold-boundary entries
    assert np.mean(fast[:, 8] != exact[:, 8]) < 0.05


def test_pack_f16_inference_close(preprocessed, monkeypatch):
    """With f16 payload packing ON (the inference default), color/depth
    differ from the exact pipeline only by f16 rounding (~2^-12 relative —
    far below the 1/255 8-bit output quantum)."""
    monkeypatch.setattr(binning_fast, "PACK_F16", True)
    monkeypatch.setattr(binning_fast, "PACK_GEO", False)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    with _interp():
        full_bin = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
        full = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(b, gx, gy)
        )(full_bin)
        lean_bin = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(
                p, gx, gy, 4096, carry_gid=False, carry_slot=False
            )
        )(pre)
        lean = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(
                b, gx, gy, with_median=False
            )
        )(lean_bin)

    full_np, lean_np = np.asarray(full), np.asarray(lean)
    # packing rounds opacity/rgb to f16: composited output stays within
    # a few f16 ulps of the exact pipeline (< 1/255)
    np.testing.assert_allclose(
        lean_np[:, 0:4], full_np[:, 0:4], atol=2.5e-3, rtol=0
    )
    np.testing.assert_allclose(
        lean_np[:, 7], full_np[:, 7], atol=2.5e-3, rtol=0
    )


def test_flat_mode_matches_aligned(preprocessed, monkeypatch):
    """The direct-from-flat compositor (inference: in-kernel roll, no
    realign pass) must be bit-identical to the aligned-blocks path — same
    entries, same order, same arithmetic."""
    monkeypatch.setattr(binning_fast, "PACK_F16", False)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16
    with _interp():
        b = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
        aligned = jax.jit(
            lambda bb: rasterize_pallas.composite_pallas(bb, gx, gy)
        )(b)
        flat = jax.jit(
            lambda bb: rasterize_pallas.composite_pallas(
                bb, gx, gy, use_flat=True
            )
        )(b)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(aligned))


def test_pack_geo_inference_close(preprocessed, monkeypatch):
    """GS_PACK_GEO additionally packs tile-relative means and scaled
    (conic_a, conic_b) pairs (6 payload operands). Bounded alpha error
    ~ |power| * 2^-11: composited color/depth/opacity must stay well
    inside the 8-bit output quantum vs the bit-exact pipeline."""
    monkeypatch.setattr(binning_fast, "PACK_F16", False)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    def run_lean():
        with _interp():
            b = jax.jit(
                lambda p: binning_fast.bin_gaussians_fast(
                    p, gx, gy, 4096, carry_gid=False, carry_slot=False
                )
            )(pre)
            return np.asarray(jax.jit(
                lambda bb: rasterize_pallas.composite_pallas(
                    bb, gx, gy, with_median=False
                )
            )(b))

    exact = run_lean()
    monkeypatch.setattr(binning_fast, "PACK_F16", True)
    monkeypatch.setattr(binning_fast, "PACK_GEO", True)
    packed = run_lean()
    # color (0:3) + final_T (7): < ~1.5 8-bit quanta; depth (3) is
    # value-scaled (alpha error ~0.5% scales with the depth accumulator)
    np.testing.assert_allclose(
        packed[:, 0:3], exact[:, 0:3], atol=6e-3, rtol=0
    )
    # depth: value-scaled, plus rare (<0.2%) alpha-threshold flips on
    # low-coverage pixels (an entry crossing the 1/255 skip boundary)
    d_err = np.abs(packed[:, 3] - exact[:, 3])
    d_tol = 6e-3 + 7e-3 * np.abs(exact[:, 3])
    assert np.mean(d_err > d_tol) < 2e-3
    assert d_err.max() < 0.05
    np.testing.assert_allclose(packed[:, 7], exact[:, 7], atol=6e-3, rtol=0)
    # bulk error far smaller: mean abs deviation below a tenth of a quantum
    assert np.mean(np.abs(packed[:, 0:3] - exact[:, 0:3])) < 4e-4


def test_packed_flat_matches_aligned_packed(preprocessed, monkeypatch):
    """The packed int32 flat table (inference default: sorted payload
    operands consumed verbatim, f16 halves decoded in-kernel) must be
    BIT-IDENTICAL to the aligned pipeline running with the same f16/geo
    packing: the f16 rounding happens once on the XLA side either way,
    the kernel decode is exact for normal halves, and tile-relative
    (dx - qx) equals the aligned kernel's (mx - px) exactly in f32."""
    monkeypatch.setattr(binning_fast, "PACK_F16", True)
    monkeypatch.setattr(binning_fast, "PACK_GEO", True)
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    with _interp():
        ab = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(
                p, gx, gy, 4096, carry_gid=True, carry_slot=False,
                realign=True,
            )
        )(pre)
        aligned = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(b, gx, gy)
        )(ab)
        pb = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(
                p, gx, gy, 4096, carry_gid=True, carry_slot=False,
                realign=False,
            )
        )(pre)
        assert pb.flat_entries.dtype == jnp.int32
        assert pb.flat_entries.shape[0] == 8
        flat = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(
                b, gx, gy, use_flat=True
            )
        )(pb)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(aligned))


def test_rasterize_inference_packed_close(preprocessed):
    """Top-level rasterize() inference (backend=pallas, need_grads=False →
    packed flat pipeline) matches the XLA golden within the documented
    f16-packing tolerance."""
    from gaustudio_tpu.ops import rasterize as R
    from tests.test_rasterize import _make_scene

    s = _make_scene(n=60, seed=4, w=48, h=32)
    st = s["settings"]._replace(
        num_entries=4096, backend="xla", need_grads=False
    )
    kw = dict(
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]),
        rotations=jnp.asarray(s["quats"]),
    )
    ref = R.rasterize(jnp.asarray(s["means"]), jnp.asarray(s["opac"]),
                      st, **kw)
    with _interp():
        got = jax.jit(
            lambda m, o: R.rasterize(
                m, o, st._replace(backend="pallas"), **kw
            )
        )(jnp.asarray(s["means"]), jnp.asarray(s["opac"]))
    np.testing.assert_allclose(
        np.asarray(got["render"]), np.asarray(ref["render"]), atol=7e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["rendered_final_opacity"]),
        np.asarray(ref["rendered_final_opacity"]), atol=7e-3,
    )


def test_train_mode_grads_match_full(preprocessed):
    """with_median=False + carry_gid=False (the training config) leaves
    gradients of a color-only loss unchanged."""
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16
    bg = jnp.zeros(3)

    def loss(colors, opac, with_median):
        binned = binning_fast.bin_gaussians_fast(
            jax.tree.map(jax.lax.stop_gradient, pre), gx, gy, 4096,
            carry_gid=with_median,
        )
        out = rasterize_pallas.composite_fast(
            gx, gy, 256, with_median, True, pre.means2d, pre.conic, colors,
            pre.depths, opac, bg, binned,
        )
        return jnp.sum(out.color ** 2) + jnp.sum(out.final_T)

    with _interp():
        gf = jax.jit(jax.grad(lambda c, o: loss(c, o, True), argnums=(0, 1)))(
            pre.colors, pre.opacities
        )
        gl = jax.jit(jax.grad(lambda c, o: loss(c, o, False), argnums=(0, 1)))(
            pre.colors, pre.opacities
        )
    for a, b in zip(gf, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_dot3_select_matches_highest(preprocessed, monkeypatch):
    """3-plane bf16 one-hot select: integer rows exact, float rows <=1ulp."""
    pre, st = preprocessed
    gx = (st.image_width + 15) // 16
    gy = (st.image_height + 15) // 16

    with _interp():
        ref = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)
        monkeypatch.setattr(binning_fast, "SELECT_DOT3", True)
        got = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, gx, gy, 4096)
        )(pre)

    np.testing.assert_array_equal(
        np.asarray(got.sorted_tile), np.asarray(ref.sorted_tile)
    )
    np.testing.assert_array_equal(
        np.asarray(got.tile_count), np.asarray(ref.tile_count)
    )
    ref_f, got_f = np.asarray(ref.flat_entries), np.asarray(got.flat_entries)
    # integer rows (gid/valid/slot) bit-exact
    np.testing.assert_array_equal(got_f[10:13], ref_f[10:13])
    # float attr rows within ~1ulp of the HIGHEST select
    np.testing.assert_allclose(got_f[0:10], ref_f[0:10], rtol=3e-7, atol=1e-30)
