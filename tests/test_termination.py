"""Sticky-termination regression tests (forward.cu:361-365 ``done`` flag).

The compositors carry T as the last APPLIED transmittance (always >= eps).
Before the sticky ``alive`` flag, a pixel whose raw cumulative product
crossed eps inside one 256-entry Pallas block (or one XLA chunk) would
RESURRECT at the next block boundary and keep compositing — inflating
n_contrib past a stretch of entries the forward skipped. The backward
trusts n_contrib and folds those skipped entries' 1/(1-alpha) factors into
its transmittance reconstruction; with opaque entries in the stretch this
amplified gradients by 100x-10000x (the r3 at-scale training blow-up:
escaped rows clustered in dense saturated regions).

The scene here is engineered to trip exactly that: a single tile whose
transmittance crosses 1e-4 around entry ~150 under small-alpha entries,
followed by OPAQUE entries spanning the 256-entry block boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops import rasterize
from gaustudio_tpu.ops.rasterize import RasterizeSettings

_ON_TPU = jax.devices()[0].platform != "cpu"


def _interp():
    if _ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def _saturating_scene(n=320):
    """n broad gaussians over a single 16x16-pixel tile, engineered to trip
    the pre-fix resurrection: alpha-0.3 entries cross T=1e-4 around entry
    ~26 (inside block 0), a long OPAQUE stretch follows (skipped while
    dead, spanning the 256-entry block boundary), then tiny-alpha entries
    that a resurrected pixel WOULD apply (T_carry*(1-0.008) stays >= eps)
    — dragging n_contrib past the skipped opaque stretch, which the
    nc-trusting backward then folds into its 1/(1-alpha) reconstruction."""
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(2.0, 4.0, n)  # strictly increasing depth
    # broad, isotropic: sigma_pix >> 16 so alpha ~= op across the tile
    scales = np.full((n, 3), 8.0, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    # crossing at ~entry 26 (0.7^26 < 1e-4); opaque stretch ENTIRELY inside
    # block 0 (a resurrected block restarts its prefix product, so entries
    # can only be wrongly applied if the new block opens with tiny alphas);
    # the 0.008 tail straddles the boundary: pre-fix, block 1's restart
    # from T_carry ~ 1.34e-4 applies ~36 of them (0.992^36 ~ 0.75)
    opac = np.full(n, 0.3, np.float32)
    opac[30:250] = 0.97
    opac[250:] = 0.008
    colors = np.linspace(0.1, 0.9, n * 3).astype(np.float32).reshape(n, 3)

    tanx = tany = 0.7
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanx
    P[1, 1] = 1 / tany
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return means, scales, quats, opac, colors, W2V, P


def _settings(chunk):
    means, scales, quats, opac, colors, W2V, P = _saturating_scene()
    s = RasterizeSettings(
        image_height=16, image_width=16, tanfovx=0.7, tanfovy=0.7,
        bg=jnp.zeros(3, jnp.float32),
        viewmatrix=jnp.asarray(W2V.T), projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.zeros(3, jnp.float32), num_entries=4096, chunk=chunk,
    )
    return means, scales, quats, opac, colors, s


def _grads(backend, chunk=256):
    means, scales, quats, opac, colors, s = _settings(chunk)
    s = s._replace(backend=backend)

    def loss(m, o):
        out = rasterize.rasterize(
            jnp.asarray(m), jnp.asarray(o), s,
            colors_precomp=jnp.asarray(colors),
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
        )
        img = out["render"]
        wts = jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape)
        return jnp.sum(img * (1.0 + 0.01 * wts)) + jnp.sum(
            out["rendered_final_opacity"]
        )

    return jax.grad(loss, argnums=(0, 1))(means, opac)


def test_saturated_grads_match_across_backends():
    """Pallas fwd residuals + reverse-walk bwd vs the self-consistent XLA
    golden; pre-fix the block-boundary resurrect amplified these ~100x."""
    with _interp():
        g_m_p, g_o_p = jax.tree.map(np.asarray, _grads("pallas"))
    g_m_x, g_o_x = jax.tree.map(np.asarray, _grads("xla"))
    ref = max(np.abs(g_m_x).max(), 1e-8)
    assert np.abs(g_m_p - g_m_x).max() / ref < 2e-3, (
        f"means grads diverge: pallas |max| {np.abs(g_m_p).max():.4g} "
        f"vs xla {np.abs(g_m_x).max():.4g}"
    )
    refo = max(np.abs(g_o_x).max(), 1e-8)
    assert np.abs(g_o_p - g_o_x).max() / refo < 2e-3


def test_saturated_grads_chunk_invariant():
    """Termination semantics must not depend on the XLA chunk size (the
    chunk boundary was the XLA path's resurrect point)."""
    g128 = _grads("xla", chunk=128)
    g512 = _grads("xla", chunk=512)
    for a, b in zip(g128, g512):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_saturated_forward_matches_oracle_nc():
    """n_contrib from both backends equals the sticky-done walk's count."""
    means, scales, quats, opac, colors, s = _settings(256)

    outs = {}
    for backend in ("xla", "pallas"):
        with _interp():
            outs[backend] = rasterize.rasterize(
                jnp.asarray(means), jnp.asarray(opac),
                s._replace(backend=backend),
                colors_precomp=jnp.asarray(colors),
                scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            )
    nc_x = np.asarray(outs["xla"]["n_contrib"])
    nc_p = np.asarray(outs["pallas"]["n_contrib"])
    # identical termination points (same alpha stream, same semantics);
    # allow a couple entries of slack for f32 rounding at the eps boundary
    assert np.abs(nc_x - nc_p).max() <= 2, (nc_x.max(), nc_p.max())
    # termination happened in the alpha-0.3 prefix: the opaque stretch
    # (entries >= 30) must never have been composited
    assert nc_x.max() <= 30
    assert nc_p.max() <= 30
    np.testing.assert_allclose(
        np.asarray(outs["xla"]["render"]),
        np.asarray(outs["pallas"]["render"]), rtol=1e-4, atol=1e-4,
    )
