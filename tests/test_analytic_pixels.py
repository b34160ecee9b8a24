"""Closed-form pixel-exact rasterizer tests (VERDICT r2 next-step #7).

Unlike the oracle tests (which simulate the CUDA loop in numpy), every
expected value here is derived by hand from the published math of
forward.cu:74-113 (EWA cov2D), :219-232 (conic), and :345-375
(compositing recurrence + median 0.5-crossing), using nothing from
gaustudio_tpu.  A regression anywhere in preprocess, binning, or the
compositor shows up as a wrong number against an analytically-known one.

Conventions verified (all per the reference CUDA):
  pix(v, S)    = ((v + 1) * S - 1) / 2                (auxiliary.h ndc2Pix)
  cov2D        = J Vrk J^T + 0.3 I,  J the EWA Jacobian at t=(x,y,z)
  conic        = inverse(cov2D)
  alpha        = min(0.99, opacity * exp(-1/2 (a dx^2 + c dy^2) - b dx dy))
                 with dx = mean_x - px  (skipped if power > 0 or alpha < 1/255)
  C            = sum_i c_i alpha_i T_i,  T_{i+1} = T_i (1 - alpha_i)
  D            = sum_i z_i alpha_i T_i   (unnormalized expected depth)
  median       = first i with T_i > 0.5 and T_{i+1} < 0.5 ->
                 (z_i, alpha_i T_i) recorded
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaustudio_tpu.ops import rasterize
from gaustudio_tpu.ops.rasterize import RasterizeSettings

W = H = 32
TANX = TANY = 1.0
FOCAL_X = W / (2 * TANX)
FOCAL_Y = H / (2 * TANY)


def _settings(backend="xla"):
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / TANX
    P[1, 1] = 1 / TANY
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return RasterizeSettings(
        image_height=H, image_width=W, tanfovx=TANX, tanfovy=TANY,
        bg=jnp.zeros(3, jnp.float32), viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T), campos=jnp.zeros(3, jnp.float32),
        num_entries=4096, chunk=256, backend=backend,
    )


def _render(means, opac, colors, cov3d, backend="xla"):
    return rasterize.rasterize(
        jnp.asarray(means), jnp.asarray(opac), _settings(backend),
        colors_precomp=jnp.asarray(colors), cov3D_precomp=jnp.asarray(cov3d),
    )


def _pix(ndc, S):
    return ((ndc + 1.0) * S - 1.0) / 2.0


def _conic_centered(s, z):
    """Hand EWA for a gaussian on the optical axis with isotropic cov s^2 I:
    J = diag(fx/z, fy/z) -> cov2D = diag((fx s/z)^2 + .3, (fy s/z)^2 + .3)."""
    cxx = (FOCAL_X * s / z) ** 2 + 0.3
    cyy = (FOCAL_Y * s / z) ** 2 + 0.3
    return 1.0 / cxx, 0.0, 1.0 / cyy  # (a, b, c)


def _alpha(op, a, b, c, dx, dy):
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    if power > 0:
        return 0.0
    al = min(0.99, op * np.exp(power))
    return al if al >= 1.0 / 255.0 else 0.0


def test_single_gaussian_centered():
    z, s, op = 4.0, 0.5, 0.8
    color = np.array([0.9, 0.4, 0.1], np.float32)
    cov3d = np.array([[s * s, 0, 0, s * s, 0, s * s]], np.float32)
    out = _render([[0, 0, z]], [op], [color], cov3d)

    mx = _pix(0.0, W)  # 15.5
    my = _pix(0.0, H)
    a, b, c = _conic_centered(s, z)
    render = np.asarray(out["render"])
    depth = np.asarray(out["rendered_depth"])[0]
    fin_op = np.asarray(out["rendered_final_opacity"])[0]
    med_d = np.asarray(out["rendered_median_depth"])[0]
    med_w = np.asarray(out["rendered_median_weight"])[0]

    for px, py in [(15, 15), (16, 16), (15, 16), (12, 19), (10, 10), (0, 0)]:
        al = _alpha(op, a, b, c, mx - px, my - py)
        np.testing.assert_allclose(render[:, py, px], color * al,
                                   atol=2e-6, err_msg=f"pixel {px},{py}")
        np.testing.assert_allclose(depth[py, px], z * al, atol=1e-5)
        np.testing.assert_allclose(fin_op[py, px], al, atol=2e-6)
        if al > 0.5:  # T goes 1 -> <0.5: the median crossing records here
            np.testing.assert_allclose(med_d[py, px], z, atol=1e-5)
            np.testing.assert_allclose(med_w[py, px], al, atol=2e-6)
        else:
            assert med_w[py, px] == 0.0


def test_two_gaussian_compositing_recurrence():
    """Two on-axis gaussians, front-to-back: every accumulator of
    forward.cu:345-375 checked against the hand recurrence."""
    z1, z2 = 2.0, 5.0
    s1, s2 = 0.30, 0.9
    op1, op2 = 0.6, 0.9
    c1 = np.array([1.0, 0.0, 0.0], np.float32)
    c2 = np.array([0.0, 1.0, 0.0], np.float32)
    cov = lambda s: [s * s, 0, 0, s * s, 0, s * s]
    out = _render([[0, 0, z1], [0, 0, z2]], [op1, op2], [c1, c2],
                  np.array([cov(s1), cov(s2)], np.float32))

    mx, my = _pix(0.0, W), _pix(0.0, H)
    a1, b1, cc1 = _conic_centered(s1, z1)
    a2, b2, cc2 = _conic_centered(s2, z2)
    render = np.asarray(out["render"])
    depth = np.asarray(out["rendered_depth"])[0]
    fin_op = np.asarray(out["rendered_final_opacity"])[0]
    med_d = np.asarray(out["rendered_median_depth"])[0]
    med_w = np.asarray(out["rendered_median_id"] * 0 + out["rendered_median_weight"])[0]

    for px, py in [(15, 15), (16, 15), (13, 18), (8, 15), (15, 2)]:
        al1 = _alpha(op1, a1, b1, cc1, mx - px, my - py)
        al2 = _alpha(op2, a2, b2, cc2, mx - px, my - py)
        # front-to-back: gaussian 1 (z=2) then gaussian 2 (z=5)
        T0, T1 = 1.0, 1.0 - al1
        T2 = T1 * (1.0 - al2)
        C = c1 * al1 * T0 + c2 * al2 * T1
        D = z1 * al1 * T0 + z2 * al2 * T1
        np.testing.assert_allclose(render[:, py, px], C, atol=3e-6,
                                   err_msg=f"pixel {px},{py}")
        np.testing.assert_allclose(depth[py, px], D, atol=2e-5)
        np.testing.assert_allclose(fin_op[py, px], 1 - T2, atol=3e-6)
        # median: first crossing of T through 0.5
        if T0 > 0.5 and T1 < 0.5:
            exp_md, exp_mw = z1, al1 * T0
        elif T1 > 0.5 and T2 < 0.5:
            exp_md, exp_mw = z2, al2 * T1
        else:
            exp_md, exp_mw = None, 0.0
        if exp_md is not None:
            np.testing.assert_allclose(med_d[py, px], exp_md, atol=1e-5)
        np.testing.assert_allclose(med_w[py, px], exp_mw, atol=3e-6)


def test_off_center_anisotropic_gaussian():
    """Off-axis gaussian: the full EWA Jacobian including the -f t/z^2
    column and a correlated conic (b != 0) — forward.cu:74-113 by hand."""
    x, y, z = 0.8, -0.6, 3.0
    s1, s2, s3 = 0.4, 0.25, 0.55
    op = 0.85
    color = np.array([0.2, 0.5, 0.8], np.float32)
    cov3d = np.array([[s1 * s1, 0, 0, s2 * s2, 0, s3 * s3]], np.float32)
    out = _render([[x, y, z]], [op], [color], cov3d)

    # hand EWA: J rows (fx/z, 0, -fx x/z^2), (0, fy/z, -fy y/z^2)
    jxx, jxz = FOCAL_X / z, -(FOCAL_X * x) / (z * z)
    jyy, jyz = FOCAL_Y / z, -(FOCAL_Y * y) / (z * z)
    cov_xx = jxx * jxx * s1 * s1 + jxz * jxz * s3 * s3 + 0.3
    cov_yy = jyy * jyy * s2 * s2 + jyz * jyz * s3 * s3 + 0.3
    cov_xy = jxz * jyz * s3 * s3
    det = cov_xx * cov_yy - cov_xy * cov_xy
    a, b, c = cov_yy / det, -cov_xy / det, cov_xx / det
    assert abs(b) > 1e-4  # the test is only meaningful with correlation

    mx = _pix(x / (z * TANX), W)
    my = _pix(y / (z * TANY), H)
    render = np.asarray(out["render"])
    fin_op = np.asarray(out["rendered_final_opacity"])[0]
    px0, py0 = int(round(mx)), int(round(my))
    checked = 0
    for px, py in [(px0, py0), (px0 + 2, py0 - 1), (px0 - 3, py0 + 2),
                   (px0 + 1, py0 + 3)]:
        al = _alpha(op, a, b, c, mx - px, my - py)
        np.testing.assert_allclose(render[:, py, px], color * al, atol=1e-5,
                                   err_msg=f"pixel {px},{py}")
        np.testing.assert_allclose(fin_op[py, px], al, atol=1e-5)
        checked += al > 0
    assert checked >= 3  # the gaussian must actually cover the probes


def _two_entry_fixture():
    """Two on-axis isotropic splats covering one 16x16 tile, with every
    per-pixel quantity reachable by closed form. Entry 1 (z=2, front)
    crosses the 0.5-transmittance boundary at central pixels."""
    z = np.array([2.0, 5.0], np.float32)
    op = np.array([0.7, 0.6], np.float32)
    aa = np.array([0.16, 0.05], np.float32)  # isotropic conic diagonals
    mean = np.array([[7.5, 7.5], [8.5, 7.5]], np.float32)
    cols = np.array([[0.9, 0.2, 0.1], [0.1, 0.5, 0.8]], np.float32)
    bg = np.array([0.25, 0.5, 0.75], np.float32)
    return z, op, aa, mean, cols, bg


def _hand_grads(z, op, aa, mean, cols, bg, gC, gD, gT, gM):
    """Closed-form gradients of L = sum_px [gC.C + gD*D + gT*T_fin +
    gM*median_depth] w.r.t. (colors, depths, opacities), derived BY HAND
    from the published compositing math — no repo code involved.

    Forward (forward.cu:345-375): C = sum_i c_i a_i T_i with
    T_1 = 1, T_{i+1} = T_i (1 - a_i); D likewise with z_i; the median
    entry is the first with T_i > 0.5 and T_{i+1} < 0.5.
    Backward (backward.cu:566-569): the median cotangent adds DIRECTLY to
    the crossing entry's depth gradient (not through alpha);
    (backward.cu:584-587): every applied entry's alpha gradient gains
    -T_final / (1 - a_i) * dot(bg, gC) even though bg is not composited
    in the forward.
    """
    d_col = np.zeros((2, 3), np.float64)
    d_z = np.zeros(2, np.float64)
    d_op = np.zeros(2, np.float64)
    for py in range(16):
        for px in range(16):
            g = np.array([gc[py, px] for gc in gC])  # (3,)
            gd, gt, gm = gD[py, px], gT[py, px], gM[py, px]
            G1 = np.exp(-0.5 * aa[0] * ((mean[0, 0] - px) ** 2 + (mean[0, 1] - py) ** 2))
            G2 = np.exp(-0.5 * aa[1] * ((mean[1, 0] - px) ** 2 + (mean[1, 1] - py) ** 2))
            a1, a2 = op[0] * G1, op[1] * G2
            s1, s2 = a1 >= 1 / 255.0, a2 >= 1 / 255.0  # skip rule
            a1, a2 = a1 * s1, a2 * s2
            Tf = (1 - a1) * (1 - a2)
            bgdot = float(bg @ g)
            # colors: dC/dc_i = a_i T_i
            d_col[0] += g * a1
            d_col[1] += g * a2 * (1 - a1)
            # depths: expected-depth chain + the median routing rule
            cross1 = s1 and (1 - a1) < 0.5  # T_excl = 1 > 0.5 always
            cross2 = s2 and (1 - a1) > 0.5 and Tf < 0.5
            d_z[0] += gd * a1 + gm * cross1
            d_z[1] += gd * a2 * (1 - a1) + gm * cross2
            # alphas: dC/da, dD/da, dTf/da + the bg term; then da/dop = G
            if s1:
                dL_da1 = (g @ (cols[0] - cols[1] * a2)
                          + gd * (z[0] - z[1] * a2)
                          + gt * -(1 - a2)
                          - Tf / (1 - a1) * bgdot)
                d_op[0] += dL_da1 * G1
            if s2:
                dL_da2 = (g @ cols[1] * (1 - a1)
                          + gd * z[1] * (1 - a1)
                          + gt * -(1 - a1)
                          - Tf / (1 - a2) * bgdot)
                d_op[1] += dL_da2 * G2
    return d_col, d_z, d_op


def test_gradient_routing_median_and_bg_xla():
    """Analytic gradient vectors through the XLA golden backward: median
    cotangent routes to the crossing entry's depth; the bg term reaches
    every applied entry's opacity."""
    from gaustudio_tpu.ops import rasterize_ref

    z, op, aa, mean, cols, bg = _two_entry_fixture()
    rng = np.random.default_rng(11)
    gC = [rng.normal(size=(16, 16)).astype(np.float32) for _ in range(3)]
    gD = rng.normal(size=(16, 16)).astype(np.float32)
    gT = rng.normal(size=(16, 16)).astype(np.float32)
    gM = rng.normal(size=(16, 16)).astype(np.float32)

    K = 512
    gid = jnp.asarray(np.array([0, 1] + [0] * (K - 2), np.int32))
    tile = jnp.asarray(np.array([0, 0] + [1] * (K - 2), np.int32))
    valid = jnp.asarray(np.array([1, 1] + [0] * (K - 2), bool))
    tile_start = jnp.zeros((1,), jnp.int32)
    conic = jnp.asarray(np.stack([aa, np.zeros(2, np.float32), aa], 1))

    # cotangent images in tile-major (T+1, 256[, C]) layout, tile 0 only
    def tilemaj(img):
        return jnp.asarray(
            np.stack([img.reshape(-1), np.zeros(256, np.float32)]))

    ctC = jnp.stack([tilemaj(c) for c in gC], axis=-1)

    def loss(colors, depths, opac):
        out = rasterize_ref.composite(
            1, 1, 256, jnp.asarray(mean), conic, colors, depths, opac,
            jnp.asarray(bg), gid, tile, valid, tile_start,
        )
        return (jnp.sum(out.color * ctC)
                + jnp.sum(out.depth * tilemaj(gD))
                + jnp.sum(out.final_T * tilemaj(gT))
                + jnp.sum(out.median_depth * tilemaj(gM)))

    got = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(cols), jnp.asarray(z), jnp.asarray(op))
    want = _hand_grads(z, op, aa, mean, cols, bg, gC, gD, gT, gM)
    for name, a, b in zip(("colors", "depths", "opac"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_gradient_routing_median_and_bg_pallas_interpret():
    """The same analytic vectors through the full Pallas path: fast
    binning + Pallas forward + the Pallas reverse-walk backward kernel
    (interpret mode) + the entry-grad reduction."""
    from jax.experimental.pallas import tpu as pltpu

    from gaustudio_tpu.ops import binning_fast, gaussian, rasterize_pallas
    from gaustudio_tpu.ops import rasterize_pallas_bwd as BW

    z, op, aa, mean, cols, bg = _two_entry_fixture()
    rng = np.random.default_rng(12)
    gC = [rng.normal(size=(16, 16)).astype(np.float32) for _ in range(3)]
    gD = rng.normal(size=(16, 16)).astype(np.float32)
    gT = rng.normal(size=(16, 16)).astype(np.float32)
    gM = rng.normal(size=(16, 16)).astype(np.float32)

    two = lambda *vals: jnp.asarray(np.array(vals))
    pre = gaussian.Preprocessed(
        valid=jnp.asarray(np.array([True, True])),
        depths=jnp.asarray(z),
        means2d=jnp.asarray(mean),
        conic=jnp.asarray(np.stack([aa, np.zeros(2, np.float32), aa], 1)),
        opacities=jnp.asarray(op),
        colors=jnp.asarray(cols),
        radii=two(8, 8).astype(jnp.int32),
        rect_min=jnp.zeros((2, 2), jnp.int32),
        rect_max=jnp.ones((2, 2), jnp.int32),
        tiles_touched=two(1, 1).astype(jnp.int32),
    )
    with pltpu.force_tpu_interpret_mode():
        binned = jax.jit(
            lambda p: binning_fast.bin_gaussians_fast(p, 1, 1, 4096)
        )(pre)
        packed = jax.jit(
            lambda b: rasterize_pallas.composite_pallas(b, 1, 1)
        )(binned)
        ct_tiles = jnp.concatenate(
            [
                jnp.stack([jnp.asarray(c.reshape(1, -1)) for c in gC], 1),
                jnp.asarray(gD.reshape(1, 1, -1)),
                jnp.asarray(-gT.reshape(1, 1, -1)),  # dL/d(1-T) convention
                jnp.asarray(gM.reshape(1, 1, -1)),
                packed[:, 7:8, :],
                packed[:, 8:9, :],
            ],
            axis=1,
        )
        grad_blocks = jax.jit(
            lambda b, c: BW.composite_backward_pallas(b, c, jnp.asarray(bg),
                                                      1, 1)
        )(binned, ct_tiles)
        got = BW.reduce_entry_grads(grad_blocks, binned, 2)

    want = _hand_grads(z, op, aa, mean, cols, bg, gC, gD, gT, gM)
    np.testing.assert_allclose(np.asarray(got[2]), want[0], rtol=2e-4,
                               atol=2e-4, err_msg="colors")
    np.testing.assert_allclose(np.asarray(got[3]), want[1], rtol=2e-4,
                               atol=2e-4, err_msg="depths")
    np.testing.assert_allclose(np.asarray(got[4]), want[2], rtol=2e-4,
                               atol=2e-4, err_msg="opac")


def test_single_gaussian_centered_pallas_interpret():
    """The same closed-form scene through the full Pallas fast path
    (binning_fast + composite_fast) in TPU interpret mode."""
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    z, s, op = 4.0, 0.5, 0.8
    color = np.array([0.9, 0.4, 0.1], np.float32)
    cov3d = np.array([[s * s, 0, 0, s * s, 0, s * s]], np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _render([[0, 0, z]], [op], [color], cov3d, backend="pallas")
    mx, my = _pix(0.0, W), _pix(0.0, H)
    a, b, c = _conic_centered(s, z)
    render = np.asarray(out["render"])
    for px, py in [(15, 15), (16, 16), (12, 19)]:
        al = _alpha(op, a, b, c, mx - px, my - py)
        np.testing.assert_allclose(render[:, py, px], color * al, atol=2e-6)
