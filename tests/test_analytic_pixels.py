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
