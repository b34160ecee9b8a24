"""Closed-form pixel-exact 2DGS SURFEL tests (VERDICT r4 next-step #7).

Counterpart of test_analytic_pixels.py for the ray-splat kernel: every
expected value is derived independently from the published 2DGS math (the
two-plane / ray-plane intersection of "2D Gaussian Splatting for
Geometrically Accurate Radiance Fields" and the reference decode in
gaustudio/renderers/surfel_renderer.py:96-117), using nothing from
gaustudio_tpu.  The intersection (u, v) is recovered by solving the 3x3
ray-plane system  c + u t_u + v t_v = lam d  per pixel with numpy — the
homography/cross-product construction the kernel uses
(ops/rasterize_surfel.py:175-210) is mathematically the same map, so a
regression in M / Dk / the hu x hv compositor shows up against an
analytically-known number.

Conventions verified (reference diff-surfel-rasterization semantics):
  ray through pixel p: ndc = (2 p + 1)/S - 1, d = (ndc_x tanx, ndc_y tany, 1)
  rho3d = u^2 + v^2 at the intersection; rho2d = |pc - p|^2 / 2 (2D filter)
  G = exp(-0.5 min(rho3d, rho2d)); alpha = min(0.99, op G), >= 1/255 gate
  depth = lam on the 3D branch (= Dk . (u, v, 1)), CENTER depth on the 2D
  branch; behind-camera intersections contribute nothing
  compositing, median 0.5-crossing, sticky termination: as forward.cu
  distortion accumulators: m1 = sum w depth, m2 = sum w depth^2
  normal buffer: sum w n_view (view-space; world decode is the renderer's)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops import rasterize_surfel as RS
from gaustudio_tpu.ops.rasterize import RasterizeSettings

W = H = 32
TANX = TANY = 1.0

_TERM_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99
_NEAR = 0.2


def _settings(backend="xla", need_grads=False):
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
        num_entries=4096, chunk=256, backend=backend, need_grads=need_grads,
    )


# --- the hand scene: one tilted + one fronto-parallel surfel --------------

def _quat_about_y(theta):
    return np.array([np.cos(theta / 2), 0.0, np.sin(theta / 2), 0.0],
                    np.float32)


_SCENE = dict(
    centers=np.array([[0.15, -0.1, 4.0], [0.2, -0.1, 7.0]], np.float32),
    quats=np.stack([_quat_about_y(0.5), np.array([1, 0, 0, 0], np.float32)]),
    scales=np.array([[1.2, 1.5], [2.5, 2.0]], np.float32),
    opac=np.array([0.8, 0.9], np.float32),
    colors=np.array([[0.9, 0.2, 0.1], [0.1, 0.3, 0.8]], np.float32),
)


def _rotmat(q):
    """Independent (w,x,y,z) quaternion -> rotation matrix (standard
    published formula, float64)."""
    w, x, y, z = (np.float64(v) for v in q / np.linalg.norm(q))
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _expected_buffers():
    """Per-pixel hand composite of the two surfels (float64 numpy)."""
    n = len(_SCENE["centers"])
    # per-surfel frames
    tu, tv, nrm, cen = [], [], [], []
    for i in range(n):
        R = _rotmat(_SCENE["quats"][i])
        tu.append(R[:, 0] * _SCENE["scales"][i][0])
        tv.append(R[:, 1] * _SCENE["scales"][i][1])
        nrm.append(R[:, 2])
        cen.append(np.float64(_SCENE["centers"][i]))

    px = np.arange(W)[None, :].repeat(H, 0)
    py = np.arange(H)[:, None].repeat(W, 1)
    ndc_x = (2.0 * px + 1) / W - 1
    ndc_y = (2.0 * py + 1) / H - 1
    d = np.stack([ndc_x * TANX, ndc_y * TANY, np.ones_like(ndc_x)], -1)

    alphas = np.zeros((n, H, W))
    depths = np.zeros((n, H, W))
    for i in range(n):
        # solve c + u t_u + v t_v = lam d  ->  [t_u t_v -d] (u,v,lam)^T = -c
        A = np.broadcast_to(
            np.stack([tu[i], tv[i]], -1), (H, W, 3, 2))
        A = np.concatenate([A, -d[..., None]], axis=-1)
        uvl = np.linalg.solve(
            A, np.broadcast_to(-cen[i], (H, W, 3))[..., None])[..., 0]
        u, v, lam = uvl[..., 0], uvl[..., 1], uvl[..., 2]
        rho3d = u * u + v * v
        # projected center + 2D filter
        pcx = ((cen[i][0] / (cen[i][2] * TANX)) + 1) * W / 2 - 0.5
        pcy = ((cen[i][1] / (cen[i][2] * TANY)) + 1) * H / 2 - 0.5
        rho2d = ((pcx - px) ** 2 + (pcy - py) ** 2) / 2.0
        use3d = rho3d <= rho2d
        G = np.exp(-0.5 * np.minimum(rho3d, rho2d))
        al = np.minimum(_ALPHA_MAX, _SCENE["opac"][i] * G)
        al = np.where(al < _ALPHA_MIN, 0.0, al)
        dep = np.where(use3d, lam, cen[i][2])
        al = np.where(dep > _NEAR, al, 0.0)
        alphas[i], depths[i] = al, dep

    # sequential front-to-back in CENTER-depth order (the binning sort key)
    order = np.argsort([c[2] for c in cen])
    out = dict(
        render=np.zeros((H, W, 3)), depth_sum=np.zeros((H, W)),
        normal=np.zeros((H, W, 3)), med_d=np.zeros((H, W)),
        med_w=np.zeros((H, W)), med_i=np.zeros((H, W)),
        m1=np.zeros((H, W)), m2=np.zeros((H, W)), T=np.ones((H, W)),
    )
    alive = np.ones((H, W), bool)
    for i in order:
        al, dep = alphas[i], depths[i]
        T_exc = out["T"]
        T_inc = T_exc * (1 - al)
        applied = (T_inc >= _TERM_EPS) & alive & (al > 0)
        w = np.where(applied, al * T_exc, 0.0)
        out["render"] += w[..., None] * _SCENE["colors"][i]
        out["depth_sum"] += w * dep
        out["normal"] += w[..., None] * nrm[i]
        out["m1"] += w * dep
        out["m2"] += w * dep * dep
        cross = applied & (T_exc > 0.5) & (T_inc < 0.5)
        out["med_d"] = np.where(cross, dep, out["med_d"])
        out["med_w"] = np.where(cross, w, out["med_w"])
        out["med_i"] = np.where(cross, i, out["med_i"])
        out["T"] = np.where(applied, T_inc, out["T"])
        alive &= (T_exc * (1 - al)) >= _TERM_EPS
    return out


def _render_repo(backend="xla", need_grads=False):
    return RS.rasterize_surfels(
        jnp.asarray(_SCENE["centers"]), jnp.asarray(_SCENE["opac"]),
        _settings(backend, need_grads),
        scales=jnp.asarray(_SCENE["scales"]),
        rotations=jnp.asarray(_SCENE["quats"]),
        colors_precomp=jnp.asarray(_SCENE["colors"]),
    )


def _check(out, exp, atol=2e-4, m2_rtol=1e-7):
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out["render"]), 0, -1), exp["render"],
        atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["rendered_depth_sum"])[0], exp["depth_sum"],
        atol=5 * atol)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out["rendered_normal_view"]), 0, -1),
        exp["normal"], atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["rendered_alpha"])[0], 1.0 - exp["T"], atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["rendered_dist_m1"])[0], exp["m1"], atol=5 * atol)
    np.testing.assert_allclose(
        np.asarray(out["rendered_dist_m2"])[0], exp["m2"], atol=3e-3,
        rtol=m2_rtol)  # m2 ~ depth^2 amplifies the f16 slope quantization
    np.testing.assert_allclose(
        np.asarray(out["rendered_median_depth"])[0], exp["med_d"],
        atol=5 * atol)
    np.testing.assert_allclose(
        np.asarray(out["rendered_median_weight"])[0], exp["med_w"],
        atol=atol)
    np.testing.assert_array_equal(
        np.asarray(out["rendered_median_id"])[0], exp["med_i"].astype(np.int32))


def test_analytic_surfel_xla_golden():
    """Whole-image hand derivation vs the XLA golden surfel compositor."""
    _check(_render_repo("xla"), _expected_buffers())


@pytest.mark.parametrize("npack", [True, False])
def test_analytic_surfel_pallas_interpret(monkeypatch, npack):
    """Same hand values through the FULL Pallas path (packed single-sort
    flat table + in-kernel decode), NPACK 10-bit normal quantization both
    on and off (the quantized normal carries ~2e-3 absolute error)."""
    from gaustudio_tpu.ops import rasterize_surfel_pallas as SP

    monkeypatch.setattr(SP, "SURFEL_NPACK", npack)
    with pltpu.force_tpu_interpret_mode():
        out = _render_repo("pallas", need_grads=False)
    exp = _expected_buffers()
    # the packed table quantizes: 19-bit depth sort key (ordering only),
    # f16 geometry pairs (~1e-3), NPACK normals (10 bits/axis ~ 2e-3)
    _check(out, exp, atol=4e-3, m2_rtol=1e-2)


def test_analytic_surfel_pallas_train_mode(monkeypatch):
    """Aligned (need_grads=True) Pallas path against the hand values."""
    with pltpu.force_tpu_interpret_mode():
        out = _render_repo("pallas", need_grads=True)
    _check(out, _expected_buffers(), atol=4e-3)


def _loss_fn(backend):
    """Scalar loss over all buffers, differentiable wrt the raw params."""
    rng = np.random.default_rng(7)
    wr = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    s = _settings(backend, need_grads=True)

    def loss(xyz, scales, quats, opac):
        out = RS.rasterize_surfels(
            xyz, opac, s, scales=scales, rotations=quats,
            colors_precomp=jnp.asarray(_SCENE["colors"]),
        )
        return (jnp.sum(out["render"] * wr)
                + jnp.sum(out["rendered_depth_sum"][0] * wd)
                + jnp.sum(out["rendered_normal_view"] * wn)
                + jnp.sum(out["rendered_dist_m2"][0] * wd))

    return loss


def _binning_rect(xyz, scales, quats, opac):
    """The discrete binning geometry (rect + radius) for a parameter set —
    used to DETECT probes whose finite difference straddles a ceil(3 sigma)
    rect boundary: the gradient contract (matching the CUDA reference,
    which stop-gradients its duplicateWithKeys binning) excludes those
    discontinuities, so FD is only comparable when the rect is invariant."""
    s = _settings("xla")
    pre = RS.preprocess_surfel(
        xyz, opac, s.viewmatrix, s.projmatrix, s.campos, W, H,
        scales=scales, rotations=quats,
        colors_precomp=jnp.asarray(_SCENE["colors"]),
    )
    return (np.asarray(pre.rect_min), np.asarray(pre.rect_max),
            np.asarray(pre.radii))


def test_analytic_surfel_grads_finite_difference():
    """Autodiff through the two-plane construction (M, Dk, the hu x hv
    cross product and its 2D-filter branch) vs central finite differences
    of the same forward (probes crossing a binning-rect boundary are
    excluded — that discontinuity is outside the gradient contract)."""
    loss = _loss_fn("xla")
    args = [jnp.asarray(_SCENE["centers"]), jnp.asarray(_SCENE["scales"]),
            jnp.asarray(_SCENE["quats"]), jnp.asarray(_SCENE["opac"])]
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    rng = np.random.default_rng(3)
    checked = 0
    for ai, g in enumerate(grads):
        g = np.asarray(g)
        # probe a few random coordinates per argument
        flat = g.reshape(-1)
        idxs = rng.choice(flat.size, size=min(6, flat.size), replace=False)
        for ix in idxs:
            # 1e-3 sits in the smooth regime; 3e-3 measurably straddles
            # the use3d/alpha-gate branches on this scene
            eps = 1e-3
            pert = np.zeros(flat.size, np.float32)
            pert[ix] = eps
            pert = pert.reshape(g.shape)
            ap = [a if j != ai else a + pert for j, a in enumerate(args)]
            am = [a if j != ai else a - pert for j, a in enumerate(args)]
            ra, rb = _binning_rect(*ap), _binning_rect(*am)
            if not all(np.array_equal(x, y) for x, y in zip(ra, rb)):
                continue  # FD straddles a discrete binning change
            fd = (float(loss(*ap)) - float(loss(*am))) / (2 * eps)
            # validate the probe itself: a second step size must agree,
            # else the interval straddles a kink (alpha gate, 0.99 clamp,
            # use3d branch, termination) where FD is meaningless
            eps2 = eps / 3
            pert2 = pert * (eps2 / eps)
            ap2 = [a if j != ai else a + pert2 for j, a in enumerate(args)]
            am2 = [a if j != ai else a - pert2 for j, a in enumerate(args)]
            fd2 = (float(loss(*ap2)) - float(loss(*am2))) / (2 * eps2)
            scale = max(abs(fd), np.abs(flat).max(), 1e-3)
            if abs(fd - fd2) / scale > 0.05:
                continue  # non-smooth probe
            assert abs(fd - flat[ix]) / scale < 0.05, (
                f"arg {ai} flat[{ix}]: autodiff {flat[ix]:.6g} vs FD {fd:.6g}")
            checked += 1
    assert checked >= 8, f"only {checked} FD probes were binning-invariant"


def test_analytic_surfel_grads_pallas_matches_xla():
    """The Pallas reverse-walk backward agrees with XLA autodiff through
    the identical forward (interpret mode)."""
    loss_x = _loss_fn("xla")
    loss_p = _loss_fn("pallas")
    args = [jnp.asarray(_SCENE["centers"]), jnp.asarray(_SCENE["scales"]),
            jnp.asarray(_SCENE["quats"]), jnp.asarray(_SCENE["opac"])]
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(*args)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.max(np.abs(a - b)) / denom < 2e-3
