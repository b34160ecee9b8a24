"""Golden tests for the projection math vs a literal scalar simulation of the
CUDA reference semantics (forward.cu:74-256, auxiliary.h:40-164), written
independently here in numpy with explicit column-major glm emulation."""

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.ops import gaussian as G


def _oracle_cov3d(scale, mod, q):
    """Scalar sim of computeCov3D with glm column-major matrices."""
    # glm matrices stored column-major: M_glm[col][row]; emulate with numpy
    # arrays A where A[c, r], products C = A*B => C[c] = A applied to B's cols.
    def glm_mat3(*vals):  # 9 vals, column-major fill
        return np.array(vals, np.float64).reshape(3, 3)  # [col, row]

    def glm_mul(A, B):  # glm C = A * B
        # standard math: C_std = A_std @ B_std where X_std = X.T (row-major view)
        return (A.T @ B.T).T

    S = glm_mat3(mod * scale[0], 0, 0, 0, mod * scale[1], 0, 0, 0, mod * scale[2])
    r, x, y, z = q
    R = glm_mat3(
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )
    M = glm_mul(S, R)
    Sigma = glm_mul(M.T.copy().T.T, M)  # transpose(M) * M in glm
    Sigma = glm_mul(np.ascontiguousarray(M.T), M)  # glm transpose = numpy .T on [col,row]
    # transpose in glm swaps storage indices: glm_T(A)[c][r] = A[r][c]
    Mt = M.T
    Sigma = glm_mul(Mt, M)
    return np.array(
        [Sigma[0, 0], Sigma[0, 1], Sigma[0, 2], Sigma[1, 1], Sigma[1, 2], Sigma[2, 2]]
    )


def _oracle_cov2d(mean, fx, fy, tanx, tany, cov3d, viewmat_flat):
    m = viewmat_flat
    t = np.array(
        [
            m[0] * mean[0] + m[4] * mean[1] + m[8] * mean[2] + m[12],
            m[1] * mean[0] + m[5] * mean[1] + m[9] * mean[2] + m[13],
            m[2] * mean[0] + m[6] * mean[1] + m[10] * mean[2] + m[14],
        ]
    )
    limx, limy = 1.3 * tanx, 1.3 * tany
    t[0] = min(limx, max(-limx, t[0] / t[2])) * t[2]
    t[1] = min(limy, max(-limy, t[1] / t[2])) * t[2]

    def glm_mat3(*vals):
        return np.array(vals, np.float64).reshape(3, 3)

    def glm_mul(A, B):
        return (A.T @ B.T).T

    J = glm_mat3(fx / t[2], 0, -(fx * t[0]) / (t[2] * t[2]),
                 0, fy / t[2], -(fy * t[1]) / (t[2] * t[2]),
                 0, 0, 0)
    W = glm_mat3(m[0], m[4], m[8], m[1], m[5], m[9], m[2], m[6], m[10])
    T = glm_mul(W, J)
    Vrk = glm_mat3(cov3d[0], cov3d[1], cov3d[2],
                   cov3d[1], cov3d[3], cov3d[4],
                   cov3d[2], cov3d[4], cov3d[5])
    cov = glm_mul(glm_mul(T.T, Vrk.T), T)
    return np.array([cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3])


def _random_camera(rng):
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 0.1 + np.array([0, 0, 4.0])
    W2V = np.eye(4)
    W2V[:3, :3] = Q
    W2V[:3, 3] = t
    return W2V


def test_cov3d_matches_cuda_semantics():
    rng = np.random.default_rng(3)
    for _ in range(20):
        scale = np.exp(rng.normal(size=3) * 0.5)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        mod = float(rng.uniform(0.5, 2.0))
        want = _oracle_cov3d(scale, mod, q)
        got = np.asarray(
            G.build_cov3d(jnp.asarray(scale[None], jnp.float32), mod,
                          jnp.asarray(q[None], jnp.float32))
        )[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cov3d_matches_torch_reference_formula():
    """Cross-check against Σ = L Lᵀ with L = R @ diag(s), the torch-side formula
    (gaustudio/models/utils.py:93-97)."""
    import torch

    rng = np.random.default_rng(4)
    scale = np.abs(rng.normal(size=(8, 3))).astype(np.float32) + 0.1
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    got = np.asarray(G.build_cov3d(jnp.asarray(scale), 1.0, jnp.asarray(q)))

    qt = torch.from_numpy(q)
    st = torch.from_numpy(scale)
    r, x, y, z = qt[:, 0], qt[:, 1], qt[:, 2], qt[:, 3]
    R = torch.stack(
        [
            torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
            torch.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
            torch.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        dim=-2,
    )
    L = R @ torch.diag_embed(st)
    Sigma = (L @ L.transpose(1, 2)).numpy()
    want = np.stack(
        [Sigma[:, 0, 0], Sigma[:, 0, 1], Sigma[:, 0, 2],
         Sigma[:, 1, 1], Sigma[:, 1, 2], Sigma[:, 2, 2]], -1
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cov2d_matches_cuda_semantics():
    rng = np.random.default_rng(5)
    W2V = _random_camera(rng)
    viewmat = W2V.T  # reference stores transposed W2V
    viewflat = viewmat.flatten()  # row-major flatten of the transposed matrix
    tanx, tany = 0.5, 0.4
    W, H = 640, 480
    fx = W / (2 * tanx)
    fy = H / (2 * tany)
    for _ in range(20):
        mean = rng.normal(size=3) * 2
        # keep in front of camera
        mv = W2V[:3, :3] @ mean + W2V[:3, 3]
        if mv[2] < 0.5:
            mean = mean + W2V[:3, :3].T @ np.array([0, 0, 4.0 - mv[2]])
        scale = np.exp(rng.normal(size=3) * 0.3) * 0.1
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        cov3d = _oracle_cov3d(scale, 1.0, q)
        want = _oracle_cov2d(mean, fx, fy, tanx, tany, cov3d, viewflat)
        got = np.asarray(
            G.compute_cov2d(
                jnp.asarray(mean[None], jnp.float32), fx, fy, tanx, tany,
                jnp.asarray(cov3d[None], jnp.float32),
                jnp.asarray(viewmat, jnp.float32),
            )
        )[0]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_preprocess_culling_and_radius():
    rng = np.random.default_rng(6)
    W2V = np.eye(4)
    W2V[2, 3] = 3.0  # camera looking down +z, gaussians near origin
    viewmat = jnp.asarray(W2V.T, jnp.float32)
    # simple symmetric projection
    znear, zfar = 0.1, 100.0
    tanx = tany = 0.5
    P = np.zeros((4, 4))
    P[0, 0] = 1 / tanx
    P[1, 1] = 1 / tany
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    full = (P @ W2V).T

    n = 64
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    means[0] = [0, 0, -5]  # behind camera -> culled
    scales = (np.abs(rng.normal(size=(n, 3))) * 0.05 + 0.01).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)

    pre = G.preprocess(
        jnp.asarray(means), jnp.asarray(opac),
        viewmat, jnp.asarray(full, jnp.float32),
        jnp.zeros(3, jnp.float32), 640, 480, tanx, tany,
        colors_precomp=jnp.asarray(colors),
        scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
    )
    valid = np.asarray(pre.valid)
    assert not valid[0]
    assert valid[1:].sum() > n // 2
    radii = np.asarray(pre.radii)
    assert (radii[valid] > 0).all()
    assert (radii[~valid] == 0).all()
    # rect areas match tiles_touched
    rw = np.asarray(pre.rect_max - pre.rect_min)
    area = rw[..., 0] * rw[..., 1]
    np.testing.assert_array_equal(
        np.asarray(pre.tiles_touched)[valid], area[valid]
    )
    # depth equals view-space z (camera at z=-3 looking at origin)
    np.testing.assert_allclose(
        np.asarray(pre.depths), means[:, 2] + 3.0, rtol=1e-5, atol=1e-5
    )
