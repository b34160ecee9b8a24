"""SH evaluation golden tests against an independent numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaustudio_tpu.ops import sh


def _numpy_sh_oracle(deg, coeffs, d):
    """Independent real-SH evaluation built from the standard closed forms.

    Y_l^m real basis with the Inria/PlenOctree ordering and sign convention:
    band1 = (-y, +z, -x) times C1, etc.
    """
    x, y, z = d
    vals = [0.28209479177387814]
    if deg >= 1:
        c1 = 0.4886025119029199
        vals += [-c1 * y, c1 * z, -c1 * x]
    if deg >= 2:
        vals += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.31539156525252005 * (2 * z * z - x * x - y * y),
            -1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ]
    if deg >= 3:
        vals += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    vals = np.array(vals)
    return (coeffs[:, : len(vals)] * vals).sum(-1)


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh_matches_oracle(deg):
    rng = np.random.default_rng(0)
    n = 17
    coeffs = rng.normal(size=(n, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs.astype(np.float32)

    got = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
    want = np.stack(
        [
            np.stack(
                [_numpy_sh_oracle(deg, coeffs[i, c : c + 1], dirs[i])[0] for c in range(3)]
            )
            for i in range(n)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_masked_matches_static():
    rng = np.random.default_rng(1)
    n = 11
    coeffs = jnp.asarray(rng.normal(size=(n, 3, 16)).astype(np.float32))
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.astype(np.float32))
    for deg in range(4):
        a = sh.eval_sh(deg, coeffs[..., : (deg + 1) ** 2], dirs)
        b = sh.eval_sh_masked(jnp.int32(deg), coeffs, dirs, max_deg=3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_rgb_sh_roundtrip():
    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.uniform(size=(5, 3)).astype(np.float32))
    back = sh.SH2RGB(sh.RGB2SH(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), rtol=1e-6, atol=1e-6)


def test_sh_to_rgb_clamped():
    # A single DC-only gaussian: rgb = C0 * sh0 + 0.5 clamped at 0
    shs = np.zeros((2, 16, 3), np.float32)
    shs[0, 0] = [1.0, 0.0, -10.0]
    means = jnp.asarray(np.array([[0, 0, 2], [1, 1, 3]], np.float32))
    campos = jnp.zeros(3, jnp.float32)
    rgb, clamped = sh.sh_to_rgb_clamped(3, jnp.asarray(shs), means, campos)
    np.testing.assert_allclose(
        np.asarray(rgb[0]),
        [0.28209479 + 0.5, 0.5, 0.0],
        rtol=1e-5,
        atol=1e-6,
    )
    assert bool(clamped[0, 2]) and not bool(clamped[0, 0])
