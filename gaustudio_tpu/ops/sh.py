"""Spherical-harmonics evaluation (real SH, hardcoded polynomials).

TPU-native counterpart of gaustudio/utils/sh_utils.py:57-118 (`eval_sh`,
`RGB2SH`, `SH2RGB`) and of the CUDA `computeColorFromSH`
(cuda_rasterizer/forward.cu:20-71).  Pure jnp; vmap/jit friendly.

Design note: instead of branching on the active SH degree (dynamic python
control flow that XLA cannot trace), degree selection is a *static* argument
or — in `eval_sh_masked` — a band mask, so one compiled kernel serves the SH
warm-up schedule of 3DGS training without recompiles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def sh_basis(dirs, deg: int):
    """SH basis values for unit directions.

    Args:
        dirs: [..., 3] unit direction vectors.
        deg: static int in [0, 4].

    Returns:
        [..., (deg+1)**2] basis array, band-ordered to match
        gaustudio/utils/sh_utils.py:75-113 (including its sign conventions:
        band 1 is ``(-y, +z, -x)``).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = jnp.ones_like(x)
    basis = [C0 * ones]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        basis += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if deg > 3:
        basis += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(basis, axis=-1)


def eval_sh(deg: int, sh, dirs):
    """Evaluate SH colors; port of gaustudio/utils/sh_utils.py:57-113.

    Args:
        deg: static int SH degree, 0-4.
        sh: [..., C, K] coefficients with K >= (deg+1)**2.
        dirs: [..., 3] unit directions.

    Returns:
        [..., C] values (NOT +0.5 shifted, matching the reference).
    """
    assert 0 <= deg <= 4
    coeff = (deg + 1) ** 2
    assert sh.shape[-1] >= coeff
    basis = sh_basis(dirs, deg)  # [..., coeff]
    # HIGHEST: TPU f32 contractions default to bf16 MXU passes (~0.4%
    # color error otherwise)
    import jax as _jax

    return jnp.einsum("...ck,...k->...c", sh[..., :coeff], basis,
                      precision=_jax.lax.Precision.HIGHEST)


def band_mask(active_deg, num_coeffs: int, dtype=jnp.float32):
    """0/1 mask over SH coefficients enabled at (traced) degree ``active_deg``.

    Enables running the SH warm-up schedule (reference
    gaustudio/models/vanilla_sg.py:65-67 `oneupSHdegree`) inside one jitted
    train step: coefficient k belongs to band floor(sqrt(k)).
    """
    ks = np.arange(num_coeffs)
    bands = jnp.asarray(np.floor(np.sqrt(ks)).astype(np.int32))
    return (bands <= active_deg).astype(dtype)


def eval_sh_masked(active_deg, sh, dirs, max_deg: int = 3):
    """Like eval_sh but the degree is a traced value, applied as a band mask."""
    import jax as _jax

    coeff = (max_deg + 1) ** 2
    basis = sh_basis(dirs, max_deg) * band_mask(active_deg, coeff, sh.dtype)
    return jnp.einsum("...ck,...k->...c", sh[..., :coeff], basis,
                      precision=_jax.lax.Precision.HIGHEST)


def sh_to_rgb_clamped(active_deg, sh, means, campos, max_deg: int = 3):
    """CUDA `computeColorFromSH` (forward.cu:20-71): view-dir SH -> RGB.

    Adds the +0.5 offset and clamps at 0, returning the clamp mask used by
    the backward pass (forward.cu:63-70).

    Args:
        active_deg: traced or static int degree.
        sh: [N, K, 3] coefficients (band-major like the reference layout).
        means: [N, 3] gaussian centers.
        campos: [3] camera center.

    Returns:
        (rgb [N, 3], clamped [N, 3] bool)
    """
    d = means - campos
    # eps inside the sqrt: |x| has a NaN gradient at exactly 0
    import jax as _jax

    d = d * _jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-18)
    # reference sh layout: [N, K, 3]; eval wants [..., C, K]
    shs = jnp.swapaxes(sh, -1, -2)  # [N, 3, K]
    rgb = eval_sh_masked(active_deg, shs, d, max_deg) + 0.5
    clamped = rgb < 0.0
    return jnp.maximum(rgb, 0.0), clamped


def RGB2SH(rgb):
    """gaustudio/utils/sh_utils.py:115-116."""
    return (rgb - 0.5) / C0


def SH2RGB(sh):
    """gaustudio/utils/sh_utils.py:118-119."""
    return sh * C0 + 0.5
