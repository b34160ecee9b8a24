"""Model math utilities — port of gaustudio/models/utils.py (activations,
quaternion/scaling covariance builders) to jnp."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops.gaussian import quat_to_rotmat


def inverse_sigmoid(x):
    """gaustudio/models/vanilla_sg.py:16-17."""
    x = jnp.asarray(x)
    return jnp.log(x / (1 - x))


def get_activation(name):
    """Name -> elementwise activation; port of models/utils.py:6-32."""
    if name is None:
        return lambda x: x
    name = name.lower()
    if name == "none":
        return lambda x: x
    if name.startswith("scale"):
        factor = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, factor) / factor
    if name.startswith("clamp"):
        cmax = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, cmax)
    if name.startswith("mul"):
        factor = float(name[3:])
        return lambda x: x * factor
    if name == "exp":
        return jnp.exp
    if name == "lin2srgb":
        return lambda x: jnp.clip(
            jnp.where(
                x > 0.0031308,
                jnp.power(jnp.clip(x, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
                12.92 * x,
            ),
            0.0,
            1.0,
        )
    if name.startswith("+") or name.startswith("-"):
        shift = float(name)
        return lambda x: x + shift
    if name == "sigmoid":
        return lambda x: 1.0 / (1.0 + jnp.exp(-x))
    if name == "tanh":
        return jnp.tanh
    if name == "normalize":
        return lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
    if name == "softplus":
        return lambda x: jnp.logaddexp(x, 0.0)
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    raise ValueError(f"unknown activation: {name}")


def build_rotation(q):
    """models/utils.py:44-65 (normalizing quat -> rotation matrix)."""
    return quat_to_rotmat(jnp.asarray(q), normalize=True)


def build_scaling_rotation(s, q):
    """models/utils.py:67-76: L = R @ diag(s)."""
    R = build_rotation(q)
    return R * jnp.asarray(s)[..., None, :]


def strip_symmetric(sym):
    """models/utils.py:79-92: symmetric 3x3 -> 6-vector (upper triangle)."""
    return jnp.stack(
        [sym[..., 0, 0], sym[..., 0, 1], sym[..., 0, 2],
         sym[..., 1, 1], sym[..., 1, 2], sym[..., 2, 2]],
        axis=-1,
    )


def build_covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """models/utils.py:93-97: Sigma = L L^T, 6-vector."""
    L = build_scaling_rotation(scaling_modifier * jnp.asarray(scaling), rotation)
    return strip_symmetric(jnp.einsum("nij,nkj->nik", L, L,
                       precision=jax.lax.Precision.HIGHEST))
