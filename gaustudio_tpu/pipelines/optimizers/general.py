"""General optimizer — per-attribute Adam with row-surgery support.

Port of gaustudio/pipelines/optimizers/{base,general_optimizer}.py (torch
optimizer wrapper with per-attribute param groups, configs/vanilla.yaml:27-46)
as a *functional* optimizer: plain (mu, nu, count) pytrees so the
densification step can zero the moments of cloned/split/pruned rows — the
JAX substitute for Inria's cat_tensors_to_optimizer state surgery.

Note: the reference config names torch ``AdamW`` whose default weight_decay
(0.01) silently decays all attributes; we default to decay-free Adam (the
canonical 3DGS recipe) and expose ``weight_decay`` for parity experiments.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.pipelines import optimizers


class AdamState(NamedTuple):
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    # PER-ROW, PER-ATTRIBUTE step counts {k: [rows] int32}. Row surgery
    # (densify clone/split/prune, opacity reset) zeroes a row's moments AND
    # its count, so Adam's bias correction restarts exactly like torch's
    # per-tensor state reset. With a single global count, freshly created
    # rows train at (1-b1^k)/sqrt(1-b2^k) ~ 3-6.5x the intended lr for
    # their first ~100 steps — with densification refreshing a large
    # fraction of rows every interval, that overshoot compounded into
    # parameter blow-ups (diagnosed in the r3 at-scale run: median
    # accumulated viewspace grad exploded 7e-5 -> 5e3 as densify ramped).
    count: Dict[str, jnp.ndarray]


def adam_init(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(
        mu=zeros,
        nu={k: jnp.zeros_like(v) for k, v in params.items()},
        count={k: jnp.zeros((v.shape[0],), jnp.int32)
               for k, v in params.items()},
    )


def adam_update(
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    params: Dict[str, jnp.ndarray],
    lrs: Dict[str, jnp.ndarray],
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    weight_decay: float = 0.0,
    row_mask=None,
):
    """One Adam step with per-attribute learning rates.

    ``lrs[k]`` may be a scalar or traced value (for schedules).  ``row_mask``
    [C] gates updates to padded rows (their counts do not advance).
    """
    new_params, new_mu, new_nu, new_count = {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        if weight_decay:
            g = g + weight_decay * p
        mu = b1 * state.mu[k] + (1 - b1) * g
        nu = b2 * state.nu[k] + (1 - b2) * g * g
        if row_mask is not None:
            cnt = state.count[k] + row_mask.astype(jnp.int32)
        else:
            cnt = state.count[k] + 1
        cf = cnt.astype(jnp.float32).reshape((-1,) + (1,) * (p.ndim - 1))
        # masked rows keep cnt == 0: floor c1/c2 so 0-moments divide to 0
        c1 = jnp.maximum(1.0 - b1 ** cf, 1e-8)
        c2 = jnp.maximum(1.0 - b2 ** cf, 1e-8)
        update = lrs.get(k, 0.0) * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        if row_mask is not None:
            m = row_mask.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
            update = update * m
        new_params[k] = p - update
        new_mu[k] = mu
        new_nu[k] = nu
        new_count[k] = cnt
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=new_count)


def exp_lr_schedule(lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1.0) -> Callable:
    """Inria-style log-lerp learning-rate schedule (the reference's
    calc_exp_lr_decay_rate resolver, utils/misc.py:5-8, serves the same role)."""

    def schedule(step):
        t = jnp.clip(step.astype(jnp.float32) / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            (1 - t) * jnp.log(jnp.maximum(lr_init, 1e-12))
            + t * jnp.log(jnp.maximum(lr_final, 1e-12))
        )
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        return delay * log_lerp

    return schedule


@optimizers.register("general")
class GeneralOptimizer:
    """Registry-facing wrapper with the reference's config shape
    (general_optimizer.py:12-33): per-attribute lr dict + optimizer args."""

    default_conf = {
        "optimizer_name": "adam",
        "args": {"lr": 0.0, "eps": 1e-15},
        "params": {},
    }

    def __init__(self, config=None):
        self.config = {**self.default_conf, **(config or {})}
        self.eps = float(self.config.get("args", {}).get("eps", 1e-15))
        self.weight_decay = float(self.config.get("args", {}).get("weight_decay", 0.0))
        self.lrs = {
            k: float(v.get("lr", 0.0)) for k, v in self.config.get("params", {}).items()
        }
        self.state = None
        self._params = None
        self._grads = None

    # functional API --------------------------------------------------------
    def init(self, params):
        self.state = adam_init(params)
        return self.state

    def update(self, grads, state, params, step=None, lr_overrides=None, row_mask=None):
        lrs = dict(self.lrs)
        if lr_overrides:
            lrs.update(lr_overrides)
        return adam_update(
            grads, state, params, lrs, eps=self.eps,
            weight_decay=self.weight_decay, row_mask=row_mask,
        )

    # torch-style parity API (optimizers/base.py:7-33) ----------------------
    def setup(self, params):
        self._params = dict(params)
        self.init(self._params)

    def step(self, grads):
        self._params, self.state = self.update(grads, self.state, self._params)
        return self._params

    def zero_grad(self):
        self._grads = None
