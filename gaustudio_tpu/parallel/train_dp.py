"""Sharded training step: camera-DP x Gaussian-axis sharding.

The full 3DGS train step over a ``("dp", "gs")`` mesh (BASELINE.json
north_star: "per-camera renders batched across the DP mesh and Gaussian
state sharded with ICI all-gathers per tile pass"):

  * every param / optimizer-moment / stat array is sharded on its leading
    N-Gaussians axis over ``gs``;
  * the per-step ``all_gather`` over ``gs`` materializes the full set for
    rendering; its autodiff transpose is the gradient ``reduce_scatter``;
  * each ``dp`` row renders a different camera; gradients and metrics are
    ``pmean``-reduced over ``dp``;
  * the Adam update runs shard-local — no replicated optimizer state.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaustudio_tpu.ops import ssim as ssim_ops
from gaustudio_tpu.ops.rasterize import RasterizeSettings
from gaustudio_tpu.pipelines.train import (
    CameraBatch,
    GaussianTrainState,
    TrainConfig,
    render_from_params,
)
from gaustudio_tpu.pipelines.optimizers.general import adam_update, exp_lr_schedule


def state_sharding(mesh: Mesh, state: GaussianTrainState):
    """NamedShardings: every per-Gaussian array sharded on axis 0 over gs."""
    row = NamedSharding(mesh, P("gs"))
    rep = NamedSharding(mesh, P())

    def spec(x):
        return row if getattr(x, "ndim", 0) >= 1 and x.shape[0] > 1 else rep

    return jax.tree.map(spec, state)


def shard_state(mesh: Mesh, state: GaussianTrainState) -> GaussianTrainState:
    return jax.device_put(state, state_sharding(mesh, state))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp"))


def make_dp_train_step(mesh: Mesh, settings: RasterizeSettings, cfg: TrainConfig):
    """Build the jitted sharded train step.

    The returned function takes a gs-sharded GaussianTrainState and a
    CameraBatch whose arrays are stacked over a leading batch axis of size
    dp (one camera per dp row) and returns (new_state, metrics).
    """
    n_dp, n_gs = mesh.shape["dp"], mesh.shape["gs"]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_state_specs(), P("dp")),
        out_specs=(_state_specs(), P()),
        check_vma=False,
    )
    def step(state: GaussianTrainState, batch: CameraBatch):
        # local camera (leading axis length 1 after dp sharding)
        local = jax.tree.map(lambda x: x[0], batch)

        s = settings._replace(
            viewmatrix=local.viewmatrix,
            projmatrix=local.projmatrix,
            campos=local.campos,
            bg=jnp.zeros(3),
        )
        bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
        shard_rows = state.params["xyz"].shape[0]
        full_rows = shard_rows * n_gs
        offset0 = jnp.zeros((full_rows, 2), jnp.float32)
        valid_full = jax.lax.all_gather(state.valid, "gs", tiled=True)

        def loss_fn(shard_params, offset):
            # ICI all-gather of the sharded Gaussian state; AD transposes
            # this into a reduce_scatter of the parameter gradients.
            full = {
                k: jax.lax.all_gather(v, "gs", tiled=True)
                for k, v in shard_params.items()
            }
            out = render_from_params(full, valid_full, state.active_sh_degree, s,
                                     means2d_offset=offset)
            pred = out["render"] + bg[:, None, None] * (
                1.0 - out["rendered_final_opacity"][0]
            )
            loss = ssim_ops.rgb_loss(pred, local.gt_image, cfg.lambda_dssim)
            return loss, out

        (loss, out), (grads, vs_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset0)

        grads = jax.lax.pmean(grads, "dp")
        vs_grads = jax.lax.pmean(vs_grads, "dp")

        # per-gaussian stats: full-row values -> local shard slice
        gs_idx = jax.lax.axis_index("gs")
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, gs_idx * shard_rows, shard_rows)
        visible_full = out["radii"] > 0
        visible_any = jax.lax.psum(visible_full.astype(jnp.float32), "dp")
        vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
        radii_max = jax.lax.pmax(out["radii"].astype(jnp.float32), "dp")

        # batched-view densification stats: accum the batch-summed viewspace
        # grad norm (||sum of per-view grads||), count visible views in denom
        xyz_grad_accum = state.xyz_grad_accum + sl(
            jnp.where(visible_any > 0, vs_norm * n_dp, 0.0)
        )
        denom = state.denom + sl(visible_any)
        max_radii2d = jnp.maximum(state.max_radii2d, sl(radii_max))

        xyz_lr = exp_lr_schedule(
            cfg.lr_xyz_init, cfg.lr_xyz_final, cfg.lr_xyz_max_steps
        )(state.step)
        lrs = {
            "xyz": xyz_lr,
            "f_dc": cfg.lr_f_dc,
            "f_rest": cfg.lr_f_rest,
            "opacity": cfg.lr_opacity,
            "scale": cfg.lr_scale,
            "rot": cfg.lr_rot,
        }
        new_params, new_opt = adam_update(
            grads, state.opt, state.params, lrs, row_mask=state.valid
        )

        metrics = {
            "loss": jax.lax.pmean(loss, "dp"),
            "psnr": jax.lax.pmean(ssim_ops.psnr(out["render"], local.gt_image), "dp"),
            "num_points": jax.lax.psum(jnp.sum(state.valid), "gs").astype(jnp.float32),
        }
        metrics = {k: jax.lax.pmean(v * 1.0, "gs") for k, v in metrics.items()}

        new_state = state._replace(
            params=new_params,
            opt=new_opt,
            step=state.step + 1,
            xyz_grad_accum=xyz_grad_accum,
            denom=denom,
            max_radii2d=max_radii2d,
        )
        return new_state, metrics

    return jax.jit(step)


def _state_specs():
    """PartitionSpecs matching GaussianTrainState: per-row arrays on gs."""
    row = P("gs")
    rep = P()
    params = {k: row for k in ("xyz", "f_dc", "f_rest", "opacity", "scale", "rot")}
    from gaustudio_tpu.pipelines.optimizers.general import AdamState

    return GaussianTrainState(
        params=params,
        valid=row,
        opt=AdamState(mu=dict(params), nu=dict(params),
                      count=dict(params)),  # per-row counts shard with gs
        step=rep,
        xyz_grad_accum=row,
        denom=row,
        max_radii2d=row,
        active_sh_degree=rep,
    )
