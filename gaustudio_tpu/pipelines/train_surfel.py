"""2DGS surfel training: photometric + normal-consistency + distortion.

The 2DGS recipe on top of the shared fixed-capacity training machinery:
renders through ops.rasterize_surfel (ray-splat intersection) and adds the
two surface regularizers the surfel buffers exist for —

  * normal consistency: 1 - <rendered normal, normal from the expected
    depth map> (surfel_renderer.py emits both buffers);
  * distortion: the per-pixel variance surrogate A*M2 - M1^2 computed from
    the streaming accumulators (sum w*m, sum w*m^2) the compositor carries.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops import rasterize_surfel
from gaustudio_tpu.ops import ssim as ssim_ops
from gaustudio_tpu.ops.rasterize import RasterizeSettings
from gaustudio_tpu.pipelines.optimizers.general import adam_update, exp_lr_schedule
from gaustudio_tpu.pipelines.train import (
    CameraBatch,
    GaussianTrainState,
    TrainConfig,
    Trainer,
)


class SurfelTrainConfig(NamedTuple):
    base: TrainConfig = TrainConfig()
    lambda_normal: float = 0.05
    lambda_dist: float = 0.0  # 2DGS ramps this in after warmup
    normal_from_iter: int = 7000


def _features(params):
    C = params["f_dc"].shape[0]
    f_dc = params["f_dc"].reshape(C, 1, 3)
    f_rest = params["f_rest"].reshape(C, 3, -1).transpose(0, 2, 1)
    return jnp.concatenate([f_dc, f_rest], axis=1)


def render_surfels_from_params(params, valid, active_sh_degree,
                               settings: RasterizeSettings, means2d_offset=None):
    opacity = jax.nn.sigmoid(params["opacity"][:, 0])
    scales = jnp.exp(params["scale"])
    rots = params["rot"] * jax.lax.rsqrt(
        jnp.sum(params["rot"] ** 2, axis=-1, keepdims=True) + 1e-18
    )
    return rasterize_surfel.rasterize_surfels(
        params["xyz"], opacity, settings, scales=scales, rotations=rots,
        shs=_features(params), means2D_offset=means2d_offset,
        active_sh_degree=active_sh_degree, valid_mask=valid,
    )


@partial(jax.jit, static_argnames=("settings", "cfg"), donate_argnums=(0,))
def train_step_surfel(state: GaussianTrainState, batch: CameraBatch,
                      settings: RasterizeSettings, cfg: SurfelTrainConfig):
    base = cfg.base
    # backend="auto": on TPU this takes the full Pallas path (forward
    # compositor + reverse-walk backward via composite_surfel_fast's
    # custom_vjp); on CPU it differentiates the XLA compositor.
    s = settings._replace(
        viewmatrix=batch.viewmatrix, projmatrix=batch.projmatrix,
        campos=batch.campos, bg=jnp.zeros(3), backend="auto",
    )
    capacity = state.params["xyz"].shape[0]
    offset0 = jnp.zeros((capacity, 2), jnp.float32)
    bg = jnp.ones(3) if base.white_background else jnp.zeros(3)

    def loss_fn(params, offset):
        out = render_surfels_from_params(
            params, state.valid, state.active_sh_degree, s, offset
        )
        alpha = out["rendered_alpha"][0]
        pred = out["render"] + bg[:, None, None] * (1.0 - alpha)
        photo = ssim_ops.rgb_loss(pred, batch.gt_image, base.lambda_dssim)

        # normal consistency (2DGS): rendered normals vs depth-map normals.
        # NB: normalize with eps INSIDE the sqrt — d|x|/dx at x=0 is NaN and
        # would poison the whole gradient through 0-weighted terms.
        n_img = jnp.moveaxis(out["rendered_normal_view"], 0, -1)
        n_unit = n_img * jax.lax.rsqrt(
            jnp.sum(n_img * n_img, axis=-1, keepdims=True) + 1e-12
        )
        depth = out["rendered_depth_sum"][0] / jnp.maximum(alpha, 1e-6)
        dzdx = depth[:, 2:] - depth[:, :-2]
        dzdy = depth[2:, :] - depth[:-2, :]
        # cheap screen-space normal proxy: cross of depth gradients
        gx = jnp.pad(dzdx, ((0, 0), (1, 1)))
        gy = jnp.pad(dzdy, ((1, 1), (0, 0)))
        n_depth = jnp.stack([-gx, -gy, -jnp.ones_like(depth)], -1)
        n_depth = n_depth * jax.lax.rsqrt(
            jnp.sum(n_depth * n_depth, axis=-1, keepdims=True) + 1e-12
        )
        wmask = alpha > 0.5
        normal_loss = jnp.sum(
            jnp.where(wmask, 1.0 - jnp.sum(n_unit * n_depth, -1), 0.0)
        ) / jnp.maximum(jnp.sum(wmask), 1.0)

        # distortion surrogate: per-pixel depth variance of the blend
        m1 = out["rendered_dist_m1"][0]
        m2 = out["rendered_dist_m2"][0]
        dist_loss = jnp.mean(jnp.maximum(alpha * m2 - m1 * m1, 0.0))

        loss = (
            photo
            + cfg.lambda_normal * normal_loss
            + cfg.lambda_dist * dist_loss
        )
        return loss, (out, photo, normal_loss, dist_loss)

    (loss, (out, photo, normal_loss, dist_loss)), (grads, vs_grads) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, offset0
        )
    )

    visible = out["radii"] > 0
    vs_norm = jnp.linalg.norm(vs_grads, axis=-1)
    xyz_grad_accum = state.xyz_grad_accum + jnp.where(visible, vs_norm, 0.0)
    denom = state.denom + visible.astype(jnp.float32)
    max_radii2d = jnp.maximum(state.max_radii2d, out["radii"].astype(jnp.float32))

    xyz_lr = exp_lr_schedule(base.lr_xyz_init, base.lr_xyz_final,
                             base.lr_xyz_max_steps)(state.step)
    lrs = {
        "xyz": xyz_lr, "f_dc": base.lr_f_dc, "f_rest": base.lr_f_rest,
        "opacity": base.lr_opacity, "scale": base.lr_scale, "rot": base.lr_rot,
    }
    new_params, new_opt = adam_update(grads, state.opt, state.params, lrs,
                                      row_mask=state.valid)
    metrics = {
        "loss": loss, "photo": photo, "normal_loss": normal_loss,
        "dist_loss": dist_loss,
        "psnr": ssim_ops.psnr(out["render"], batch.gt_image),
        "num_points": jnp.sum(state.valid),
        "num_rendered": out["num_rendered"],
    }
    return state._replace(
        params=new_params, opt=new_opt, step=state.step + 1,
        xyz_grad_accum=xyz_grad_accum, denom=denom, max_radii2d=max_radii2d,
    ), metrics


class SurfelTrainer(Trainer):
    """Trainer specialization: 2-dim scales + surfel step + regularizers."""

    def __init__(self, pcd, dataset, cfg: SurfelTrainConfig = SurfelTrainConfig(),
                 **kw):
        self.surfel_cfg = cfg
        super().__init__(pcd, dataset, cfg.base, **kw)

    def train(self, iterations=None, log_every: int = 100, callback=None,
              checkpoint_dir=None, checkpoint_every: int = 0, **kw):
        cfg = self.surfel_cfg
        iters = iterations or cfg.base.iterations
        settings = self._settings(self.num_entries)
        import numpy as np

        from gaustudio_tpu.pipelines import train as T

        from gaustudio_tpu.pipelines.dataloader import make_batch_source

        next_batch = make_batch_source(self.cameras, self._batch)
        history = []
        # absolute-iteration continuation after restore (see Trainer.train)
        start = int(np.asarray(self.state.step))
        for it in range(start + 1, iters + 1):
            self.state, metrics = train_step_surfel(
                self.state, next_batch(), settings, cfg
            )
            if it % cfg.base.sh_increase_interval == 0:
                self.state = T.oneup_sh_degree(self.state, cfg.base.max_sh_degree)
            if cfg.base.densify_from_iter < it < cfg.base.densify_until_iter:
                if it % cfg.base.densification_interval == 0:
                    self.key, sub = jax.random.split(self.key)
                    self.state = T.densify_and_prune(
                        self.state, sub, jnp.asarray(self.extent), cfg.base,
                        jnp.asarray(it > cfg.base.opacity_reset_interval),
                    )[0]
                    self.maybe_grow_capacity()
                if it % cfg.base.opacity_reset_interval == 0:
                    self.state = T.reset_opacity(self.state)
            if it % log_every == 0 or it == iters:
                m = {k: float(jnp.asarray(v)) for k, v in metrics.items()}
                m["iter"] = it
                history.append(m)
                if callback:
                    callback(m)
            if checkpoint_dir and checkpoint_every and it % checkpoint_every == 0:
                T.save_checkpoint(
                    os.path.join(checkpoint_dir, f"step_{it}"), self.state
                )
        return history
