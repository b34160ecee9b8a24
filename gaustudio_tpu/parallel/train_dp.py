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
            # entry-capacity watchdog input: worst view of the dp batch
            "num_rendered": jax.lax.pmax(
                out["num_rendered"].astype(jnp.float32), "dp"),
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


def replicate_state(mesh: Mesh, state: GaussianTrainState) -> GaussianTrainState:
    """Gather a gs-sharded state onto every device (one all-gather)."""
    return jax.device_put(state, NamedSharding(mesh, P()))


class DPTrainer:
    """Multi-device training loop: the full single-device schedule
    (densify/clone/split/prune, opacity reset, SH warmup, capacity growth,
    entry-overflow watchdog — pipelines/train.py Trainer.train) driven
    through the sharded ("dp", "gs") train step.

    The per-step compute stays sharded; the every-100-iters densification
    runs on the REPLICATED state (gather -> densify_and_prune -> re-shard):
    surgery is a host-frequency event and its sorts/nonzeros are far off the
    step's hot path, so paying one all-gather per densify keeps the exact
    single-device semantics (reference schedule: configs/vanilla.yaml:27-46,
    assembled from vanilla_sg.py:42-44 + renderers/base.py:55-63).
    """

    def __init__(self, pcd, dataset, cfg: TrainConfig = TrainConfig(),
                 mesh: Mesh = None, num_entries=None, chunk: int = 2048,
                 seed: int = 0, capacity=None):
        from gaustudio_tpu.parallel import make_mesh
        from gaustudio_tpu.pipelines.train import Trainer

        self.mesh = mesh if mesh is not None else make_mesh()
        n_gs = self.mesh.shape["gs"]
        # capacity must stay divisible by the gs axis for even row sharding
        if capacity is not None:
            capacity = -(-capacity // n_gs) * n_gs
        self._inner = Trainer(pcd, dataset, cfg, num_entries=num_entries,
                              chunk=chunk, seed=seed, capacity=capacity)
        self.cfg = cfg
        self.key = self._inner.key
        self.extent = self._inner.extent
        self.cameras = self._inner.cameras
        self.num_entries = self._inner.num_entries
        # the default capacity (Trainer's power-of-two bucket) need not
        # divide a non-power-of-two gs axis — pad before sharding
        self.state = shard_state(self.mesh,
                                 self._gs_pad(self._inner.state))
        self._inner.state = None  # single source of truth: self.state

    def _gs_pad(self, state: GaussianTrainState) -> GaussianTrainState:
        """Round the padded capacity up to a gs-axis multiple (shard_map
        requires evenly divisible row shards)."""
        from gaustudio_tpu.pipelines.train import grow_state

        n_gs = self.mesh.shape["gs"]
        cap = state.valid.shape[0]
        return grow_state(state, -(-cap // n_gs) * n_gs)

    def host_state(self) -> GaussianTrainState:
        """Replicated (gathered) view of the sharded state — for export."""
        return replicate_state(self.mesh, self.state)

    def restore(self, ckpt_path: str) -> None:
        """Resume from a Trainer/DPTrainer checkpoint: load, re-probe the
        entry capacity for the restored cloud, re-shard."""
        from gaustudio_tpu.pipelines.train import load_checkpoint

        st = load_checkpoint(ckpt_path)
        self._inner.state = st
        self.num_entries = max(self.num_entries,
                               self._inner.reprobe_capacity())
        self._inner.state = None
        self.state = shard_state(self.mesh, self._gs_pad(st))

    def _grow_capacity(self, state_rep: GaussianTrainState):
        """Double the padded gaussian capacity on the replicated state when
        >85% full (Trainer.maybe_grow_capacity semantics, gs-divisible)."""
        import numpy as np

        from gaustudio_tpu.pipelines.train import grow_state

        valid = int(np.asarray(jnp.sum(state_rep.valid)))
        cap = state_rep.valid.shape[0]
        if valid <= 0.85 * cap:
            return state_rep
        n_gs = self.mesh.shape["gs"]
        return grow_state(state_rep, -(-(cap * 2) // n_gs) * n_gs)

    def train(self, iterations=None, log_every: int = 100, callback=None,
              metrics_path=None, use_prefetch: bool = True,
              checkpoint_dir=None, checkpoint_every: int = 0):
        import os

        import numpy as np

        from gaustudio_tpu.ops import binning
        from gaustudio_tpu.pipelines.dataloader import make_batch_source
        from gaustudio_tpu.pipelines.train import (
            densify_and_prune, oneup_sh_degree, reset_opacity,
            save_checkpoint,
        )
        from gaustudio_tpu.utils.observability import MetricsLogger

        cfg = self.cfg
        iters = iterations or cfg.iterations
        n_dp = self.mesh.shape["dp"]
        settings = self._inner._settings(self.num_entries)
        step_fn = make_dp_train_step(self.mesh, settings, cfg)
        logger = MetricsLogger(metrics_path, echo=False) if metrics_path else None
        next_batch = make_batch_source(self.cameras, self._inner._batch,
                                       use_prefetch=use_prefetch,
                                       batch_size=n_dp)
        history = []
        start = int(np.asarray(self.state.step))
        for it in range(start + 1, iters + 1):
            batch = next_batch()
            self.state, metrics = step_fn(self.state, batch)

            if it % cfg.sh_increase_interval == 0:
                self.state = oneup_sh_degree(self.state, cfg.max_sh_degree)

            if cfg.densify_from_iter < it < cfg.densify_until_iter:
                if it % cfg.densification_interval == 0:
                    self.key, sub = jax.random.split(self.key)
                    prune_big = jnp.asarray(it > cfg.opacity_reset_interval)
                    rep = replicate_state(self.mesh, self.state)
                    rep, dinfo = densify_and_prune(
                        rep, sub, jnp.asarray(self.extent), cfg, prune_big)
                    rep = self._grow_capacity(rep)
                    self.state = shard_state(self.mesh, rep)
                    self._last_densify = {
                        k: float(np.asarray(v)) for k, v in dinfo.items()}
                if it % cfg.opacity_reset_interval == 0:
                    self.state = reset_opacity(self.state)

            if it % log_every == 0 or it == iters:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                m["iter"] = it
                if getattr(self, "_last_densify", None):
                    m.update(self._last_densify)
                    self._last_densify = None
                nr = int(m.get("num_rendered", 0))
                m["entry_overflow"] = max(0, nr - self.num_entries)
                if nr > 0.9 * self.num_entries:
                    new_cap = binning.bucket_capacity(
                        int(nr * 1.25), minimum=self.num_entries)
                    if new_cap > self.num_entries:
                        self.num_entries = new_cap
                        settings = self._inner._settings(new_cap)
                        step_fn = make_dp_train_step(self.mesh, settings, cfg)
                history.append(m)
                if logger:
                    logger.log(it, **{k: v for k, v in m.items() if k != "iter"})
                if not np.isfinite(m["loss"]):
                    # same failure-detection contract as the single-device
                    # Trainer: dump a repro snapshot before dying
                    from gaustudio_tpu.utils.observability import (
                        snapshot_on_nonfinite,
                    )

                    snapshot_on_nonfinite(
                        {"params": self.host_state().params,
                         "loss": metrics["loss"]},
                        (metrics_path or "train_dp") + ".snapshot.pkl",
                        context=f"iter {it}",
                    )
                    raise FloatingPointError(f"non-finite loss at iter {it}")
                if callback:
                    callback(m)
            if checkpoint_dir and checkpoint_every and it % checkpoint_every == 0:
                save_checkpoint(os.path.join(checkpoint_dir, f"step_{it}"),
                                self.state)
        next_batch.close()
        if logger:
            logger.close()
        return history


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
