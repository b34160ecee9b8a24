"""Scaffold-GS training: neural anchor decode + anchor growing/pruning.

The reference ships the Scaffold-GS model/renderer pair but (like all of
gaustudio) no training loop (SURVEY.md: README.md:117 roadmap unchecked).
This implements the Scaffold-GS recipe (Lu et al., arXiv 2312.00109) on the
fixed-capacity padded-state machinery from pipelines/train.py:

  * per-view neural decode: anchor feature + view direction/distance ->
    MLP heads -> k offset Gaussians per anchor (the functional twin of
    renderers/scaffold.py, reference scaffold_renderer.py:87-160);
  * loss: L1 + D-SSIM + volume regularizer on decoded scales;
  * anchor growing: accumulate screen-space gradient norms per offset
    Gaussian; every interval, promote high-gradient offset positions to
    new anchors on multi-resolution voxel grids (update_depth levels,
    voxel size shrinking by update_hierachy_factor per level), deduped
    against existing anchors — host-side numpy, like the reference's
    voxelize_sample (scaffold_sg.py:122-126);
  * anchor pruning: drop anchors whose accumulated decoded opacity stays
    below min_opacity.

MLP parameters train jointly with anchor attributes via a pytree Adam
(tree_adam_*) since the per-attribute AdamState in optimizers/general.py
is keyed by flat attribute names.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaustudio_tpu.models.scaffold import mlp_apply
from gaustudio_tpu.ops import rasterize as rast
from gaustudio_tpu.ops import ssim as ssim_ops
from gaustudio_tpu.ops.rasterize import RasterizeSettings
from gaustudio_tpu.pipelines.train import CameraBatch, _round_capacity


class ScaffoldTrainConfig(NamedTuple):
    iterations: int = 30000
    lambda_dssim: float = 0.2
    lambda_vol: float = 0.01  # volume regularizer on decoded scales
    # per-attribute lrs (Scaffold-GS paper defaults)
    lr_anchor: float = 0.0
    lr_offset_init: float = 0.01
    lr_offset_final: float = 0.0001
    lr_offset_max_steps: int = 30000
    lr_feat: float = 0.0075
    lr_scale: float = 0.007
    lr_rot: float = 0.002
    lr_mlp_opacity: float = 0.002
    lr_mlp_cov: float = 0.004
    lr_mlp_color: float = 0.008
    # anchor adjustment
    start_stat: int = 500
    update_from: int = 1500
    update_interval: int = 100
    update_until: int = 15000
    grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    success_threshold: float = 0.8  # fraction of interval an offset must be seen
    white_background: bool = False


class ScaffoldTrainState(NamedTuple):
    """Fixed-capacity scaffold training state (a pytree). C = anchor
    capacity, k = offsets per anchor."""

    params: Dict[str, Any]  # anchor [C,3], offset [C,3k], anchor_feat [C,F],
    # scale [C,6], rot [C,4], mlps {opacity/cov/color: [{w,b} x2]}
    valid: jnp.ndarray  # [C] bool
    mu: Any  # Adam first moments (same tree as params)
    nu: Any  # Adam second moments
    opt_count: jnp.ndarray  # [] int32
    step: jnp.ndarray  # [] int32
    # growing stats, per offset gaussian
    offset_grad_accum: jnp.ndarray  # [C*k]
    offset_denom: jnp.ndarray  # [C*k]
    # pruning stats, per anchor
    opacity_accum: jnp.ndarray  # [C]
    anchor_denom: jnp.ndarray  # [C]

    @property
    def num_anchors(self):
        return jnp.sum(self.valid)


def tree_adam_init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return zeros, jax.tree.map(jnp.zeros_like, params)


def tree_adam_update(grads, mu, nu, count, params, lr_tree, *, b1=0.9,
                     b2=0.999, eps=1e-15, mask_tree=None):
    """Adam over arbitrary pytrees with a per-leaf lr tree (and optional
    per-leaf row-mask tree for padded-capacity arrays)."""
    count = count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr, mask):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
        mask = jnp.asarray(mask)
        if mask.ndim > 0:  # row mask over a padded-capacity array
            mask = mask.reshape((-1,) + (1,) * (p.ndim - 1))
        step = step * mask.astype(p.dtype)
        return p - step, m, v

    if mask_tree is None:
        mask_tree = jax.tree.map(lambda _: jnp.ones(()), params)
    flat_p, treedef = jax.tree.flatten(params)
    flat = [
        upd(p, g, m, v, lr, mask)
        for p, g, m, v, lr, mask in zip(
            flat_p, treedef.flatten_up_to(grads), treedef.flatten_up_to(mu),
            treedef.flatten_up_to(nu), treedef.flatten_up_to(lr_tree),
            treedef.flatten_up_to(mask_tree),
        )
    ]
    new_p = treedef.unflatten([f[0] for f in flat])
    new_mu = treedef.unflatten([f[1] for f in flat])
    new_nu = treedef.unflatten([f[2] for f in flat])
    return new_p, new_mu, new_nu, count


def init_scaffold_state(pcd, capacity: Optional[int] = None) -> ScaffoldTrainState:
    """Build padded train state from a ScaffoldPointCloud."""
    n = pcd.num_points
    k = pcd.n_offsets
    cap = capacity or _round_capacity(int(n * 2), minimum=1024)

    def pad(x, fill=0.0):
        x = np.asarray(x, np.float32).reshape(n, -1)
        out = np.full((cap, x.shape[1]), fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = {
        "anchor": pad(pcd._anchor),
        "offset": pad(pcd._offset),
        "anchor_feat": pad(pcd._anchor_feat),
        "scale": pad(pcd._scale, fill=-10.0),
        "rot": pad(pcd._rot),
        "mlps": jax.tree.map(jnp.asarray, pcd.mlp_params),
    }
    params["rot"] = params["rot"].at[:, 0].set(
        jnp.where(jnp.arange(cap) < n, params["rot"][:, 0], 1.0)
    )
    mu, nu = tree_adam_init(params)
    return ScaffoldTrainState(
        params=params,
        valid=jnp.arange(cap) < n,
        mu=mu,
        nu=nu,
        opt_count=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        offset_grad_accum=jnp.zeros((cap * k,), jnp.float32),
        offset_denom=jnp.zeros((cap * k,), jnp.float32),
        opacity_accum=jnp.zeros((cap,), jnp.float32),
        anchor_denom=jnp.zeros((cap,), jnp.float32),
    )


def state_to_scaffold_model(state: ScaffoldTrainState, pcd):
    """Write trained values back into a ScaffoldPointCloud (host).
    Non-finite anchors are dropped from the export (see
    train.state_to_model)."""
    valid = np.asarray(state.valid)
    for k2, arr in state.params.items():
        if k2 == "mlps":
            continue
        valid = valid & np.isfinite(np.asarray(arr)).all(axis=-1)
    pcd._anchor = np.asarray(state.params["anchor"])[valid]
    pcd._offset = np.asarray(state.params["offset"])[valid]
    pcd._anchor_feat = np.asarray(state.params["anchor_feat"])[valid]
    pcd._scale = np.asarray(state.params["scale"])[valid]
    pcd._rot = np.asarray(state.params["rot"])[valid]
    n = int(valid.sum())
    pcd._opacity = np.zeros((n, 1), np.float32)
    pcd.num_points = n
    pcd.mlp_params = jax.tree.map(np.asarray, state.params["mlps"])
    return pcd


def decode_scaffold(params, valid, campos, n_offsets: int):
    """Functional twin of ScaffoldRenderer.get_gaussians_properties
    (renderers/scaffold.py:38-86) over the padded parameter set. Returns
    (xyz, colors, opacity, scales, rots, neural_opacity) for [C*k] offset
    Gaussians; padded/negative-opacity rows keep their slots with opacity 0
    so shapes stay static."""
    anchor = params["anchor"]
    feat = params["anchor_feat"]
    grid_scaling = jnp.exp(params["scale"])  # [C, 6]
    k = n_offsets
    C = anchor.shape[0]

    ob_view = anchor - campos[None, :]
    ob_dist = jnp.sqrt(jnp.sum(ob_view * ob_view, axis=1, keepdims=True) + 1e-12)
    ob_view = ob_view / ob_dist

    cat_local = jnp.concatenate([feat, ob_view, ob_dist], axis=1)
    neural_opacity = mlp_apply(params["mlps"]["opacity"], cat_local, "tanh").reshape(-1)
    valid_rep = jnp.repeat(valid, k)
    opacity = jnp.where((neural_opacity > 0.0) & valid_rep, neural_opacity, 0.0)

    color = mlp_apply(params["mlps"]["color"], cat_local, "sigmoid").reshape(C * k, 3)
    scale_rot = mlp_apply(params["mlps"]["cov"], cat_local).reshape(C * k, 7)

    offsets = params["offset"].reshape(C * k, 3)
    scaling_rep = jnp.repeat(grid_scaling, k, axis=0)
    anchor_rep = jnp.repeat(anchor, k, axis=0)

    scales = scaling_rep[:, 3:] * jax.nn.sigmoid(scale_rot[:, :3])
    rots = scale_rot[:, 3:7] * jax.lax.rsqrt(
        jnp.sum(scale_rot[:, 3:7] ** 2, axis=-1, keepdims=True) + 1e-12
    )
    xyz = anchor_rep + offsets * scaling_rep[:, :3]
    return xyz, color, opacity, scales, rots, neural_opacity


@partial(jax.jit, static_argnames=("settings", "cfg", "n_offsets"),
         donate_argnums=(0,))
def train_step_scaffold(state: ScaffoldTrainState, batch: CameraBatch,
                        settings: RasterizeSettings, cfg: ScaffoldTrainConfig,
                        n_offsets: int):
    """One optimization step: decode -> render -> L1+D-SSIM+vol -> Adam ->
    growing/pruning statistics."""
    s = settings._replace(
        viewmatrix=batch.viewmatrix, projmatrix=batch.projmatrix,
        campos=batch.campos, bg=jnp.zeros(3),
    )
    k = n_offsets
    cap = state.params["anchor"].shape[0]
    offset0 = jnp.zeros((cap * k, 2), jnp.float32)
    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)

    def loss_fn(params, offset2d):
        xyz, color, opacity, scales, rots, neural_op = decode_scaffold(
            params, state.valid, s.campos, k
        )
        out = rast.rasterize(
            xyz, opacity, s, colors_precomp=color, scales=scales,
            rotations=rots, means2D_offset=offset2d,
            valid_mask=jnp.repeat(state.valid, k) & (opacity > 0.0),
        )
        pred = out["render"] + bg[:, None, None] * (1.0 - out["rendered_final_opacity"][0])
        photo = ssim_ops.rgb_loss(pred, batch.gt_image, cfg.lambda_dssim)
        # volume regularizer: discourage large decoded splats
        vol = jnp.mean(jnp.where(opacity[:, None] > 0.0, scales, 0.0).prod(-1))
        loss = photo + cfg.lambda_vol * vol
        return loss, (out, neural_op, opacity)

    (loss, (out, neural_op, opacity)), (grads, vs_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, offset0)

    # growing statistics: ||dL/dmeans2D|| accumulated per live offset gaussian
    live = (out["radii"] > 0) & (opacity > 0.0)
    vs_norm = jnp.sqrt(jnp.sum(vs_grads * vs_grads, axis=-1) + 1e-24)
    offset_grad_accum = state.offset_grad_accum + jnp.where(live, vs_norm, 0.0)
    offset_denom = state.offset_denom + live.astype(jnp.float32)

    # pruning statistics: mean decoded opacity per anchor over views where
    # the anchor contributed at least one live gaussian
    op_anchor = jnp.sum(jnp.clip(neural_op, 0.0, 1.0).reshape(cap, k), axis=1)
    seen = jnp.any(live.reshape(cap, k), axis=1)
    opacity_accum = state.opacity_accum + jnp.where(seen, op_anchor / k, 0.0)
    anchor_denom = state.anchor_denom + seen.astype(jnp.float32)

    offset_lr = jnp.exp(
        (1 - jnp.clip(state.step / cfg.lr_offset_max_steps, 0, 1))
        * jnp.log(cfg.lr_offset_init)
        + jnp.clip(state.step / cfg.lr_offset_max_steps, 0, 1)
        * jnp.log(cfg.lr_offset_final)
    )
    lr_tree = {
        "anchor": cfg.lr_anchor,
        "offset": offset_lr,
        "anchor_feat": cfg.lr_feat,
        "scale": cfg.lr_scale,
        "rot": cfg.lr_rot,
        "mlps": {
            "opacity": [{"w": cfg.lr_mlp_opacity, "b": cfg.lr_mlp_opacity}] * 2,
            "cov": [{"w": cfg.lr_mlp_cov, "b": cfg.lr_mlp_cov}] * 2,
            "color": [{"w": cfg.lr_mlp_color, "b": cfg.lr_mlp_color}] * 2,
        },
    }
    if "feature_bank" in state.params["mlps"]:
        lr_tree["mlps"]["feature_bank"] = [
            {"w": cfg.lr_mlp_color, "b": cfg.lr_mlp_color}
        ] * 2
    row_mask = {
        "anchor": state.valid, "offset": state.valid,
        "anchor_feat": state.valid, "scale": state.valid, "rot": state.valid,
        # MLP leaves are anchor-count independent: unit scalar mask
        "mlps": jax.tree.map(lambda _: jnp.ones(()), state.params["mlps"]),
    }
    new_params, new_mu, new_nu, new_count = tree_adam_update(
        grads, state.mu, state.nu, state.opt_count, state.params, lr_tree,
        mask_tree=row_mask,
    )

    metrics = {
        "loss": loss,
        "psnr": ssim_ops.psnr(out["render"], batch.gt_image),
        "num_points": jnp.sum(state.valid),
        "num_rendered": out["num_rendered"],
    }
    return state._replace(
        params=new_params, mu=new_mu, nu=new_nu, opt_count=new_count,
        step=state.step + 1, offset_grad_accum=offset_grad_accum,
        offset_denom=offset_denom, opacity_accum=opacity_accum,
        anchor_denom=anchor_denom,
    ), metrics


def adjust_anchors(state: ScaffoldTrainState, cfg: ScaffoldTrainConfig,
                   model) -> ScaffoldTrainState:
    """Anchor growing + pruning (host-side numpy; runs every
    cfg.update_interval iterations, so its cost is amortized).

    Growing: offset Gaussians whose mean screen-space gradient exceeds
    grad_threshold * (update_hierachy_factor/2)^level vote their positions
    onto a level-l voxel grid of size
    voxel_size * update_init_factor / update_hierachy_factor^level; voxels
    not already holding an anchor (at that resolution) become new anchors
    with zero offsets, the parent's feature, and scale init log(level size).

    Pruning: anchors observed in >= success_threshold * interval views whose
    mean decoded opacity stays < min_opacity are dropped.
    """
    k = model.n_offsets
    cap = state.valid.shape[0]
    valid = np.asarray(state.valid)
    n = int(valid.sum())
    if n == 0:
        return state

    anchor = np.asarray(state.params["anchor"])
    offset = np.asarray(state.params["offset"])
    feat = np.asarray(state.params["anchor_feat"])
    scale = np.asarray(state.params["scale"])
    rot = np.asarray(state.params["rot"])

    grad_accum = np.asarray(state.offset_grad_accum).reshape(cap, k)
    denom = np.asarray(state.offset_denom).reshape(cap, k)
    avg_grad = grad_accum / np.maximum(denom, 1.0)
    enough = denom >= cfg.update_interval * cfg.success_threshold * 0.5

    # candidate offset-gaussian world positions
    scaling = np.exp(scale[:, :3])
    all_xyz = anchor[:, None, :] + offset.reshape(cap, k, 3) * scaling[:, None, :]

    new_anchors, new_feats, new_scales = [], [], []
    base_size = model.voxel_size * model.update_init_factor
    for level in range(model.update_depth):
        cur_size = base_size / (model.update_hierachy_factor ** level)
        thresh = cfg.grad_threshold * ((model.update_hierachy_factor / 2.0) ** level)
        cand = valid[:, None] & enough & (avg_grad >= thresh)
        if not cand.any():
            continue
        cand_xyz = all_xyz[cand]
        cand_parent = np.nonzero(cand)[0]  # anchor row per candidate
        grid = np.round(cand_xyz / cur_size).astype(np.int64)
        occupied = {tuple(g) for g in
                    np.round(anchor[valid] / cur_size).astype(np.int64)}
        uniq, first = np.unique(grid, axis=0, return_index=True)
        for g, src in zip(uniq, first):
            if tuple(g) in occupied:
                continue
            occupied.add(tuple(g))
            new_anchors.append(g.astype(np.float64) * cur_size)
            new_feats.append(feat[cand_parent[src]])
            new_scales.append(np.full(6, np.log(max(cur_size, 1e-6)), np.float32))

    # pruning mask over existing anchors
    op_avg = np.asarray(state.opacity_accum) / np.maximum(
        np.asarray(state.anchor_denom), 1.0
    )
    observed = np.asarray(state.anchor_denom) >= (
        cfg.update_interval * cfg.success_threshold
    )
    prune = valid & observed & (op_avg < cfg.min_opacity)
    keep = valid & ~prune

    n_keep = int(keep.sum())
    n_new = len(new_anchors)
    if n_new == 0 and n_keep == n:
        # only stats reset
        return state._replace(
            offset_grad_accum=jnp.zeros((cap * k,), jnp.float32),
            offset_denom=jnp.zeros((cap * k,), jnp.float32),
            opacity_accum=jnp.zeros((cap,), jnp.float32),
            anchor_denom=jnp.zeros((cap,), jnp.float32),
        )

    total = n_keep + n_new
    new_cap = cap
    while total > 0.85 * new_cap:
        new_cap *= 2

    def repack(old, new_rows, fill=0.0):
        out = np.full((new_cap, old.shape[1]), fill, np.float32)
        out[:n_keep] = old[keep]
        if n_new:
            out[n_keep:total] = new_rows
        return jnp.asarray(out)

    na = np.asarray(new_anchors, np.float32).reshape(n_new, 3)
    nf = np.asarray(new_feats, np.float32).reshape(n_new, -1)
    ns2 = (np.asarray(new_scales, np.float32).reshape(n_new, 6)
           if n_new else np.zeros((0, 6), np.float32))
    nrot = np.zeros((n_new, 4), np.float32)
    nrot[:, 0] = 1.0

    params = dict(state.params)
    params["anchor"] = repack(anchor, na)
    params["offset"] = repack(offset, np.zeros((n_new, 3 * k), np.float32))
    params["anchor_feat"] = repack(feat, nf)
    params["scale"] = repack(scale, ns2, fill=-10.0)
    params["rot"] = repack(rot, nrot)
    params["rot"] = params["rot"].at[:, 0].set(
        jnp.where(jnp.arange(new_cap) < total, params["rot"][:, 0], 1.0)
    )

    # Optimizer moments: surviving anchors KEEP their momenta (repacked to
    # the new row order, mirroring the reference Scaffold-GS optimizer
    # prune/cat surgery); only newborn rows start from zero. opt_count is
    # preserved, so bias correction stays consistent — zeroing momenta with
    # a large opt_count would give every anchor a ~1/sqrt(1-b2) = 2.8x lr
    # overshoot on the first post-adjust step.
    def repack_moment(tree):
        out = {
            k2: repack(np.asarray(v),
                       np.zeros((n_new, v.shape[1]), np.float32))
            for k2, v in tree.items() if k2 != "mlps"
        }
        out["mlps"] = tree["mlps"]
        return out

    mu = repack_moment(state.mu)
    nu = repack_moment(state.nu)

    return ScaffoldTrainState(
        params=params,
        valid=jnp.arange(new_cap) < total,
        mu=mu,
        nu=nu,
        opt_count=state.opt_count,
        step=state.step,
        offset_grad_accum=jnp.zeros((new_cap * k,), jnp.float32),
        offset_denom=jnp.zeros((new_cap * k,), jnp.float32),
        opacity_accum=jnp.zeros((new_cap,), jnp.float32),
        anchor_denom=jnp.zeros((new_cap,), jnp.float32),
    )


class ScaffoldTrainer:
    """Host-side loop: camera sampling, anchor adjustment, logging."""

    def __init__(self, pcd, dataset, cfg: ScaffoldTrainConfig = ScaffoldTrainConfig(),
                 num_entries: Optional[int] = None, chunk: int = 2048,
                 seed: int = 0):
        self.cfg = cfg
        self.pcd = pcd
        self.dataset = dataset
        self.cameras = list(dataset)
        self.state = init_scaffold_state(pcd)
        self.key = jax.random.PRNGKey(seed)
        self.chunk = chunk
        cam0 = self.cameras[0]
        self.H, self.W = int(cam0.image_height), int(cam0.image_width)
        if num_entries is None:
            xyz, _color, opacity, scales, rots, _ = decode_scaffold(
                self.state.params, self.state.valid,
                jnp.asarray(cam0.camera_center), pcd.n_offsets,
            )
            probe = self._settings(1 << 14)
            num_entries = rast.suggest_num_entries(
                xyz, opacity,
                probe._replace(
                    viewmatrix=jnp.asarray(cam0.world_view_transform),
                    projmatrix=jnp.asarray(cam0.full_proj_transform),
                    campos=jnp.asarray(cam0.camera_center),
                ),
                scales=scales, rotations=rots, margin=8.0,
            )
        self.num_entries = num_entries

    def _settings(self, num_entries) -> RasterizeSettings:
        cam0 = self.cameras[0]
        return RasterizeSettings(
            image_height=self.H, image_width=self.W,
            tanfovx=math.tan(cam0.FoVx * 0.5),
            tanfovy=math.tan(cam0.FoVy * 0.5),
            bg=None, sh_degree=0, num_entries=num_entries, chunk=self.chunk,
            # scaffold loss never reads the median-depth outputs
            with_median=False,
        )

    def _batch(self, camera) -> CameraBatch:
        gt = jnp.moveaxis(jnp.asarray(camera.image, jnp.float32), -1, 0)
        return CameraBatch(
            viewmatrix=jnp.asarray(camera.world_view_transform),
            projmatrix=jnp.asarray(camera.full_proj_transform),
            campos=jnp.asarray(camera.camera_center),
            gt_image=gt,
        )

    def train(self, iterations: Optional[int] = None, log_every: int = 100,
              callback=None):
        cfg = self.cfg
        iters = iterations or cfg.iterations
        settings = self._settings(self.num_entries)
        from gaustudio_tpu.pipelines.dataloader import make_batch_source

        next_batch = make_batch_source(self.cameras, self._batch)
        history = []
        for it in range(1, iters + 1):
            self.state, metrics = train_step_scaffold(
                self.state, next_batch(), settings, cfg,
                self.pcd.n_offsets,
            )
            if (cfg.update_from < it < cfg.update_until
                    and it % cfg.update_interval == 0):
                self.state = adjust_anchors(self.state, cfg, self.pcd)
            if it % log_every == 0 or it == iters:
                m = {kk: float(jnp.asarray(v)) for kk, v in metrics.items()}
                m["iter"] = it
                history.append(m)
                if callback:
                    callback(m)
        return history
