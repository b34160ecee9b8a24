"""ScaffoldRenderer — neural anchor decode -> standard rasterization.

Port of gaustudio/renderers/scaffold_renderer.py:10-210 with static-shape
masking: the torch code gathers positive-opacity offsets (:119-156); here
negative-opacity offsets keep their slots with opacity clamped to 0, which
the rasterizer's alpha threshold culls identically.  The anchor prefilter
(:31-86, which calls a nonexistent ``rasterizer.visible_filter`` upstream)
is realized with the frustum mark_visible test.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaustudio_tpu import renderers
from gaustudio_tpu.ops.gaussian import mark_visible
from gaustudio_tpu.renderers.base import BaseRenderer


@renderers.register("scaffold_renderer")
class ScaffoldRenderer(BaseRenderer):
    # the anchor decode (view direction + feature bank) is camera-dependent:
    # properties cannot be hoisted over a camera-DP batch
    view_dependent_gaussians = True
    default_conf = {
        "kernel_size": 0.0,
        "scaling_modifier": 1.0,
        "white_background": False,
        "debug": False,
    }

    def __init__(self, config=None) -> None:
        super().__init__(config)
        self.scaling_modifier = self.config["scaling_modifier"]
        self.white_background = self.config["white_background"]
        self.bg_color = (
            jnp.ones(3, jnp.float32) if self.white_background else jnp.zeros(3, jnp.float32)
        )
        self.debug = self.config["debug"]

    def get_gaussians_properties(self, viewpoint_camera, gaussian_model):
        """scaffold_renderer.py:87-160 (static-shape variant)."""
        anchor = gaussian_model.get_attribute("anchor")
        feat = gaussian_model.get_attribute("anchor_feat")
        grid_offsets = gaussian_model.get_attribute("offset")
        grid_scaling = gaussian_model.get_attribute("scale")  # exp-activated [N,6]
        n = anchor.shape[0]
        k = gaussian_model.n_offsets

        visible = mark_visible(
            anchor,
            jnp.asarray(viewpoint_camera.world_view_transform),
        )

        ob_view = anchor - jnp.asarray(viewpoint_camera.camera_center)[None, :]
        ob_dist = jnp.linalg.norm(ob_view, axis=1, keepdims=True)
        ob_view = ob_view / jnp.maximum(ob_dist, 1e-9)

        if gaussian_model.use_feat_bank:
            bank = gaussian_model.mlp_feature_bank(
                jnp.concatenate([ob_view, ob_dist], axis=1)
            )[:, None, :]
            f = feat[..., None]
            feat = (
                jnp.repeat(f[:, ::4, :1], 4, axis=1) * bank[:, :, :1]
                + jnp.repeat(f[:, ::2, :1], 2, axis=1) * bank[:, :, 1:2]
                + f[:, ::1, :1] * bank[:, :, 2:]
            )[..., 0]

        cat_local = jnp.concatenate([feat, ob_view, ob_dist], axis=1)

        neural_opacity = gaussian_model.mlp_opacity(cat_local).reshape(-1)  # [N*k]
        # static-shape mask: non-positive opacities (and culled anchors) -> 0
        vis_rep = jnp.repeat(visible, k)
        opacity = jnp.where((neural_opacity > 0.0) & vis_rep, neural_opacity, 0.0)

        color = gaussian_model.mlp_color(cat_local).reshape(n * k, 3)
        scale_rot = gaussian_model.mlp_cov(cat_local).reshape(n * k, 7)

        offsets = grid_offsets.reshape(n * k, 3)
        scaling_rep = jnp.repeat(grid_scaling, k, axis=0)  # [N*k, 6]
        anchor_rep = jnp.repeat(anchor, k, axis=0)

        scales = scaling_rep[:, 3:] * (1.0 / (1.0 + jnp.exp(-scale_rot[:, :3])))
        rotations = scale_rot[:, 3:7] / jnp.maximum(
            jnp.linalg.norm(scale_rot[:, 3:7], axis=-1, keepdims=True), 1e-9
        )
        xyz = anchor_rep + offsets * scaling_rep[:, :3]
        return xyz, None, color, opacity, scales, rotations, None
