"""2DGS surfel training test: overfit improves PSNR with regularizers on."""

import pytest
import numpy as np
import jax.numpy as jnp

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import camera_paths
from gaustudio_tpu.pipelines.train import TrainConfig
from gaustudio_tpu.pipelines.train_surfel import SurfelTrainConfig, SurfelTrainer


class _ListDataset(list):
    cameras_extent = 2.0


@pytest.mark.slow
def test_surfel_overfit():
    rng = np.random.default_rng(0)
    n = 150
    # a flat-ish disk of surfels as GT
    xy = rng.normal(size=(n, 2)).astype(np.float32) * 0.35
    xyz = np.concatenate([xy, rng.normal(size=(n, 1)).astype(np.float32) * 0.02], 1)
    gt = models.make({
        "name": "vanilla_pcd",
        "attributes": {"xyz": 3, "opacity": 1, "f_dc": 3, "f_rest": 45,
                        "scale": 2, "rot": 4},
    })
    gt.create_from_attribute(
        xyz=xyz, rgb=rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32),
        scale=np.full((n, 2), -2.3, np.float32),
    )
    gt._opacity = np.full((n, 1), 2.0, np.float32)
    gt.active_sh_degree = 0

    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 2.0, elevation=25, num_cam=5, image_size=48, fov_deg=55
    )
    r = renderers.make({"name": "surfel_renderer"})
    for cam in cams:
        out = r.render(cam, gt)
        cam.image = np.moveaxis(np.asarray(out["render"]), 0, -1)

    # init: same geometry, wrong colors
    pcd = models.make({
        "name": "vanilla_pcd",
        "attributes": {"xyz": 3, "opacity": 1, "f_dc": 3, "f_rest": 45,
                        "scale": 2, "rot": 4},
    })
    pcd.create_from_attribute(xyz=xyz, rgb=np.full((n, 3), 0.5, np.float32),
                              scale=np.full((n, 2), -2.3, np.float32))

    cfg = SurfelTrainConfig(
        base=TrainConfig(densify_from_iter=20, densify_until_iter=60,
                         densification_interval=30,
                         opacity_reset_interval=100000,
                         sh_increase_interval=100000,
                         lr_xyz_init=0.001, lr_xyz_final=0.0005,
                         lr_xyz_max_steps=100),
        lambda_normal=0.02, lambda_dist=0.001,
    )
    trainer = SurfelTrainer(pcd, _ListDataset(cams), cfg, num_entries=1 << 13,
                            chunk=512)

    def eval_psnr():
        from gaustudio_tpu.ops import ssim as ssim_ops
        from gaustudio_tpu.pipelines.train_surfel import render_surfels_from_params

        settings = trainer._settings(trainer.num_entries)
        total = 0.0
        for cam in cams[:3]:
            b = trainer._batch(cam)
            s2 = settings._replace(viewmatrix=b.viewmatrix, projmatrix=b.projmatrix,
                                   campos=b.campos, bg=jnp.zeros(3))
            out = render_surfels_from_params(
                trainer.state.params, trainer.state.valid,
                trainer.state.active_sh_degree, s2,
            )
            total += float(ssim_ops.psnr(out["render"], b.gt_image))
        return total / 3

    before = eval_psnr()
    history = trainer.train(iterations=120, log_every=30)
    after = eval_psnr()
    assert np.isfinite(history[-1]["loss"])
    assert after > before + 2.0, (before, after)
    assert history[-1]["normal_loss"] >= 0
    assert history[-1]["dist_loss"] >= 0
