"""Training loop tests: overfitting a synthetic scene + densification logic."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaustudio_tpu import models
from gaustudio_tpu.cameras import camera_paths
from gaustudio_tpu.pipelines import train as T
from gaustudio_tpu.pipelines.train import TrainConfig, Trainer


class _ListDataset(list):
    cameras_extent = 2.0


def _make_gt_scene(seed=0, n=120, size=64):
    """A random gaussian scene rendered from orbit cams as ground truth."""
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
    rgb = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    pcd._opacity = np.full((n, 1), 2.0, np.float32)
    pcd.active_sh_degree = 0

    from gaustudio_tpu import renderers

    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 2.0, elevation=10, num_cam=6, image_size=size, fov_deg=50
    )
    renderer = renderers.make({"name": "vanilla_renderer"})
    for cam in cams:
        out = renderer.render(cam, pcd)
        cam.image = np.moveaxis(np.asarray(out["render"]), 0, -1)
    return pcd, cams


@pytest.mark.slow
@pytest.mark.slow
def test_overfit_improves_psnr():
    gt_pcd, cams = _make_gt_scene()
    # init from perturbed positions/colors
    rng = np.random.default_rng(1)
    pcd = models.make({"name": "vanilla_pcd"})
    xyz0 = np.asarray(gt_pcd._xyz) + rng.normal(size=gt_pcd._xyz.shape).astype(np.float32) * 0.05
    pcd.create_from_attribute(xyz=xyz0, rgb=np.full_like(xyz0, 0.5))
    pcd._opacity = np.full((len(xyz0), 1), 0.0, np.float32)

    cfg = TrainConfig(
        iterations=200,
        densify_from_iter=30,
        densify_until_iter=150,
        densification_interval=50,
        opacity_reset_interval=10000,
        sh_increase_interval=80,
        lr_xyz_init=0.002, lr_xyz_final=0.0005, lr_xyz_max_steps=200,
    )
    trainer = Trainer(pcd, _ListDataset(cams), cfg, num_entries=1 << 14, chunk=512)

    def eval_psnr():
        from gaustudio_tpu.ops import ssim as ssim_ops

        settings = trainer._settings(trainer.num_entries)
        total = 0.0
        for cam in cams[:3]:
            batch = trainer._batch(cam)
            s = settings._replace(
                viewmatrix=batch.viewmatrix, projmatrix=batch.projmatrix,
                campos=batch.campos, bg=jnp.zeros(3),
            )
            out = T.render_from_params(
                trainer.state.params, trainer.state.valid,
                trainer.state.active_sh_degree, s,
            )
            total += float(ssim_ops.psnr(out["render"], batch.gt_image))
        return total / 3

    psnr_before = eval_psnr()
    history = trainer.train(iterations=200, log_every=50)
    psnr_after = eval_psnr()
    assert np.isfinite(history[-1]["loss"])
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    # densification actually ran
    assert history[-1]["num_points"] > 120
    # model write-back works
    out_pcd = T.state_to_model(trainer.state, pcd)
    assert out_pcd.num_points > 0


def _mini_state(n=8, cap=32):
    pcd = models.make({"name": "vanilla_pcd"})
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    pcd.create_from_attribute(xyz=xyz, rgb=np.full((n, 3), 0.5, np.float32),
                              scale=np.full((n, 3), -3.0, np.float32))
    return T.init_state(pcd, capacity=cap)


def test_densify_clone_and_split():
    cfg = TrainConfig(densify_grad_threshold=0.1, percent_dense=0.01)
    state = _mini_state()
    extent = jnp.asarray(1.0)
    # gaussian 0: high grad, small scale -> clone
    # gaussian 1: high grad, large scale -> split
    accum = np.zeros(32, np.float32)
    accum[0] = accum[1] = 10.0
    denom = np.ones(32, np.float32)
    scale = np.asarray(state.params["scale"]).copy()
    scale[1] = np.log(0.5)  # large: 0.5 > 0.01 * 1.0
    scale[0] = np.log(0.001)  # small
    params = dict(state.params)
    params["scale"] = jnp.asarray(scale)
    state = state._replace(
        params=params,
        xyz_grad_accum=jnp.asarray(accum),
        denom=jnp.asarray(denom),
    )
    n_before = int(state.num_points)
    new_state = T.densify_and_prune(
        state, jax.random.PRNGKey(0), extent, cfg, jnp.asarray(False)
    )[0]
    n_after = int(new_state.num_points)
    # clone adds 1; split removes parent and adds 2 -> net +2
    assert n_after == n_before + 2
    # stats reset
    assert float(jnp.sum(new_state.xyz_grad_accum)) == 0.0


def test_densify_prunes_transparent():
    cfg = TrainConfig(min_opacity=0.005)
    state = _mini_state()
    op = np.asarray(state.params["opacity"]).copy()
    op[2] = -10.0  # sigmoid ~ 0 -> prune
    params = dict(state.params)
    params["opacity"] = jnp.asarray(op)
    state = state._replace(params=params)
    n_before = int(state.num_points)
    new_state = T.densify_and_prune(
        state, jax.random.PRNGKey(0), jnp.asarray(1.0), cfg, jnp.asarray(False)
    )[0]
    assert int(new_state.num_points) == n_before - 1
    assert not bool(new_state.valid[2])


def test_reset_opacity():
    state = _mini_state()
    new_state = T.reset_opacity(state)
    op = jax.nn.sigmoid(new_state.params["opacity"][np.asarray(state.valid)])
    assert float(op.max()) <= 0.0101


def test_capacity_growth():
    state = _mini_state(n=8, cap=32)

    class Tr:
        pass

    tr = Tr()
    tr.state = state._replace(valid=jnp.ones(32, bool))
    Trainer.maybe_grow_capacity(tr)
    assert tr.state.valid.shape[0] == 64
    assert int(tr.state.num_points) == 32


def test_checkpoint_roundtrip(tmp_path):
    state = _mini_state()
    # advance once so moments/step are non-trivial
    p = str(tmp_path / "ckpt")
    T.save_checkpoint(p, state)
    back = T.load_checkpoint(p)
    assert int(back.step) == int(state.step)
    np.testing.assert_allclose(np.asarray(back.params["xyz"]),
                               np.asarray(state.params["xyz"]))
    np.testing.assert_array_equal(np.asarray(back.valid), np.asarray(state.valid))


def test_metrics_and_snapshot(tmp_path):
    from gaustudio_tpu.utils.observability import MetricsLogger, snapshot_on_nonfinite

    log = MetricsLogger(str(tmp_path / "m.jsonl"), echo=False)
    log.log(1, loss=0.5, psnr=20.0)
    log.log(2, loss=0.4)
    log.close()
    import json as _json

    lines = [_json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2

    tree = {"a": jnp.ones(3), "b": jnp.asarray([1.0, float("nan")])}
    dump = str(tmp_path / "snap.pkl")
    assert snapshot_on_nonfinite(tree, dump, "test")
    assert os.path.exists(dump)
    assert not snapshot_on_nonfinite({"a": jnp.ones(2)}, str(tmp_path / "no.pkl"))


def test_prefetch_loader():
    from gaustudio_tpu.pipelines.dataloader import PrefetchLoader

    items = list(range(5))
    loader = PrefetchLoader(items, lambda x: jnp.asarray([x]), prefetch=2, seed=0)
    got = [int(next(loader)[0]) for _ in range(10)]
    loader.close()
    assert all(0 <= g < 5 for g in got)

    seq = PrefetchLoader(items, lambda x: jnp.asarray([x]), shuffle=False)
    got = [int(next(seq)[0]) for _ in range(7)]
    seq.close()
    assert got == [0, 1, 2, 3, 4, 0, 1]


def test_entry_capacity_autogrow():
    """When the true intersection count nears/exceeds the static entry
    bucket, the trainer surfaces ``entry_overflow`` and grows the bucket
    before the next step (silent truncation corrupts gradients)."""
    gt_pcd, cams = _make_gt_scene(n=120, size=48)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=np.asarray(gt_pcd._xyz),
        rgb=np.full((gt_pcd.num_points, 3), 0.5, np.float32),
    )
    cfg = TrainConfig(iterations=4, densify_from_iter=1000,
                      densify_until_iter=0)
    trainer = Trainer(pcd, _ListDataset(cams), cfg, num_entries=4096,
                      chunk=256)
    cap0 = trainer.num_entries
    history = trainer.train(iterations=4, log_every=1)
    assert "entry_overflow" in history[0]
    nr = history[0]["num_rendered"]
    if nr > 0.9 * cap0:
        assert trainer.num_entries > cap0
    # re-run at the grown capacity: overflow gone
    if history[0]["entry_overflow"] > 0:
        assert history[-1]["entry_overflow"] == 0
