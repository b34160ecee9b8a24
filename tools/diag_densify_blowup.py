"""Diagnose the at-scale densification blow-up (r3): instrument training
with per-step host checks of viewspace-grad magnitude and parameter
finiteness, dumping the state at the first anomaly for offline repro.

The at-scale runs (docs/runs/r3_train_at_scale) show grad_med (the densify
statistic median) at 28-65 where ~1e-4 is expected, runaway clone/split of
half the cloud every interval, and a mass-NaN wipeout right after the
step-1100 densify. This script reruns the same scene with eyes on.

Usage (TPU): python tools/diag_densify_blowup.py [--iters 1400]
Capture is cached to /tmp/atscale_capture.npz (520s to build, reused).
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build_or_load_capture(size, views):
    from tools.make_atscale_capture import load_capture

    cams = load_capture(size, views)
    if cams is None:
        raise SystemExit(
            f"no capture cache for size={size} views={views}; build it on "
            f"CPU first: python tools/make_atscale_capture.py --size {size} "
            f"--views {views}")
    print(f"capture: loaded {views} cached views", flush=True)
    return cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1400)
    ap.add_argument("--init_points", type=int, default=12000)
    ap.add_argument("--watch_from", type=int, default=1)
    ap.add_argument("--watch_every", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU/XLA (isolates recipe bugs from the "
                         "Pallas kernels; sitecustomize otherwise routes "
                         "everything to the TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.make_fixture import color_fn
    from gaustudio_tpu import models
    from gaustudio_tpu.models.utils import inverse_sigmoid
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.utils.mesh import sample_mesh_surface
    from tools.train_at_scale import scene_mesh_large

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cams = build_or_load_capture(args.size, args.views)
    hold = list(range(0, len(cams), 8))
    train_cams = [c for i, c in enumerate(cams) if i not in hold]

    verts, faces = scene_mesh_large()
    xyz = sample_mesh_surface(verts, faces, args.init_points, seed=3)
    xyz = xyz + np.random.default_rng(5).normal(
        size=xyz.shape).astype(np.float32) * 0.01
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=xyz, rgb=color_fn(xyz),
        opacity=inverse_sigmoid(
            np.full((args.init_points, 1), 0.1, np.float32)),
    )
    pcd.active_sh_degree = 0

    class _DS(list):
        cameras_extent = 3.5

        def export(self, path):
            pass

    cfg = T.TrainConfig(
        iterations=args.iters,
        densify_from_iter=500,
        densify_until_iter=int(7000 * 0.8),
        densification_interval=100,
        densify_grad_threshold=0.0002,
        opacity_reset_interval=3000,
        sh_increase_interval=1000,
        lr_xyz_init=0.00016 * 3.5,
        lr_xyz_final=0.0000016 * 3.5,
        lr_xyz_max_steps=7000,
    )
    trainer = T.Trainer(pcd, _DS(train_cams), cfg, capacity=args.capacity)

    # ---- instrumented loop (mirrors Trainer.train, adds host checks) ----
    from gaustudio_tpu.pipelines.dataloader import make_batch_source

    settings = trainer._settings(trainer.num_entries)
    next_batch = make_batch_source(trainer.cameras, trainer._batch,
                                   use_prefetch=True)

    import gaustudio_tpu.pipelines.train as TT

    # wrap train_step to also return vs-grad stats
    def instrumented_step(state, batch, settings, cfg):
        new_state, metrics = TT.train_step(state, batch, settings, cfg)
        return new_state, metrics

    prev_dump = None
    t0 = time.perf_counter()
    for it in range(1, args.iters + 1):
        batch = next_batch()
        state_before = trainer.state if it >= args.watch_from else None
        trainer.state, metrics = instrumented_step(
            trainer.state, batch, settings, cfg)

        if it % cfg.sh_increase_interval == 0:
            trainer.state = TT.oneup_sh_degree(trainer.state, cfg.max_sh_degree)

        did_densify = False
        if cfg.densify_from_iter < it < cfg.densify_until_iter \
                and it % cfg.densification_interval == 0:
            trainer.key, sub = jax.random.split(trainer.key)
            prune_big = jnp.asarray(it > cfg.opacity_reset_interval)
            pre_state = trainer.state
            trainer.state, dinfo = TT.densify_and_prune(
                trainer.state, sub, jnp.asarray(trainer.extent), cfg,
                prune_big)
            did_densify = True
            trainer.maybe_grow_capacity()

        if it >= args.watch_from and (it % args.watch_every == 0
                                      or did_densify):
            s = trainer.state
            # host sync: check accum + params
            accum = np.asarray(s.xyz_grad_accum)
            denom = np.asarray(s.denom)
            valid = np.asarray(s.valid)
            ratio = accum[valid] / np.maximum(denom[valid], 1.0)
            n_nonfinite = 0
            worst_attr = ""
            for k, v in s.params.items():
                arr = np.asarray(v)
                bad = (~np.isfinite(arr).all(axis=-1)) & valid
                nb = int(bad.sum())
                if nb > n_nonfinite:
                    n_nonfinite, worst_attr = nb, k
            q = (np.percentile(ratio, [50, 90, 99, 100]).round(5).tolist()
                 if ratio.size else [])
            msg = (f"it {it:5d} pts {int(valid.sum()):6d} "
                   f"loss {float(metrics['loss']):.4f} "
                   f"psnr {float(metrics['psnr']):.2f} "
                   f"nr {int(metrics['num_rendered']):7d} "
                   f"accum/denom q50/90/99/max {q} "
                   f"nonfinite {n_nonfinite} {worst_attr}")
            if did_densify:
                msg += (f" | densify clone {int(dinfo['n_clone'])} "
                        f"split {int(dinfo['n_split'])} "
                        f"pr_op {int(dinfo['n_prune_opacity'])} "
                        f"grad_med {float(dinfo['grad_med']):.5f}")
            print(msg, flush=True)

            if n_nonfinite > 0 or (ratio.size and ratio.max() > 1e3):
                dump = {
                    "iter": it,
                    "params": {k: np.asarray(v) for k, v in s.params.items()},
                    "valid": valid,
                    "accum": accum,
                    "denom": denom,
                    "batch": {f: np.asarray(getattr(batch, f))
                              for f in batch._fields},
                    "active_sh_degree": int(np.asarray(s.active_sh_degree)),
                }
                if state_before is not None:
                    dump["params_before"] = {
                        k: np.asarray(v)
                        for k, v in state_before.params.items()}
                    dump["valid_before"] = np.asarray(state_before.valid)
                if prev_dump is None:  # keep only the FIRST anomaly state
                    prev_dump = dump
                    with open("/tmp/blowup_dump.pkl", "wb") as f:
                        pickle.dump(dump, f)
                    print(f"ANOMALY at iter {it}: dumped "
                          f"/tmp/blowup_dump.pkl", flush=True)
                if n_nonfinite > 0:
                    break
    next_batch.close()
    print(f"done in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
