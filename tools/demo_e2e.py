"""End-to-end demo on the real TPU: train -> eval PSNR -> extract mesh.

A self-contained synthetic multi-view capture (a gaussian-splat "object"
rendered from an orbit is the ground truth), trained from a perturbed init
with full densification, evaluated for PSNR, then surfaced with the TSDF
mesh extractor — the gs-train + gs-extract-mesh pipeline without dataset
files. Prints a JSON summary; numbers go to PLAN.md.

Usage: python tools/demo_e2e.py [--size 256] [--iters 1500] [--n 5000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_capture(n, size, num_cam=24, seed=0):
    """Ground-truth scene: a blobby 'object' of n gaussians on a sphere
    surface + interior, rendered from an orbit."""
    from gaustudio_tpu import models, renderers
    from gaustudio_tpu.cameras import camera_paths

    rng = np.random.default_rng(seed)
    # surface shell + some volume fill
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radius = np.where(rng.uniform(size=n) < 0.7,
                      0.5 + 0.04 * rng.normal(size=n),
                      rng.uniform(0.1, 0.5, size=n)).astype(np.float32)
    # low-frequency bumps so views have structure
    bump = 0.08 * np.sin(3 * dirs[:, 0]) * np.cos(4 * dirs[:, 1])
    xyz = dirs * (radius + bump.astype(np.float32))[:, None]
    rgb = (0.5 + 0.45 * np.stack([
        np.sin(5 * xyz[:, 0]), np.cos(7 * xyz[:, 1]), np.sin(6 * xyz[:, 2]),
    ], axis=1)).clip(0.05, 0.95).astype(np.float32)

    gt = models.make({"name": "vanilla_pcd"})
    gt.create_from_attribute(xyz=xyz, rgb=rgb)
    gt._opacity = np.full((n, 1), 3.0, np.float32)
    gt.active_sh_degree = 0

    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 1.8, elevation=15, num_cam=num_cam, image_size=size,
        fov_deg=50,
    )
    renderer = renderers.make({"name": "vanilla_renderer"})
    for cam in cams:
        out = renderer.render(cam, gt)
        cam.image = np.moveaxis(np.asarray(out["render"]), 0, -1)
    return gt, cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--out", default="/tmp/demo_e2e")
    args = ap.parse_args()

    from gaustudio_tpu import models
    from gaustudio_tpu.ops import ssim as ssim_ops
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.pipelines.train import TrainConfig, Trainer

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    t0 = time.perf_counter()
    gt_pcd, cams = make_capture(args.n, args.size)
    print(f"capture: {len(cams)} views {args.size}px "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    class _DS(list):
        cameras_extent = 2.0

        def export(self, path):
            pass

    rng = np.random.default_rng(1)
    n0 = args.n // 4
    pcd = models.make({"name": "vanilla_pcd"})
    xyz0 = rng.uniform(-0.6, 0.6, size=(n0, 3)).astype(np.float32)
    pcd.create_from_attribute(xyz=xyz0, rgb=np.full((n0, 3), 0.5, np.float32))

    cfg = TrainConfig(
        iterations=args.iters,
        densify_from_iter=200,
        densify_until_iter=int(args.iters * 0.8),
        densification_interval=100,
        opacity_reset_interval=10 ** 9,
        sh_increase_interval=500,
        lr_xyz_init=0.0016, lr_xyz_final=0.00016,
        lr_xyz_max_steps=args.iters,
    )
    # generous capacity + entry margin: zero mid-run recompiles (first
    # compiles are minutes on the remote-compile TPU backend)
    trainer = Trainer(pcd, _DS(cams), cfg, capacity=1 << 16)

    def eval_psnr():
        settings = trainer._settings(trainer.num_entries)
        total = 0.0
        k = min(4, len(cams))
        for cam in cams[:k]:
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
        return total / k

    psnr0 = eval_psnr()
    print(f"PSNR before: {psnr0:.2f}", flush=True)

    # warm up the train-step compile outside the timed loop (first compile
    # is minutes on the remote-compile backend and would dominate ms/it)
    t0 = time.perf_counter()
    trainer.train(iterations=1, log_every=1)
    print(f"warmup (compile): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    hist = trainer.train(iterations=args.iters, log_every=200,
                         callback=lambda m: print(
                             f"  iter {m['iter']:5d} loss {m['loss']:.4f} "
                             f"psnr {m['psnr']:.2f} pts {int(m['num_points'])}",
                             flush=True))
    train_s = time.perf_counter() - t0
    ms_it = train_s / args.iters * 1e3
    psnr1 = eval_psnr()
    print(f"PSNR after: {psnr1:.2f}  ({ms_it:.1f} ms/it)", flush=True)

    # mesh extraction from the trained model
    from gaustudio_tpu import renderers
    from gaustudio_tpu.pipelines import mesh_extraction as ME

    os.makedirs(args.out, exist_ok=True)
    T.state_to_model(trainer.state, pcd)
    renderer = renderers.make({"name": "vanilla_renderer"})
    t0 = time.perf_counter()
    verts, faces = ME.extract_mesh(
        pcd, renderer, cams, voxel_size=0.02, sdf_trunc=0.08,
        min_weight=2.0, stride=2, downsample=1,
    )[:2]
    mesh_s = time.perf_counter() - t0
    print(f"mesh: {len(verts)} verts {len(faces)} faces ({mesh_s:.1f}s)",
          flush=True)

    # geometric sanity: mesh vertices should hug the GT surface shell
    if len(verts):
        r = np.linalg.norm(np.asarray(verts), axis=1)
        med_r = float(np.median(r))
    else:
        med_r = float("nan")

    summary = {
        "views": len(cams), "size": args.size, "iters": args.iters,
        "psnr_before": round(psnr0, 2), "psnr_after": round(psnr1, 2),
        "train_ms_per_iter": round(ms_it, 1),
        "final_points": int(np.asarray(trainer.state.num_points)),
        "mesh_verts": int(len(verts)), "mesh_median_radius": round(med_r, 3),
        "mesh_seconds": round(mesh_s, 1),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
