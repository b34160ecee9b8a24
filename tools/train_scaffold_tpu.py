"""First on-chip Scaffold-GS training run (VERDICT r2 weak #7).

Same procedural textured-mesh capture as tools/train_at_scale.py at a
moderate scale, trained with the scaffold trainer (anchor-MLP decode +
anchor growing/pruning) on the TPU, with held-out PSNR evaluation.
Artifacts go to docs/runs/ as committed evidence.

Usage (TPU): python tools/train_scaffold_tpu.py [--size 256] [--iters 2000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from tools.train_at_scale import scene_mesh_large, orbit_rings, render_gt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--holdout_every", type=int, default=6)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--anchors", type=int, default=6000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "runs", "r3_scaffold_tpu"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaustudio_tpu import models, renderers
    from gaustudio_tpu.ops import ssim as ssim_ops
    from gaustudio_tpu.pipelines import train_scaffold as TSc
    from gaustudio_tpu.utils.mesh import sample_mesh_surface

    os.makedirs(args.out, exist_ok=True)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    t0 = time.perf_counter()
    verts, faces = scene_mesh_large()
    cams = orbit_rings(args.size, args.views)
    images = render_gt(verts, faces, cams)
    for cam, img in zip(cams, images):
        cam.image = img
    print(f"capture: {len(cams)} views {args.size}px "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    hold = list(range(0, len(cams), args.holdout_every))
    train_cams = [c for i, c in enumerate(cams) if i not in hold]
    test_cams = [cams[i] for i in hold]

    pts = sample_mesh_surface(verts, faces, args.anchors, seed=7)
    model = models.make({"name": "scaffold_pcd", "n_offsets": 5,
                         "voxel_size": 0.02})
    model.create_from_attribute(xyz=pts)

    cfg = TSc.ScaffoldTrainConfig(
        iterations=args.iters,
        update_from=400,
        update_until=int(args.iters * 0.8),
        update_interval=100,
        lr_offset_max_steps=args.iters,
    )
    trainer = TSc.ScaffoldTrainer(model, train_cams, cfg)

    renderer = renderers.make({"name": "scaffold_renderer"})

    def eval_holdout():
        TSc.state_to_scaffold_model(trainer.state, model)
        vals = []
        for cam in test_cams:
            out = renderer.render(cam, model)
            gt = jnp.moveaxis(jnp.asarray(cam.image), -1, 0)
            vals.append(float(ssim_ops.psnr(out["render"], gt)))
        return float(np.mean(vals)), [round(v, 2) for v in vals]

    psnr0, _ = eval_holdout()
    print(f"held-out PSNR before: {psnr0:.2f}", flush=True)

    t0 = time.perf_counter()
    trainer.train(iterations=1, log_every=1)
    print(f"warmup (compile): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    hist = trainer.train(iterations=args.iters, log_every=100,
                         callback=lambda m: print(
                             f"  iter {m['iter']:5d} loss {m['loss']:.4f} "
                             f"psnr {m['psnr']:.2f} "
                             f"anchors {int(m.get('num_points', -1))}",
                             flush=True))
    train_s = time.perf_counter() - t0
    ms_it = train_s / args.iters * 1e3

    psnr1, per_view = eval_holdout()
    anchors1 = int(np.asarray(trainer.state.num_anchors))
    print(f"held-out PSNR after: {psnr1:.2f}  anchors {anchors1}  "
          f"({ms_it:.1f} ms/it)", flush=True)

    summary = {
        "views_train": len(train_cams), "views_heldout": len(test_cams),
        "size": args.size, "iters": args.iters,
        "init_anchors": args.anchors, "final_anchors": anchors1,
        "psnr_heldout_before": round(psnr0, 2),
        "psnr_heldout_after": round(psnr1, 2),
        "psnr_heldout_per_view": per_view,
        "train_ms_per_iter": round(ms_it, 2),
        "train_wall_s": round(train_s, 1),
        "loss_first": round(hist[0]["loss"], 4),
        "loss_last": round(hist[-1]["loss"], 4),
        "platform": jax.devices()[0].platform,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    assert np.isfinite(hist[-1]["loss"]) and hist[-1]["loss"] < hist[0]["loss"]
    assert psnr1 > psnr0, "scaffold training did not improve held-out PSNR"
    print("SCAFFOLD TPU TRAIN OK", flush=True)


if __name__ == "__main__":
    main()
