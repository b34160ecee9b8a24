"""gs-train: full 3DGS training (the loop the reference leaves unimplemented).

Trains a vanilla Gaussian model on a COLMAP / nerf / vanilla dataset and
writes the Inria checkpoint layout (point_cloud/iteration_N/point_cloud.ply
+ cameras.json) that every other gs-* tool consumes.
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="vanilla")
    parser.add_argument("--gpu", default="0", help="CLI parity (unused on TPU)")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--output-dir", "-o", required=True)
    parser.add_argument("--iterations", default=30000, type=int)
    parser.add_argument("--resolution", default=1, type=int)
    parser.add_argument("--dataset", default="colmap",
                        help="dataset registry name (colmap/nerf/vanilla/...)")
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--save_every", default=7000, type=int)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--init_points", default=50000, type=int,
                        help="random-init point count when no sparse points exist")
    parser.add_argument("--resume", default=None,
                        help="orbax checkpoint dir (output_dir/ckpt/step_N) "
                             "to restore full training state from (vanilla)")
    parser.add_argument("--no_dp", action="store_true",
                        help="force single-device training even when "
                             "multiple chips are visible")
    parser.add_argument("--gs_shards", default=None, type=int,
                        help="gaussian-axis shard count for multi-device "
                             "training (default: 2 when device count is "
                             "even, else 1)")
    parser.add_argument("--checkpoint_every", default=0, type=int,
                        help="save a full orbax training checkpoint "
                             "(params + Adam moments + step) every N iters")
    args, extras = parser.parse_known_args()

    import numpy as np

    from gaustudio_tpu import datasets, models
    from gaustudio_tpu.config import builtin_config_path, load_config
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.utils.ply import fetch_ply

    config_path = args.config if os.path.exists(args.config) else builtin_config_path(args.config)
    config = load_config(config_path, cli_args=extras)

    dataset = datasets.make(
        {"name": args.dataset, "source_path": args.source_path,
         "resolution": args.resolution}
    )
    if args.resolution > 1 and args.dataset != "colmap":
        dataset.downsample_scale(args.resolution)

    pcd = models.make(config["model"]["pointcloud"])
    model_name = config["model"]["pointcloud"].get("name", "vanilla_pcd")
    sparse_ply = os.path.join(args.source_path, "sparse", "0", "points3D.ply")
    if os.path.exists(sparse_ply):
        xyz, rgb, _ = fetch_ply(sparse_ply)
        pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    else:
        # fall back to COLMAP points3D.bin or random init in the scene box
        bin_path = os.path.join(args.source_path, "sparse", "0", "points3D.bin")
        if os.path.exists(bin_path):
            from gaustudio_tpu.datasets.utils import read_points3D_binary

            xyz, rgb, _ = read_points3D_binary(bin_path)
            pcd.create_from_attribute(xyz=xyz, rgb=rgb / 255.0)
        else:
            n0 = args.init_points
            print(f"No sparse points found; random init of {n0} points")
            rng = np.random.default_rng(args.seed)
            r = dataset.cameras_extent
            xyz = rng.uniform(-r / 2, r / 2, (n0, 3)).astype(np.float32)
            pcd.create_from_attribute(xyz=xyz, rgb=np.full((n0, 3), 0.5, np.float32))

    tr_conf = config.get("trainer", {})
    cfg = T.TrainConfig(
        iterations=args.iterations,
        lambda_dssim=float(tr_conf.get("lambda_dssim", 0.2)),
        densify_from_iter=int(tr_conf.get("densify_from_iter", 500)),
        densify_until_iter=int(tr_conf.get("densify_until_iter", 15000)),
        densification_interval=int(tr_conf.get("densification_interval", 100)),
        densify_grad_threshold=float(tr_conf.get("densify_grad_threshold", 0.0002)),
        opacity_reset_interval=int(tr_conf.get("opacity_reset_interval", 3000)),
        percent_dense=float(tr_conf.get("percent_dense", 0.01)),
        white_background=args.white_background,
    )
    # 2DGS configs route to the surfel trainer (ray-splat rasterizer +
    # normal/distortion regularizers); scaffold configs to the neural-anchor
    # trainer with anchor growing; everything else uses the vanilla step.
    renderer_name = config.get("renderer", {}).get("name", "vanilla_renderer")
    if model_name == "scaffold_pcd":
        from gaustudio_tpu.pipelines import train_scaffold as TSc

        opt_params = config.get("optimizer", {}).get("params", {}) or {}

        def _lr(name, default):
            return float(opt_params.get(name, {}).get("lr", default))

        sccfg = TSc.ScaffoldTrainConfig(
            iterations=args.iterations,
            lambda_dssim=float(tr_conf.get("lambda_dssim", 0.2)),
            lambda_vol=float(tr_conf.get("lambda_vol", 0.01)),
            lr_anchor=_lr("anchor", 0.0),
            lr_offset_init=_lr("offset", 0.01),
            lr_feat=_lr("anchor_feat", 0.0075),
            lr_scale=_lr("scale", 0.007),
            lr_rot=_lr("rot", 0.002),
            start_stat=int(tr_conf.get("start_stat", 500)),
            update_from=int(tr_conf.get("update_from", 1500)),
            update_interval=int(tr_conf.get("update_interval", 100)),
            update_until=int(tr_conf.get("update_until", 15000)),
            grad_threshold=float(tr_conf.get("densify_grad_threshold", 0.0002)),
            min_opacity=float(tr_conf.get("min_opacity", 0.005)),
            success_threshold=float(tr_conf.get("success_threshold", 0.8)),
            white_background=args.white_background,
        )
        trainer = TSc.ScaffoldTrainer(pcd, dataset, sccfg, seed=args.seed)
        if args.resume or args.checkpoint_every:
            print("WARNING: --resume/--checkpoint_every are not supported "
                  "for scaffold configs (anchor+MLP state); use the model "
                  "config's resume_path to reload a ply")

        def save(iteration):
            out = os.path.join(args.output_dir, "point_cloud",
                               f"iteration_{iteration}")
            os.makedirs(out, exist_ok=True)
            TSc.state_to_scaffold_model(trainer.state, pcd)
            pcd.export(os.path.join(out, "point_cloud.ply"))
            dataset.export(os.path.join(args.output_dir, "cameras.json"))

        def log(m):
            print(
                f"iter {m['iter']:6d}  loss {m['loss']:.4f}  "
                f"psnr {m['psnr']:.2f}  anchors {int(m['num_points'])}",
                flush=True,
            )
            if m["iter"] % args.save_every == 0:
                save(m["iter"])

        trainer.train(iterations=args.iterations, log_every=100, callback=log)
        save(args.iterations)
        print(f"Training done -> {args.output_dir}")
        return
    if renderer_name == "surfel_renderer":
        from gaustudio_tpu.pipelines import train_surfel as TS

        scfg = TS.SurfelTrainConfig(
            base=cfg,
            lambda_normal=float(tr_conf.get("lambda_normal", 0.05)),
            lambda_dist=float(tr_conf.get("lambda_dist", 0.0)),
        )
        trainer = TS.SurfelTrainer(pcd, dataset, scfg, seed=args.seed)
    else:
        import jax

        n_dev = len(jax.devices())
        if n_dev > 1 and not args.no_dp:
            # multi-chip flagship path: camera-DP x gaussian-axis sharded
            # step with the full densify schedule (parallel/train_dp.py)
            from gaustudio_tpu.parallel import make_mesh
            from gaustudio_tpu.parallel.train_dp import DPTrainer

            gs_ax = 2 if n_dev % 2 == 0 and args.gs_shards is None else (
                args.gs_shards or 1)
            if n_dev % gs_ax != 0:
                gs_ax = 1
            mesh = make_mesh(dp=n_dev // gs_ax, gs=gs_ax)
            trainer = DPTrainer(pcd, dataset, cfg, mesh=mesh, seed=args.seed)
            print(f"Multi-device training: dp={n_dev // gs_ax} x gs={gs_ax}")
        else:
            trainer = T.Trainer(pcd, dataset, cfg, seed=args.seed)
    if args.resume:
        # full-state resume (params + Adam moments + densify stats + step)
        # — beyond the reference's ply-only `resume_path`; applies to both
        # the vanilla and 2DGS trainers (same state pytree). ``--iterations``
        # stays the ABSOLUTE target: schedules and checkpoint names align
        # with uninterrupted training.
        trainer.restore(args.resume)
        print(f"Resumed training state from {args.resume} "
              f"(step {int(trainer.state.step)}, "
              f"{int(np.asarray(trainer.state.valid).sum())} points)")
        if int(trainer.state.step) >= args.iterations:
            print("WARNING: restored step >= --iterations; nothing to train")

    def save(iteration):
        out = os.path.join(args.output_dir, "point_cloud", f"iteration_{iteration}")
        os.makedirs(out, exist_ok=True)
        st = (trainer.host_state() if hasattr(trainer, "host_state")
              else trainer.state)
        T.state_to_model(st, pcd)
        pcd.export(os.path.join(out, "point_cloud.ply"))
        dataset.export(os.path.join(args.output_dir, "cameras.json"))

    def log(m):
        print(
            f"iter {m['iter']:6d}  loss {m['loss']:.4f}  psnr {m['psnr']:.2f}  "
            f"points {int(m['num_points'])}",
            flush=True,
        )
        if m["iter"] % args.save_every == 0:
            save(m["iter"])

    ckpt_kw = {}
    if args.checkpoint_every:
        ckpt_kw = dict(checkpoint_dir=os.path.join(args.output_dir, "ckpt"),
                       checkpoint_every=args.checkpoint_every)
    trainer.train(iterations=args.iterations, log_every=100, callback=log,
                  **ckpt_kw)
    save(args.iterations)
    print(f"Training done -> {args.output_dir}")


if __name__ == "__main__":
    main()
