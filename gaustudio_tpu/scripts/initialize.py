"""gs-init: pose + geometry initialization for a new capture.

CLI port of gaustudio/scripts/initialize_gs.py:121-221: dataset -> pose
initializer (hloc with colmap fallback) -> optional geometry initializer
(depth / VisualHull / mesh / voxel / tsdf) -> sparse/0/points3D.ply.
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="colmap")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--output_dir", "-o", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--initializer", default=None,
                        choices=[None, "depth", "VisualHull", "mesh", "voxel", "tsdf"],
                        help="optional geometry initializer")
    parser.add_argument("--mesh_path", default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--w_mask", "-w", action="store_true")
    parser.add_argument("--resolution", "-r", default=1, type=int)
    args, extras = parser.parse_known_args()

    from gaustudio_tpu import datasets, models
    from gaustudio_tpu.config import load_config
    from gaustudio_tpu.pipelines import initializers
    from gaustudio_tpu.utils.mesh import load_mesh

    if not os.path.exists(args.source_path):
        raise FileNotFoundError(f"Source path not found: {args.source_path}")
    if args.initializer in ("mesh", "voxel") and not args.mesh_path:
        raise ValueError(f"{args.initializer} initializer requires --mesh_path")

    dataset = datasets.make(
        {"name": args.dataset, "source_path": args.source_path,
         "w_mask": args.w_mask, "camera_number": 1}
    )
    if args.resolution > 1:
        dataset.downsample_scale(args.resolution)

    custom = load_config(args.config) if args.config else {}

    # pose initialization: hloc -> colmap fallback (initialize_gs.py:52-78)
    pcd = models.make("general_pcd")
    final_pcd = None
    for name in ("hloc", "colmap"):
        cfg = {"name": name, "workspace_dir": args.output_dir}
        cfg.update(custom.get("pose_initializer", {}) if custom else {})
        try:
            final_pcd = initializers.make(cfg)(pcd, dataset, overwrite=args.overwrite)
            print(f"Pose initialization completed using {name}")
            break
        except Exception as e:
            print(f"Error with {name} pose initializer: {e}")
    if final_pcd is None:
        raise SystemExit("All pose initializers failed")

    # optional geometry initializer (initialize_gs.py:185-215)
    if args.initializer:
        cfg = {"name": args.initializer, "workspace_dir": args.output_dir}
        cfg.update(custom.get("geometry_initializer", {}) if custom else {})
        init = initializers.make(cfg)
        if args.initializer in ("mesh", "voxel"):
            mesh = load_mesh(args.mesh_path)
            final_pcd = init(models.make("general_pcd"), mesh=mesh,
                             dataset=dataset, overwrite=args.overwrite)
        else:
            final_pcd = init(models.make("general_pcd"), dataset,
                             overwrite=args.overwrite)

    out = os.path.join(args.output_dir, "sparse", "0", "points3D.ply")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    final_pcd.export(out)
    dataset.export(os.path.join(args.output_dir, "cameras.json"))
    print(f"Point cloud exported to: {out}")


if __name__ == "__main__":
    main()
