"""gs-process-data: run an initializer over a dataset.

CLI port of gaustudio/scripts/process_data.py:12-44.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="colmap",
                        help="dataset name (polycam, mvsnet, nerf, scannet, waymo, ...)")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--output_dir", "-o", required=True)
    parser.add_argument("--init", default="colmap",
                        help="initializer name (colmap, loftr, dust3r, depth, ...)")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--w_mask", "-w", action="store_true")
    parser.add_argument("--resolution", "-r", default=1, type=int)
    args = parser.parse_args()

    from gaustudio_tpu import datasets, models
    from gaustudio_tpu.pipelines import initializers

    dataset = datasets.make(
        {"name": args.dataset, "source_path": args.source_path,
         "w_mask": args.w_mask, "camera_number": 1}
    )
    if args.resolution > 1:
        dataset.downsample_scale(args.resolution)
    pcd = models.make("general_pcd")
    init = initializers.make({"name": args.init, "workspace_dir": args.output_dir})
    init(pcd, dataset, overwrite=args.overwrite)


if __name__ == "__main__":
    main()
