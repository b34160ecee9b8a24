"""gs-from-mesh: convert a triangle mesh into a Gaussian checkpoint.

CLI port of gaustudio/scripts/mesh2gs.py:36-90 (SuGaR-style barycentric
placement, 3 Gaussians per triangle, SH degree 1).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", "-m", required=True, help="input mesh (.ply)")
    parser.add_argument("--output_path", "-o", required=True)
    parser.add_argument("--n_per_triangle", "-n", default=3, type=int,
                        choices=[1, 3, 4, 6])
    args = parser.parse_args()

    from gaustudio_tpu import models
    from gaustudio_tpu.pipelines import initializers
    from gaustudio_tpu.utils.ply import read_ply

    data = read_ply(args.mesh)
    v = data["vertex"]
    vertices = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    faces = np.asarray(data["face"]["vertex_indices"], np.int64)
    colors = None
    if "red" in v:
        colors = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32)
        if colors.max() > 1.0:
            colors /= 255.0
    else:
        print("No vertex colors found. Using a uniform color.")
        colors = np.full((len(vertices), 3), 0.5, np.float32)

    gaussians = models.make({"name": "vanilla_pcd", "sh_degree": 1})
    init = initializers.make(
        {"name": "mesh", "n_gaussians_per_triangle": args.n_per_triangle}
    )
    init(gaussians, mesh=(vertices, faces, colors))
    gaussians.export(args.output_path)
    print(f"Gaussians exported to {args.output_path}")


if __name__ == "__main__":
    main()
