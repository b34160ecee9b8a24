"""Build (and cache) the at-scale multi-view capture on CPU.

The capture (procedural textured mesh rendered from orbit rings with the
JAX mesh rasterizer) does not need the TPU; building it in a CPU-pinned
process keeps the single TPU claim free for the training run, and the
.npz cache makes repeated training experiments start in seconds instead
of ~9 minutes.

NOTE the container's sitecustomize force-selects the axon TPU backend
regardless of JAX_PLATFORMS; the config update below (the tests/conftest
trick) must run before any backend init.

Usage: python tools/make_atscale_capture.py [--size 512] [--views 64]
Cache: /tmp/atscale_capture_{size}_{views}.npz
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def cache_path(size, views, rich=False, kind=None):
    kind = kind or ("rich" if rich else "large")
    # bench2: 67-freq finest octave + (26, 44) elevation rings
    tag = {"large": "", "rich": "_rich", "bench": "_bench2"}[kind]
    return f"/tmp/atscale_capture_{size}_{views}{tag}.npz"


def load_capture(size, views, rich=False, kind=None):
    """Return the cams (with .image set) for a cached capture, or None."""
    from tools.train_at_scale import ORBITS, orbit_rings

    kind = kind or ("rich" if rich else "large")
    path = cache_path(size, views, kind=kind)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    cams = orbit_rings(size, views, **ORBITS[kind])
    for i, cam in enumerate(cams):
        cam.image = data[f"img{i}"]
    return cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--rich", action="store_true")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    kind = "bench" if args.bench else ("rich" if args.rich else "large")

    from tools.train_at_scale import (
        ORBITS, orbit_rings, render_gt, scene_mesh_bench, scene_mesh_large,
        scene_mesh_rich,
    )

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    t0 = time.perf_counter()
    if kind == "large":
        from tools.make_fixture import color_fn as col_fn
    elif kind == "bench":
        from tools.train_at_scale import color_fn_bench as col_fn
    else:
        from tools.train_at_scale import color_fn_rich as col_fn
    verts, faces = {"large": scene_mesh_large, "rich": scene_mesh_rich,
                    "bench": scene_mesh_bench}[kind]()
    cams = orbit_rings(args.size, args.views, **ORBITS[kind])
    images = render_gt(verts, faces, cams, col_fn=col_fn,
                       per_pixel=kind != "large")
    path = cache_path(args.size, args.views, kind=kind)
    np.savez(path, size=args.size, views=args.views,
             **{f"img{i}": im for i, im in enumerate(images)})
    print(f"capture: {len(cams)} views {args.size}px -> {path} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
