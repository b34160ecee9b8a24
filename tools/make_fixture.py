"""Generate the checked-in real-data-style golden fixture.

Builds a deterministic textured mesh scene (icosphere + cube), renders a
multi-view capture with the repo's own mesh rasterizer, fits a gaussian
model to it, and stores everything a `vanilla`-format dataset needs —
images/ + cameras.json + sparse points + gaussian ply + GT mesh — plus
GOLDEN.json with the reference PSNR / mesh-F1 numbers the integration
tests assert against (VERDICT round-1 item 4: BASELINE configs 1-3 are
exercised end-to-end through dataset load -> render -> extract-mesh).

Run on CPU (deterministic goldens):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_fixture.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "mini_scene")

# extraction params shared with tests/test_golden_e2e.py (must match or the
# stored F1 golden is meaningless)
EXTRACT_KW = dict(voxel_size=0.035, sdf_trunc=0.14, min_weight=2.0,
                  stride=1, downsample=1, max_dim=96)
F1_TAU = 0.05


def icosphere(subdiv: int = 3, radius: float = 1.0):
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        cache = {}
        vlist = list(verts)

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                cache[key] = len(vlist)
                vlist.append((verts[i] + verts[j]) / 2)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, np.int64)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return verts.astype(np.float32), faces.astype(np.int32)


def box(center, half):
    c, h = np.asarray(center, np.float32), np.asarray(half, np.float32)
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)], np.float32)
    verts = c + corners * h
    quads = [[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1], [2, 3, 7, 6],
             [0, 2, 6, 4], [1, 5, 7, 3]]
    faces = []
    for q in quads:
        faces += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    return verts, np.array(faces, np.int32)


def scene_mesh():
    sv, sf = icosphere(3, radius=0.8)
    # low-frequency radial bumps so the silhouette isn't a perfect sphere
    r = 1.0 + 0.12 * np.sin(3.1 * sv[:, 0]) * np.cos(2.7 * sv[:, 1])
    sv = sv * r[:, None]
    bv, bf = box([0.85, -0.35, 0.15], [0.3, 0.3, 0.3])
    verts = np.concatenate([sv, bv])
    faces = np.concatenate([sf, bf + len(sv)])
    return verts, faces


def color_fn(p):
    """Procedural vertex colors: smooth bands + a checker accent."""
    p = np.asarray(p, np.float32)
    c = 0.5 + 0.45 * np.stack([
        np.sin(4.0 * p[:, 0]) * np.cos(3.0 * p[:, 1]),
        np.sin(5.0 * p[:, 1] + 1.3),
        np.cos(4.0 * p[:, 2] + 0.7),
    ], axis=1)
    checker = ((np.floor(p[:, 0] * 4) + np.floor(p[:, 1] * 4)
                + np.floor(p[:, 2] * 4)) % 2).astype(np.float32)
    return np.clip(c * (0.7 + 0.3 * checker[:, None]), 0.03, 0.97)


def render_mesh_views(verts, faces, cams):
    """GT renders via the repo's JAX z-buffer rasterizer + lambert shade."""
    import jax.numpy as jnp

    from gaustudio_tpu.ops import mesh_raster as MR

    vcol = color_fn(verts)
    nrm = np.asarray(MR.face_normals(jnp.asarray(verts), jnp.asarray(faces)))
    light = np.array([0.4, 0.5, 0.76], np.float32)
    light /= np.linalg.norm(light)
    lam = 0.35 + 0.65 * np.abs(nrm @ light)  # [F]
    images = []
    for cam in cams:
        frag = MR.rasterize_mesh(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            int(cam.image_width), int(cam.image_height),
            num_entries=1 << 17, chunk=1024,
        )
        col = np.asarray(MR.interpolate_attribute(frag, jnp.asarray(faces),
                                                  jnp.asarray(vcol)))
        tid = np.maximum(np.asarray(frag.tri_id), 0)
        shade = np.where(np.asarray(frag.mask), lam[tid], 0.0)
        img = np.clip(col * shade[..., None], 0, 1)
        # quantize exactly like the stored PNG so goldens match the loader
        img = np.round(img * 255.0) / 255.0
        images.append(img.astype(np.float32))
    return images


def fit_gaussians(verts, faces, cams, images, n_points, iters):
    """Surface-sampled init refined by the repo's trainer (no densify)."""
    from gaustudio_tpu import models
    from gaustudio_tpu.models.utils import inverse_sigmoid
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.utils.mesh import sample_mesh_surface

    xyz = sample_mesh_surface(verts, faces, n_points, seed=3)
    rgb = color_fn(xyz)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=xyz, rgb=rgb,
        opacity=inverse_sigmoid(np.full((n_points, 1), 0.9, np.float32)),
    )
    pcd.active_sh_degree = 0
    if iters <= 0:
        return pcd

    class _DS(list):
        cameras_extent = 2.0

        def export(self, path):
            pass

    for cam, img in zip(cams, images):
        cam.image = img
    cfg = T.TrainConfig(
        iterations=iters, densify_from_iter=10 ** 9,
        opacity_reset_interval=10 ** 9, sh_increase_interval=10 ** 9,
        lr_xyz_init=0.0008, lr_xyz_final=0.00008, lr_xyz_max_steps=iters,
    )
    trainer = T.Trainer(pcd, _DS(cams), cfg,
                        capacity=1 << int(np.ceil(np.log2(n_points))))
    trainer.train(iterations=iters, log_every=max(iters // 4, 1),
                  callback=lambda m: print(
                      f"  fit iter {m['iter']} loss {m['loss']:.4f} "
                      f"psnr {m['psnr']:.2f}", flush=True))
    T.state_to_model(trainer.state, pcd)
    return pcd


def eval_psnr(pcd, cams, images):
    from gaustudio_tpu import renderers
    from gaustudio_tpu.ops import ssim as ssim_ops

    renderer = renderers.make({"name": "vanilla_renderer"})
    import jax.numpy as jnp

    vals = []
    for cam, img in zip(cams, images):
        out = renderer.render(cam, pcd)
        gt = jnp.moveaxis(jnp.asarray(img), -1, 0)
        vals.append(float(ssim_ops.psnr(out["render"], gt)))
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--points", type=int, default=8000)
    ap.add_argument("--iters", type=int, default=250)
    ap.add_argument("--out", default=FIXTURE)
    args = ap.parse_args()

    from PIL import Image

    from gaustudio_tpu import renderers
    from gaustudio_tpu.cameras import camera_paths
    from gaustudio_tpu.datasets.utils import camera_to_JSON
    from gaustudio_tpu.pipelines import mesh_extraction as ME
    from gaustudio_tpu.utils.mesh import mesh_f1_score, save_mesh
    from gaustudio_tpu.utils.ply import store_ply

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)

    verts, faces = scene_mesh()
    # two orbit rings: good top AND bottom coverage for mesh recall
    half = args.views // 2
    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 3.0, elevation=-30, num_cam=half,
        image_size=args.size, fov_deg=50)
    cams += camera_paths.get_path_from_orbit(
        np.zeros(3), 3.0, elevation=28, num_cam=args.views - half,
        image_size=args.size, fov_deg=50)
    for i, cam in enumerate(cams):
        cam.image_name = f"{i:05d}.png"

    print("rendering GT views...", flush=True)
    images = render_mesh_views(verts, faces, cams)
    for cam, img in zip(cams, images):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(args.out, "images", cam.image_name))
    with open(os.path.join(args.out, "cameras.json"), "w") as f:
        json.dump([camera_to_JSON(i, c) for i, c in enumerate(cams)], f)

    save_mesh(os.path.join(args.out, "gt_mesh.ply"), verts, faces,
              vertex_colors=color_fn(verts))
    from gaustudio_tpu.utils.mesh import sample_mesh_surface
    sparse = sample_mesh_surface(verts, faces, 4000, seed=11)
    store_ply(os.path.join(args.out, "sparse_points.ply"), sparse,
              (color_fn(sparse) * 255).astype(np.uint8))

    print(f"fitting {args.points} gaussians ({args.iters} iters)...",
          flush=True)
    pcd = fit_gaussians(verts, faces, cams, images, args.points, args.iters)
    pcd.export(os.path.join(args.out, "gaussians.ply"))

    psnrs = eval_psnr(pcd, cams, images)
    print("per-view PSNR:", [round(p, 2) for p in psnrs], flush=True)

    print("extracting mesh...", flush=True)
    renderer = renderers.make({"name": "vanilla_renderer"})
    mverts, mfaces = ME.extract_mesh(pcd, renderer, cams, **EXTRACT_KW)[:2]
    save_mesh(os.path.join(args.out, "extracted_mesh.ply"), mverts, mfaces)
    f1 = mesh_f1_score(mverts, mfaces, verts, faces, F1_TAU)
    print("mesh F1:", f1, flush=True)

    golden = {
        "views": args.views, "size": args.size, "points": args.points,
        "fit_iters": args.iters,
        "psnr_per_view": [round(p, 3) for p in psnrs],
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "mesh_f1": round(f1["f1"], 4),
        "mesh_precision": round(f1["precision"], 4),
        "mesh_recall": round(f1["recall"], 4),
        "mesh_chamfer": round(f1["chamfer"], 5),
        "extract_kw": EXTRACT_KW, "f1_tau": F1_TAU,
    }
    with open(os.path.join(args.out, "GOLDEN.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print(json.dumps(golden), flush=True)


if __name__ == "__main__":
    main()
