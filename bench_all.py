"""Full TPU benchmark + parity sweep: one command, one JSON.

Emits every driver-relevant metric as a single JSON object (also written
to BENCH_DETAIL.json) and runs the on-chip parity harnesses, failing
loudly on drift:

  * render_mpix_s         — vanilla 3DGS forward at 1080p/300k (bench.py)
  * surfel_mpix_s         — 2DGS Pallas forward at 1080p/200k
  * train_ms_it           — vanilla train step (fwd+bwd+adam) 512px/100k
  * surfel_train_ms_it    — 2DGS train step (Pallas fwd+bwd) 512px/60k
  * extract_mesh_s        — render->TSDF->marching-tetrahedra, 12 views
  * parity_ok / grad_parity_ok / surfel_grad_parity_ok

Usage: python bench_all.py   (TPU; ~5-10 min warm cache)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from bench import make_scene  # noqa: E402


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.reshape(x, (-1,))[0])


def _camera(H, W, tanfov=0.85, dist=0.0):
    znear, zfar = 0.01, 100.0
    tanfovy = tanfov * H / W
    W2V = np.eye(4, dtype=np.float32)
    W2V[2, 3] = dist
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    campos = np.array([0, 0, -dist], np.float32)
    return W2V.T, (P @ W2V).T, campos, tanfov, tanfovy


def bench_render():
    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import rasterize as rast
    from gaustudio_tpu.ops.rasterize import RasterizeSettings

    H, W = 1080, 1920
    view, proj, campos, tanx, tany = _camera(H, W)
    xyz, scales, quats, opac, colors = make_scene(n=300_000)
    args = tuple(jnp.asarray(a) for a in (xyz, scales, quats, opac, colors))
    st = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanx, tanfovy=tany,
        bg=jnp.zeros(3, jnp.float32), viewmatrix=jnp.asarray(view),
        projmatrix=jnp.asarray(proj), campos=jnp.asarray(campos),
        num_entries=0, chunk=4096,
        need_grads=False,  # measure the inference pipeline, like bench.py
    )
    cap = rast.suggest_num_entries(args[0], args[3], st, scales=args[1],
                                   rotations=args[2], margin=1.1)
    st = st._replace(num_entries=cap)

    @jax.jit
    def render(xyz, scales, quats, opac, colors):
        return rast.rasterize(xyz, opac, st, colors_precomp=colors,
                              scales=scales, rotations=quats)["render"]

    img = render(*args)
    _sync(img)
    assert float((np.asarray(img).sum(0) > 0).mean()) > 0.9, "empty render"
    t0 = time.perf_counter()
    for _ in range(20):
        img = render(*args)
    _sync(img)
    dt = (time.perf_counter() - t0) / 20
    return H * W / 1e6 / dt


def bench_surfel_render():
    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import binning as B
    from gaustudio_tpu.ops import rasterize_surfel as RS
    from gaustudio_tpu.ops.rasterize import RasterizeSettings

    H, W = 1080, 1920
    n = 200_000
    view, proj, campos, tanx, tany = _camera(H, W)
    rng = np.random.default_rng(0)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.normal(size=n) * 1.1
    xyz[:, 1] = rng.normal(size=n) * 0.65
    xyz[:, 2] = rng.uniform(0.8, 6.0, n)
    scales = (np.exp(rng.normal(size=(n, 2)) * 0.4) * 0.01).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    st = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanx, tanfovy=tany,
        bg=jnp.zeros(3), viewmatrix=jnp.asarray(view),
        projmatrix=jnp.asarray(proj), campos=jnp.asarray(campos),
        num_entries=0, chunk=4096, backend="pallas",
        need_grads=False,  # forward-only: lean sort, f16-packed payloads
    )
    pre = RS.preprocess_surfel(
        jnp.asarray(xyz), jnp.asarray(opac), st.viewmatrix, st.projmatrix,
        st.campos, W, H, scales=jnp.asarray(scales),
        rotations=jnp.asarray(quats), colors_precomp=jnp.asarray(colors),
    )
    cap = B.bucket_capacity(int(jnp.sum(jnp.maximum(pre.tiles_touched, 1))) * 11 // 10)
    st = st._replace(num_entries=cap)
    args = tuple(jnp.asarray(a) for a in (xyz, opac, scales, quats, colors))

    @jax.jit
    def render(xyz, opac, scales, quats, colors):
        out = RS.rasterize_surfels(xyz, opac, st, scales=scales,
                                   rotations=quats, colors_precomp=colors)
        return out["render"]

    img = render(*args)
    _sync(img)
    t0 = time.perf_counter()
    for _ in range(10):
        img = render(*args)
    _sync(img)
    dt = (time.perf_counter() - t0) / 10
    return H * W / 1e6 / dt


def _train_scene(n, two_d=False, seed=0):
    from gaustudio_tpu import models

    rng = np.random.default_rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.normal(size=n) * 0.8
    xyz[:, 1] = rng.normal(size=n) * 0.6
    xyz[:, 2] = rng.uniform(1.2, 5.0, n)
    attrs = {"xyz": 3, "opacity": 1, "f_dc": 3, "f_rest": 45,
             "scale": 2 if two_d else 3, "rot": 4}
    pcd = models.make({"name": "vanilla_pcd", "attributes": attrs})
    pcd.create_from_attribute(
        xyz=xyz, rgb=rng.uniform(size=(n, 3)).astype(np.float32),
        scale=np.full((n, attrs["scale"]), -4.6, np.float32),
    )
    return pcd


def bench_train_step(H=512, W=512, n=100_000):
    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import rasterize as rast
    from gaustudio_tpu.ops.rasterize import RasterizeSettings
    from gaustudio_tpu.pipelines import train as T

    view, proj, campos, tanx, tany = _camera(H, W)
    pcd = _train_scene(n)
    state = T.init_state(pcd)
    st = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanx, tanfovy=tany, bg=None,
        num_entries=0, chunk=2048,
    )
    cap = rast.suggest_num_entries(
        state.params["xyz"], jax.nn.sigmoid(state.params["opacity"][:, 0]),
        st._replace(viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
                    campos=jnp.asarray(campos)),
        scales=jnp.exp(state.params["scale"]), rotations=state.params["rot"],
        margin=1.3,
    )
    st = st._replace(num_entries=cap)
    cfg = T.TrainConfig()
    rng = np.random.default_rng(1)
    batch = T.CameraBatch(
        viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
        campos=jnp.asarray(campos),
        gt_image=jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32)),
    )
    state, metrics = T.train_step(state, batch, st, cfg)
    _sync(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = T.train_step(state, batch, st, cfg)
    _sync(metrics["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def bench_surfel_train_step():
    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import rasterize_surfel as RS
    from gaustudio_tpu.ops import binning as B
    from gaustudio_tpu.ops.rasterize import RasterizeSettings
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.pipelines import train_surfel as TS

    H = W = 512
    n = 60_000
    view, proj, campos, tanx, tany = _camera(H, W)
    pcd = _train_scene(n, two_d=True)
    state = T.init_state(pcd)
    pre = RS.preprocess_surfel(
        state.params["xyz"], jax.nn.sigmoid(state.params["opacity"][:, 0]),
        jnp.asarray(view), jnp.asarray(proj), jnp.asarray(campos), W, H,
        scales=jnp.exp(state.params["scale"]), rotations=state.params["rot"],
        colors_precomp=jnp.zeros((n, 3), jnp.float32),
    )
    cap = B.bucket_capacity(int(jnp.sum(jnp.maximum(pre.tiles_touched, 1))) * 13 // 10)
    st = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanx, tanfovy=tany, bg=None,
        num_entries=cap, chunk=2048,
    )
    cfg = TS.SurfelTrainConfig()
    rng = np.random.default_rng(1)
    batch = T.CameraBatch(
        viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
        campos=jnp.asarray(campos),
        gt_image=jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32)),
    )
    state, metrics = TS.train_step_surfel(state, batch, st, cfg)
    _sync(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = TS.train_step_surfel(state, batch, st, cfg)
    _sync(metrics["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def bench_extract_mesh():
    import numpy as _np

    from gaustudio_tpu import models, renderers
    from gaustudio_tpu.cameras import camera_paths
    from gaustudio_tpu.pipelines.mesh_extraction import extract_mesh

    rng = np.random.default_rng(4)
    n = 60_000
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=pts, rgb=rng.uniform(size=(n, 3)).astype(np.float32)
    )
    pcd.active_sh_degree = 0
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 3.0, num_cam=12,
                                            image_size=512, fov_deg=60)
    renderer = renderers.make({"name": "vanilla_renderer"})
    t0 = time.perf_counter()
    verts, faces = extract_mesh(pcd, renderer, cams, stride=1, downsample=1,
                                voxel_size=0.02, min_weight=2.0)
    dt = time.perf_counter() - t0
    assert len(verts) > 1000 and len(faces) > 1000
    # second invocation = the warm-cache number a user sees on every run
    # after the first (renderer jit + tsdf jit already built in-process)
    t0 = time.perf_counter()
    verts, faces = extract_mesh(pcd, renderer, cams, stride=1, downsample=1,
                                voxel_size=0.02, min_weight=2.0)
    warm = time.perf_counter() - t0
    return dt, warm


def main():
    results = {}
    t_all = time.perf_counter()

    results["render_mpix_s"] = round(bench_render(), 2)
    print(f"render: {results['render_mpix_s']} MPix/s", flush=True)
    results["surfel_mpix_s"] = round(bench_surfel_render(), 2)
    print(f"surfel render: {results['surfel_mpix_s']} MPix/s", flush=True)
    results["train_ms_it"] = round(bench_train_step(), 2)
    print(f"train step: {results['train_ms_it']} ms/it", flush=True)
    # BASELINE config-5 scale: 1080p, 300k gaussians (VERDICT r3 item 5)
    results["train_1080p_300k_ms_it"] = round(
        bench_train_step(H=1080, W=1920, n=300_000), 2)
    print(f"train step 1080p/300k: {results['train_1080p_300k_ms_it']} ms/it",
          flush=True)
    results["surfel_train_ms_it"] = round(bench_surfel_train_step(), 2)
    print(f"surfel train step: {results['surfel_train_ms_it']} ms/it",
          flush=True)
    cold, warm = bench_extract_mesh()
    results["extract_mesh_s"] = round(cold, 2)
    results["extract_mesh_warm_s"] = round(warm, 2)
    print(f"extract mesh: {results['extract_mesh_s']} s "
          f"(warm {results['extract_mesh_warm_s']} s)", flush=True)

    # on-chip parity harnesses — fail loudly on drift
    from tools import tpu_parity_check, tpu_grad_check, tpu_surfel_grad_check

    results["parity_ok"] = tpu_parity_check.main() == 0
    results["grad_parity_ok"] = tpu_grad_check.main() == 0
    results["surfel_grad_parity_ok"] = tpu_surfel_grad_check.main() == 0
    results["wall_s"] = round(time.perf_counter() - t_all, 1)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    ok = (results["parity_ok"] and results["grad_parity_ok"]
          and results["surfel_grad_parity_ok"])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
