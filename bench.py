"""Benchmark: 3DGS render throughput at 1080p (MPix/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (SURVEY.md §6); per
BASELINE.json the target is >= 2x A100 diff-gaussian-rasterization
throughput at 1080p.  We take 300 MPix/s (~145 FPS at 1920x1080) as the
A100 reference figure for Inria-style CUDA rasterization of a mid-size
scene, so vs_baseline = value / 600 reports progress against the 2x goal.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_scene(n=300_000, seed=0):
    """A scene with realistic screen coverage at 1080p."""
    rng = np.random.default_rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.normal(size=n) * 1.1
    xyz[:, 1] = rng.normal(size=n) * 0.65
    xyz[:, 2] = rng.uniform(0.8, 6.0, n)
    scales = (np.exp(rng.normal(size=(n, 3)) * 0.4) * 0.008).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return xyz, scales, quats, opac, colors


def main():
    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import rasterize as rast
    from gaustudio_tpu.ops.rasterize import RasterizeSettings

    H = int(os.environ.get("GS_BENCH_H", 1080))
    W = int(os.environ.get("GS_BENCH_W", 1920))
    tanfov = 0.85
    znear, zfar = 0.01, 100.0
    tanfovy = tanfov * H / W
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    xyz, scales, quats, opac, colors = make_scene(
        n=int(os.environ.get("GS_BENCH_N", 300_000))
    )
    args = tuple(jnp.asarray(a) for a in (xyz, scales, quats, opac, colors))

    settings = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfovy,
        bg=jnp.zeros(3, jnp.float32),
        viewmatrix=jnp.asarray(W2V.T), projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.zeros(3, jnp.float32),
        num_entries=0, chunk=4096,
        # forward-only render: drop the backward-only slot sort operand
        # (median outputs stay on — the reference forward computes them too)
        need_grads=False,
    )

    cap = rast.suggest_num_entries(
        args[0], args[3], settings, scales=args[1], rotations=args[2],
        margin=1.1,
    )
    settings = settings._replace(num_entries=cap)

    @jax.jit
    def render(xyz, scales, quats, opac, colors):
        out = rast.rasterize(
            xyz, opac, settings,
            colors_precomp=colors, scales=scales, rotations=quats,
        )
        return out["render"]

    def sync(x):
        # NB: on the axon remote backend block_until_ready does not actually
        # block; a scalar device->host read is the reliable fence.
        return float(jnp.reshape(x, (-1,))[0])

    img = render(*args)
    sync(img)
    img_np = np.asarray(img)
    assert np.isfinite(img_np).all()
    # guard against silently benchmarking an empty/corrupted render (a
    # TPU-only bf16-matmul bug once culled 98.7% of entries while every
    # CPU test stayed green — see binning_fast._expand_kernel)
    frac_lit = float((img_np.sum(0) > 0).mean())
    default_cfg = not any(
        k in os.environ for k in ("GS_BENCH_N", "GS_BENCH_H", "GS_BENCH_W")
    )
    min_lit = 0.9 if default_cfg else 0.1
    assert frac_lit > min_lit, f"render mostly empty: {frac_lit:.3f} lit"
    if default_cfg:
        assert 0.05 < float(img_np.mean()) < 0.95, f"mean {img_np.mean():.4f}"

    n_iters = int(os.environ.get("GS_BENCH_ITERS", 20))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        img = render(*args)
    sync(img)
    dt = (time.perf_counter() - t0) / n_iters
    mpix_s = (H * W / 1e6) / dt

    # Multi-chip: camera-DP over the dp mesh axis — each device renders a
    # different view of the same (replicated) gaussian set per step, the
    # mesh-extraction/training access pattern (SURVEY.md §2.3). Aggregate
    # throughput is the headline on pods; single-chip output is unchanged.
    ndev = len(jax.devices())
    if ndev > 1:
        from jax.sharding import Mesh, PartitionSpec as Ps
        from functools import partial

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        views = []
        for d in range(ndev):
            ang = 2 * np.pi * d / ndev * 0.02  # small orbit perturbation
            R = np.eye(4, dtype=np.float32)
            R[0, 0] = R[2, 2] = np.cos(ang)
            R[0, 2] = np.sin(ang)
            R[2, 0] = -np.sin(ang)
            V = (R @ W2V).astype(np.float32)
            views.append((V.T, (P @ V).T, -V[:3, :3].T @ V[:3, 3]))
        vms = jnp.asarray(np.stack([v[0] for v in views]))
        pms = jnp.asarray(np.stack([v[1] for v in views]))
        cps = jnp.asarray(np.stack([v[2] for v in views]))

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(Ps("dp"), Ps("dp"), Ps("dp"), Ps(), Ps(), Ps(),
                           Ps(), Ps()),
                 out_specs=Ps("dp"), check_vma=False)
        def render_dp(vm, pm, cp, xyz, scales, quats, opac, colors):
            s = settings._replace(viewmatrix=vm[0], projmatrix=pm[0],
                                  campos=cp[0])
            out = rast.rasterize(xyz, opac, s, colors_precomp=colors,
                                 scales=scales, rotations=quats)
            return out["render"][None]

        imgs = render_dp(vms, pms, cps, *args)
        sync(imgs)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            imgs = render_dp(vms, pms, cps, *args)
        sync(imgs)
        dt_dp = (time.perf_counter() - t0) / n_iters
        mpix_s = (ndev * H * W / 1e6) / dt_dp

    baseline = 600.0  # 2x the assumed 300 MPix/s A100 CUDA figure
    print(json.dumps({
        "metric": "render_throughput_1080p",
        "value": round(mpix_s, 2),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
