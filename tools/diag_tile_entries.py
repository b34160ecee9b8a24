"""Deep-dive one bad tile from the grad-escape dump: compare the realigned
aligned_blocks content against the flat sorted table (same order? same
values?), and simulate the per-pixel walk in float64 to see where the
true termination point lies vs what the Pallas forward reported.

Usage (TPU): python tools/diag_tile_entries.py --tile 303
"""

import argparse
import math
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/grad_escape_dump.pkl")
    ap.add_argument("--tile", type=int, default=303)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaustudio_tpu.ops import binning_fast, gaussian
    from gaustudio_tpu.ops.binning_fast import BLOCK
    from gaustudio_tpu.pipelines import train as T

    with open(args.dump, "rb") as f:
        d = pickle.load(f)
    params = {k: jnp.asarray(v) for k, v in d["params"].items()}
    valid = jnp.asarray(d["valid"])
    batch = d["batch"]
    H, W = batch["gt_image"].shape[-2:]
    tanfov = math.tan(math.radians(55.0) * 0.5)
    grid_x = (W + gaussian.TILE_X - 1) // gaussian.TILE_X
    grid_y = (H + gaussian.TILE_Y - 1) // gaussian.TILE_Y
    sh_deg = int(d.get("sh_deg", 0))

    opacity = jax.nn.sigmoid(params["opacity"][:, 0])
    scales = jnp.exp(params["scale"])
    rots = params["rot"] * jax.lax.rsqrt(
        jnp.sum(params["rot"] ** 2, axis=-1, keepdims=True) + 1e-18
    )
    pre = gaussian.preprocess(
        params["xyz"], opacity,
        jnp.asarray(batch["viewmatrix"]), jnp.asarray(batch["projmatrix"]),
        jnp.asarray(batch["campos"]), int(W), int(H), tanfov, tanfov,
        antialias=False, shs=T._features(params), sh_degree=sh_deg,
        scales=scales, rotations=rots, valid_mask=valid,
    )
    binned = binning_fast.bin_gaussians_fast(
        pre, grid_x, grid_y, 1 << 20,
        carry_gid=False, carry_slot=True, realign=True,
    )

    t = args.tile
    ts = int(np.asarray(binned.tile_start)[t])
    cnt = int(np.asarray(binned.tile_count)[t])
    ab0 = int(np.asarray(binned.ablock_start)[t])
    flat = np.asarray(binned.flat_entries)  # [16, K]
    ablocks = np.asarray(binned.aligned_blocks)  # [NB, 16, 256]
    nb = (cnt + BLOCK - 1) // BLOCK

    flat_run = flat[:, ts:ts + cnt]  # [16, cnt]
    ali = np.concatenate([ablocks[ab0 + i] for i in range(nb)], axis=1)
    ali_run = ali[:, :cnt]

    diff = np.abs(flat_run - ali_run)
    print(f"tile {t}: start {ts} count {cnt} ablock0 {ab0} nblocks {nb}")
    print(f"aligned-vs-flat absmax diff per attr row: "
          f"{diff.max(axis=1).round(6).tolist()}")
    pad = ali[:, cnt:nb * BLOCK]
    if pad.size:
        print(f"padding rows valid attr (row 11) max: {pad[11].max()}")

    # float64 walk on the flat run (trusted, per-pixel)
    mx, my = flat_run[0].astype(np.float64), flat_run[1].astype(np.float64)
    ca, cb, cc = (flat_run[i].astype(np.float64) for i in (2, 3, 4))
    op = flat_run[5].astype(np.float64)
    vld = flat_run[11]
    tx, ty = t % grid_x, t // grid_x
    # pixel grid of this tile
    qx = np.arange(16)[None, :].repeat(16, 0).reshape(-1)
    qy = np.arange(16)[:, None].repeat(16, 1).reshape(-1)
    px = (tx * 16 + qx).astype(np.float64)
    py = (ty * 16 + qy).astype(np.float64)
    dx = mx[:, None] - px[None, :]
    dy = my[:, None] - py[None, :]
    power = -0.5 * (ca[:, None] * dx * dx + cc[:, None] * dy * dy) \
        - cb[:, None] * dx * dy
    alpha = np.minimum(0.99, op[:, None] * np.exp(np.minimum(power, 0.0)))
    alpha[(power > 0) | (alpha < 1.0 / 255.0) | (vld[:, None] < 0.5)] = 0.0

    Tt = np.ones(256)
    nc64 = np.zeros(256, dtype=int)
    ft64 = np.ones(256)
    for i in range(cnt):
        Pincl = Tt * (1.0 - alpha[i])
        appl = Pincl >= 1e-4
        w = np.where(appl, alpha[i] * Tt, 0.0)
        contrib = w > 0
        nc64[contrib] = i + 1
        Tt = np.where(appl, Pincl, Tt)
    ft64 = Tt
    print(f"f64 walk: nc max {nc64.max()} ft min {ft64.min():.6g}")
    # alpha histogram of the run
    amax = alpha.max(axis=1)
    print(f"entries with max-pixel alpha > 0.5: {(amax > 0.5).sum()}, "
          f"> 0.1: {(amax > 0.1).sum()}, == 0: {(amax == 0).sum()}")
    # where are the big-alpha entries positioned?
    big = np.where(amax > 0.5)[0]
    print(f"big-alpha entry positions (first 20): {big[:20].tolist()}")
    print(f"depth row monotone? "
          f"{bool((np.diff(flat_run[9]) >= -1e-6).all())} "
          f"(min diff {np.diff(flat_run[9]).min():.4g})")


if __name__ == "__main__":
    main()
