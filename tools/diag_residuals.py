"""Compare the Pallas forward compositor's residuals (final_T, n_contrib,
color) against the XLA golden compositor run on the SAME binned_fast entry
stream (via compat_arrays), on the grad-escape dump state.

Both backward implementations (Pallas reverse walk and XLA fallback) were
shown to produce IDENTICAL wrong gradients on this state — so the bug is in
their shared inputs. This isolates whether the Pallas forward's residuals
disagree with a trusted walk over the very same entries.

Usage (TPU): python tools/diag_residuals.py [--dump /tmp/grad_escape_dump.pkl]
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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaustudio_tpu.ops import binning_fast, gaussian, rasterize_pallas
    from gaustudio_tpu.ops import rasterize_ref as RR
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
    num_tiles = grid_x * grid_y
    sh_deg = int(d.get("sh_deg", 0))

    opacity = jax.nn.sigmoid(params["opacity"][:, 0])
    scales = jnp.exp(params["scale"])
    rots = params["rot"] * jax.lax.rsqrt(
        jnp.sum(params["rot"] ** 2, axis=-1, keepdims=True) + 1e-18
    )
    shs = T._features(params)

    pre = gaussian.preprocess(
        params["xyz"], opacity,
        jnp.asarray(batch["viewmatrix"]), jnp.asarray(batch["projmatrix"]),
        jnp.asarray(batch["campos"]), int(W), int(H), tanfov, tanfov,
        antialias=False, shs=shs, sh_degree=sh_deg,
        scales=scales, rotations=rots, valid_mask=valid,
    )
    pre_sg = jax.tree.map(
        lambda x: jax.lax.stop_gradient(x)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        pre,
    )

    # training-mode binning (with_median=False -> carry_gid=False)
    binned = binning_fast.bin_gaussians_fast(
        pre_sg, grid_x, grid_y, 1 << 20,
        carry_gid=False, carry_slot=True, realign=True,
    )
    packed = rasterize_pallas.composite_pallas(
        binned, grid_x, grid_y, with_median=False)
    out_p = rasterize_pallas._packed_to_tilemajor(packed, num_tiles)

    gid, tile, vld, tile_start = binning_fast.compat_arrays(
        binned, grid_x, grid_y)
    out_x, _ = RR._composite_fwd_impl(
        grid_x, grid_y, 2048, pre_sg.means2d, pre_sg.conic, pre_sg.colors,
        pre_sg.depths, pre_sg.opacities, gid, tile, vld, tile_start,
    )

    ft_p = np.asarray(out_p.final_T)[:num_tiles]
    ft_x = np.asarray(out_x.final_T)[:num_tiles]
    nc_p = np.asarray(out_p.n_contrib)[:num_tiles]
    nc_x = np.asarray(out_x.n_contrib)[:num_tiles]
    col_p = np.asarray(out_p.color)[:num_tiles]
    col_x = np.asarray(out_x.color)[:num_tiles]

    print(f"entries: num_rendered={int(np.asarray(binned.num_rendered))}")
    print(f"color   absmax diff {np.abs(col_p - col_x).max():.4g}")
    dft = np.abs(ft_p - ft_x)
    print(f"final_T absmax diff {dft.max():.4g}  "
          f"npix>1e-3 {(dft > 1e-3).sum()}")
    dnc = np.abs(nc_p - nc_x)
    print(f"n_contrib absmax diff {dnc.max()}  npix!=0 {(dnc != 0).sum()}"
          f"  npix>4 {(dnc > 4).sum()}")

    # which tiles are worst?
    per_tile_ft = dft.max(axis=1)
    per_tile_nc = dnc.max(axis=1)
    bad = np.argsort(-per_tile_ft)[:10]
    for t in bad:
        print(f"  tile {t} (tx={t % grid_x}, ty={t // grid_x}): "
              f"ft diff {per_tile_ft[t]:.4g} nc diff {per_tile_nc[t]} "
              f"count {int(np.asarray(binned.tile_count)[t])} "
              f"ft_p {ft_p[t].min():.4g} ft_x {ft_x[t].min():.4g}")
    badn = np.argsort(-per_tile_nc)[:10]
    print("worst n_contrib tiles:")
    for t in badn:
        print(f"  tile {t}: nc diff {per_tile_nc[t]} "
              f"nc_p max {nc_p[t].max()} nc_x max {nc_x[t].max()} "
              f"count {int(np.asarray(binned.tile_count)[t])} "
              f"ft diff {per_tile_ft[t]:.4g}")


if __name__ == "__main__":
    main()
