"""Replay the grad-escape dump under one rasterizer config; save per-row
viewspace-grad norms so configs can be diffed across processes (the kernel
env flags are read at module import).

Usage: python tools/replay_escape.py --backend pallas --out /tmp/re_a.npz
       [--dump /tmp/grad_escape_dump.pkl] [--cpu]
Env flags (GS_SELECT_DOT3, GS_TILES_PER_PROG, ...) apply as usual.
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
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaustudio_tpu.ops import ssim as ssim_ops
    from gaustudio_tpu.ops.rasterize import RasterizeSettings
    from gaustudio_tpu.pipelines import train as T

    bwd_tpp = int(os.environ.get("GS_BWD_TPP", "0"))
    if bwd_tpp:
        from gaustudio_tpu.ops import rasterize_pallas_bwd as BW

        orig = BW.composite_backward_pallas
        BW.composite_backward_pallas = (
            lambda *a, **k: orig(*a, **{**k, "tiles_per_prog": bwd_tpp})
        )

    with open(args.dump, "rb") as f:
        d = pickle.load(f)
    params = {k: jnp.asarray(v) for k, v in d["params"].items()}
    valid = jnp.asarray(d["valid"])
    batch = d["batch"]
    H, W = batch["gt_image"].shape[-2:]
    tanfov = math.tan(math.radians(55.0) * 0.5)

    settings = RasterizeSettings(
        image_height=int(H), image_width=int(W),
        tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), sh_degree=3, num_entries=1 << 20, chunk=2048,
        with_median=False, backend=args.backend,
        viewmatrix=jnp.asarray(batch["viewmatrix"]),
        projmatrix=jnp.asarray(batch["projmatrix"]),
        campos=jnp.asarray(batch["campos"]),
    )
    gt = jnp.asarray(batch["gt_image"])
    sh_deg = jnp.asarray(d.get("sh_deg", 0))
    offset0 = jnp.zeros((params["xyz"].shape[0], 2), jnp.float32)

    def loss_fn(p, off):
        out = T.render_from_params(p, valid, sh_deg, settings,
                                   means2d_offset=off)
        return ssim_ops.rgb_loss(out["render"], gt, 0.2), out

    (loss, out), (grads, vs) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, offset0)
    vsn = np.linalg.norm(np.asarray(vs), axis=-1)
    save = {"vsn": vsn, "loss": float(loss),
            "num_rendered": int(np.asarray(out["num_rendered"]))}
    for k, v in grads.items():
        save["g_" + k] = np.asarray(v)
    np.savez(args.out, **save)
    top = np.argsort(-vsn)[:5]
    print(f"loss {float(loss):.5f} nr {save['num_rendered']} "
          f"vs max {vsn.max():.4g} top rows {top.tolist()} "
          f"dxyz max {np.abs(save['g_xyz']).max():.4g}")


if __name__ == "__main__":
    main()
