"""A/B the training gradients on a dumped blow-up state.

Loads /tmp/blowup_dump.pkl (written by diag_densify_blowup.py at the first
anomaly), rebuilds the exact train-time loss, and computes the parameter +
viewspace gradients through BOTH rasterizer backends:
  * backend="pallas" (the training path on TPU)
  * backend="xla"    (the golden scan compositor)
If the two disagree at this state, the blow-up is a kernel bug; if they
agree, the recipe/optimizer dynamics are at fault.

Usage (TPU): python tools/check_blowup_grads.py [--dump /tmp/blowup_dump.pkl]
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
    ap.add_argument("--dump", default="/tmp/blowup_dump.pkl")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--state", choices=["before", "after"], default="before")
    args = ap.parse_args()

    with open(args.dump, "rb") as f:
        d = pickle.load(f)
    print(f"dump iter {d['iter']}, state={args.state}")

    import jax
    import jax.numpy as jnp

    from gaustudio_tpu.ops import ssim as ssim_ops
    from gaustudio_tpu.ops.rasterize import RasterizeSettings
    from gaustudio_tpu.pipelines import train as T

    if args.state == "before" and "params_before" in d:
        params = {k: jnp.asarray(v) for k, v in d["params_before"].items()}
        valid = jnp.asarray(d["valid_before"])
    else:
        params = {k: jnp.asarray(v) for k, v in d["params"].items()}
        valid = jnp.asarray(d["valid"])
    batch = d["batch"]
    H, W = batch["gt_image"].shape[-2:]
    # the capture cams all share fov 55deg (train_at_scale.orbit_rings)
    tanfov = math.tan(math.radians(55.0) * 0.5)
    sh_deg = int(d.get("active_sh_degree", 0))

    nv = int(np.asarray(valid).sum())
    print(f"valid rows {nv} / {valid.shape[0]}")
    for k, v in params.items():
        arr = np.asarray(v)[np.asarray(valid)]
        print(f"  {k:8s} |max| {np.abs(arr).max():.4g} "
              f"finite {np.isfinite(arr).all()}")

    results = {}
    for backend in ("pallas", "xla"):
        settings = RasterizeSettings(
            image_height=int(H), image_width=int(W),
            tanfovx=tanfov, tanfovy=tanfov,
            bg=None, sh_degree=3, num_entries=1 << 20, chunk=2048,
            with_median=False, backend=backend,
            viewmatrix=jnp.asarray(batch["viewmatrix"]),
            projmatrix=jnp.asarray(batch["projmatrix"]),
            campos=jnp.asarray(batch["campos"]),
        )
        gt = jnp.asarray(batch["gt_image"])
        offset0 = jnp.zeros((params["xyz"].shape[0], 2), jnp.float32)

        def loss_fn(p, off):
            out = T.render_from_params(p, valid, jnp.asarray(sh_deg),
                                       settings, means2d_offset=off)
            pred = out["render"]
            loss = ssim_ops.rgb_loss(pred, gt, 0.2)
            return loss, out

        (loss, out), (grads, vs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset0)
        loss = float(loss)
        nr = int(np.asarray(out["num_rendered"]))
        vs = np.asarray(vs)
        g = {k: np.asarray(v) for k, v in grads.items()}
        results[backend] = (loss, nr, vs, g)
        vsn = np.linalg.norm(vs, axis=-1)
        print(f"[{backend}] loss {loss:.5f} num_rendered {nr} "
              f"vs-grad max {vsn.max():.4g} q99 "
              f"{np.percentile(vsn[np.asarray(valid)], 99):.4g} "
              f"nonfinite {int((~np.isfinite(vs)).sum())}")
        for k, arr in g.items():
            print(f"    d{k:8s} |max| {np.abs(arr).max():.4g} "
                  f"nonfinite {int((~np.isfinite(arr)).sum())}")

    lp, nrp, vsp, gp = results["pallas"]
    lx, nrx, vsx, gx = results["xla"]
    print(f"\nloss diff {abs(lp-lx):.3e}  num_rendered diff {nrp-nrx}")
    vd = np.abs(vsp - vsx)
    ref = np.abs(vsx).max() + 1e-12
    print(f"vs-grad absdiff max {vd.max():.4g} (relmax {vd.max()/ref:.3e})")
    worst = None
    for k in gp:
        ad = np.abs(gp[k] - gx[k])
        r = np.abs(gx[k]).max() + 1e-12
        rel = ad.max() / r
        print(f"d{k:8s} absdiff max {ad.max():.4g} relmax {rel:.3e}")
        if worst is None or rel > worst[1]:
            worst = (k, rel)
    print(f"WORST {worst[0]} relmax {worst[1]:.3e}")


if __name__ == "__main__":
    main()
