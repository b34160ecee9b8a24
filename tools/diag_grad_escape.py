"""Catch the first viewspace-grad escape in at-scale training and A/B it.

The r3 at-scale runs explode long before densification: individual rows'
accumulated viewspace grads escape (1e-4 -> 13 -> 3246 by iter 360 at
512px). This tool trains normally but every ``watch_every`` iters runs a
NON-donating gradient probe on the current state; at the first row whose
single-step vs-grad norm exceeds ``threshold`` it:
  * re-computes the same gradients through the XLA golden compositor
  * prints a per-backend comparison + the offending rows' parameters
  * dumps the state+batch to /tmp/grad_escape_dump.pkl
so we can tell a Pallas backward bug from a genuine recipe divergence.

Usage (TPU): python tools/diag_grad_escape.py [--iters 600]
"""

import argparse
import os
import pickle
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--watch_every", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.diag_densify_blowup import build_or_load_capture
    from tools.make_fixture import color_fn
    from gaustudio_tpu import models
    from gaustudio_tpu.models.utils import inverse_sigmoid
    from gaustudio_tpu.ops import ssim as ssim_ops
    from gaustudio_tpu.pipelines import train as T
    from gaustudio_tpu.utils.mesh import sample_mesh_surface
    from tools.train_at_scale import scene_mesh_large

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cams = build_or_load_capture(args.size, args.views)
    hold = list(range(0, len(cams), 8))
    train_cams = [c for i, c in enumerate(cams) if i not in hold]

    verts, faces = scene_mesh_large()
    xyz = sample_mesh_surface(verts, faces, args.init_points
                              if hasattr(args, "init_points") else 12000,
                              seed=3)
    xyz = xyz + np.random.default_rng(5).normal(
        size=xyz.shape).astype(np.float32) * 0.01
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=xyz, rgb=color_fn(xyz),
        opacity=inverse_sigmoid(np.full((len(xyz), 1), 0.1, np.float32)),
    )
    pcd.active_sh_degree = 0

    class _DS(list):
        cameras_extent = 3.5

        def export(self, path):
            pass

    cfg = T.TrainConfig(
        iterations=args.iters,
        densify_from_iter=500,
        densify_until_iter=5600,
        densification_interval=100,
        densify_grad_threshold=0.0002,
        opacity_reset_interval=3000,
        sh_increase_interval=1000,
        lr_xyz_init=0.00016 * 3.5,
        lr_xyz_final=0.0000016 * 3.5,
        lr_xyz_max_steps=7000,
    )
    trainer = T.Trainer(pcd, _DS(train_cams), cfg, capacity=args.capacity)

    from gaustudio_tpu.pipelines.dataloader import make_batch_source

    settings = trainer._settings(trainer.num_entries)
    settings_xla = settings._replace(backend="xla")
    next_batch = make_batch_source(trainer.cameras, trainer._batch,
                                   use_prefetch=False)

    @partial(jax.jit, static_argnames=("s",))
    def grad_probe(params, valid, sh_deg, batch, s):
        s = s._replace(viewmatrix=batch.viewmatrix,
                       projmatrix=batch.projmatrix,
                       campos=batch.campos, bg=jnp.zeros(3))
        cap = params["xyz"].shape[0]
        offset0 = jnp.zeros((cap, 2), jnp.float32)

        def loss_fn(p, off):
            out = T.render_from_params(p, valid, sh_deg, s,
                                       means2d_offset=off)
            return ssim_ops.rgb_loss(out["render"], batch.gt_image, 0.2), out

        (loss, out), (grads, vs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset0)
        vsn = jnp.linalg.norm(vs, axis=-1)
        gmax = {k: jnp.max(jnp.abs(v), axis=-1) for k, v in grads.items()}
        return loss, out["radii"], vsn, gmax, grads

    def run_probe(s, batch, which):
        st = trainer.state
        return grad_probe(st.params, st.valid, st.active_sh_degree,
                          batch, s)

    t0 = time.perf_counter()
    for it in range(1, args.iters + 1):
        batch = next_batch()
        if it % args.watch_every == 0:
            loss, radii, vsn, gmax, grads = run_probe(settings, batch, "pallas")
            vsn_h = np.asarray(vsn)
            mx = float(vsn_h.max())
            if it % 50 == 0 or mx > args.threshold:
                print(f"it {it:5d} probe loss {float(loss):.4f} "
                      f"vs max {mx:.4g} q99 "
                      f"{np.percentile(vsn_h, 99):.4g}", flush=True)
            if mx > args.threshold:
                print(f"ESCAPE at iter {it}: probing XLA backend...",
                      flush=True)
                lx, radx, vsx, gmx, gradx = run_probe(settings_xla, batch,
                                                      "xla")
                vsx_h = np.asarray(vsx)
                print(f"  pallas loss {float(loss):.5f} vs XLA {float(lx):.5f}")
                print(f"  XLA vs max {vsx_h.max():.4g} q99 "
                      f"{np.percentile(vsx_h, 99):.4g}")
                top = np.argsort(-vsn_h)[:8]
                st = trainer.state
                p = {k: np.asarray(v) for k, v in st.params.items()}
                rad = np.asarray(radii)
                radx_h = np.asarray(radx)
                for r in top:
                    print(f"  row {r}: vs_pallas {vsn_h[r]:.4g} vs_xla "
                          f"{vsx_h[r]:.4g} radii {rad[r]}/{radx_h[r]} "
                          f"scale {np.exp(p['scale'][r]).round(5)} "
                          f"op {1/(1+np.exp(-p['opacity'][r,0])):.4f} "
                          f"xyz {p['xyz'][r].round(3)}", flush=True)
                for k in grads:
                    gp = np.asarray(grads[k])
                    gx = np.asarray(gradx[k])
                    ad = np.abs(gp - gx).max()
                    print(f"  d{k:8s} pallas|max| {np.abs(gp).max():.4g} "
                          f"xla|max| {np.abs(gx).max():.4g} "
                          f"absdiff {ad:.4g}")
                with open("/tmp/grad_escape_dump.pkl", "wb") as f:
                    pickle.dump({
                        "iter": it,
                        "params": p,
                        "valid": np.asarray(st.valid),
                        "sh_deg": int(np.asarray(st.active_sh_degree)),
                        "batch": {fl: np.asarray(getattr(batch, fl))
                                  for fl in batch._fields},
                        "top_rows": top.tolist(),
                    }, f)
                print("dumped /tmp/grad_escape_dump.pkl", flush=True)
                break
        trainer.state, metrics = T.train_step(trainer.state, batch,
                                              settings, cfg)
    next_batch.close()
    print(f"done in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
