"""On-device TPU vs CPU render parity check.

The pytest suite runs entirely on CPU (interpret-mode Pallas), so it cannot
catch TPU-only numerics bugs — e.g. the default-bf16 MXU pass for f32
matmuls that once quantized `monotone_expand`'s outputs and silently culled
98.7% of entries while every CPU test stayed green.

This script renders the same mid-size scene through the real TPU Pallas
path and through the CPU XLA golden path (both backends are registered in
the same process) and asserts pixel agreement.  Run it manually after
touching any Pallas kernel or binning code:

    python tools/tpu_parity_check.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_scene
    from gaustudio_tpu.ops import rasterize as rast
    from gaustudio_tpu.ops.rasterize import RasterizeSettings

    if jax.devices()[0].platform == "cpu":
        print("No TPU visible; nothing to compare.")
        return 0

    H, W = 512, 512
    tanfov = 0.85
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfov
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    xyz, scales, quats, opac, colors = make_scene(n=30_000, seed=3)
    args_np = (xyz, scales, quats, opac, colors)

    settings = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3, jnp.float32),
        viewmatrix=jnp.asarray(W2V.T), projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.zeros(3, jnp.float32), num_entries=0, chunk=4096,
    )
    args = tuple(jnp.asarray(a) for a in args_np)
    cap = rast.suggest_num_entries(
        args[0], args[3], settings, scales=args[1], rotations=args[2],
        margin=1.2,
    )
    settings = settings._replace(num_entries=cap)

    def render(backend, device, need_grads=True):
        s = settings._replace(
            backend=backend,
            need_grads=need_grads,
            bg=jax.device_put(settings.bg, device),
            viewmatrix=jax.device_put(settings.viewmatrix, device),
            projmatrix=jax.device_put(settings.projmatrix, device),
            campos=jax.device_put(settings.campos, device),
        )
        a = tuple(jax.device_put(x, device) for x in args_np)

        @jax.jit
        def f(xyz, scales, quats, opac, colors):
            out = rast.rasterize(
                xyz, opac, s,
                colors_precomp=colors, scales=scales, rotations=quats,
            )
            return out["render"], out["rendered_depth"], out["rendered_final_opacity"]

        return tuple(np.asarray(x) for x in f(*a))

    tpu_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]
    img_c, dep_c, op_c = render("xla", cpu_dev)

    ok = True
    # training mode (need_grads=True, bit-exact payloads) AND the
    # inference/lean mode bench.py actually runs (need_grads=False:
    # slot operand dropped, (r,g)/(b,opacity) ride f16-packed payloads)
    for mode, need_grads in (("train-mode", True), ("inference-mode", False)):
        img_t, dep_t, op_t = render("pallas", tpu_dev, need_grads=need_grads)
        for name, a, b, tol in (
            ("render", img_t, img_c, 5e-3),
            ("depth", dep_t, dep_c, 5e-2),
            ("final_opacity", op_t, op_c, 5e-3),
        ):
            err = np.abs(a - b)
            frac_bad = float((err > tol).mean())
            print(f"{mode:15s}{name:14s} max|err|={err.max():.5f}  "
                  f"frac>tol={frac_bad:.5f}")
            # device transcendentals differ; allow a small fraction of
            # pixels past tol, but catastrophic divergence fails
            if frac_bad > 0.005:
                ok = False
        lit_t = float((img_t.sum(0) > 0).mean())
        lit_c = float((img_c.sum(0) > 0).mean())
        print(f"{mode:15s}lit fraction  tpu={lit_t:.4f} cpu={lit_c:.4f}")
        if abs(lit_t - lit_c) > 0.01:
            ok = False
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
