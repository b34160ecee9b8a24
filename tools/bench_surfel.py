"""Surfel (2DGS) render bench on TPU: Pallas fwd vs XLA compositor."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gaustudio_tpu.ops import rasterize_surfel as RS
from gaustudio_tpu.ops.rasterize import RasterizeSettings

def sync(x):
    return float(jnp.reshape(x, (-1,))[0])

def main():
    H, W = 1080, 1920
    n = 200_000
    rng = np.random.default_rng(0)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.normal(size=n) * 1.1
    xyz[:, 1] = rng.normal(size=n) * 0.65
    xyz[:, 2] = rng.uniform(0.8, 6.0, n)
    scales = (np.exp(rng.normal(size=(n, 3)) * 0.4) * 0.01).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    tanfov = 0.85
    tanfovy = tanfov * H / W
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov; P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear); P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    base = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfovy,
        bg=jnp.zeros(3), viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T), campos=jnp.zeros(3),
        num_entries=0, chunk=4096,
    )
    # capacity probe via the surfel preprocess
    pre = RS.preprocess_surfel(
        jnp.asarray(xyz), jnp.asarray(opac), base.viewmatrix, base.projmatrix,
        base.campos, W, H, scales=jnp.asarray(scales),
        rotations=jnp.asarray(quats), colors_precomp=jnp.asarray(colors),
    )
    from gaustudio_tpu.ops import binning as B
    total = int(jnp.sum(jnp.maximum(pre.tiles_touched, 1)))
    cap = B.bucket_capacity(int(total * 1.1))
    print(f"surfels={n} entries={total} cap={cap}", flush=True)

    args = tuple(jnp.asarray(a) for a in (xyz, opac, scales, quats, colors))

    def make(backend, iters, need_grads=True):
        # inference mirrors the mesh-extraction renderer mode: median depth
        # on, median-ID off (the reference's standard 7-channel allmap has
        # no id channel; it is an optional extension)
        s = base._replace(num_entries=cap, backend=backend,
                          need_grads=need_grads,
                          with_median_id=need_grads)

        @jax.jit
        def render(xyz, opac, scales, quats, colors):
            out = RS.rasterize_surfels(xyz, opac, s, scales=scales,
                                       rotations=quats, colors_precomp=colors)
            return out["render"], out["rendered_alpha"]

        img, alpha = render(*args)
        sync(img)
        lit = float((np.asarray(alpha) > 0.01).mean())
        t0 = time.perf_counter()
        for _ in range(iters):
            img, _ = render(*args)
        sync(img)
        dt = (time.perf_counter() - t0) / iters
        mode = "train" if need_grads else "inference"
        print(f"{backend} ({mode}): {dt*1e3:.1f} ms/frame = "
              f"{H*W/1e6/dt:.2f} MPix/s  (lit {lit:.3f})", flush=True)
        return dt

    dt_p = make("pallas", 10)
    # inference path (the reference's mesh-extraction renderer mode):
    # packed single-sort flat table, no realign, no slot operand
    make("pallas", 10, need_grads=False)
    dt_x = make("xla", 3)
    print(f"speedup: {dt_x/dt_p:.1f}x", flush=True)

if __name__ == "__main__":
    main()
