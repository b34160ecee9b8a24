"""TPU surfel gradient parity: Pallas fwd+bwd vs the XLA compositor path.

Run after any surfel-kernel change (the CPU tests run the kernels in
interpret mode and cannot catch Mosaic/TPU-only numerics).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gaustudio_tpu.ops import rasterize_surfel as RS
from gaustudio_tpu.ops.rasterize import RasterizeSettings


def main():
    rng = np.random.default_rng(7)
    n = 4000
    H, W = 256, 320
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * np.array([1.2, 1.0, 1.0], np.float32)
    xyz[:, 2] += 3.2
    scales = np.exp(rng.normal(size=(n, 2)).astype(np.float32) * 0.6 - 3.0)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(size=(n,)).astype(np.float32))))
    colors = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)

    tanfov = 0.75
    tanfovy = tanfov * H / W
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    st = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfovy,
        bg=jnp.zeros(3), viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T), campos=jnp.zeros(3),
        num_entries=1 << 17, chunk=2048,
    )
    wr = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(1, H, W)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(1, H, W)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    wm = jnp.asarray(rng.normal(size=(1, H, W)).astype(np.float32))

    def loss(backend, xyz, opac, scales, quats, colors, off):
        s = st._replace(backend=backend)
        out = RS.rasterize_surfels(
            xyz, opac, s, scales=scales, rotations=quats,
            colors_precomp=colors, means2D_offset=off,
        )
        return (jnp.sum(out["render"] * wr)
                + jnp.sum(out["rendered_depth_sum"] * wd)
                + jnp.sum(out["rendered_alpha"] * wa)
                + jnp.sum(out["rendered_normal_view"] * wn)
                + jnp.sum(out["rendered_dist_m2"] * wm)
                + 0.5 * jnp.sum(out["rendered_dist_m1"] * wd))

    args = tuple(jnp.asarray(a) for a in
                 (xyz, opac, scales, quats, colors,
                  np.zeros((n, 2), np.float32)))
    g_pal = jax.jit(jax.grad(lambda *a: loss("pallas", *a),
                             argnums=(0, 1, 2, 3, 4, 5)))(*args)
    g_ref = jax.jit(jax.grad(lambda *a: loss("xla", *a),
                             argnums=(0, 1, 2, 3, 4, 5)))(*args)

    names = ["xyz", "opac", "scales", "quats", "colors", "offset"]
    ok = True
    for nm, a, b in zip(names, g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        rel = np.abs(a - b) / scale
        finite = np.isfinite(a).all()
        print(f"{nm:8s} relmax={rel.max():.3e} finite={finite}")
        ok &= finite and rel.max() < 5e-3
    print("SURFEL GRAD PARITY OK" if ok else "SURFEL GRAD PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
