"""TPU gradient parity: Pallas fwd+bwd vs the XLA reference path, same chip.

Run after any backward-kernel change. Compares dL/d{means3D, scales, quats,
opacity, colors} of a sum-based scalar loss over render+depth+opacity.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gaustudio_tpu.ops import rasterize as rast
from gaustudio_tpu.ops.rasterize import RasterizeSettings

def main():
    rng = np.random.default_rng(3)
    n = 4000
    H, W = 256, 320
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * np.array([1.2, 1.0, 1.0], np.float32)
    xyz[:, 2] += 3.2
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.6 - 3.2)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(size=(n,)).astype(np.float32))))
    colors = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)

    tanfov = 0.75
    tanfovy = tanfov * H / W
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov; P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear); P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    base = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfovy,
        bg=jnp.asarray([0.3, 0.1, 0.2]), viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T), campos=jnp.zeros(3),
        num_entries=0, chunk=2048,
    )
    cap = rast.suggest_num_entries(
        jnp.asarray(xyz), jnp.asarray(opac), base,
        scales=jnp.asarray(scales), rotations=jnp.asarray(quats), margin=1.3)
    print("cap =", cap, flush=True)

    wr, wd, wo = [jnp.asarray(rng.normal(size=s).astype(np.float32))
                  for s in [(3, H, W), (1, H, W), (1, H, W)]]

    def loss(backend, xyz, scales, quats, opac, colors):
        s = base._replace(num_entries=cap, backend=backend)
        out = rast.rasterize(xyz, opac, s, colors_precomp=colors,
                             scales=scales, rotations=quats)
        return (jnp.sum(out["render"] * wr) + jnp.sum(out["rendered_depth"] * wd)
                + jnp.sum(out["rendered_final_opacity"] * wo))

    args = tuple(jnp.asarray(a) for a in (xyz, scales, quats, opac, colors))
    gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4)))(*args)
    gx = jax.jit(jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4)))(*args)
    names = ["xyz", "scales", "quats", "opac", "colors"]
    ok = True
    for nm, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        err = np.abs(a - b).max() / scale
        frac = (np.abs(a - b) > 0.02 * scale).mean()
        print(f"{nm:8s} relmax={err:.2e}  frac>2%={frac:.2e}", flush=True)
        if err > 0.08 or frac > 2e-4:
            ok = False
    print("GRAD PARITY OK" if ok else "GRAD PARITY FAIL", flush=True)
    return 0 if ok else 1

if __name__ == "__main__":
    raise SystemExit(main())
