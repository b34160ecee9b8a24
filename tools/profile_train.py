"""Train-step profiler on the real TPU (800x800, 50k gaussians).

Breaks the 3DGS train step into sub-jits with honest scalar-read fences to
find where the ~529 ms/it goes. Numbers feed PLAN.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops import rasterize as rast
from gaustudio_tpu.ops import ssim as ssim_ops
from gaustudio_tpu.ops.rasterize import RasterizeSettings
from gaustudio_tpu.pipelines import train as T


def sync(x):
    return float(jnp.reshape(x, (-1,))[0].astype(jnp.float32))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    H = W = 800
    n = 50_000
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 1.2
    rgb = rng.uniform(0.2, 0.9, size=(n, 3)).astype(np.float32)

    from gaustudio_tpu import models

    pcd = models.make({"name": "vanilla_pcd", "sh_degree": 3})
    pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    state = T.init_state(pcd)
    cap = state.params["xyz"].shape[0]
    print(f"capacity = {cap}", flush=True)

    tanfov = 0.7
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    W2V[2, 3] = 4.0
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfov
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    batch = T.CameraBatch(
        viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.asarray(-W2V[:3, :3].T @ W2V[:3, 3]),
        gt_image=jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32)),
    )

    probe = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=None, sh_degree=3, num_entries=1 << 14, chunk=2048,
        viewmatrix=batch.viewmatrix, projmatrix=batch.projmatrix,
        campos=batch.campos,
    )
    ne = rast.suggest_num_entries(
        state.params["xyz"], jax.nn.sigmoid(state.params["opacity"][:, 0]),
        probe, scales=jnp.exp(state.params["scale"]),
        rotations=state.params["rot"], margin=1.3,
    )
    settings = probe._replace(num_entries=ne, viewmatrix=None,
                              projmatrix=None, campos=None)
    print(f"num_entries = {ne}", flush=True)

    cfg = T.TrainConfig()

    # 1. whole train step (state is donated: carry it through the loop)
    st, _m = T.train_step(state, batch, settings, cfg)
    sync(_m["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        st, _m = T.train_step(st, batch, settings, cfg)
    sync(_m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    state = st
    print(f"train_step: {ms:.1f} ms", flush=True)

    s = settings._replace(viewmatrix=batch.viewmatrix,
                          projmatrix=batch.projmatrix, campos=batch.campos,
                          bg=jnp.zeros(3))

    # 2. forward render only
    @jax.jit
    def fwd(params):
        out = T.render_from_params(params, state.valid, state.active_sh_degree, s)
        return out["render"]

    ms, _ = timeit(fwd, state.params)
    print(f"forward render: {ms:.1f} ms", flush=True)

    # 3. forward + loss
    offset0 = jnp.zeros((cap, 2), jnp.float32)

    def loss_fn(params, offset):
        out = T.render_from_params(params, state.valid, state.active_sh_degree, s,
                                   means2d_offset=offset)
        loss = ssim_ops.rgb_loss(out["render"], batch.gt_image, cfg.lambda_dssim)
        return loss, out

    @jax.jit
    def fwd_loss(params):
        return loss_fn(params, offset0)[0]

    ms, _ = timeit(fwd_loss, state.params)
    print(f"forward + loss: {ms:.1f} ms", flush=True)

    # 4. value_and_grad (full backward, no adam)
    @jax.jit
    def vag(params):
        (loss, _), grads = jax.value_and_grad(
            lambda p, o: loss_fn(p, o), argnums=(0, 1), has_aux=True
        )(params, offset0)
        return loss, grads

    ms, _ = timeit(vag, state.params)
    print(f"value_and_grad: {ms:.1f} ms", flush=True)

    # 5. SSIM loss fwd+bwd alone
    @jax.jit
    def ssim_grad(img):
        return jax.grad(
            lambda x: ssim_ops.rgb_loss(x, batch.gt_image, cfg.lambda_dssim)
        )(img)

    img = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    ms, _ = timeit(ssim_grad, img)
    print(f"ssim loss grad: {ms:.1f} ms", flush=True)

    # 6. adam update alone
    from gaustudio_tpu.pipelines.optimizers.general import adam_update

    grads0 = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def adam(params, opt):
        lrs = {k: 1e-3 for k in params}
        return adam_update(grads0, opt, params, lrs, row_mask=state.valid)

    ms, _ = timeit(adam, state.params, state.opt)
    print(f"adam update: {ms:.1f} ms", flush=True)

    # 7. densify_and_prune
    key = jax.random.PRNGKey(0)

    @jax.jit
    def dens(st):
        return T.densify_and_prune(st, key, jnp.asarray(2.0), cfg,
                                   jnp.asarray(True))

    ms, _ = timeit(dens, state)
    print(f"densify_and_prune: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
