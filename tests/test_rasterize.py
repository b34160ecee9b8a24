"""End-to-end rasterizer tests: forward vs a literal per-pixel numpy oracle
of the CUDA compositing rules (forward.cu:261-397), and gradients of the
custom-VJP backward vs autodiff of an independent dense differentiable
implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaustudio_tpu.ops import binning, gaussian, rasterize
from gaustudio_tpu.ops.rasterize import RasterizeSettings


def _make_scene(n=40, seed=0, w=48, h=32):
    rng = np.random.default_rng(seed)
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = rng.uniform(-0.9, 0.9, n)
    means[:, 1] = rng.uniform(-0.9, 0.9, n)
    means[:, 2] = rng.uniform(1.0, 6.0, n)
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3) * 0.12
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.15, 0.9, n).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)

    tanx = tany = 0.7
    znear, zfar = 0.01, 100.0
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanx
    P[1, 1] = 1 / tany
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    settings = RasterizeSettings(
        image_height=h,
        image_width=w,
        tanfovx=tanx,
        tanfovy=tany,
        bg=jnp.zeros(3, jnp.float32),
        viewmatrix=jnp.asarray(W2V.T),
        projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.zeros(3, jnp.float32),
        num_entries=4096,
        chunk=256,
    )
    return dict(means=means, scales=scales, quats=quats, opac=opac,
                colors=colors, settings=settings)


def _oracle_composite(pre, w, h):
    """Literal sequential simulation of renderCUDA (forward.cu:261-397)."""
    gx = (w + 15) // 16
    gy = (h + 15) // 16
    valid = np.asarray(pre.valid)
    depths = np.asarray(pre.depths)
    m2 = np.asarray(pre.means2d)
    conic = np.asarray(pre.conic)
    opac = np.asarray(pre.opacities)
    cols = np.asarray(pre.colors)
    rmin = np.asarray(pre.rect_min)
    rmax = np.asarray(pre.rect_max)

    out = {
        "color": np.zeros((h, w, 3), np.float32),
        "depth": np.zeros((h, w), np.float32),
        "med_d": np.full((h, w), 15.0, np.float32),
        "med_w": np.zeros((h, w), np.float32),
        "med_i": np.zeros((h, w), np.float32),
        "T": np.ones((h, w), np.float32),
        "n_con": np.zeros((h, w), np.int32),
    }
    for ty in range(gy):
        for tx in range(gx):
            ids = [
                i for i in range(len(valid))
                if valid[i]
                and rmin[i, 0] <= tx < rmax[i, 0]
                and rmin[i, 1] <= ty < rmax[i, 1]
            ]
            ids.sort(key=lambda i: depths[i])  # python sort is stable
            for py in range(ty * 16, min(ty * 16 + 16, h)):
                for px in range(tx * 16, min(tx * 16 + 16, w)):
                    T = 1.0
                    C = np.zeros(3)
                    D = 0.0
                    med_d, med_w, med_i = 15.0, 0.0, 0.0
                    contributor = 0
                    last_contributor = 0
                    for i in ids:
                        contributor += 1
                        dx = m2[i, 0] - px
                        dy = m2[i, 1] - py
                        a, b, c = conic[i]
                        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                        if power > 0:
                            continue
                        alpha = min(0.99, opac[i] * np.exp(power))
                        if alpha < 1.0 / 255.0:
                            continue
                        test_T = T * (1 - alpha)
                        if test_T < 1e-4:
                            break
                        C += cols[i] * alpha * T
                        D += depths[i] * alpha * T
                        if T > 0.5 and test_T < 0.5:
                            med_d, med_w, med_i = depths[i], alpha * T, float(i)
                        T = test_T
                        last_contributor = contributor
                    out["color"][py, px] = C
                    out["depth"][py, px] = D
                    out["med_d"][py, px] = med_d
                    out["med_w"][py, px] = med_w
                    out["med_i"][py, px] = med_i
                    out["T"][py, px] = T
                    out["n_con"][py, px] = last_contributor
    return out


@pytest.fixture(scope="module")
def scene():
    return _make_scene()


def _run(scene, **kw):
    s = scene
    return rasterize.rasterize(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]), s["settings"],
        colors_precomp=jnp.asarray(s["colors"]), scales=jnp.asarray(s["scales"]),
        rotations=jnp.asarray(s["quats"]), **kw,
    )


def test_forward_matches_oracle(scene):
    s = scene
    st = s["settings"]
    res = jax.jit(lambda: _run(scene))()
    pre = gaussian.preprocess(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]),
        st.viewmatrix, st.projmatrix, st.campos,
        st.image_width, st.image_height, st.tanfovx, st.tanfovy,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    want = _oracle_composite(pre, st.image_width, st.image_height)

    got_rgb = np.moveaxis(np.asarray(res["render"]), 0, -1)
    np.testing.assert_allclose(got_rgb, want["color"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res["rendered_depth"][0]), want["depth"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res["rendered_median_depth"][0]), want["med_d"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res["rendered_median_weight"][0]), want["med_w"], rtol=2e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res["rendered_median_id"][0]), want["med_i"].astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(res["rendered_final_opacity"][0]), 1 - want["T"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(res["n_contrib"]), want["n_con"])
    assert int(res["num_rendered"]) > 0


def _naive_differentiable(means, opac, scales, quats, colors, st):
    """Independent dense differentiable forward: per-pixel cumprod over all
    gaussians in global stable depth order with tile-membership masks."""
    H, W = st.image_height, st.image_width
    pre = gaussian.preprocess(
        means, opac, st.viewmatrix, st.projmatrix, st.campos, W, H,
        st.tanfovx, st.tanfovy, colors_precomp=colors,
        scales=scales, rotations=quats,
    )
    order = jnp.argsort(pre.depths, stable=True)
    dep = pre.depths[order]
    m2 = pre.means2d[order]
    con = pre.conic[order]
    op = pre.opacities[order]
    col = pre.colors[order]
    val = pre.valid[order]
    rmin = pre.rect_min[order]
    rmax = pre.rect_max[order]

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    txs = xs // 16
    tys = ys // 16
    # membership [N, H, W]
    memb = (
        val[:, None, None]
        & (rmin[:, 0, None, None] <= txs[None])
        & (txs[None] < rmax[:, 0, None, None])
        & (rmin[:, 1, None, None] <= tys[None])
        & (tys[None] < rmax[:, 1, None, None])
    )
    dx = m2[:, 0, None, None] - xs[None]
    dy = m2[:, 1, None, None] - ys[None]
    a, b, c = con[:, 0, None, None], con[:, 1, None, None], con[:, 2, None, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where((power > 0) | (alpha < 1 / 255.0) | ~memb, 0.0, alpha)
    P = jnp.cumprod(1.0 - alpha, axis=0)
    P_excl = jnp.concatenate([jnp.ones_like(P[:1]), P[:-1]], axis=0)
    applied = P >= 1e-4
    w = jnp.where(applied, alpha * P_excl, 0.0)
    rgb = jnp.einsum("nhw,nc->chw", w, col)
    d = jnp.einsum("nhw,n->hw", w, dep)
    T_final = jnp.min(jnp.where(applied, P, 1.0), axis=0)
    return rgb, d, 1.0 - T_final


def test_gradients_match_naive_autodiff(scene):
    s = scene
    st = s["settings"]

    def loss_full(means, opac, scales, quats, colors):
        res = rasterize.rasterize(
            means, opac, st, colors_precomp=colors, scales=scales, rotations=quats
        )
        return (
            jnp.sum(res["render"] * w_rgb)
            + jnp.sum(res["rendered_depth"][0] * w_d)
            + jnp.sum(res["rendered_final_opacity"][0] * w_o)
        )

    def loss_naive(means, opac, scales, quats, colors):
        rgb, d, o = _naive_differentiable(means, opac, scales, quats, colors, st)
        return jnp.sum(rgb * w_rgb) + jnp.sum(d * w_d) + jnp.sum(o * w_o)

    rng = np.random.default_rng(7)
    H, W = st.image_height, st.image_width
    w_rgb = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    w_d = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    w_o = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    args = (
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]), jnp.asarray(s["scales"]),
        jnp.asarray(s["quats"]), jnp.asarray(s["colors"]),
    )
    g_full = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(*args)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "opac", "scales", "quats", "colors"]
    for name, a, b in zip(names, g_full, g_naive):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=5e-3, atol=2e-4,
                                   err_msg=f"grad mismatch for {name}")


@pytest.mark.slow
def test_gradient_finite_difference(scene):
    s = scene
    st = s["settings"]
    rng = np.random.default_rng(11)
    w_rgb = jnp.asarray(rng.normal(size=(3, st.image_height, st.image_width)).astype(np.float32))

    def loss(colors, opac):
        res = rasterize.rasterize(
            jnp.asarray(s["means"]), opac, st, colors_precomp=colors,
            scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
        )
        return jnp.sum(res["render"] * w_rgb)

    colors = jnp.asarray(s["colors"])
    opac = jnp.asarray(s["opac"])
    g_col, g_op = jax.grad(loss, argnums=(0, 1))(colors, opac)

    eps = 1e-3
    for idx in [(0, 0), (5, 1), (17, 2)]:
        e = np.zeros_like(s["colors"])
        e[idx] = eps
        fd = (loss(colors + e, opac) - loss(colors - e, opac)) / (2 * eps)
        np.testing.assert_allclose(float(g_col[idx]), float(fd), rtol=2e-2, atol=1e-3)
    for i in [3, 9]:
        e = np.zeros_like(s["opac"])
        e[i] = eps
        fd = (loss(colors, opac + e) - loss(colors, opac - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_op[i]), float(fd), rtol=2e-2, atol=1e-3)


def test_means2d_offset_grad_scaling(scene):
    """The viewspace-points gradient keeps the reference's x0.5W convention
    (backward.cu:492-493): doubling W doubles the x-offset gradient."""
    s = scene
    st = s["settings"]
    offset = jnp.zeros((s["means"].shape[0], 2), jnp.float32)

    def loss(off):
        res = rasterize.rasterize(
            jnp.asarray(s["means"]), jnp.asarray(s["opac"]), st,
            colors_precomp=jnp.asarray(s["colors"]),
            scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
            means2D_offset=off,
        )
        return jnp.sum(res["render"])

    g = jax.grad(loss)(offset)
    assert np.abs(np.asarray(g)).max() > 0.0


def test_capacity_overflow_truncates_gracefully(scene):
    s = scene
    st = s["settings"]._replace(num_entries=256, chunk=256)
    res = rasterize.rasterize(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]), st,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    assert np.isfinite(np.asarray(res["render"])).all()


def test_suggest_num_entries(scene):
    s = scene
    cap = rasterize.suggest_num_entries(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]), s["settings"],
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    assert cap >= 4096 and (cap & (cap - 1)) == 0


def test_gradients_finite_with_degenerate_points():
    """Culled rows (z~0, behind camera, at campos, boundary opacity) must
    not poison gradients: the 0-cotangent x inf-primal-derivative NaN trap
    in the projection/cov vjp (found as ~1200 NaN rows per 1k train iters)."""
    import jax

    from gaustudio_tpu.ops import rasterize as rast

    s = _make_scene(n=12, seed=7, w=32, h=32)
    st = s["settings"]
    xyz = np.asarray(s["means"]).copy()
    opac = np.asarray(s["opac"]).copy()
    # hazardous rows: near-zero view depth, behind camera, exactly at the
    # near plane, at the camera position, support-boundary opacity
    xyz[0] = [0.0, 0.0, 1e-8]
    xyz[1] = [0.1, 0.1, -0.5]
    xyz[2] = [0.0, 0.1, 0.2]
    xyz[3] = np.asarray(st.campos)
    opac[4] = 1.0 / 255.0
    xyz[5] = [0.0, 0.0, -1e-9]

    args = (jnp.asarray(xyz), jnp.asarray(s["scales"]),
            jnp.asarray(s["quats"]), jnp.asarray(opac),
            jnp.asarray(s["colors"]))

    def loss(xyz, scales, quats, opac, colors):
        out = rast.rasterize(xyz, opac, st, colors_precomp=colors,
                             scales=scales, rotations=quats)
        return (jnp.sum(out["render"]) + jnp.sum(out["rendered_depth"])
                + jnp.sum(out["rendered_final_opacity"]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for name, g in zip(["xyz", "scales", "quats", "opac", "colors"], grads):
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad: {name}"


def test_debug_flag_snapshots_nonfinite(tmp_path, monkeypatch):
    """settings.debug=True dumps a repro snapshot when inputs/outputs go
    non-finite (reference __init__.py:83-90 snapshot_fw.dump parity)."""
    import os
    import pickle

    dump = tmp_path / "snapshot_fw.dump"
    monkeypatch.setenv("GS_DEBUG_SNAPSHOT", str(dump))
    s = _make_scene(n=32)
    st = s["settings"]._replace(debug=True)
    xyz = jnp.asarray(s["means"]).at[3, 0].set(jnp.nan)
    out = rasterize.rasterize(
        xyz, jnp.asarray(s["opac"]), st,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    jax.block_until_ready(out["render"])
    jax.effects_barrier()
    assert dump.exists()
    with open(dump, "rb") as f:
        snap = pickle.load(f)
    assert any("means3D" in b for b in snap["bad_leaves"])

    # finite scene -> no dump
    dump2 = tmp_path / "clean.dump"
    monkeypatch.setenv("GS_DEBUG_SNAPSHOT", str(dump2))
    out = rasterize.rasterize(
        jnp.asarray(s["means"]), jnp.asarray(s["opac"]), st,
        colors_precomp=jnp.asarray(s["colors"]),
        scales=jnp.asarray(s["scales"]), rotations=jnp.asarray(s["quats"]),
    )
    jax.block_until_ready(out["render"])
    jax.effects_barrier()
    assert not dump2.exists()
