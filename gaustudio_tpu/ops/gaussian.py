"""Per-Gaussian projection math (the rasterizer "preprocess" stage).

TPU-native re-design of `preprocessCUDA` and helpers
(cuda_rasterizer/forward.cu:74-256, auxiliary.h:40-164): frustum culling,
3D covariance from scale/quaternion, EWA 2D covariance projection, conic
inversion, screen-space radius and tile-rect computation.

Everything here is written batched over the leading N axis in plain jnp —
this stage is embarrassingly parallel and XLA fuses it into a handful of
elementwise kernels; no Pallas needed.  All matrices follow the reference's
convention: ``viewmatrix`` / ``projmatrix`` are the *transposed* W2V /
W2V@P matrices (row-vector convention, ``p_view = (p,1) @ viewmatrix``),
exactly as produced by the reference Camera
(gaustudio/datasets/__init__.py:154-159).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops import sh as sh_ops

# Tile size of the binning grid. The CUDA reference uses 16x16
# (cuda_rasterizer/config.h:16-17); we keep 16x16 so a tile's 256 pixels map
# onto two native (8,128) f32 VPU tiles.
TILE_X = 16
TILE_Y = 16
TILE_PIXELS = TILE_X * TILE_Y

# Frustum near-cull threshold (auxiliary.h:156).
NEAR_CULL_Z = 0.2


def quat_to_rotmat(q, normalize: bool = True):
    """Quaternion (w,x,y,z) -> rotation matrix [..., 3, 3].

    Matches gaustudio/models/utils.py:44-65 `build_rotation` (which
    normalizes) and CUDA computeCov3D (forward.cu:127: NOT normalized — the
    renderers pre-normalize via the model's "normalize" activation, so both
    paths agree in practice).
    """
    if normalize:
        q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-18)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scale, scale_modifier, quat, normalize_quat: bool = False):
    """3D covariance Σ = R S² Rᵀ as the 6 upper-triangular entries.

    Port of CUDA computeCov3D (forward.cu:118-152).  Output order
    (xx, xy, xz, yy, yz, zz) matches cov3D[0..5] and the torch-side
    build_covariance_from_scaling_rotation (gaustudio/models/utils.py:93-97).
    ``normalize_quat`` defaults to False to mirror the kernel's quirk
    (forward.cu:127 — normalization is commented out upstream).

    Written in structure-of-scalars form: every intermediate is an [N]
    vector, so XLA lays the work out along full 128-lane tiles instead of
    3-lane-wide [N,3,3] arrays.
    """
    if normalize_quat:
        quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    R00 = 1.0 - 2.0 * (y * y + z * z)
    R01 = 2.0 * (x * y - r * z)
    R02 = 2.0 * (x * z + r * y)
    R10 = 2.0 * (x * y + r * z)
    R11 = 1.0 - 2.0 * (x * x + z * z)
    R12 = 2.0 * (y * z - r * x)
    R20 = 2.0 * (x * z - r * y)
    R21 = 2.0 * (y * z + r * x)
    R22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = (scale_modifier * scale[..., 0]) ** 2
    s1 = (scale_modifier * scale[..., 1]) ** 2
    s2 = (scale_modifier * scale[..., 2]) ** 2
    # Σ_ij = sum_k R_ik R_jk s_k
    c_xx = R00 * R00 * s0 + R01 * R01 * s1 + R02 * R02 * s2
    c_xy = R00 * R10 * s0 + R01 * R11 * s1 + R02 * R12 * s2
    c_xz = R00 * R20 * s0 + R01 * R21 * s1 + R02 * R22 * s2
    c_yy = R10 * R10 * s0 + R11 * R11 * s1 + R12 * R12 * s2
    c_yz = R10 * R20 * s0 + R11 * R21 * s1 + R12 * R22 * s2
    c_zz = R20 * R20 * s0 + R21 * R21 * s1 + R22 * R22 * s2
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def transform_points(points, mat4):
    """(p, 1) @ mat4 -> [..., 4]; mat4 is the transposed-matrix convention.

    Written as explicit scalar muls/adds rather than ``points @ mat4``: on
    TPU an f32 matmul defaults to bf16 MXU passes, which would quantize
    world/screen positions (~8px error at 2000px) — and a 3-wide contraction
    belongs on the VPU anyway.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return jnp.stack(
        [x * mat4[0, i] + y * mat4[1, i] + z * mat4[2, i] + mat4[3, i]
         for i in range(4)],
        axis=-1,
    )


def transform_dirs(dirs, mat):
    """dirs @ mat for [...,3] x [3,C] — scalarized for the same f32-on-TPU
    reason as transform_points (no translation row)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [x * mat[0, i] + y * mat[1, i] + z * mat[2, i]
         for i in range(mat.shape[1])],
        axis=-1,
    )


def compute_cov2d(means3d, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, viewmatrix):
    """EWA projection of 3D covariance to screen space.

    Port of computeCov2D (forward.cu:74-113): view-space position clamped to
    1.3x the fov tangent, Jacobian J of the perspective projection,
    cov2D = J W Σ Wᵀ Jᵀ + 0.3·I low-pass (the glm column-major arithmetic of
    the reference reduces exactly to this formula).

    Returns [..., 3]: (c_xx, c_xy, c_yy).
    """
    t = transform_points(means3d, viewmatrix)[..., :3]
    # Rows with |tz| below the near plane are all frustum-culled, but their
    # 1/tz must stay finite: a NaN/inf primal poisons the whole gradient
    # through the masked-out branch (0-cotangent x inf = NaN in the vjp) —
    # points crossing z=0 during training used to NaN their own parameters.
    tz_raw = t[..., 2]
    tz = jnp.where(tz_raw >= 0.0, jnp.maximum(tz_raw, NEAR_CULL_Z),
                   jnp.minimum(tz_raw, -NEAR_CULL_Z))
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows (2x3): [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    W = viewmatrix[:3, :3]  # rows are world-axis images => W2V rotation transposed
    # world->view rotation R_wv acts as v = p @ W  =>  R_wv = W^T
    Rwv = W.T  # [3,3] per-frame constant

    # V = R_wv Σ R_wvᵀ, then cov2d = J V Jᵀ with the 2x3 J above.
    # Structure-of-scalars: [N]-vector intermediates only (no [N,3,3]).
    c0, c1, c2 = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    c3, c4, c5 = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def sigma_row(a, b, cc):  # Σ @ r for constant r = (a, b, cc)
        return (
            c0 * a + c1 * b + c2 * cc,
            c1 * a + c3 * b + c4 * cc,
            c2 * a + c4 * b + c5 * cc,
        )

    # V_ij = R_i Σ R_jᵀ with constant rows R_i of Rwv
    r0, r1, r2 = Rwv[0], Rwv[1], Rwv[2]
    s0 = sigma_row(r0[0], r0[1], r0[2])
    s1 = sigma_row(r1[0], r1[1], r1[2])
    s2 = sigma_row(r2[0], r2[1], r2[2])

    def dotr(s, r):
        return s[0] * r[0] + s[1] * r[1] + s[2] * r[2]

    V00 = dotr(s0, r0)
    V01 = dotr(s0, r1)
    V02 = dotr(s0, r2)
    V11 = dotr(s1, r1)
    V12 = dotr(s1, r2)
    V22 = dotr(s2, r2)

    # J rows (per-gaussian scalars): Jr0 = (j00, 0, j02), Jr1 = (0, j11, j12)
    cxx = j00 * (V00 * j00 + V02 * j02) + j02 * (V02 * j00 + V22 * j02) + 0.3
    cxy = j00 * (V01 * j11 + V02 * j12) + j02 * (V12 * j11 + V22 * j12)
    cyy = j11 * (V11 * j11 + V12 * j12) + j12 * (V12 * j11 + V22 * j12) + 0.3
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def ndc2pix(v, size):
    """auxiliary.h:40-43."""
    return ((v + 1.0) * size - 1.0) * 0.5


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (the CUDA geometry state)."""

    valid: jnp.ndarray  # [N] bool — survives culling and has nonzero extent
    depths: jnp.ndarray  # [N] view-space z
    means2d: jnp.ndarray  # [N, 2] pixel coordinates
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    opacities: jnp.ndarray  # [N]
    colors: jnp.ndarray  # [N, C]
    radii: jnp.ndarray  # [N] int32 screen radius (0 if culled)
    rect_min: jnp.ndarray  # [N, 2] int32 tile rect (x, y)
    rect_max: jnp.ndarray  # [N, 2] int32 tile rect exclusive
    tiles_touched: jnp.ndarray  # [N] int32


def get_rect(means2d, radius_x, grid_x, grid_y, radius_y=None):
    """Tile bounding rect of a splat; port of getRect (auxiliary.h:46-56),
    generalized to separate x/y half-extents (the reference passes the same
    circle radius for both)."""
    if radius_y is None:
        radius_y = radius_x
    px, py = means2d[..., 0], means2d[..., 1]
    rmin_x = jnp.clip(jnp.floor((px - radius_x) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(jnp.floor((py - radius_y) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(
        jnp.floor((px + radius_x + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, grid_x
    )
    rmax_y = jnp.clip(
        jnp.floor((py + radius_y + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, grid_y
    )
    return (
        jnp.stack([rmin_x, rmin_y], -1),
        jnp.stack([rmax_x, rmax_y], -1),
    )


def preprocess(
    means3d,
    opacities,
    viewmatrix,
    projmatrix,
    campos,
    image_width: int,
    image_height: int,
    tan_fovx,
    tan_fovy,
    *,
    shs=None,
    sh_degree=3,
    colors_precomp=None,
    scales=None,
    rotations=None,
    cov3d_precomp=None,
    scale_modifier=1.0,
    means2d_offset=None,
    valid_mask=None,
    antialias: bool = False,
    intrinsics=None,
) -> Preprocessed:
    """Full per-Gaussian preprocess; port of preprocessCUDA (forward.cu:156-256).

    ``means2d_offset`` is the functional substitute for the reference's
    zero-valued ``screenspace_points`` input (gaustudio/renderers/base.py:13-17):
    gradients w.r.t. it are the screen-space position gradients that the
    densification heuristic accumulates.

    ``intrinsics`` = (fx, fy, cx, cy) selects the gsplat-style projection
    path (gaustudio/renderers/gsplat_renderer.py:38-66 / gsplat
    project_gaussians): screen position fx*tx/tz + cx straight from camera
    intrinsics — no ndc / projmatrix — with the EWA focal taken from fx/fy
    and the fov clamp derived as tan_fov = 0.5*size/focal.  The -0.5 shift
    maps gsplat's pixel-center convention onto this compositor's integer
    pixel grid (cx = W/2 lands on (W-1)/2, identical to ndc2Pix).
    ``tan_fovx/tan_fovy/projmatrix`` are ignored in this mode.
    """
    grid_x = (image_width + TILE_X - 1) // TILE_X
    grid_y = (image_height + TILE_Y - 1) // TILE_Y

    p_view = transform_points(means3d, viewmatrix)[..., :3]
    depths = p_view[..., 2]
    in_front = depths > NEAR_CULL_Z

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_cov3d(scales, scale_modifier, rotations)

    if intrinsics is not None:
        fx, fy, cx, cy = (intrinsics[i] for i in range(4))
        focal_x, focal_y = fx, fy
        tan_fovx = 0.5 * image_width / fx
        tan_fovy = 0.5 * image_height / fy
        # same signed-clamp guard as compute_cov2d: culled rows stay finite
        tz_raw = depths
        tz = jnp.where(tz_raw >= 0.0, jnp.maximum(tz_raw, NEAR_CULL_Z),
                       jnp.minimum(tz_raw, -NEAR_CULL_Z))
        mean2d_base = jnp.stack(
            [focal_x * p_view[..., 0] / tz + cx - 0.5,
             focal_y * p_view[..., 1] / tz + cy - 0.5], -1
        )
    else:
        p_hom = transform_points(means3d, projmatrix)
        # reference adds 1e-7 (rasterize CUDA); additionally keep the
        # denominator away from 0 so culled rows near w=0 stay finite in
        # the vjp (see the tz guard in compute_cov2d)
        denom = p_hom[..., 3] + 1e-7
        denom = jnp.where(denom >= 0.0, jnp.maximum(denom, 1e-4),
                          jnp.minimum(denom, -1e-4))
        p_w = 1.0 / denom
        p_proj = p_hom[..., :3] * p_w[..., None]
        focal_x = image_width / (2.0 * tan_fovx)
        focal_y = image_height / (2.0 * tan_fovy)
        mean2d_base = jnp.stack(
            [ndc2pix(p_proj[..., 0], image_width),
             ndc2pix(p_proj[..., 1], image_height)], -1
        )

    cov2d = compute_cov2d(means3d, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, viewmatrix)

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    # det > 0 (not det != 0 as in the reference): the EWA cov2d + 0.3 I is
    # PD so valid splats always satisfy it, while `!= 0` would PASS a NaN
    # det (NaN != 0 is True) and let a poisoned row into binning
    det_ok = det > 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv], -1
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    mean2d = mean2d_base
    if means2d_offset is not None:
        mean2d = mean2d + means2d_offset

    # Binning rect: the reference bins every tile in the 3*sqrt(lambda_max)
    # CIRCLE bbox (forward.cu:229-232 + getRect). A tighter parity-safe rect
    # is the intersection of that square with the bbox of the *support
    # ellipse* {d: d^T cov2d^-1 d <= R^2}, R^2 = 2 ln(255*opacity) — outside
    # it alpha < 1/255 and the compositor skips the pixel anyway
    # (forward.cu:354), and the per-axis Mahalanobis bbox is R*sqrt(cov_ii).
    # Culled tiles therefore never had a visible contribution: images are
    # bit-identical while entry counts drop ~20-40% for anisotropic splats.
    # +1e-12 inside the sqrts: sqrt'(0) is inf and the vjp of a ZERO
    # cotangent through it is 0/0 = NaN (ceil's zero grad still routes
    # through sqrt) — the epsilon keeps the vjp exactly 0 there
    op_flat = jnp.reshape(opacities, (-1,))
    if antialias:
        # gsplat's rasterize_mode="antialiased" (the Mip-Splatting 2D
        # compensation): scale opacity by sqrt(det(cov2d_raw)/det(cov2d))
        # so the 0.3 low-pass dilation conserves splat mass instead of
        # brightening small splats. det_inv is 0 for culled rows.
        det_raw = ((cov2d[..., 0] - 0.3) * (cov2d[..., 2] - 0.3)
                   - cov2d[..., 1] * cov2d[..., 1])
        # +1e-12 for the degenerate det_raw<=0 splats this mode targets:
        # sqrt'(0)=inf would turn the clamp's 0 cotangent into NaN grads
        op_flat = op_flat * jnp.sqrt(jnp.maximum(det_raw, 0.0) * det_inv
                                     + 1e-12)
    r_support = jnp.sqrt(
        jnp.maximum(0.0, 2.0 * jnp.log(255.0 * jnp.maximum(op_flat, 1e-12)))
        + 1e-12
    )
    # op <= 1/255 must keep bbox 0 (fully culled) — the sqrt epsilon alone
    # would ceil a 1e-6 support radius up to a 1-pixel bbox
    supported = op_flat > (1.0 / 255.0)
    bbox_x = jnp.where(supported, jnp.ceil(
        jnp.minimum(radius_f,
                    r_support * jnp.sqrt(jnp.maximum(cov2d[..., 0], 0.0) + 1e-12))
    ), 0.0)
    bbox_y = jnp.where(supported, jnp.ceil(
        jnp.minimum(radius_f,
                    r_support * jnp.sqrt(jnp.maximum(cov2d[..., 2], 0.0) + 1e-12))
    ), 0.0)
    rect_min, rect_max = get_rect(mean2d, bbox_x, grid_x, grid_y, bbox_y)
    rect_wh = rect_max - rect_min
    tiles = rect_wh[..., 0] * rect_wh[..., 1]

    # radii / visibility keep the reference's circle-rect criterion
    # (preprocessCUDA stores radius whenever the 3-sigma rect is non-empty,
    # independent of opacity) so visibility_filter semantics are unchanged
    circ_min, circ_max = get_rect(mean2d, radius_f, grid_x, grid_y)
    circ_wh = circ_max - circ_min
    vis = in_front & det_ok & ((circ_wh[..., 0] * circ_wh[..., 1]) > 0)

    valid = in_front & det_ok & (tiles > 0)
    if valid_mask is not None:
        # padded-capacity training: masked rows are culled before binning
        valid = valid & valid_mask
        vis = vis & valid_mask

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        colors, _clamped = sh_ops.sh_to_rgb_clamped(sh_degree, shs, means3d, campos)

    radii = jnp.where(vis, radius_f.astype(jnp.int32), 0)
    tiles = jnp.where(valid, tiles, 0)

    return Preprocessed(
        valid=valid,
        depths=depths,
        means2d=mean2d,
        conic=conic,
        opacities=op_flat,
        colors=colors,
        radii=radii,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles,
    )


def mark_visible(means3d, viewmatrix, projmatrix=None):
    """Frustum visibility check; port of checkFrustum / markVisible
    (rasterizer_impl.cu:54-66, 141-153): view-space z > 0.2."""
    del projmatrix  # unused, like the reference (only z-cull is active)
    p_view = transform_points(means3d, viewmatrix)[..., :3]
    return p_view[..., 2] > NEAR_CULL_Z
