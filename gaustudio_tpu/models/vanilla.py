"""VanillaPointCloud — the standard 3DGS model.

Port of gaustudio/models/vanilla_sg.py:19-181: attributes xyz(3), opacity(1),
f_dc(3), f_rest(45), scale(3), rot(4) with exp/sigmoid/normalize activations,
SH feature assembly, dist2-based scale init, and the Inria checkpoint export
layout (x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,rot_*).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu import models
from gaustudio_tpu.models.base import BasePointCloud
from gaustudio_tpu.models.utils import (
    build_covariance_from_scaling_rotation,
    get_activation,
    inverse_sigmoid,
)
from gaustudio_tpu.ops.sh import RGB2SH
from gaustudio_tpu.utils import ply as plyio


def calculate_dist2(xyz) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors.

    Replaces simple_knn._C.distCUDA2; same math as the reference's pure-python
    fallback (vanilla_sg.py:9-14) via a scipy KDTree.
    """
    pts = np.asarray(xyz, np.float32)
    from scipy.spatial import cKDTree

    dists, _ = cKDTree(pts).query(pts, k=4)
    return (dists[:, 1:] ** 2).mean(axis=1).astype(np.float32)


@models.register("vanilla_pcd")
class VanillaPointCloud(BasePointCloud):
    default_conf = {
        "sh_degree": 3,
        "attributes": {
            "xyz": 3,
            "opacity": 1,
            "f_dc": 3,
            "f_rest": 45,
            "scale": 3,
            "rot": 4,
        },
        "activations": {"scale": "exp", "opacity": "sigmoid", "rot": "normalize"},
    }

    def __init__(self, config=None, device=None) -> None:
        super().__init__(config, device)
        self.active_sh_degree = 0
        self.max_sh_degree = self.config["sh_degree"]
        # densification bookkeeping (vanilla_sg.py:42-44)
        self.max_radii2D = np.zeros(0, np.float32)
        self.xyz_gradient_accum = np.zeros(0, np.float32)
        self.denom = np.zeros(0, np.float32)

        resume_path = self.config.get("resume_path", None)
        if resume_path is not None:
            print("Resuming pointcloud")
            self.load(resume_path)

    def setup_functions(self):
        """vanilla_sg.py:53-56."""
        self.covariance_activation = build_covariance_from_scaling_rotation
        self.scaling_inverse_activation = jnp.log
        self.inverse_opacity_activation = inverse_sigmoid

    def get_attribute(self, attribute):
        """vanilla_sg.py:58-63: activated getters."""
        raw = jnp.asarray(getattr(self, "_" + attribute))
        if attribute in self.config.get("activations", {}):
            return get_activation(self.config["activations"][attribute])(raw)
        return raw

    def oneupSHdegree(self):
        """vanilla_sg.py:65-67."""
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    def create_from_attribute(self, xyz, rgb=None, scale=None, rot=None,
                              opacity=None, **args):
        """vanilla_sg.py:69-97: RGB -> SH dc, kNN log-scale init, identity
        quats, opacity = inverse_sigmoid(0.1)."""
        xyz = np.asarray(xyz, np.float32)
        self._xyz = xyz
        self.num_points = xyz.shape[0]

        if rgb is None:
            rgb = np.ones_like(xyz)
        fused = np.asarray(RGB2SH(np.asarray(rgb, np.float32)))
        self._f_dc = fused.astype(np.float32)  # [N, 3]
        n_rest = (self.max_sh_degree + 1) ** 2 - 1
        self._f_rest = np.zeros((xyz.shape[0], n_rest * 3), np.float32)

        if scale is None:
            dist2 = calculate_dist2(xyz)
            sdim = int(self.config.get("attributes", {}).get("scale", 3))
            self._scale = np.repeat(
                np.log(np.sqrt(dist2 + 1e-7))[:, None], sdim, axis=1
            ).astype(np.float32)
        else:
            self._scale = np.asarray(scale, np.float32)

        if rot is None:
            self._rot = np.zeros((xyz.shape[0], 4), np.float32)
            self._rot[:, 0] = 1.0
        else:
            self._rot = np.asarray(rot, np.float32)

        if opacity is None:
            self._opacity = np.asarray(
                inverse_sigmoid(0.1 * np.ones((xyz.shape[0], 1), np.float32))
            )
        else:
            self._opacity = np.asarray(opacity, np.float32)

    def get_covariance(self, scaling_modifier=1):
        """vanilla_sg.py:99-100."""
        return self.covariance_activation(
            self.get_attribute("scale"), scaling_modifier, jnp.asarray(self._rot)
        )

    # -- feature assembly (vanilla_sg.py:102-140) -----------------------------
    @property
    def get_features(self):
        """[N, K, 3] band-major SH coefficients.

        ``_f_rest`` is stored in the on-disk Inria layout: a flat (N, 3*Kr)
        channel-major array (f_rest_{c*Kr+k}).  NOTE: the reference's
        get_features (vanilla_sg.py:104-107) reshapes this directly to
        (N, Kr, 3), which scrambles channel/band for any checkpoint with
        non-zero rest coefficients — a latent upstream bug.  We apply the
        correct channel->band transpose (matching Inria's own loader) so
        view-dependent color is evaluated faithfully.
        """
        n = self.num_points
        f_dc = jnp.asarray(self._f_dc).reshape(n, 1, 3)
        f_rest = jnp.asarray(self._f_rest).reshape(n, 3, -1).transpose(0, 2, 1)
        return jnp.concatenate([f_dc, f_rest], axis=1)

    @property
    def get_opacity(self):
        return self.get_attribute("opacity")

    @property
    def get_scaling(self):
        return self.get_attribute("scale")

    @property
    def get_rotation(self):
        return self.get_attribute("rot")

    @property
    def get_xyz(self):
        return self.get_attribute("xyz")

    @property
    def get_num_points(self):
        return self.num_points

    @property
    def get_features_dc(self):
        return self.get_attribute("f_dc").reshape(self.num_points, -1, 3)

    @property
    def get_features_rest(self):
        return self.get_attribute("f_rest").reshape(self.num_points, -1, 3)

    # -- export ---------------------------------------------------------------
    def export(self, path):
        """vanilla_sg.py:144-181: Inria-format ply.

        Note the reference's channel-major flattening: features stored as
        f_dc_{c*K+k} via ``reshape(N,-1,3).transpose(1,2).flatten`` — the
        inverse of the load path's prefix-number sort.
        """
        n = self.num_points
        xyz = np.asarray(self._xyz)
        normals = np.zeros_like(xyz)
        # attributes are stored in the on-disk layout already (f_dc channel
        # triplet, f_rest channel-major flat), so they serialize directly
        f_dc = np.asarray(self._f_dc).reshape(n, -1)
        f_rest = np.asarray(self._f_rest).reshape(n, -1)
        opac = np.asarray(self._opacity).reshape(n, 1)
        scale = np.asarray(self._scale)
        rot = np.asarray(self._rot)

        props = {}
        for i, k in enumerate(["x", "y", "z"]):
            props[k] = xyz[:, i].astype(np.float32)
        for i, k in enumerate(["nx", "ny", "nz"]):
            props[k] = normals[:, i].astype(np.float32)
        for i in range(f_dc.shape[1]):
            props[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
        for i in range(f_rest.shape[1]):
            props[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
        props["opacity"] = opac[:, 0].astype(np.float32)
        for i in range(scale.shape[1]):
            props[f"scale_{i}"] = scale[:, i].astype(np.float32)
        for i in range(rot.shape[1]):
            props[f"rot_{i}"] = rot[:, i].astype(np.float32)
        plyio.write_ply(path, props)
        print(f"Exported {n} points to {path}")
