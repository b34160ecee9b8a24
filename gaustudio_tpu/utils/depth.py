"""Depth utilities: scale/shift alignment, colormap, mono-depth wrapper.

Port of gaustudio/utils/depth_utils.py (least-squares alignment :5-31,
viridis colormap :33-41, MiDaS DPT estimator :44-73 — gated on torch.hub
availability since it needs network weights).
"""

from __future__ import annotations

import numpy as np


def compute_scale_and_shift_ls(prediction, target, mask):
    """Least-squares (scale, shift) aligning prediction to target under mask;
    depth_utils.py:5-31."""
    prediction = np.asarray(prediction, np.float64)
    target = np.asarray(target, np.float64)
    mask = np.asarray(mask, np.float64)
    sum_axes = (0, 1)
    a_00 = np.sum(mask * prediction * prediction, sum_axes)
    a_01 = np.sum(mask * prediction, sum_axes)
    a_11 = np.sum(mask, sum_axes)
    b_0 = np.sum(mask * prediction * target, sum_axes)
    b_1 = np.sum(mask * target, sum_axes)
    det = a_00 * a_11 - a_01 * a_01
    if det <= 0:
        return 0.0, 0.0
    x_0 = (a_11 * b_0 - a_01 * b_1) / det
    x_1 = (-a_01 * b_0 + a_00 * b_1) / det
    return float(x_0), float(x_1)


def apply_depth_colormap(depth: np.ndarray, near_plane=None, far_plane=None):
    """depth_utils.py:33-41: viridis colormap of a metric depth map."""
    depth = np.asarray(depth)
    near_plane = near_plane if near_plane is not None else float(np.min(depth))
    far_plane = far_plane if far_plane is not None else float(np.max(depth))
    norm = np.clip((depth - near_plane) / (far_plane - near_plane + 1e-10), 0, 1)
    import matplotlib.pyplot as plt

    return plt.cm.viridis(norm)[:, :, :3]


class LeastSquaresDepthEstimator:
    """MiDaS mono-depth + LS alignment to sensor depth
    (depth_utils.py:44-73).  The model downloads via torch.hub; construction
    fails with a clear message in offline environments."""

    def __init__(self):
        try:
            import torch

            self._torch = torch
            self._model = torch.hub.load("intel-isl/MiDaS", "DPT_Large").eval()
            self._transforms = torch.hub.load("intel-isl/MiDaS", "transforms").dpt_transform
        except Exception as e:  # network / torch.hub unavailable
            raise ImportError(
                "LeastSquaresDepthEstimator needs the MiDaS weights via "
                "torch.hub (network access)."
            ) from e

    def predict_depth_single(self, input_image):
        torch = self._torch
        h, w = input_image.shape[:2]
        batch = self._transforms(input_image)
        with torch.no_grad():
            pred = self._model(batch)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=(h, w), mode="bicubic", align_corners=False
            ).squeeze().cpu().numpy()
        return pred

    def forward(self, input_image, target_depth, target_depth_mask):
        pred = self.predict_depth_single(input_image)
        scale, shift = compute_scale_and_shift_ls(pred, target_depth, target_depth_mask)
        return (pred * scale + shift).astype(np.float32)
