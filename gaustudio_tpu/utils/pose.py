"""Pose utilities: quaternion conversions, slerp, pose interpolation.

Port of gaustudio/utils/pose_utils.py:51-281 (quaternion_from_matrix,
quaternion_matrix, quaternion_slerp, get_interpolated_poses) in plain numpy.
"""

from __future__ import annotations

import numpy as np


def quaternion_from_matrix(matrix) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z); pose_utils.py:51-90."""
    M = np.asarray(matrix, dtype=np.float64)[:3, :3]
    K = (
        np.array(
            [
                [M[0, 0] - M[1, 1] - M[2, 2], 0, 0, 0],
                [M[0, 1] + M[1, 0], M[1, 1] - M[0, 0] - M[2, 2], 0, 0],
                [M[0, 2] + M[2, 0], M[1, 2] + M[2, 1], M[2, 2] - M[0, 0] - M[1, 1], 0],
                [M[2, 1] - M[1, 2], M[0, 2] - M[2, 0], M[1, 0] - M[0, 1],
                 M[0, 0] + M[1, 1] + M[2, 2]],
            ]
        )
        / 3.0
    )
    w, V = np.linalg.eigh(K)
    q = V[[3, 0, 1, 2], np.argmax(w)]
    if q[0] < 0.0:
        q = -q
    return q


def quaternion_matrix(quaternion) -> np.ndarray:
    """Quaternion (w, x, y, z) -> homogeneous rotation matrix;
    pose_utils.py:93-121."""
    q = np.asarray(quaternion, dtype=np.float64)
    n = np.dot(q, q)
    if n < np.finfo(float).eps * 4.0:
        return np.eye(4)
    q = q * np.sqrt(2.0 / n)
    q = np.outer(q, q)
    return np.array(
        [
            [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0], 0.0],
            [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0], 0.0],
            [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2], 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def quaternion_slerp(quat0, quat1, fraction: float, spin: int = 0,
                     shortestpath: bool = True) -> np.ndarray:
    """Spherical linear interpolation; pose_utils.py:124-163."""
    q0 = np.asarray(quat0, np.float64).copy()
    q1 = np.asarray(quat1, np.float64).copy()
    q0 /= np.linalg.norm(q0)
    q1 /= np.linalg.norm(q1)
    if fraction == 0.0:
        return q0
    if fraction == 1.0:
        return q1
    d = np.dot(q0, q1)
    if abs(abs(d) - 1.0) < np.finfo(float).eps * 4.0:
        return q0
    if shortestpath and d < 0.0:
        d = -d
        q1 = -q1
    angle = np.arccos(np.clip(d, -1, 1)) + spin * np.pi
    if abs(angle) < np.finfo(float).eps * 4.0:
        return q0
    isin = 1.0 / np.sin(angle)
    q0 *= np.sin((1.0 - fraction) * angle) * isin
    q1 *= np.sin(fraction * angle) * isin
    return q0 + q1


def get_interpolated_poses(pose_a, pose_b, steps: int = 10):
    """Interpolate between two 4x4 poses (slerp rotation + lerp translation);
    pose_utils.py:164-190."""
    pose_a = np.asarray(pose_a, np.float64)
    pose_b = np.asarray(pose_b, np.float64)
    quat_a = quaternion_from_matrix(pose_a[:3, :3])
    quat_b = quaternion_from_matrix(pose_b[:3, :3])
    poses = []
    for t in np.linspace(0, 1, steps, endpoint=False):
        q = quaternion_slerp(quat_a, quat_b, float(t))
        pose = quaternion_matrix(q)
        pose[:3, 3] = (1.0 - t) * pose_a[:3, 3] + t * pose_b[:3, 3]
        poses.append(pose)
    return poses


def get_interpolated_poses_many(poses, steps_per_transition: int = 10):
    """pose_utils.py:193-281 (uniform variant): chain interpolation."""
    out = []
    for i in range(len(poses) - 1):
        out.extend(get_interpolated_poses(poses[i], poses[i + 1], steps_per_transition))
    out.append(np.asarray(poses[-1], np.float64))
    return out
