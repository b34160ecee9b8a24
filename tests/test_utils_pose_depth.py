"""Pose/depth utility tests."""

import numpy as np

from gaustudio_tpu.utils import depth as du
from gaustudio_tpu.utils import pose as pu


def test_scale_shift_alignment():
    rng = np.random.default_rng(0)
    target = rng.uniform(1, 5, (32, 32))
    pred = (target - 0.7) / 2.5
    mask = np.ones_like(target)
    s, t = du.compute_scale_and_shift_ls(pred, target, mask)
    np.testing.assert_allclose(pred * s + t, target, atol=1e-6)


def test_depth_colormap():
    d = np.linspace(0, 1, 64).reshape(8, 8)
    c = du.apply_depth_colormap(d)
    assert c.shape == (8, 8, 3)
    assert c.min() >= 0 and c.max() <= 1


def test_quaternion_roundtrip_and_slerp():
    rng = np.random.default_rng(1)
    for _ in range(5):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = pu.quaternion_from_matrix(Q)
        np.testing.assert_allclose(pu.quaternion_matrix(q)[:3, :3], Q, atol=1e-8)
    q0 = pu.quaternion_from_matrix(np.eye(3))
    q1 = pu.quaternion_from_matrix(pu.quaternion_matrix(
        np.array([np.cos(0.5), 0, 0, np.sin(0.5)]))[:3, :3])
    mid = pu.quaternion_slerp(q0, q1, 0.5)
    assert abs(np.linalg.norm(mid) - 1) < 1e-8


def test_interpolated_poses():
    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [2, 0, 0]
    poses = pu.get_interpolated_poses(a, b, steps=4)
    assert len(poses) == 4
    np.testing.assert_allclose(poses[2][:3, 3], [1.0, 0, 0], atol=1e-8)


def test_auto_orient_up():
    rng = np.random.default_rng(2)
    # cameras with up vector tilted consistently
    tilt = pu.quaternion_matrix(np.array([np.cos(0.2), np.sin(0.2), 0, 0]))[:3, :3]
    poses = []
    for i in range(6):
        p = np.eye(4)
        p[:3, :3] = tilt
        p[:3, 3] = rng.normal(size=3)
        poses.append(p)
    oriented, tf = pu.auto_orient_and_center_poses(np.stack(poses), "up", "poses")
    ups = oriented[:, :3, 1]
    mean_up = ups.mean(0)
    mean_up /= np.linalg.norm(mean_up)
    np.testing.assert_allclose(mean_up, [0, 0, 1], atol=1e-6)
    # centered
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-8)


def test_undistort_roundtrip():
    rng = np.random.default_rng(3)
    params = pu.get_distortion_params(k1=0.1, k2=-0.02, p1=0.001, p2=-0.002)
    k1, k2, k3, k4, p1, p2 = params
    undist = rng.uniform(-0.4, 0.4, (50, 2))
    x, y = undist[:, 0], undist[:, 1]
    r2 = x * x + y * y
    d = 1 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    dist = np.stack([
        d * x + 2 * p1 * x * y + p2 * (r2 + 2 * x * x),
        d * y + 2 * p2 * x * y + p1 * (r2 + 2 * y * y),
    ], -1)
    back = pu.radial_and_tangential_undistort(dist, params, eps=1e-9,
                                              max_iterations=20)
    np.testing.assert_allclose(back, undist, atol=1e-6)
