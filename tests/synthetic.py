"""Synthetic scene generators shared across tests: ground-truth cameras with
the Snavely convention (R world->cam, camera center c, -z viewing axis)."""

import numpy as np


def random_rotation(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    n = w / theta
    K = np.array([[0, -n[2], n[1]], [n[2], 0, -n[0]], [-n[1], n[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def project(R, c, f, k1, k2, X):
    """Snavely projection of [N,3] points -> [N,2] centered pixels."""
    p = (X - c) @ R.T
    u = -f * p[:, 0:2] / p[:, 2:3]
    r2 = np.sum(u * u, axis=1, keepdims=True) / (f * f)
    return u * (1.0 + k1 * r2 + k2 * r2 * r2)


def look_at_rotation(center, target, up=(0, 1, 0)):
    """R (world->cam) for a camera at `center` looking at `target` down -z."""
    fwd = np.asarray(target, float) - np.asarray(center, float)
    fwd = fwd / np.linalg.norm(fwd)
    z = -fwd  # camera z axis points AWAY from the scene
    up = np.asarray(up, float)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])  # rows = camera axes


class Scene:
    def __init__(self, rng, num_cams=4, num_pts=200, f=700.0,
                 k1=0.0, k2=0.0, noise=0.0, radius=6.0, spread=2.0):
        self.f = np.full(num_cams, f, dtype=float)
        self.k = np.zeros((num_cams, 2))
        self.k[:, 0] = k1
        self.k[:, 1] = k2
        self.points = rng.uniform(-spread, spread, (num_pts, 3))
        self.centers = np.zeros((num_cams, 3))
        self.R = np.zeros((num_cams, 3, 3))
        for i in range(num_cams):
            ang = 2 * np.pi * i / max(num_cams, 8) + rng.normal() * 0.05
            self.centers[i] = [radius * np.sin(ang),
                               rng.normal() * 0.5,
                               radius * np.cos(ang)]
            self.R[i] = look_at_rotation(self.centers[i], np.zeros(3))
        self.obs = []  # per camera [N,2]
        for i in range(num_cams):
            xy = project(self.R[i], self.centers[i], self.f[i],
                         self.k[i, 0], self.k[i, 1], self.points)
            if noise > 0:
                xy = xy + rng.normal(size=xy.shape) * noise
            self.obs.append(xy)

    def w2c_t(self, i):
        return -self.R[i] @ self.centers[i]
