"""The Snavely camera model, vectorized.

Semantics from `include/snavely_reprojection_error.h:53-96` and
`lib/sfm-driver/sfm.c:302-380` (`sfm_project_rd` with explicit camera
centers, the configuration the pipeline always uses — `run_sfm` is called
with explicit_camera_centers=1, `src/Bundle.cpp:645-652`):

    p   = R (X - c)                  # c = camera center
    u   = -f * p.xy / p.z            # note the -z viewing axis
    r²  = |u|² / f²                  # == |p.xy/p.z|²
    u  *= 1 + k1 r² + k2 r⁴

Cameras are carried as a flat 9-vector per camera (the LM layout of
`lib/sfm-driver/sfm.c:651-703`):

    cam[0:3] = c     camera center
    cam[3:6] = w     rotation correction (R = exp([w]x) R0)
    cam[6]   = f
    cam[7:9] = k1, k2

with the base rotation R0 [3,3] passed separately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.rotations import mv3, rodrigues, rot_update

NUM_CAMERA_PARAMS = 9


def pack_camera(center, w, f, k):
    return jnp.concatenate([
        jnp.asarray(center).reshape(-1),
        jnp.asarray(w).reshape(-1),
        jnp.asarray(f).reshape(1),
        jnp.asarray(k).reshape(-1),
    ])


def project_one(cam: jnp.ndarray, R0: jnp.ndarray, X: jnp.ndarray,
                apply_distortion: bool = True) -> jnp.ndarray:
    """Project one 3D point through one camera. Fully differentiable."""
    c, w, f, k = cam[0:3], cam[3:6], cam[6], cam[7:9]
    R = rot_update(R0, w)
    p = mv3(R, X - c)
    u = -f * p[0:2] / p[2]
    if apply_distortion:
        rsq = (u[0] * u[0] + u[1] * u[1]) / (f * f)
        factor = 1.0 + k[0] * rsq + k[1] * rsq * rsq
        u = u * factor
    return u


def project_obs(cams: jnp.ndarray, R0s: jnp.ndarray, pts: jnp.ndarray,
                obs_cam: jnp.ndarray, obs_pt: jnp.ndarray,
                apply_distortion: bool = True) -> jnp.ndarray:
    """Project every observation: cams [C,9], R0s [C,3,3], pts [P,3],
    obs_cam/obs_pt [O] -> [O,2]."""
    def f(ci, pi):
        return project_one(cams[ci], R0s[ci], pts[pi], apply_distortion)
    return jax.vmap(f)(obs_cam, obs_pt)


def camera_depths(cams: jnp.ndarray, R0s: jnp.ndarray, pts: jnp.ndarray,
                  obs_cam: jnp.ndarray, obs_pt: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate in camera frame per observation (negative = in front;
    cheirality check per `src/Bundle.cpp:177-191`)."""
    def f(ci, pi):
        cam = cams[ci]
        R = rot_update(R0s[ci], cam[3:6])
        return mv3(R, pts[pi] - cam[0:3])[2]
    return jax.vmap(f)(obs_cam, obs_pt)


def check_cheirality(point: jnp.ndarray, R: jnp.ndarray, center: jnp.ndarray):
    """True if point is in front of the camera (z<0 in cam frame)."""
    return mv3(R, point - center)[2] < 0.0


def ray_directions(xy: jnp.ndarray, f, R: jnp.ndarray) -> jnp.ndarray:
    """World-space viewing ray for centered pixel coords xy [..., 2].

    Mirrors `ComputeRayAngle` (`src/Bundle.cpp:102-152`): normalized coords
    (x/f, y/f, -1) rotated into the world by Rᵀ.
    """
    v = jnp.stack([xy[..., 0] / f, xy[..., 1] / f,
                   -jnp.ones_like(xy[..., 0])], axis=-1)
    return (v[..., :, None] * R).sum(-2)  # exact Rᵀ v, batched


def ray_angle(xy1, f1, R1, xy2, f2, R2) -> jnp.ndarray:
    """Angle (radians) between the viewing rays of a correspondence."""
    r1 = ray_directions(xy1, f1, R1)
    r2 = ray_directions(xy2, f2, R2)
    dot = jnp.sum(r1 * r2, axis=-1)
    mag = jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1)
    return jnp.arccos(jnp.clip(dot / mag, -1.0 + 1e-8, 1.0 - 1e-8))


def undistort_normalized(u: jnp.ndarray, k_inv: jnp.ndarray) -> jnp.ndarray:
    """Apply the 6-term inverse-distortion polynomial to normalized points.

    `UndistortNormalizedPoint` (`src/Distortion.cpp:90-…`,
    POLY_INVERSE_DEGREE=6 per `lib/sfm-driver/sfm.h:30`):
      r = |u|;  r_new = sum_i k_inv[i] * r^i;  u *= r_new / r.
    """
    r = jnp.sqrt(jnp.sum(u * u, axis=-1) + 1e-300)
    powers = jnp.stack([r**i for i in range(6)], axis=-1)
    r_new = jnp.sum(powers * k_inv, axis=-1)
    return u * (r_new / r)[..., None]


def invert_distortion(k1, k2, f, width, height, degree: int = 6,
                      num_samples: int = 20) -> jnp.ndarray:
    """Fit the inverse radial-distortion polynomial.

    Mirrors `InvertDistortion` (`src/Distortion.cpp:29-87`): sample the
    forward polynomial r_d = r (1 + k1 r² + k2 r⁴) at `num_samples` radii in
    [0, max_radius] and least-squares fit r = Σ a_i r_d^i.
    max_radius = sqrt((W/2)² + (H/2)²) / f  (src/Bundle.cpp:684-688).
    """
    max_radius = jnp.sqrt((0.5 * width) ** 2 + (0.5 * height) ** 2) / f
    r = jnp.linspace(0.0, max_radius, num_samples)
    rd = r * (1.0 + k1 * r**2 + k2 * r**4)
    A = jnp.stack([rd**i for i in range(degree)], axis=-1)
    coeffs, *_ = jnp.linalg.lstsq(A, r)
    return coeffs
