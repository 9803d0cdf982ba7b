"""Profile camera_refine_trim_batch (RefineCameraParameters analogue,
src/Bundle.cpp:2535-2694) at the from-pixels production shape: the round-4
stage map put refine at 20.2 s of the 32.5 s register stage (64-image race)
with no kernel-level attention.

Hypothesis: the inner LM's convergence thresholds (gnorm<1e-12,
|delta|<1e-14) are unreachable in f32, so every trim round burns all
`max_iters` latency-bound while-loop iterations.

Usage: python benchmarks/probes/probe_refine.py [B] [N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import bundler_sfm_tpu  # noqa: F401  (x64 + cache config)
import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.lm import camera_refine_trim_batch
from bundler_sfm_tpu.ops.projection import project_one


def make_batch(rng, B, N, dtype=np.float32, noise=0.6, bad_frac=0.12):
    cam = np.zeros((B, 9), dtype)
    R = np.zeros((B, 3, 3), dtype)
    X = rng.normal(0, 2.0, (B, N, 3)).astype(dtype)
    xy = np.zeros((B, N, 2), dtype)
    for b in range(B):
        c = np.array([rng.normal(0, 0.5), rng.normal(0, 0.5), -8.0])
        cam[b, 0:3] = c + rng.normal(0, 0.05, 3)
        cam[b, 6] = 700.0 * (1 + rng.normal(0, 0.03))
        R[b] = np.eye(3)
        # Numpy projection (R = I, true cam at c, f = 700, no distortion):
        # p = X - c, image = -f * p.xy / p.z  (ops/projection.py convention).
        p = X[b] - c[None, :]
        xy[b] = -700.0 * p[:, 0:2] / p[:, 2:3]
        xy[b] += rng.normal(0, noise, (N, 2))
        bad = rng.random(N) < bad_frac
        xy[b, bad] += rng.uniform(30, 90, (bad.sum(), 2))
    mask = np.ones((B, N), bool)
    return cam, R, X, xy, mask


def run(B=8, N=2048, iters=3):
    rng = np.random.default_rng(0)
    cam, R, X, xy, mask = make_batch(rng, B, N)
    fcs = np.full(B, 700.0, np.float32)
    fws = np.zeros(B, np.float32)
    args = (jnp.asarray(cam), jnp.asarray(R), jnp.asarray(X),
            jnp.asarray(xy), jnp.asarray(mask), True, False,
            jnp.asarray(fcs), jnp.asarray(fws), 1e2, 50, 1e-3,
            2.0, 8.0, 16.0)
    out = camera_refine_trim_batch(*args)
    np.asarray(out[0])
    best = 1e9
    for k in range(iters):
        cam2 = cam.copy()
        cam2[:, 0] += 1e-5 * (k + 1)
        a2 = (jnp.asarray(cam2),) + args[1:]
        t0 = time.perf_counter()
        out = camera_refine_trim_batch(*a2)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    camf, Rf, maskf = (np.asarray(o) for o in out)
    # Quality: mean inlier reprojection error.
    pred = jax.vmap(jax.vmap(project_one, in_axes=(None, None, 0)))(
        jnp.asarray(camf), jnp.asarray(Rf), jnp.asarray(X))
    err = np.linalg.norm(np.asarray(pred) - xy, axis=2)
    me = float(np.mean(err[maskf])) if maskf.any() else float("nan")
    print(f"B={B} N={N}: {best*1e3:.1f} ms/dispatch, inliers "
          f"{maskf.mean():.2f}, mean inlier err {me:.3f} px, "
          f"focal[0] {camf[0, 6]:.1f}")
    return best


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    run(B, N)
