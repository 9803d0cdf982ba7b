"""Probe: where the resection (DLT RANSAC) and homography RANSAC time goes.

At 256 images the register stage's chunked resection (32.5 s) and the
verify stage's homography RANSAC (22.8 s) dominate the bundle stage while
BA itself is 14.6 s (BASELINE.md round-3 telemetry) — this probe splits
each kernel into sampling/fit/score to aim the optimization.

    python benchmarks/probes/probe_register.py [B] [N] [R]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from bundler_sfm_tpu.ops import resection as rsx
    from bundler_sfm_tpu.ops import homography as hg
    from bundler_sfm_tpu.ops import ransac as rs

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    print(f"platform: {jax.devices()[0].platform}  B={B} N={N} R={R}",
          flush=True)

    rng = np.random.default_rng(0)
    # Geometrically plausible resection data: points in a box, camera back.
    X = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    Xc = X + np.array([0, 0, 5], np.float32)
    x = (-700 * Xc[..., :2] / Xc[..., 2:3]
         + rng.normal(0, 1, (B, N, 2))).astype(np.float32)
    nv = np.full(B, N, np.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    thr = jnp.float32(4.0)

    def timed(name, fn, *args, n=4):
        fn(x1v(0), *args).block_until_ready()
        t0 = time.perf_counter()
        res = [fn(x1v(i + 1), *args) for i in range(n)]
        vals = [float(np.asarray(o)) for o in res]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:30s} {dt*1e3:9.1f} ms  ({B/dt:8.1f} lanes/s)",
              flush=True)

    def x1v(i):
        return jnp.asarray(X + np.float32(1e-6 * i))

    @jax.jit
    def full_resect(Xa):
        def one(key, Xi, xi, n):
            ver = rsx.find_and_verify_camera(key, Xi, xi, n, thr,
                                             16.0 * thr, num_rounds=R)
            return jnp.sum(ver.inliers)
        return jnp.sum(jax.vmap(one)(keys, Xa, jnp.asarray(x),
                                     jnp.asarray(nv)))

    @jax.jit
    def ransac_only(Xa):
        def one(key, Xi, xi, n):
            P, inl, cnt = rsx.find_projection_ransac(key, Xi, xi, n, thr,
                                                     num_rounds=R)
            return cnt
        return jnp.sum(jax.vmap(one)(keys, Xa, jnp.asarray(x),
                                     jnp.asarray(nv)))

    @jax.jit
    def fit_only(Xa):
        def one(key, Xi, xi, n):
            samples = rs.sample_indices(key, R, 6, n, Xi.shape[0])
            sX = Xi[samples]
            sx = xi[samples]
            models = jax.vmap(lambda a, b: rsx.fit_projection_dlt(
                a, b, jnp.ones(6, bool)))(sX, sx)
            return jnp.sum(models)
        return jnp.sum(jax.vmap(one)(keys, Xa, jnp.asarray(x),
                                     jnp.asarray(nv)))

    @jax.jit
    def score_only(Xa, Ps):
        def one(Xi, xi, Pb, n):
            r = jax.vmap(lambda P: rsx.projection_residual_cheirality(
                P, Xi, xi))(Pb)
            valid = jnp.arange(Xi.shape[0]) < n
            ok = jnp.isfinite(r) & (r < thr) & valid[None]
            return jnp.max(jnp.sum(ok, 1))
        return jnp.sum(jax.vmap(one)(Xa, jnp.asarray(x), Ps,
                                     jnp.asarray(nv)))

    Pr = rng.normal(size=(B, R, 3, 4)).astype(np.float32)
    timed("resect full (ransac+rq)", full_resect)
    timed("resect ransac only", ransac_only)
    timed("resect sample+fit (eigh12)", fit_only)
    timed("resect score only", score_only, jnp.asarray(Pr))

    # Homography side: same N, 256 rounds.
    RH = 256
    p1 = rng.uniform(-400, 400, (B, N, 2)).astype(np.float32)
    p2 = (p1 * 0.9 + 5 + rng.normal(0, 2, (B, N, 2))).astype(np.float32)

    def p1v(i):
        return jnp.asarray(p1 + np.float32(1e-6 * i))

    @jax.jit
    def full_h(p1a):
        def one(key, a, b, n):
            H, inl, cnt = hg.estimate_homography_ransac(key, a, b, n,
                                                        jnp.float32(6.0),
                                                        num_rounds=RH)
            return cnt
        return jnp.sum(jax.vmap(one)(keys, p1a, jnp.asarray(p2),
                                     jnp.asarray(nv)))

    @jax.jit
    def h_fit_only(p1a):
        def one(key, a, b, n):
            samples = rs.sample_indices(key, RH, 4, n, a.shape[0])
            models = jax.vmap(lambda u, v: hg.fit_homography_dlt(
                u, v, jnp.ones(4, bool)))(a[samples], b[samples])
            return jnp.sum(models)
        return jnp.sum(jax.vmap(one)(keys, p1a, jnp.asarray(p2),
                                     jnp.asarray(nv)))

    @jax.jit
    def h_score_only(p1a, Hs):
        def one(a, b, Hb, n):
            r = jax.vmap(lambda H: hg.homography_transfer_dist(H, a, b))(Hb)
            valid = jnp.arange(a.shape[0]) < n
            ok = jnp.isfinite(r) & (r < jnp.float32(6.0)) & valid[None]
            return jnp.max(jnp.sum(ok, 1))
        return jnp.sum(jax.vmap(one)(a := p1a, jnp.asarray(p2), Hs,
                                     jnp.asarray(nv)))

    Hr = rng.normal(size=(B, RH, 3, 3)).astype(np.float32)

    def timed_h(name, fn, *args, n=4):
        fn(p1v(0), *args).block_until_ready()
        t0 = time.perf_counter()
        res = [fn(p1v(i + 1), *args) for i in range(n)]
        vals = [float(np.asarray(o)) for o in res]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:30s} {dt*1e3:9.1f} ms  ({B/dt:8.1f} lanes/s)",
              flush=True)

    timed_h("homography full", full_h)
    timed_h("homography sample+fit", h_fit_only)
    timed_h("homography score only", h_score_only, jnp.asarray(Hr))


if __name__ == "__main__":
    main()
