"""Probe: where the F-matrix RANSAC verification time goes on the chip.

Times the batched verification kernel and its sub-stages (sampling+fit,
fit without the rank-2 eigh projection, scoring) with varied inputs and
SMALL outputs (sums), so tunnel transfer doesn't pollute the numbers.

    python benchmarks/probes/probe_verify.py [batch] [pad] [rounds]
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
    from bundler_sfm_tpu.ops import fmatrix as fm
    from bundler_sfm_tpu.ops import ransac as rs

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    print(f"platform: {jax.devices()[0].platform}  B={B} N={N} R={R}",
          flush=True)

    rng = np.random.default_rng(0)
    x1 = rng.uniform(-400, 400, (B, N, 2)).astype(np.float32)
    x2 = (x1 + rng.normal(0, 2, (B, N, 2))).astype(np.float32)
    nv = np.full(B, N, np.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    thr = jnp.float32(9.0)

    def timed(name, fn, *args, n=6):
        outs = []
        for i in range(n + 1):
            a = [x1 + np.float32(1e-6 * i), x2] + list(args)
            outs.append(fn(*a))
        float(np.asarray(outs[0]))
        t0 = time.perf_counter()
        vals = [float(np.asarray(o)) for o in outs[1:]]
        # re-dispatch timed (previous loop may have overlapped); redo clean:
        t0 = time.perf_counter()
        res = []
        for i in range(1, n + 1):
            a = [x1 + np.float32(2e-6 * i), x2] + list(args)
            res.append(fn(*a))
        vals = [float(np.asarray(o)) for o in res]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:28s} {dt*1e3:9.1f} ms  ({B/dt:8.1f} pairs/s)",
              flush=True)

    @functools.partial(jax.jit, static_argnames=())
    def full(a, b):
        def one(key, p, q, n):
            F, inl, cnt = fm.estimate_fmatrix_ransac(key, p, q, n, thr,
                                                     num_rounds=R)
            return cnt
        return jnp.sum(jax.vmap(one)(keys, a, b, jnp.asarray(nv)))

    @jax.jit
    def fit_only(a, b):
        def one(key, p, q, n):
            samples = rs.sample_indices(key, R, 8, n, p.shape[0])
            s1 = p[samples]
            s2 = q[samples]
            models = jax.vmap(lambda u, v: fm.fit_fmatrix_linear(
                v, u, jnp.ones(8, bool), False))(s1, s2)
            return jnp.sum(models)
        return jnp.sum(jax.vmap(one)(keys, a, b, jnp.asarray(nv)))

    @jax.jit
    def fit_no_rank2(a, b):
        from bundler_sfm_tpu.ops.linalg_small import cholesky_solve
        from bundler_sfm_tpu.ops.ransac import hartley_normalize

        def fit8(r, l):
            m = jnp.ones(8, bool)
            w = m.astype(r.dtype)
            rn, Tr = hartley_normalize(r, m)
            ln, Tl = hartley_normalize(l, m)
            u, v = ln[:, 0], ln[:, 1]
            up, vp = rn[:, 0], rn[:, 1]
            A = jnp.stack([u * up, v * up, up, u * vp, v * vp, vp, u, v], 1)
            bb = -jnp.ones_like(u)
            Aw = A * w[:, None]
            AtA = Aw.T @ A + 1e-12 * jnp.eye(8, dtype=r.dtype)
            X = cholesky_solve(AtA, Aw.T @ bb)
            Fn = jnp.concatenate([X, jnp.ones(1, r.dtype)]).reshape(3, 3)
            return Tr.T @ Fn @ Tl

        def one(key, p, q, n):
            samples = rs.sample_indices(key, R, 8, n, p.shape[0])
            models = jax.vmap(fit8)(q[samples], p[samples])
            return jnp.sum(models)
        return jnp.sum(jax.vmap(one)(keys, a, b, jnp.asarray(nv)))

    @jax.jit
    def score_only(a, b, F):
        def one(p, q, Fb, n):
            def sc(Fi):
                return fm.fmatrix_residual(Fi, q, p)
            r = jax.vmap(sc)(Fb)
            valid = jnp.arange(p.shape[0]) < n
            ok = jnp.isfinite(r) & (r < thr) & valid[None]
            return jnp.max(jnp.sum(ok, 1))
        return jnp.sum(jax.vmap(one)(a, b, F, jnp.asarray(nv)))

    @jax.jit
    def sample_ata_only(a, b):
        from bundler_sfm_tpu.ops.ransac import hartley_normalize

        def ata8(r, l):
            m = jnp.ones(8, bool)
            rn, Tr = hartley_normalize(r, m)
            ln, Tl = hartley_normalize(l, m)
            u, v = ln[:, 0], ln[:, 1]
            up, vp = rn[:, 0], rn[:, 1]
            A = jnp.stack([u * up, v * up, up, u * vp, v * vp, vp, u, v], 1)
            return jnp.sum(A.T @ A)

        def one(key, p, q, n):
            samples = rs.sample_indices(key, R, 8, n, p.shape[0])
            return jnp.sum(jax.vmap(ata8)(q[samples], p[samples]))
        return jnp.sum(jax.vmap(one)(keys, a, b, jnp.asarray(nv)))

    @jax.jit
    def sample_only(a, b):
        def one(key, p, q, n):
            samples = rs.sample_indices(key, R, 8, n, p.shape[0])
            return jnp.sum(q[samples]) + jnp.sum(p[samples])
        return jnp.sum(jax.vmap(one)(keys, a, b, jnp.asarray(nv)))

    Fr = rng.normal(size=(B, R, 3, 3)).astype(np.float32)
    timed("full estimate (fit+score)", full)
    timed("sampling+fit (with rank2)", fit_only)
    timed("sampling+fit (no rank2)", fit_no_rank2)
    timed("sample+normalize+AtA only", sample_ata_only)
    timed("sample gather only", sample_only)
    timed("score only", score_only, jnp.asarray(Fr))


if __name__ == "__main__":
    main()
