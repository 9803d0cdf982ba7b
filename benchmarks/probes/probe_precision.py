"""Probe: is a 0/1 one-hot selection matmul EXACT on TPU under
Precision.HIGH (bf16x3), and how much cheaper is it than HIGHEST?

A f32 value splits exactly into 3 bf16 terms (24 mantissa bits = 3x8), and
the one-hot operand is exact in bf16, so each output sums exactly one
exactly-represented value per pass with f32 accumulation.  If that holds
empirically, every selection-type one-hot contraction in ops/ba.py
(_expand_cams, _segsum_onehot, dense_tables) can run at HIGH (3 passes)
instead of HIGHEST (6).

    python benchmarks/probes/probe_precision.py
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
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    O, C, K = 524288, 64, 45
    seg = rng.integers(0, C, O).astype(np.int32)
    data = (rng.normal(size=(C, K)) * np.exp(
        rng.uniform(-20, 20, (C, K)))).astype(np.float32)
    iota = np.arange(C, dtype=np.int32)
    dn = (((1,), (0,)), ((), ()))

    def expand(prec):
        @jax.jit
        def f(segv, dat):
            oh = (segv[:, None] == iota[None, :]).astype(jnp.float32)
            return jax.lax.dot_general(oh, dat, dn, precision=prec)
        return f

    ref = data[seg]                                  # exact host gather
    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        f = expand(prec)
        out = np.asarray(f(jnp.asarray(seg), jnp.asarray(data)))
        exact = np.array_equal(out, ref)
        maxrel = np.max(np.abs(out - ref) /
                        np.maximum(np.abs(ref), 1e-30))

        @jax.jit
        def fsum(segv, dat):
            oh = (segv[:, None] == iota[None, :]).astype(jnp.float32)
            return jnp.sum(jax.lax.dot_general(oh, dat, dn, precision=prec))

        n = 8
        variants = [jnp.asarray(data + np.float32(i * 1e-6))
                    for i in range(n)]
        sv = jnp.asarray(seg)
        float(np.asarray(fsum(sv, variants[0])))
        t0 = time.perf_counter()
        outs = [fsum(sv, v) for v in variants]
        for o in outs:
            float(np.asarray(o))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:8s} exact={exact}  maxrel={maxrel:.2e}  "
              f"{dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
