"""Probe: micro-bisect the slow BA pieces on the real chip.

Run: python tests/probe_ba_micro.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__)))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

from probe_ba_scaling import synthetic


def timeit(fn, *args, n=10):
    import jax
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops import ba

    C, P, V = 16, 8192, 8
    R0, cam0, pts0, oc, op, oxy = synthetic(C, P, V)
    prob = ba.build_problem(R0, cam0, pts0, oc, op, oxy,
                            est_focal=True, est_distortion=True,
                            dtype=np.float32)
    O = len(oc)
    print("platform:", jax.devices()[0].platform, " C,P,O =", C, P, O,
          flush=True)

    rng = np.random.default_rng(0)
    Vb = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32))
    Wb = jnp.asarray(rng.normal(size=(O, 9, 3)).astype(np.float32))
    obs_pt = prob.obs_pt
    obs_cam = prob.obs_cam

    inv3 = jax.jit(ba._inv3)
    inv3(Vb)
    print(f"_inv3 [P,3,3]:           {timeit(inv3, Vb)*1e3:8.2f} ms", flush=True)

    gather = jax.jit(lambda V: V[obs_pt])
    gather(Vb)
    print(f"gather Vinv[obs_pt]:     {timeit(gather, Vb)*1e3:8.2f} ms", flush=True)

    ein = jax.jit(lambda W, Vo: jnp.einsum("oij,ojk->oik", W, Vo))
    Vo = gather(Vb)
    ein(Wb, Vo)
    print(f"einsum W·Vo [O,9,3]:     {timeit(ein, Wb, Vo)*1e3:8.2f} ms", flush=True)

    # one-hot segsum U: [O] -> [C] over [O,81]
    data81 = jnp.asarray(rng.normal(size=(O, 9, 9)).astype(np.float32))
    segU = jax.jit(lambda d: ba._segsum_onehot(d, obs_cam, C))
    segU(data81)
    print(f"segsum_onehot U [O->C]:  {timeit(segU, data81)*1e3:8.2f} ms", flush=True)

    # point_sum via views table
    ps = jax.jit(lambda d: ba._point_sum(d, prob))
    d33 = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))
    ps(d33)
    print(f"point_sum V [O->P]:      {timeit(ps, d33)*1e3:8.2f} ms", flush=True)

    # the jacobian vmap alone
    def one(ci, pi, xy, valid):
        from bundler_sfm_tpu.ops.projection import project_one
        def f(c, p):
            return project_one(c, prob.R0[ci], p)
        cam = prob.cam0
        pts = prob.pts0
        r = f(cam[ci], pts[pi]) - xy
        A, B = jax.jacfwd(f, argnums=(0, 1))(cam[ci], pts[pi])
        m = jnp.where(valid, 1.0, 0.0)
        return r * m, A * m, B * m

    jac = jax.jit(lambda: jax.vmap(one)(prob.obs_cam, prob.obs_pt,
                                        prob.obs_xy, prob.obs_valid))
    jac()
    print(f"jacobian vmap [O]:       {timeit(jac)*1e3:8.2f} ms", flush=True)

    # schur flat blocks einsum [P,M,M,9,9]
    M = prob.views_obs.shape[1]
    Yp = jnp.asarray(rng.normal(size=(P, M, 9, 3)).astype(np.float32))
    Wp = jnp.asarray(rng.normal(size=(P, M, 9, 3)).astype(np.float32))
    blk = jax.jit(lambda Y, W: jnp.einsum("pmij,pnkj->pmnik", Y, W))
    blk(Yp, Wp)
    print(f"schur blocks einsum:     {timeit(blk, Yp, Wp)*1e3:8.2f} ms", flush=True)

    # big onehot segsum for S_off: [P*M*M] -> C*C over 81
    N = P * M * M
    idx = jnp.asarray(rng.integers(0, C * C, N).astype(np.int32))
    dataS = jnp.asarray(rng.normal(size=(N, 9, 9)).astype(np.float32))
    segS = jax.jit(lambda d: ba._segsum_onehot(d, idx, C * C))
    segS(dataS)
    print(f"segsum_onehot S [{N}->{C*C}]: {timeit(segS, dataS)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
