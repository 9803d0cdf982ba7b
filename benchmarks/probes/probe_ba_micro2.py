"""Probe v2: per-piece timing with scalar-sum outputs (8-byte transfers) so
the slow tunnel transfer does not pollute the numbers.

Run: python tests/probe_ba_micro2.py
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


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops import ba

    C, P, Vv = 16, 8192, 8
    R0, cam0, pts0, oc, op, oxy = synthetic(C, P, Vv)
    prob = ba.build_problem(R0, cam0, pts0, oc, op, oxy,
                            est_focal=True, est_distortion=True,
                            dtype=np.float32)
    O = len(oc)
    M = prob.views_obs.shape[1]
    print("platform:", jax.devices()[0].platform, " C,P,O,M =", C, P, O, M,
          flush=True)

    rng = np.random.default_rng(0)
    Wb = jnp.asarray(rng.normal(size=(O, 9, 3)).astype(np.float32))
    Vo = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))
    Vb = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32))

    hp = jax.lax.Precision.HIGHEST

    noop = jax.jit(lambda x: jnp.sum(x[0, 0]))
    noop(Wb)
    print(f"dispatch floor:         {timeit(noop, Wb)*1e3:8.2f} ms", flush=True)

    ein = jax.jit(lambda W, V: jnp.sum(jnp.einsum("oij,ojk->oik", W, V)))
    ein(Wb, Vo)
    print(f"Y einsum (bf16 mxu):    {timeit(ein, Wb, Vo)*1e3:8.2f} ms", flush=True)

    einh = jax.jit(lambda W, V: jnp.sum(
        jnp.einsum("oij,ojk->oik", W, V, precision=hp)))
    einh(Wb, Vo)
    print(f"Y einsum (f32 highest): {timeit(einh, Wb, Vo)*1e3:8.2f} ms", flush=True)

    bs = jax.jit(lambda W, V: jnp.sum(
        (W[:, :, :, None] * V[:, None, :, :]).sum(2)))
    bs(Wb, Vo)
    print(f"Y bcast-sum:            {timeit(bs, Wb, Vo)*1e3:8.2f} ms", flush=True)

    gat = jax.jit(lambda V: jnp.sum(V[prob.obs_pt]))
    gat(Vb)
    print(f"gather [P->O]:          {timeit(gat, Vb)*1e3:8.2f} ms", flush=True)

    # Jacobian vmap
    from bundler_sfm_tpu.ops.projection import project_one

    def one(ci, pi, xy, valid):
        def f(c, p):
            return project_one(c, prob.R0[ci], p)
        r = f(prob.cam0[ci], prob.pts0[pi]) - xy
        A, B = jax.jacfwd(f, argnums=(0, 1))(prob.cam0[ci], prob.pts0[pi])
        m = jnp.where(valid, 1.0, 0.0)
        return r * m, A * m, B * m

    jac = jax.jit(lambda: sum(jnp.sum(x) for x in jax.vmap(one)(
        prob.obs_cam, prob.obs_pt, prob.obs_xy, prob.obs_valid)))
    jac()
    print(f"jacobian vmap:          {timeit(jac)*1e3:8.2f} ms", flush=True)

    # blocks einsum variants
    Yp = jnp.asarray(rng.normal(size=(P, M, 9, 3)).astype(np.float32))
    Wp = jnp.asarray(rng.normal(size=(P, M, 9, 3)).astype(np.float32))
    blk = jax.jit(lambda Y, W: jnp.sum(jnp.einsum("pmij,pnkj->pmnik", Y, W)))
    blk(Yp, Wp)
    print(f"blocks einsum (bf16):   {timeit(blk, Yp, Wp)*1e3:8.2f} ms", flush=True)

    blkm = jax.jit(lambda Y, W: jnp.sum(jax.lax.dot_general(
        Y.reshape(P, M * 9, 3), W.reshape(P, M * 9, 3),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))))))
    blkm(Yp, Wp)
    print(f"blocks batched-matmul:  {timeit(blkm, Yp, Wp)*1e3:8.2f} ms", flush=True)

    # S_off full: flat segsum vs dense big-matmul
    pc = np.full((P, C), O, np.int32)
    pc[op, oc] = np.arange(O, dtype=np.int32)
    pc_obs = jnp.asarray(pc)
    Yb2 = jnp.asarray(rng.normal(size=(O, 9, 3)).astype(np.float32))

    cam_of_slot = jnp.asarray(np.asarray(prob.obs_cam)[np.asarray(prob.views_obs)])

    def s_off_flat(Y, W):
        Ypp = Y[prob.views_obs]
        Wpp = W[prob.views_obs]
        blocks = jnp.einsum("pmij,pnkj->pmnik", Ypp, Wpp)
        pair_ok = prob.views_mask[:, :, None] & prob.views_mask[:, None, :]
        blocks = blocks * pair_ok[:, :, :, None, None]
        idx = cam_of_slot[:, :, None] * C + cam_of_slot[:, None, :]
        idx = jnp.where(pair_ok, idx, 0)
        S = -ba._segsum_onehot(blocks.reshape(P * M * M, 9, 9),
                               idx.reshape(-1), C * C)
        return jnp.sum(S)

    def s_off_dense(Y, W):
        Yz = jnp.concatenate([Y, jnp.zeros((1, 9, 3), Y.dtype)], 0)
        Wz = jnp.concatenate([W, jnp.zeros((1, 9, 3), W.dtype)], 0)
        A = Yz[pc_obs].transpose(1, 2, 0, 3).reshape(C * 9, P * 3)
        B = Wz[pc_obs].transpose(0, 3, 1, 2).reshape(P * 3, C * 9)
        S = -jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                 precision=hp)
        return jnp.sum(S)

    f1 = jax.jit(s_off_flat)
    f2 = jax.jit(s_off_dense)
    f1(Yb2, Wb)
    f2(Yb2, Wb)
    print(f"S_off flat+segsum:      {timeit(f1, Yb2, Wb)*1e3:8.2f} ms", flush=True)
    print(f"S_off dense matmul f32: {timeit(f2, Yb2, Wb)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
