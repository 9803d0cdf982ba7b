"""Probe: alternative formulations of the slow BA contractions.

Run: python tests/probe_ba_alt.py
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
from probe_ba_micro import timeit


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
    Yb = jnp.asarray(rng.normal(size=(O, 9, 3)).astype(np.float32))
    Vo = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))

    # --- Y = W · Vinv[obs_pt] ---
    ein = jax.jit(lambda W, V: jnp.einsum("oij,ojk->oik", W, Vo))
    ref = ein(Wb, Vo)
    bs = jax.jit(lambda W, V: (W[:, :, :, None] * V[:, None, :, :]).sum(2))
    alt = bs(Wb, Vo)
    print(f"Y einsum:      {timeit(ein, Wb, Vo)*1e3:8.2f} ms", flush=True)
    print(f"Y bcast-sum:   {timeit(bs, Wb, Vo)*1e3:8.2f} ms  "
          f"maxerr {float(jnp.max(jnp.abs(ref-alt))):.2e}", flush=True)

    # --- S_off: dense [P,C] gather + one matmul ---
    # Build inv table host-side: pc_obs[p, j] = obs index of (p, cam j) or O.
    pc = np.full((P, C), O, np.int32)
    pc[op, oc] = np.arange(O, dtype=np.int32)
    pc_obs = jnp.asarray(pc)

    cam_of_slot = np.asarray(prob.obs_cam)[np.asarray(prob.views_obs)]
    maskp = np.asarray(prob.views_mask)

    def s_off_flat(Y, W):
        Yp = Y[prob.views_obs]
        Wp = W[prob.views_obs]
        blocks = jnp.einsum("pmij,pnkj->pmnik", Yp, Wp)
        pair_ok = prob.views_mask[:, :, None] & prob.views_mask[:, None, :]
        blocks = blocks * pair_ok[:, :, :, None, None]
        idx = jnp.asarray(cam_of_slot)[:, :, None] * C + jnp.asarray(cam_of_slot)[:, None, :]
        idx = jnp.where(jnp.asarray(pair_ok), idx, 0)
        S = -ba._segsum_onehot(blocks.reshape(P * M * M, 9, 9),
                               idx.reshape(-1), C * C)
        return S.reshape(C, C, 9, 9)

    def s_off_dense(Y, W):
        Yz = jnp.concatenate([Y, jnp.zeros((1, 9, 3), Y.dtype)], 0)
        Wz = jnp.concatenate([W, jnp.zeros((1, 9, 3), W.dtype)], 0)
        Yt = Yz[pc_obs]                     # [P, C, 9, 3]
        Wt = Wz[pc_obs]
        # one matmul: [C*9, P*3] x [P*3, C*9]
        A = Yt.transpose(1, 2, 0, 3).reshape(C * 9, P * 3)
        B = Wt.transpose(0, 3, 1, 2).reshape(P * 3, C * 9)
        S = -(A @ B).reshape(C, 9, C, 9).transpose(0, 2, 1, 3)
        return S

    f1 = jax.jit(s_off_flat)
    f2 = jax.jit(s_off_dense)
    r1 = f1(Yb, Wb)
    r2 = f2(Yb, Wb)
    print(f"S_off flat:    {timeit(f1, Yb, Wb)*1e3:8.2f} ms", flush=True)
    print(f"S_off dense:   {timeit(f2, Yb, Wb)*1e3:8.2f} ms  "
          f"maxerr {float(jnp.max(jnp.abs(r1-r2))):.2e}", flush=True)


if __name__ == "__main__":
    main()
