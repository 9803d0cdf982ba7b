"""Probe v4: cumulative ablation of the damped LM step inside ONE jit.

Run: python tests/probe_ba_ablate.py [C P V]
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
from probe_ba_micro2 import timeit


def main():
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops import ba

    C, P, Vv = (int(a) for a in (sys.argv[1:4] or (16, 8192, 8)))
    R0, cam0, pts0, oc, op, oxy = synthetic(C, P, Vv)
    prob = ba.build_problem(R0, cam0, pts0, oc, op, oxy,
                            est_focal=True, est_distortion=True,
                            dtype=np.float32)
    print("platform:", jax.devices()[0].platform, " C,P,O =", C, P, len(oc),
          flush=True)

    eyec = jnp.eye(ba.CNP, dtype=prob.cam0.dtype)
    eyep = jnp.eye(ba.PNP, dtype=prob.cam0.dtype)
    mu = jnp.asarray(1e-3, prob.cam0.dtype)

    def upto(stage):
        def fn(cam, pts, mu):
            U, V, W, g_c, g_p, cost = ba.build_normal_blocks(cam, pts, prob,
                                                             False)
            if stage == 0:
                return (U, V, W, g_c, g_p)
            frozen = 1.0 - prob.cam_mask
            U_aug = U + jax.vmap(jnp.diag)(frozen) + mu * eyec[None]
            V_aug = V + (mu + 1e-12) * eyep[None]
            Vinv = ba._inv3(V_aug)
            Y = jnp.einsum("oij,ojk->oik", W, Vinv[prob.obs_pt])
            if stage == 1:
                return (U_aug, Vinv, Y)
            S, rhs = ba.assemble_schur(U_aug, Y, W, g_c, g_p, prob)
            if stage == 2:
                return (S, rhs)
            dcam = ba.solve_schur(S, rhs) * prob.cam_mask
            if stage == 3:
                return (dcam,)
            dpts = ba.back_substitute(Vinv, W, g_p, dcam, prob)
            return (dcam, dpts)
        return jax.jit(lambda cam, pts, mu: sum(jnp.sum(x) for x in
                                                fn(cam, pts, mu)))

    names = ["blocks", "+prep/Y", "+assemble", "+solve", "+backsub"]
    prev = 0.0
    for s, name in enumerate(names):
        f = upto(s)
        f(prob.cam0, prob.pts0, mu)
        dt = timeit(f, prob.cam0, prob.pts0, mu) * 1e3
        print(f"{name:12s} {dt:8.2f} ms   (delta {dt-prev:+8.2f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
