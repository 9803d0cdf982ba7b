"""Probe v3: one full damped LM step vs the same body iterated on-device.

Run: python tests/probe_ba_loop.py [C P V]
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

    def damped_step(cam, pts, mu):
        U, V, W, g_c, g_p, cost = ba.build_normal_blocks(cam, pts, prob, False)
        frozen = 1.0 - prob.cam_mask
        U_aug = U + jax.vmap(jnp.diag)(frozen) + mu * eyec[None]
        V_aug = V + (mu + 1e-12) * eyep[None]
        Vinv = ba._inv3(V_aug)
        Y = jnp.einsum("oij,ojk->oik", W, Vinv[prob.obs_pt])
        S, rhs = ba.assemble_schur(U_aug, Y, W, g_c, g_p, prob)
        dcam = ba.solve_schur(S, rhs) * prob.cam_mask
        dpts = ba.back_substitute(Vinv, W, g_p, dcam, prob)
        return dcam, dpts, g_c, g_p, cost

    one = jax.jit(lambda cam, pts, mu: sum(
        jnp.sum(x) for x in damped_step(cam, pts, mu)))
    mu = jnp.asarray(1e-3, prob.cam0.dtype)
    one(prob.cam0, prob.pts0, mu)
    print(f"one damped_step:     {timeit(one, prob.cam0, prob.pts0, mu)*1e3:8.2f} ms",
          flush=True)

    def body_fn(i, state):
        cam, pts, mu, cost = state
        dcam, dpts, g_c, g_p, _ = damped_step(cam, pts, mu)
        cam_new = cam + dcam
        pts_new = pts + dpts
        new_cost = ba.compute_cost(cam_new, pts_new, prob)
        accept = new_cost < cost
        cam = jnp.where(accept, cam_new, cam)
        pts = jnp.where(accept, pts_new, pts)
        cost = jnp.where(accept, new_cost, cost)
        mu = jnp.where(accept, mu * 0.5, mu * 4.0)
        return cam, pts, mu, cost

    NIT = 10

    @jax.jit
    def loop(cam, pts, mu):
        cost0 = ba.compute_cost(cam, pts, prob)
        out = jax.lax.fori_loop(0, NIT, body_fn, (cam, pts, mu, cost0))
        return sum(jnp.sum(x) for x in out)

    loop(prob.cam0, prob.pts0, mu)
    dt = timeit(loop, prob.cam0, prob.pts0, mu, n=5)
    print(f"fori x{NIT} body:       {dt/NIT*1e3:8.2f} ms/iter", flush=True)

    @jax.jit
    def loop_w(cam, pts, mu):
        cost0 = ba.compute_cost(cam, pts, prob)

        def cond(state):
            cam, pts, mu, cost, it = state
            return it < NIT

        def body(state):
            cam, pts, mu, cost, it = state
            cam, pts, mu, cost = body_fn(it, (cam, pts, mu, cost))
            return cam, pts, mu, cost, it + 1

        out = jax.lax.while_loop(cond, body,
                                 (cam, pts, mu, cost0, jnp.int32(0)))
        return sum(jnp.sum(x) for x in out[:4])

    loop_w(prob.cam0, prob.pts0, mu)
    dt = timeit(loop_w, prob.cam0, prob.pts0, mu, n=5)
    print(f"while x{NIT} body:      {dt/NIT*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
