"""Probe: per-piece timing of one damped LM step on the real chip.

Run: python tests/probe_ba_pieces.py [C P V]
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
    """Time n calls with PERTURBED float inputs each call — the axon client
    memoizes identical (executable, inputs) pairs, so timing identical calls
    measures nothing through the tunnel."""
    import jax
    import jax.numpy as jnp

    def perturbed(i):
        eps = np.float32(1e-9) * (i + 1)
        return [jnp.asarray(a) + eps if (hasattr(a, "dtype")
                                         and jnp.issubdtype(a.dtype,
                                                            jnp.floating))
                else a for a in args]

    # Device-side perturbation (jnp add on device arrays): variants stay
    # resident, no host re-upload in the timed loop.
    variants = [perturbed(i) for i in range(n)]
    for v in variants:
        for a in v:
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()
    out = fn(*variants[0])
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    t0 = time.perf_counter()
    outs = [fn(*v) for v in variants]
    for o in outs:
        for leaf in jax.tree_util.tree_leaves(o):
            np.asarray(leaf)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops import ba

    C, P, V = (int(a) for a in (sys.argv[1:4] or (16, 8192, 8)))
    R0, cam0, pts0, oc, op, oxy = synthetic(C, P, V)
    prob = ba.build_problem(R0, cam0, pts0, oc, op, oxy,
                            est_focal=True, est_distortion=True,
                            dtype=np.float32)
    print("platform:", jax.devices()[0].platform, " C,P,O =", C, P, len(oc),
          flush=True)

    cam, pts = prob.cam0, prob.pts0
    mu = jnp.asarray(1e-3, cam.dtype)

    blocks = jax.jit(lambda c, p: ba.build_normal_blocks(c, p, prob, False))
    U, V_, W, g_c, g_p, cost = blocks(cam, pts)
    print(f"build_normal_blocks: {timeit(blocks, cam, pts)*1e3:8.2f} ms",
          flush=True)

    eyec = jnp.eye(ba.CNP, dtype=cam.dtype)
    eyep = jnp.eye(ba.PNP, dtype=cam.dtype)

    @jax.jit
    def prep(U, V_, W, mu):
        U_aug = U + mu * eyec[None]
        V_aug = V_ + (mu + 1e-12) * eyep[None]
        Vinv = ba._inv3(V_aug)
        Y = jnp.einsum("oij,ojk->oik", W, Vinv[prob.obs_pt])
        return U_aug, Vinv, Y

    U_aug, Vinv, Y = prep(U, V_, W, mu)
    print(f"prep (Vinv+Y):       {timeit(prep, U, V_, W, mu)*1e3:8.2f} ms",
          flush=True)

    asm = jax.jit(lambda U_aug, Y, W, g_c, g_p:
                  ba.assemble_schur(U_aug, Y, W, g_c, g_p, prob))
    S, rhs = asm(U_aug, Y, W, g_c, g_p)
    print(f"assemble_schur:      {timeit(asm, U_aug, Y, W, g_c, g_p)*1e3:8.2f} ms",
          flush=True)

    solve = jax.jit(ba.solve_schur)
    dcam = solve(S, rhs)
    print(f"solve_schur:         {timeit(solve, S, rhs)*1e3:8.2f} ms",
          flush=True)

    back = jax.jit(lambda Vinv, W, g_p, dcam:
                   ba.back_substitute(Vinv, W, g_p, dcam, prob))
    dpts = back(Vinv, W, g_p, dcam)
    print(f"back_substitute:     {timeit(back, Vinv, W, g_p, dcam)*1e3:8.2f} ms",
          flush=True)

    cost_fn = jax.jit(lambda c, p: ba.compute_cost(c, p, prob))
    cost_fn(cam, pts)
    print(f"compute_cost:        {timeit(cost_fn, cam, pts)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
