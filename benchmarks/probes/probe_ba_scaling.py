"""Probe: BA LM-iteration cost vs problem size on the real chip.

Not a pytest test — run manually:
    python tests/probe_ba_scaling.py

Answers whether the ~9 ms/iter seen at the bench size (8 cams / 2k pts /
16k obs) is fixed per-iteration overhead (many tiny ops in the while_loop
body) or real compute — i.e. how obs*iters/s scales with problem size.
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


def synthetic(num_cams, num_pts, views_per_pt, seed=0):
    """Cameras on an arc looking at the origin; each point observed by a
    contiguous window of `views_per_pt` cameras (realistic track length)."""
    rng = np.random.default_rng(seed)
    f = 700.0
    centers = np.array([[np.sin(a) * 6, 0.2 * i, np.cos(a) * 6]
                        for i, a in enumerate(
                            np.linspace(0, 0.8, num_cams))])
    pts = rng.uniform(-2, 2, (num_pts, 3))

    def look_at(c):
        z = c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        return np.stack([x, y, z])

    R = np.stack([look_at(c) for c in centers])
    start = rng.integers(0, max(1, num_cams - views_per_pt + 1), num_pts)
    obs_cam, obs_pt = [], []
    for p in range(num_pts):
        for c in range(start[p], start[p] + views_per_pt):
            obs_cam.append(c)
            obs_pt.append(p)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    p_cam = np.einsum("oij,oj->oi", R[obs_cam], pts[obs_pt] - centers[obs_cam])
    obs_xy = -f * p_cam[:, :2] / p_cam[:, 2:3]
    cam0 = np.zeros((num_cams, 9))
    cam0[:, 0:3] = centers + rng.normal(size=centers.shape) * 0.01
    cam0[:, 6] = f
    return (R, cam0, pts + rng.normal(size=pts.shape) * 0.02,
            obs_cam, obs_pt, obs_xy)


def main():
    import jax
    from bundler_sfm_tpu.ops.ba import (
        build_problem, plan_schur_windows, run_ba,
    )

    use_window = bool(os.environ.get("BUNDLER_BA_WINDOW"))
    print("platform:", jax.devices()[0].platform,
          " windowed:", use_window, flush=True)
    sizes = [(8, 2048, 8), (16, 8192, 8), (32, 32768, 8), (64, 65536, 8)]
    if len(sys.argv) > 1:
        # e.g. "64,65536,8 128,131072,8"
        sizes = [tuple(int(v) for v in s.split(","))
                 for s in sys.argv[1:]]
    for (C, P, V) in sizes:
        R0, cam0, pts0, oc, op, oxy = synthetic(C, P, V)

        def build(camx):
            kw = dict(est_focal=True, est_distortion=True,
                      dtype=np.float32)
            if use_window:
                plan = plan_schur_windows(oc, op, P, C, V)
                if plan is not None:
                    row_of, schur_win, Wd, G, total = plan
                    pts0_r = np.zeros((total, 3), pts0.dtype)
                    pts0_r[row_of] = pts0
                    return (build_problem(R0, camx, pts0_r, oc,
                                          row_of[op].astype(np.int32), oxy,
                                          schur_win=schur_win, **kw),
                            Wd, G)
            return build_problem(R0, camx, pts0, oc, op, oxy, **kw), 0, 0

        prob, Wd, G = build(cam0)
        t0 = time.perf_counter()
        res = run_ba(prob, max_iters=30, window=Wd, group_pts=G)
        float(np.asarray(res.cost))
        compile_dt = time.perf_counter() - t0
        prob2, _, _ = build(cam0 + 1e-6)
        t0 = time.perf_counter()
        res = run_ba(prob2, max_iters=30, window=Wd, group_pts=G)
        float(np.asarray(res.cost))
        dt = time.perf_counter() - t0
        it = max(int(res.iters), 1)
        print(f"C={C:4d} P={P:6d} O={len(oc):7d}  iters={it:3d}  "
              f"W={Wd:3d}  {dt/it*1e3:8.2f} ms/iter  "
              f"{len(oc)*it/dt/1e6:8.2f} Mobs*iters/s  "
              f"(compile+run {compile_dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
