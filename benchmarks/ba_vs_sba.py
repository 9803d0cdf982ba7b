"""Head-to-head bundle adjustment: our Schur-LM (`ops/ba.py`) vs the
reference's SBA stack, on the SAME synthetic problem.

The reference side runs through its own `--rerun_bundle` path
(`src/BundlerApp.cpp:839-853` -> `ReRunSFM` `src/Bundle.cpp:279` -> `RunSFM`
-> `run_sfm` -> `sba_motstr_levmar`), fed a generated scene written in its
native formats (list.txt + .key files + bundle v0.3).  Set REF_BUNDLER to a
built reference binary; without it only our side runs.

Usage:
    REF_BUNDLER=/tmp/refbuild/bin/bundler python benchmarks/ba_vs_sba.py \
        [num_cams num_pts views_per_pt]

Prints one JSON line with wall-clock + quality for both sides.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W_IMG, H_IMG = 640, 480
FOCAL = 700.0
PIX_NOISE = 0.5   # px, observation noise
PT_NOISE = 0.05   # world units, initial point perturbation
CAM_NOISE = 0.02  # world units, initial center perturbation


def synthesize(num_cams, num_pts, views_per_pt, seed=0):
    """Cameras on an arc looking at the origin; each point seen by a
    contiguous window of cameras; observations inside the image."""
    rng = np.random.default_rng(seed)
    centers = np.array([[np.sin(a) * 8, 0.5 * np.sin(3 * a), np.cos(a) * 8]
                        for a in np.linspace(0, 1.2, num_cams)])
    pts = rng.uniform(-2, 2, (num_pts, 3))

    def look_at(c):
        z = c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
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
    obs_xy = -FOCAL * p_cam[:, :2] / p_cam[:, 2:3]
    obs_xy += rng.normal(size=obs_xy.shape) * PIX_NOISE

    # Keep only observations inside the image.
    keep = ((np.abs(obs_xy[:, 0]) < (W_IMG - 2) / 2) &
            (np.abs(obs_xy[:, 1]) < (H_IMG - 2) / 2) & (p_cam[:, 2] < 0))
    obs_cam, obs_pt, obs_xy = obs_cam[keep], obs_pt[keep], obs_xy[keep]
    # Drop points with <2 surviving views and reindex.
    counts = np.bincount(obs_pt, minlength=num_pts)
    keep_pt = counts >= 2
    remap = -np.ones(num_pts, np.int64)
    remap[keep_pt] = np.arange(keep_pt.sum())
    sel = keep_pt[obs_pt]
    obs_cam, obs_pt, obs_xy = obs_cam[sel], remap[obs_pt[sel]], obs_xy[sel]
    pts = pts[keep_pt]

    pts_init = pts + rng.normal(size=pts.shape) * PT_NOISE
    centers_init = centers + rng.normal(size=centers.shape) * CAM_NOISE
    return (R, centers, centers_init, pts, pts_init,
            obs_cam, obs_pt.astype(np.int32), obs_xy)


def write_reference_inputs(outdir, R, centers_init, pts_init,
                           obs_cam, obs_pt, obs_xy):
    """Write list.txt, per-image .key files, and bundle.in.out (v0.3)."""
    from PIL import Image
    from bundler_sfm_tpu.io.bundlefile import (
        BundleCamera, BundleFile, BundlePoint, write_bundle_file)
    from bundler_sfm_tpu.io.keyfile import centered_to_image

    os.makedirs(os.path.join(outdir, "bundle"), exist_ok=True)
    C = len(centers_init)
    P = len(pts_init)

    img = Image.new("L", (W_IMG, H_IMG), 128)
    names = []
    for c in range(C):
        name = f"img{c:04d}.jpg"
        img.save(os.path.join(outdir, name))
        names.append(name)
    with open(os.path.join(outdir, "list.txt"), "w") as f:
        for name in names:
            f.write(f"{name}\n")   # no init focal: unconstrained BA

    # Per-camera key files: observation o of camera c becomes key index
    # key_of_obs[o]; coordinates stored in raw (row, col) image convention.
    key_of_obs = np.zeros(len(obs_cam), np.int64)
    order = np.argsort(obs_cam, kind="stable")
    raw = centered_to_image(obs_xy, W_IMG, H_IMG)
    for c in range(C):
        sel = order[obs_cam[order] == c]
        key_of_obs[sel] = np.arange(len(sel))
        path = os.path.join(outdir, names[c].replace(".jpg", ".key"))
        with open(path, "w") as f:
            f.write(f"{len(sel)} 128\n")
            zero_desc = ("0 " * 20).rstrip()
            for o in sel:
                col, row = raw[o]
                f.write(f"{row:.2f} {col:.2f} 2.0 0.0\n")
                for _ in range(6):
                    f.write(" " + zero_desc + "\n")
                f.write(" 0 0 0 0 0 0 0 0\n")

    cams = [BundleCamera(f=FOCAL, k1=0.0, k2=0.0, R=R[c],
                         t=-R[c] @ centers_init[c]) for c in range(C)]
    views = [[] for _ in range(P)]
    for o in range(len(obs_cam)):
        views[obs_pt[o]].append(
            (int(obs_cam[o]), int(key_of_obs[o]), obs_xy[o, 0], obs_xy[o, 1]))
    points = [BundlePoint(pos=pts_init[p], color=np.array([128, 128, 128]),
                          views=np.array(views[p]))
              for p in range(P)]
    write_bundle_file(os.path.join(outdir, "bundle.in.out"),
                      BundleFile(cameras=cams, points=points))

    with open(os.path.join(outdir, "options.txt"), "w") as f:
        f.write("--bundle bundle.in.out\n")
        f.write("--rerun_bundle\n")
        f.write("--variable_focal_length\n")
        f.write("--estimate_distortion\n")
        f.write("--output bundle.out\n")
        f.write("--output_all bundle_\n")
        f.write("--output_dir bundle\n")


def run_reference(outdir, binary):
    env = dict(os.environ)
    # The reference links ANN as a shared lib living next to the binary.
    env["LD_LIBRARY_PATH"] = (os.path.dirname(binary) + ":"
                              + env.get("LD_LIBRARY_PATH", ""))
    t0 = time.time()
    r = subprocess.run([binary, "list.txt", "--options_file", "options.txt"],
                       cwd=outdir, capture_output=True, text=True, env=env,
                       timeout=7200)
    wall = time.time() - t0
    with open(os.path.join(outdir, "bundle", "bundle.log"), "w") as f:
        f.write(r.stdout)
    sfm_s = 0.0
    for line in r.stdout.splitlines():
        if "run_sfm took" in line:
            sfm_s += float(line.split("took")[1].rstrip("s. \n"))
    return {"wall_s": round(wall, 2), "run_sfm_s": round(sfm_s, 2),
            "rc": r.returncode}


def mean_reproj(cam9, R, pts, obs_cam, obs_pt, obs_xy):
    """Mean reprojection error (px) of a [C,9] cam / R / pts state."""
    c = cam9[obs_cam, 0:3]
    f = cam9[obs_cam, 6]
    k1 = cam9[obs_cam, 7]
    k2 = cam9[obs_cam, 8]
    p = np.einsum("oij,oj->oi", R[obs_cam], pts[obs_pt] - c)
    uv = -p[:, :2] / p[:, 2:3]
    r2 = (uv[:, 0] ** 2 + uv[:, 1] ** 2)
    d = 1.0 + k1 * r2 + k2 * r2 * r2
    pred = f[:, None] * d[:, None] * uv
    return float(np.mean(np.linalg.norm(pred - obs_xy, axis=1)))


def run_ours(R, centers_init, pts_init, obs_cam, obs_pt, obs_xy,
             max_iters=150):
    import jax
    from bundler_sfm_tpu.ops.ba import (
        build_problem, plan_schur_windows, run_ba,
    )

    C = len(centers_init)
    cam0 = np.zeros((C, 9))
    cam0[:, 0:3] = centers_init
    cam0[:, 6] = FOCAL
    counts = np.bincount(obs_pt)
    plan = plan_schur_windows(obs_cam, obs_pt, len(pts_init), C,
                              int(counts.max()))

    def build(camx):
        kw = dict(est_focal=True, est_distortion=True, dtype=np.float32)
        if plan is not None:
            row_of, schur_win, Wd, G, total = plan
            pts_r = np.zeros((total, 3), np.float64)
            pts_r[row_of] = pts_init
            return build_problem(R, camx, pts_r, obs_cam,
                                 row_of[obs_pt].astype(np.int32), obs_xy,
                                 schur_win=schur_win, **kw), Wd, G
        return build_problem(R, camx, pts_init, obs_cam, obs_pt, obs_xy,
                             **kw), 0, 0

    prob, Wd, G = build(cam0)
    res = run_ba(prob, max_iters=max_iters, window=Wd, group_pts=G)
    float(np.asarray(res.cost))
    prob2, _, _ = build(cam0 + 1e-7)
    t0 = time.time()
    res = run_ba(prob2, max_iters=max_iters, window=Wd, group_pts=G)
    float(np.asarray(res.cost))
    wall = time.time() - t0
    cam = np.asarray(res.cam)[:C]
    Rf = np.asarray(res.R)[:C]
    pts_all = np.asarray(res.pts)
    if plan is not None:
        pts = pts_all[plan[0]]
    else:
        pts = pts_all[:len(pts_init)]
    err = mean_reproj(cam, Rf, pts, obs_cam, obs_pt, obs_xy)
    return {"wall_s": round(wall, 2), "iters": int(res.iters),
            "schur_window": Wd,
            "mean_reproj_px": round(err, 4),
            "platform": jax.devices()[0].platform}


def reference_quality(outdir, obs_cam, obs_pt, obs_xy):
    from bundler_sfm_tpu.io.bundlefile import read_bundle_file
    b = read_bundle_file(os.path.join(outdir, "bundle", "bundle.out"))
    C = len(b.cameras)
    cam9 = np.zeros((C, 9))
    R = np.zeros((C, 3, 3))
    for i, c in enumerate(b.cameras):
        cam9[i, 0:3] = c.center if c.registered else 0.0
        cam9[i, 6] = c.f
        cam9[i, 7] = c.k1
        cam9[i, 8] = c.k2
        R[i] = c.R if c.registered else np.eye(3)
    pts = np.array([p.pos for p in b.points])
    n = min(len(pts), 1 + int(obs_pt.max()))
    sel = obs_pt < n
    return round(mean_reproj(cam9, R, pts[:n], obs_cam[sel], obs_pt[sel],
                             obs_xy[sel]), 4)


def main():
    args = sys.argv[1:]
    C, P, V = (int(a) for a in (args[:3] or (64, 16384, 6)))
    side = os.environ.get("BA_VS_SBA_SIDE", "both")  # ref | ours | both
    (R, centers, centers_init, pts, pts_init,
     obs_cam, obs_pt, obs_xy) = synthesize(C, P, V)

    result = {"num_cams": C, "num_pts": len(pts), "num_obs": len(obs_cam)}

    binary = os.environ.get("REF_BUNDLER")
    if side == "ref" and not (binary and os.path.exists(binary)):
        raise SystemExit("BA_VS_SBA_SIDE=ref needs REF_BUNDLER")
    if side == "ours":
        binary = None
    if binary and os.path.exists(binary):
        import tempfile
        outdir = tempfile.mkdtemp(prefix="ba_vs_sba_")
        write_reference_inputs(outdir, R, centers_init, pts_init,
                               obs_cam, obs_pt, obs_xy)
        ref = run_reference(outdir, binary)
        if ref["rc"] == 0:
            ref["mean_reproj_px"] = reference_quality(
                outdir, obs_cam, obs_pt, obs_xy)
        result["reference_sba"] = ref
        result["workdir"] = outdir

    if side != "ref":
        result["ours"] = run_ours(R, centers_init, pts_init,
                                  obs_cam, obs_pt, obs_xy)
    if "reference_sba" in result and "ours" in result \
            and result["reference_sba"]["rc"] == 0:
        result["speedup_vs_sba_wall"] = round(
            result["reference_sba"]["wall_s"] / result["ours"]["wall_s"], 2)
    print(json.dumps(result))
    out = os.environ.get("BA_VS_SBA_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
