"""Full-pipeline race at scale on synthetic data: reference bundler vs ours.

Generates a geometrically consistent synthetic collection (cameras on an
arc, 3D points, per-track descriptors with per-view jitter, clutter keys),
writes it in the reference's formats, then runs BOTH full pipelines from
identical keys:

  reference: KeyMatchFull (ANN 2-NN) + bundler --run_bundle   (RunBundler.sh
             stages, the real binaries built by build_reference.sh)
  ours:      DescriptorTable MXU matching + geometric verification +
             incremental reconstruction, all on one TPU chip

Quality is scored against ground truth: registered cameras, mean
reprojection error, and camera-center ATE after similarity alignment.

Usage:
    python benchmarks/e2e_synthetic.py [num_images] [keys_per_image]
        [--ref /tmp/refbuild/bin] [--track_ratio 0.6]
"""

import argparse
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

W_IMG, H_IMG = 1024, 768
FOCAL = 900.0
PIX_NOISE = 0.4


def look_at(c, target):
    z = c - target
    z = z / np.linalg.norm(z)
    x = np.cross([0.0, 1.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def synthesize(num_images, keys_per_image, track_ratio, seed=0):
    """Returns (infos, descs, gt) where infos are RAW image coords [n,4]."""
    rng = np.random.default_rng(seed)
    centers = np.array([[np.sin(a) * 10, 1.5 * np.sin(2 * a),
                         np.cos(a) * 10]
                        for a in np.linspace(0, 1.6, num_images)])
    Rs = np.stack([look_at(c, np.zeros(3)) for c in centers])

    # World points: a FIXED pool relative to per-image key budget (NOT
    # scaled with num_images) so that two overlapping views have a high
    # chance of sampling the same points — otherwise shared tracks dilute
    # quadratically with N and the collection stops being reconstructable
    # (for ours and the reference alike).
    num_pts = int(keys_per_image * track_ratio * 5)
    pts = rng.uniform(-3, 3, (num_pts, 3))
    base_desc = rng.integers(0, 256, (num_pts, 128)).astype(np.int32)

    infos, descs = [], []
    half_w, half_h = (W_IMG - 1) / 2, (H_IMG - 1) / 2
    for i in range(num_images):
        p = np.einsum("ij,nj->ni", Rs[i], pts - centers[i])
        uv = -FOCAL * p[:, :2] / p[:, 2:3]
        vis = ((p[:, 2] < -1.0) & (np.abs(uv[:, 0]) < half_w - 8)
               & (np.abs(uv[:, 1]) < half_h - 8))
        idx = np.nonzero(vis)[0]
        n_track = min(len(idx), int(keys_per_image * track_ratio))
        idx = rng.choice(idx, n_track, replace=False)
        xy = uv[idx] + rng.normal(0, PIX_NOISE, (n_track, 2))
        # Centered, y-up -> raw image row/col.
        col = xy[:, 0] + half_w
        row = (H_IMG - 1) - (xy[:, 1] + half_h)
        d = np.clip(base_desc[idx] + rng.integers(-6, 7, (n_track, 128)),
                    0, 255).astype(np.uint8)
        n_clutter = keys_per_image - n_track
        ccol = rng.uniform(0, W_IMG - 1, n_clutter)
        crow = rng.uniform(0, H_IMG - 1, n_clutter)
        cd = rng.integers(0, 256, (n_clutter, 128)).astype(np.uint8)
        info = np.zeros((keys_per_image, 4), np.float32)
        info[:n_track, 0] = col
        info[:n_track, 1] = row
        info[n_track:, 0] = ccol
        info[n_track:, 1] = crow
        info[:, 2] = 2.0
        perm = rng.permutation(keys_per_image)
        infos.append(info[perm])
        descs.append(np.concatenate([d, cd])[perm])
    return infos, descs, {"centers": centers, "Rs": Rs}


def write_reference_inputs(workdir, infos, descs):
    from PIL import Image
    from bundler_sfm_tpu.io.keyfile import write_key_file
    os.makedirs(os.path.join(workdir, "bundle"), exist_ok=True)
    img = Image.new("L", (W_IMG, H_IMG), 128)
    names = []
    for i in range(len(infos)):
        name = f"img{i:04d}.jpg"
        img.save(os.path.join(workdir, name))
        names.append(name)
        write_key_file(os.path.join(workdir, f"img{i:04d}.key"),
                       infos[i], descs[i])
    with open(os.path.join(workdir, "list.txt"), "w") as f:
        for n in names:
            f.write(f"{n} 0 {FOCAL:.5f}\n")
    with open(os.path.join(workdir, "list_keys.txt"), "w") as f:
        for n in names:
            f.write(n.replace(".jpg", ".key") + "\n")
    with open(os.path.join(workdir, "options.txt"), "w") as f:
        f.write("--match_table matches.init.txt\n"
                "--output bundle.out\n--output_all bundle_\n"
                "--output_dir bundle\n--variable_focal_length\n"
                "--use_focal_estimate\n--constrain_focal\n"
                "--constrain_focal_weight 0.0001\n--estimate_distortion\n"
                "--ray_angle_threshold 2.0\n--run_bundle\n")


def run_reference(workdir, bindir):
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = bindir + ":" + env.get("LD_LIBRARY_PATH", "")
    t0 = time.time()
    r = subprocess.run([os.path.join(bindir, "KeyMatchFull"),
                        "list_keys.txt", "matches.init.txt"],
                       cwd=workdir, capture_output=True, text=True, env=env,
                       timeout=14400)
    t_match = time.time() - t0
    assert r.returncode == 0, r.stderr[-1500:]
    t0 = time.time()
    r = subprocess.run([os.path.join(bindir, "bundler"), "list.txt",
                        "--options_file", "options.txt"],
                       cwd=workdir, capture_output=True, text=True, env=env,
                       timeout=14400)
    t_bundle = time.time() - t0
    with open(os.path.join(workdir, "bundle", "bundle.log"), "w") as f:
        f.write(r.stdout)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    return t_match, t_bundle


def similarity_ate(est_centers, gt_centers):
    A, B = np.asarray(est_centers), np.asarray(gt_centers)
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(B0.T @ A0)
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / (A0 ** 2).sum()
    res = B0 - s * A0 @ R.T
    scene = np.sqrt((B0 ** 2).sum(1).mean())
    return float(np.sqrt((res ** 2).sum(1).mean()) / max(scene, 1e-12))


def model_quality(bundle_path, gt):
    from bundler_sfm_tpu.io.bundlefile import read_bundle_file
    b = read_bundle_file(bundle_path)
    reg = [(i, c) for i, c in enumerate(b.cameras) if c.registered]
    errs = []
    for p in b.points:
        for (ci, _k, x, y) in np.atleast_2d(p.views):
            c = b.cameras[int(ci)]
            pc = c.R @ (p.pos - c.center)
            uv = -pc[:2] / pc[2]
            r2 = uv @ uv
            pred = c.f * (1 + c.k1 * r2 + c.k2 * r2 * r2) * uv
            errs.append(np.hypot(pred[0] - x, pred[1] - y))
    ate = similarity_ate([c.center for _, c in reg],
                         [gt["centers"][i] for i, _ in reg]) if len(reg) >= 3 \
        else None
    return {"cameras": len(reg), "points": len(b.points),
            "mean_reproj_px": round(float(np.mean(errs)), 4) if errs else None,
            "ate_rel": round(ate, 5) if ate is not None else None}


def run_ours(workdir, infos, descs):
    import jax
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.io.keyfile import keys_to_centered
    from bundler_sfm_tpu.io.listfile import ImageEntry
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    from bundler_sfm_tpu.pipeline.scene import Scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints

    n = len(infos)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    t0 = time.time()
    table = DescriptorTable(descs)
    matches = table.match_pairs(pairs, min_matches=16)
    t_match = time.time() - t0

    cfg = default_pipeline_config()
    if jax.default_backend() != "cpu":
        cfg.ba_dtype = "float32"
    entries = [ImageEntry(f"img{i:04d}.jpg", init_focal=FOCAL)
               for i in range(n)]
    key_xy = [keys_to_centered(info, W_IMG, H_IMG)[:, :2].astype(np.float64)
              for info in infos]
    scene = Scene(config=cfg, entries=entries,
                  dims=[(W_IMG, H_IMG)] * n, key_xy=key_xy, matches=matches)
    out = os.path.join(workdir, "ours")
    t0 = time.time()
    compute_geometric_constraints(scene, seed=0)
    bundle_adjust_fast(scene, out_dir=out, seed=0)
    t_bundle = time.time() - t0
    from bundler_sfm_tpu.utils import get_telemetry
    get_telemetry().dump(os.path.join(workdir, "ours_telemetry.json"))
    return t_match, t_bundle, os.path.join(out, "bundle.out")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("num_images", nargs="?", type=int, default=32)
    ap.add_argument("keys_per_image", nargs="?", type=int, default=2048)
    ap.add_argument("--ref", default="/tmp/refbuild/bin")
    ap.add_argument("--track_ratio", type=float, default=0.6)
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--skip_ours", action="store_true",
                    help="run only the reference side (e.g. in background "
                         "pinned to a core while ours runs later)")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path")
    args = ap.parse_args()

    infos, descs, gt = synthesize(args.num_images, args.keys_per_image,
                                  args.track_ratio)
    import tempfile
    workdir = tempfile.mkdtemp(prefix=f"e2e_syn{args.num_images}_")
    result = {"images": args.num_images, "keys_per_image": args.keys_per_image,
              "workdir": workdir}

    if not args.skip_reference and \
            os.path.exists(os.path.join(args.ref, "bundler")):
        write_reference_inputs(workdir, infos, descs)
        t_match, t_bundle = run_reference(workdir, args.ref)
        result["reference"] = {
            "match_s": round(t_match, 2), "bundle_s": round(t_bundle, 2),
            "total_s": round(t_match + t_bundle, 2),
            **model_quality(os.path.join(workdir, "bundle", "bundle.out"),
                            gt)}

    if not args.skip_ours:
        import jax
        t_match, t_bundle, bundle_out = run_ours(workdir, infos, descs)
        result["ours"] = {
            "platform": jax.devices()[0].platform,
            "match_s": round(t_match, 2), "bundle_s": round(t_bundle, 2),
            "total_s": round(t_match + t_bundle, 2),
            **model_quality(bundle_out, gt)}
    if "reference" in result and "ours" in result:
        result["speedup_total"] = round(
            result["reference"]["total_s"] / result["ours"]["total_s"], 2)
        result["speedup_match"] = round(
            result["reference"]["match_s"] / max(result["ours"]["match_s"],
                                                 1e-9), 2)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
