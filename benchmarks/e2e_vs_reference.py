"""End-to-end race: reference bundler pipeline vs bundler_sfm_tpu, on the
same real dataset from identical SIFT keys.

Both sides consume the SAME keypoints (our JAX SIFT output, written as Lowe
.key files), so the comparison is keys -> bundle.out:

  reference: KeyMatchFull list_keys.txt matches.init.txt     (ANN 2-NN match)
             bundler list.txt --options_file options.txt     (incremental SfM)
             -- exactly RunBundler.sh:105-143's stages
  ours:      DescriptorTable.match_pairs (MXU 2-NN)
             compute_geometric_constraints + bundle_adjust_fast

Build the reference first: benchmarks/build_reference.sh   (-> /tmp/refbuild)

Usage:
    python benchmarks/e2e_vs_reference.py [image_dir] [--ref /tmp/refbuild/bin]
        [--focal F] [--max_keys N] [--contrast N]

Prints one JSON line with per-stage wall clock + model quality for both.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KERMIT = "/root/reference/examples/kermit"


def extract_keys(image_dir, images, max_keys, contrast):
    from bundler_sfm_tpu.features.sift import (extract_sift_batch,
                                               load_grayscale)
    # Cache extracted keys on disk: profiling reruns shouldn't re-pay SIFT.
    cache = os.path.join("/tmp", "sift_cache_%s_%d_%g.npz" % (
        os.path.basename(image_dir.rstrip("/")), max_keys, contrast))
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        return (list(z["infos"]), list(z["descs"]),
                [tuple(d) for d in z["dims"]], float(z["t"]))
    t0 = time.time()
    grays = [load_grayscale(os.path.join(image_dir, n)) for n in images]
    dims = [(g.shape[1], g.shape[0]) for g in grays]
    results = extract_sift_batch(grays, max_keys_total=max_keys,
                                 contrast_thr=contrast)
    infos = [r[0] for r in results]
    descs = [r[1] for r in results]
    t = time.time() - t0
    np.savez(cache, infos=np.array(infos, dtype=object),
             descs=np.array(descs, dtype=object),
             dims=np.array(dims), t=t)
    return infos, descs, dims, t


def stage_reference_inputs(workdir, image_dir, images, infos, descs, focal):
    from bundler_sfm_tpu.io.keyfile import write_key_file
    os.makedirs(os.path.join(workdir, "bundle"), exist_ok=True)
    with open(os.path.join(workdir, "list.txt"), "w") as f:
        for name in images:
            f.write(f"{name} 0 {focal:.5f}\n")
    with open(os.path.join(workdir, "list_keys.txt"), "w") as f:
        for name in images:
            f.write(name.rsplit(".", 1)[0] + ".key\n")
    for name, info, desc in zip(images, infos, descs):
        shutil.copy(os.path.join(image_dir, name),
                    os.path.join(workdir, name))
        write_key_file(os.path.join(workdir,
                                    name.rsplit(".", 1)[0] + ".key"),
                       info, desc)
    # options.txt exactly as RunBundler.sh:114-138 (defaults: FOCAL_WEIGHT
    # 0.0001, RAY_ANGLE_THRESHOLD 2.0).
    with open(os.path.join(workdir, "options.txt"), "w") as f:
        f.write("--match_table matches.init.txt\n"
                "--output bundle.out\n"
                "--output_all bundle_\n"
                "--output_dir bundle\n"
                "--variable_focal_length\n"
                "--use_focal_estimate\n"
                "--constrain_focal\n"
                "--constrain_focal_weight 0.0001\n"
                "--estimate_distortion\n"
                "--ray_angle_threshold 2.0\n"
                "--run_bundle\n")


def run_reference(workdir, bindir):
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = bindir + ":" + env.get("LD_LIBRARY_PATH", "")
    t0 = time.time()
    r = subprocess.run([os.path.join(bindir, "KeyMatchFull"),
                        "list_keys.txt", "matches.init.txt"],
                       cwd=workdir, capture_output=True, text=True, env=env,
                       timeout=7200)
    t_match = time.time() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    t0 = time.time()
    r = subprocess.run([os.path.join(bindir, "bundler"), "list.txt",
                        "--options_file", "options.txt"],
                       cwd=workdir, capture_output=True, text=True, env=env,
                       timeout=7200)
    t_bundle = time.time() - t0
    with open(os.path.join(workdir, "bundle", "bundle.log"), "w") as f:
        f.write(r.stdout)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-1000:])
    return t_match, t_bundle


def model_stats(bundle_path):
    from bundler_sfm_tpu.io.bundlefile import read_bundle_file
    b = read_bundle_file(bundle_path)
    cams = sum(1 for c in b.cameras if c.registered)
    pts = len(b.points)
    # Mean reprojection error over all stored views.
    errs = []
    for p in b.points:
        for (ci, _ki, x, y) in np.atleast_2d(p.views):
            c = b.cameras[int(ci)]
            pc = c.R @ (p.pos - c.center)
            uv = -pc[:2] / pc[2]
            r2 = uv @ uv
            pred = c.f * (1 + c.k1 * r2 + c.k2 * r2 * r2) * uv
            errs.append(np.hypot(pred[0] - x, pred[1] - y))
    return {"cameras": cams, "points": pts,
            "mean_reproj_px": round(float(np.mean(errs)), 4) if errs else None}


def run_ours(workdir, images, image_dir, infos, descs, dims, focal, seed=0):
    import jax
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.io.keyfile import keys_to_centered
    from bundler_sfm_tpu.io.listfile import ImageEntry
    from bundler_sfm_tpu.io.matchfile import write_match_file
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    from bundler_sfm_tpu.pipeline.scene import Scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints

    n = len(images)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    t0 = time.time()
    table = DescriptorTable(descs)
    matches = table.match_pairs(pairs, min_matches=16)
    t_match = time.time() - t0
    write_match_file(os.path.join(workdir, "matches.ours.txt"), matches)

    cfg = default_pipeline_config()
    if jax.default_backend() != "cpu":
        cfg.ba_dtype = "float32"
    entries = [ImageEntry(os.path.join(image_dir, name), init_focal=focal)
               for name in images]
    key_xy = [keys_to_centered(info, w, h)[:, :2].astype(np.float64)
              for info, (w, h) in zip(infos, dims)]
    scene = Scene(config=cfg, entries=entries, dims=dims, key_xy=key_xy,
                  matches=matches)
    out = os.path.join(workdir, "ours")
    t0 = time.time()
    compute_geometric_constraints(scene, seed=seed)
    bundle_adjust_fast(scene, out_dir=out, seed=seed)
    t_bundle = time.time() - t0
    from bundler_sfm_tpu.utils import get_telemetry
    get_telemetry().dump(os.path.join(workdir, "ours_telemetry.json"))
    return t_match, t_bundle, os.path.join(out, "bundle.out")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir", nargs="?", default=KERMIT)
    ap.add_argument("--ref", default="/tmp/refbuild/bin")
    ap.add_argument("--focal", type=float, default=660.0)
    ap.add_argument("--max_keys", type=int, default=4096)
    ap.add_argument("--contrast", type=float, default=0.02)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    images = sorted(f for f in os.listdir(args.image_dir)
                    if f.lower().endswith((".jpg", ".jpeg")))
    infos, descs, dims, t_sift = extract_keys(
        args.image_dir, images, args.max_keys, args.contrast)

    import tempfile
    workdir = args.workdir or tempfile.mkdtemp(prefix="e2e_vs_ref_")
    os.makedirs(workdir, exist_ok=True)
    result = {"dataset": os.path.basename(args.image_dir.rstrip("/")),
              "images": len(images),
              "keys": int(sum(len(i) for i in infos)),
              "sift_s": round(t_sift, 2), "workdir": workdir}

    if os.path.exists(os.path.join(args.ref, "bundler")):
        stage_reference_inputs(workdir, args.image_dir, images, infos,
                               descs, args.focal)
        t_match, t_bundle = run_reference(workdir, args.ref)
        result["reference"] = {
            "match_s": round(t_match, 2), "bundle_s": round(t_bundle, 2),
            "total_s": round(t_match + t_bundle, 2),
            **model_stats(os.path.join(workdir, "bundle", "bundle.out"))}

    import jax
    t_match, t_bundle, bundle_out = run_ours(
        workdir, images, args.image_dir, infos, descs, dims, args.focal)
    result["ours"] = {
        "platform": jax.devices()[0].platform,
        "match_s": round(t_match, 2), "bundle_s": round(t_bundle, 2),
        "total_s": round(t_match + t_bundle, 2),
        **model_stats(bundle_out)}

    if "reference" in result:
        result["speedup_total"] = round(
            result["reference"]["total_s"] / result["ours"]["total_s"], 2)
        result["speedup_match"] = round(
            result["reference"]["match_s"] / max(result["ours"]["match_s"],
                                                 1e-9), 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
