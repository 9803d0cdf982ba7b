"""From-PIXELS race at scale: SIFT inside the timed path on both sides'
clock (`RunBundler.sh:98-104` runs per-image sift there; Lowe's binary is
not shipped, so the reference side consumes OUR written .key files exactly
as KeyMatchFull would read them and its timed path starts at matching —
our side's total INCLUDES SIFT, biasing the race against us).

Scene: benchmarks/render_scene.py's textured box room (real photograph
pixels, known ground-truth poses).

Usage:
    python benchmarks/e2e_pixels.py SCENE_DIR [--ref /tmp/refbuild/bin]
        [--skip_reference] [--skip_ours] [--max_keys N] [--out FILE]

SCENE_DIR must contain img%04d.jpg + gt.json (render_scene.py output).
Prints one JSON line with per-stage walls + quality vs ground truth.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_ours(scene_dir, images, gt, max_keys, workdir):
    import jax
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.features.sift import (extract_sift_batch,
                                               load_grayscale)
    from bundler_sfm_tpu.io.keyfile import keys_to_centered, write_key_file
    from bundler_sfm_tpu.io.listfile import ImageEntry
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    from bundler_sfm_tpu.pipeline.scene import Scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints

    W, H, focal = gt["W"], gt["H"], gt["focal"]
    n = len(images)
    t0 = time.time()
    grays = [load_grayscale(os.path.join(scene_dir, name))
             for name in images]
    results = extract_sift_batch(grays, max_keys_total=max_keys,
                                 contrast_thr=0.02)
    infos = [r[0] for r in results]
    descs = [r[1] for r in results]
    t_sift = time.time() - t0
    total_keys = int(sum(len(i) for i in infos))

    # Write .key files for the reference side (not in our timed path — the
    # reference would have run its own sift binary here).
    for name, info, desc in zip(images, infos, descs):
        write_key_file(os.path.join(workdir,
                                    name.rsplit(".", 1)[0] + ".key"),
                       info, desc)

    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    t0 = time.time()
    table = DescriptorTable(descs)
    matches = table.match_pairs(pairs, min_matches=16)
    t_match = time.time() - t0

    cfg = default_pipeline_config()
    if jax.default_backend() != "cpu":
        cfg.ba_dtype = "float32"
    entries = [ImageEntry(name, init_focal=focal) for name in images]
    key_xy = [keys_to_centered(info, W, H)[:, :2].astype(np.float64)
              for info in infos]
    scene = Scene(config=cfg, entries=entries, dims=[(W, H)] * n,
                  key_xy=key_xy, matches=matches)
    out = os.path.join(workdir, "ours")
    t0 = time.time()
    compute_geometric_constraints(scene, seed=0)
    bundle_adjust_fast(scene, out_dir=out, seed=0)
    t_bundle = time.time() - t0
    from bundler_sfm_tpu.utils import get_telemetry
    get_telemetry().dump(os.path.join(workdir, "ours_telemetry.json"))
    return dict(sift_s=round(t_sift, 2), keys=total_keys,
                keys_per_s=round(total_keys / max(t_sift, 1e-9), 1),
                match_s=round(t_match, 2), bundle_s=round(t_bundle, 2),
                total_s=round(t_sift + t_match + t_bundle, 2),
                bundle_out=os.path.join(out, "bundle.out"))


def stage_reference(workdir, images, focal):
    with open(os.path.join(workdir, "list.txt"), "w") as f:
        for name in images:
            f.write(f"{name} 0 {focal:.5f}\n")
    with open(os.path.join(workdir, "list_keys.txt"), "w") as f:
        for name in images:
            f.write(name.rsplit(".", 1)[0] + ".key\n")
    os.makedirs(os.path.join(workdir, "bundle"), exist_ok=True)
    with open(os.path.join(workdir, "options.txt"), "w") as f:
        f.write("--match_table matches.init.txt\n--output bundle.out\n"
                "--output_all bundle_\n--output_dir bundle\n"
                "--variable_focal_length\n--use_focal_estimate\n"
                "--constrain_focal\n--constrain_focal_weight 0.0001\n"
                "--estimate_distortion\n--ray_angle_threshold 2.0\n"
                "--run_bundle\n")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_synthetic import model_quality, run_reference

    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--ref", default="/tmp/refbuild/bin")
    ap.add_argument("--max_keys", type=int, default=4096)
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    gt = json.load(open(os.path.join(args.scene_dir, "gt.json")))
    gt["centers"] = np.array(gt["centers"])
    images = sorted(f for f in os.listdir(args.scene_dir)
                    if f.endswith(".jpg"))
    import tempfile
    workdir = args.workdir or tempfile.mkdtemp(
        prefix=f"e2e_px{len(images)}_")
    os.makedirs(workdir, exist_ok=True)
    # Image files are needed by the reference's list.txt references.
    import shutil
    for name in images:
        dst = os.path.join(workdir, name)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(args.scene_dir, name), dst)

    result = {"images": len(images), "workdir": workdir,
              "max_keys": args.max_keys}
    if not args.skip_ours:
        import jax
        ours = run_ours(args.scene_dir, images, gt, args.max_keys, workdir)
        bundle_out = ours.pop("bundle_out")
        result["ours"] = {"platform": jax.devices()[0].platform, **ours,
                          **model_quality(bundle_out, gt)}

    if not args.skip_reference and \
            os.path.exists(os.path.join(args.ref, "bundler")):
        stage_reference(workdir, images, gt["focal"])
        t_match, t_bundle = run_reference(workdir, args.ref)
        result["reference"] = {
            "match_s": round(t_match, 2), "bundle_s": round(t_bundle, 2),
            "total_s": round(t_match + t_bundle, 2),
            "note": "consumes OUR keys; its own SIFT cost excluded",
            **model_quality(os.path.join(workdir, "bundle", "bundle.out"),
                            gt)}
    if "reference" in result and "ours" in result:
        result["speedup_total_ours_incl_sift"] = round(
            result["reference"]["total_s"] / result["ours"]["total_s"], 2)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
