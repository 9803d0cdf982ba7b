"""RunBundler — the canonical full pipeline in one command.

The reference's `RunBundler.sh:56-143` glues extract_focal.pl → ToSift →
KeyMatchFull → bundler via shell and temp files; here the same stages run
in-process, TPU-resident end to end:

    python -m bundler_sfm_tpu.run_bundler <image_dir> [--out bundle]
        [--init_focal F | --exif] [--window N] [--max_keys N]

Stages:
  1. list.txt — EXIF focal extraction (bin/extract_focal.pl port)
  2. SIFT    — JAX DoG-SIFT per image (replaces `sift < pgm > key`)
  3. match   — MXU all-pairs matcher (replaces KeyMatchFull)
  4. bundle  — geometric verification + incremental SfM + outputs
Artifacts (list.txt, .key.gz, matches.init.txt, bundle/…) are written in the
reference's formats so any downstream Bundler tooling keeps working.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="run_bundler", description=__doc__)
    p.add_argument("image_dir")
    p.add_argument("--out", default="bundle")
    p.add_argument("--init_focal", type=float, default=0.0,
                   help="fixed initial focal (px); overrides EXIF")
    p.add_argument("--no_exif", action="store_true")
    p.add_argument("--window", type=int, default=-1,
                   help="match window radius (RunBundler.sh MATCH_WINDOW_RADIUS)")
    p.add_argument("--max_keys", type=int, default=4096)
    p.add_argument("--contrast_thr", type=float, default=0.02,
                   help="SIFT DoG contrast threshold (Lowe's binary: 0.04)")
    p.add_argument("--write_keys", action="store_true",
                   help="also write .key.gz files")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_devices", type=int, default=1,
                   help="device-mesh size for matching + BA sharding "
                        "(0 = all visible devices)")
    p.add_argument("--multihost_coordinator", default=None,
                   help="host:port of process 0 — launch ONE run_bundler "
                        "per host with identical args plus --process_id; "
                        "the mesh spans every host's devices "
                        "(jax.distributed, SURVEY.md §2.4)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    if args.multihost_coordinator:
        # Must run before any jax device/backend use.
        from bundler_sfm_tpu.parallel.mesh import initialize_multihost
        initialize_multihost(args.multihost_coordinator,
                             args.num_processes, args.process_id)
        import jax
        if args.num_devices == 1:
            args.num_devices = 0      # span the whole multihost mesh
        args.image_dir = os.path.abspath(args.image_dir)
        if jax.process_index() != 0:
            # SPMD host discipline: every process runs the identical
            # pipeline (collectives must line up); only process 0 writes
            # the artifacts.
            import tempfile
            os.chdir(tempfile.mkdtemp(prefix="bundler_proc_"))

    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.features.sift import extract_sift_batch, load_grayscale
    from bundler_sfm_tpu.io.exif import extract_focal_pixels
    from bundler_sfm_tpu.io.keyfile import keys_to_centered, write_key_file
    from bundler_sfm_tpu.io.listfile import ImageEntry, write_list_file
    from bundler_sfm_tpu.io.matchfile import write_match_file
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    from bundler_sfm_tpu.pipeline.scene import Scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints

    images = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg")))
    if not images:
        print(f"[RunBundler] no jpegs in {args.image_dir}")
        return 1
    print(f"[RunBundler] {len(images)} images")

    # 1. Focal estimates -> list.txt
    entries: List[ImageEntry] = []
    for name in images:
        path = os.path.join(args.image_dir, name)
        if args.init_focal > 0:
            focal = args.init_focal
        elif not args.no_exif:
            focal = extract_focal_pixels(path)
        else:
            focal = 0.0
        entries.append(ImageEntry(path, init_focal=focal))
    write_list_file("list.txt", entries)

    # 2. SIFT (batched: all same-shape images run per-octave as one program)
    t0 = time.time()
    grays = [load_grayscale(e.name) for e in entries]
    dims = [(g.shape[1], g.shape[0]) for g in grays]
    results = extract_sift_batch(grays, max_keys_total=args.max_keys,
                                 contrast_thr=args.contrast_thr)
    infos = [r[0] for r in results]
    descs = [r[1] for r in results]
    for e, info, desc in zip(entries, infos, descs):
        print(f"[RunBundler] {os.path.basename(e.name)}: {len(info)} keys")
        if args.write_keys:
            base = os.path.splitext(os.path.basename(e.name))[0]
            write_key_file(base + ".key.gz", info, desc)
    print(f"[RunBundler] SIFT took {time.time()-t0:.1f}s")

    # 3. Matching
    n = len(images)
    pairs = []
    for i in range(n):
        start = max(i - args.window, 0) if args.window > 0 else 0
        for j in range(start, i):
            pairs.append((j, i))
    t0 = time.time()
    mesh = None
    n_dev = args.num_devices
    if n_dev == 0:
        import jax
        n_dev = len(jax.devices())
    if n_dev > 1:
        from bundler_sfm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_dev)
    if mesh is not None:
        # Production multi-device matcher: image-sharded ppermute ring —
        # each device holds 1/D of the descriptor table (a replicated
        # table would not fit at photo-tourism scale).
        from bundler_sfm_tpu.parallel.matching_sharded import (
            ShardedDescriptorTable,
        )
        table = ShardedDescriptorTable(descs, mesh)
    else:
        table = DescriptorTable(descs)
    matches = table.match_pairs(pairs, min_matches=16)
    print(f"[RunBundler] matched {len(matches)}/{len(pairs)} pairs in "
          f"{time.time()-t0:.1f}s")
    write_match_file("matches.init.txt", matches)

    # 4. Reconstruction
    cfg = default_pipeline_config(num_devices=args.num_devices)
    import jax
    if jax.default_backend() != "cpu":
        # f64 dense linalg (Cholesky/SVD) has no TPU lowering; the on-chip
        # reconstruction runs f32 (CPU keeps f64 for C-parity).
        cfg.ba_dtype = "float32"
    key_xy = [keys_to_centered(info, w, h)[:, :2].astype(np.float64)
              for info, (w, h) in zip(infos, dims)]
    key_color = []
    for e, info in zip(entries, infos):
        try:
            from PIL import Image
            with Image.open(e.name) as img:
                arr = np.asarray(img.convert("RGB"))
            h, w = arr.shape[:2]
            xs = np.clip(info[:, 0].astype(int), 0, w - 1)
            ys = np.clip(info[:, 1].astype(int), 0, h - 1)
            key_color.append(arr[ys, xs])
        except Exception:
            key_color.append(None)
    scene = Scene(config=cfg, entries=entries, dims=dims, key_xy=key_xy,
                  key_color=key_color, matches=matches)
    t0 = time.time()
    compute_geometric_constraints(scene, seed=args.seed,
                                  scores_path="pairwise_scores.txt")
    print(f"[RunBundler] {len(scene.tracks)} tracks "
          f"({time.time()-t0:.1f}s)")
    recon = bundle_adjust_fast(scene, out_dir=args.out, seed=args.seed)
    print(f"[RunBundler] output in {args.out}/bundle.out")
    return 0


if __name__ == "__main__":
    sys.exit(main())
