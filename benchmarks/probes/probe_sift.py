"""Probe: where extract_sift_batch's wall goes on the real chip.

Times each octave dispatch + its host fetch separately for one 11-image
chunk of the box-room race shape (800x600 -> 2x upsample), plus the
end-to-end batch call.  python benchmarks/probes/probe_sift.py [scene_dir]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "/tmp/boxroom64"
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.features import sift

    imgs = [sift.load_grayscale(os.path.join(scene, f))
            for f in sorted(os.listdir(scene)) if f.endswith(".jpg")][:11]
    print(f"platform: {jax.devices()[0].platform} "
          f"imgs={len(imgs)} shape={imgs[0].shape}", flush=True)

    # End-to-end (second run timed; first warms programs).
    for trial in range(2):
        t0 = time.perf_counter()
        out = sift.extract_sift_batch(imgs, max_keys_total=4096,
                                      contrast_thr=0.02)
        dt = time.perf_counter() - t0
        nk = sum(len(i) for i, _ in out)
        print(f"extract_sift_batch[{trial}]: {dt:6.2f}s  keys={nk} "
              f"({nk/dt:.0f} keys/s)", flush=True)

    # Stage split for one chunk: prepare, per-octave dispatch vs fetch.
    H, W = imgs[0].shape
    stack = np.stack([np.asarray(im, np.float32) for im in imgs])
    sig = float(np.sqrt(max(sift.SIGMA0**2 - (2 * sift.INIT_SIGMA)**2,
                            0.01)))
    t0 = time.perf_counter()
    base = sift._prepare_bases(jnp.asarray(stack), (H * 2, W * 2), sig)
    np.asarray(base[0, :2, :2])
    print(f"prepare_bases: {time.perf_counter()-t0:6.2f}s", flush=True)

    octave = 0
    scale = 0.5
    while min(base.shape[1:]) >= 2 * sift.PATCH and octave < 6:
        k = max(256, 4096 // (2 ** octave))
        t0 = time.perf_counter()
        info, desc, valid, nbase = sift._extract_octave_batch(
            base, k, jnp.float32(0.02), jnp.float32(sift.EDGE_THR))
        np.asarray(nbase[0, :2, :2])       # sync compute only
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        i_h, d_h, v_h = (np.asarray(info), np.asarray(desc),
                         np.asarray(valid))
        t_fetch = time.perf_counter() - t0
        mb = (info.size * 4 + desc.size + valid.size) / 1e6
        print(f"octave {octave}: k={k:5d} compute {t_disp:6.2f}s  "
              f"fetch {t_fetch:6.2f}s ({mb:.1f} MB)  "
              f"keys={int(v_h.sum())}", flush=True)
        base = nbase
        octave += 1
        scale *= 2


if __name__ == "__main__":
    main()
