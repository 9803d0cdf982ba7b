"""`KeyMatchFull` executable equivalent — all-pairs (or sliding-window)
descriptor matching on the MXU.

Reference `src/KeyMatchFull.cpp:59-151`: read every key file, for each image
i match every earlier image j (or only j within a window radius) with 2-NN +
0.6 ratio, write pairs with >= 16 matches to the output table.

    python -m bundler_sfm_tpu.keymatch list_keys.txt matches.init.txt [window]
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np


def match_full(key_files: List[str], window_radius: int = -1,
               ratio: float = 0.6, min_matches: int = 16,
               batch: int = 16, block: int = 1024):
    from bundler_sfm_tpu.io.keyfile import read_key_file
    from bundler_sfm_tpu.ops.matching import DescriptorTable

    descs = []
    t0 = time.time()
    for kf in key_files:
        try:
            _, d = read_key_file(kf)
        except FileNotFoundError:
            d = np.zeros((0, 128), np.uint8)
        descs.append(d)
    print(f"[KeyMatchFull] Reading keys took {time.time()-t0:.3f}s "
          f"({sum(len(d) for d in descs)} keys)")

    pairs = []
    n = len(descs)
    for i in range(n):
        start = max(i - window_radius, 0) if window_radius > 0 else 0
        for j in range(start, i):
            if len(descs[j]) and len(descs[i]):
                pairs.append((j, i))
    from bundler_sfm_tpu.utils import counter, get_telemetry
    t0 = time.time()
    # One descriptor upload, then device-side gather/dedup/compaction per
    # pair batch — the host link never sees the padded stacks again.
    table = DescriptorTable(descs, block=block)
    out = table.match_pairs(pairs, ratio=ratio, batch=batch,
                            min_matches=min_matches)
    dt = time.time() - t0
    counter("pairs_matched", len(pairs))
    get_telemetry().add_time("match", dt)
    total = sum(len(v) for v in out.values())
    print(f"[KeyMatchFull] Matching took {dt:.3f}s "
          f"({len(pairs)} pairs, {len(pairs)/max(dt,1e-9):.1f} pairs/s, "
          f"{total} matches)")
    return out


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    list_file, out_file = argv[0], argv[1]
    window = int(argv[2]) if len(argv) > 2 else -1
    with open(list_file) as f:
        key_files = [line.split()[0] for line in f if line.strip()]
    matches = match_full(key_files, window_radius=window)
    from bundler_sfm_tpu.io.matchfile import write_match_file
    write_match_file(out_file, matches)
    return 0


if __name__ == "__main__":
    sys.exit(main())
