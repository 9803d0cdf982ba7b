"""KeyMatch — match a single pair of key files (reference `src/KeyMatch.cpp`).

    python -m bundler_sfm_tpu.keymatchsingle a.key b.key out.txt
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 1
    from bundler_sfm_tpu.io.keyfile import read_key_file
    from bundler_sfm_tpu.ops.matching import match_pair, prune_double_matches
    _, d1 = read_key_file(argv[0])
    _, d2 = read_key_file(argv[1])
    m = prune_double_matches(match_pair(d1, d2))
    with open(argv[2], "w") as f:
        f.write(f"{len(m)}\n")
        for a, b in m:
            f.write(f"{a} {b}\n")
    print(f"[KeyMatch] {len(m)} matches")
    return 0


if __name__ == "__main__":
    sys.exit(main())
