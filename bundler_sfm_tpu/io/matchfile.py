"""matches.init.txt I/O.

Format (reference reader `src/BundleIO.cpp:112-166`, writer
`src/KeyMatchFull.cpp:131-142`): repeated records of

    i1 i2
    num_matches
    k1 k2        (num_matches lines of key-index pairs)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

MatchDict = Dict[Tuple[int, int], np.ndarray]  # (i1,i2) -> int32 [m, 2]


def read_match_file(path: str) -> MatchDict:
    matches: MatchDict = {}
    with open(path) as f:
        tokens = f.read().split()
    pos = 0
    n = len(tokens)
    while pos < n:
        i1, i2 = int(tokens[pos]), int(tokens[pos + 1])
        m = int(tokens[pos + 2])
        pos += 3
        flat = np.array(tokens[pos:pos + 2 * m], dtype=np.int32)
        pos += 2 * m
        matches[(i1, i2)] = flat.reshape(m, 2)
    return matches


def write_match_file(path: str, matches: MatchDict) -> None:
    with open(path, "w") as f:
        for (i1, i2), pairs in matches.items():
            f.write(f"{i1} {i2}\n{len(pairs)}\n")
            for a, b in pairs:
                f.write(f"{a} {b}\n")
