"""Measure the reference KeyMatchFull (capped ANN) pair rate on bench.py's
exact synthetic descriptor distribution, at a chosen collection size —
the denominator for bench.py's vs_baseline (`src/KeyMatchFull.cpp:105-151`,
self-reported "Matching took" excludes key reading, biasing FOR the
reference).

    python benchmarks/probes/ref_ann_rate.py [n_img] [keys] [refbin]
"""

import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    bindir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/refbuild/bin"

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    sys.modules["benchmod"] = benchmod
    spec.loader.exec_module(benchmod)

    rng = np.random.default_rng(0)
    descs = benchmod.make_descriptors(rng, n_img, K)

    from bundler_sfm_tpu.io.keyfile import write_key_file

    work = tempfile.mkdtemp(prefix=f"refann{n_img}_")
    names = []
    for i, d in enumerate(descs):
        # Key geometry is irrelevant to KeyMatchFull; give distinct coords.
        info = np.zeros((len(d), 4), np.float32)
        info[:, 0] = np.arange(len(d)) % 480
        info[:, 1] = np.arange(len(d)) // 480
        info[:, 2] = 2.0
        path = os.path.join(work, f"img{i:04d}.key")
        write_key_file(path, info, d)
        names.append(path)
    with open(os.path.join(work, "list_keys.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    env = dict(os.environ, LD_LIBRARY_PATH=os.path.join(bindir, "..", "lib"))
    r = subprocess.run(
        [os.path.join(bindir, "KeyMatchFull"),
         os.path.join(work, "list_keys.txt"),
         os.path.join(work, "matches.init.txt")],
        capture_output=True, text=True, env=env)
    out = r.stdout + r.stderr
    m = re.findall(r"Matching took ([0-9.]+)s", out)
    pairs = n_img * (n_img - 1) // 2
    total = sum(float(x) for x in m)
    nmatch = sum(1 for line in open(os.path.join(work, "matches.init.txt"))
                 if " " in line and len(line.split()) == 2) \
        if os.path.exists(os.path.join(work, "matches.init.txt")) else -1
    print(f"n_img={n_img} K={K} pairs={pairs} "
          f"self-reported matching: {total:.2f}s "
          f"-> {pairs/total:.1f} pairs/s (match-table lines: {nmatch})")


if __name__ == "__main__":
    main()
