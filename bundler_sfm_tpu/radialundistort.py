"""RadialUndistort — undistorted images + bundle.rd.out
(reference `src/RadialUndistort.cpp`).

    python -m bundler_sfm_tpu.radialundistort list.txt bundle.out out_dir
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 1
    from bundler_sfm_tpu.export.undistort import radial_undistort
    kept, _ = radial_undistort(argv[0], argv[1], argv[2])
    print(f"[RadialUndistort] wrote {len(kept)} undistorted images to "
          f"{argv[2]}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
