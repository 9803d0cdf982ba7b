"""FisheyeUndistort — fisheye images -> rectilinear
(reference `src/FisheyeUndistort.cpp`).

    python -m bundler_sfm_tpu.fisheyeundistort list.txt fisheye.txt out_dir
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 1
    list_file, params_file, out_dir = argv[0], argv[1], argv[2]
    from PIL import Image
    import numpy as np
    from bundler_sfm_tpu.io.listfile import read_list_file
    from bundler_sfm_tpu.ops.fisheye import read_fisheye_file, undistort_image

    params = read_fisheye_file(params_file)
    entries = read_list_file(list_file)
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for e in entries:
        try:
            with Image.open(e.name) as im:
                arr = np.asarray(im.convert("RGB"))
        except FileNotFoundError:
            continue
        und = undistort_image(arr, params)
        base = os.path.splitext(os.path.basename(e.name))[0]
        Image.fromarray(und).save(os.path.join(out_dir, base + ".fd.jpg"),
                                  quality=95)
        count += 1
    print(f"[FisheyeUndistort] wrote {count} images to {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
