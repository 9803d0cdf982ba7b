"""Fisheye (equiangular) camera model.

Reference `ImageData::DistortPoint` / `UndistortPoint`
(`src/ImageData.cpp:1129-1192`) with parameters (fCx, fCy, fRad, fAngle,
fFocal) from a `fisheye.txt` (`src/FisheyeUndistort.cpp:20-90`):

    undistort: r = |p - c|;  angle = 0.5·fAngle·(r/fRad);
               r' = fFocal·tan(angle);   p' = (p-c)·r'/r        (centered)
    distort:   r = |p|; angle = atan(r/fFocal) [deg];
               r' = fRad·angle/(0.5·fAngle);  p' = p·r'/r + c

COORDINATE CONVENTION: (fCx, fCy) is the fisheye-circle center as an
offset in CENTERED image coordinates (usually ~0), NOT absolute pixels —
the reference applies UndistortPoint to centered keypoints
(`src/ImageData.cpp:1183` on keys centered by ExtractFeatures) and its
undistort tool re-adds 0.5·w/h after DistortPoint
(`src/FisheyeUndistort.cpp:131-139`).

All functions vectorized over [..., 2] point arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FisheyeParams:
    fCx: float = 0.0
    fCy: float = 0.0
    fRad: float = 0.0
    fAngle: float = 0.0
    fFocal: float = 0.0


def read_fisheye_file(path: str) -> FisheyeParams:
    """Parse the reference's fisheye.txt (`ReadFisheyeParameters`)."""
    p = FisheyeParams()
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if toks[0] == "FisheyeCenter:":
                p.fCx, p.fCy = float(toks[1]), float(toks[2])
            elif toks[0] == "FisheyeRadius:":
                p.fRad = float(toks[1])
            elif toks[0] == "FisheyeAngle:":
                p.fAngle = float(toks[1])
            elif toks[0] == "FisheyeFocal:":
                p.fFocal = float(toks[1])
    return p


def undistort_points(xy: jnp.ndarray, p: FisheyeParams) -> jnp.ndarray:
    """Fisheye pixel coords -> rectilinear centered coords
    (`UndistortPoint`, src/ImageData.cpp:1171-1192)."""
    xn = xy[..., 0] - p.fCx
    yn = xy[..., 1] - p.fCy
    r = jnp.sqrt(xn * xn + yn * yn)
    r_safe = jnp.maximum(r, 1e-12)
    angle = 0.5 * p.fAngle * (r / p.fRad)
    rnew = p.fFocal * jnp.tan(jnp.deg2rad(angle))
    scale = rnew / r_safe
    return jnp.stack([xn * scale, yn * scale], axis=-1)


def distort_points(xy: jnp.ndarray, p: FisheyeParams) -> jnp.ndarray:
    """Rectilinear centered coords -> fisheye pixel coords
    (`DistortPoint` with R = I, src/ImageData.cpp:1129-1170)."""
    xn = xy[..., 0]
    yn = xy[..., 1]
    r = jnp.sqrt(xn * xn + yn * yn)
    r_safe = jnp.maximum(r, 1e-12)
    angle = jnp.rad2deg(jnp.arctan(r / p.fFocal))
    rnew = p.fRad * angle / (0.5 * p.fAngle)
    scale = rnew / r_safe
    return jnp.stack([xn * scale + p.fCx, yn * scale + p.fCy], axis=-1)


def undistort_image(img: np.ndarray, p: FisheyeParams) -> np.ndarray:
    """Fisheye image -> rectilinear image (FisheyeUndistort tool,
    `src/FisheyeUndistort.cpp`): for each rectilinear output pixel sample
    the fisheye input at its distorted location (bilinear)."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    # Output grid in centered rectilinear coords; distort (which lands in
    # centered fisheye coords offset by fCx/fCy), then back to pixels —
    # the 0.5·w/h re-add of `src/FisheyeUndistort.cpp:131-139`.
    cx = xs - 0.5 * w
    cy = ys - 0.5 * h
    src = np.asarray(distort_points(
        jnp.asarray(np.stack([cx, cy], axis=-1)), p))
    xsrc = src[..., 0] + 0.5 * w
    ysrc = src[..., 1] + 0.5 * h
    inside = (xsrc >= 0) & (xsrc < w - 1) & (ysrc >= 0) & (ysrc < h - 1)
    x0 = np.clip(np.floor(xsrc).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(ysrc).astype(int), 0, h - 2)
    fx = (xsrc - x0)[..., None]
    fy = (ysrc - y0)[..., None]
    im = img.astype(np.float64)
    if im.ndim == 2:
        im = im[..., None]
        squeeze = True
    else:
        squeeze = False
    out = ((1 - fy) * ((1 - fx) * im[y0, x0] + fx * im[y0, x0 + 1]) +
           fy * ((1 - fx) * im[y0 + 1, x0] + fx * im[y0 + 1, x0 + 1]))
    out[~inside] = 0.0
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out
