"""`bundle.out` v0.3 reader/writer, bit-compatible with the reference.

Writer semantics from `src/BundleIO.cpp:730-875`; reader from
`src/BundleIO.cpp:417-607`; format documented in the reference README
("Output format").  Layout:

    # Bundle file v0.3
    <num_images> <num_points>
    --- per image (all images, registered or not):
    f k1 k2
    R (3 rows of 3)
    t (1 row of 3)            # t = -R·c  (src/BundleIO.cpp:799-802)
    --- per point:
    x y z
    r g b                     # ints
    num_views  [img key x y]*  # x,y in centered coords (%0.4f)

Unregistered cameras are written as zeros (`src/BundleIO.cpp:779-781`).
Internally our cameras store the camera CENTER c (explicit-camera-centers
convention, `lib/sfm-driver/sfm.c:325-331`); conversion happens here.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class BundleCamera:
    f: float
    k1: float
    k2: float
    R: np.ndarray  # [3,3] world->camera rotation
    t: np.ndarray  # [3]   file-convention translation (= -R·c)

    @property
    def registered(self) -> bool:
        return self.f != 0.0

    @property
    def center(self) -> np.ndarray:
        """Camera center c = -Rᵀ·t (src/Camera.h:66-75)."""
        return -self.R.T @ self.t


@dataclasses.dataclass
class BundlePoint:
    pos: np.ndarray    # [3]
    color: np.ndarray  # [3] uint8-ish ints
    views: np.ndarray  # int/float [v, 4]: (img, key, x, y)


@dataclasses.dataclass
class BundleFile:
    cameras: List[BundleCamera]
    points: List[BundlePoint]

    @property
    def num_registered(self) -> int:
        return sum(1 for c in self.cameras if c.registered)


def read_bundle_file(path: str) -> BundleFile:
    with open(path) as f:
        header = f.readline()
        if not header.startswith("#"):
            raise ValueError(f"missing bundle header in {path}")
        version = header.strip().split("v")[-1]
        if float(version) < 0.3:
            raise ValueError(f"bundle version {version} < 0.3 unsupported")
        tokens = f.read().split()
    pos = 0

    def take(n):
        nonlocal pos
        out = tokens[pos:pos + n]
        pos += n
        return out

    num_images, num_points = int(take(1)[0]), int(take(1)[0])
    cameras = []
    for _ in range(num_images):
        vals = np.array(take(15), dtype=np.float64)
        cameras.append(
            BundleCamera(
                f=float(vals[0]), k1=float(vals[1]), k2=float(vals[2]),
                R=vals[3:12].reshape(3, 3), t=vals[12:15],
            )
        )
    points = []
    for _ in range(num_points):
        xyz = np.array(take(3), dtype=np.float64)
        rgb = np.array(take(3), dtype=np.float64)
        nviews = int(take(1)[0])
        views = np.array(take(4 * nviews), dtype=np.float64).reshape(nviews, 4)
        points.append(BundlePoint(pos=xyz, color=rgb, views=views))
    return BundleFile(cameras=cameras, points=points)


def write_bundle_file(path: str, bundle: BundleFile) -> None:
    with open(path, "w") as f:
        num_visible = sum(1 for p in bundle.points if len(p.views) > 0)
        f.write("# Bundle file v0.3\n")
        f.write(f"{len(bundle.cameras)} {num_visible}\n")
        for cam in bundle.cameras:
            if not cam.registered:
                f.write("0 0 0\n0 0 0\n0 0 0\n0 0 0\n0 0 0\n")
                continue
            f.write(f"{cam.f:0.10e} {cam.k1:0.10e} {cam.k2:0.10e}\n")
            for r in range(3):
                f.write(
                    f"{cam.R[r, 0]:0.10e} {cam.R[r, 1]:0.10e} {cam.R[r, 2]:0.10e}\n"
                )
            f.write(f"{cam.t[0]:0.10e} {cam.t[1]:0.10e} {cam.t[2]:0.10e}\n")
        for p in bundle.points:
            if len(p.views) == 0:
                continue
            f.write(f"{p.pos[0]:0.10e} {p.pos[1]:0.10e} {p.pos[2]:0.10e}\n")
            f.write(f"{int(round(p.color[0]))} {int(round(p.color[1]))} "
                    f"{int(round(p.color[2]))}\n")
            f.write(str(len(p.views)))
            for v in p.views:
                f.write(f" {int(v[0])} {int(v[1])} {v[2]:0.4f} {v[3]:0.4f}")
            f.write("\n")


def camera_from_center(f: float, k1: float, k2: float,
                       R: np.ndarray, center: np.ndarray) -> BundleCamera:
    """Build a file-convention camera from internal (R, camera-center) state."""
    return BundleCamera(f=f, k1=k1, k2=k2, R=np.asarray(R),
                        t=-np.asarray(R) @ np.asarray(center))
