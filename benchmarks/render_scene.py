"""Render a real-pixel multi-view collection with known ground truth.

A textured "box room": floor + four walls, each textured with real
photographs (the reference's example JPEGs tiled into texture sheets),
viewed by N cameras on an interior orbit.  Every view is rendered by
per-plane homography warps (PIL PERSPECTIVE, bilinear), composited
nearest-plane-first — real pixels in, so SIFT detection/description runs
inside the timed path of the race (`RunBundler.sh:98-104` runs per-image
sift processes there; we race keys/s against wall-clock).

Non-degenerate for SfM: five planes in general position (no global
homography), wide triangulation baselines, full loop closure around the
orbit.

Usage:
    python benchmarks/render_scene.py OUTDIR [num_images] [W] [H]

Writes img%04d.jpg + gt.json ({centers, Rs, focal}).
"""

import json
import os
import sys

import numpy as np
from PIL import Image

KERMIT = "/root/reference/examples/kermit"
ET = "/root/reference/examples/ET"


def _texture_sheet(paths, size, rng):
    """Tile real photos into one sheet — every tile a DISTINCT random
    crop (random scale/position/orientation + a random tint) so repeated
    texture cannot manufacture false matches between non-overlapping
    views (the Lowe ratio test only rejects ambiguity it can see; two
    identical full-size crops on different walls produced hundreds of
    bogus 'matches' between opposite-facing cameras)."""
    sheet = Image.new("RGB", (size, size))
    tile = size // 4
    imgs = [Image.open(p).convert("RGB") for p in paths]
    for ty in range(0, size, tile):
        for tx in range(0, size, tile):
            im = imgs[rng.integers(len(imgs))]
            w, h = im.size
            s = int(min(w, h) * rng.uniform(0.3, 0.9))
            x0 = int(rng.integers(0, w - s + 1))
            y0 = int(rng.integers(0, h - s + 1))
            crop = im.crop((x0, y0, x0 + s, y0 + s)).resize((tile, tile))
            if rng.random() < 0.5:
                crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
            crop = crop.rotate(90 * int(rng.integers(4)))
            arr = np.asarray(crop).astype(np.int16)
            tint = rng.integers(-35, 36, 3)
            arr = np.clip(arr + tint[None, None, :], 0, 255)
            sheet.paste(Image.fromarray(arr.astype(np.uint8)), (tx, ty))
    return sheet


def _plane_corners():
    """Five planes of a 10x6x10 box room (y up), corners CCW.

    Returns list of [4,3] world corners; texture (u,v) in [0,1]^2 maps
    corner order (0,0),(1,0),(1,1),(0,1)."""
    X, Y, Z = 5.0, 3.0, 5.0
    return [
        np.array([[-X, -Y, -Z], [X, -Y, -Z], [X, -Y, Z], [-X, -Y, Z]]),  # floor
        np.array([[-X, -Y, -Z], [X, -Y, -Z], [X, Y, -Z], [-X, Y, -Z]]),  # wall -z
        np.array([[X, -Y, -Z], [X, -Y, Z], [X, Y, Z], [X, Y, -Z]]),      # wall +x
        np.array([[X, -Y, Z], [-X, -Y, Z], [-X, Y, Z], [X, Y, Z]]),      # wall +z
        np.array([[-X, -Y, Z], [-X, -Y, -Z], [-X, Y, -Z], [-X, Y, Z]]),  # wall -x
        np.array([[-X, Y, -Z], [X, Y, -Z], [X, Y, Z], [-X, Y, Z]]),      # ceiling
    ]


def _camera(i, n):
    """Orbit inside the room: position on a small circle, yaw sweeping 360
    degrees plus a slight pitch wobble — consecutive views overlap ~80%,
    and the orbit closes the loop."""
    a = 2.0 * np.pi * i / n
    c = np.array([1.8 * np.sin(a), 0.6 + 0.3 * np.sin(2 * a),
                  1.8 * np.cos(a)])
    yaw = a + 0.35 * np.sin(3 * a)
    # Constant downward pitch keeps the floor in frame, so most views mix
    # two-three planes — single-plane frames would make consecutive pairs
    # homography-degenerate for F estimation.
    pitch = -0.35 + 0.15 * np.sin(2 * a + 1.0)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    # R world->cam with the bundler convention: camera looks along -z_cam.
    R_yaw = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
    R_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return (R_pitch @ R_yaw), c


def render_view(R, c, f, W, H, planes, sheets):
    """Composite the planes for one camera by inverse homography warps."""
    half_w, half_h = (W - 1) / 2.0, (H - 1) / 2.0
    canvas = Image.new("RGB", (W, H))
    # Paint farthest plane first: sort by distance of plane center.
    order = np.argsort([-np.linalg.norm(p.mean(0) - c) for p in planes])
    for k in order:
        corners = planes[k]
        pc = (corners - c) @ R.T                  # [4,3] camera coords
        if np.all(pc[:, 2] > -0.05):
            continue                              # fully behind
        # Project (bundler convention: image = -f*xy/z, y up, origin center)
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = -f * pc[:, :2] / pc[:, 2:3]
        col = uv[:, 0] + half_w
        row = (H - 1) - (uv[:, 1] + half_h)
        if not np.isfinite(col).all():
            continue
        # PIL PERSPECTIVE maps OUTPUT (x,y) -> SOURCE via coeffs; solve the
        # texture->image homography then invert.
        ts = sheets[k].size[0]
        src = np.array([[0, 0], [ts - 1, 0], [ts - 1, ts - 1], [0, ts - 1]],
                       float)
        dst = np.stack([col, row], 1)
        A = []
        b = []
        for (sx, sy), (dx, dy) in zip(src, dst):
            A.append([sx, sy, 1, 0, 0, 0, -dx * sx, -dx * sy])
            b.append(dx)
            A.append([0, 0, 0, sx, sy, 1, -dy * sx, -dy * sy])
            b.append(dy)
        try:
            hcoef = np.linalg.solve(np.array(A), np.array(b))
        except np.linalg.LinAlgError:
            continue
        Hm = np.append(hcoef, 1.0).reshape(3, 3)
        try:
            Hinv = np.linalg.inv(Hm)
        except np.linalg.LinAlgError:
            continue
        Hinv = Hinv / Hinv[2, 2]
        warped = sheets[k].transform(
            (W, H), Image.PERSPECTIVE, tuple(Hinv.flatten()[:8]),
            resample=Image.BILINEAR)
        # Mask: pixels whose inverse-mapped source lies inside the sheet AND
        # whose 3D ray hits the plane in front of the camera.
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        ones = np.ones_like(xs, float)
        pts = np.stack([xs, ys, ones], -1) @ Hinv.T
        with np.errstate(divide="ignore", invalid="ignore"):
            sxm = pts[..., 0] / pts[..., 2]
            sym = pts[..., 1] / pts[..., 2]
        inside = ((sxm >= 0) & (sxm <= ts - 1) & (sym >= 0)
                  & (sym <= ts - 1) & np.isfinite(sxm) & np.isfinite(sym))
        # Front-of-camera check per pixel: ray through pixel hits plane at
        # negative camera z.  Plane: point p0, normal nvec.
        p0 = corners[0]
        nvec = np.cross(corners[1] - corners[0], corners[3] - corners[0])
        ray_img = np.stack([xs - half_w, (H - 1 - ys) - half_h,
                            -f * ones], -1)      # centered, y up, -z forward
        ray_w = ray_img @ R                      # R^T rows -> world dirs
        denom = ray_w @ nvec
        tnum = (p0 - c) @ nvec
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = tnum / denom
        # tt scales the UNNORMALIZED (pixel-unit, |ray| ~ f) ray, so the
        # world hit distance is ~tt*f; require it meaningfully positive.
        front = (tt * f > 0.05) & np.isfinite(tt)
        mask = Image.fromarray(((inside & front) * 255).astype(np.uint8))
        canvas.paste(warped, (0, 0), mask)
    return canvas


def main():
    outdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 600
    f = 700.0
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = sorted(os.path.join(KERMIT, p) for p in os.listdir(KERMIT)
                   if p.endswith(".jpg"))
    paths += sorted(os.path.join(ET, p) for p in os.listdir(ET)
                    if p.endswith(".jpg"))
    planes = _plane_corners()
    sheets = [_texture_sheet(paths, 1024, rng) for _ in planes]
    centers, Rs = [], []
    for i in range(n):
        R, c = _camera(i, n)
        img = render_view(R, c, f, W, H, planes, sheets)
        img.save(os.path.join(outdir, f"img{i:04d}.jpg"), quality=92)
        centers.append(c.tolist())
        Rs.append(R.tolist())
        if (i + 1) % 16 == 0:
            print(f"rendered {i + 1}/{n}", flush=True)
    with open(os.path.join(outdir, "gt.json"), "w") as fo:
        json.dump({"centers": centers, "Rs": Rs, "focal": f,
                   "W": W, "H": H}, fo)
    print(f"wrote {n} views to {outdir}")


if __name__ == "__main__":
    main()
