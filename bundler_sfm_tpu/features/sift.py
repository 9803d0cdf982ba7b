"""DoG-SIFT feature extraction as JAX/TPU kernels.

The reference has no in-tree feature extractor — it shells out to Lowe's
`sift` binary per image (`ImageData::ExtractFeatures`, `src/ImageData.cpp:739`,
driven by `bin/ToSift.sh`).  Here the whole detector+descriptor runs on-chip:
Gaussian pyramids are separable convolutions (MXU-friendly), extrema
detection is shift-compare reductions, and orientation/descriptor are
vmapped fixed-size patch kernels — one jit per octave shape.

Algorithm follows Lowe (IJCV 2004): initial 2x upsample, sigma0 = 1.6,
3 scales/octave, contrast threshold 0.04, edge ratio 10, 36-bin orientation
histogram with 0.8-peak multi-orientation, 4x4x8 descriptor with trilinear
binning, 0.2 clamp, 512 scaling to uint8 — matching the key files the
reference's pipeline consumes (`src/keys2a.h:81-89` format).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_SCALES = 3          # s: scales per octave
SIGMA0 = 1.6
INIT_SIGMA = 0.5        # assumed blur of the input image
CONTRAST_THR = 0.04
EDGE_THR = 10.0
ORI_BINS = 36
ORI_PEAK_RATIO = 0.8
DESC_WIDTH = 4          # 4x4 spatial bins
DESC_BINS = 8
DESC_SCL_FCTR = 3.0     # bin width = 3 * sigma
DESC_MAG_THR = 0.2
PATCH = 32              # fixed gradient patch (octave pixels) per keypoint


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, [H,W] float32."""
    radius = max(1, int(np.ceil(3.0 * sigma)))
    k = jnp.asarray(_gauss_kernel1d(sigma, radius))
    pad = radius
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    return x


@functools.partial(jax.jit, static_argnames=("num_scales",))
def build_octave(base: jnp.ndarray, num_scales: int = NUM_SCALES):
    """From an octave's base image (already at sigma0), build the Gaussian
    stack [s+3, H, W], the DoG stack [s+2, H, W], and gradients."""
    k = 2.0 ** (1.0 / num_scales)
    imgs = [base]
    sig_prev = SIGMA0
    for i in range(1, num_scales + 3):
        sig_total = SIGMA0 * (k ** i)
        sig_extra = float(np.sqrt(max(sig_total ** 2 - sig_prev ** 2, 1e-8)))
        imgs.append(_blur(imgs[-1], sig_extra))
        sig_prev = sig_total
    gauss = jnp.stack(imgs)                        # [s+3, H, W]
    dog = gauss[1:] - gauss[:-1]                   # [s+2, H, W]
    dx = jnp.zeros_like(gauss)
    dx = dx.at[:, :, 1:-1].set(0.5 * (gauss[:, :, 2:] - gauss[:, :, :-2]))
    dy = jnp.zeros_like(gauss)
    dy = dy.at[:, 1:-1, :].set(0.5 * (gauss[:, 2:, :] - gauss[:, :-2, :]))
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)
    return gauss, dog, mag, ori


def _neighborhood_extrema(dog: jnp.ndarray,
                          contrast_thr=CONTRAST_THR) -> jnp.ndarray:
    """Bool mask [s, H, W] of 26-neighborhood extrema for the middle scales."""
    s2, H, W = dog.shape
    # 3x3x3 max/min via shifted comparisons.
    def shifts(x):
        outs = []
        for ds in (-1, 0, 1):
            xs = jnp.roll(x, ds, axis=0)
            for dyy in (-1, 0, 1):
                xy = jnp.roll(xs, dyy, axis=1)
                for dxx in (-1, 0, 1):
                    if ds == 0 and dyy == 0 and dxx == 0:
                        continue
                    outs.append(jnp.roll(xy, dxx, axis=2))
        return jnp.stack(outs)
    nb = shifts(dog)                               # [26, s+2, H, W]
    is_max = (dog > nb.max(axis=0))
    is_min = (dog < nb.min(axis=0))
    ext = (is_max | is_min) & (jnp.abs(dog) > 0.5 * contrast_thr / NUM_SCALES)
    ext = ext[1:-1]                                # middle scales only
    # Kill borders (roll wraps around) and a safety margin.
    B = 5
    ext = ext.at[:, :B, :].set(False).at[:, -B:, :].set(False)
    ext = ext.at[:, :, :B].set(False).at[:, :, -B:].set(False)
    return ext


@functools.partial(jax.jit, static_argnames=("max_keys",))
def detect_octave(base: jnp.ndarray, max_keys: int,
                  contrast_thr=CONTRAST_THR, edge_thr=EDGE_THR):
    """Detect + refine keypoints in one octave.

    Returns (xys [K,2] octave coords, scale_sigma [K], scale_idx [K],
    valid [K], response [K], mag, ori stacks) — padded to max_keys.
    contrast_thr/edge_thr are traced (no recompile when tuned).
    """
    gauss, dog, mag, ori = build_octave(base)
    next_base = gauss[NUM_SCALES][::2, ::2]
    ext = _neighborhood_extrema(dog, contrast_thr)  # [s, H, W]
    s, H, W = ext.shape
    score = jnp.where(ext, jnp.abs(dog[1:-1]), 0.0)
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keys)
    valid = vals > 0.0
    si = idx // (H * W)
    rem = idx % (H * W)
    yi = rem // W
    xi = rem % W

    # Sub-pixel refinement: one 3D quadratic step (Lowe iterates; one clamped
    # step captures nearly all of the shift).
    def refine(s_i, y_i, x_i):
        d = jax.lax.dynamic_slice(dog, (s_i, y_i - 1, x_i - 1), (3, 3, 3))
        g = 0.5 * jnp.array([
            d[2, 1, 1] - d[0, 1, 1],
            d[1, 2, 1] - d[1, 0, 1],
            d[1, 1, 2] - d[1, 1, 0]])
        c = d[1, 1, 1]
        dss = d[2, 1, 1] + d[0, 1, 1] - 2 * c
        dyy = d[1, 2, 1] + d[1, 0, 1] - 2 * c
        dxx = d[1, 1, 2] + d[1, 1, 0] - 2 * c
        dsy = 0.25 * (d[2, 2, 1] - d[2, 0, 1] - d[0, 2, 1] + d[0, 0, 1])
        dsx = 0.25 * (d[2, 1, 2] - d[2, 1, 0] - d[0, 1, 2] + d[0, 1, 0])
        dyx = 0.25 * (d[1, 2, 2] - d[1, 2, 0] - d[1, 0, 2] + d[1, 0, 0])
        # Closed-form symmetric 3x3 solve (adjugate/Cramer): XLA:TPU has no
        # f64 batched LU, and a 3x3 LU would be slower than this anyway.
        a, b_, c_ = dss + 1e-12, dsy, dsx
        e_, f_ = dyy + 1e-12, dyx
        i_ = dxx + 1e-12
        A0 = e_ * i_ - f_ * f_
        A1 = c_ * f_ - b_ * i_
        A2 = b_ * f_ - c_ * e_
        det = a * A0 + b_ * A1 + c_ * A2
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        adj = jnp.array([
            [A0, A1, A2],
            [A1, a * i_ - c_ * c_, b_ * c_ - a * f_],
            [A2, b_ * c_ - a * f_, a * e_ - b_ * b_]])
        off = -(adj @ g) / det
        off = jnp.clip(off, -0.5, 0.5)
        contrast = c + 0.5 * jnp.dot(g, off)
        # Edge rejection on the 2x2 spatial Hessian.
        tr = dyy + dxx
        det = dyy * dxx - dyx * dyx
        edge_ok = (det > 0) & (tr * tr / jnp.maximum(det, 1e-12)
                               < (edge_thr + 1) ** 2 / edge_thr)
        ok = (jnp.abs(contrast) > contrast_thr / NUM_SCALES) & edge_ok
        return off, ok

    si1 = si + 1  # index into dog's full scale axis
    offs, oks = jax.vmap(refine)(si1, yi, xi)
    valid = valid & oks
    xs = xi.astype(jnp.float32) + offs[:, 2]
    ys = yi.astype(jnp.float32) + offs[:, 1]
    sig = SIGMA0 * 2.0 ** ((si.astype(jnp.float32) + 1 + offs[:, 0])
                           / NUM_SCALES)
    return xs, ys, sig, si + 1, valid, vals, mag, ori, next_base


def _level_patch(stack: jnp.ndarray, lvl, yi, xi):
    """[L,H,W] stack -> [PATCH,PATCH] patch at level lvl centered (yi, xi).

    Slicing all levels then indexing keeps the per-key gather at
    L·PATCH² elements; indexing stack[lvl] first would gather a full
    [H,W] image PER KEY under vmap (the original 50x slowdown)."""
    half = PATCH // 2
    zero = jnp.zeros_like(yi)
    p = jax.lax.dynamic_slice(
        stack, (zero, yi - half, xi - half),
        (stack.shape[0], PATCH, PATCH))
    return p[lvl]


@functools.partial(jax.jit, static_argnames=())
def orientation_hist(m: jnp.ndarray, o: jnp.ndarray,
                     x: jnp.ndarray, y: jnp.ndarray, sigma: jnp.ndarray):
    """36-bin orientation histogram from a pre-sliced [PATCH,PATCH] patch
    (m, o) centered at the keypoint; window 1.5*sigma."""
    half = PATCH // 2
    ry = jax.lax.broadcasted_iota(jnp.float32, (PATCH, PATCH), 0) - half
    rx = jax.lax.broadcasted_iota(jnp.float32, (PATCH, PATCH), 1) - half
    sig_w = 1.5 * sigma
    w = jnp.exp(-(rx * rx + ry * ry) / (2.0 * sig_w * sig_w))
    w = jnp.where(rx * rx + ry * ry <= (4.5 * sigma) ** 2, w, 0.0)
    binf = (o + jnp.pi) / (2 * jnp.pi) * ORI_BINS
    b0 = jnp.floor(binf).astype(jnp.int32) % ORI_BINS
    # One-hot accumulation instead of scatter-add: vmapped scatters with
    # colliding bins serialize on TPU (this + the descriptor scatter made
    # extract_octave ~6 s/octave on chip).
    onehot = (b0.reshape(-1, 1) == jnp.arange(ORI_BINS)[None, :])
    hist = jnp.sum((m * w).reshape(-1, 1) * onehot, axis=0)
    # Smooth the circular histogram twice.
    for _ in range(2):
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    return hist


def _dominant_orientations(hist: jnp.ndarray):
    """Peak + optional second peak >= 0.8*max, with parabolic refinement.
    Returns (ori0, ori1, has_second)."""
    hmax = jnp.max(hist)
    left = jnp.roll(hist, 1)
    right = jnp.roll(hist, -1)
    is_peak = (hist > left) & (hist > right) & (hist >= ORI_PEAK_RATIO * hmax)
    idx = jnp.argmax(hist)

    def refine_bin(i):
        l = hist[(i - 1) % ORI_BINS]
        c = hist[i]
        r = hist[(i + 1) % ORI_BINS]
        off = 0.5 * (l - r) / jnp.maximum(l - 2 * c + r, 1e-12) * \
            jnp.sign(-(l - 2 * c + r))
        off = jnp.clip(0.5 * (l - r) / jnp.where(
            jnp.abs(l - 2 * c + r) < 1e-12, 1e-12, (l - 2 * c + r)), -0.5, 0.5)
        ang = (i.astype(jnp.float32) + 0.5 + off) / ORI_BINS * 2 * jnp.pi - jnp.pi
        return ang

    ori0 = refine_bin(idx)
    # Second-best peak.
    masked = jnp.where(is_peak, hist, -jnp.inf).at[idx].set(-jnp.inf)
    idx2 = jnp.argmax(masked)
    has2 = jnp.isfinite(masked[idx2])
    ori1 = refine_bin(idx2)
    return ori0, ori1, has2


@functools.partial(jax.jit, static_argnames=())
def descriptor(m, o, fx, fy, sigma, theta):
    """128-d SIFT descriptor from a pre-sliced [PATCH,PATCH] gradient patch
    (m, o); (fx, fy) are the keypoint's sub-pixel offsets from the patch
    center."""
    half = PATCH // 2
    ry = (jax.lax.broadcasted_iota(jnp.float32, (PATCH, PATCH), 0) - half
          - fy)
    rx = (jax.lax.broadcasted_iota(jnp.float32, (PATCH, PATCH), 1) - half
          - fx)
    cos_t = jnp.cos(-theta)
    sin_t = jnp.sin(-theta)
    # Rotate into keypoint frame, in units of descriptor bins.
    bin_w = DESC_SCL_FCTR * sigma
    u = (cos_t * rx - sin_t * ry) / bin_w + DESC_WIDTH / 2 - 0.5
    v = (sin_t * rx + cos_t * ry) / bin_w + DESC_WIDTH / 2 - 0.5
    obin = ((o - theta + 3 * jnp.pi) % (2 * jnp.pi)) / (2 * jnp.pi) * DESC_BINS
    w = jnp.exp(-((u - (DESC_WIDTH / 2 - 0.5)) ** 2 +
                  (v - (DESC_WIDTH / 2 - 0.5)) ** 2) /
                (0.5 * DESC_WIDTH ** 2))
    wm = m * w
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    ob0 = jnp.floor(obin).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    do = obin - ob0
    # Trilinear binning via one-hot accumulation over the 128 bins —
    # scatter-add serializes on TPU under vmap (see orientation_hist).
    idx_all = []
    wt_all = []
    for iu in (0, 1):
        for iv in (0, 1):
            for io in (0, 1):
                uu = u0 + iu
                vv = v0 + iv
                oo = (ob0 + io) % DESC_BINS
                wt = (wm * (du if iu else 1 - du) * (dv if iv else 1 - dv)
                      * (do if io else 1 - do))
                inside = (uu >= 0) & (uu < DESC_WIDTH) & \
                         (vv >= 0) & (vv < DESC_WIDTH)
                wt = jnp.where(inside, wt, 0.0)
                idx = (jnp.clip(vv, 0, DESC_WIDTH - 1) * DESC_WIDTH +
                       jnp.clip(uu, 0, DESC_WIDTH - 1)) * DESC_BINS + oo
                idx_all.append(idx.reshape(-1))
                wt_all.append(wt.reshape(-1))
    idx_flat = jnp.concatenate(idx_all)                  # [8·PATCH²]
    wt_flat = jnp.concatenate(wt_all)
    nbins = DESC_WIDTH * DESC_WIDTH * DESC_BINS
    onehot = (idx_flat[:, None] == jnp.arange(nbins)[None, :])
    d = jnp.sum(wt_flat[:, None] * onehot, axis=0)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    d = jnp.minimum(d, DESC_MAG_THR)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    return jnp.minimum(jnp.round(d * 512.0), 255.0)


@functools.partial(jax.jit, static_argnames=("max_keys",))
def extract_octave(base: jnp.ndarray, max_keys: int,
                   contrast_thr=CONTRAST_THR, edge_thr=EDGE_THR):
    """Full per-octave pipeline: detect, orient, describe.

    Returns (info [K,4] = x, y, sigma, theta in octave coords; desc [K,128];
    valid [K]; next_base — the 2x-downsampled next-octave base, returned here
    so the driver does not re-run the gaussian pyramid just to downsample)
    for up to max_keys keypoints with the dominant orientation plus up to one
    secondary orientation each (packed into 2*max_keys rows).
    """
    xs, ys, sig, lvl, valid, resp, mag, ori, next_base = detect_octave(
        base, max_keys, contrast_thr, edge_thr)
    H, W = base.shape
    # Clamp so the PATCH window stays inside the image.
    margin = PATCH // 2 + 1
    inb = (xs > margin) & (xs < W - margin) & (ys > margin) & (ys < H - margin)
    valid = valid & inb
    xs_c = jnp.clip(xs, margin, W - margin)
    ys_c = jnp.clip(ys, margin, H - margin)

    def per_key(x, y, s, l):
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        m = _level_patch(mag, l, yi, xi)
        o = _level_patch(ori, l, yi, xi)
        hist = orientation_hist(m, o, x, y, s)
        o0, o1, has2 = _dominant_orientations(hist)
        fx = x - xi
        fy = y - yi
        d0 = descriptor(m, o, fx, fy, s, o0)
        d1 = descriptor(m, o, fx, fy, s, o1)
        return o0, o1, has2, d0, d1

    o0, o1, has2, d0, d1 = jax.vmap(per_key)(xs_c, ys_c, sig, lvl)
    info0 = jnp.stack([xs_c, ys_c, sig, o0], axis=1)
    info1 = jnp.stack([xs_c, ys_c, sig, o1], axis=1)
    info = jnp.concatenate([info0, info1])
    desc = jnp.concatenate([d0, d1]).astype(jnp.uint8)
    valid_all = jnp.concatenate([valid, valid & has2])
    return info, desc, valid_all, next_base


def extract_sift(image: np.ndarray, max_keys_total: int = 4096,
                 upsample: bool = True,
                 contrast_thr: float = CONTRAST_THR,
                 edge_thr: float = EDGE_THR
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract SIFT keys from a grayscale image [H, W] (uint8 or float 0-255).

    Returns (info [n,4] = x(col), y(row), scale, orientation in ORIGINAL image
    coords, desc [n,128] uint8) — same contents as a Lowe .key file.
    contrast_thr/edge_thr tune detector sensitivity (Lowe defaults 0.04/10);
    they are traced scalars, so sweeping them does not recompile.
    """
    img = jnp.asarray(image, jnp.float32) / 255.0
    if upsample:
        img = jax.image.resize(img, (img.shape[0] * 2, img.shape[1] * 2),
                               "bilinear")
        first_scale = 0.5
        sig_extra = float(np.sqrt(max(SIGMA0**2 - (2 * INIT_SIGMA)**2, 0.01)))
    else:
        first_scale = 1.0
        sig_extra = float(np.sqrt(max(SIGMA0**2 - INIT_SIGMA**2, 0.01)))
    base = _blur(img, sig_extra)

    infos, descs = [], []
    scale = first_scale
    octave = 0
    while min(base.shape) >= 2 * PATCH and octave < 6:
        k = max(256, max_keys_total // (2 ** octave))
        info, desc, valid, next_base = extract_octave(
            base, k, jnp.float32(contrast_thr), jnp.float32(edge_thr))
        info = np.asarray(info)
        desc = np.asarray(desc)
        valid = np.asarray(valid)
        info = info[valid]
        desc = desc[valid]
        info[:, 0] *= scale
        info[:, 1] *= scale
        info[:, 2] *= scale
        infos.append(info)
        descs.append(desc)
        # Next octave: the 2x-downsampled s-th gaussian level (2x sigma0),
        # computed inside extract_octave's pyramid (no second pyramid pass).
        base = next_base
        scale *= 2.0
        octave += 1

    info = np.concatenate(infos) if infos else np.zeros((0, 4), np.float32)
    desc = np.concatenate(descs) if descs else np.zeros((0, 128), np.uint8)
    if len(info) > max_keys_total:
        # Keep the strongest by scale-spread order: prefer earlier octaves'
        # top responses; here simply truncate deterministically by scale then
        # position to stay reproducible.
        order = np.lexsort((info[:, 1], info[:, 0], info[:, 2]))
        keep = order[:max_keys_total]
        info, desc = info[keep], desc[keep]
    return info.astype(np.float32), desc


@functools.partial(jax.jit, static_argnames=("max_keys",))
def _extract_octave_batch(bases, max_keys, contrast_thr, edge_thr):
    return jax.vmap(
        lambda b: extract_octave(b, max_keys, contrast_thr, edge_thr))(bases)


@functools.partial(jax.jit, static_argnames=("max_keys", "cap"))
def _extract_octave_batch_compact(bases, max_keys, cap, scale,
                                  contrast_thr, edge_thr):
    """extract_octave over a batch + ON-DEVICE compaction of the valid rows.

    The full per-octave output is [B, 2*max_keys] rows at ~25% occupancy
    (round-4 probe_sift.py) and its fetch is what bounds batched SIFT on a
    slow host link.  Valid rows are stable-partitioned to the front (same
    set, same order as the host-side boolean indexing) and only `cap` rows
    ship; `counts` lets the host detect the (never-observed) cap overflow
    and fall back to the full fetch for that octave.  Octave scales are
    powers of two, so folding the coord scale in here is bit-exact vs the
    host multiply.
    """
    def one(b):
        info, desc, valid, next_base = extract_octave(
            b, max_keys, contrast_thr, edge_thr)
        order = jnp.argsort(~valid, stable=True)[:cap]
        inf = info[order]
        inf = inf.at[:, 0:3].multiply(scale)
        return inf, desc[order], jnp.sum(valid), next_base
    return jax.vmap(one)(bases)


@functools.partial(jax.jit, static_argnames=("out_hw", "sig_extra"))
def _prepare_bases(stack, out_hw, sig_extra):
    B = stack.shape[0]
    img = stack.astype(jnp.float32) / 255.0
    if out_hw != stack.shape[1:]:
        img = jax.image.resize(img, (B,) + out_hw, "bilinear")
    return jax.vmap(lambda x: _blur(x, sig_extra))(img)


def extract_sift_batch(images, max_keys_total: int = 4096,
                       upsample: bool = True,
                       contrast_thr: float = CONTRAST_THR,
                       edge_thr: float = EDGE_THR):
    """extract_sift over MANY images in batched device calls.

    Images are grouped by shape; each group runs the whole octave cascade as
    ONE vmapped program per octave (≈12 dispatches per shape group instead of
    ≈12 per image).  On the remote-TPU path dispatch latency dominates SIFT,
    and on local hardware the batch fills the VPU.  Returns a list of
    (info [n,4], desc [n,128]) in input order, matching per-image
    extract_sift up to f32 conv rounding (~1e-4 px).

    On the CPU backend the batch falls back to per-image extraction: the
    batch exists to amortize device dispatches, and XLA:CPU materializes
    the vmapped descriptor one-hots instead of fusing them (measured a
    ~195 GB allocation at 11 images — the TPU backend fuses these).
    """
    import jax
    if jax.default_backend() == "cpu":
        return [extract_sift(np.asarray(im, np.float32), max_keys_total,
                             upsample, contrast_thr, edge_thr)
                for im in images]
    out = [None] * len(images)
    groups = {}
    for i, im in enumerate(images):
        groups.setdefault(tuple(im.shape), []).append(i)
    # Bound batch_size x candidate_budget: the octave extraction peaks at a
    # [B*k, 6, 32, 32] f32 patch tensor, which hit 24 GB (HBM OOM) on a
    # 64-image group at k=4096.  Chunks beyond the first are PADDED to the
    # chunk size by repeating the first image so one compiled shape serves
    # every chunk (remote compiles cost minutes).
    _SIFT_BATCH_KEY_BUDGET = 45056          # = 11 images x 4096 keys
    for shape, all_idxs in groups.items():
        bmax = max(1, _SIFT_BATCH_KEY_BUDGET // max(max_keys_total, 1))
        chunked = len(all_idxs) > bmax
        for c0 in range(0, len(all_idxs), bmax):
            idxs = all_idxs[c0:c0 + bmax]
            n_real = len(idxs)
            if chunked and n_real < bmax:
                idxs = idxs + [idxs[0]] * (bmax - n_real)
            _extract_sift_group(images, idxs, n_real, out, max_keys_total,
                                upsample, contrast_thr, edge_thr, shape)
    return out


def _extract_sift_group(images, idxs, n_real, out, max_keys_total,
                        upsample, contrast_thr, edge_thr, shape):
        stack = np.stack([np.asarray(images[i], np.float32) for i in idxs])
        H, W = shape
        if upsample:
            out_hw = (H * 2, W * 2)
            first_scale = 0.5
            sig_extra = float(np.sqrt(max(SIGMA0**2 - (2 * INIT_SIGMA)**2,
                                          0.01)))
        else:
            out_hw = (H, W)
            first_scale = 1.0
            sig_extra = float(np.sqrt(max(SIGMA0**2 - INIT_SIGMA**2, 0.01)))
        base = _prepare_bases(jnp.asarray(stack), out_hw, sig_extra)

        # Run the whole octave cascade on device, compacting each octave's
        # valid rows (≈25% occupancy) and deferring the host fetch to ONE
        # concatenated transfer per tensor kind — per-array link overhead
        # (~10-25 ms) and the ~75% dead rows bounded batched SIFT through
        # the tunnel (probe_sift.py: fetches were ~2 s of a 6 s chunk).
        octs = []                  # (k, cap, scale, prev_base)
        dev = []                   # (info_c, desc_c, counts)
        scale = first_scale
        octave = 0
        while min(base.shape[1:]) >= 2 * PATCH and octave < 6:
            k = max(256, max_keys_total // (2 ** octave))
            cap = k
            info_c, desc_c, counts, nbase = _extract_octave_batch_compact(
                base, k, cap, jnp.float32(scale),
                jnp.float32(contrast_thr), jnp.float32(edge_thr))
            octs.append((k, cap, scale, base))
            dev.append((info_c, desc_c, counts))
            base = nbase
            scale *= 2.0
            octave += 1

        if not dev:
            # Image too small for even one octave (min dim < 2*PATCH after
            # the optional upsample): no keypoints, like extract_sift's
            # `if infos else` guard on the per-image path.
            for i in idxs[:n_real]:
                out[i] = (np.zeros((0, 4), np.float32),
                          np.zeros((0, 128), np.uint8))
            return

        info_all = np.asarray(jnp.concatenate([d[0] for d in dev], axis=1))
        desc_all = np.asarray(jnp.concatenate([d[1] for d in dev], axis=1))
        counts_all = np.asarray(jnp.stack([d[2] for d in dev]))  # [noct, B]

        per_info = [[] for _ in idxs]
        per_desc = [[] for _ in idxs]
        offs = np.cumsum([0] + [o[1] for o in octs])
        for o, (k, cap, oscale, prev_base) in enumerate(octs):
            if counts_all[o].max() > cap:
                # Cap overflow (>cap of the 2k rows valid — not observed in
                # practice): exact fallback to the full per-octave fetch.
                info, desc, valid, _ = _extract_octave_batch(
                    prev_base, k, jnp.float32(contrast_thr),
                    jnp.float32(edge_thr))
                info = np.asarray(info)
                desc = np.asarray(desc)
                valid = np.asarray(valid)
                for bi in range(len(idxs)):
                    inf = info[bi][valid[bi]]
                    inf[:, 0:3] *= oscale
                    per_info[bi].append(inf)
                    per_desc[bi].append(desc[bi][valid[bi]])
                continue
            s, e = offs[o], offs[o + 1]
            for bi in range(len(idxs)):
                n = int(counts_all[o, bi])
                per_info[bi].append(info_all[bi, s:s + n])
                per_desc[bi].append(desc_all[bi, s:s + n])

        for bi, i in enumerate(idxs[:n_real]):
            info = (np.concatenate(per_info[bi]) if per_info[bi]
                    else np.zeros((0, 4), np.float32))
            desc = (np.concatenate(per_desc[bi]) if per_desc[bi]
                    else np.zeros((0, 128), np.uint8))
            if len(info) > max_keys_total:
                order = np.lexsort((info[:, 1], info[:, 0], info[:, 2]))
                keep = order[:max_keys_total]
                info, desc = info[keep], desc[keep]
            out[i] = (info.astype(np.float32), desc)


def load_grayscale(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as img:
        return np.asarray(img.convert("L"), dtype=np.float32)
