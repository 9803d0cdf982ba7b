"""Bundle adjustment — Schur-complement Levenberg-Marquardt, TPU-native.

The replacement for the reference's SBA stack (`lib/sba-1.5/sba_levmar.c:457`
`sba_motstr_levmar_x` as driven by `run_sfm`, `lib/sfm-driver/sfm.c:592-1004`),
re-designed for XLA:

- residuals: the Snavely model (`include/snavely_reprojection_error.h:53-96`)
  over an observation-major layout (obs_cam, obs_pt, obs_xy), with autodiff
  per-observation Jacobian blocks A [O,2,9] / B [O,2,3] (strictly better
  than SBA's finite differences, `sba_levmar.c:336`).
- normal equations: U_j = Σ AᵀA, V_i = Σ BᵀB, W_o = AᵀB via segment_sum —
  the same U/V/W blocks SBA builds (`sba_levmar.c:1191-1324`).
- Schur: Y_o = W_o V⁻¹ (vmapped 3x3 inverses); the reduced camera system
  S = U − Σ_i Σ_{a,b∈views(i)} Y_a W_bᵀ is scatter-assembled from a padded
  per-point view table, then Cholesky-solved as one dense [9C, 9C] system
  (`sba_Axb_Chol`, `sba_levmar.c:1368`); points back-substituted
  (`sba_levmar.c:3073-3076`).
- LM loop: lax.while_loop with additive damping on the augmented normal
  equations, mu0 = tau·max(diag) with tau = opts[0] = 1e-3 (`sfm.c:705`)
  and Nielsen's mu update (SBA v1.2+ strategy).

Parameterization per run (`sfm.c:651-703`): camera = [c(3), w(3), f, k1, k2]
with R = exp([w]x)·R0 and w starting at 0; `finalize` folds w back into R
exactly like run_sfm's epilogue (`sfm.c:876-929`).

Masking: `cam_mask` zeroes Jacobian columns of frozen parameters (fixed
focal, no distortion, held cameras — SBA's ncons); their Schur diagonal is
identity-padded so the solve stays PD.  fix_points=True gives motion-only
(sba_mot_levmar); cam_mask all-zero gives structure-only.

Sharding: every per-observation quantity shards over observations; S, g_c
are psum-reduced across shards — see parallel/ba_sharded.py.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bundler_sfm_tpu.ops.rotations import rot_update

CNP = 9  # camera params: c(3) w(3) f k1 k2
PNP = 3

# Parameter scaling (run_sfm packs f·0.001 and k·5.0, sfm.c:634-635): the LM
# damps mu*I in the SCALED space q = s∘x, which balances the focal/distortion
# columns of JᵀJ against the pose columns.  Without it the focal diagonal
# (~|n|² per obs) is ~1e6 smaller than the center diagonal (~f²/z² per obs),
# so mu — set from the max diagonal — freezes f entirely in f32.
F_SCALE = 0.001
K_SCALE = 5.0


def _robust_weight(s, loss: str, b):
    """IRLS weight rho'(s) for a squared-norm residual block s = |r|^2.

    loss="l2" -> 1; loss="huber" -> Ceres HuberLoss(a) with b = a^2
    (src/BundleCeres.cpp:124-125 HUBER_PARAM=25.0, :285 HuberLoss):
    rho(s) = s if s <= b else 2*sqrt(b*s) - b, so rho'(s) = min(1, sqrt(b/s)).
    """
    if loss == "l2":
        return jnp.ones_like(s)
    s_safe = jnp.maximum(s, 1e-30)
    return jnp.minimum(1.0, jnp.sqrt(b / s_safe))


def _robust_rho(s, loss: str, b):
    if loss == "l2":
        return s
    s_safe = jnp.maximum(s, 1e-30)
    return jnp.where(s <= b, s, 2.0 * jnp.sqrt(b * s_safe) - b)


def _robust_curvature(s, loss: str, b):
    """rho''(s).  Huber: 0 in the inlier region, −½·√b·s^(−3/2) beyond —
    non-positive everywhere, which is what makes the Triggs correction's
    alpha term vanish for Huber (see build_normal_blocks)."""
    if loss == "l2":
        return jnp.zeros_like(s)
    s_safe = jnp.maximum(s, 1e-30)
    return jnp.where(s <= b, 0.0, -0.5 * jnp.sqrt(b) * s_safe ** -1.5)


_BA_DATA_FIELDS = (
    "R0", "cam0", "cam_mask", "cam_constrained", "cam_constraints",
    "cam_weights", "pts0", "pt_constrained", "pt_constraints", "pt_weight",
    "obs_cam", "obs_pt", "obs_xy", "obs_valid", "views_obs", "views_mask",
    "cam_scale", "schur_win")


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=list(_BA_DATA_FIELDS),
                   meta_fields=["buckets"])
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Padded, static-shape bundle-adjustment problem.

    OBSERVATION ARRAYS ARE IN SLOT LAYOUT, NOT INPUT ORDER: build_problem
    stores the observation of point p's k-th view at flat row p*M + k
    (O = Pp*M total rows, padding rows invalid).  Use ba.slot_ids() to map
    between a caller's flat observation order and these rows.

    VIEW-BUCKETED LAYOUT (`buckets` set): points are laid out in
    view-count buckets — bucket b covers the next P_b point rows, each
    with its OWN slot width M_b, and its observation rows are the next
    P_b*M_b flat rows.  O = Σ_b P_b*M_b, views_obs/views_mask are FLAT
    [O] (not [P,M]).  This removes the slot-padding tax of a single
    M = max-track-length at realistic mixed track densities (the regime
    where SBA's CRS stores exactly the real observations,
    lib/sba-1.5/sba_levmar.c:1191-1324).  `buckets` is static pytree
    metadata, so jit/shard_map specialize on the layout automatically.
    Use ba.slot_ids_bucketed() to map a caller's flat observation order
    to these rows."""
    R0: jnp.ndarray               # [C,3,3] base rotations
    cam0: jnp.ndarray             # [C,9] initial params (c, w=0, f, k1, k2)
    cam_mask: jnp.ndarray         # [C,9] 1.0 = free, 0.0 = frozen
    cam_constrained: jnp.ndarray  # [C,9] 1.0 where constraint active
    cam_constraints: jnp.ndarray  # [C,9] target values
    cam_weights: jnp.ndarray      # [C,9] constraint weights
    pts0: jnp.ndarray             # [P,3]
    pt_constrained: jnp.ndarray   # [P] 1.0 where constrained
    pt_constraints: jnp.ndarray   # [P,3]
    pt_weight: jnp.ndarray        # scalar point-constraint weight
    obs_cam: jnp.ndarray          # [O] int32, SLOT layout (pad -> cam 0)
    obs_pt: jnp.ndarray           # [O] int32 point row of each slot
    obs_xy: jnp.ndarray           # [O,2] SLOT layout
    obs_valid: jnp.ndarray        # [O] bool (False on padding slots)
    views_obs: jnp.ndarray        # [P,M] int32 obs index per point view
    # (pad 0); FLAT [O] when buckets is set
    views_mask: jnp.ndarray       # [P,M] bool; FLAT [O] when buckets is set
    cam_scale: jnp.ndarray        # [9] per-param scale s (LM solves q = s∘x)
    schur_win: Optional[jnp.ndarray] = None  # [nwin] int32 window starts for
    # the covisibility-windowed Schur assembly (None = full-C assembly);
    # group g = points [g*group_pts, (g+1)*group_pts), see assemble_schur_off
    buckets: Optional[Tuple[Tuple[int, int], ...]] = None  # STATIC
    # ((P_b, M_b), ...) view-count bucket layout; None = single [Pp, M]

    # NamedTuple-compat surface (callers construct/replace by field name).
    _fields = _BA_DATA_FIELDS

    def _replace(self, **kw) -> "BAProblem":
        return dataclasses.replace(self, **kw)


def _sections(prob: BAProblem):
    """The slot layout as a list of (pt_lo, row_lo, P_b, M_b) sections —
    one per view bucket, or a single section for the classic [Pp, M]
    layout."""
    if prob.buckets is None:
        Pp, M = prob.views_mask.shape
        return [(0, 0, Pp, M)]
    out = []
    pt = row = 0
    for (Pb, Mb) in prob.buckets:
        out.append((pt, row, Pb, Mb))
        pt += Pb
        row += Pb * Mb
    return out


class BAResult(NamedTuple):
    cam: jnp.ndarray              # [C,9] final params (w folded to 0)
    R: jnp.ndarray                # [C,3,3] final rotations
    pts: jnp.ndarray              # [P,3]
    cost: jnp.ndarray             # final 0.5·Σr²
    initial_cost: jnp.ndarray
    iters: jnp.ndarray
    mu: jnp.ndarray


# --------------------------------------------------------------------------
# Problem construction (host side)
# --------------------------------------------------------------------------

def _slot_within(obs_pt: np.ndarray) -> np.ndarray:
    """k-th observation of its point, in input order (host, vectorized)."""
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    order = np.argsort(obs_pt, kind="stable")
    sorted_pt = obs_pt[order]
    counts = np.bincount(sorted_pt) if len(sorted_pt) else np.zeros(0, int)
    start = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if len(counts) else np.zeros(0, int)
    within = np.arange(len(obs_pt)) - start[sorted_pt] \
        if len(obs_pt) else np.zeros(0, int)
    out = np.empty(len(obs_pt), dtype=np.int64)
    out[order] = within
    return out


def slot_ids(obs_pt: np.ndarray, max_views: int) -> np.ndarray:
    """Flat slot-layout row of each observation: p·M + within-point index —
    the layout build_problem stores obs arrays in.  Use to map flat
    observation results (e.g. BAOutlierResult.obs_valid) back to the
    caller's original observation order."""
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    return obs_pt * max_views + _slot_within(obs_pt)


def slot_ids_bucketed(obs_pt: np.ndarray,
                      buckets: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """Flat slot-layout row of each observation under a view-bucket layout
    (point rows bucket-ordered, bucket b = next P_b rows at width M_b):
    row_lo[b] + (p − pt_lo[b])·M_b + within-point index."""
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    pt_lo = np.cumsum([0] + [Pb for Pb, _ in buckets])
    row_lo = np.cumsum([0] + [Pb * Mb for Pb, Mb in buckets])
    widths = np.array([Mb for _, Mb in buckets], np.int64)
    b = np.searchsorted(pt_lo[1:], obs_pt, side="right")
    return (row_lo[b] + (obs_pt - pt_lo[b]) * widths[b]
            + _slot_within(obs_pt))


def _quant_rows(n: int, lo: int = 256) -> int:
    """Quantize a bucket's point-row count to the 1.5-step grid
    {lo·2^k} ∪ {1.5·lo·2^k}: ≤33% padding, ~2 shapes per octave — the
    compromise between padded-slot waste and per-shape compile/load cost
    through the remote backend (power-of-2 wastes up to 2×; linear steps
    recompile too often across registration rounds)."""
    g = lo
    while True:
        if n <= g:
            return g
        if n <= (3 * g) // 2:
            return (3 * g) // 2
        g *= 2


def _fit_prev_buckets(counts, prev):
    """Try assigning current per-point view counts into a previous round's
    bucket structure (same first-bucket-with-width>=count interval rule).
    Returns (row_of, total_slots) or None on any overflow."""
    widths = np.array([mb for _, mb in prev], np.int64)
    if int(counts.max()) > widths[-1]:
        return None
    bucket_of = np.searchsorted(widths, counts, side="left")
    sizes = np.bincount(bucket_of, minlength=len(prev))
    if np.any(sizes > np.array([pb for pb, _ in prev])):
        return None
    n = len(counts)
    pt_lo = np.cumsum([0] + [pb for pb, _ in prev])
    order = np.argsort(bucket_of, kind="stable")
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    row_of = np.empty(n, np.int64)
    row_of[order] = pt_lo[bucket_of[order]] + (np.arange(n)
                                               - off[bucket_of[order]])
    return row_of.astype(np.int32), sum(pb * mb for pb, mb in prev)


def plan_view_buckets(obs_pt, num_points: int,
                      max_buckets: int = 4,
                      min_total_obs: int = 1 << 15,
                      win_factor: float = 1.3,
                      prev: Optional[Tuple[Tuple[int, int], ...]] = None):
    """Host-side plan for the view-count-bucketed slot layout.

    The single-M slot layout pads every point to the longest track
    (`M = max views`), so at realistic mixed track densities (mean ~5-6
    views, max 20-30) only ~20% of slots are real and the whole LM
    iteration pays 5× padded work — the regime where the reference's CRS
    stores exactly the real observations (sba_levmar.c:1191-1324).
    Partition points into ≤ `max_buckets` view-count buckets with widths
    from {4, 8, 16, ...}: within a bucket occupancy is ≥ 50%, and all the
    slot layout's reshape/broadcast properties hold per bucket — still no
    gathers or scatters anywhere in the iteration.

    Returns (row_of [num_points] int32 — the bucket-ordered point row of
    each input point — , buckets ((P_b, M_b), ...) with P_b quantized,
    n_rows = Σ P_b) or None when not worth it (small problems, or the
    single layout is within `win_factor` of the bucketed slot count)."""
    obs_pt = np.asarray(obs_pt)
    O = len(obs_pt)
    if O < min_total_obs or num_points == 0:
        return None
    counts = np.bincount(obs_pt, minlength=num_points)
    Mmax = int(counts.max())
    if Mmax <= 4:
        return None

    # STICKY plans: an incremental run re-enters BA every registration
    # round with slightly more points; a fresh quantization each round
    # makes every round a DISTINCT static shape, and on the remote backend
    # each shape pays a per-process program load that dwarfs the kernel
    # (round-5 from-pixels: 17 bucket shapes ≈ +60 s).  If the previous
    # round's bucket structure still fits (same interval assignment, no
    # bucket overflow, padding waste below ~1.6× of a fresh plan), reuse
    # it verbatim — the compiled program is reused too.
    if prev is not None:
        fit = _fit_prev_buckets(counts, prev)
        if fit is not None:
            row_of, slots_prev = fit
            fresh = plan_view_buckets(obs_pt, num_points, max_buckets,
                                      min_total_obs, win_factor, prev=None)
            fresh_slots = (sum(pb * mb for pb, mb in fresh[1])
                           if fresh is not None else slots_prev)
            if slots_prev <= 1.6 * fresh_slots:
                return row_of, prev, sum(pb for pb, _ in prev)
    widths = [4]
    while widths[-1] < Mmax:
        widths.append(widths[-1] * 2)
    Mtop = widths[-1]
    # Points per width bin (width w holds counts in (prev_w, w]).
    nbin = [int(np.sum((counts > (0 if i == 0 else widths[i - 1]))
                       & (counts <= w))) for i, w in enumerate(widths)]

    # Growth headroom: pad each bucket for ~20% more points than it holds
    # now, so an incremental run's next rounds keep fitting the SAME plan
    # (sticky reuse above) instead of re-planning — and recompiling —
    # every round.
    def qrows(n):
        return _quant_rows(int(n * 1.2) + 1)

    def cost(subset):
        # subset: ascending widths ending at Mtop; cost = padded slots.
        total = 0
        lo_i = 0
        for w in subset:
            hi_i = widths.index(w) + 1
            n = sum(nbin[lo_i:hi_i])
            lo_i = hi_i
            if n:
                total += qrows(n) * w
        return total

    import itertools
    best, best_sub = None, None
    inner = widths[:-1]
    for r in range(0, min(max_buckets, len(widths))):
        for combo in itertools.combinations(inner, r):
            sub = list(combo) + [Mtop]
            c = cost(sub)
            if best is None or c < best:
                best, best_sub = c, sub
    # The single-layout shapes the caller would otherwise build
    # (pad_pts bucketed at 256, M at the power-of-2 bucket).
    single = _quant_rows(num_points) * Mtop
    if single <= win_factor * best:
        return None

    # Materialize the winning buckets (drop empty bins).
    bucket_of = np.zeros(num_points, np.int64)
    buckets = []
    lo_i = 0
    for w in best_sub:
        hi_i = widths.index(w) + 1
        sel = ((counts > (0 if lo_i == 0 else widths[lo_i - 1]))
               & (counts <= w))
        lo_i = hi_i
        n = int(sel.sum())
        if n == 0:
            continue
        bucket_of[sel] = len(buckets)
        buckets.append((qrows(n), int(w)))
    # Stable order by bucket: row_of[p] = bucket-ordered padded row.
    order = np.argsort(bucket_of, kind="stable")
    pt_lo = np.cumsum([0] + [b[0] for b in buckets])
    row_of = np.empty(num_points, np.int64)
    # Within bucket k, points keep input order at rows pt_lo[k]...
    sizes = np.bincount(bucket_of, minlength=len(buckets))
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    within = np.arange(num_points) - off[bucket_of[order]]
    row_of[order] = pt_lo[bucket_of[order]] + within
    n_rows = int(pt_lo[-1])
    return row_of.astype(np.int32), tuple(buckets), n_rows


def build_problem(
    R0: np.ndarray, cam0: np.ndarray,
    pts0: np.ndarray,
    obs_cam: np.ndarray, obs_pt: np.ndarray, obs_xy: np.ndarray,
    *,
    est_focal: bool = True,
    est_distortion: bool = True,
    fixed_cameras: Optional[np.ndarray] = None,   # [C] bool, SBA's ncons
    cam_constrained: Optional[np.ndarray] = None,
    cam_constraints: Optional[np.ndarray] = None,
    cam_weights: Optional[np.ndarray] = None,
    pt_constrained: Optional[np.ndarray] = None,
    pt_constraints: Optional[np.ndarray] = None,
    pt_weight: float = 0.0,
    pad_cams: Optional[int] = None,
    pad_pts: Optional[int] = None,
    pad_obs: Optional[int] = None,
    max_views: Optional[int] = None,
    param_scale: Optional[np.ndarray] = None,  # [9]; default f/k scaling
    schur_win: Optional[np.ndarray] = None,    # [nwin] window starts
    view_buckets: Optional[Tuple[Tuple[int, int], ...]] = None,
    dtype=np.float64,
) -> BAProblem:
    """Pad + mask a host-side problem into a static-shape BAProblem.

    Observations are stored in SLOT LAYOUT [Pp·M] (see below), NOT in the
    caller's input order — map flat results back with slot_ids().  `pad_obs`
    is accepted for backward compatibility but ignored — the observation
    padding is implied by (pad_pts, max_views)."""
    if pad_obs is not None:
        import warnings
        warnings.warn(
            "build_problem ignores pad_obs: observations are stored in "
            "slot layout [pad_pts*max_views], reordered from input order "
            "(use ba.slot_ids() to map back)", DeprecationWarning,
            stacklevel=2)
    C, P, O = len(cam0), len(pts0), len(obs_cam)
    Cp = pad_cams or C
    if view_buckets is not None:
        if schur_win is not None:
            raise ValueError("view_buckets and schur_win are exclusive "
                             "(bucketing reorders points by view count, "
                             "windowing by camera span)")
        Pp = sum(Pb for Pb, _ in view_buckets)
    else:
        Pp = pad_pts or P
    assert Cp >= C and Pp >= P

    def padc(x, n, shape_tail=()):
        out = np.zeros((n,) + shape_tail, dtype=dtype)
        out[:len(x)] = x
        return out

    R0p = padc(R0, Cp, (3, 3))
    R0p[C:] = np.eye(3)
    cam0p = padc(cam0, Cp, (CNP,))
    cam0p[C:, 6] = 1.0  # harmless focal for padding cameras

    mask = np.ones((Cp, CNP), dtype=dtype)
    if not est_focal:
        mask[:, 6] = 0.0
    if not est_distortion:
        mask[:, 7:9] = 0.0
    if fixed_cameras is not None:
        mask[:C][np.asarray(fixed_cameras, bool)] = 0.0
    mask[C:] = 0.0

    cc = padc(cam_constrained if cam_constrained is not None
              else np.zeros((C, CNP)), Cp, (CNP,))
    ct = padc(cam_constraints if cam_constraints is not None
              else np.zeros((C, CNP)), Cp, (CNP,))
    cw = padc(cam_weights if cam_weights is not None
              else np.zeros((C, CNP)), Cp, (CNP,))

    pts0p = padc(pts0, Pp, (3,))
    pc = padc(pt_constrained if pt_constrained is not None
              else np.zeros(P), Pp)
    pt = padc(pt_constraints if pt_constraints is not None
              else np.zeros((P, 3)), Pp, (3,))

    # SLOT LAYOUT: observation o of point p lives at flat row p·M + k
    # (k = running index within the point's views), padded rows invalid.
    # Every [O]->[P,M] regrouping in the LM iteration is then a free
    # reshape and every [P]->[O] expansion a broadcast — the TPU gathers
    # (~10-40 M rows/s) that dominated the flat-layout iteration at
    # O ≈ 10^5-10^6 disappear entirely.  O_pad = Pp·M; real-vs-padded obs
    # are tracked by obs_valid (which the fused outlier loop also uses for
    # removals; views_mask keeps the static real-slot set).
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    counts = np.bincount(obs_pt, minlength=Pp) if O else np.zeros(Pp, int)
    if view_buckets is not None:
        # Bucket-ordered layout: validate each point's view count against
        # its bucket's width.
        pt_lo = np.cumsum([0] + [Pb for Pb, _ in view_buckets])
        for k, (Pb, Mb) in enumerate(view_buckets):
            cmax = counts[pt_lo[k]:pt_lo[k + 1]].max() \
                if pt_lo[k] < min(len(counts), pt_lo[k + 1]) else 0
            if cmax > Mb:
                raise ValueError(
                    f"bucket {k}: point has {cmax} views > width {Mb}")
        sid = slot_ids_bucketed(obs_pt, view_buckets) if O else \
            np.zeros(0, dtype=np.int64)
        Op = sum(Pb * Mb for Pb, Mb in view_buckets)
        opt = np.concatenate([
            np.repeat(np.arange(pt_lo[k], pt_lo[k + 1], dtype=np.int32),
                      Mb)
            for k, (Pb, Mb) in enumerate(view_buckets)]) if Op else \
            np.zeros(0, np.int32)
    else:
        M = max_views or max(1, int(counts.max()) if O else 1)
        if O and counts.max() > M:
            raise ValueError(
                f"point has {counts.max()} views > max_views={M}")
        sid = obs_pt * M + _slot_within(obs_pt) if O else \
            np.zeros(0, dtype=np.int64)
        Op = Pp * M
        opt = np.repeat(np.arange(Pp, dtype=np.int32), M)
    ocam = np.zeros(Op, dtype=np.int32)
    ocam[sid] = obs_cam
    oxy = np.zeros((Op, 2), dtype=dtype)
    oxy[sid] = obs_xy
    ovalid = np.zeros(Op, dtype=bool)
    ovalid[sid] = True
    if view_buckets is not None:
        views_obs = np.arange(Op, dtype=np.int32)
        views_mask = ovalid.copy()
    else:
        views_obs = np.arange(Op, dtype=np.int32).reshape(Pp, M)
        views_mask = ovalid.reshape(Pp, M).copy()

    return BAProblem(
        R0=jnp.asarray(R0p), cam0=jnp.asarray(cam0p),
        cam_mask=jnp.asarray(mask),
        cam_constrained=jnp.asarray(cc), cam_constraints=jnp.asarray(ct),
        cam_weights=jnp.asarray(cw),
        pts0=jnp.asarray(pts0p),
        pt_constrained=jnp.asarray(pc), pt_constraints=jnp.asarray(pt),
        pt_weight=jnp.asarray(dtype(pt_weight)),
        obs_cam=jnp.asarray(ocam), obs_pt=jnp.asarray(opt),
        obs_xy=jnp.asarray(oxy), obs_valid=jnp.asarray(ovalid),
        views_obs=jnp.asarray(views_obs), views_mask=jnp.asarray(views_mask),
        cam_scale=jnp.asarray(
            np.array([1, 1, 1, 1, 1, 1, F_SCALE, K_SCALE, K_SCALE])
            if param_scale is None else param_scale, dtype=dtype),
        schur_win=(jnp.asarray(schur_win, jnp.int32)
                   if schur_win is not None else None),
        buckets=view_buckets,
    )


def plan_schur_windows(obs_cam, obs_pt, num_points: int, num_cams: int,
                       max_views: int,
                       min_cameras: int = 192,
                       windows=(32, 64, 128),
                       group_budget: int = 1 << 23):
    """Host-side plan for the covisibility-windowed Schur assembly.

    Incremental SfM's covisibility is local: with cameras in added order,
    almost every point's observing-camera ids span a narrow range (the
    sparse structure sba's CRS vmask encodes, `lib/sba-1.5/sba.h:70-78`).
    Pick a window width W, assign each point whose [lo, hi] camera span
    fits a half-overlapping window [k·W/2, k·W/2+W) to that window, split
    windows into groups of `group_pts` points, and return the point-row
    permutation that lays groups out contiguously:

      (row_of [num_points] int32, schur_win [nwin] int32, window,
       group_pts, total_rows)

    row_of[p] is the BA point row of input point p; rows not hit are group
    padding (dummy zero-observation points).  Wide-span points (e.g. loop
    closures) go to rows [nwin·group_pts, total_rows) and run the full-C
    assembly.  Returns None when windowing isn't worth it (few cameras,
    wide spans, or excessive padding) — callers then use window=0."""
    C = num_cams
    if C < min_cameras or num_points == 0:
        return None
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt)
    lo = np.full(num_points, np.iinfo(np.int64).max, np.int64)
    hi = np.full(num_points, -1, np.int64)
    np.minimum.at(lo, obs_pt, obs_cam)
    np.maximum.at(hi, obs_pt, obs_cam)
    empty = hi < 0
    lo[empty] = 0
    hi[empty] = 0

    best = None
    for Wd in windows:
        if 2 * Wd > C:
            break
        half = Wd // 2
        w_idx = np.minimum(lo // half, (C - Wd) // half)
        narrow = hi < w_idx * half + Wd
        n_narrow = int(narrow.sum())
        cost = (Wd * 9) ** 2 * n_narrow \
            + (C * 9) ** 2 * (num_points - n_narrow)
        if best is None or cost < best[0]:
            best = (cost, Wd, w_idx, narrow)
    if best is None or best[0] > 0.5 * (C * 9) ** 2 * num_points:
        return None
    _, Wd, w_idx, narrow = best
    half = Wd // 2

    gmax = max(256, group_budget // (Wd * max(max_views, 1)))
    counts = np.bincount(w_idx[narrow])
    live_w = np.nonzero(counts)[0]
    if len(live_w) == 0:
        return None
    G = int(min(gmax, max(256, int(np.percentile(counts[live_w], 90)))))
    G = ((G + 63) // 64) * 64
    nwin = int(sum(-(-int(c) // G) for c in counts[live_w]))
    n_narrow = int(narrow.sum())
    if nwin * G > 2 * n_narrow + 8 * G:
        return None   # padding waste would exceed the contraction win

    row_of = np.full(num_points, -1, np.int64)
    schur_win = np.zeros(nwin, np.int32)
    row = 0
    g = 0
    for w in live_w:
        pts_w = np.nonzero(narrow & (w_idx == w))[0]
        start = int(min(w * half, C - Wd))
        for s in range(0, len(pts_w), G):
            chunk = pts_w[s:s + G]
            row_of[chunk] = row + np.arange(len(chunk))
            schur_win[g] = start
            row += G
            g += 1
    assert g == nwin and row == nwin * G
    wide = np.nonzero(~narrow)[0]
    row_of[wide] = row + np.arange(len(wide))
    total = row + len(wide)
    return row_of.astype(np.int32), schur_win, int(Wd), int(G), int(total)


# --------------------------------------------------------------------------
# Normal equations
# --------------------------------------------------------------------------

# Max one-hot elements for matmul-based segment sums (f32: 512 MB).
_ONEHOT_BUDGET = 1 << 27

# Max P·C for the factorized dense-table Schur assembly (traffic ∝ C·O·27;
# beyond this the slot-row scatter fallback wins).
_PC_TABLE_BUDGET = 1 << 28

# Max f32 elements per dense chunk table in the factorized Schur assembly
# (two [C, B, 9, 3] tables live at once; 1 << 25 each = 128 MB each).
# NOTE: 1 << 26 crashed the remote TPU worker outright on the 256- and
# 512-camera problems (the same shapes ran at 1 << 25) — keep it here.
_SCHUR_CHUNK_BUDGET = 1 << 25


def _segsum_windowed(data, prob: BAProblem, num_segments: int,
                     window: int, group_pts: int):
    """Segment-sum over cameras exploiting the covisibility windows: the
    observations of point-group g only touch cameras
    [schur_win[g], schur_win[g]+window), so the per-group one-hot is
    [GM, window] instead of [GM, C] — C/window times less one-hot traffic
    and MXU work.  Group-padding rows carry zeroed data (build_normal_blocks
    masks by obs_valid), so their no-match loses nothing.  The wide-point
    tail runs the full-C path."""
    C = num_segments
    nwin = prob.schur_win.shape[0]
    M = prob.views_mask.shape[1]
    GM = group_pts * M
    Ow = nwin * GM
    K = int(np.prod(data.shape[1:]))
    flat = data.reshape(data.shape[0], K)
    starts = prob.schur_win.astype(prob.obs_cam.dtype)
    oc = prob.obs_cam[:Ow].reshape(nwin, GM)
    local = oc - starts[:, None]
    iota_w = jnp.arange(window, dtype=oc.dtype)

    out0 = jnp.zeros((C, K), flat.dtype) + 0.0 * flat.reshape(-1)[0]

    def acc(out, args):
        p, s = args
        s = s.astype(jnp.int32)
        zi = jnp.zeros((), jnp.int32)
        old = jax.lax.dynamic_slice(out, (s, zi), (window, K))
        return jax.lax.dynamic_update_slice(out, old + p, (s, zi)), None

    # Chunk the [nwin, GM, window] one-hot under the memory budget (it can
    # reach GBs at photo-tourism window counts); each chunk is one batched
    # MXU contraction followed by the per-window accumulate scan.
    nch = max(1, _ONEHOT_BUDGET // max(GM * window, 1))
    flatw = flat[:Ow].reshape(nwin, GM, K)
    out = out0
    for s0 in range(0, nwin, nch):
        s1 = min(s0 + nch, nwin)
        oh = (local[s0:s1, :, None]
              == iota_w[None, None, :]).astype(flat.dtype)
        part = jax.lax.dot_general(
            oh, flatw[s0:s1],
            (((1,), (1,)), ((0,), (0,))),        # contract GM, batch nwin
            precision=jax.lax.Precision.HIGHEST)     # [bs, window, K]
        out, _ = jax.lax.scan(acc, out, (part, starts[s0:s1]))
    if Ow < data.shape[0]:
        out = out + _segsum_onehot(
            flat[Ow:], prob.obs_cam[Ow:], C).reshape(C, K)
    return out.reshape((C,) + data.shape[1:])


def _segsum_onehot(data, seg, num_segments: int):
    """Segment-sum via a one-hot MXU contraction.

    TPU scatters serialize on colliding indices — with O(10^4-10^6)
    observations binned into a handful of cameras, XLA's scatter-add is the
    LM iteration's bottleneck.  A [N, S] 0/1 matrix contracted against the
    flattened data is exact (weights are 0/1, f32 accumulation) and rides
    the MXU.  When the one-hot would exceed the memory budget it is CHUNKED
    over N (a scan accumulating partial [S, k] products) — same O(N·S)
    traffic, bounded peak memory, no scatter fallback.
    """
    N = data.shape[0]
    flat = data.reshape(N, -1)
    iota = jnp.arange(num_segments, dtype=seg.dtype)
    dn = (((0,), (0,)), ((), ()))
    chunk = max(1, _ONEHOT_BUDGET // max(num_segments, 1))
    if N <= chunk:
        onehot = (seg[:, None] == iota[None, :]).astype(flat.dtype)
        out = jax.lax.dot_general(onehot, flat, dn)
        return out.reshape((num_segments,) + data.shape[1:])
    nch = -(-N // chunk)
    pad = nch * chunk - N
    segc = jnp.pad(seg, (0, pad), constant_values=-1).reshape(nch, chunk)
    flatc = jnp.pad(flat, ((0, pad), (0, 0))).reshape(nch, chunk, -1)

    def step(acc, args):
        sg, fl = args
        oh = (sg[:, None] == iota[None, :]).astype(fl.dtype)
        return acc + jax.lax.dot_general(oh, fl, dn), None

    acc0 = jnp.zeros((num_segments, flat.shape[1]), flat.dtype) \
        + 0.0 * flat[0, 0]
    out, _ = jax.lax.scan(step, acc0, (segc, flatc))
    return out.reshape((num_segments,) + data.shape[1:])


def _segsum_cams(data, prob: BAProblem, num_cams: int,
                 window: int = 0, group_pts: int = 0):
    """Per-camera segment sum of per-observation data, windowed when the
    covisibility plan is active (data must be zero on invalid slots)."""
    if window > 0 and group_pts > 0 and prob.schur_win is not None \
            and window < num_cams:
        return _segsum_windowed(data, prob, num_cams, window, group_pts)
    return _segsum_onehot(data, prob.obs_cam, num_cams)


def _point_sum(data, prob: BAProblem):
    """Per-point sum of per-observation data — in the slot layout this is a
    free reshape + masked reduce over the view slots (no gather, no
    scatter); per bucket when the view-bucketed layout is active."""
    vm = prob.views_mask.reshape(-1)
    parts = []
    tail = data.shape[1:]
    for (pt_lo, row_lo, Pb, Mb) in _sections(prob):
        g = jax.lax.slice_in_dim(data, row_lo, row_lo + Pb * Mb) \
            .reshape((Pb, Mb) + tail)
        m = jax.lax.slice_in_dim(vm, row_lo, row_lo + Pb * Mb) \
            .reshape((Pb, Mb) + (1,) * len(tail))
        parts.append(jnp.sum(g * m, axis=1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _point_any(flags, prob: BAProblem):
    """Per-point ANY of per-observation bool flags (slot layout; per
    bucket when the view-bucketed layout is active)."""
    parts = []
    for (pt_lo, row_lo, Pb, Mb) in _sections(prob):
        g = jax.lax.slice_in_dim(flags, row_lo, row_lo + Pb * Mb) \
            .reshape(Pb, Mb)
        parts.append(jnp.any(g, axis=1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _pt_expand(x, prob: BAProblem):
    """Per-point table [P, ...] -> per-observation rows [O, ...]: the
    slot-layout replacement for the x[obs_pt] gather — a broadcast along
    the view-slot axis, pure streaming writes; per bucket when the
    view-bucketed layout is active."""
    tail = x.shape[1:]
    parts = []
    for (pt_lo, row_lo, Pb, Mb) in _sections(prob):
        xs = jax.lax.slice_in_dim(x, pt_lo, pt_lo + Pb)
        parts.append(jnp.broadcast_to(
            xs[:, None], (Pb, Mb) + tail).reshape((Pb * Mb,) + tail))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _inv3(V):
    """Closed-form batched 3×3 inverse (adjugate/det) — jnp.linalg.inv's
    batched LU is slow on TPU for tiny matrices; V_aug is damped SPD so the
    determinant is safely nonzero."""
    a, b, c = V[:, 0, 0], V[:, 0, 1], V[:, 0, 2]
    d, e, f = V[:, 1, 0], V[:, 1, 1], V[:, 1, 2]
    g, h, i = V[:, 2, 0], V[:, 2, 1], V[:, 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    M = jnp.stack([jnp.stack([A, B, Cc], -1),
                   jnp.stack([D, E, F], -1),
                   jnp.stack([G, H, I], -1)], axis=1)
    return M / det[:, None, None]


def _camera_rotations(cam, prob: BAProblem):
    """Per-camera R = exp([w]x)·R0 and dR/dw [C,3,3,3] (last axis = w index).

    The Rodrigues trig and its derivative are per-CAMERA quantities; hoisting
    them out of the per-observation path (the reference caches R per camera
    the same way, `sfm.c:503-560`) leaves the observation loop pure
    polynomial — the single biggest win for the LM iteration on TPU.
    """
    R = jax.vmap(rot_update)(prob.R0, cam[:, 3:6])
    dRdw = jax.vmap(jax.jacfwd(rot_update, argnums=1))(prob.R0, cam[:, 3:6])
    return R, dRdw


def _expand_cams_windowed(prob: BAProblem, window: int, group_pts: int,
                          *tables):
    """Windowed sibling of `_expand_cams`: each point-group's rows select
    from its window's [window, K] slice of the camera tables, so the
    one-hot is [GM, window] instead of [GM, C].  Out-of-window camera ids
    (only group-padding slots) are clipped — they select a finite garbage
    row exactly like the full path's padding-selects-camera-0, and every
    consumer masks by obs_valid."""
    C = tables[0].shape[0]
    widths = [int(np.prod(t.shape[1:])) for t in tables]
    flat = jnp.concatenate([t.reshape(C, -1) for t in tables], axis=1)
    K = flat.shape[1]
    nwin = prob.schur_win.shape[0]
    M = prob.views_mask.shape[1]
    GM = group_pts * M
    Ow = nwin * GM
    starts = prob.schur_win.astype(prob.obs_cam.dtype)
    flatwin = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            flat, (s.astype(jnp.int32), jnp.zeros((), jnp.int32)),
            (window, K)))(starts)                     # [nwin, window, K]
    oc = prob.obs_cam[:Ow].reshape(nwin, GM)
    local = jnp.clip(oc - starts[:, None], 0, window - 1)
    iota_w = jnp.arange(window, dtype=oc.dtype)
    # Chunk the [nwin, GM, window] one-hot under the memory budget (same
    # rationale as _segsum_windowed's chunking).
    nch = max(1, _ONEHOT_BUDGET // max(GM * window, 1))
    parts = []
    for s0 in range(0, nwin, nch):
        s1 = min(s0 + nch, nwin)
        oh = (local[s0:s1, :, None]
              == iota_w[None, None, :]).astype(flat.dtype)
        parts.append(jax.lax.dot_general(
            oh, flatwin[s0:s1], (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST))     # [bs, GM, K]
    rows = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    rows = rows.reshape(Ow, K)
    if Ow < prob.obs_cam.shape[0]:
        tail = _expand_cams_flat(flat, prob.obs_cam[Ow:], C)
        rows = jnp.concatenate([rows, tail], axis=0)
    out = []
    off = 0
    for t, k in zip(tables, widths):
        out.append(rows[:, off:off + k].reshape((-1,) + t.shape[1:]))
        off += k
    return out


def _expand_cams_flat(flat, obs_cam, C):
    """[O]-row expansion of a concatenated [C, K] table (full-C one-hot)."""
    iota = jnp.arange(C, dtype=obs_cam.dtype)
    dn = (((1,), (0,)), ((), ()))
    O = obs_cam.shape[0]
    chunk = max(1, _ONEHOT_BUDGET // max(C, 1))
    if O <= chunk:
        onehot = (obs_cam[:, None] == iota[None, :]).astype(flat.dtype)
        return jax.lax.dot_general(onehot, flat, dn,
                                   precision=jax.lax.Precision.HIGHEST)
    nch = -(-O // chunk)
    pad = nch * chunk - O
    segc = jnp.pad(obs_cam, (0, pad)).reshape(nch, chunk)

    def step(_, sg):
        oh = (sg[:, None] == iota[None, :]).astype(flat.dtype)
        return None, jax.lax.dot_general(
            oh, flat, dn, precision=jax.lax.Precision.HIGHEST)

    _, rows = jax.lax.scan(step, None, segc)
    return rows.reshape(nch * chunk, -1)[:O]


def _expand_cams(prob: BAProblem, *tables, window: int = 0,
                 group_pts: int = 0):
    """Per-camera tables [C, k_i] -> per-observation rows [O, k_i], as
    one-hot MXU matmuls instead of per-observation gathers (TPU gathers run
    ~10-40 M rows/s and were the dominant cost of the linearization at
    O~500k; the [O,C]x[C,Σk] dot streams at full bandwidth).  Chunked over
    observations when the one-hot exceeds the memory budget (the
    512-camera / multi-million-observation regime).  With covisibility
    windows active the one-hot shrinks to [*, window] per point-group
    (`_expand_cams_windowed`)."""
    if window > 0 and group_pts > 0 and prob.schur_win is not None \
            and window < tables[0].shape[0]:
        return _expand_cams_windowed(prob, window, group_pts, *tables)
    C = tables[0].shape[0]
    widths = [int(np.prod(t.shape[1:])) for t in tables]
    flat = jnp.concatenate([t.reshape(C, -1) for t in tables], axis=1)
    rows = _expand_cams_flat(flat, prob.obs_cam, C)
    out = []
    off = 0
    for t, k in zip(tables, widths):
        out.append(rows[:, off:off + k].reshape((-1,) + t.shape[1:]))
        off += k
    return out


def _predict_obs(cam, pts, R, prob: BAProblem, window: int = 0,
                 group_pts: int = 0):
    """Vectorized Snavely projection of every observation given cached
    per-camera rotations R [C,3,3].  Returns pred [O,2] and p [O,3]."""
    co, Ro = _expand_cams(prob, cam, R, window=window,
                          group_pts=group_pts)            # [O,9], [O,3,3]
    v = _pt_expand(pts, prob) - co[:, 0:3]                # [O,3]
    p = jnp.sum(Ro * v[:, None, :], axis=2)               # [O,3]
    f = co[:, 6:7]
    n = p[:, 0:2] / p[:, 2:3]
    rsq = jnp.sum(n * n, axis=1, keepdims=True)
    D = 1.0 + co[:, 7:8] * rsq + co[:, 8:9] * rsq * rsq
    pred = -f * D * n
    return pred, p


def _residuals(cam, pts, prob: BAProblem, window: int = 0,
               group_pts: int = 0):
    R, _ = _camera_rotations(cam, prob)
    pred, _ = _predict_obs(cam, pts, R, prob, window, group_pts)
    return jnp.where(prob.obs_valid[:, None], pred - prob.obs_xy, 0.0)


def _linearize_obs(cam, pts, prob: BAProblem, window: int = 0,
                   group_pts: int = 0):
    """Residual r [O,2] and closed-form Jacobian blocks A [O,2,9] (camera)
    and B [O,2,3] (point) for every observation — all plain vectorized ops,
    no per-observation autodiff (validated against jacfwd in test_ba).

    Layout matches the [c(3), w(3), f, k1, k2] parameterization
    (`sfm.c:651-703`); derivatives are exact at the current w (dR/dw from
    `_camera_rotations`), like SBA's analytic mode and unlike its default
    finite differences (`sba_levmar.c:336`).
    """
    R, dRdw = _camera_rotations(cam, prob)
    # The scaled camera mask rides the same one-hot expansion (9 extra
    # columns) instead of a separate [O,9] cam_mask[obs_cam] gather.
    mask_scaled = prob.cam_mask / prob.cam_scale[None]
    co, Ro, dRo, ms = _expand_cams(prob, cam, R, dRdw, mask_scaled,
                                   window=window, group_pts=group_pts)
    v = _pt_expand(pts, prob) - co[:, 0:3]
    p = jnp.sum(Ro * v[:, None, :], axis=2)
    f = co[:, 6]
    k1 = co[:, 7]
    k2 = co[:, 8]
    inv_z = 1.0 / p[:, 2]
    n = p[:, 0:2] * inv_z[:, None]                         # [O,2]
    rsq = jnp.sum(n * n, axis=1)
    D = 1.0 + k1 * rsq + k2 * rsq * rsq
    pred = -(f * D)[:, None] * n

    # dn/dp [O,2,3]
    zero = jnp.zeros_like(inv_z)
    dn_dp = jnp.stack([
        jnp.stack([inv_z, zero, -n[:, 0] * inv_z], axis=1),
        jnp.stack([zero, inv_z, -n[:, 1] * inv_z], axis=1)], axis=1)
    # drsq/dp = 2 nᵀ dn/dp  [O,3]
    drsq_dp = 2.0 * jnp.sum(n[:, :, None] * dn_dp, axis=1)
    dD_dp = ((k1 + 2.0 * k2 * rsq)[:, None]) * drsq_dp     # [O,3]
    # dpred/dp = -f (D dn/dp + n ⊗ dD/dp)  [O,2,3]
    dpred_dp = -f[:, None, None] * (D[:, None, None] * dn_dp
                                    + n[:, :, None] * dD_dp[:, None, :])

    # dp/dc = -R, dp/dX = R, dp/dw[:, :, i] = dR/dw_i · v
    dp_dw = jnp.sum(dRo * v[:, None, :, None], axis=2)     # [O,3,3]

    B = jnp.sum(dpred_dp[:, :, :, None] * Ro[:, None, :, :], axis=2)
    A_c = -B
    A_w = jnp.sum(dpred_dp[:, :, :, None] * dp_dw[:, None, :, :], axis=2)
    A_f = -(D[:, None]) * n                                # [O,2]
    A_k1 = -(f * rsq)[:, None] * n
    A_k2 = -(f * rsq * rsq)[:, None] * n
    A = jnp.concatenate([A_c, A_w, A_f[:, :, None],
                         A_k1[:, :, None], A_k2[:, :, None]], axis=2)

    r = pred - prob.obs_xy
    m = prob.obs_valid[:, None]
    return (jnp.where(m, r, 0.0), jnp.where(m[:, :, None], A, 0.0),
            jnp.where(m[:, :, None], B, 0.0), ms)


def compute_cost(cam, pts, prob: BAProblem, loss: str = "l2",
                 huber_b: float = 625.0, window: int = 0,
                 group_pts: int = 0):
    r = _residuals(cam, pts, prob, window, group_pts)
    s = jnp.sum(r * r, axis=1)
    cost = 0.5 * jnp.sum(_robust_rho(s, loss, huber_b))
    cw = prob.cam_weights * prob.cam_constrained * prob.cam_mask
    cost += 0.5 * jnp.sum(cw * (cam - prob.cam_constraints) ** 2)
    pw = prob.pt_weight * prob.pt_constrained
    cost += 0.5 * jnp.sum(pw[:, None] * (pts - prob.pt_constraints) ** 2)
    return cost


def build_normal_blocks(cam, pts, prob: BAProblem, fix_points: bool,
                        loss: str = "l2", huber_b: float = 625.0,
                        window: int = 0, group_pts: int = 0):
    """U [C,9,9], V [P,3,3], W [O,9,3], g_c [C,9], g_p [P,3], cost.

    Camera-side quantities are in SCALED parameter space q = cam_scale∘x
    (A columns multiplied by 1/s), so the caller's LM damping mu*I acts on
    balanced coordinates exactly like run_sfm's packed f·0.001/k·5.0 params
    (sfm.c:634-703).  The camera step the solve produces is δq; unscale with
    δx = δq / cam_scale before applying."""
    C = cam.shape[0]
    P = pts.shape[0]
    inv_s = 1.0 / prob.cam_scale                              # [9]

    windowed = (window > 0 and group_pts > 0
                and prob.schur_win is not None and window < C)

    def segsum(data):
        if windowed:
            return _segsum_windowed(data, prob, C, window, group_pts)
        return _segsum_onehot(data, prob.obs_cam, C)

    r, A, B, ms = _linearize_obs(cam, pts, prob, window, group_pts)
    # Robust rescaling with the FULL Triggs correction, exactly Ceres's
    # Corrector (internal/ceres/corrector.cc, as applied by the reference's
    # --use_ceres backend):
    #   alpha solves ½α² − α − (ρ''/ρ')·s = 0  (only when ρ'' > 0)
    #   r ← √ρ'/(1−α) · r
    #   J ← √ρ' · (J − (α/s) · r rᵀ J)
    # When ρ'' ≤ 0 Ceres sets α = 0 and the correction reduces to the plain
    # √ρ' IRLS scaling — HuberLoss has ρ'' ≤ 0 everywhere, so for the
    # reference's Huber(25) configuration the two are IDENTICAL; the α
    # branch keeps parity for any future ρ'' > 0 loss.
    s = jnp.sum(r * r, axis=1)
    rcost = 0.5 * jnp.sum(_robust_rho(s, loss, huber_b))
    if loss != "l2":
        rho1 = _robust_weight(s, loss, huber_b)
        rho2 = _robust_curvature(s, loss, huber_b)
        sq1 = jnp.sqrt(rho1)
        pos = rho2 > 0.0
        Dd = jnp.maximum(
            1.0 + 2.0 * s * rho2 / jnp.maximum(rho1, 1e-30), 0.0)
        alpha = jnp.where(pos, 1.0 - jnp.sqrt(Dd), 0.0)
        r_scale = jnp.where(pos,
                            sq1 / jnp.maximum(1.0 - alpha, 1e-30), sq1)
        asn = (alpha / jnp.maximum(s, 1e-30))[:, None, None]
        rtA = (r[:, :, None] * A).sum(1)            # [O, 9]
        A = sq1[:, None, None] * (A - asn * r[:, :, None] * rtA[:, None, :])
        rtB = (r[:, :, None] * B).sum(1)            # [O, 3]
        B = sq1[:, None, None] * (B - asn * r[:, :, None] * rtB[:, None, :])
        r = r * r_scale[:, None]
    A = A * ms[:, None, :]
    if fix_points:
        B = B * 0.0
    # Tiny contractions (k=2) as broadcast-multiply + sum: exact f32 on the
    # VPU — jnp.einsum would route these through the MXU in bf16 by default
    # and pay a layout pass per dot.
    U = segsum((A[:, :, :, None] * A[:, :, None, :]).sum(1))
    V = _point_sum((B[:, :, :, None] * B[:, :, None, :]).sum(1), prob)
    W = (A[:, :, :, None] * B[:, :, None, :]).sum(1)
    g_c = -segsum((A * r[:, :, None]).sum(1))
    g_p = -_point_sum((B * r[:, :, None]).sum(1), prob)
    cost = rcost

    # Camera constraints (sba.h:82-90), transformed to q-space:
    # 0.5·cw·(x−t)² = 0.5·(cw/s²)·(q−s·t)², so diag += cw/s² and the
    # gradient picks up one 1/s factor.
    cw = prob.cam_weights * prob.cam_constrained * prob.cam_mask
    U = U + jax.vmap(jnp.diag)(cw * (inv_s * inv_s)[None])
    g_c = g_c + cw * (prob.cam_constraints - cam) * inv_s[None]
    cost += 0.5 * jnp.sum(cw * (cam - prob.cam_constraints) ** 2)

    # Point constraints (run_sfm, sfm.c:757-781).
    pw = prob.pt_weight * prob.pt_constrained
    V = V + pw[:, None, None] * jnp.eye(3, dtype=V.dtype)[None]
    g_p = g_p + pw[:, None] * (prob.pt_constraints - pts)
    cost += 0.5 * jnp.sum(pw[:, None] * (pts - prob.pt_constraints) ** 2)
    return U, V, W, g_c, g_p, cost


def _schur_dense_tables(yp, wp, slots, mask, width, starts, dtype):
    """Per-point dense camera tables over a `width`-camera window.

    yp/wp [B,M,9,3], slots [B,M] global camera ids, mask [B,M], starts
    [B] window start per point (0 for the full-C path).  Per-point one-hot
    [B,M,width] contracted against the slot data as a BATCHED MXU matmul:
    yt[b] = ohᵀ[b]·yp[b].  Exact in f32: each (point, camera) output sums
    at most ONE slot (a track never revisits an image,
    src/ComputeTracks.cpp:171), so no accumulation rounding is possible;
    f32 single-pass keeps the values bit-exact.  Replaces a [C,B,M,27]
    broadcast-reduce that streamed C× the slot data through the VPU."""
    M = yp.shape[1]
    iota_w = jnp.arange(width, dtype=slots.dtype)
    local = slots - starts[:, None]                      # [B,M]
    oh = ((local[:, :, None] == iota_w[None, None, :])
          & mask[:, :, None]).astype(dtype)              # [B,M,width]
    B = yp.shape[0]
    ypf = yp.reshape(B, M, CNP * PNP)
    wpf = wp.reshape(B, M, CNP * PNP)
    dn = (((1,), (1,)), ((0,), (0,)))                    # contract M
    yt = jax.lax.dot_general(oh, ypf, dn,
                             precision=jax.lax.Precision.HIGHEST)
    wt = jax.lax.dot_general(oh, wpf, dn,
                             precision=jax.lax.Precision.HIGHEST)
    # [B,width,27] → [width,B,9,3]
    return (yt.transpose(1, 0, 2).reshape(width, B, CNP, PNP),
            wt.transpose(1, 0, 2).reshape(width, B, CNP, PNP))


def _schur_block(yt, wt):
    # contract (point, 3): [w,B,9,3] × [w,B,9,3] → [w,9,w,9]
    return jax.lax.dot_general(
        yt, wt, (((1, 3), (1, 3)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _schur_dense_full(Yp, Wp, cam_of_slot, maskp, C, dtype):
    """Full-C factorized dense-table assembly of −S contribution [C,9,C,9]
    for a point slice (the S layout before the final transpose)."""
    P, M = maskp.shape
    zstart = jnp.zeros(P, dtype=cam_of_slot.dtype)
    chunk = max(1, _SCHUR_CHUNK_BUDGET // (C * CNP * PNP))
    if chunk >= P:
        yt, wt = _schur_dense_tables(Yp, Wp, cam_of_slot, maskp, C,
                                     zstart, dtype)
        return -_schur_block(yt, wt)
    nchunk = -(-P // chunk)
    pad = nchunk * chunk - P
    Yc = jnp.pad(Yp, ((0, pad), (0, 0), (0, 0), (0, 0))) \
        .reshape(nchunk, chunk, M, CNP, PNP)
    Wc = jnp.pad(Wp, ((0, pad), (0, 0), (0, 0), (0, 0))) \
        .reshape(nchunk, chunk, M, CNP, PNP)
    Sc = jnp.pad(cam_of_slot, ((0, pad), (0, 0))) \
        .reshape(nchunk, chunk, M)
    Mc = jnp.pad(maskp, ((0, pad), (0, 0))) \
        .reshape(nchunk, chunk, M)
    # Zero init derived from Y so the carry's device-varying type
    # matches the body's output under shard_map.
    S0 = jnp.zeros((C, CNP, C, CNP), dtype) + 0.0 * Yp[0, 0, 0, 0]
    zs = jnp.zeros(chunk, dtype=cam_of_slot.dtype)

    def chunk_step(S, args):
        yp, wp, slots, mask = args
        yt, wt = _schur_dense_tables(yp, wp, slots, mask, C, zs, dtype)
        return S - _schur_block(yt, wt), None

    S, _ = jax.lax.scan(chunk_step, S0, (Yc, Wc, Sc, Mc))
    return S


def assemble_schur_off(Y, W, g_p, prob: BAProblem, num_cameras: int,
                       window: int = 0, group_pts: int = 0):
    """Off-diagonal (point-coupled) part of the reduced camera system.

    S_off[j,k] = − Σ_i Σ_{a,b ∈ views(i)} Y_a W_bᵀ  (cam(a)=j, cam(b)=k) and
    rhs_off[j] = − Σ_obs Y_o g_p[pt(o)].  These are the pieces that sum over
    points, so in the sharded solver they are what gets psum'd; the caller
    adds blockdiag(U_aug) and g_c afterwards.

    TPU-native assembly: because a track never revisits an image
    (`src/ComputeTracks.cpp:171`), each (point, camera) has at most one
    observation, so the per-point double sum FACTORIZES:

        Σ_{a,b∈views(i)} Y_a W_bᵀ = (Σ_{a:cam=j} Y_a)(Σ_{b:cam=k} W_b)ᵀ
                                  = Ỹ[i,j] · W̃[i,k]ᵀ

    with Ỹ/W̃ the per-point dense camera tables (zero where unobserved).
    S_off then collapses to MXU contractions Ỹ × W̃ over (P, 3) — no
    gathers and no scatters (TPU gathers run at ~10 M rows/s; XLA:TPU's
    scatter-add serializes on colliding camera indices, which sank the
    original segment-sum variant).  Exact f32 via precision=HIGHEST.

    COVISIBILITY WINDOWING (window > 0, group_pts > 0): the full-C block
    contraction costs (C·9)²·3·P FLOPs — the 256+-camera per-iteration
    cliff (sba_levmar.c's CRS loops touch only covisible pairs; this is
    our sparse analogue).  A point only couples the ≤ window cameras that
    observe it, so the host sorts points into groups of `group_pts` whose
    camera ids all fit one `window`-wide id range (prob.schur_win [nwin]
    holds each group's window start; incremental SfM covisibility makes
    almost every point narrow-span).  Each group contracts against its
    window only — (window·9)²·3·P — and its [w9, w9] block is added into
    S at the window offset.  Points beyond nwin·group_pts (wide-span
    remainder + padding) run the full-C path.  Bit-exact vs the full
    path: every camera pair a point couples lies inside its window.
    """
    C = num_cameras
    dtype = Y.dtype

    windowed = window > 0 and group_pts > 0 and window < C \
        and prob.schur_win is not None
    # rhs_off = − Σ_obs Y_o g_p[pt(o)]  (per camera).
    gpo = _pt_expand(g_p, prob)
    contrib = jnp.sum(Y * gpo[:, None, :], axis=2)
    if windowed:
        rhs_off = -_segsum_windowed(contrib, prob, C, window, group_pts)
    else:
        rhs_off = -_segsum_onehot(contrib, prob.obs_cam, C)

    if prob.buckets is not None:
        # View-bucketed layout: the factorized per-point dense-table
        # assembly runs per bucket (each bucket is its own [P_b, M_b]
        # slot table); the [C,9,C,9] contributions add.
        vm = prob.views_mask
        S = None
        for (pt_lo, row_lo, Pb, Mb) in _sections(prob):
            sl = lambda a: jax.lax.slice_in_dim(a, row_lo,
                                                row_lo + Pb * Mb)
            Sb = _schur_dense_full(
                sl(Y).reshape(Pb, Mb, CNP, PNP),
                sl(W).reshape(Pb, Mb, CNP, PNP),
                sl(prob.obs_cam).reshape(Pb, Mb),
                sl(vm).reshape(Pb, Mb), C, dtype)
            S = Sb if S is None else S + Sb
        return S.transpose(0, 2, 1, 3), rhs_off

    P, M = prob.views_obs.shape
    if windowed or P * C <= _PC_TABLE_BUDGET:
        cam_of_slot = prob.obs_cam.reshape(P, M)        # [P,M]
        Yp = Y.reshape(P, M, CNP, PNP)                  # [P,M,9,3]
        Wp = W.reshape(P, M, CNP, PNP)                  # [P,M,9,3]
        maskp = prob.views_mask                         # [P,M]

        if windowed:
            nwin = prob.schur_win.shape[0]
            Pw = nwin * group_pts
            S0 = jnp.zeros((C, CNP, C, CNP), dtype) + 0.0 * Y[0, 0, 0]
            Yw = Yp[:Pw].reshape(nwin, group_pts, M, CNP, PNP)
            Ww = Wp[:Pw].reshape(nwin, group_pts, M, CNP, PNP)
            Sw = cam_of_slot[:Pw].reshape(nwin, group_pts, M)
            Mw = maskp[:Pw].reshape(nwin, group_pts, M)
            starts = prob.schur_win.astype(cam_of_slot.dtype)

            def win_step(S, args):
                yp, wp, slots, mask, start = args
                yt, wt = _schur_dense_tables(
                    yp, wp, slots, mask, window,
                    jnp.full((group_pts,), start, slots.dtype), dtype)
                blk = _schur_block(yt, wt)               # [w,9,w,9]
                zi = jnp.zeros((), jnp.int32)
                st = start.astype(jnp.int32)
                old = jax.lax.dynamic_slice(
                    S, (st, zi, st, zi), (window, CNP, window, CNP))
                return jax.lax.dynamic_update_slice(
                    S, old - blk, (st, zi, st, zi)), None

            S, _ = jax.lax.scan(win_step, S0, (Yw, Ww, Sw, Mw, starts))
            if Pw < P:
                S = S + _schur_dense_full(Yp[Pw:], Wp[Pw:],
                                          cam_of_slot[Pw:], maskp[Pw:],
                                          C, dtype)
        else:
            S = _schur_dense_full(Yp, Wp, cam_of_slot, maskp, C, dtype)
        S_off = S.transpose(0, 2, 1, 3)
        return S_off, rhs_off

    # Fallback (dense camera tables too large): scatter-add over view-slot
    # rows, peak memory O(P·M·81).
    cam_of_slot = prob.obs_cam.reshape(P, M)            # [P,M]
    Yp = Y.reshape(P, M, CNP, PNP)                      # [P,M,9,3]
    Wp = W.reshape(P, M, CNP, PNP)                      # [P,M,9,3]
    maskp = prob.views_mask                             # [P,M]
    S_off = jnp.zeros((C * C, CNP, CNP), dtype=dtype) + 0.0 * Y[0, 0, 0]

    def slot_row(carry, m):
        S_off = carry
        ya = Yp[:, m]                                   # [P,9,3]
        # Row m against ALL slots n at once: [P,M,9,9].
        blocks = jnp.einsum("pij,pnkj->pnik", ya, Wp)
        pair_ok = maskp[:, m, None] & maskp             # [P,M]
        blocks = blocks * pair_ok[:, :, None, None]
        idx = cam_of_slot[:, m, None] * C + cam_of_slot
        idx = jnp.where(pair_ok, idx, 0)                # masked blocks are 0
        S_off = S_off.at[idx.reshape(-1)].add(
            -blocks.reshape(P * M, CNP, CNP))
        return S_off, None

    S_off, _ = jax.lax.scan(slot_row, S_off,
                            jnp.arange(M, dtype=jnp.int32))
    S_off = S_off.reshape(C, C, CNP, CNP)
    return S_off, rhs_off


def assemble_schur(U_aug, Y, W, g_c, g_p, prob: BAProblem):
    """Full dense reduced camera system S [C,C,9,9] and rhs [C,9]:
    S = blockdiag(U_aug) + S_off, rhs = g_c + rhs_off."""
    C = U_aug.shape[0]
    S_off, rhs_off = assemble_schur_off(Y, W, g_p, prob, C)
    S = S_off.at[jnp.arange(C), jnp.arange(C)].add(U_aug)
    return S, g_c + rhs_off


def solve_schur(S, rhs):
    C = S.shape[0]
    Sd = S.transpose(0, 2, 1, 3).reshape(C * CNP, C * CNP)
    # Dense Cholesky (sba_Axb_Chol, sba_levmar.c:1368).
    L = jnp.linalg.cholesky(Sd)
    dc = jax.scipy.linalg.cho_solve((L, True), rhs.reshape(-1))
    return dc.reshape(C, CNP)


def solve_schur_cg(S, rhs, max_iters: int = 100, tol: float = 1e-8):
    """Preconditioned CG on the reduced camera system with the SCHUR_JACOBI
    (block-diagonal) preconditioner — the ITERATIVE_SCHUR path Ceres selects
    for >200 cameras (src/BundleCeres.cpp:132-134,369-379).

    The matvec contracts the block layout S [C,C,9,9] directly — for C
    cameras this is a [C·9, C·9]·[C·9] product the MXU eats whole; no
    explicit reshape to dense is materialized per iteration.
    """
    C = S.shape[0]
    diag = S[jnp.arange(C), jnp.arange(C)]          # [C,9,9]
    Minv = jnp.linalg.inv(diag + 1e-12 * jnp.eye(CNP, dtype=S.dtype))

    def matvec(x):                                   # x [C,9]
        return jnp.einsum("jkab,kb->ja", S, x)

    def precond(r):
        return jnp.einsum("jab,jb->ja", Minv, r)

    b2 = jnp.sum(rhs * rhs)
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(state):
        x, r, z, p, rz, it = state
        return (it < max_iters) & (jnp.sum(r * r) > tol * tol * b2)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0)))
    return x


def back_substitute(Vinv, W, g_p, dcam, prob: BAProblem,
                    window: int = 0, group_pts: int = 0):
    """dp_i = V_i⁻¹ (g_p_i − Σ_{o∈views(i)} W_oᵀ dcam[cam(o)]).

    The per-observation camera-step rows come from the one-hot MXU
    expansion (`_expand_cams`) rather than a [O]-row gather."""
    dco, = _expand_cams(prob, dcam, window=window, group_pts=group_pts)
    wc = (W * dco[:, :, None]).sum(1)                     # [O,3]
    acc = _point_sum(wc, prob)
    x = g_p - acc
    return (Vinv * x[:, None, :]).sum(2)


# --------------------------------------------------------------------------
# LM driver
# --------------------------------------------------------------------------

def _psum(x, axis):
    return x if axis is None else jax.lax.psum(x, axis)


def _pmax(x, axis):
    return x if axis is None else jax.lax.pmax(x, axis)


def _schur_matvec_sharded(x, U_aug, Y, W, prob: BAProblem, axis: str,
                          window: int = 0, group_pts: int = 0):
    """Matrix-free (S·x) from shard-local blocks: the off-diagonal
    point-coupled term never materializes S.  Per shard:
      t_o = W_oᵀ x_expand(o);  s_i = Σ_{o∈views(i)} t_o;
      c_j = Σ_{o:cam=j} Y_o s_{pt(o)};  S·x = U_aug·x − psum(c).
    Communication is one [C,9] psum per product — C·36 bytes instead of the
    C²·81·4-byte S_off reduction, and no replicated dense factorization.
    Both the camera expansion and the camera reduction are slot-layout
    one-hot MXU contractions (windowed when the covisibility plan is
    active) — no per-observation gathers in the CG iteration."""
    xo, = _expand_cams(prob, x, window=window, group_pts=group_pts)
    t = jnp.einsum("oab,oa->ob", W, xo)
    s = _point_sum(t, prob)
    u = jnp.einsum("oab,ob->oa", Y, _pt_expand(s, prob))
    c = jax.lax.psum(
        _segsum_cams(u, prob, x.shape[0], window, group_pts), axis)
    return jnp.einsum("jab,jb->ja", U_aug, x) - c


def _solve_schur_cg_sharded(U_aug, Y, W, rhs, prob: BAProblem, axis: str,
                            max_iters: int = 100, tol: float = 1e-8,
                            window: int = 0, group_pts: int = 0):
    """Distributed SCHUR_JACOBI-preconditioned CG on the reduced camera
    system (the >200-camera ITERATIVE_SCHUR configuration,
    src/BundleCeres.cpp:132-134,369-379, distributed): the preconditioner
    uses the true S diagonal blocks D_j = U_aug_j − Σ_i Y_ij W_ijᵀ (psum'd
    once), the iteration uses the matrix-free psum matvec."""
    C = U_aug.shape[0]
    ywt = jnp.einsum("oab,ocb->oac", Y, W)                   # [O,9,9]
    D = U_aug - jax.lax.psum(
        _segsum_cams(ywt, prob, C, window, group_pts), axis)
    Minv = jnp.linalg.inv(D + 1e-12 * jnp.eye(CNP, dtype=D.dtype))

    def matvec(x):
        return _schur_matvec_sharded(x, U_aug, Y, W, prob, axis,
                                     window, group_pts)

    def precond(r):
        return jnp.einsum("jab,jb->ja", Minv, r)

    b2 = jnp.sum(rhs * rhs)
    x0 = jnp.zeros_like(rhs)
    z0 = precond(rhs)
    state = (x0, rhs, z0, z0, jnp.sum(rhs * z0), jnp.int32(0))

    def cond(st):
        x, r, z, p, rz, it = st
        return (it < max_iters) & (jnp.sum(r * r) > tol * tol * b2)

    def body(st):
        x, r, z, p, rz, it = st
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / jnp.maximum(rz, 1e-300)) * p
        return x, r, z, p, rz_new, it + 1

    x, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


def _lm_loop(prob: BAProblem, max_iters: int, fix_points: bool,
             tau, eps1, eps2, loss: str, huber_param, solver: str,
             axis: Optional[str] = None,
             state0=None, it_hi=None,
             window: int = 0, group_pts: int = 0):
    """The LM while-loop shared by run_ba, the fused outlier loop, and the
    point-sharded distributed BA.  Starts from prob.cam0/pts0 (w live in
    cam[:,3:6]); returns (cam, pts, cost, cost0, iters, mu) with w NOT yet
    folded into R.

    With `axis` set, `prob` is the SHARD-LOCAL problem inside a shard_map
    over that mesh axis (points + their observations local, cameras
    replicated): camera-side reductions (U, g_c, S_off, cost, norms) are
    psum'd over the axis — exactly SBA's U/V/W/S algebra
    (`lib/sba-1.5/sba_levmar.c:1191-1373`) with the point sums turned into
    collectives.  Per-shard camera-constraint weights must be pre-scaled by
    1/num_shards so the psum reconstructs them once."""
    dtype = prob.cam0.dtype
    eyec = jnp.eye(CNP, dtype=dtype)
    eyep = jnp.eye(PNP, dtype=dtype)
    huber_b = huber_param * huber_param

    def global_blocks(cam, pts):
        U, V, W, g_c, g_p, cost = build_normal_blocks(
            cam, pts, prob, fix_points, loss=loss, huber_b=huber_b,
            window=window, group_pts=group_pts)
        return (_psum(U, axis), V, W, _psum(g_c, axis), g_p,
                _psum(cost, axis))

    def damped_step(cam, pts, mu):
        U, V, W, g_c, g_p, cost = global_blocks(cam, pts)
        frozen = 1.0 - prob.cam_mask
        U_aug = U + jax.vmap(jnp.diag)(frozen) + mu * eyec[None]
        V_aug = V + (mu + 1e-12) * eyep[None]
        Vinv = _inv3(V_aug)
        Vo = _pt_expand(Vinv, prob)
        Y = (W[:, :, :, None] * Vo[:, None, :, :]).sum(2)
        C = U_aug.shape[0]
        if solver == "cg" and axis is not None:
            # Matrix-free distributed PCG: never materializes S_off.
            contrib = jnp.sum(Y * _pt_expand(g_p, prob)[:, None, :],
                              axis=2)
            rhs = g_c - jax.lax.psum(
                _segsum_cams(contrib, prob, C, window, group_pts), axis)
            dcam = _solve_schur_cg_sharded(U_aug, Y, W, rhs, prob, axis,
                                           window=window,
                                           group_pts=group_pts)
        else:
            S_off, rhs_off = assemble_schur_off(Y, W, g_p, prob, C,
                                                window=window,
                                                group_pts=group_pts)
            S_off = _psum(S_off, axis)
            rhs = g_c + _psum(rhs_off, axis)
            S = S_off.at[jnp.arange(C), jnp.arange(C)].add(U_aug)
            if solver == "cg":
                dcam = solve_schur_cg(S, rhs)
            else:
                dcam = solve_schur(S, rhs)
        dcam = dcam * prob.cam_mask
        if fix_points:
            dpts = jnp.zeros_like(pts)
        else:
            dpts = back_substitute(Vinv, W, g_p, dcam, prob,
                                   window=window, group_pts=group_pts)
        return dcam, dpts, g_c, g_p, cost

    def total_cost(cam, pts):
        return _psum(compute_cost(cam, pts, prob, loss=loss,
                                  huber_b=huber_b, window=window,
                                  group_pts=group_pts), axis)

    if state0 is None:
        # Initial damping: tau * max diagonal of JᵀJ (SBA's init).
        U0, V0, _, g_c0, g_p0, cost0 = global_blocks(prob.cam0, prob.pts0)
        maxdiag = jnp.maximum(
            jnp.max(jax.vmap(jnp.diag)(U0)),
            _pmax(jnp.max(jax.vmap(jnp.diag)(V0)), axis))
        mu0 = tau * jnp.maximum(maxdiag, 1.0)
    else:
        cost0 = state0[4]    # caller tracks the true initial cost

    # `it_hi` bounds THIS call (resumable chunked execution for backends
    # with a per-execution time limit); `max_iters` bounds the total.
    cap = jnp.int32(max_iters) if it_hi is None else \
        jnp.minimum(jnp.int32(max_iters), it_hi)

    def cond(state):
        cam, pts, mu, nu, cost, it, done = state
        return (it < cap) & ~done

    inv_s = 1.0 / prob.cam_scale

    def body(state):
        cam, pts, mu, nu, cost, it, done = state
        dcam, dpts, g_c, g_p, _ = damped_step(cam, pts, mu)
        cam_new = cam + dcam * inv_s[None]   # δx = δq / s
        pts_new = pts + dpts
        new_cost = total_cost(cam_new, pts_new)
        # Gain ratio: predicted reduction = 0.5 δᵀ(mu δ + g).
        pred = 0.5 * jnp.sum(dcam * (mu * dcam + g_c)) + \
            _psum(0.5 * jnp.sum(dpts * (mu * dpts + g_p)), axis)
        rho = (cost - new_cost) / jnp.maximum(pred, 1e-300)
        accept = new_cost < cost
        cam = jnp.where(accept, cam_new, cam)
        pts = jnp.where(accept, pts_new, pts)
        cost_next = jnp.where(accept, new_cost, cost)
        mu_acc = mu * jnp.maximum(1.0 / 3.0,
                                  1.0 - (2.0 * rho - 1.0) ** 3)
        mu = jnp.where(accept, mu_acc, mu * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        # Termination: small gradient or tiny step (opts eps1/eps2), both in
        # q-space like SBA checks its packed params.
        gnorm = jnp.maximum(jnp.max(jnp.abs(g_c)),
                            _pmax(jnp.max(jnp.abs(g_p)), axis))
        q = cam * prob.cam_scale[None]
        pnorm = jnp.sqrt(jnp.sum(q * q) + _psum(jnp.sum(pts * pts), axis))
        dnorm = jnp.sqrt(jnp.sum(dcam * dcam) +
                         _psum(jnp.sum(dpts * dpts), axis))
        done = (gnorm < eps1) | (dnorm < eps2 * (pnorm + eps2)) | (mu > 1e30)
        return cam, pts, mu, nu, cost_next, it + 1, done

    if state0 is None:
        state = (prob.cam0, prob.pts0, mu0, jnp.asarray(2.0, dtype), cost0,
                 jnp.int32(0), jnp.asarray(False))
    else:
        state = state0
    state = jax.lax.while_loop(cond, body, state)
    cam, pts, mu, nu, cost, iters, done = state
    return cam, pts, cost, cost0, iters, mu, state


@functools.partial(jax.jit, static_argnames=("max_iters", "fix_points",
                                             "loss", "solver", "window",
                                             "group_pts"))
def _run_ba_fused(prob: BAProblem, max_iters: int = 150,
                  fix_points: bool = False,
                  tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
                  loss: str = "l2", huber_param: float = 25.0,
                  solver: str = "cholesky", window: int = 0,
                  group_pts: int = 0) -> BAResult:
    """The whole LM run as ONE device program (the normal case)."""
    cam, pts, cost, cost0, iters, mu, _ = _lm_loop(
        prob, max_iters, fix_points, tau, eps1, eps2, loss, huber_param,
        solver, window=window, group_pts=group_pts)
    # Fold w into R (run_sfm epilogue, sfm.c:876-929).
    R = jax.vmap(rot_update)(prob.R0, cam[:, 3:6])
    cam_out = cam.at[:, 3:6].set(0.0)
    return BAResult(cam=cam_out, R=R, pts=pts, cost=cost,
                    initial_cost=cost0, iters=iters, mu=mu)


def run_ba(prob: BAProblem, max_iters: int = 150, fix_points: bool = False,
           tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
           loss: str = "l2", huber_param: float = 25.0,
           solver: str = "cholesky",
           chunked: Optional[bool] = None,
           window: int = 0, group_pts: int = 0) -> BAResult:
    """Levenberg-Marquardt with Schur complement; mirrors run_sfm's SBA call
    (MAX_ITERS=150 `sfm.c:814`, opts `sfm.c:705-714`).

    loss="huber" + solver="cg" reproduce the Ceres backend's configuration
    (HuberLoss(25) `src/BundleCeres.cpp:125,285`; ITERATIVE_SCHUR with
    SCHUR_JACOBI for >200 cams `:132-134,369-379`).

    Very large problems (estimated work Cp·O_pad·max_iters above
    _FUSED_WORK_BUDGET) run through the resumable chunked driver so no
    single device execution exceeds the backend's per-execution limit;
    pass `chunked` to force either mode."""
    if chunked is None:
        est = float(prob.cam0.shape[0]) * prob.obs_cam.shape[0] * max_iters
        chunked = est > _FUSED_WORK_BUDGET
    if chunked:
        return run_ba_chunked(prob, max_iters=max_iters,
                              fix_points=fix_points, tau=tau, eps1=eps1,
                              eps2=eps2, loss=loss,
                              huber_param=huber_param, solver=solver,
                              window=window, group_pts=group_pts)
    return _run_ba_fused(prob, max_iters, fix_points, tau, eps1, eps2,
                         loss, huber_param, solver, window, group_pts)


class LMState(NamedTuple):
    """Resumable LM while-loop state (cam, pts, mu, nu, cost, it, done)."""
    cam: jnp.ndarray
    pts: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray
    cost: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("max_iters", "fix_points",
                                             "loss", "solver", "window",
                                             "group_pts"))
def _lm_start(prob: BAProblem, it_hi, max_iters: int, fix_points: bool,
              tau, eps1, eps2, loss: str, huber_param, solver: str,
              window: int = 0, group_pts: int = 0):
    """First chunk of a resumable LM run: init + up to `it_hi` iterations.
    Returns (cost0, state)."""
    _, _, _, cost0, _, _, st = _lm_loop(
        prob, max_iters, fix_points, tau, eps1, eps2, loss, huber_param,
        solver, it_hi=it_hi, window=window, group_pts=group_pts)
    return cost0, LMState(*st)


@functools.partial(jax.jit, static_argnames=("max_iters", "fix_points",
                                             "loss", "solver", "window",
                                             "group_pts"))
def _lm_resume(prob: BAProblem, state: LMState, it_hi, max_iters: int,
               fix_points: bool, tau, eps1, eps2, loss: str, huber_param,
               solver: str, window: int = 0,
               group_pts: int = 0) -> "LMState":
    """Continue a resumable LM run up to iteration `it_hi`."""
    _, _, _, _, _, _, st = _lm_loop(
        prob, max_iters, fix_points, tau, eps1, eps2, loss, huber_param,
        solver, state0=tuple(state), it_hi=it_hi, window=window,
        group_pts=group_pts)
    return LMState(*st)


# Per-execution wall-clock budget for one device program, seconds.  The
# remote-TPU (axon) runtime kills the worker outright when a single
# execution runs much past ~60-80 s (measured: a 150-iteration 256-camera
# LM died at 79 s; 30/60-iteration runs of the same shape succeed), so the
# chunked driver sizes each dispatch to stay well below that.  On local
# hardware the chunking costs only ~one dispatch per chunk.
_EXEC_TARGET_S = float(os.environ.get("BUNDLER_BA_EXEC_TARGET_S", "25"))

# Estimated-work threshold (Cp · O_pad · max_iters) above which run_sfm and
# run_ba_chunked split the LM into multiple device executions.
_FUSED_WORK_BUDGET = float(os.environ.get("BUNDLER_BA_FUSED_BUDGET", "8e12"))


def run_ba_chunked(prob: BAProblem, max_iters: int = 150,
                   fix_points: bool = False,
                   tau: float = 1e-3, eps1: float = 1e-10,
                   eps2: float = 1e-12, loss: str = "l2",
                   huber_param: float = 25.0, solver: str = "cholesky",
                   first_chunk: int = 15, window: int = 0,
                   group_pts: int = 0) -> BAResult:
    """run_ba split across multiple device executions (state stays
    device-resident between chunks; only `it`/`done` round-trip).  The
    chunk size adapts to the measured per-iteration wall time so each
    dispatch stays under _EXEC_TARGET_S."""
    import time as _time
    t0 = _time.perf_counter()
    chunk = min(first_chunk, max_iters)
    cost0, st = _lm_start(prob, jnp.int32(chunk), max_iters, fix_points,
                          tau, eps1, eps2, loss, huber_param, solver,
                          window, group_pts)
    it = int(st.it)
    done = bool(st.done)
    wall = _time.perf_counter() - t0
    while it < max_iters and not done:
        per_iter = wall / max(it, 1)
        chunk = max(5, min(int(_EXEC_TARGET_S / max(per_iter, 1e-3)),
                           max_iters - it))
        t0 = _time.perf_counter()
        st = _lm_resume(prob, st, jnp.int32(it + chunk), max_iters,
                        fix_points, tau, eps1, eps2, loss, huber_param,
                        solver, window, group_pts)
        new_it = int(st.it)
        done = bool(st.done)
        wall = _time.perf_counter() - t0
        it = new_it if new_it > it else it + chunk   # forward progress
    cam = st.cam
    R = jax.vmap(rot_update)(prob.R0, cam[:, 3:6])
    return BAResult(cam=cam.at[:, 3:6].set(0.0), R=R, pts=st.pts,
                    cost=st.cost, initial_cost=cost0, iters=st.it, mu=st.mu)


# --------------------------------------------------------------------------
# Fused BA + outlier-removal loop (RunSFM's re-bundle loop, on device)
# --------------------------------------------------------------------------


def _pass_stats_core(prob: BAProblem, cam_obs, cam_obs_mask, cam, pts, R,
                     ov, outlier_factor, min_thresh, max_thresh,
                     axis: Optional[str], window: int = 0,
                     group_pts: int = 0):
    """Per-camera reprojection stats on the CURRENT obs_valid set
    (`src/Bundle.cpp:659-850`): per-obs distances, p80 threshold with the
    [min, max] clamp, mean, and the 10-bin histograms."""
    dtype = prob.cam0.dtype
    C = prob.cam0.shape[0]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    p = prob._replace(obs_valid=ov)
    pred, _ = _predict_obs(cam, pts, R, p, window, group_pts)
    d = jnp.linalg.norm(pred - prob.obs_xy, axis=1)       # [O]
    # With `axis` set, cam_obs indexes the SHARD-LOCAL slot layout: each
    # device gathers its own [C, S_local] distance/validity tables and ONE
    # tiled all_gather along the slot axis assembles [C, D·S_local] —
    # instead of all_gathering the full [D·O_pad] distance array every pass
    # and gathering from it through a replicated global table (O(total obs)
    # per-device memory on the path meant for the largest problems).
    dc = d[cam_obs]                                        # [C,S_local]
    vm = cam_obs_mask & ov[cam_obs]
    if axis is not None:
        dc = jax.lax.all_gather(dc, axis, axis=1, tiled=True)
        vm = jax.lax.all_gather(vm, axis, axis=1, tiled=True)
    dmask = jnp.where(vm, dc, big)
    dsort = jnp.sort(dmask, axis=1)
    n = jnp.sum(vm, axis=1)                                # [C]
    # kth_element at round(0.8·n) (src/Bundle.cpp:762-766).
    k = jnp.clip(jnp.round(0.8 * n).astype(jnp.int32), 0,
                 jnp.maximum(n - 1, 0))
    p80 = jnp.where(n > 0, dsort[jnp.arange(C), k], 0.0)
    thresh = jnp.clip(outlier_factor * p80, min_thresh, max_thresh)
    mean = jnp.where(n > 0,
                     jnp.sum(jnp.where(vm, dc, 0.0), axis=1)
                     / jnp.maximum(n, 1), 0.0)
    # 10-bin histogram between per-camera min/max, cumulative "<= edge"
    # binning like the OUTPUT_VERBOSE_STATS block (Bundle.cpp:823-846).
    pr_min = jnp.where(n > 0, dsort[:, 0], 0.0)
    pr_max = jnp.where(n > 0, dsort[jnp.arange(C),
                                    jnp.maximum(n - 1, 0)], 0.0)
    step = (pr_max - pr_min) / 10.0
    edges = pr_min[:, None] + step[:, None] * \
        jnp.arange(1, 11, dtype=dtype)[None, :]            # [C,10]
    le = (dmask[:, :, None] <= edges[:, None, :]) & vm[:, :, None]
    cum = jnp.sum(le, axis=1).astype(jnp.int32)            # [C,10]
    cum = cum.at[:, 9].set(n.astype(jnp.int32))  # top edge fp guard
    bins = jnp.diff(cum, prepend=0, axis=1)
    stats = jnp.stack([n.astype(dtype), mean, p80, thresh], axis=1)
    return d, thresh, stats, bins, jnp.stack([pr_min, pr_max], axis=1)

class BAOutlierResult(NamedTuple):
    """Result of the fused multi-pass BA + outlier-removal program."""
    cam: jnp.ndarray          # [C,9] final params (w folded)
    R: jnp.ndarray            # [C,3,3]
    pts: jnp.ndarray          # [P,3]
    obs_valid: jnp.ndarray    # [O] final observation liveness
    pt_removed: jnp.ndarray   # [P] True where the point was removed
    passes: jnp.ndarray       # number of BA passes run
    iters: jnp.ndarray        # total LM iterations across passes
    n_outliers: jnp.ndarray   # [max_passes] outlier points found per pass
    stats: jnp.ndarray        # [max_passes, C, 4]: nobs, mean, p80, thresh
    hist: jnp.ndarray         # [max_passes, C, 10] int32 error-bin counts
    hist_edges: jnp.ndarray   # [max_passes, C, 2]: per-camera min/max error
    avg_dist: jnp.ndarray     # mean reprojection error, final pass
    too_few: jnp.ndarray      # True if live points dropped below min_points
    cost: jnp.ndarray         # final pass cost
    initial_cost: jnp.ndarray  # first pass initial cost


def build_cam_obs_table(obs_cam: np.ndarray, obs_pt: np.ndarray,
                        num_cams: int,
                        pad_slots: Optional[int] = None,
                        max_views: Optional[int] = None,
                        view_buckets: Optional[
                            Tuple[Tuple[int, int], ...]] = None,
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side static inversion of obs_cam: [C, S] SLOT-LAYOUT observation
    rows per camera + mask (ids match build_problem's p·M+k layout — pass
    the same `max_views`, or leave None to use the per-point max like
    build_problem does; pass the same `view_buckets` for the bucketed
    layout).  Feeds the per-camera reprojection statistics
    (`src/Bundle.cpp:659-850`) on device."""
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    if view_buckets is not None:
        sid = slot_ids_bucketed(obs_pt, view_buckets)
    else:
        pcounts = np.bincount(obs_pt) if len(obs_pt) else np.zeros(0, int)
        M = max_views or max(1, int(pcounts.max()) if len(obs_pt) else 1)
        sid = slot_ids(obs_pt, M)
    counts = np.bincount(obs_cam, minlength=num_cams)
    S = pad_slots or max(1, int(counts.max()))
    if len(obs_cam) and counts.max() > S:
        raise ValueError(f"camera has {counts.max()} obs > pad_slots={S}")
    table = np.zeros((num_cams, S), dtype=np.int32)
    mask = np.zeros((num_cams, S), dtype=bool)
    order = np.argsort(obs_cam, kind="stable")
    slot = np.concatenate([np.arange(c) for c in counts]) \
        if len(obs_cam) else np.zeros(0, np.int64)
    table[obs_cam[order], slot] = sid[order]
    mask[obs_cam[order], slot] = True
    return table, mask


def _outlier_loop_core(
    prob: BAProblem, cam_obs: jnp.ndarray, cam_obs_mask: jnp.ndarray,
    max_iters: int, fix_points: bool, tau, eps1, eps2,
    loss: str, huber_param, solver: str,
    outlier_factor, min_thresh, max_thresh, min_outliers: int,
    min_points: int, max_passes: int, remove_outliers: bool,
    axis: Optional[str] = None,
    window: int = 0, group_pts: int = 0,
) -> BAOutlierResult:
    """`RunSFM_SBA`'s full outer loop — BA, per-camera reprojection stats,
    adaptive outlier threshold, point removal, re-bundle while more than
    `min_outliers` points were removed (`src/Bundle.cpp:568-919`) — as ONE
    device program.  The reference (and round-1's host driver) re-marshaled
    the whole problem per pass; here the removal is an obs_valid mask update
    carried through a lax.while_loop, so a reconstruction round costs one
    dispatch instead of one per re-bundle.

    outlier_factor = 1.2 · outlier_num_stddev (the 1.2·2·p80 rule,
    `src/Bundle.cpp:762-771`); per-camera thresholds clamp to
    [min_thresh, max_thresh].  Constrained points are never removed
    (`src/Bundle.cpp:798-803`).

    With `axis` set (shard-local prob inside shard_map; see _lm_loop), the
    per-camera stats all_gather the per-observation distances — cam_obs must
    then index the CONCATENATED layout (global obs id = shard·O_pad + local).
    """
    dtype = prob.cam0.dtype
    C = prob.cam0.shape[0]
    O = prob.obs_cam.shape[0]

    def pass_stats(cam, pts, R, ov):
        return _pass_stats_core(prob, cam_obs, cam_obs_mask, cam, pts, R,
                                ov, outlier_factor, min_thresh, max_thresh,
                                axis, window, group_pts)

    def body(st):
        (cam, pts, R0c, ov, removed, pass_i, n_out, stats_b, hist_b,
         edge_b, nout_b, iters_tot, avg, cost_f, cost_i, too_few, live) = st

        def run_pass(_):
            p = prob._replace(R0=R0c, cam0=cam, pts0=pts, obs_valid=ov)
            cam1, pts1, cost, cost0, iters, _, _st = _lm_loop(
                p, max_iters, fix_points, tau, eps1, eps2, loss,
                huber_param, solver, axis=axis, window=window,
                group_pts=group_pts)
            # Fold w into the carried base rotations for the next pass.
            R1 = jax.vmap(rot_update)(R0c, cam1[:, 3:6])
            cam1 = cam1.at[:, 3:6].set(0.0)
            d, thresh, stats, bins, edges = pass_stats(cam1, pts1, R1, ov)
            bad_obs = ov & (d > thresh[prob.obs_cam])
            bad_pt = _point_any(
                prob.views_mask.reshape(-1) & bad_obs, prob)
            # Constrained points are kept (src/Bundle.cpp:798-803).
            bad_pt = bad_pt & ~((prob.pt_constrained > 0)
                                & (prob.pt_weight > 0))
            n_o = _psum(jnp.sum(bad_pt), axis).astype(jnp.int32)
            if remove_outliers:
                ov1 = ov & ~_pt_expand(bad_pt, prob)
                removed1 = removed | bad_pt
            else:
                ov1, removed1 = ov, removed
            nvalid = _psum(jnp.sum(ov), axis)
            avg1 = _psum(jnp.sum(jnp.where(ov, d, 0.0)), axis) \
                / jnp.maximum(nvalid, 1)
            return (cam1, pts1, R1, ov1, removed1, n_o, stats, bins, edges,
                    iters, avg1, cost, cost0)

        n_live = _psum(jnp.sum(_point_any(
            prob.views_mask.reshape(-1) & ov, prob)), axis)
        ok = n_live >= min_points
        # Run the pass unconditionally and select: ok is False at most once
        # (the too-few-points exit), and value-selects keep branch types
        # identical under shard_map's varying-axis tracking (lax.cond would
        # need both branches to agree on which outputs are device-varying).
        (cam1, pts1, R1, ov1, removed1, n_o, stats, bins, edges, iters1,
         avg1, cost1, cost0) = run_pass(None)
        sel = lambda new, old: jnp.where(ok, new, old)
        cam = sel(cam1, cam)
        pts = sel(pts1, pts)
        R0c = sel(R1, R0c)
        ov = sel(ov1, ov)
        removed = sel(removed1, removed)
        n_o = sel(n_o, jnp.int32(0))
        stats = sel(stats, jnp.zeros((C, 4), dtype))
        bins = sel(bins, jnp.zeros((C, 10), jnp.int32))
        edges = sel(edges, jnp.zeros((C, 2), dtype))
        iters = sel(iters1, jnp.int32(0))
        avg = sel(avg1, avg)
        cost = sel(cost1, cost_f)
        zi = jnp.int32(0)
        stats_b = jax.lax.dynamic_update_slice(stats_b, stats[None],
                                               (pass_i, zi, zi))
        hist_b = jax.lax.dynamic_update_slice(hist_b, bins[None],
                                              (pass_i, zi, zi))
        edge_b = jax.lax.dynamic_update_slice(edge_b, edges[None],
                                              (pass_i, zi, zi))
        nout_b = jax.lax.dynamic_update_slice(nout_b, n_o[None], (pass_i,))
        cost_i = jnp.where(pass_i == 0, cost0, cost_i)
        return (cam, pts, R0c, ov, removed,
                pass_i + jnp.where(ok, jnp.int32(1), jnp.int32(0)), n_o,
                stats_b, hist_b, edge_b,
                nout_b, iters_tot + iters, avg, cost, cost_i,
                too_few | ~ok, ok)

    def cond(st):
        pass_i, n_out = st[5], st[6]
        too_few = st[15]
        first = pass_i == 0
        more = (n_out > min_outliers) if remove_outliers else \
            jnp.asarray(False)
        return ~too_few & (first | ((pass_i < max_passes) & more))

    z = jnp.zeros
    st0 = (prob.cam0, prob.pts0, prob.R0, prob.obs_valid,
           z(prob.pts0.shape[0], dtype=bool), jnp.int32(0), jnp.int32(0),
           z((max_passes, C, 4), dtype), z((max_passes, C, 10), jnp.int32),
           z((max_passes, C, 2), dtype), z(max_passes, jnp.int32),
           jnp.int32(0), jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
           jnp.asarray(0.0, dtype), jnp.asarray(False), jnp.asarray(True))
    (cam, pts, R0c, ov, removed, passes, _, stats_b, hist_b, edge_b,
     nout_b, iters_tot, avg, cost_f, cost_i, too_few, _) = \
        jax.lax.while_loop(cond, body, st0)

    return BAOutlierResult(
        cam=cam, R=R0c, pts=pts, obs_valid=ov, pt_removed=removed,
        passes=passes, iters=iters_tot, n_outliers=nout_b, stats=stats_b,
        hist=hist_b, hist_edges=edge_b, avg_dist=avg, too_few=too_few,
        cost=cost_f, initial_cost=cost_i)


@functools.partial(jax.jit, static_argnames=(
    "max_iters", "fix_points", "loss", "solver", "max_passes",
    "remove_outliers", "window", "group_pts"))
def run_ba_outlier_loop(
    prob: BAProblem, cam_obs: jnp.ndarray, cam_obs_mask: jnp.ndarray,
    max_iters: int = 150, fix_points: bool = False,
    tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
    loss: str = "l2", huber_param: float = 25.0, solver: str = "cholesky",
    outlier_factor: float = 2.4, min_thresh: float = 8.0,
    max_thresh: float = 16.0, min_outliers: int = 40, min_points: int = 8,
    max_passes: int = 8, remove_outliers: bool = True,
    window: int = 0, group_pts: int = 0,
) -> BAOutlierResult:
    """Single-device entry for the fused BA + outlier-removal loop; see
    _outlier_loop_core.  The point-sharded variant is
    parallel/ba_sharded.py run_ba_outlier_loop_sharded."""
    return _outlier_loop_core(
        prob, cam_obs, cam_obs_mask, max_iters, fix_points, tau, eps1,
        eps2, loss, huber_param, solver, outlier_factor, min_thresh,
        max_thresh, min_outliers, min_points, max_passes, remove_outliers,
        axis=None, window=window, group_pts=group_pts)


@functools.partial(jax.jit, static_argnames=("remove_outliers", "window",
                                             "group_pts"))
def _pass_stats_jit(prob: BAProblem, cam_obs, cam_obs_mask, cam, pts, R,
                    ov, outlier_factor, min_thresh, max_thresh,
                    remove_outliers: bool, window: int = 0,
                    group_pts: int = 0):
    """One post-BA pass of RunSFM's stats + outlier removal as its own
    program (used by the chunked host-driven loop)."""
    d, thresh, stats, bins, edges = _pass_stats_core(
        prob, cam_obs, cam_obs_mask, cam, pts, R, ov, outlier_factor,
        min_thresh, max_thresh, axis=None, window=window,
        group_pts=group_pts)
    bad_obs = ov & (d > thresh[prob.obs_cam])
    bad_pt = _point_any(prob.views_mask.reshape(-1) & bad_obs, prob)
    bad_pt = bad_pt & ~((prob.pt_constrained > 0) & (prob.pt_weight > 0))
    n_o = jnp.sum(bad_pt).astype(jnp.int32)
    if remove_outliers:
        ov1 = ov & ~_pt_expand(bad_pt, prob)
    else:
        ov1 = ov
    nvalid = jnp.sum(ov)
    avg = jnp.sum(jnp.where(ov, d, 0.0)) / jnp.maximum(nvalid, 1)
    n_live = jnp.sum(_point_any(prob.views_mask.reshape(-1) & ov1,
                                prob))
    return stats, bins, edges, ov1, bad_pt, n_o, avg, n_live


def run_ba_outlier_loop_chunked(
    prob: BAProblem, cam_obs: jnp.ndarray, cam_obs_mask: jnp.ndarray,
    max_iters: int = 150, fix_points: bool = False,
    tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
    loss: str = "l2", huber_param: float = 25.0, solver: str = "cholesky",
    outlier_factor: float = 2.4, min_thresh: float = 8.0,
    max_thresh: float = 16.0, min_outliers: int = 40, min_points: int = 8,
    max_passes: int = 8, remove_outliers: bool = True,
    window: int = 0, group_pts: int = 0,
) -> BAOutlierResult:
    """Host-driven variant of run_ba_outlier_loop for problems whose fused
    program would exceed the per-execution limit of the backend (see
    _EXEC_TARGET_S): each pass runs the LM via run_ba_chunked (a few
    device executions) plus one stats/removal program.  Same semantics and
    result type as the fused loop; a handful of dispatches per pass instead
    of one per reconstruction round."""
    dtype = np.dtype(prob.cam0.dtype).type
    C = prob.cam0.shape[0]
    R0c = prob.R0
    cam = prob.cam0
    pts = prob.pts0
    ov = prob.obs_valid
    removed = jnp.zeros(prob.pts0.shape[0], bool)
    stats_b = np.zeros((max_passes, C, 4), dtype)
    hist_b = np.zeros((max_passes, C, 10), np.int32)
    edge_b = np.zeros((max_passes, C, 2), dtype)
    nout_b = np.zeros(max_passes, np.int32)
    iters_tot = 0
    cost_i = None
    cost_f = avg = 0.0
    too_few = False
    passes = 0
    while passes < max_passes:
        n_live0 = int(jnp.sum(_point_any(
            prob.views_mask.reshape(-1) & ov, prob)))
        if n_live0 < min_points:
            too_few = True
            break
        p = prob._replace(R0=R0c, cam0=cam, pts0=pts, obs_valid=ov)
        res = run_ba_chunked(p, max_iters=max_iters, fix_points=fix_points,
                             tau=tau, eps1=eps1, eps2=eps2, loss=loss,
                             huber_param=huber_param, solver=solver,
                             window=window, group_pts=group_pts)
        cam, pts, R0c = res.cam, res.pts, res.R
        iters_tot += int(res.iters)
        if cost_i is None:
            cost_i = float(res.initial_cost)
        cost_f = float(res.cost)
        stats, bins, edges, ov, bad_pt, n_o, avg_j, _ = _pass_stats_jit(
            prob, cam_obs, cam_obs_mask, cam, pts, R0c, ov,
            jnp.asarray(outlier_factor, prob.obs_xy.dtype),
            jnp.asarray(min_thresh, prob.obs_xy.dtype),
            jnp.asarray(max_thresh, prob.obs_xy.dtype), remove_outliers,
            window=window, group_pts=group_pts)
        if remove_outliers:
            removed = removed | bad_pt
        stats_b[passes] = np.asarray(stats)
        hist_b[passes] = np.asarray(bins)
        edge_b[passes] = np.asarray(edges)
        n_out = int(n_o)
        nout_b[passes] = n_out
        avg = float(avg_j)
        passes += 1
        if not remove_outliers or n_out <= min_outliers:
            break
    z = jnp.asarray
    return BAOutlierResult(
        cam=cam, R=R0c, pts=pts, obs_valid=ov, pt_removed=removed,
        passes=z(np.int32(passes)), iters=z(np.int32(iters_tot)),
        n_outliers=z(nout_b), stats=z(stats_b), hist=z(hist_b),
        hist_edges=z(edge_b), avg_dist=z(dtype(avg)),
        too_few=z(too_few), cost=z(dtype(cost_f)),
        initial_cost=z(dtype(cost_i if cost_i is not None else 0.0)))
