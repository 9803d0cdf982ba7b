"""Nistér 5-point essential-matrix minimal solver — batched for TPU.

Replaces `lib/5point/5point.c` (nullspace basis `:36`, constraint polynomial
system + Gauss-Jordan `:80-484`, `compute_pose_ransac` `:606`).  The
reference eliminates to a Gröbner action matrix and runs a dense
eigensolver; nonsymmetric eig doesn't exist on TPU, so this implementation
follows Nistér's original reduction to a single degree-10 polynomial:

  1. nullspace basis of the 5x9 epipolar constraint matrix (batched SVD):
     E = x·B0 + y·B1 + z·B2 + B3
  2. the 10 cubic constraints det(E)=0, 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0 expanded
     over the 20 degree-≤3 monomials in (x, y, z)
  3. Gauss-Jordan (one batched 10x10 solve) → tail rows; the row pairs
     (x²z, x²), (y²z, y²), (xyz, xy) combine as r − z·r' into a 3x3 system
     B(z)·[x, y, 1]ᵀ = 0 with polynomial entries
  4. det B(z): the degree-10 polynomial, solved with Durand-Kerner — a
     fixed-iteration, fully-vectorized complex root finder (VPU-friendly,
     no data-dependent control flow)
  5. x, y from the null vector of B(z₀); E assembled per real root.

All stages vmap over RANSAC samples; scoring is one [samples·roots, N]
masked reduction, exactly the hypothesize-and-verify the reference does
sequentially.

Input convention matches `compute_pose_ransac`: NEGATED normalized ray
coords (the sign flip at `5point.c` compute_pose_ransac), so recovered
(R, t) land directly in the bundler -z convention.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.linalg_small import lu_solve


def _rabs(x):
    """f64 abs as max(x, -x) — TPU x64-rewriter-safe."""
    return jnp.maximum(x, -x)
import numpy as np

from bundler_sfm_tpu.ops.essential import _M, decompose_essential_multipt
from bundler_sfm_tpu.ops.fmatrix import fmatrix_residual
from bundler_sfm_tpu.ops.ransac import exact_matmuls, sample_indices

# ---------------------------------------------------------------------------
# Monomial bookkeeping (static, built at import time)
# ---------------------------------------------------------------------------

# Degree <=1 basis for E's entries: coefficients over [x, y, z, 1].
_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
# Degree <=2 monomials (10).
_DEG2 = sorted({tuple(map(sum, zip(a, b)))
                for a in _DEG1 for b in _DEG1}, reverse=True)
# Degree <=3 monomials (20), ordered so the first 10 are the Gauss-Jordan
# pivots and the last 10 factor as {x, y, 1} × z-polynomials.
_DEG3_FIRST = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
               (0, 2, 1), (1, 1, 1), (2, 0, 0), (0, 2, 0), (1, 1, 0)]
_DEG3_LAST = [(1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
              (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]
_DEG3 = _DEG3_FIRST + _DEG3_LAST
_DEG2_IDX = {m: i for i, m in enumerate(_DEG2)}
_DEG3_IDX = {m: i for i, m in enumerate(_DEG3)}

# Index tables for polynomial products (unrolled smalls, built once).
_MUL11 = [(i, j, _DEG2_IDX[tuple(map(sum, zip(a, b)))])
          for i, a in enumerate(_DEG1) for j, b in enumerate(_DEG1)]
_MUL21 = [(i, j, _DEG3_IDX[tuple(map(sum, zip(a, b)))])
          for i, a in enumerate(_DEG2) for j, b in enumerate(_DEG1)
          if tuple(map(sum, zip(a, b))) in _DEG3_IDX]


def _mul11(p, q):
    """deg1 [.., 4] x deg1 [.., 4] -> deg2 [.., 10]."""
    out = jnp.zeros(p.shape[:-1] + (10,), dtype=p.dtype)
    for i, j, k in _MUL11:
        out = out.at[..., k].add(p[..., i] * q[..., j])
    return out


def _mul21(p, q):
    """deg2 [.., 10] x deg1 [.., 4] -> deg3 [.., 20]."""
    out = jnp.zeros(p.shape[:-1] + (20,), dtype=p.dtype)
    for i, j, k in _MUL21:
        out = out.at[..., k].add(p[..., i] * q[..., j])
    return out


# ---------------------------------------------------------------------------
# Constraint system
# ---------------------------------------------------------------------------

def _nullspace_basis(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """[5,2] ray coords each -> E basis [4, 3, 3]: q2ᵀ E q1 = 0 rows."""
    h1 = jnp.concatenate([q1, jnp.ones_like(q1[:, :1])], axis=1)  # [5,3]
    h2 = jnp.concatenate([q2, jnp.ones_like(q2[:, :1])], axis=1)
    # Row for obs k: kron(h2_k, h1_k) so that row · vec(E) = h2ᵀ E h1.
    Q = jnp.einsum("ki,kj->kij", h2, h1).reshape(5, 9)
    from bundler_sfm_tpu.ops.svd_utils import nullspace_rows
    ns = nullspace_rows(Q, 4)          # 4 smallest right-singular vectors
    return ns.reshape(4, 3, 3)         # order: x, y, z, 1 basis


def _constraint_matrix(B: jnp.ndarray) -> jnp.ndarray:
    """Basis [4,3,3] -> M [10,20] over the DEG3 monomials.

    Row 0: det(E) = 0.  Rows 1-9: 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0.
    E entries as deg-1 polys: Ee [3,3,4] with Ee[i,j] = [B0,B1,B2,B3][i,j].
    """
    Ee = jnp.stack([B[0], B[1], B[2], B[3]], axis=-1)  # [3,3,4]

    # det(E): sum over permutations.
    det = jnp.zeros(20, dtype=B.dtype)
    for perm, sign in (((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                       ((0, 2, 1), -1), ((2, 1, 0), -1), ((1, 0, 2), -1)):
        p2 = _mul11(Ee[0, perm[0]], Ee[1, perm[1]])
        det = det + sign * _mul21(p2, Ee[2, perm[2]])

    # EEt[i,j] = sum_k E[i,k] E[j,k]  (deg2).
    EEt = jnp.zeros((3, 3, 10), dtype=B.dtype)
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros(10, dtype=B.dtype)
            for k in range(3):
                acc = acc + _mul11(Ee[i, k], Ee[j, k])
            EEt = EEt.at[i, j].set(acc)
    trace = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]

    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros(20, dtype=B.dtype)
            for k in range(3):
                acc = acc + 2.0 * _mul21(EEt[i, k], Ee[k, j])
            acc = acc - _mul21(trace, Ee[i, j])
            rows.append(acc)
    return jnp.stack(rows)  # [10, 20]


def _z_poly_system(M: jnp.ndarray):
    """Gauss-Jordan + row combination -> Bz [3, 3, 11] polynomial matrix.

    Bz[r, c] are z-polynomial coefficients (low-to-high, padded to 11) of
    the 3x3 system B(z)·[x, y, 1]ᵀ = 0.
    """
    A = M[:, :10]
    Bm = M[:, 10:]
    # tail[i] = coefficients of pivot-monomial-i's expression (negated tail):
    # monomial_i = -tail[i] · last10.
    tail = lu_solve(A, Bm)  # [10, 10]  (TPU has no f64 LU — linalg_small)

    def row_combo(rz_idx, r_idx):
        """eq(pivot with z) − z·eq(pivot): group last10 into x/y/1 z-polys."""
        t1 = tail[rz_idx]   # coefficients multiplying last10, eq: piv + t1·L = 0
        t2 = tail[r_idx]
        # x-group coeffs over (xz², xz, x) = z-poly [c0=x, c1=xz, c2=xz²].
        def zpoly(t, base):
            return jnp.array([t[base + 2], t[base + 1], t[base + 0]])
        # constant group over (z³, z², z, 1) -> [1, z, z², z³].
        def zpoly1(t):
            return jnp.array([t[9], t[8], t[7], t[6]])

        out = jnp.zeros((3, 11), dtype=M.dtype)
        for col, (base, deg) in enumerate(((0, 3), (3, 3), (None, 4))):
            if base is not None:
                p1 = zpoly(t1, base)
                p2 = zpoly(t2, base)
            else:
                p1 = zpoly1(t1)
                p2 = zpoly1(t2)
            # combo(z) = p1(z) − z·p2(z).
            n = p1.shape[0]
            combo = jnp.zeros(n + 1, dtype=M.dtype)
            combo = combo.at[:n].add(p1)
            combo = combo.at[1:n + 1].add(-p2)
            out = out.at[col, :n + 1].set(combo)
        return out

    # Pivot order (first10): [x³, y³, x²y, xy², x²z, y²z, xyz, x², y², xy].
    k = row_combo(4, 7)   # x²z − z·x²
    l = row_combo(5, 8)   # y²z − z·y²
    m = row_combo(6, 9)   # xyz − z·xy
    return jnp.stack([k, l, m])  # [3 rows, 3 cols(x,y,1), 11]


def _polymul(a, b, out_len):
    n = a.shape[0] + b.shape[0] - 1
    full = jnp.convolve(a, b)
    return full[:out_len] if n >= out_len else jnp.pad(full,
                                                       (0, out_len - n))


def _det_poly(Bz: jnp.ndarray) -> jnp.ndarray:
    """det of the 3x3 polynomial matrix -> degree-10 coeffs [11]."""
    def m2(r1, c1, r2, c2):
        return (_polymul(Bz[r1, c1], Bz[r2, c2], 11) -
                _polymul(Bz[r1, c2], Bz[r2, c1], 11))
    det = (_polymul(Bz[0, 0], m2(1, 1, 2, 2), 11)
           - _polymul(Bz[0, 1], m2(1, 0, 2, 2), 11)
           + _polymul(Bz[0, 2], m2(1, 0, 2, 1), 11))
    return det


class _Roots(NamedTuple):
    """Complex roots as split f64 components — the TPU x64 rewriter (f64
    emulation) cannot lower c128 at all (no f64→c128 convert, no complex
    abs / multiply-reduce), so the root finder carries (real, imag) f64
    pairs and spells out the complex arithmetic."""
    real: jnp.ndarray
    imag: jnp.ndarray


def _durand_kerner(coeffs: jnp.ndarray, iters: int = 80) -> _Roots:
    """All roots of a degree-10 REAL polynomial (coeffs low->high [11]).

    Fixed-iteration simultaneous root finder; fully vectorized split-complex
    f64 arithmetic — ideal for TPU (no pivoting, no data-dependent loops).
    """
    lead = coeffs[10]
    # Guard degenerate leading coefficient.
    lead = jnp.where(_rabs(lead) < 1e-30, 1e-30, lead)
    cn = coeffs / lead                              # real [11]

    def horner(zr, zi):
        vr = jnp.zeros_like(zr)
        vi = jnp.zeros_like(zi)
        for k in range(10, -1, -1):
            vr, vi = vr * zr - vi * zi + cn[k], vr * zi + vi * zr
        return vr, vi

    # Initial guesses on a circle (Aberth's standard init).
    k = jnp.arange(10, dtype=coeffs.dtype)
    radius = jnp.sqrt(1.0 + jnp.max(_rabs(cn[:10])))
    theta = 2.0 * jnp.pi * (k + 0.35) / 10.0
    zr = radius * jnp.cos(theta)
    zi = radius * jnp.sin(theta)

    eye10 = jnp.eye(10, dtype=bool)

    def step(z, _):
        zr, zi = z
        pr, pi = horner(zr, zi)
        dr = zr[:, None] - zr[None, :]
        di = zi[:, None] - zi[None, :]
        dr = jnp.where(eye10, 1.0, dr)
        di = jnp.where(eye10, 0.0, di)
        # Unrolled complex product over the 10 pairwise differences.
        nr, ni = dr[:, 0], di[:, 0]
        for i in range(1, 10):
            nr, ni = nr * dr[:, i] - ni * di[:, i], \
                nr * di[:, i] + ni * dr[:, i]
        mag = nr * nr + ni * ni
        bad = mag < 1e-60
        nr = jnp.where(bad, 1e-30, nr)
        ni = jnp.where(bad, 0.0, ni)
        mag = jnp.where(bad, 1e-60, mag)
        # z_new = z - p/denom  (complex division, split form).
        qr = (pr * nr + pi * ni) / mag
        qi = (pi * nr - pr * ni) / mag
        zr_new = zr - qr
        zi_new = zi - qi
        ok = jnp.isfinite(zr_new) & jnp.isfinite(zi_new)
        return (jnp.where(ok, zr_new, zr), jnp.where(ok, zi_new, zi)), None

    (zr, zi), _ = jax.lax.scan(step, (zr, zi), None, length=iters)
    return _Roots(real=zr, imag=zi)


# ---------------------------------------------------------------------------
# Hypothesis generation + RANSAC
# ---------------------------------------------------------------------------

def generate_ematrix_hypotheses(q1: jnp.ndarray, q2: jnp.ndarray):
    """5 correspondences (ray coords [5,2] each) -> (E [10,3,3], valid [10]).

    Complex roots are masked out; every returned E satisfies the epipolar
    constraint for the sample (up to numerics).
    """
    basis = _nullspace_basis(q1, q2)            # [4,3,3]
    M = _constraint_matrix(basis)               # [10,20]
    Bz = _z_poly_system(M)                      # [3,3,11]
    det = _det_poly(Bz)                         # [11]
    roots = _durand_kerner(det)                 # [10] complex
    real_ok = _rabs(roots.imag) < 1e-6 * (1.0 + _rabs(roots.real))
    z = roots.real

    def eval_poly(p, z0):
        val = jnp.zeros_like(z0)
        for k in range(p.shape[0] - 1, -1, -1):
            val = val * z0 + p[k]
        return val

    # B(z0) rows; null vector via cross product of two rows.
    def e_of_root(z0):
        B0 = jnp.stack([jnp.stack([eval_poly(Bz[r, c], z0)
                                   for c in range(3)]) for r in range(3)])
        v = jnp.cross(B0[0], B0[1])
        # Fall back to other row pairs if degenerate.
        v2 = jnp.cross(B0[0], B0[2])
        v3 = jnp.cross(B0[1], B0[2])
        n1, n2, n3 = (jnp.linalg.norm(v), jnp.linalg.norm(v2),
                      jnp.linalg.norm(v3))
        v = jnp.where(n1 >= jnp.maximum(n2, n3), v,
                      jnp.where(n2 >= n3, v2, v3))
        denom = jnp.where(_rabs(v[2]) < 1e-30, 1e-30, v[2])
        x = v[0] / denom
        y = v[1] / denom
        E = x * basis[0] + y * basis[1] + z0 * basis[2] + basis[3]
        norm = jnp.linalg.norm(E)
        return E / jnp.where(norm < 1e-30, 1.0, norm)

    Es = jax.vmap(e_of_root)(z)
    finite = jnp.isfinite(Es).all(axis=(1, 2))
    return Es, real_ok & finite


@functools.partial(jax.jit, static_argnames=("num_rounds",))
@exact_matmuls
def compute_pose_ransac_5pt(key, x1, x2, n_valid, f1, f2, threshold_px,
                            num_rounds: int = 512):
    """The `compute_pose_ransac` replacement (`lib/5point/5point.c:606`).

    x1/x2: [N,2] centered PIXEL coords (padded); threshold_px compared
    against the symmetric epipolar residual in pixel space, squared —
    matching `thresh_norm = ransac_threshold²` + `evaluate_Ematrix` on pixel
    F.  Returns (E_ray best, num_inliers, inlier_mask).
    """
    n_pad = x1.shape[0]
    q1 = -x1 / f1      # ray coords (the compute_pose_ransac sign flip)
    q2 = -x2 / f2
    samples = sample_indices(key, num_rounds, 5, n_valid, n_pad)  # [R,5]
    s1 = q1[samples]
    s2 = q2[samples]
    Es, ok = jax.vmap(generate_ematrix_hypotheses)(s1, s2)  # [R,10,3,3]
    R_, H_ = Es.shape[0], Es.shape[1]
    Es_flat = Es.reshape(R_ * H_, 3, 3)
    ok_flat = ok.reshape(R_ * H_)

    # Pixel-space F for scoring: F = K2⁻ᵀ (M E M) K1⁻¹ (5point.c E2-negation).
    # Built with stack so f1/f2 may be traced (the AOT export cache keeps
    # them as runtime args — baking them in would re-export per focal pair).
    one = jnp.ones_like(q1[0, 0])
    K1i = jnp.diag(jnp.stack([one / f1, one / f1, one]))
    K2i = jnp.diag(jnp.stack([one / f2, one / f2, one]))

    valid = jnp.arange(n_pad) < n_valid
    thr = threshold_px * threshold_px

    def score(E, okh):
        F = K2i @ (_M @ E @ _M) @ K1i
        r = fmatrix_residual(F, x2, x1)
        inl = valid & jnp.isfinite(r) & (r < thr)
        return jnp.where(okh, jnp.sum(inl), -1), inl

    counts, inls = jax.vmap(score)(Es_flat, ok_flat)
    best = jnp.argmax(counts)
    return Es_flat[best], counts[best], inls[best]


def _pose_5point_traced(key, x1, x2, n_valid, f1, f2, threshold_px,
                        num_rounds: int):
    E, cnt, inl = compute_pose_ransac_5pt(key, x1, x2, n_valid, f1, f2,
                                          threshold_px, num_rounds)
    mask = (jnp.arange(x1.shape[0]) < n_valid) & inl
    R, t, ok = decompose_essential_multipt(E, -x1 / f1, -x2 / f2, mask)
    return R, t, cnt, ok & (cnt > 0)


def estimate_pose_5point(key, x1, x2, n_valid, f1, f2, threshold_px,
                         num_rounds: int = 512):
    """`EstimatePose5Point` (`src/Epipolar.cpp:87-114`): 5-point RANSAC then
    (R, t) extraction with multi-point cheirality voting.
    Returns (R, t, num_inliers, ok).

    On non-CPU backends the call goes through the jax.export AOT cache
    (utils/aot_cache.py): this solver's unrolled split-f64 polynomial algebra
    takes MINUTES to lower on the remote-TPU backend, every process, and the
    persistent compile cache cannot skip client-side lowering."""
    dt = x1.dtype
    f1 = jnp.asarray(f1, dt)
    f2 = jnp.asarray(f2, dt)
    threshold_px = jnp.asarray(threshold_px, dt)
    if jax.default_backend() == "cpu":
        return _pose_5point_traced(key, x1, x2, n_valid, f1, f2,
                                   threshold_px, num_rounds)
    from bundler_sfm_tpu.ops import fivepoint as _self
    from bundler_sfm_tpu.ops import essential as _ess
    from bundler_sfm_tpu.utils.aot_cache import cached_export
    return cached_export(
        "pose5pt",
        functools.partial(_pose_5point_traced, num_rounds=num_rounds),
        (key, x1, x2, jnp.asarray(n_valid, jnp.int32), f1, f2, threshold_px),
        statics=(num_rounds,), src_modules=(_self, _ess))
