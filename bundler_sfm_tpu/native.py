"""ctypes bindings to the native C++ runtime components (`native/`).

The reference's I/O and graph layers are C++ (`src/keys2a.cpp`,
`src/ComputeTracks.cpp`); this module exposes their TPU-framework
equivalents — a single-pass key-file tokenizer and the BFS track builder —
with transparent build-on-first-use and pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbundler_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_keyfile.restype = ctypes.c_longlong
        lib.parse_keyfile.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
        ]
        lib.build_tracks_bfs.restype = ctypes.c_longlong
        lib.build_tracks_bfs.argtypes = [
            ctypes.c_int, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.build_tracks_edges.restype = ctypes.c_longlong
        lib.build_tracks_edges.argtypes = [
            ctypes.c_int, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_key_bytes(data: bytes, max_keys: int = 1 << 20
                    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parse decompressed key-file bytes natively; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    info = np.empty((max_keys, 4), dtype=np.float32)
    desc = np.empty((max_keys, 128), dtype=np.uint8)
    n = lib.parse_keyfile(data, len(data), info.reshape(-1),
                          desc.reshape(-1), max_keys)
    if n == -2:
        return parse_key_bytes(data, max_keys * 4)
    if n < 0:
        raise ValueError("malformed key file")
    return info[:n].copy(), desc[:n].copy()


def build_tracks_native(
    matches: Dict[Tuple[int, int], np.ndarray], num_images: int
) -> Optional[List[List[Tuple[int, int]]]]:
    """Native BFS track builder; same contract as
    `pipeline.tracks.build_tracks` (symmetric, pruned matches).
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    # Node space: unique (img, key) encoded as img·2³² + key — int64 sort
    # order equals (img, key) lexicographic.  Fully vectorized: the previous
    # per-match Python dict lookups cost ~8 s at 10⁶ matches (128-image
    # collections); this path is ~10×.
    src_enc_l, dst_enc_l = [], []
    for (i, j), m in matches.items():
        if len(m):
            src_enc_l.append((np.int64(i) << 32) + m[:, 0].astype(np.int64))
            dst_enc_l.append((np.int64(j) << 32) + m[:, 1].astype(np.int64))
    if not src_enc_l:
        return []
    src_enc = np.concatenate(src_enc_l)
    dst_enc = np.concatenate(dst_enc_l)
    # The dict is symmetric, so every endpoint appears as a source.
    # Node enumeration + edge-endpoint resolution via a dense
    # [num_images, max_key+1] lookup table: key indices are bounded by the
    # per-image key count, so the table is small and the O(E) gathers
    # replace 2E binary searches (np.searchsorted was ~4 s at 10^7 edges).
    max_key = int(src_enc & 0xFFFFFFFF) if src_enc.ndim == 0 else \
        int((src_enc & 0xFFFFFFFF).max())
    if max_key < (1 << 22):
        mark = np.zeros(num_images * (max_key + 1), bool)
        flat_src = ((src_enc >> 32) * (max_key + 1)
                    + (src_enc & 0xFFFFFFFF)).astype(np.int64)
        mark[flat_src] = True
        lut = np.full(mark.shape, -1, np.int64)
        node_flat = np.nonzero(mark)[0]
        n_nodes = len(node_flat)
        lut[node_flat] = np.arange(n_nodes)
        nodes_enc = ((node_flat // (max_key + 1)) << 32) \
            + (node_flat % (max_key + 1))
        src = lut[flat_src]
        dmask = dst_enc & 0xFFFFFFFF
        dok = dmask <= max_key
        flat_dst = ((dst_enc >> 32) * (max_key + 1) + dmask)
        dst = np.where(dok, lut[np.where(dok, flat_dst, 0)], -1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
    else:          # degenerate huge key indices: binary-search fallback
        nodes_enc = np.unique(src_enc)
        n_nodes = len(nodes_enc)
        src = np.searchsorted(nodes_enc, src_enc)
        dst = np.searchsorted(nodes_enc, dst_enc)
        ok = nodes_enc[np.minimum(dst, n_nodes - 1)] == dst_enc
        src, dst = src[ok], dst[ok]
    # CSR construction happens native-side (counting sort, stable — each
    # node's neighbor order stays the edge insertion order, preserving the
    # BFS visitation order of the numpy argsort path it replaces).
    out = np.empty(n_nodes, np.int32)
    n_tracks = lib.build_tracks_edges(
        num_images, n_nodes, (nodes_enc >> 32).astype(np.int32),
        len(src), np.ascontiguousarray(src, np.int64),
        np.ascontiguousarray(dst, np.int64), out)
    # Group nodes by track id without a per-node Python loop.
    keep = out >= 0
    ids = out[keep]
    imgs = (nodes_enc[keep] >> 32).astype(np.int64).tolist()
    keys = (nodes_enc[keep] & 0xFFFFFFFF).astype(np.int64).tolist()
    grouped = np.argsort(ids, kind="stable")
    sorted_ids = ids[grouped]
    starts = np.searchsorted(sorted_ids, np.arange(n_tracks))
    ends = np.searchsorted(sorted_ids, np.arange(n_tracks), side="right")
    g = grouped.tolist()
    tracks: List[List[Tuple[int, int]]] = [
        [(imgs[g[k]], keys[g[k]]) for k in range(a, b)]
        for a, b in zip(starts.tolist(), ends.tolist())]
    return tracks
