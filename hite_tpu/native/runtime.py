"""ctypes bindings for the native host runtime (libhite_native.so).

Builds lazily with `make` on first use (g++ is part of the toolchain);
falls back to the pure-Python paths when unavailable.  Exposes:
  read_fasta(path) -> {name: uint8 codes}   (mmap + one-pass encode)
  merge_intervals(iv, gap) -> merged int64 [M, 2]
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhite_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _FastaResult(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("seq_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("names", ctypes.POINTER(ctypes.c_char)),
        ("name_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("n_seqs", ctypes.c_int64),
        ("total_len", ctypes.c_int64),
        ("names_len", ctypes.c_int64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    srcs = [os.path.join(_DIR, f) for f in os.listdir(_DIR)
            if f.endswith(".cc")]
    stale = os.path.exists(_SO) and any(
        os.path.getmtime(s) > os.path.getmtime(_SO) for s in srcs)
    if not os.path.exists(_SO) or stale:
        try:
            subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO):
                return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.fasta_read.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.POINTER(_FastaResult))]
        lib.fasta_read.restype = ctypes.c_int
        lib.fasta_free.argtypes = [ctypes.POINTER(_FastaResult)]
        lib.intervals_merge.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64]
        lib.intervals_merge.restype = ctypes.c_int64
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_fasta(path: str) -> Dict[str, np.ndarray]:
    lib = _load()
    assert lib is not None
    out = ctypes.POINTER(_FastaResult)()
    rc = lib.fasta_read(path.encode(), ctypes.byref(out))
    if rc != 0:
        raise OSError(f"fasta_read({path}) failed with {rc}")
    try:
        r = out.contents
        n = int(r.n_seqs)
        codes = np.ctypeslib.as_array(r.codes, shape=(max(int(r.total_len), 1),))
        seq_off = np.ctypeslib.as_array(r.seq_offsets, shape=(n + 1,))
        names_raw = ctypes.string_at(r.names, int(r.names_len))
        name_off = np.ctypeslib.as_array(r.name_offsets, shape=(n + 1,))
        result: Dict[str, np.ndarray] = {}
        for i in range(n):
            name = names_raw[int(name_off[i]) : int(name_off[i + 1]) - 1].decode()
            result[name] = codes[int(seq_off[i]) : int(seq_off[i + 1])].copy()
        return result
    finally:
        lib.fasta_free(out)


def merge_intervals(iv: np.ndarray, gap: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    iv = np.ascontiguousarray(iv, dtype=np.int64)
    if len(iv) == 0:
        return iv.reshape(-1, 2)
    starts = np.ascontiguousarray(iv[:, 0])
    ends = np.ascontiguousarray(iv[:, 1])
    m = lib.intervals_merge(
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(iv), gap)
    return np.stack([starts[:m], ends[:m]], axis=1)


def fmea_chain(qs: np.ndarray, qe: np.ndarray, ss: np.ndarray,
               se: np.ndarray, extend_threshold: int,
               min_len: int = 80, diag_tol: int = 0) -> Optional[np.ndarray]:
    """Native FMEA greedy chaining; None when the library is unavailable.

    diag_tol > 0 enables copy-retrieval semantics (fmea_chain2): HSPs
    only merge into diagonal-consistent chains, so a neighboring genomic
    copy starts a new chain instead of being absorbed."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "fmea_chain2"):
        return None
    n = len(qs)
    if n == 0:
        return np.zeros((0, 4), dtype=np.int64)
    arrs = [np.ascontiguousarray(a, dtype=np.int64) for a in (qs, qe, ss, se)]
    out = np.empty((n, 4), dtype=np.int64)
    lib.fmea_chain2.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 4 + [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.fmea_chain2.restype = ctypes.c_int64
    m = lib.fmea_chain2(
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for a in arrs),
        n, int(extend_threshold), int(diag_tol), int(min_len),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:m].copy()
