"""Native (C++) host kernels for the event compiler, loaded via ctypes.

The reference implements its host hot paths in C (pysplicing's
libsplicing); here the equivalents live in matchlib.cpp, compiled on
first use (cached next to the source) and dispatched from
miso_tpu.core.matching.  A pure-numpy fallback is always available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "matchlib.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> str:
    tag = sysconfig.get_platform().replace("-", "_")
    return os.path.join(_DIR, "libmisomatch_%s.so" % tag)


def _build(so_path: str) -> bool:
    cxx = os.environ.get("CXX", "c++")
    cmd = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MISO_NO_NATIVE") == "1":
            return None
        so = _so_path()
        if not os.path.isfile(so) or (
                os.path.isfile(_SRC) and
                os.path.getmtime(_SRC) > os.path.getmtime(so)):
            if not _build(so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.miso_match_iso.restype = ctypes.c_int64
        lib.miso_match_iso.argtypes = [
            i64p, ctypes.c_int64,                 # positions
            ctypes.c_char_p, i64p,                # cigar buf + offsets
            i64p, i64p, i64p, ctypes.c_int64,     # exons
            ctypes.c_int64, ctypes.c_int64,       # read_len, overhang
            f64p,                                 # out
        ]
        lib.miso_genomic_to_iso.restype = None
        lib.miso_genomic_to_iso.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
        _LIB = lib
        return _LIB


def match_iso_native(gene, positions: np.ndarray, cigars,
                     read_len: int, overhang: int) -> Optional[np.ndarray]:
    """Native match matrix; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    noiso = gene.num_isoforms
    n = len(positions)
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    buf_parts = []
    offsets = np.zeros(n, dtype=np.int64)
    total = 0
    for i, c in enumerate(cigars):
        offsets[i] = total
        b = c.encode() + b"\x00"
        buf_parts.append(b)
        total += len(b)
    cigar_buf = b"".join(buf_parts)
    starts_l, ends_l, idx = [], [], [0]
    for i in range(noiso):
        s, e = gene.iso_exons(i)
        starts_l.append(s)
        ends_l.append(e)
        idx.append(idx[-1] + len(s))
    exon_starts = np.ascontiguousarray(np.concatenate(starts_l), np.int64)
    exon_ends = np.ascontiguousarray(np.concatenate(ends_l), np.int64)
    exon_idx = np.asarray(idx, dtype=np.int64)
    out = np.zeros((noiso, n), dtype=np.float64)
    rc = lib.miso_match_iso(
        positions, n, cigar_buf, offsets,
        exon_starts, exon_ends, exon_idx, noiso,
        read_len, overhang, out)
    if rc != 0:
        from miso_tpu.core.cigar import CigarError
        raise CigarError("Bad CIGAR string in native matcher")
    return out
