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
_SRCS = [os.path.join(_DIR, "matchlib.cpp"),
         os.path.join(_DIR, "bamlib.cpp")]
_SRC = _SRCS[0]  # kept for older callers
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> str:
    tag = sysconfig.get_platform().replace("-", "_")
    return os.path.join(_DIR, "libmisonative_%s.so" % tag)


def _build(so_path: str) -> bool:
    cxx = os.environ.get("CXX", "c++")
    cmd = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17"] + _SRCS + [
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
        src_mtime = max(os.path.getmtime(s) for s in _SRCS
                        if os.path.isfile(s))
        if not os.path.isfile(so) or src_mtime > os.path.getmtime(so):
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
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.miso_bam_scan.restype = ctypes.c_int64
        lib.miso_bam_scan.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # buf
            i64p,                                 # rec_off
            i32p, i32p, i32p, i32p, i32p, i32p,   # fixed fields + ref_end
            i64p, i32p,                           # qname off/len
            ctypes.c_char_p, ctypes.c_int64, i64p,  # cigar buf/cap/off
            ctypes.POINTER(ctypes.c_int64),       # consumed
        ]
        lib.miso_pair_qnames.restype = ctypes.c_int64
        lib.miso_pair_qnames.argtypes = [
            u8p, ctypes.c_int64,                  # qname byte buffer
            i64p, i32p,                           # qname off/len
            i64p,                                 # partner (out)
        ]
        _LIB = lib
        return _LIB


class BamScan:
    """Columnar result of one native scan over a decompressed window."""

    __slots__ = ("n", "rec_off", "ref_id", "pos", "flag", "mapq", "l_seq",
                 "ref_end", "qname_off", "qname_len", "cigar_buf",
                 "cigar_off", "consumed")

    def __init__(self, n, rec_off, ref_id, pos, flag, mapq, l_seq,
                 ref_end, qname_off, qname_len, cigar_buf, cigar_off,
                 consumed):
        self.n = n
        self.rec_off = rec_off
        self.ref_id = ref_id
        self.pos = pos
        self.flag = flag
        self.mapq = mapq
        self.l_seq = l_seq
        self.ref_end = ref_end
        self.qname_off = qname_off
        self.qname_len = qname_len
        self.cigar_buf = cigar_buf
        self.cigar_off = cigar_off
        self.consumed = consumed

    def cigar_str(self, i: int) -> str:
        # cigar strings are NUL-terminated in the packed buffer
        return self.cigar_buf[self.cigar_off[i]:
                              self.cigar_off[i + 1] - 1].decode()


def bam_scan(buf, start: int = 0,
             max_records: Optional[int] = None) -> Optional[BamScan]:
    """Decode size-prefixed BAM records from a decompressed byte window
    into columnar arrays; None if the native library is unavailable.
    Raises ValueError on structurally corrupt records."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(buf, dtype=np.uint8)
    n = buf.shape[0]
    cap = max(max_records if max_records is not None
              else (n - start) // 36 + 1, 1)
    rec_off = np.empty(cap, np.int64)
    i32 = lambda: np.empty(cap, np.int32)  # noqa: E731
    ref_id, pos, flag, mapq, l_seq, ref_end = (
        i32(), i32(), i32(), i32(), i32(), i32())
    qname_off = np.empty(cap, np.int64)
    qname_len = i32()
    # 11 bytes/op worst case; records have >= 1 op slot each
    cigar_cap = max(int(n - start) * 3 + 16, 1024)
    cigar_buf = ctypes.create_string_buffer(cigar_cap)
    cigar_off = np.empty(cap + 1, np.int64)
    consumed = ctypes.c_int64(0)
    cnt = lib.miso_bam_scan(
        buf, n, start, cap, rec_off, ref_id, pos, flag, mapq, l_seq,
        ref_end, qname_off, qname_len, cigar_buf, cigar_cap, cigar_off,
        ctypes.byref(consumed))
    if cnt < 0:
        raise ValueError("corrupt BAM record in scan window")
    return BamScan(int(cnt), rec_off[:cnt], ref_id[:cnt], pos[:cnt],
                   flag[:cnt], mapq[:cnt], l_seq[:cnt], ref_end[:cnt],
                   qname_off[:cnt], qname_len[:cnt],
                   cigar_buf.raw[:int(cigar_off[cnt]) if cnt > 0 else 0],
                   cigar_off[:cnt + 1],
                   int(consumed.value))


def match_iso_native(gene, positions: np.ndarray, cigars,
                     read_len: int, overhang: int) -> Optional[np.ndarray]:
    """Native match matrix; None if the library is unavailable.

    `cigars` is either a sequence of strings or a PackedCigars-style
    object (``.buf`` NUL-terminated bytes + ``.offsets``), which the
    matcher consumes zero-copy -- the whole-chromosome columnar ingest
    path never materializes per-read strings."""
    lib = load()
    if lib is None:
        return None
    noiso = gene.num_isoforms
    n = len(positions)
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    if hasattr(cigars, "buf") and hasattr(cigars, "offsets"):
        cigar_buf = cigars.buf
        offsets = np.ascontiguousarray(cigars.offsets, np.int64)
    elif n:
        # ONE encode of the whole join (per-read str.encode calls
        # dominated the event-compile profile), then vectorized offset
        # recovery from the NUL separators
        cigar_buf = ("\x00".join(cigars) + "\x00").encode()
        nuls = np.flatnonzero(np.frombuffer(cigar_buf, np.uint8) == 0)
        offsets = np.concatenate([np.zeros(1, np.int64), nuls[:-1] + 1])
    else:
        cigar_buf = b""
        offsets = np.zeros(0, np.int64)
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


def pair_qnames(buf, qname_off, qname_len):
    """partner[i] = index of record i's mate, or -1.

    Native mate pairing over packed qname bytes: trailing /1 /2 #1 #2
    mate ids are stripped, and ONLY names occurring exactly twice pair
    (reference dict semantics, misopy/sam_utils.py:210-289).  Returns
    None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(np.frombuffer(buf, dtype=np.uint8))
    qname_off = np.ascontiguousarray(qname_off, np.int64)
    qname_len = np.ascontiguousarray(qname_len, np.int32)
    n = len(qname_off)
    partner = np.empty(n, np.int64)
    rc = lib.miso_pair_qnames(buf, n, qname_off, qname_len, partner)
    if rc < 0:
        return None
    return partner
