"""SAM/BAM ingestion without pysam: text SAM parser, BGZF/BAM binary
reader, mate pairing, and strand-rule filtering.

Capability parity with misopy/sam_utils.py (load/fetch/pair/strand/parse);
pysam is replaced by a from-scratch reader:

- SAM text: direct field parsing.
- BAM: BGZF block decompression (zlib raw deflate per RFC/SAM spec) + the
  BAM binary alignment encoding; optional .bai index is not required --
  region fetches fall back to a filtered scan, which is sufficient for
  the per-gene access pattern (the event compiler consumes whole-gene
  region batches).

Positions are 0-based here (as in pysam); the pipeline shifts +1 before
matching, mirroring misopy/miso_sampler.py:284.
"""
from __future__ import annotations

import gzip
import os
import struct
import zlib
from dataclasses import dataclass
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

# flag bits (SAM spec)
FPAIRED = 0x1
FPROPER = 0x2
FUNMAP = 0x4
FMUNMAP = 0x8
FREVERSE = 0x10
FMREVERSE = 0x20
FREAD1 = 0x40
FREAD2 = 0x80
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400

_BAM_CIGAR_OPS = "MIDNSHP=X"
_BAM_SEQ_CODES = "=ACMGRSVTWYHKDBN"


@dataclass
class AlignedRead:
    """Minimal aligned-read record (pysam.AlignedRead surface subset)."""

    qname: str
    flag: int
    rname: str          # reference (chromosome) name, "*" if unmapped
    pos: int            # 0-based leftmost position
    mapq: int
    cigar_str: str      # "*" if absent
    rlen: int           # query sequence length

    @property
    def is_paired(self) -> bool:
        return bool(self.flag & FPAIRED)

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FUNMAP)

    @property
    def mate_is_unmapped(self) -> bool:
        return bool(self.flag & FMUNMAP)

    @property
    def is_qcfail(self) -> bool:
        return bool(self.flag & FQCFAIL)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FREVERSE)

    @property
    def is_read1(self) -> bool:
        return bool(self.flag & FREAD1)

    @property
    def is_read2(self) -> bool:
        return bool(self.flag & FREAD2)

    @property
    def cigar(self) -> Optional[str]:
        return None if self.cigar_str in ("*", "") else self.cigar_str


def flag_to_strand(flag: int) -> str:
    """Ref: misopy/sam_utils.py:184-191."""
    return "-" if flag & FREVERSE else "+"


def strip_mate_id(read_name: str) -> str:
    """Ref: misopy/sam_utils.py:194-207."""
    if read_name.endswith(("/1", "/2", "#1", "#2")):
        return read_name[:-2]
    return read_name


# ----------------------------------------------------------------- SAM text

def _cigar_query_len(cigar: str) -> int:
    n = 0
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            if ch in "MIS=X":
                n += int(num)
            num = ""
    return n


def read_sam_text(path_or_lines) -> Iterator[AlignedRead]:
    if isinstance(path_or_lines, str):
        opener = gzip.open if path_or_lines.endswith(".gz") else open
        f = opener(path_or_lines, "rt")
        lines: Iterable[str] = f
    else:
        f = None
        lines = path_or_lines
    try:
        for line in lines:
            if line.startswith("@") or not line.strip():
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 11:
                continue
            seq = fields[9]
            cigar = fields[5]
            rlen = len(seq) if seq != "*" else (
                _cigar_query_len(cigar) if cigar != "*" else 0)
            yield AlignedRead(
                qname=fields[0], flag=int(fields[1]), rname=fields[2],
                pos=int(fields[3]) - 1, mapq=int(fields[4]),
                cigar_str=cigar, rlen=rlen)
    finally:
        if f is not None:
            f.close()


# --------------------------------------------------------------------- BGZF

def _bgzf_blocks(raw: bytes) -> Iterator[bytes]:
    """Decompress a BGZF (blocked gzip) byte stream."""
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("Not a BGZF/gzip stream at offset %d" % pos)
        xlen = struct.unpack_from("<H", raw, pos + 10)[0]
        extra = raw[pos + 12:pos + 12 + xlen]
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2, slen = struct.unpack_from("<BBH", extra, epos)
            if si1 == 66 and si2 == 67:  # 'BC'
                bsize = struct.unpack_from("<H", extra, epos + 4)[0] + 1
            epos += 4 + slen
        if bsize is None:
            # plain gzip member (not BGZF) -- decompress the rest at once
            yield zlib.decompress(raw[pos:], wbits=31)
            return
        cdata = raw[pos + 12 + xlen:pos + bsize - 8]
        yield zlib.decompress(cdata, wbits=-15)
        pos += bsize


def bgzf_decompress(path: str) -> bytes:
    with open(path, "rb") as f:
        raw = f.read()
    return b"".join(_bgzf_blocks(raw))


def bgzf_compress(data: bytes, level: int = 6) -> bytes:
    """Write BGZF blocks (max 64KB uncompressed each) + EOF block."""
    out = []
    MAXB = 65280
    for off in range(0, len(data), MAXB):
        chunk = data[off:off + MAXB]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25 + 1
        header = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff" +
                  struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1))
        out.append(header + cdata +
                   struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF,
                               len(chunk)))
    # EOF marker block
    out.append(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    return b"".join(out)


# ---------------------------------------------------------------------- BAM

class _RegionIndex:
    """In-memory positional index: per-chromosome read lists sorted by
    start, with a running max of reference end positions so region
    fetches are O(log n + hits) -- the role pysam's .bai index plays in
    the reference (sam_utils.py:154-181), without needing the file."""

    def __init__(self, reads: List[AlignedRead]):
        import bisect
        self._bisect = bisect
        self.by_chrom: dict = {}
        for r in reads:
            if r.rname == "*" or r.is_unmapped:
                continue
            self.by_chrom.setdefault(r.rname, []).append(r)
        self._starts: dict = {}
        self._maxend: dict = {}
        for chrom, rs in self.by_chrom.items():
            rs.sort(key=lambda r: r.pos)
            starts = [r.pos for r in rs]
            maxend = []
            cur = -1
            for r in rs:
                cur = max(cur, r.pos + _cigar_ref_len(r.cigar_str))
                maxend.append(cur)
            self._starts[chrom] = starts
            self._maxend[chrom] = maxend

    def fetch(self, chrom: str, start: int, end: int):
        rs = self.by_chrom.get(chrom)
        if not rs:
            return
        starts = self._starts[chrom]
        maxend = self._maxend[chrom]
        # first read whose running max end exceeds `start`
        lo = self._bisect.bisect_right(maxend, start)
        hi = self._bisect.bisect_left(starts, end)
        for i in range(lo, hi):
            r = rs[i]
            if r.pos + _cigar_ref_len(r.cigar_str) > start:
                yield r


class BamReader:
    """Whole-file BAM reader (BGZF + BAM binary records) with an
    in-memory region index built on first fetch."""

    def __init__(self, path: str):
        self.path = path
        data = bgzf_decompress(path)
        if data[:4] != b"BAM\x01":
            raise ValueError("%s: not a BAM file" % path)
        l_text = struct.unpack_from("<i", data, 4)[0]
        off = 8 + l_text
        n_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        self.references: List[str] = []
        self.lengths: List[int] = []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", data, off)[0]
            name = data[off + 4:off + 4 + l_name - 1].decode()
            l_ref = struct.unpack_from("<i", data, off + 4 + l_name)[0]
            self.references.append(name)
            self.lengths.append(l_ref)
            off += 8 + l_name
        self.header_text = data[8:8 + l_text].decode(errors="replace")
        self._data = data
        self._aln_start = off
        self._index: Optional[_RegionIndex] = None

    def __iter__(self) -> Iterator[AlignedRead]:
        data = self._data
        off = self._aln_start
        n = len(data)
        refs = self.references
        while off + 4 <= n:
            block_size = struct.unpack_from("<i", data, off)[0]
            rec = data[off + 4:off + 4 + block_size]
            off += 4 + block_size
            (ref_id, pos, l_read_name, mapq, _bin, n_cigar_op, flag,
             l_seq, _next_ref, _next_pos, _tlen) = struct.unpack_from(
                 "<iiBBHHHiiii", rec, 0)
            p = 32
            qname = rec[p:p + l_read_name - 1].decode()
            p += l_read_name
            cigar_ops = struct.unpack_from("<%dI" % n_cigar_op, rec, p)
            p += 4 * n_cigar_op
            cigar = "".join(
                "%d%s" % (op >> 4, _BAM_CIGAR_OPS[op & 0xF])
                for op in cigar_ops) or "*"
            rname = refs[ref_id] if 0 <= ref_id < len(refs) else "*"
            yield AlignedRead(qname=qname, flag=flag, rname=rname, pos=pos,
                              mapq=mapq, cigar_str=cigar, rlen=l_seq)

    def fetch(self, chrom: str, start: int, end: int
              ) -> Iterator[AlignedRead]:
        """Region fetch (0-based half-open) via the in-memory index."""
        if self._index is None:
            self._index = _RegionIndex(list(self))
        return self._index.fetch(chrom, start, end)


def _cigar_ref_len(cigar: str) -> int:
    if cigar in ("*", ""):
        return 1
    n = 0
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            if ch in "MDN=X":
                n += int(num)
            num = ""
    return n


def open_alignments(path: str):
    """Open SAM (.sam/.sam.gz) or BAM transparently; returns an object with
    .references and .fetch(chrom, start, end)."""
    if path.endswith(".bam"):
        return BamReader(path)
    return SamFile(path)


class SamFile:
    """SAM text file with the BamReader fetch surface (indexed)."""

    def __init__(self, path: str):
        self.path = path
        self._reads = list(read_sam_text(path))
        self.references = sorted({r.rname for r in self._reads
                                  if r.rname != "*"})
        self._index: Optional[_RegionIndex] = None

    def __iter__(self):
        return iter(self._reads)

    def fetch(self, chrom: str, start: int, end: int):
        if self._index is None:
            self._index = _RegionIndex(self._reads)
        return self._index.fetch(chrom, start, end)


def fetch_bam_reads_in_gene(alignments, chrom: str, start: int, end: int
                            ) -> List[AlignedRead]:
    """Region fetch with the chr-prefix fallback
    (misopy/sam_utils.py:154-181)."""
    if chrom not in alignments.references:
        parts = chrom.split("chr")
        chrom = parts[0] if len(parts) <= 1 else parts[1]
    try:
        return list(alignments.fetch(chrom, start, end))
    except (ValueError, KeyError):
        print("Cannot fetch reads in region: %s:%d-%d" % (chrom, start, end))
        return []


# ----------------------------------------------------------- BAM writing

def _encode_cigar(cigar: str) -> bytes:
    if cigar in ("*", ""):
        return b""
    out = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            out.append((int(num) << 4) | _BAM_CIGAR_OPS.index(ch))
            num = ""
    return struct.pack("<%dI" % len(out), *out)


def write_bam(path: str, references: Sequence[str],
              lengths: Sequence[int], reads: Sequence[AlignedRead],
              header_text: str = "") -> None:
    """Write a BAM file (BGZF-compressed) from AlignedRead records.

    Replaces the reference's samtools dependency (misopy/sam_to_bam.py)
    with a native encoder; sequences/qualities are not retained (the
    quantifier only consumes name/flag/pos/cigar)."""
    ref_index = {name: i for i, name in enumerate(references)}
    body = [b"BAM\x01", struct.pack("<i", len(header_text)),
            header_text.encode(), struct.pack("<i", len(references))]
    for name, ln in zip(references, lengths):
        nb = name.encode() + b"\x00"
        body.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))
    for r in reads:
        name_b = r.qname.encode() + b"\x00"
        cig_b = _encode_cigar(r.cigar_str)
        ref_id = ref_index.get(r.rname, -1)
        rec = struct.pack(
            "<iiBBHHHiiii", ref_id, r.pos, len(name_b), r.mapq, 0,
            len(cig_b) // 4, r.flag, 0, -1, -1, 0) + name_b + cig_b
        body.append(struct.pack("<i", len(rec)) + rec)
    with open(path, "wb") as f:
        f.write(bgzf_compress(b"".join(body)))


def sam_to_bam(sam_filename: str, bam_filename: str) -> str:
    """SAM -> coordinate-sorted BAM, natively (no samtools).
    Capability parity: misopy/sam_to_bam.py:8-42."""
    reads = list(read_sam_text(sam_filename))
    refs: List[str] = []
    lens: List[int] = []
    # take @SQ lines if present
    opener = gzip.open if sam_filename.endswith(".gz") else open
    header_lines = []
    with opener(sam_filename, "rt") as f:
        for line in f:
            if not line.startswith("@"):
                break
            header_lines.append(line)
            if line.startswith("@SQ"):
                d = dict(kv.split(":", 1) for kv in
                         line.strip().split("\t")[1:] if ":" in kv)
                if "SN" in d:
                    refs.append(d["SN"])
                    lens.append(int(d.get("LN", 0)))
    if not refs:
        seen = sorted({r.rname for r in reads if r.rname != "*"})
        refs = seen
        lens = [max((r.pos + r.rlen + 1) for r in reads if r.rname == c)
                for c in seen]
    ref_order = {c: i for i, c in enumerate(refs)}
    reads.sort(key=lambda r: (ref_order.get(r.rname, len(refs)), r.pos))
    write_bam(bam_filename, refs, lens, reads,
              header_text="".join(header_lines))
    return bam_filename


# ------------------------------------------------------------ pair/strand

def pair_sam_reads(reads: Iterable[AlignedRead],
                   filter_reads: bool = True,
                   return_unpaired: bool = False,
                   strand_rule: Optional[str] = None):
    """Pair mates by name; drop same-strand pairs and unpaired reads.
    Ref: misopy/sam_utils.py:210-289 (incl. fr-firststrand mate reorder)."""
    paired: Dict[str, List[AlignedRead]] = {}
    unpaired: Dict[str, object] = {}
    for read in reads:
        name = strip_mate_id(read.qname)
        if filter_reads and (read.is_qcfail or read.is_unmapped or
                             read.mate_is_unmapped or not read.is_paired):
            unpaired[name] = read
            continue
        paired.setdefault(name, []).append(read)
        if len(paired[name]) == 2 and strand_rule == "fr-firststrand":
            first = paired[name][0]
            if (first.is_read1 and first.is_reverse) or \
               (first.is_read2 and first.is_reverse):
                paired[name] = paired[name][::-1]

    to_delete = []
    for name, rs in paired.items():
        if len(rs) != 2:
            unpaired[name] = rs
            to_delete.append(name)
            continue
        left, right = rs
        if flag_to_strand(left.flag) == flag_to_strand(right.flag):
            to_delete.append(name)
    for name in to_delete:
        del paired[name]
    if return_unpaired:
        return paired, unpaired
    return paired


def read_matches_strand(read, target_strand: str, strand_rule: Optional[str],
                        paired_end=None) -> bool:
    """Ref: misopy/sam_utils.py:313-350."""
    if strand_rule == "fr-unstranded" or strand_rule is None:
        return True
    if strand_rule == "fr-secondstrand":
        raise ValueError("fr-secondstrand currently unsupported.")
    if strand_rule != "fr-firststrand":
        raise ValueError("Unknown strandedness rule.")
    if paired_end is not None:
        read1, read2 = read
        if target_strand == "+":
            return flag_to_strand(read1.flag) == "+"
        return flag_to_strand(read2.flag) == "-"
    return flag_to_strand(read.flag) == target_strand


def sam_parse_reads(reads: Iterable[AlignedRead],
                    paired_end: bool = False,
                    strand_rule: Optional[str] = None,
                    target_strand: Optional[str] = None,
                    given_read_len: Optional[int] = None
                    ) -> Tuple[Tuple[Sequence[int], Sequence[str]], int]:
    """Produce ((positions, cigars), num_reads); 0-based positions.
    Ref: misopy/sam_utils.py:353-456."""
    read_positions: List[int] = []
    read_cigars: List[str] = []
    num_reads = 0
    check_strand = not (strand_rule is None or
                        strand_rule == "fr-unstranded" or
                        target_strand is None)
    if paired_end:
        for name, pair in pair_sam_reads(list(reads),
                                         strand_rule=strand_rule).items():
            if check_strand and not read_matches_strand(
                    pair, target_strand, strand_rule, paired_end=True):
                continue
            r1, r2 = pair
            if r1.cigar is None or r2.cigar is None:
                continue
            if given_read_len is not None and (
                    r1.rlen != given_read_len or r2.rlen != given_read_len):
                continue
            read_positions.extend([r1.pos, r2.pos])
            read_cigars.extend([r1.cigar, r2.cigar])
            num_reads += 1
    else:
        for read in reads:
            if read.cigar is None:
                continue
            if given_read_len is not None and read.rlen != given_read_len:
                continue
            if check_strand and not read_matches_strand(
                    read, target_strand, strand_rule):
                continue
            read_positions.append(read.pos)
            read_cigars.append(read.cigar)
            num_reads += 1
    return (tuple(read_positions), tuple(read_cigars)), num_reads
