"""RPKM estimation over constitutive exons.

Parity: misopy/sam_rpkm.py:30-238 (compute_rpkm; exploratory module, not
an installed console script in the reference either).
RPKM = (reads in const exons / const-exon kb) / (total reads / 1e6).
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List

import numpy as np


def gene_const_parts(gene) -> List[int]:
    """Part indices present in every isoform (Gene.py:165-192)."""
    sets = [set(iso.parts) for iso in gene.isoforms]
    if not sets:
        return []
    common = set.intersection(*sets)
    return sorted(common)


def compute_rpkm(gff_filename: str, bam_filename: str, read_len: int,
                 output_dir: str) -> str:
    from miso_tpu.io.gff import load_genes_from_gff
    from miso_tpu.io.sam import fetch_bam_reads_in_gene, open_alignments

    os.makedirs(output_dir, exist_ok=True)
    output_filename = os.path.join(
        output_dir, "%s.rpkm" % os.path.basename(bam_filename))
    genes = load_genes_from_gff(gff_filename)
    alignments = open_alignments(bam_filename)
    num_total_reads = sum(1 for _ in alignments)

    with open(output_filename, "w") as out:
        out.write("gene_id\trpkm\tconst_exon_lens\tnum_reads\n")
        for gene_id, gene in genes.items():
            const = gene_const_parts(gene)
            if not const:
                continue
            total_len = 0
            total_reads = 0
            for p in const:
                exon = gene.parts[p]
                total_len += exon.len
                reads = fetch_bam_reads_in_gene(
                    alignments, gene.chrom, exon.start - 1, exon.end)
                # count reads fully inside the exon (sam_rpkm semantics)
                total_reads += sum(
                    1 for r in reads
                    if r.pos + 1 >= exon.start and
                    r.pos + read_len - 1 <= exon.end)
            if total_len == 0 or num_total_reads == 0:
                continue
            rpkm = (total_reads / (total_len / 1e3)) / (num_total_reads / 1e6)
            out.write("%s\t%.4f\t%d\t%d\n"
                      % (gene_id, rpkm, total_len, total_reads))
    print("Outputting RPKMs to: %s" % output_filename)
    return output_filename


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="miso_rpkm")
    p.add_argument("--compute-rpkm", nargs=2, default=None,
                   metavar=("GFF", "BAM"))
    p.add_argument("--read-len", type=int, required=True)
    p.add_argument("--output-dir", required=True)
    args = p.parse_args(argv)
    if args.compute_rpkm is None:
        print("Need --compute-rpkm GFF BAM", file=sys.stderr)
        return 1
    compute_rpkm(os.path.abspath(args.compute_rpkm[0]),
                 os.path.abspath(args.compute_rpkm[1]),
                 args.read_len, os.path.abspath(args.output_dir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
