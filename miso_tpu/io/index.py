"""Indexed annotation store: per-gene pickles by chromosome + shelve maps.

Directory-layout parity with misopy/index_gff.py:29-130:

  index_dir/
    chrN/<gene_id or compressed_id>.pickle   one dict {gene_id: {...}} each
    genes_to_filenames.shelve                gene id -> pickle path
    compressed_ids_to_genes.shelve           hash -> gene id (--compress-id)
    genes.gff                                gene records only
"""
from __future__ import annotations

import glob
import os
import pickle
import shelve
import time
from typing import Dict, Optional

from miso_tpu.core.gene import Gene
from miso_tpu.io.gff import (GFFDatabase, compress_event_name,
                             load_genes_from_gff, make_gene_from_records)


def index_gff(gff_filename: str, output_dir: str,
              compress_id: bool = False) -> bool:
    """Build the index; aborts (returns False) if already indexed
    (misopy/index_gff.py:143-147)."""
    if glob.glob(os.path.join(output_dir, "chr*")):
        print("%s appears to already be indexed. Aborting." % gff_filename)
        return False
    os.makedirs(output_dir, exist_ok=True)
    t1 = time.time()
    genes = load_genes_from_gff(gff_filename)
    print("  - Loaded %d genes from GFF (%.2fs)" % (len(genes), time.time() - t1))

    gene_id_to_filename: Dict[str, str] = {}
    compressed_to_gene: Dict[str, str] = {}
    for gene_id, gene in genes.items():
        chrom = gene.chrom or "NA"
        chrom_dir_name = chrom if chrom.startswith("chr") else "chr%s" % chrom
        chrom_dir = os.path.join(output_dir, chrom_dir_name)
        os.makedirs(chrom_dir, exist_ok=True)
        entry = {"gene_object": gene, "hierarchy": None}
        if compress_id:
            cid = compress_event_name(gene_id)
            compressed_to_gene[cid] = gene_id
            entry["compressed_id"] = cid
            fname = os.path.abspath(os.path.join(chrom_dir, "%s.pickle" % cid))
        else:
            fname = os.path.abspath(os.path.join(chrom_dir, "%s.pickle" % gene_id))
        with open(fname, "wb") as f:
            pickle.dump({gene_id: entry}, f, protocol=pickle.HIGHEST_PROTOCOL)
        gene_id_to_filename[gene_id] = fname

    with shelve.open(os.path.join(output_dir, "genes_to_filenames.shelve")) as sh:
        for k, v in gene_id_to_filename.items():
            sh[k] = v
    with shelve.open(os.path.join(output_dir,
                                  "compressed_ids_to_genes.shelve")) as sh:
        for k, v in compressed_to_gene.items():
            sh[k] = v

    # genes.gff: pass through gene records only (index_gff.py:120-130)
    genes_filename = os.path.join(output_dir, "genes.gff")
    with open(gff_filename) as gff_in, open(genes_filename, "w") as gff_out:
        for line in gff_in:
            if line.startswith("#"):
                continue
            fields = line.strip().split("\t")
            if len(fields) > 2 and fields[2] == "gene":
                gff_out.write(line)
    return True


def get_gene_ids_to_filenames(index_dir: str) -> Dict[str, str]:
    """gene id -> pickle filename map (gff_utils.py:89 semantics)."""
    path = os.path.join(index_dir, "genes_to_filenames.shelve")
    out: Dict[str, str] = {}
    with shelve.open(path, flag="r") as sh:
        for k in sh.keys():
            out[k] = sh[k]
    return out


def load_compressed_ids_to_genes(index_dir_or_file: str) -> Dict[str, str]:
    path = index_dir_or_file
    if os.path.isdir(path):
        path = os.path.join(path, "compressed_ids_to_genes.shelve")
    out: Dict[str, str] = {}
    with shelve.open(path, flag="r") as sh:
        for k in sh.keys():
            out[k] = sh[k]
    return out


def load_indexed_gene(pickle_filename: str) -> Dict[str, dict]:
    """Load one per-gene pickle ({gene_id: {'gene_object': Gene, ...}})."""
    with open(pickle_filename, "rb") as f:
        return pickle.load(f)
