"""Sashimi plots: per-sample read densities with junction arcs, an mRNA
diagram track, and MISO posterior panels.

Capability parity with misopy/sashimi_plot/** (plot_gene.py:22-447 read
densities + junction bezier arcs, :492 mRNA diagrams, :533-648 posterior
panels; sashimi_plot.py CLI modes --plot-event / --plot-insert-len /
--plot-bf-dist), rendered with matplotlib over the native BAM reader.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.path import Path as MplPath
from matplotlib.patches import PathPatch

from miso_tpu.plot.settings import parse_plot_settings


# ------------------------------------------------------------- densities

def reads_to_wiggle(reads, start: int, end: int
                    ) -> Tuple[np.ndarray, Dict[Tuple[int, int], int]]:
    """Per-bp read depth over [start, end] (1-based inclusive) plus
    junction span counts.  Parity: plot_utils/plot_gene.py:398
    (readsToWiggle_pysam)."""
    depth = np.zeros(end - start + 1, dtype=np.float64)
    junctions: Dict[Tuple[int, int], int] = {}
    for read in reads:
        if read.cigar is None:
            continue
        pos = read.pos + 1  # 1-based
        num = ""
        for ch in read.cigar_str:
            if ch.isdigit():
                num += ch
                continue
            ln = int(num)
            num = ""
            if ch in "M=X":
                lo = max(pos, start)
                hi = min(pos + ln - 1, end)
                if hi >= lo:
                    depth[lo - start:hi - start + 1] += 1
                pos += ln
            elif ch in "DN":
                if ch == "N":
                    j = (pos - 1, pos + ln)  # last exonic bp, next exonic bp
                    junctions[j] = junctions.get(j, 0) + 1
                pos += ln
            # I/S/H consume no reference
    return depth, junctions


# ------------------------------------------------- coordinate compression

class GenomeTransform:
    """Piecewise-linear genomic -> plot coordinate map that shrinks
    introns (intron_scale) and exons (exon_scale), the sashimi look."""

    def __init__(self, exon_union: List[Tuple[int, int]], start: int,
                 end: int, intron_scale: float, exon_scale: float):
        # build segments covering [start, end]
        segs = []
        cur = start
        for (s, e) in sorted(exon_union):
            s, e = max(s, start), min(e, end)
            if s > cur:
                segs.append((cur, s - 1, 1.0 / intron_scale))
            if e >= s:
                segs.append((s, e, 1.0 / exon_scale))
                cur = e + 1
        if cur <= end:
            segs.append((cur, end, 1.0 / intron_scale))
        self.segs = segs
        self.breaks = np.array([s[0] for s in segs] + [end + 1])
        starts_out = [0.0]
        for (s, e, f) in segs:
            starts_out.append(starts_out[-1] + (e - s + 1) * f)
        self.out_starts = np.array(starts_out)
        self.total = starts_out[-1]

    def __call__(self, pos):
        pos = np.asarray(pos, dtype=np.float64)
        idx = np.clip(np.searchsorted(self.breaks, pos, side="right") - 1,
                      0, len(self.segs) - 1)
        seg_start = self.breaks[idx]
        factors = np.array([s[2] for s in self.segs])[idx]
        return self.out_starts[idx] + (pos - seg_start) * factors


# ------------------------------------------------------------- plotting

def _plot_density_axis(ax, depth, junctions, tx, start, end, color,
                       label, settings, ymax=None):
    xs = tx(np.arange(start, end + 1))
    ax.fill_between(xs, depth, step="mid", color=color, alpha=0.9,
                    linewidth=0)
    ymax = ymax or (depth.max() * 1.2 + 1)
    # junction arcs
    for (j_lo, j_hi), count in sorted(junctions.items()):
        x1, x2 = float(tx(j_lo)), float(tx(j_hi))
        h = ymax * (0.3 + 0.25 * np.random.RandomState(
            (j_lo * 31 + j_hi) % 2 ** 31).rand())
        y1 = depth[min(max(j_lo - start, 0), len(depth) - 1)]
        y2 = depth[min(max(j_hi - start, 0), len(depth) - 1)]
        verts = [(x1, y1), ((x1 + x2) / 2.0, y1 + h), (x2, y2)]
        path = MplPath(verts,
                       [MplPath.MOVETO, MplPath.CURVE3, MplPath.CURVE3])
        ax.add_patch(PathPatch(path, fill=False, edgecolor=color,
                               linewidth=0.8))
        if settings.get("number_junctions", True):
            ax.text((x1 + x2) / 2.0, y1 + h * 0.62, str(count),
                    fontsize=settings.get("font_size", 6),
                    ha="center", va="bottom")
    ax.set_ylim(0, ymax)
    ax.set_xlim(0, tx.total)
    ax.set_ylabel(label, fontsize=settings.get("font_size", 6))
    ax.tick_params(labelsize=settings.get("font_size", 6))
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def _plot_mrna_axis(ax, gene, tx, settings):
    """mRNA diagram track (plot_gene.py:492)."""
    n = gene.num_isoforms
    for i in range(n):
        y = n - 1 - i
        starts, ends = gene.iso_exons(i)
        gs, ge = gene.iso_genomic_span(i)
        ax.plot([tx(gs), tx(ge)], [y, y], color="k", linewidth=0.5)
        for s, e in zip(starts, ends):
            x1, x2 = float(tx(s)), float(tx(e))
            ax.fill_between([x1, x2], y - 0.3, y + 0.3, color="#003366",
                            linewidth=0)
        ax.text(-0.01 * tx.total, y, gene.iso_desc_str(i)[:24],
                fontsize=settings.get("font_size", 6), ha="right",
                va="center")
    ax.set_ylim(-0.6, n - 0.4)
    ax.set_xlim(0, tx.total)
    ax.axis("off")


def _plot_posterior_axis(ax, samples, color, settings):
    """Posterior distribution panel (plot_gene.py:533-648)."""
    from miso_tpu.stats.intervals import compute_credible_intervals
    psi = samples[:, 0]
    bins = settings.get("posterior_bins", 40)
    ax.hist(psi, bins=bins, range=(0, 1), color=color, alpha=0.8,
            orientation="horizontal", density=True, linewidth=0)
    mean = psi.mean()
    lo, hi = compute_credible_intervals(psi.copy())
    ax.axhline(mean, color="k", linewidth=0.8)
    ax.text(0.95, 0.9,
            "$\\Psi$ = %.2f\n[%.2f, %.2f]" % (mean, lo, hi),
            fontsize=settings.get("font_size", 6),
            ha="right", va="top", transform=ax.transAxes)
    ax.set_ylim(0, 1)
    ax.tick_params(labelsize=settings.get("font_size", 6))
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def plot_event(event_name: str, index_dir: str, settings_filename: str,
               output_dir: str, no_posteriors: bool = False,
               plot_title: Optional[str] = None,
               plot_label: Optional[str] = None) -> str:
    """--plot-event: densities + arcs per sample, mRNA track, posteriors.
    Ref: misopy/sashimi_plot/sashimi_plot.py:108-154."""
    from miso_tpu.io.index import get_gene_ids_to_filenames, load_indexed_gene
    from miso_tpu.io.miso_file import MISOSamples
    from miso_tpu.io.sam import fetch_bam_reads_in_gene, open_alignments

    settings = parse_plot_settings(settings_filename)
    id_to_fname = get_gene_ids_to_filenames(index_dir)
    if event_name not in id_to_fname:
        raise KeyError("Event %s not found in index %s"
                       % (event_name, index_dir))
    gene = load_indexed_gene(id_to_fname[event_name])[event_name][
        "gene_object"]
    start, end = gene.genomic_span()
    exon_union = [(p.start, p.end) for p in gene.parts]
    tx = GenomeTransform(exon_union, start, end,
                         settings.get("intron_scale", 30.0),
                         settings.get("exon_scale", 4.0))

    bam_files = settings.get("bam_files", [])
    miso_files = settings.get("miso_files", [])
    colors = settings.get("colors") or ["#CC0011"] * len(bam_files)
    show_posteriors = settings.get("show_posteriors", True) and \
        not no_posteriors
    n_samples = len(bam_files)
    gp_ratio = settings.get("gene_posterior_ratio", 5)

    fig_w = settings.get("fig_width", 7.0)
    fig_h = settings.get("fig_height", 5.0)
    nrows = n_samples + 1
    ncols = 2 if show_posteriors else 1
    width_ratios = [gp_ratio, 1] if show_posteriors else [1]
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(fig_w, fig_h), squeeze=False,
        gridspec_kw={"width_ratios": width_ratios,
                     "height_ratios": [1] * n_samples + [0.8]})

    ymax_setting = settings.get("ymax")
    for i, bam in enumerate(bam_files):
        bam_path = os.path.join(settings.get("bam_prefix", ""), bam)
        alignments = open_alignments(bam_path)
        reads = fetch_bam_reads_in_gene(alignments, gene.chrom,
                                        start - 1, end)
        depth, junctions = reads_to_wiggle(reads, start, end)
        cov = None
        if settings.get("coverages"):
            cov = settings["coverages"][i]
            # RPKM-style normalization (plot_gene.py readsToWiggle usage)
            depth = depth / (cov / 1e9) / 1e3 if cov else depth
        label = (settings.get("sample_labels") or miso_files or bam_files)[i]
        _plot_density_axis(axes[i][0], depth, junctions, tx, start, end,
                           colors[i % len(colors)], str(label), settings,
                           ymax=ymax_setting)
        if i < n_samples - 1:
            axes[i][0].set_xticks([])
        if show_posteriors:
            ax_post = axes[i][1]
            miso_dir = os.path.join(settings.get("miso_prefix", ""),
                                    str(miso_files[i]))
            try:
                data = MISOSamples(miso_dir).get_event_samples(event_name)
            except Exception:
                data = None
            if data is not None:
                _plot_posterior_axis(ax_post, data.samples,
                                     colors[i % len(colors)], settings)
            else:
                ax_post.axis("off")

    _plot_mrna_axis(axes[n_samples][0], gene, tx, settings)
    if show_posteriors:
        axes[n_samples][1].axis("off")

    fig.suptitle(plot_title or event_name,
                 fontsize=settings.get("font_size", 6) + 2)
    out_name = (plot_label or event_name).replace("/", "_") + ".pdf"
    out_path = os.path.join(output_dir, out_name)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    print("Saved plot to %s" % out_path)
    return out_path


def plot_insert_len(insert_len_filename: str, settings_filename: str,
                    output_dir: str) -> str:
    """--plot-insert-len: histogram of the insert length distribution.
    Ref: sashimi_plot.py:156-204."""
    settings = parse_plot_settings(settings_filename)
    from miso_tpu.cli.pe_utils import parse_insert_len_params
    lengths: List[int] = []
    with open(insert_len_filename) as f:
        params = parse_insert_len_params(f.readline())
        for line in f:
            fields = line.strip().split("\t")
            if len(fields) == 2:
                lengths.extend(int(x) for x in fields[1].split(","))
    fig, ax = plt.subplots(figsize=(settings.get("fig_width", 7),
                                    settings.get("fig_height", 5)))
    ax.hist(lengths, bins=50, color=settings.get("bar_color", "b"))
    ax.set_xlabel("Insert length (nt)")
    ax.set_ylabel("No. read pairs")
    ax.set_title("mean=%s sdev=%s dispersion=%s"
                 % (params.get("mean"), params.get("sdev"),
                    params.get("dispersion")))
    out_path = os.path.join(
        output_dir,
        os.path.basename(insert_len_filename) + ".pdf")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    print("Saved plot to %s" % out_path)
    return out_path


def plot_bf_dist(bf_filename: str, settings_filename: str,
                 output_dir: str, max_bf: float = 1e12) -> str:
    """--plot-bf-dist: events passing each Bayes-factor threshold.
    Ref: sashimi_plot.py:35-106."""
    settings = parse_plot_settings(settings_filename)
    thresholds = settings.get("bf_thresholds", [0, 1, 2, 5, 10, 20])
    from miso_tpu.cli.filter_events import read_bf_file
    _, rows = read_bf_file(bf_filename)
    bfs = np.array([
        min(float(r["bayes_factor"].split(",")[0]), max_bf) for r in rows])
    counts = [(bfs >= t).sum() for t in thresholds]
    fig, ax = plt.subplots(figsize=(settings.get("fig_width", 7),
                                    settings.get("fig_height", 5)))
    ax.bar(range(len(thresholds)), counts,
           color=settings.get("bar_color", "b"))
    ax.set_xticks(range(len(thresholds)))
    ax.set_xticklabels([">= %g" % t for t in thresholds])
    ax.set_xlabel("Bayes factor threshold")
    ax.set_ylabel("No. events")
    out_path = os.path.join(output_dir,
                            os.path.basename(bf_filename) + ".pdf")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    print("Saved plot to %s" % out_path)
    return out_path
