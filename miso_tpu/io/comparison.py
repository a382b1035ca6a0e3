"""Two-sample differential comparison -> `.miso_bf` output.

Format parity: misopy/hypothesis_test.py:182-345
(output_samples_comparison): 18 header fields, 2-decimal quantization,
`<label1>_vs_<label2>/bayes-factors/<label1>_vs_<label2>.miso_bf` layout.
"""
from __future__ import annotations

import os
from decimal import Decimal
from typing import List, Optional, Tuple

import numpy as np

from miso_tpu.io.miso_file import (MISOSamples, get_gene_info_from_params,
                                   get_isoforms_from_header)
from miso_tpu.stats.bayes import compute_bayes_factors
from miso_tpu.stats.intervals import format_credible_intervals

BF_HEADER_FIELDS = [
    "event_name",
    "sample1_posterior_mean", "sample1_ci_low", "sample1_ci_high",
    "sample2_posterior_mean", "sample2_ci_low", "sample2_ci_high",
    "diff", "bayes_factor", "isoforms",
    "sample1_counts", "sample1_assigned_counts",
    "sample2_counts", "sample2_assigned_counts",
    "chrom", "strand", "mRNA_starts", "mRNA_ends",
]


def output_samples_comparison(
    sample1_dir: str,
    sample2_dir: str,
    output_dir: str,
    alpha: float = 0.95,
    sample_labels: Optional[Tuple[str, str]] = None,
    use_compressed: Optional[str] = None,
) -> str:
    """Compare two MISO output directories; returns the .miso_bf path."""
    sample1_obj = MISOSamples(sample1_dir, use_compressed=use_compressed)
    sample2_obj = MISOSamples(sample2_dir, use_compressed=use_compressed)
    if sample_labels is None:
        sample1_label = os.path.basename(os.path.normpath(sample1_dir))
        sample2_label = os.path.basename(os.path.normpath(sample2_dir))
    else:
        sample1_label, sample2_label = sample_labels
    pair = "%s_vs_%s" % (sample1_label, sample2_label)
    bf_output_dir = os.path.join(output_dir, pair, "bayes-factors")
    os.makedirs(bf_output_dir, exist_ok=True)
    output_filename = os.path.join(bf_output_dir, "%s.miso_bf" % pair)

    num_compared = 0
    with open(output_filename, "w") as out:
        out.write("\t".join(BF_HEADER_FIELDS) + "\n")
        for event_name in sample1_obj.all_event_names:
            s1 = sample1_obj.get_event_samples(event_name)
            if s1 is None:
                continue
            s2 = sample2_obj.get_event_samples(event_name)
            if s2 is None:
                continue
            num_compared += 1
            out.write("\t".join(
                _comparison_fields(event_name, s1, s2, alpha)) + "\n")
    print("Compared a total of %d events." % num_compared)
    return output_filename


def _comparison_fields(event_name: str, s1, s2, alpha: float) -> List[str]:
    samples1, samples2 = s1.samples, s2.samples
    num_isoforms = samples1.shape[1]
    bf = compute_bayes_factors(samples1, samples2)

    mean1 = samples1.mean(axis=0)
    mean2 = samples2.mean(axis=0)
    ci1 = format_credible_intervals(event_name, samples1,
                                    confidence_level=alpha)
    ci2 = format_credible_intervals(event_name, samples2,
                                    confidence_level=alpha)
    if num_isoforms == 2:
        # 2-decimal quantization exactly as the reference
        # (hypothesis_test.py:301-307 uses Decimal.quantize)
        m1 = Decimal(str(mean1[0])).quantize(Decimal("0.01"))
        m2 = Decimal(str(mean2[0])).quantize(Decimal("0.01"))
        posterior_diff = "%.2f" % (m1 - m2)
        bayes_factor = "%.2f" % bf[0]
        mean1_str, mean2_str = str(m1), str(m2)
    else:
        posterior_diff = ",".join("%.2f" % v for v in (mean1 - mean2))
        bayes_factor = ",".join("%.2f" % max(v, 0) for v in bf)
        mean1_str, mean2_str = ci1[1], ci2[1]

    gene_info = get_gene_info_from_params(s1.params)
    return [
        event_name,
        mean1_str, ci1[2], ci1[3],
        mean2_str, ci2[2], ci2[3],
        posterior_diff, bayes_factor,
        get_isoforms_from_header(s1.header),
        s1.counts_info["counts"], s1.counts_info["assigned_counts"],
        s2.counts_info["counts"], s2.counts_info["assigned_counts"],
        gene_info["chrom"], gene_info["strand"],
        gene_info["mRNA_starts"], gene_info["mRNA_ends"],
    ]
