"""`filter_events` -- post-hoc filtering of `.miso_bf` comparison tables.

Logic parity: misopy/filter_events.py (get_counts :27-59, filter_event
:61-82, filter_events :241-330).  Two-isoform events only, as in the
reference.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, List, Optional, Tuple

MAX_BF = 1e12


def get_counts(counts_str: str) -> Optional[Tuple[int, int, int]]:
    """(inclusion, exclusion, both) read counts from a counts= field.
    Ref: filter_events.py:27-59."""
    fields = re.findall(r"(\(.{3}\):\d+)", counts_str)
    iso_groups = re.findall(r"\([01,]+\)", counts_str)
    if not iso_groups or not fields:
        return None
    isoforms = re.sub(r"[^\w]", "", iso_groups[0])
    if len(isoforms) > 2:
        return None
    num_inc = num_exc = num_both = 0
    for field in fields:
        iso_type, count = field.split(":")
        count = int(count)
        if iso_type == "(1,0)":
            num_inc = count
        elif iso_type == "(0,1)":
            num_exc = count
        elif iso_type == "(1,1)":
            num_both = count
    return num_inc, num_exc, num_both


def filter_event(sample_inc, sample_exc, sample_both,
                 num_total, num_inc, num_exc, num_sum) -> bool:
    """Ref: filter_events.py:61-82."""
    sample_total = sample_inc + sample_exc + sample_both
    sample_sum = sample_inc + sample_exc
    return not (sample_total < num_total or sample_sum < num_sum or
                sample_inc < num_inc or sample_exc < num_exc)


def read_bf_file(path: str) -> Tuple[List[str], List[Dict[str, str]]]:
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = []
        for line in f:
            fields = line.rstrip("\n").split("\t")
            rows.append(dict(zip(header, fields)))
    return header, rows


def filter_events(
    rows: List[Dict[str, str]],
    num_total: int, num_inc: int, num_exc: int, num_sum: int,
    delta_psi_filter: float, bf_filter: float,
    apply_both_samples: bool = False,
) -> List[Dict[str, str]]:
    """Ref: filter_events.py:241-330."""
    if abs(delta_psi_filter) > 1:
        raise ValueError("Error: delta psi value outside [0, 1].")
    out = []
    for event in rows:
        bf = min(float(event["bayes_factor"].split(",")[0]), MAX_BF)
        delta_psi = float(event["diff"].split(",")[0])
        counts1 = get_counts(event["sample1_counts"])
        if counts1 is None:
            if abs(bf) < abs(bf_filter):
                continue
            if abs(delta_psi) < abs(delta_psi_filter):
                continue
        else:
            counts2 = get_counts(event["sample2_counts"])
            if counts2 is None:
                raise ValueError("Incompatible samples.")
            res1 = filter_event(*counts1, num_total, num_inc, num_exc, num_sum)
            res2 = filter_event(*counts2, num_total, num_inc, num_exc, num_sum)
            if abs(delta_psi) < abs(delta_psi_filter):
                continue
            if abs(bf) < abs(bf_filter):
                continue
            if apply_both_samples and not (res1 and res2):
                continue
            if not apply_both_samples and not (res1 or res2):
                continue
        out.append(event)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="filter_events")
    p.add_argument("--filter", dest="filter_filename", default=None,
                   help=".miso_bf file to filter")
    p.add_argument("--num-total", type=int, default=0)
    p.add_argument("--num-inc", type=int, default=0)
    p.add_argument("--num-exc", type=int, default=0)
    p.add_argument("--num-sum-inc-exc", dest="num_sum", type=int, default=0)
    p.add_argument("--delta-psi", dest="delta_psi", type=float, default=0.0)
    p.add_argument("--bayes-factor", dest="bayes_factor", type=float,
                   default=0.0)
    p.add_argument("--apply-both", dest="apply_both", action="store_true",
                   default=False)
    p.add_argument("--output-dir", dest="output_dir", default=None)
    args = p.parse_args(argv)
    if args.filter_filename is None or args.output_dir is None:
        print("Need --filter FILE.miso_bf --output-dir DIR", file=sys.stderr)
        return 1
    header, rows = read_bf_file(args.filter_filename)
    passed = filter_events(
        rows, args.num_total, args.num_inc, args.num_exc, args.num_sum,
        args.delta_psi, args.bayes_factor, args.apply_both)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(
        args.output_dir,
        os.path.basename(args.filter_filename) + ".filtered")
    with open(out_path, "w") as f:
        f.write("\t".join(header) + "\n")
        for row in passed:
            f.write("\t".join(row.get(h, "") for h in header) + "\n")
    print("%d/%d events pass the filter (%.2f percent)."
          % (len(passed), len(rows),
             100.0 * len(passed) / max(len(rows), 1)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
