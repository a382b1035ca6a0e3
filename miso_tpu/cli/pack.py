"""`miso_pack` -- pack raw .miso chromosome dirs into .miso_db SQLite files.
Parity: misopy/miso_pack.py:29-79."""
from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys


def pack_dir(miso_output_dir: str) -> int:
    from miso_tpu.io import miso_db
    chrom_dirs = [d for d in glob.glob(os.path.join(miso_output_dir, "*"))
                  if miso_db.is_miso_unpacked_dir(d)]
    if not chrom_dirs:
        print("No unpacked MISO directories in %s" % miso_output_dir)
        return 0
    n = 0
    for d in chrom_dirs:
        out = os.path.join(miso_output_dir,
                           "%s%s" % (os.path.basename(d), miso_db.MISO_DB_EXT))
        print("Packing %s -> %s" % (d, out))
        if miso_db.miso_dir_to_db(d, out) is not None:
            shutil.rmtree(d)
            n += 1
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="miso_pack")
    p.add_argument("--pack", dest="pack_dir", default=None,
                   help="MISO output directory to pack.")
    args = p.parse_args(argv)
    if args.pack_dir is None:
        print("Need --pack MISO_OUTPUT_DIR", file=sys.stderr)
        return 1
    pack_dir(os.path.abspath(os.path.expanduser(args.pack_dir)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
