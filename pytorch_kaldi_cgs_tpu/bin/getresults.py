"""Collect decode results across experiments (ref: getresults.sh /
RESULTS / check_res_dec.sh): scans exp*/decode*/wer files and prints
the best WER per experiment.

usage: python -m pytorch_kaldi_cgs_tpu.bin.getresults [exp_root=exp]
"""

from __future__ import annotations

import glob
import os
import re
import sys


def collect(exp_root: str = "exp"):
    rows = []
    for exp_dir in sorted(glob.glob(os.path.join(exp_root, "*"))):
        if not os.path.isdir(exp_dir):
            continue
        best = None
        best_where = ""
        for wer_file in glob.glob(os.path.join(exp_dir, "decode*", "wer")) + \
                glob.glob(os.path.join(exp_dir, "decode*", "score_*", "wer")):
            line = open(wer_file).readline()
            m = re.search(r"%WER ([\d.]+)", line)
            if m and (best is None or float(m.group(1)) < best):
                best = float(m.group(1))
                best_where = os.path.dirname(wer_file)
        if best is not None:
            rows.append((os.path.basename(exp_dir), best, best_where))
    return rows


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    root = argv[0] if argv else "exp"
    rows = collect(root)
    for name, wer, where in rows:
        print("%-40s %%WER %.2f  (%s)" % (name, wer, where))
    if not rows:
        print("no decode results under %s" % root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
