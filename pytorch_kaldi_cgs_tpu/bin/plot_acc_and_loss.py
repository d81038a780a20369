"""Plot training curves from an experiment folder (the reference's
standalone plot_acc_and_loss.py).

Usage: python -m pytorch_kaldi_cgs_tpu.bin.plot_acc_and_loss <out_folder>

Parses <out_folder>/res.res and writes generated_outputs/{tr,valid}_*
text series plus loss.png / acc.png (ref: utils.py:2104-2220,
plot_acc_and_loss.py).
"""

from __future__ import annotations

import os
import sys

from ..runtime.plots import create_curves, parse_res_file


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    out_folder = argv[0]
    rows = parse_res_file(os.path.join(out_folder, "res.res"))
    if not rows:
        print("no epoch lines in %s/res.res" % out_folder)
        return 1
    valid = sorted({vd for r in rows for vd in r["valid"]})
    create_curves(out_folder, len(rows), valid)
    gen = os.path.join(out_folder, "generated_outputs")
    print("wrote %s" % ", ".join(
        sorted(p for p in os.listdir(gen))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
