"""CLI entry point: ``python -m pytorch_kaldi_cgs_tpu.bin.run_exp
<cfg> [--section,field=value ...]`` (ref: run_exp.py:28-39)."""

import sys

from ..runtime.experiment import run_exp


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: run_exp <config.cfg> [--section,field=value ...]")
        return 2
    results = run_exp(argv[0], overrides=argv[1:])
    for k, v in results.items():
        print("%s: %s" % (k, v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
