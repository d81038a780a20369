"""Standalone decode+score CLI — the unit of work the ``[exp] cmd``
cluster hook submits (the reference prepends ``cmd`` to its decoding
command for HPC schedulers like run.pl/queue.pl,
ref: proto/global.proto [exp] cmd, run_exp.py:467-469).

Usage:
  python -m pytorch_kaldi_cgs_tpu.bin.decode_cli <out_dir> <ark_glob>
      <graph_dir> <text_file> [--acwt F] [--beam F] [--max-active N]
      [--min-lmwt N --max-lmwt N] [--recipe NAME]

Prints the score dict as one JSON line on success.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="decode_cli")
    ap.add_argument("out_dir")
    ap.add_argument("ark_glob")
    ap.add_argument("graph_dir")
    ap.add_argument("text_file")
    ap.add_argument("--acwt", type=float, default=0.2)
    ap.add_argument("--beam", type=float, default=13.0)
    ap.add_argument("--max-active", type=int, default=7000)
    ap.add_argument("--min-lmwt", type=int, default=0)
    ap.add_argument("--max-lmwt", type=int, default=0)
    ap.add_argument("--recipe", default=None,
                    help="scoring recipe (decode/recipes.py): score, "
                         "score_basic, score_wsj, score_sclite, "
                         "score_phrich")
    args = ap.parse_args(argv)

    from ..decode.decode_dnn import decode_dnn, decode_dnn_sweep
    if args.max_lmwt > args.min_lmwt > 0:
        res = decode_dnn_sweep(args.out_dir, args.ark_glob, args.graph_dir,
                               args.text_file, min_lmwt=args.min_lmwt,
                               max_lmwt=args.max_lmwt, beam=args.beam,
                               max_active=args.max_active,
                               recipe=args.recipe)
    else:
        res = decode_dnn(args.out_dir, args.ark_glob, args.graph_dir,
                         args.text_file, acwt=args.acwt, beam=args.beam,
                         max_active=args.max_active, recipe=args.recipe)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
