"""Standalone decode-only driver (ref: decoding.py — which hardcodes its
config path at decoding.py:23; here it is an argument).

Re-runs only the decoding stage over posterior arks an earlier forward
pass produced.

usage: python -m pytorch_kaldi_cgs_tpu.bin.decoding <cfg> [--acwt X]
"""

from __future__ import annotations

import configparser
import math
import os
import re
import sys

import numpy as np

from ..config.experiment import cfg_item2sec, parse_lab_field
from ..config.proto import strtobool
from ..decode.decode_dnn import decode_dnn


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    cfg_file = argv[0]
    config = configparser.ConfigParser()
    config.read(cfg_file)
    out_folder = config["exp"]["out_folder"]
    n_ep = int(config["exp"]["n_epochs_tr"])
    ep_fmt = "0" + str(int(max(math.ceil(np.log10(max(n_ep, 1))), 1))) + "d"
    acwt = float(config["decoding"].get("acwt", 0.2))
    for i, a in enumerate(argv):
        if a == "--acwt":
            acwt = float(argv[i + 1])

    forward_outs = config["forward"]["forward_out"].split(",")
    require_decoding = [strtobool(v) for v in
                        config["forward"]["require_decoding"].split(",")]
    results = {}
    for fwd_data in config["data_use"]["forward_with"].split(","):
        sec = cfg_item2sec(config, "data_name", fwd_data)
        graphs = re.findall(r"lab_graph=(.*)", config[sec]["lab"])
        datafs = re.findall(r"lab_data_folder=(.*)", config[sec]["lab"])
        graph_dir = graphs[0].strip()
        text_file = os.path.join(datafs[0].strip(), "text")
        for i, fo in enumerate(forward_outs):
            if not require_decoding[i]:
                continue
            ark_glob = os.path.join(
                out_folder, "exp_files",
                "forward_%s_ep%s_ck*_%s*_to_decode.ark" % (
                    fwd_data, format(n_ep - 1, ep_fmt), fo))
            dec_dir = os.path.join(out_folder,
                                   "decode_%s_out_%s" % (fwd_data, fo))
            res = decode_dnn(dec_dir, ark_glob, graph_dir, text_file, acwt=acwt)
            print("%%WER %.2f [%s]" % (res["wer"], dec_dir))
            results[dec_dir] = res["wer"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
