"""Test-only entry with optional post-training pattern pruning
(ref: run_test.py:31-376).

Loads the experiment's ``final_*.pkl`` checkpoints, and when the config
has a ``[pattern]`` section with ``pattern_prun=True`` applies per-block
top-nnz ("certain-nnz") pattern pruning to every weight matrix
(ref: run_test.py:205-206 → pattern_search.py:17 →
sparsity.find_pattern_certain_nnz_model), saves the pruned model as
``*_{num}_{RxC}_{nnz}_pattern.pkl`` (ref: run_test.py:208-216), then
runs forward + decode.

usage: python -m pytorch_kaldi_cgs_tpu.bin.run_test <cfg> [overrides...]
"""

from __future__ import annotations

import configparser
import glob
import os
import sys

import numpy as np

from ..config.proto import strtobool
from ..sparsity.pattern import coo_mask
from ..runtime.checkpoint import load_checkpoint, save_checkpoint


def pattern_prune_variables(variables, pattern_shape, pattern_nnz):
    """Per-block top-nnz masks over every >=2D weight (the post-training
    'coo' prune of the reference's pattern search)."""
    params = dict(variables["params"])
    masks = dict(variables.get("masks", {}))
    for k, w in params.items():
        arr = np.asarray(w)
        if arr.ndim != 2:
            continue
        if arr.shape[0] % pattern_shape[0] or arr.shape[1] % pattern_shape[1]:
            continue
        m = coo_mask(arr, pattern_shape, pattern_nnz)
        params[k] = arr * m
        masks["pattern_" + k] = m
    return {**variables, "params": params, "masks": masks}


def _arch_finals(config, out_folder):
    """final_<arch>.pkl for exactly the architecture sections — earlier
    pruned outputs (final_*_pattern.pkl etc.) must not be re-pruned."""
    out = []
    for pkl in sorted(glob.glob(os.path.join(out_folder, "exp_files",
                                             "final_*.pkl"))):
        base = os.path.basename(pkl)[len("final_"):-len(".pkl")]
        if any(sec == base for sec in config.sections()
               if "architecture" in sec):
            out.append(pkl)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    cfg_file = argv[0]
    config = configparser.ConfigParser()
    config.read(cfg_file)
    out_folder = config["exp"]["out_folder"]

    pruned_any = False
    # pattern-prune final checkpoints if requested
    if config.has_section("pattern") and strtobool(config["pattern"]["pattern_prun"]):
        pruned_any = True
        pattern_num = int(config["pattern"]["pattern_num"])
        pattern_shape = [int(v) for v in config["pattern"]["pattern_shape"].split(",")]
        pattern_nnz = int(config["pattern"]["pattern_nnz"])
        for pkl in _arch_finals(config, out_folder):
            ckpt = load_checkpoint(pkl)
            pruned = pattern_prune_variables(ckpt["model_par"],
                                             pattern_shape, pattern_nnz)
            out_pkl = pkl.replace(".pkl", "_%d_%dx%d_%d_pattern.pkl" % (
                pattern_num, pattern_shape[0], pattern_shape[1], pattern_nnz))
            save_checkpoint(out_pkl, pruned, ckpt.get("optimizer_par"))
            # point the run at the pruned model
            base = os.path.basename(pkl)[len("final_"):-len(".pkl")]
            for sec in config.sections():
                if "architecture" in sec and sec == base:
                    config[sec]["arch_pretrain_file"] = out_pkl
            print("pattern-pruned checkpoint: %s" % out_pkl)

    # [pruning] section: the unified multi-mode pruning() dispatcher
    # (ref: sparsity/sparsity.py:33-270 driven by config_train.py) —
    # post-prune the final checkpoints with any of dense/thre/sparse/
    # pattern/coo/ptcoo/find_retrain before forward+decode
    if config.has_section("pruning"):
        from ..sparsity.pruning import PruningConfig, pruning
        pruned_any = True
        pcfg = PruningConfig.from_ini_section(config["pruning"])
        for pkl in _arch_finals(config, out_folder):
            ckpt = load_checkpoint(pkl)
            pruned = pruning(ckpt["model_par"], pcfg)
            out_pkl = pkl.replace(".pkl", "_%s.pkl" % pcfg.sparse_mode)
            save_checkpoint(out_pkl, pruned, ckpt.get("optimizer_par"))
            base = os.path.basename(pkl)[len("final_"):-len(".pkl")]
            for sec in config.sections():
                if "architecture" in sec and sec == base:
                    config[sec]["arch_pretrain_file"] = out_pkl
            print("pruning(%s) checkpoint: %s" % (pcfg.sparse_mode, out_pkl))

    # run forward + decoding through the standard orchestrator: all train
    # .info markers exist after training, so run_exp skips to forward.
    # When checkpoints were pruned, the forward must actually USE them
    # (ref run_test.py:182-216 loads the pruned pkl into the nets): write
    # a derived cfg whose forward chunks load arch_pretrain_file, and
    # clear the forward .info/ark artifacts so forward re-runs.
    if pruned_any:
        config["exp"]["forward_with_pretrain"] = "True"
        derived = os.path.join(out_folder, "exp_files",
                               "run_test_derived.cfg")
        os.makedirs(os.path.dirname(derived), exist_ok=True)
        with open(derived, "w") as f:
            config.write(f)
        for pat in ("forward_*.info", "forward_*.ark"):
            for p in glob.glob(os.path.join(out_folder, "exp_files", pat)):
                os.remove(p)
        # chunk cfgs are only generated when list_chunks.txt is absent
        # (resume semantics); remove it so the forward cfgs are rewritten
        # pointing at the pruned checkpoints (train .info markers still
        # skip all training)
        lc = os.path.join(out_folder, "exp_files", "list_chunks.txt")
        if os.path.exists(lc):
            os.remove(lc)
        cfg_file = derived
    from ..runtime.experiment import run_exp
    results = run_exp(cfg_file, overrides=argv[1:])
    for k, v in results.items():
        print("%s: %s" % (k, v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
