"""Experiment orchestrator — the native ``run_exp`` (ref: run_exp.py).

Full lifecycle: config validation → chunk list/config generation →
epoch×chunk training with in-memory state carry + on-disk resumability
(.info markers, pretrain chains) → newbob LR annealing → forward
(posterior arks) → native decode + scoring → res.res reporting.
"""

from __future__ import annotations

import configparser
import glob
import math
import os
import re
import shutil
import time
from typing import Dict, List, Optional

import numpy as np

from ..config.experiment import (cfg_item2sec, compute_n_chunks, create_configs,
                                 create_lists, parse_lab_field,
                                 read_args_command_line)
from ..config.proto import check_cfg, strtobool
from ..config.schedule import expand_str_ep
from .chunk import run_nn


def _ep_fmt(n: int) -> str:
    return "0" + str(int(max(math.ceil(np.log10(max(n, 1))), 1))) + "d"


def compute_avg_performance(info_lst: List[str]):
    """Average loss/err, summed time over chunk .info files
    (ref: utils.py:202-218)."""
    losses, errors, times = [], [], []
    for path in info_lst:
        c = configparser.ConfigParser()
        c.read(path)
        losses.append(float(c["results"]["loss"]))
        errors.append(float(c["results"]["err"]))
        times.append(float(c["results"]["elapsed_time_chunk"]))
    return float(np.mean(losses)), float(np.mean(errors)), float(np.sum(times))


def _change_lr_in_cfg(cfg_path: str, arch_lr: Dict[str, str]) -> None:
    """Rewrite arch_lr of a chunk cfg (newbob annealing touch-up,
    ref: utils.py:2240-2250 change_lr_cfg)."""
    c = configparser.ConfigParser()
    c.read(cfg_path)
    changed = False
    for sec, lr in arch_lr.items():
        if c.has_section(sec) and c[sec]["arch_lr"] != lr:
            c[sec]["arch_lr"] = lr
            changed = True
    if changed:
        with open(cfg_path, "w") as f:
            c.write(f)


def run_exp(cfg_file: str, overrides: Optional[List[str]] = None) -> Dict:
    config = configparser.ConfigParser()
    if not os.path.exists(cfg_file):
        raise FileNotFoundError(cfg_file)
    config.read(cfg_file)
    if overrides:
        read_args_command_line(overrides, config)

    out_folder = config["exp"]["out_folder"]
    os.makedirs(os.path.join(out_folder, "exp_files"), exist_ok=True)

    # per-experiment isolation: block-sparse layouts are jit-trace
    # constants derived from this experiment's masks
    from .chunk import _RUNNER_CACHE
    _RUNNER_CACHE.clear()

    # validated + expanded config; persist as conf.cfg (ref: run_exp.py:78)
    config, name_data, name_arch = check_cfg(
        cfg_file, config, config["cfg_proto"]["cfg_proto"])
    conf_path = os.path.join(out_folder, "conf.cfg")
    with open(conf_path, "w") as f:
        config.write(f)

    n_ep = int(config["exp"]["n_epochs_tr"])
    n_ep_fmt = _ep_fmt(n_ep)
    tr_lst = config["data_use"]["train_with"].split(",")
    valid_lst = config["data_use"]["valid_with"].split(",")
    forward_lst = config["data_use"]["forward_with"].split(",")
    is_production = strtobool(config["exp"].get("production", "False"))
    apply_prune_ep = int(config["exp"].get("apply_prune_ep", n_ep + 10))

    arch_secs = [s for s in config.sections() if "architecture" in s]
    lr = {s: expand_str_ep(config[s]["arch_lr"], "float", n_ep) for s in arch_secs}
    auto_anneal = {s: len(config[s]["arch_lr"].split("|")) == 1 and
                   "*" not in config[s]["arch_lr"] for s in arch_secs}
    improvement_threshold = {s: float(config[s]["arch_improvement_threshold"])
                             for s in arch_secs}
    halving_factor = {s: float(config[s]["arch_halving_factor"]) for s in arch_secs}

    if not glob.glob(os.path.join(out_folder, "exp_files", "train_*ep*.lst")):
        create_lists(config)
    if not os.path.exists(os.path.join(out_folder, "exp_files", "list_chunks.txt")):
        create_configs(config)
    cfg_chunk_list = open(os.path.join(
        out_folder, "exp_files", "list_chunks.txt")).read().split()

    res_path = os.path.join(out_folder, "res.res")
    res_file = open(res_path, "a")
    log_file = open(os.path.join(out_folder, "log.log"), "a")

    def log(msg: str) -> None:
        log_file.write("[%s] %s\n" % (time.strftime("%Y-%m-%d %H:%M:%S"), msg))
        log_file.flush()

    log("run_exp start: %s" % cfg_file)

    # ---------------- training loop ----------------
    from .checkpoint import AsyncCheckpointer
    ckptr = AsyncCheckpointer()
    chunk_data = None
    variables = None
    opt_states = None
    op_counter = 0
    valid_perf_prev: Dict[str, List[float]] = {}
    model_files: Dict[str, str] = {}

    def next_cfg():
        return cfg_chunk_list[op_counter + 1] if op_counter + 1 < len(cfg_chunk_list) else None

    for ep in range(n_ep):
        valid_perf: Dict[str, List[float]] = {}
        tr_loss_tot = tr_err_tot = tot_time = 0.0
        for tr_data in tr_lst:
            n_ck = compute_n_chunks(out_folder, tr_data, ep, n_ep_fmt, "train")
            ck_fmt = _ep_fmt(n_ck)
            for ck in range(n_ck):
                stem = os.path.join(out_folder, "exp_files",
                                    "train_%s_ep%s_ck%s" % (
                                        tr_data, format(ep, n_ep_fmt),
                                        format(ck, ck_fmt)))
                info_file = stem + ".info"
                cfg_chunk = stem + ".cfg"
                _change_lr_in_cfg(cfg_chunk, {s: lr[s][ep] for s in arch_secs})
                model_files_past = dict(model_files)
                model_files = {s: stem + "_%s.pkl" % s for s in arch_secs}
                if not os.path.exists(info_file):
                    print("Training %s ep %d chunk %d/%d" % (tr_data, ep, ck + 1, n_ck))
                    if_prune = (ck + 1) == n_ck and (ep + 1) >= apply_prune_ep
                    chunk_data, info = run_nn(chunk_data, cfg_chunk, next_cfg(),
                                              variables, opt_states,
                                              if_prune=if_prune,
                                              checkpointer=ckptr)
                    variables = info["variables"]
                    opt_states = info["opt_states"]
                else:
                    chunk_data, variables, opt_states = None, None, None
                op_counter += 1
                # delete the previous chunk's checkpoints, ordered BEHIND
                # any pending writes (ref: run_exp.py:230-234)
                stale = [p for p in model_files_past.values()]
                ckptr.run(lambda paths=stale: [os.remove(p) for p in paths
                                               if os.path.exists(p)])
            ckptr.wait()   # .info markers must be on disk before the glob
            infos = sorted(glob.glob(os.path.join(
                out_folder, "exp_files",
                "train_%s_ep%s*.info" % (tr_data, format(ep, n_ep_fmt)))))
            tr_loss, tr_err, tr_time = compute_avg_performance(infos)
            tr_loss_tot += tr_loss
            tr_err_tot += tr_err
            tot_time += tr_time

        for valid_data in valid_lst:
            n_ck = compute_n_chunks(out_folder, valid_data, ep, n_ep_fmt, "valid")
            ck_fmt = _ep_fmt(n_ck)
            for ck in range(n_ck):
                stem = os.path.join(out_folder, "exp_files",
                                    "valid_%s_ep%s_ck%s" % (
                                        valid_data, format(ep, n_ep_fmt),
                                        format(ck, ck_fmt)))
                if not os.path.exists(stem + ".info"):
                    print("Validating %s ep %d chunk %d/%d" % (valid_data, ep, ck + 1, n_ck))
                    chunk_data, info = run_nn(chunk_data, stem + ".cfg", next_cfg(),
                                              variables, opt_states)
                    # eval does not change variables
                else:
                    chunk_data = None
                op_counter += 1
            infos = sorted(glob.glob(os.path.join(
                out_folder, "exp_files",
                "valid_%s_ep%s*.info" % (valid_data, format(ep, n_ep_fmt)))))
            v_loss, v_err, v_time = compute_avg_performance(infos)
            valid_perf[valid_data] = [v_loss, v_err, v_time]
            tot_time += v_time

        lr_str = ",".join("%s=%s" % (s, lr[s][ep]) for s in arch_secs)
        line = ("ep=%s tr=[%s] loss=%.3f err=%.3f " %
                (format(ep, n_ep_fmt), ",".join(tr_lst), tr_loss_tot, tr_err_tot))
        for vd in valid_lst:
            line += ("valid=%s loss=%.3f err=%.3f " %
                     (vd, valid_perf[vd][0], valid_perf[vd][1]))
        line += "lr=%s time(s)=%d" % (lr_str, int(tot_time))
        print(line)
        res_file.write(line + "\n")
        res_file.flush()
        log(line)

        # newbob annealing (ref: run_exp.py:317-332)
        if ep > 0 and valid_perf_prev:
            err_mean = float(np.mean([v[1] for v in valid_perf.values()]))
            err_mean_prev = float(np.mean([v[1] for v in valid_perf_prev.values()]))
            for s in arch_secs:
                if ep < n_ep - 1 and auto_anneal[s]:
                    if (err_mean_prev - err_mean) / max(err_mean, 1e-10) < \
                            improvement_threshold[s]:
                        new_lr = float(lr[s][ep]) * halving_factor[s]
                        for i in range(ep + 1, n_ep):
                            lr[s][i] = str(new_lr)
        valid_perf_prev = valid_perf

    # final checkpoints for production (ref: run_exp.py:334-338)
    ckptr.close()
    for s in arch_secs:
        final = os.path.join(out_folder, "exp_files", "final_%s.pkl" % s)
        if model_files.get(s) and os.path.exists(model_files[s]) and \
                not os.path.exists(final):
            shutil.copyfile(model_files[s], final)

    # ---------------- forward ----------------
    ep = n_ep - 1
    for fwd_data in forward_lst:
        n_ck = compute_n_chunks(out_folder, fwd_data, ep, n_ep_fmt, "forward")
        ck_fmt = _ep_fmt(n_ck)
        for ck in range(n_ck):
            stem = os.path.join(out_folder, "exp_files",
                                "forward_%s_ep%s_ck%s" % (
                                    fwd_data, format(ep, n_ep_fmt),
                                    format(ck, ck_fmt)))
            if not os.path.exists(stem + ".info"):
                print("Forwarding %s chunk %d/%d" % (fwd_data, ck + 1, n_ck))
                chunk_data, info = run_nn(chunk_data, stem + ".cfg", next_cfg(),
                                          variables, opt_states)
            else:
                chunk_data = None
            op_counter += 1

    # ---------------- decoding ----------------
    results = {}
    forward_outs = config["forward"]["forward_out"].split(",")
    require_decoding = [strtobool(v) for v in
                        config["forward"]["require_decoding"].split(",")]
    if not is_production and config.has_section("decoding"):
        from ..decode.decode_dnn import decode_dnn, decode_dnn_sweep
        # [exp] cmd: cluster-submission prefix (run.pl/queue.pl class,
        # ref: run_exp.py:467-469) — decode jobs run as
        #   <cmd> python -m ...bin.decode_cli <args>
        cluster_cmd = config["exp"].get("cmd", "").strip()
        acwt = float(config["decoding"].get("acwt", 0.2))
        scoring_opts = config["decoding"].get("scoring_opts", "")
        m_min = re.search(r"--min-lmwt (\d+)", scoring_opts)
        m_max = re.search(r"--max-lmwt (\d+)", scoring_opts)
        lmwt_lo = int(m_min.group(1)) if m_min else None
        lmwt_hi = int(m_max.group(1)) if m_max else None
        sweep = bool(lmwt_lo is not None and lmwt_hi is not None
                     and lmwt_hi > lmwt_lo)
        beam = float(config["decoding"].get("beam", 13.0))
        max_active = int(config["decoding"].get("max_active", 7000))
        # [decoding] rescore_arpa: second-pass LM for lattice rescoring
        # (fglarge-class, ref README.md:278-283); the first-pass ARPA is
        # rescore_first_pass_arpa or <graph_dir>/lm.arpa
        rescore_arpa = config["decoding"].get("rescore_arpa", "").strip()
        first_pass_arpa = config["decoding"].get(
            "rescore_first_pass_arpa", "").strip()
        rescore_kw = {}
        if rescore_arpa:
            rescore_kw = {"rescore_arpa": rescore_arpa,
                          "first_pass_arpa": first_pass_arpa or None}
        # [decoding] scoring_recipe: per-corpus hyp/ref conventions
        # (score/score_basic/score_wsj/score_sclite/score_phrich —
        # decode/recipes.py; ref kaldi_decoding_scripts/local/score_*.sh).
        # A recipe without explicit --min/max-lmwt in scoring_opts sweeps
        # the recipe's own lmwt range (e.g. wsj: 5..20).
        scoring_recipe = config["decoding"].get("scoring_recipe",
                                                "").strip()
        if scoring_recipe:
            rescore_kw["recipe"] = scoring_recipe
            if not sweep:
                from ..decode.recipes import get_recipe
                _rec = get_recipe(scoring_recipe)
                if _rec.max_lmwt > _rec.min_lmwt:
                    sweep = True
                    lmwt_lo, lmwt_hi = _rec.min_lmwt, _rec.max_lmwt
        for fwd_data in forward_lst:
            sec = cfg_item2sec(config, "data_name", fwd_data)
            lab_names, lab_folders, _ = parse_lab_field(config[sec]["lab"])
            graphs = re.findall(r"lab_graph=(.*)", config[sec]["lab"])
            datafs = re.findall(r"lab_data_folder=(.*)", config[sec]["lab"])
            graph_dir = graphs[0].strip() if graphs else ""
            text_file = os.path.join(datafs[0].strip(), "text") if datafs else ""
            for i, fo in enumerate(forward_outs):
                if not require_decoding[i]:
                    continue
                ark_glob = os.path.join(
                    out_folder, "exp_files",
                    "forward_%s_ep%s_ck*_%s*_to_decode.ark" % (
                        fwd_data, format(ep, n_ep_fmt), fo))
                dec_dir = os.path.join(out_folder,
                                       "decode_%s_out_%s" % (fwd_data, fo))
                try:
                    if cluster_cmd:
                        import json as _json
                        import shlex
                        import subprocess
                        import sys as _sys
                        argv = [_sys.executable, "-m",
                                "pytorch_kaldi_cgs_tpu.bin.decode_cli",
                                dec_dir, ark_glob, graph_dir, text_file,
                                "--acwt", str(acwt), "--beam", str(beam),
                                "--max-active", str(max_active)]
                        if sweep:
                            argv += ["--min-lmwt", str(lmwt_lo),
                                     "--max-lmwt", str(lmwt_hi)]
                        if scoring_recipe:
                            argv += ["--recipe", scoring_recipe]
                        proc = subprocess.run(
                            shlex.split(cluster_cmd) + argv,
                            capture_output=True, text=True, check=True)
                        res = _json.loads(proc.stdout.strip().splitlines()[-1])
                    elif sweep:
                        res = decode_dnn_sweep(
                            dec_dir, ark_glob, graph_dir, text_file,
                            min_lmwt=lmwt_lo, max_lmwt=lmwt_hi,
                            beam=beam, max_active=max_active, **rescore_kw)
                    else:
                        res = decode_dnn(dec_dir, ark_glob, graph_dir,
                                         text_file, acwt=acwt, beam=beam,
                                         max_active=max_active, **rescore_kw)
                    line = "%%WER %.2f [decode_%s_out_%s%s]" % (
                        res["wer"], fwd_data, fo,
                        " lmwt=%d" % res["lmwt"] if "lmwt" in res else "")
                    print(line)
                    res_file.write(line + "\n")
                    results["wer_%s_%s" % (fwd_data, fo)] = res["wer"]
                except (FileNotFoundError, ValueError) as e:
                    print("decoding skipped: %s" % e)
                    log("decoding skipped: %s" % e)
                except Exception as e:
                    if type(e).__name__ == "CalledProcessError":
                        msg = "cluster decode failed: %s\n%s" % (
                            e, getattr(e, "stderr", ""))
                        print(msg)
                        log(msg)
                    else:
                        raise
    res_file.close()

    # training curves + architecture diagram at completion
    # (ref: utils.py:2104-2220 auto loss.png/acc.png; :1417-1532 model.svg)
    try:
        from .plots import create_curves
        create_curves(out_folder, n_ep, valid_lst)
    except Exception as e:   # plotting must never fail the experiment
        log("create_curves skipped: %s" % e)
    try:
        from ..utils.diagram import create_block_diagram
        create_block_diagram(config, out_folder)
    except Exception as e:
        log("create_block_diagram skipped: %s" % e)

    log("run_exp done")
    log_file.close()
    results["res_file"] = res_path
    return results
