"""One-command real-data launcher (VERDICT r4 item 9; docs/REAL_DATA.md).

The shipped cfgs reference a Kaldi egs tree through literal ``$TIMIT``
(or ``$LIBRI``) placeholders, exactly like the reference's cfgs
(ref: /root/reference/cfg/TIMIT_CGS_wyh/*.cfg, README.md:100-160 — the
reference makes the user hand-edit every path; here substitution +
validation + launch is one command):

  python -m pytorch_kaldi_cgs_tpu.bin.run_real \
      cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_cgs_dense.cfg \
      --root /path/to/kaldi/egs/timit/s5 [--var TIMIT] \
      [--check-only] [--out exp/my_run] [--sec,field=value ...]

Does, in order:
  1. substitute ``$<VAR>`` with --root everywhere in the cfg;
  2. validate the mapped tree BEFORE any compute: every fea_lst /
     lab_folder / lab_data_folder / lab_graph path exists, each
     lab_folder has a parseable transition model (binary/text
     final.mdl or final.mdl.json) and ali*.gz archives, graph dirs
     carry HCLG.fst + words.txt (or a phone-task graph.json);
  3. with --check-only: also run the typed proto cfg check and chunk
     list generation (everything short of training), then stop;
  4. otherwise: launch the full experiment (run_exp).
"""

from __future__ import annotations

import argparse
import configparser
import os
import re
import sys
from typing import List


def substitute(cfg_text: str, var: str, root: str) -> str:
    return cfg_text.replace("$" + var, root.rstrip("/"))


def collect_paths(cfg_text: str) -> dict:
    """Pull every dataset-tree path out of the cfg body."""
    paths = {
        "fea_lst": re.findall(r"fea_lst=(\S+)", cfg_text),
        "lab_folder": re.findall(r"lab_folder=(\S+)", cfg_text),
        "lab_data_folder": re.findall(r"lab_data_folder=(\S+)", cfg_text),
        "lab_graph": re.findall(r"lab_graph=(\S+)", cfg_text),
        "cmvn_ark": re.findall(r"ark:(\S+\.ark)", cfg_text),
    }
    return {k: sorted(set(v)) for k, v in paths.items()}


def validate_tree(paths: dict) -> List[str]:
    """Returns a list of problems (empty = tree looks usable)."""
    import glob as _glob

    from ..data.dataset import find_transition_model
    problems: List[str] = []
    for lst in paths["fea_lst"]:
        if not os.path.exists(lst):
            problems.append("fea_lst missing: %s" % lst)
    for ark in paths["cmvn_ark"]:
        if not os.path.exists(ark):
            problems.append("cmvn ark missing: %s" % ark)
    for d in paths["lab_folder"]:
        if not os.path.isdir(d):
            problems.append("lab_folder missing: %s" % d)
            continue
        if not _glob.glob(os.path.join(d, "ali*.gz")) and \
                not _glob.glob(os.path.join(d, "ali.*")):
            problems.append("no ali*.gz archives in %s" % d)
        try:
            find_transition_model(d)
        except Exception as e:
            problems.append("unusable transition model in %s: %s" % (d, e))
    for d in paths["lab_data_folder"]:
        if not os.path.isfile(os.path.join(d, "text")):
            problems.append("no text (reference transcripts) in %s" % d)
    for d in paths["lab_graph"]:
        if not os.path.isdir(d):
            problems.append("lab_graph missing: %s" % d)
            continue
        has_hclg = os.path.exists(os.path.join(d, "HCLG.fst")) and \
            os.path.exists(os.path.join(d, "words.txt"))
        has_phone = os.path.exists(os.path.join(d, "graph.json"))
        has_lex = os.path.exists(os.path.join(d, "lexicon.txt")) and \
            os.path.exists(os.path.join(d, "words.txt"))
        if not (has_hclg or has_phone or has_lex):
            problems.append(
                "graph dir %s has neither HCLG.fst+words.txt (Kaldi "
                "import), lexicon.txt+words.txt (native construction), "
                "nor graph.json (phone task)" % d)
    return problems


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="run_real")
    ap.add_argument("cfg")
    ap.add_argument("--root", required=True,
                    help="Kaldi egs tree, e.g. $KALDI_ROOT/egs/timit/s5")
    ap.add_argument("--var", default=None,
                    help="placeholder to substitute (default: first "
                         "$VAR found in the cfg)")
    ap.add_argument("--out", default=None, help="override out_folder")
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("overrides", nargs="*",
                    help="--sec,field=value cfg overrides")
    args = ap.parse_args(argv)

    text = open(args.cfg).read()
    var = args.var
    if var is None:
        m = re.search(r"\$([A-Z][A-Z0-9_]*)", text)
        if not m:
            print("no $VAR placeholder found; using cfg paths as-is")
        else:
            var = m.group(1)
    if var:
        text = substitute(text, var, args.root)
    if args.out:
        text = re.sub(r"(?m)^out_folder = .*$",
                      "out_folder = %s" % args.out, text)

    paths = collect_paths(text)
    problems = validate_tree(paths)
    if problems:
        print("the mapped tree is NOT usable:")
        for p in problems:
            print("  - " + p)
        return 1
    print("tree ok: %d feature lists, %d label dirs, %d graph dirs"
          % (len(paths["fea_lst"]), len(paths["lab_folder"]),
             len(paths["lab_graph"])))

    mapped = os.path.splitext(args.cfg)[0] + ".mapped.cfg"
    out_dir = re.search(r"(?m)^out_folder = (.*)$", text).group(1).strip()
    os.makedirs(out_dir, exist_ok=True)
    mapped = os.path.join(out_dir, os.path.basename(mapped))
    with open(mapped, "w") as f:
        f.write(text)
    print("mapped cfg written: %s" % mapped)

    if args.check_only:
        # typed proto validation + chunk list generation, no training
        from ..config.experiment import create_lists, read_args_command_line
        from ..config.proto import check_cfg
        config = configparser.ConfigParser()
        config.read(mapped)
        if args.overrides:
            read_args_command_line(args.overrides, config)
        config, _, _ = check_cfg(mapped, config,
                                 config["cfg_proto"]["cfg_proto"])
        create_lists(config)
        import glob as _glob
        n = len(_glob.glob(os.path.join(out_dir, "exp_files", "*.lst")))
        print("check-only OK: cfg validated, %d chunk lists generated" % n)
        return 0

    from ..runtime.experiment import run_exp
    results = run_exp(mapped, overrides=args.overrides or None)
    for k, v in sorted(results.items()):
        if k.startswith("wer_"):
            print("%s = %.2f" % (k, v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
