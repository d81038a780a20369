"""Experiment orchestration config machinery: chunk list generation,
chunk-specific config derivation, CLI overrides.

This is the on-disk resumability contract of the toolkit (kept from the
reference): per-epoch shuffled ``.lst`` files split into N_chunks, one
derived ``.cfg`` per (phase, epoch, chunk) chaining pretrain checkpoints,
and an ordered ``exp_files/list_chunks.txt``
(ref: utils.py:747-1149).
"""

from __future__ import annotations

import configparser
import glob
import math
import os
import random
import re
from typing import Dict, List, Tuple

import numpy as np

from .proto import ConfigError, check_consistency_with_proto, check_cfg, strtobool
from .schedule import expand_str_ep


# ---------------------------------------------------------------------------
# field parsers
# ---------------------------------------------------------------------------

def parse_fea_field(fea: str) -> Tuple[List[str], List[str], List[str], List[str], List[str]]:
    """Parse the multi-line ``fea`` block into parallel lists
    (ref: utils.py:1152-1208)."""
    names, lsts, opts, cwl, cwr = [], [], [], [], []
    for line in fea.split("\n"):
        line = re.sub(" +", " ", line).strip()
        if line.startswith("fea_name="):
            names.append(line.split("=", 1)[1])
        elif line.startswith("fea_lst="):
            lsts.append(line.split("=", 1)[1])
        elif line.startswith("fea_opts="):
            opts.append(line.split("fea_opts=", 1)[1])
        elif line.startswith("cw_left="):
            cwl.append(line.split("=", 1)[1])
        elif line.startswith("cw_right="):
            cwr.append(line.split("=", 1)[1])
    if sorted(names) != sorted(set(names)):
        raise ConfigError("fea_name values must be unique, got %s" % names)
    snt_prev = None
    for lst in lsts:
        if not os.path.isfile(lst):
            raise ConfigError("fea_lst %r does not exist" % lst)
        snts = sorted(line.split(" ")[0] for line in open(lst))
        if snt_prev is not None and snts != snt_prev:
            raise ConfigError("fea_lst files contain different sentence sets")
        snt_prev = snts
    return names, lsts, opts, cwl, cwr


def parse_lab_field(lab: str) -> Tuple[List[str], List[str], List[str]]:
    """Parse the multi-line ``lab`` block (ref: utils.py:1211-1243)."""
    names, folders, opts = [], [], []
    for line in lab.split("\n"):
        line = re.sub(" +", " ", line).strip()
        if line.startswith("lab_name="):
            names.append(line.split("=", 1)[1])
        elif line.startswith("lab_folder="):
            folders.append(line.split("=", 1)[1])
        elif line.startswith("lab_opts="):
            opts.append(line.split("lab_opts=", 1)[1])
    if sorted(names) != sorted(set(names)):
        raise ConfigError("lab_name values must be unique, got %s" % names)
    for folder in folders:
        if names != ["none"] and not os.path.isdir(folder):
            raise ConfigError("lab_folder %r does not exist" % folder)
    return names, folders, opts


def cfg_item2sec(config: configparser.ConfigParser, field: str, value: str) -> str:
    """Find the section whose ``field`` equals ``value``
    (ref: utils.py:728-736)."""
    for sec in config.sections():
        if field in dict(config.items(sec)):
            if config[sec][field] == value:
                return sec
    raise ConfigError("%s=%s not found in config" % (field, value))


def dict_fea_lab_arch(config: configparser.ConfigParser):
    """From a *chunk* config, collect the feature/label/architecture specs
    actually used by the [model] section, in first-use order
    (ref: utils.py:1611-1746). Returns (fea_streams, lab_streams,
    arch_sections) where arch_sections maps arch_name -> section name."""
    from ..data.dataset import FeaStream, LabStream

    model_lines = config["model"]["model"].replace(" ", "").split("\n")
    fea_field = config["data_chunk"]["fea"]
    lab_field = config["data_chunk"]["lab"]
    fea_names = re.findall(r"fea_name=(.*)\n", fea_field.replace(" ", "") + "\n")
    lab_names = re.findall(r"lab_name=(.*)\n", lab_field.replace(" ", "") + "\n")
    arch_secs = {config[s]["arch_name"]: s for s in config.sections()
                 if "architecture" in s}

    def fea_block(name: str) -> "FeaStream":
        pat = (r"fea_name=" + re.escape(name) +
               r"\s*\n\s*fea_lst=(.*)\n\s*fea_opts=(.*)\n\s*cw_left=(.*)\n\s*cw_right=(.*)")
        m = re.search(pat, fea_field + "\n")
        if not m:
            raise ConfigError("feature %r not found in data_chunk fea" % name)
        return FeaStream(name, m.group(1).strip(), m.group(2).strip(),
                         int(m.group(3)), int(m.group(4)))

    def lab_block(name: str) -> "LabStream":
        pat = (r"lab_name=" + re.escape(name) +
               r"\s*\n\s*lab_folder=(.*)\n\s*lab_opts=(.*)\n")
        m = re.search(pat, lab_field + "\n")
        if not m:
            raise ConfigError("label %r not found in data_chunk lab" % name)
        rest = lab_field[m.end():]
        count = re.search(r"lab_count_file=(.*)", m.group(0) + rest.split("lab_name=")[0])
        dataf = re.search(r"lab_data_folder=(.*)", (m.group(0) + rest.split("lab_name=")[0]))
        graph = re.search(r"lab_graph=(.*)", (m.group(0) + rest.split("lab_name=")[0]))
        return LabStream(name, m.group(1).strip(), m.group(2).strip(),
                         count.group(1).strip() if count else "auto",
                         dataf.group(1).strip() if dataf else "",
                         graph.group(1).strip() if graph else "")

    fea_used: Dict[str, "FeaStream"] = {}
    lab_used: Dict[str, "LabStream"] = {}
    arch_used: Dict[str, str] = {}
    pat3 = re.compile(r"(.+)=(\w+)\(([^,()]+),([^,()]+),([^,()]+)\)")
    pat2 = re.compile(r"(.+)=(\w+)\(([^,()]+),([^,()]+)\)")
    for line in model_lines:
        if not line:
            continue
        m = pat3.match(line) or pat2.match(line)
        if not m:
            raise ConfigError("bad model line %r" % line)
        inputs = list(m.groups())[2:]
        for inp in inputs:
            if inp in fea_names and inp not in fea_used:
                fea_used[inp] = fea_block(inp)
            if inp in lab_names and inp not in lab_used:
                lab_used[inp] = lab_block(inp)
            if inp in arch_secs and inp not in arch_used:
                arch_used[inp] = arch_secs[inp]
    return list(fea_used.values()), list(lab_used.values()), arch_used


def is_sequential(config: configparser.ConfigParser, arch_used: Dict[str, str]) -> bool:
    """True if any used architecture is sequential (ref: utils.py:1593-1608)."""
    return any(strtobool(config[sec]["arch_seq_model"]) for sec in arch_used.values())


# ---------------------------------------------------------------------------
# CLI overrides
# ---------------------------------------------------------------------------

def read_args_command_line(args: List[str], config: configparser.ConfigParser):
    """Apply ``--section,field=value`` and 4-level
    ``--sec,field,N,name="v"`` overrides (ref: utils.py:125-199)."""
    for arg in args:
        if not re.match(r"--.*,.*=.*", arg):
            raise ConfigError("bad CLI override %r (want --section,field=value)" % arg)
        sec_field, value = arg[2:].split("=", 1)
        value = value.strip('"')
        parts = sec_field.split(",")
        section = parts[0]
        if section not in config.sections():
            raise ConfigError("CLI override: unknown section %r" % section)
        if len(parts) == 2:
            field = parts[1]
            if field not in config[section]:
                raise ConfigError("CLI override: unknown field %r in [%s]"
                                  % (field, section))
            config[section][field] = value
        elif len(parts) == 4:
            field, number, f_name = parts[1], int(parts[2]), parts[3]
            if field not in config[section]:
                raise ConfigError("CLI override: unknown field %r in [%s]"
                                  % (field, section))
            current = config[section][field]
            matches = list(re.finditer(re.escape(f_name) + r"=[^\n]*", current))
            if number >= len(matches):
                raise ConfigError("CLI override: only %d %r entries in %s"
                                  % (len(matches), f_name, field))
            m = matches[number]
            config[section][field] = (current[:m.start()] + f_name + "=" + value
                                      + current[m.end():])
        else:
            raise ConfigError("bad CLI override %r" % arg)
    return config


# ---------------------------------------------------------------------------
# chunk lists + chunk configs
# ---------------------------------------------------------------------------

def split_chunks(seq: List[str], size: int) -> List[List[str]]:
    """Evenly split with round() boundaries (ref: utils.py:739-744)."""
    out = []
    splitsize = len(seq) / size
    for i in range(size):
        out.append(seq[int(round(i * splitsize)):int(round((i + 1) * splitsize))])
    return out


def _ep_fmt(n: int) -> str:
    return "0" + str(int(max(math.ceil(np.log10(max(n, 1))), 1))) + "d"


def _write_split_lists(config, dataset: str, phase: str, epochs, shuffle_each_ep,
                       out_folder: str, rng: random.Random, n_ep_fmt: str):
    sec = cfg_item2sec(config, "data_name", dataset)
    fea_names, fea_lsts, _, _, _ = parse_fea_field(config[sec]["fea"])
    n_chunks = int(config[sec]["n_chunks"])
    ck_fmt = _ep_fmt(n_chunks)
    full = []
    for lst in fea_lsts:
        full.append(sorted(line.rstrip("\n") + "," for line in open(lst)))
    conc = full[0]
    for i in range(1, len(full)):
        conc = list(map(str.__add__, conc, full[i]))

    if not shuffle_each_ep:
        rng.shuffle(conc)
        chunks = split_chunks(conc, n_chunks)

    for ep in epochs:
        if shuffle_each_ep:
            rng.shuffle(conc)
            chunks = split_chunks(conc, n_chunks)
            chunks.reverse()
        for ck in range(n_chunks):
            for i, fea in enumerate(fea_names):
                path = os.path.join(
                    out_folder, "exp_files",
                    "%s_%s_ep%s_ck%s_%s.lst" % (phase, dataset, format(ep, n_ep_fmt),
                                                format(ck, ck_fmt), fea))
                with open(path, "w") as f:
                    for snt in chunks[ck]:
                        f.write(snt.split(",")[i] + "\n")


def create_lists(config: configparser.ConfigParser) -> None:
    """Split train/valid/forward datasets into per-epoch per-chunk ``.lst``
    files (seeded shuffle per epoch for training; one fixed shuffle for
    valid/forward) (ref: utils.py:916-1056)."""
    out_folder = config["exp"]["out_folder"]
    seed = int(config["exp"]["seed"])
    n_ep = int(config["exp"]["n_epochs_tr"])
    n_ep_fmt = _ep_fmt(n_ep)
    rng = random.Random(seed)
    os.makedirs(os.path.join(out_folder, "exp_files"), exist_ok=True)
    for ds in config["data_use"]["train_with"].split(","):
        _write_split_lists(config, ds, "train", range(n_ep), True, out_folder, rng, n_ep_fmt)
    for ds in config["data_use"]["valid_with"].split(","):
        _write_split_lists(config, ds, "valid", range(n_ep), False, out_folder, rng, n_ep_fmt)
    for ds in config["data_use"]["forward_with"].split(","):
        _write_split_lists(config, ds, "forward", [n_ep - 1], False, out_folder, rng, n_ep_fmt)


def compute_n_chunks(out_folder: str, data_list: str, ep: int,
                     n_ep_fmt: str, step: str) -> int:
    lst = sorted(glob.glob(os.path.join(
        out_folder, "exp_files",
        "%s_%s_ep%s*.lst" % (step, data_list, format(ep, n_ep_fmt)))))
    if not lst:
        raise ConfigError("no %s list files for %s ep %d" % (step, data_list, ep))
    return int(re.findall(r"_ck(\d+)_", lst[-1])[-1]) + 1


def write_cfg_chunk(config: configparser.ConfigParser, config_chunk_file: str,
                    cfg_file_proto_chunk: str, pt_files: Dict[str, str],
                    lst_file_glob: str, info_file: str, to_do: str,
                    data_set_name: str, lr: Dict[str, List[str]],
                    max_seq_length_train_curr: int, name_data: List[str],
                    ep: int, ck: int, batch_size: str,
                    drop_rates: Dict[str, List[List[str]]]) -> None:
    """Derive and write one chunk-specific config (ref: utils.py:1059-1149).

    Specializations: phase (`to_do`), per-chunk seed offset ``seed+ep+ck``,
    current LR / dropout / batch size / max_seq_length, pretrain checkpoint
    chain, per-chunk feature ``.lst`` paths, guided-HCGS phase switch at
    ``apply_guided_ep`` (ref: utils.py:1085-1095).
    """
    chunk = configparser.ConfigParser()
    chunk.read_dict({s: dict(config.items(s)) for s in config.sections()})

    chunk["exp"]["to_do"] = to_do
    chunk["exp"]["out_info"] = info_file
    chunk["exp"]["seed"] = str(int(config["exp"]["seed"]) + ep + ck)
    chunk["batches"]["batch_size_train"] = str(batch_size)

    for arch, pt in pt_files.items():
        chunk[arch]["arch_pretrain_file"] = pt
        chunk[arch]["out_folder"] = os.path.join(config["exp"]["out_folder"], "parameters")
        # guided-HCGS two-phase switch
        if config.has_option("exp", "apply_guided_ep"):
            on = (ep + 1) >= int(config["exp"]["apply_guided_ep"])
            chunk[arch]["apply_guided_hcgs"] = str(on)
        else:
            chunk[arch]["apply_guided_hcgs"] = "False"
            chunk[arch]["guided_hcgs"] = "False"
        # pattern two-phase switch: dense epochs first, then kmeans
        # patterns fixed for the fine-tune tail (the reference's
        # record.md:105 pattern run fine-tunes a pretrained dense model
        # via pattern_search.py; this reproduces that lifecycle in one
        # experiment)
        if config.has_option("exp", "apply_pattern_ep") \
                and chunk.has_option(arch, "if_pattern") \
                and (ep + 1) < int(config["exp"]["apply_pattern_ep"]):
            chunk[arch]["if_pattern"] = "False"

    for arch in lr:
        chunk[arch]["arch_lr"] = str(lr[arch][ep])
        for field_key, _ in config.items(arch):
            if "_drop" in field_key and arch in drop_rates:
                drops = [drop_rates[arch][lay][ep]
                         for lay in range(len(drop_rates[arch]))]
                chunk[arch][field_key] = ",".join(str(d) for d in drops)

    # data_chunk section from the named dataset, lst paths substituted
    src_sec = cfg_item2sec(config, "data_name", data_set_name)
    chunk.add_section("data_chunk")
    for k, v in config.items(src_sec):
        chunk["data_chunk"][k] = v
    lst_files = sorted(glob.glob(lst_file_glob))
    fea_field = chunk["data_chunk"]["fea"]
    for fea, path in re.findall(r"fea_name=(.*)\n\s*fea_lst=(.*)\n", fea_field + "\n"):
        fea, path = fea.strip(), path.strip()
        for cand in lst_files:
            if re.findall(r"_(.*)\.lst", os.path.basename(cand))[0].split("_")[-1] == fea:
                fea_field = fea_field.replace(path, cand)
    chunk["data_chunk"]["fea"] = fea_field
    chunk.remove_option("data_chunk", "data_name")
    chunk.remove_option("data_chunk", "n_chunks")

    chunk.remove_section("decoding")
    chunk.remove_section("data_use")
    for ds in name_data:
        chunk.remove_section(cfg_item2sec(config, "data_name", ds))
    for opt in ("increase_seq_length_train", "start_seq_len_train",
                "multply_factor_seq_len_train"):
        chunk.remove_option("batches", opt)
    chunk["batches"]["max_seq_length_train"] = str(max_seq_length_train_curr)

    with open(config_chunk_file, "w") as f:
        chunk.write(f)
    check_consistency_with_proto(config_chunk_file, cfg_file_proto_chunk)


def create_configs(config: configparser.ConfigParser) -> None:
    """Generate every chunk config for all phases upfront
    (ref: utils.py:747-913). Also applies curriculum sequence-length
    growth (start_seq_len_train × multply_factor per epoch, capped by the
    per-epoch max_seq_length schedule, ref: utils.py:803-805,:880-885)."""
    cfg_proto_chunk = config["cfg_proto"]["cfg_proto_chunk"]
    n_ep = int(config["exp"]["n_epochs_tr"])
    n_ep_fmt = _ep_fmt(n_ep)
    tr_lst = config["data_use"]["train_with"].split(",")
    valid_lst = config["data_use"]["valid_with"].split(",")
    forward_lst = config["data_use"]["forward_with"].split(",")
    out_folder = config["exp"]["out_folder"]

    batch_arr = expand_str_ep(config["batches"]["batch_size_train"], "int", n_ep)
    max_seq_arr = expand_str_ep(config["batches"]["max_seq_length_train"], "int", n_ep)

    arch_secs = [s for s in config.sections() if "architecture" in s]
    lr: Dict[str, List[str]] = {}
    pt_files: Dict[str, str] = {}
    drop_rates: Dict[str, List[List[str]]] = {}
    for arch in arch_secs:
        lr[arch] = expand_str_ep(config[arch]["arch_lr"], "float", n_ep)
        pt_files[arch] = config[arch]["arch_pretrain_file"]
        for field_key, field_val in config.items(arch):
            if "_drop" in field_key:
                drop_rates[arch] = [expand_str_ep(d, "float", n_ep)
                                    for d in field_val.split(",")]
                for d in drop_rates[arch][0]:
                    if not 0.0 <= float(d) <= 1.0:
                        raise ConfigError("dropout %r out of [0,1]" % d)

    chunk_list_path = os.path.join(out_folder, "exp_files", "list_chunks.txt")
    increase_seq = strtobool(config["batches"]["increase_seq_length_train"])
    max_seq_curr = int(config["batches"]["start_seq_len_train"]) if increase_seq else None

    model_files: Dict[str, str] = {}
    with open(chunk_list_path, "w") as chunk_list:
        for ep in range(n_ep):
            for tr_data in tr_lst:
                n_ck = compute_n_chunks(out_folder, tr_data, ep, n_ep_fmt, "train")
                ck_fmt = _ep_fmt(n_ck)
                for ck in range(n_ck):
                    stem = os.path.join(
                        out_folder, "exp_files",
                        "train_%s_ep%s_ck%s" % (tr_data, format(ep, n_ep_fmt),
                                                format(ck, ck_fmt)))
                    info_file = stem + ".info"
                    model_files = {a: stem + "_" + a + ".pkl" for a in pt_files}
                    cfg_chunk = stem + ".cfg"
                    chunk_list.write(cfg_chunk + "\n")
                    if not increase_seq:
                        max_seq_curr = int(max_seq_arr[ep])
                    write_cfg_chunk(config, cfg_chunk, cfg_proto_chunk, pt_files,
                                    stem + "_*.lst", info_file, "train", tr_data,
                                    lr, max_seq_curr, _all_data_names(config),
                                    ep, ck, batch_arr[ep], drop_rates)
                    pt_files = dict(model_files)
            for valid_data in valid_lst:
                n_ck = compute_n_chunks(out_folder, valid_data, ep, n_ep_fmt, "valid")
                ck_fmt = _ep_fmt(n_ck)
                for ck in range(n_ck):
                    stem = os.path.join(
                        out_folder, "exp_files",
                        "valid_%s_ep%s_ck%s" % (valid_data, format(ep, n_ep_fmt),
                                                format(ck, ck_fmt)))
                    cfg_chunk = stem + ".cfg"
                    chunk_list.write(cfg_chunk + "\n")
                    write_cfg_chunk(config, cfg_chunk, cfg_proto_chunk, model_files,
                                    stem + "_*.lst", stem + ".info", "valid",
                                    valid_data, lr, max_seq_curr,
                                    _all_data_names(config), ep, ck,
                                    batch_arr[ep], drop_rates)
            if increase_seq:
                max_seq_curr *= int(config["batches"]["multply_factor_seq_len_train"])
                max_seq_curr = min(max_seq_curr, int(max_seq_arr[ep]))

        ep = n_ep - 1
        # [exp] forward_with_pretrain = True makes the forward chunks
        # load the GLOBAL arch_pretrain_file instead of the last
        # training chunk's checkpoint — the run_test surface: forward a
        # post-pruned/pattern-pruned model without retraining
        # (ref: run_test.py:182-216 loads the pruned pkl directly)
        fwd_pt = model_files
        if strtobool(config["exp"].get("forward_with_pretrain", "False")):
            fwd_pt = {a: config[a]["arch_pretrain_file"] for a in arch_secs}
        for fwd_data in forward_lst:
            n_ck = compute_n_chunks(out_folder, fwd_data, ep, n_ep_fmt, "forward")
            ck_fmt = _ep_fmt(n_ck)
            for ck in range(n_ck):
                stem = os.path.join(
                    out_folder, "exp_files",
                    "forward_%s_ep%s_ck%s" % (fwd_data, format(ep, n_ep_fmt),
                                              format(ck, ck_fmt)))
                cfg_chunk = stem + ".cfg"
                chunk_list.write(cfg_chunk + "\n")
                write_cfg_chunk(config, cfg_chunk, cfg_proto_chunk, fwd_pt,
                                stem + "_*.lst", stem + ".info", "forward",
                                fwd_data, lr, max_seq_curr,
                                _all_data_names(config), ep, ck,
                                batch_arr[ep], drop_rates)


def _all_data_names(config) -> List[str]:
    return [config[s]["data_name"] for s in config.sections() if "dataset" in s]
