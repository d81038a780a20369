"""Typed proto-schema config validation.

Re-implements the reference's INI-against-proto validation layer
(ref: utils.py:221-525) as exceptions-based library code. The schema
language is the toolkit's public API and is kept verbatim: ``.proto``
files are INI files whose values are field *types* —

  ``int(lo,hi)`` ``float(lo,hi)`` ``bool`` ``str`` ``path``
  ``int_list(lo,hi)`` ``float_list(lo,hi)`` ``bool_list`` ``str_list``
  ``{choice1,choice2}``

Section templates ``[dataset]`` and ``[architecture]`` are expanded to
every ``[dataset*]`` / ``[architecture*]`` section of the config, with
each architecture's own ``arch_proto`` file and optimizer proto merged
into its schema (ref: utils.py:391-442). Extra (undeclared) fields are
allowed, exactly like the reference — protos declare *mandatory* fields.
"""

from __future__ import annotations

import configparser
import os
import re
from typing import List, Tuple

_PKG_PROTO_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "proto")


class ConfigError(ValueError):
    pass


def strtobool(s) -> bool:
    if isinstance(s, bool):
        return s
    v = str(s).strip().lower()
    if v in ("true", "1", "yes", "on"):
        return True
    if v in ("false", "0", "no", "off"):
        return False
    raise ConfigError("invalid boolean %r" % s)


def resolve_proto(path: str) -> str:
    """Resolve a proto path: as given, else relative to the packaged
    proto/ directory (so configs can say ``proto/MLP.proto`` anywhere)."""
    if os.path.isfile(path):
        return path
    cand = os.path.join(_PKG_PROTO_DIR, os.path.basename(path))
    if os.path.isfile(cand):
        return cand
    raise ConfigError("proto file %r not found (also tried %s)" % (path, cand))


def _bounds(type_inp: str, prefix: str) -> Tuple[str, str]:
    inner = type_inp[len(prefix):].rstrip(")")
    lo, hi = inner.split(",")
    return lo, hi


def check_field(inp: str, type_inp: str, field: str) -> bool:
    """Validate one value against one schema type (ref: utils.py:221-380)."""
    if inp == "" and field != "cmd":
        raise ConfigError("field %r is empty" % field)

    if type_inp == "path":
        if inp != "none" and not (os.path.isfile(inp) or os.path.isdir(inp)):
            # proto paths get the package fallback
            try:
                resolve_proto(inp)
            except ConfigError:
                raise ConfigError("path %r in field %r does not exist" % (inp, field))
        return True

    if type_inp.startswith("{") and type_inp.endswith("}"):
        choices = type_inp[1:-1].split(",")
        if inp not in choices:
            raise ConfigError("field %r must be one of %s, got %r" % (field, choices, inp))
        return True

    def _num(v: str, conv, what: str):
        try:
            return conv(v)
        except ValueError:
            raise ConfigError("field %r must contain %s, got %r" % (field, what, v))

    def _range(v, lo: str, hi: str, conv):
        if lo != "-inf" and v < conv(lo):
            raise ConfigError("field %r: %s < lower bound %s" % (field, v, lo))
        if hi != "inf" and v > conv(hi):
            raise ConfigError("field %r: %s > upper bound %s" % (field, v, hi))

    if type_inp.startswith("int_list("):
        lo, hi = _bounds(type_inp, "int_list(")
        for elem in inp.split(","):
            _range(_num(elem, int, "integers"), lo, hi, int)
        return True
    if type_inp.startswith("float_list("):
        lo, hi = _bounds(type_inp, "float_list(")
        for elem in inp.split(","):
            _range(_num(elem, float, "floats"), lo, hi, float)
        return True
    if type_inp.startswith("int("):
        lo, hi = _bounds(type_inp, "int(")
        _range(_num(inp, int, "an integer"), lo, hi, int)
        return True
    if type_inp.startswith("float("):
        lo, hi = _bounds(type_inp, "float(")
        _range(_num(inp, float, "a float"), lo, hi, float)
        return True
    if type_inp.lower() == "bool":
        strtobool(inp)
        return True
    if type_inp == "bool_list":
        for elem in inp.split(","):
            strtobool(elem)
        return True
    # str / str_list / list_str / int / float without bounds: free-form
    return True


def expand_section(config_proto: configparser.ConfigParser,
                   config: configparser.ConfigParser
                   ) -> Tuple[configparser.ConfigParser, List[str], List[str]]:
    """Instantiate [dataset]/[architecture] proto templates per concrete
    section, merging per-arch and optimizer protos (ref: utils.py:391-442)."""
    name_data: List[str] = []
    name_arch: List[str] = []
    for sec in config.sections():
        if "dataset" in sec:
            config_proto.add_section(sec)
            for k, v in config_proto.items("dataset"):
                config_proto.set(sec, k, v)
            name_data.append(config[sec]["data_name"])
        if "architecture" in sec:
            name_arch.append(config[sec]["arch_name"])
            config_proto.add_section(sec)
            for k, v in config_proto.items("architecture"):
                config_proto.set(sec, k, v)
            arch_proto = configparser.ConfigParser()
            arch_proto.read(resolve_proto(config[sec]["arch_proto"]))
            for k, v in arch_proto.items("proto"):
                config_proto.set(sec, k, v)
            opt_proto = configparser.ConfigParser()
            opt_proto.read(resolve_proto("proto/%s.proto" % config[sec]["arch_opt"]))
            for k, v in opt_proto.items("proto"):
                config_proto.set(sec, k, v)
    config_proto.remove_section("dataset")
    config_proto.remove_section("architecture")
    return config_proto, name_data, name_arch


def check_cfg_fields(config_proto: configparser.ConfigParser,
                     config: configparser.ConfigParser, cfg_file: str) -> None:
    """Every proto section/field must exist and typecheck
    (ref: utils.py:454-486)."""
    for sec in config_proto.sections():
        if not any(sec in s for s in config.sections()):
            raise ConfigError("config %s lacks mandatory section [%s]" % (cfg_file, sec))
        for field, field_type in config_proto.items(sec):
            if field not in config[sec]:
                raise ConfigError("config %s lacks mandatory field %r in [%s]"
                                  % (cfg_file, field, sec))
            check_field(config[sec][field], field_type, field)


def check_consistency_with_proto(cfg_file: str, cfg_file_proto: str
                                 ) -> Tuple[configparser.ConfigParser, List[str], List[str]]:
    """Load + validate a config against its global proto
    (ref: utils.py:489-525)."""
    if not os.path.isfile(cfg_file):
        raise ConfigError("config file %s does not exist" % cfg_file)
    config = configparser.ConfigParser()
    config.read(cfg_file)
    config_proto = configparser.ConfigParser()
    config_proto.read(resolve_proto(cfg_file_proto))
    config_proto, name_data, name_arch = expand_section(config_proto, config)
    check_cfg_fields(config_proto, config, cfg_file)
    return config_proto, name_data, name_arch


def check_cfg(cfg_file: str, config: configparser.ConfigParser,
              cfg_file_proto: str) -> Tuple[configparser.ConfigParser, List[str], List[str]]:
    """Full semantic validation of a global experiment config
    (ref: utils.py:528-725): proto typecheck, [data_use] consistency,
    fea/lab cross-dataset consistency, production-mode detection,
    N_out_lab_* auto-inference from the native transition model
    (replacing the ``hmm-info``/``analyze-counts`` subprocesses,
    ref: utils.py:632, :686), prior-count generation and model-DSL
    validation."""
    from .dsl import parse_model_field
    from .experiment import cfg_item2sec, parse_fea_field, parse_lab_field
    from ..data.dataset import find_transition_model
    from ..data import features as F

    check_consistency_with_proto(cfg_file, cfg_file_proto)

    name_data = [config[s]["data_name"] for s in config.sections() if "dataset" in s]
    name_arch = [config[s]["arch_name"] for s in config.sections() if "architecture" in s]

    # [data_use] must reference declared datasets (ref: utils.py:538-548)
    used = []
    for v in dict(config.items("data_use")).values():
        used.extend(v.split(","))
    if not set(used).issubset(set(name_data)):
        raise ConfigError("[data_use] references datasets not in [dataset*]: %s"
                          % sorted(set(used) - set(name_data)))

    # sequential models: disable first-layer layer-norm (ref: utils.py:550-564)
    seq_model = any(strtobool(config[s]["arch_seq_model"])
                    for s in config.sections() if "architecture" in s)
    if seq_model and config.has_section("architecture1"):
        for key, val in list(config.items("architecture1")):
            if "use_laynorm" in key and "_inp" not in key:
                ln = val.split(",")
                if ln and ln[0] == "True":
                    ln[0] = "False"
                    config["architecture1"][key] = ",".join(ln)

    # fea/lab name consistency across datasets + production detection
    fea_names_prev = lab_names_prev = None
    config["exp"]["production"] = "False"
    lab_opts = []
    for data in name_data:
        sec = cfg_item2sec(config, "data_name", data)
        lab_names, lab_folders, lab_opts_d = parse_lab_field(config[sec]["lab"])
        if lab_names == ["none"]:
            if data in config["data_use"]["forward_with"].split(","):
                config["exp"]["production"] = "True"
            continue
        fea_names, _, _, _, _ = parse_fea_field(config[sec]["fea"])
        for n in fea_names:
            if not re.match(r"^[a-zA-Z0-9]*$", n):
                raise ConfigError("fea_name %r may only contain letters/digits" % n)
        if fea_names_prev is not None and sorted(fea_names) != fea_names_prev:
            raise ConfigError("fea_name sets differ across datasets")
        if lab_names_prev is not None and sorted(lab_names) != lab_names_prev:
            raise ConfigError("lab_name sets differ across datasets")
        fea_names_prev, lab_names_prev = sorted(fea_names), sorted(lab_names)
        lab_opts = lab_opts_d

    out_folder = config["exp"]["out_folder"]
    os.makedirs(os.path.join(out_folder, "exp_files"), exist_ok=True)

    # ---- N_out_lab_* inference + prior counts (native hmm-info/analyze-counts)
    model = config["model"]["model"]
    possible_outs = re.findall(r"(.*)=", model.replace(" ", ""))
    forward_out_lst = config["forward"]["forward_out"].split(",")
    forward_norm_lst = config["forward"]["normalize_with_counts_from"].split(",")
    forward_norm_bool = config["forward"]["normalize_posteriors"].split(",")

    lab_lst = re.findall(r"lab_name=(.*)\n", config["dataset1"]["lab"].replace(" ", "") + "\n")
    lab_folders = re.findall(r"lab_folder=(.*)\n", config["dataset1"]["lab"].replace(" ", "") + "\n")
    lab_opts_1 = re.findall(r"lab_opts=(.*)\n", config["dataset1"]["lab"] + "\n")
    N_out_lab = ["none"] * len(lab_lst)

    tmodels = {}

    def _tmodel(i):
        if i not in tmodels:
            tmodels[i] = find_transition_model(lab_folders[i])
        return tmodels[i]

    for i in range(len(lab_opts_1)):
        if "ali-to-phones" in lab_opts_1[i]:
            N_out_lab[i] = _tmodel(i).num_phones

    for i, fo in enumerate(forward_out_lst):
        if fo not in possible_outs:
            raise ConfigError("forward_out %r is not produced by [model]" % fo)
        if strtobool(forward_norm_bool[i]):
            if forward_norm_lst[i] not in lab_lst:
                if not os.path.exists(forward_norm_lst[i]):
                    raise ConfigError("count_file %r does not exist" % forward_norm_lst[i])
            else:
                li = lab_lst.index(forward_norm_lst[i])
                if "ali-to-pdf" in lab_opts_1[li]:
                    tm = _tmodel(li)
                    N_out_lab[li] = tm.num_pdfs
                    count_path = os.path.join(
                        out_folder, "exp_files",
                        "forward_%s_%s.count" % (fo, forward_norm_lst[i]))
                    labels = F.read_labels(lab_folders[li], lab_opts_1[li], tm)
                    counts = F.compute_prior_counts(labels, tm.num_pdfs)
                    F.write_prior_counts(counts, count_path)
                    forward_norm_lst[i] = count_path
                else:
                    raise ConfigError(
                        "cannot auto-derive count file for label %r" % forward_norm_lst[i])
    config["forward"]["normalize_with_counts_from"] = ",".join(map(str, forward_norm_lst))

    # substitute N_out_lab_* placeholders (ref: utils.py:700-714)
    for sec in config.sections():
        for field in list(config[sec]):
            for i, lname in enumerate(lab_lst):
                pattern = "N_out_" + lname
                if pattern in config[sec][field]:
                    if N_out_lab[i] == "none":
                        raise ConfigError("cannot infer %s automatically" % pattern)
                    config[sec][field] = config[sec][field].replace(
                        pattern, str(N_out_lab[i]))

    parse_model_field(config)

    # block diagram of the model (ref: utils.py:1417-1532) — best effort
    try:
        from ..utils.diagram import create_block_diagram
        create_block_diagram(config, out_folder)
    except Exception:
        pass
    return config, name_data, name_arch
