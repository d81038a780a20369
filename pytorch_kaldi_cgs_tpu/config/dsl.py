"""Model meta-language ("DSL") parser: ``out=op(in1,in2)`` lines.

The [model] section of a config wires architectures, features, labels
and cost/combinator ops into a computation graph. The op vocabulary is
declared in ``proto/model.proto`` and validated here
(ref: utils.py:1254-1348). The parsed :class:`ModelGraph` is consumed by
the runtime's forward/loss builder (the TPU-native replacement for
``forward_model``, ref: utils.py:1884-2050).
"""

from __future__ import annotations

import configparser
import re
from dataclasses import dataclass
from typing import Dict, List

from .proto import ConfigError, resolve_proto

_LINE3 = re.compile(r"^(.+)=(\w+)\(([^,()]+),([^,()]+),([^,()]+)\)$")
_LINE2 = re.compile(r"^(.+)=(\w+)\(([^,()]+),([^,()]+)\)$")


@dataclass
class ModelOp:
    out: str
    op: str
    inputs: List[str]


class ModelGraph:
    """Validated, ordered list of model ops with graph metadata."""

    def __init__(self, ops: List[ModelOp]):
        self.ops = ops
        self.outputs = [o.out for o in ops]

    def __iter__(self):
        return iter(self.ops)

    def compute_ops(self) -> List[ModelOp]:
        return [o for o in self.ops if o.op == "compute"]

    def used_archs(self) -> List[str]:
        seen = []
        for o in self.compute_ops():
            if o.inputs[0] not in seen:
                seen.append(o.inputs[0])
        return seen

    def used_features(self, fea_names: List[str]) -> List[str]:
        used = []
        for o in self.ops:
            for inp in o.inputs:
                if inp in fea_names and inp not in used:
                    used.append(inp)
        return used

    def used_labels(self, lab_names: List[str]) -> List[str]:
        used = []
        for o in self.ops:
            for inp in o.inputs:
                if inp in lab_names and inp not in used:
                    used.append(inp)
        return used


def _load_op_signatures(model_proto_path: str) -> Dict[str, List[str]]:
    sigs: Dict[str, List[str]] = {}
    with open(resolve_proto(model_proto_path)) as f:
        for line in f:
            m = re.match(r"^(\w+)\(([^)]*)\)\s*$", line.strip())
            if m:
                sigs[m.group(1)] = m.group(2).split(",")
    return sigs


def parse_model_lines(model_field: str, model_proto_path: str,
                      fea_names: List[str], lab_names: List[str],
                      arch_names: List[str]) -> ModelGraph:
    sigs = _load_op_signatures(model_proto_path)
    possible_inputs = list(fea_names)
    ops: List[ModelOp] = []
    for raw in model_field.replace(" ", "").split("\n"):
        if not raw:
            continue
        m = _LINE3.match(raw) or _LINE2.match(raw)
        if not m:
            raise ConfigError(
                "model line %r must look like output=operation(in1,in2)" % raw)
        groups = m.groups()
        out, op, inputs = groups[0], groups[1], list(groups[2:])
        if op not in sigs:
            raise ConfigError("model op %r is not declared in %s"
                              % (op, model_proto_path))
        sig = sigs[op]
        if len(inputs) != len(sig):
            raise ConfigError("model op %r takes %d inputs, got %d in %r"
                              % (op, len(sig), len(inputs), raw))
        for kind, inp in zip(sig, inputs):
            if kind == "architecture" and inp not in arch_names:
                raise ConfigError("architecture %r not defined (have %s)"
                                  % (inp, arch_names))
            elif kind == "label" and inp not in lab_names:
                raise ConfigError("label %r not defined (have %s)" % (inp, lab_names))
            elif kind == "input" and inp not in possible_inputs:
                raise ConfigError("input %r not defined before this line "
                                  "(available: %s)" % (inp, possible_inputs))
            elif kind in ("float", "lambda", "blk_size"):
                try:
                    float(inp)
                except ValueError:
                    raise ConfigError("input %r of op %r must be numeric" % (inp, op))
        possible_inputs.append(out)
        ops.append(ModelOp(out, op, inputs))

    joined = "".join(o.out for o in ops)
    if "loss_final" not in joined:
        raise ConfigError("the model must define loss_final")
    if "err_final" not in joined:
        raise ConfigError("the model must define err_final")
    return ModelGraph(ops)


def parse_model_field(config: configparser.ConfigParser) -> ModelGraph:
    """Validate [model] against the declared architectures/features/labels
    (ref: utils.py:1254-1348)."""
    fea_names = re.findall(r"fea_name=(.*)\n",
                           config["dataset1"]["fea"].replace(" ", "") + "\n") \
        if config.has_section("dataset1") else \
        re.findall(r"fea_name=(.*)\n", config["data_chunk"]["fea"].replace(" ", "") + "\n")
    lab_sec = "dataset1" if config.has_section("dataset1") else "data_chunk"
    lab_names = re.findall(r"lab_name=(.*)\n",
                           config[lab_sec]["lab"].replace(" ", "") + "\n")
    arch_names = [config[s]["arch_name"] for s in config.sections()
                  if "architecture" in s]
    return parse_model_lines(config["model"]["model"],
                             config["model"]["model_proto"],
                             fea_names, lab_names, arch_names)
