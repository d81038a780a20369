"""Model block-diagram generation (ref: utils.py:1417-1532
create_block_diagram + the external ``blockdiag`` CLI).

Generates ``model.diag`` (graphviz dot text) and a dependency-free
layered ``model.svg`` renderer — no external tools needed.
"""

from __future__ import annotations

import os
from typing import Dict, List

from ..config.dsl import ModelGraph


def _node_layers(graph: ModelGraph, fea_names: List[str],
                 lab_names: List[str]) -> Dict[str, int]:
    """Topological depth per node (features/labels at depth 0)."""
    depth = {n: 0 for n in fea_names + lab_names}
    for op in graph.ops:
        d = 0
        for inp in op.inputs:
            if inp in depth:
                d = max(d, depth[inp] + 1)
        depth[op.out] = max(d, 1)
    return depth


def write_dot(graph: ModelGraph, fea_names: List[str], lab_names: List[str],
              path: str) -> str:
    lines = ["digraph model {", "  rankdir=TB;",
             "  node [shape=box, style=rounded];"]
    for f in fea_names:
        lines.append('  "%s" [shape=parallelogram, color=blue];' % f)
    for l in lab_names:
        lines.append('  "%s" [shape=parallelogram, color=darkgreen];' % l)
    for op in graph.ops:
        label = op.out if op.op != "compute" else "%s\\n[%s]" % (op.out,
                                                                 op.inputs[0])
        shape = "box" if op.op == "compute" else "ellipse"
        lines.append('  "%s" [label="%s", shape=%s];' % (op.out, label, shape))
        for inp in op.inputs:
            if inp in fea_names or inp in lab_names or \
                    inp in [o.out for o in graph.ops]:
                lines.append('  "%s" -> "%s";' % (inp, op.out))
    lines.append("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_svg(graph: ModelGraph, fea_names: List[str], lab_names: List[str],
              path: str) -> str:
    """Minimal layered SVG rendering (boxes + edges)."""
    depth = _node_layers(graph, fea_names, lab_names)
    layers: Dict[int, List[str]] = {}
    for n, d in depth.items():
        layers.setdefault(d, []).append(n)
    W, H, BW, BH = 160, 80, 130, 36
    pos = {}
    for d in sorted(layers):
        for i, n in enumerate(sorted(layers[d])):
            pos[n] = (40 + i * W, 30 + d * H)
    width = max(x for x, _ in pos.values()) + BW + 40
    height = max(y for _, y in pos.values()) + BH + 40
    parts = ['<svg xmlns="http://www.w3.org/2000/svg" width="%d" height="%d">'
             % (width, height),
             '<defs><marker id="a" markerWidth="8" markerHeight="8" refX="8" '
             'refY="3" orient="auto"><path d="M0,0 L8,3 L0,6 z"/></marker></defs>']
    known = set(pos)
    for op in graph.ops:
        x2, y2 = pos[op.out]
        for inp in op.inputs:
            if inp in known:
                x1, y1 = pos[inp]
                parts.append(
                    '<line x1="%d" y1="%d" x2="%d" y2="%d" stroke="#555" '
                    'marker-end="url(#a)"/>' % (x1 + BW // 2, y1 + BH,
                                                x2 + BW // 2, y2))
    for n, (x, y) in pos.items():
        color = ("#cde" if n in fea_names else
                 "#cec" if n in lab_names else "#eee")
        parts.append('<rect x="%d" y="%d" width="%d" height="%d" rx="6" '
                     'fill="%s" stroke="#333"/>' % (x, y, BW, BH, color))
        parts.append('<text x="%d" y="%d" font-size="11" text-anchor="middle" '
                     'font-family="sans-serif">%s</text>'
                     % (x + BW // 2, y + BH // 2 + 4, n))
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def create_block_diagram(config, out_folder: str) -> None:
    """Write model.diag + model.svg for a validated config
    (ref: utils.py:1417-1532)."""
    import re
    from ..config.dsl import parse_model_field
    graph = parse_model_field(config)
    sec = "dataset1" if config.has_section("dataset1") else "data_chunk"
    fea_names = re.findall(r"fea_name=(.*)\n",
                           config[sec]["fea"].replace(" ", "") + "\n")
    lab_names = re.findall(r"lab_name=(.*)\n",
                           config[sec]["lab"].replace(" ", "") + "\n")
    write_dot(graph, fea_names, lab_names, os.path.join(out_folder, "model.diag"))
    write_svg(graph, fea_names, lab_names, os.path.join(out_folder, "model.svg"))
