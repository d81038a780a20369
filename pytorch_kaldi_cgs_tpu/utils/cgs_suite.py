"""The CGS experiment design-point suite (ref: cfg/record.md:29-105).

One table drives two artifact sets:
  * real-data cfg files under cfg/TIMIT_CGS/ (written from the flagship
    template by :func:`write_suite`), matching the reference's dated
    experiment configs;
  * synthetic smoke-run configs for CI (:func:`synth_kwargs` feeds
    utils.make_synth_cfg), proving every design point trains end to end.

Design points and their reference provenance:
  dense         32-bit dense baseline            (record.md:29, PER 16.4-16.7)
  quant_8w16a   8-bit w / 16-bit a, no HCGS      (record.md:30,:37, ~16.5)
  quant_6w13a   6-bit w / 13-bit a               (record.md:24-26)
  hcgs_10x      +HCGS LSTM-only ~10.67x          (record.md:31,:36,:67, ~18.1)
  hcgs_16x_a/b  16x total (LSTM+MLP), 2 splits   (record.md:72-77, 21.2-21.6)
  hcgs_32x      32x                              (record.md:81-87, 25.5-28.2)
  hcgs_64x      64x                              (record.md:90-100, 35.5-39.7)
  pattern_16    16 random 8x8 nnz=4 patterns     (record.md:105, 21.3)
  guided_16x    guided HCGS two-phase            (guided_hcgs.py lifecycle)
"""

from __future__ import annotations

import os
import re
from typing import Dict

# hcgs levels: (blocks, drops) with keep = prod(1 - drop/100)
DESIGN_POINTS: Dict[str, Dict] = {
    "dense":       dict(hcgs=False, quant=False),
    "quant_8w16a": dict(hcgs=False, quant=True, wbits="8,8", abits=16),
    "quant_6w13a": dict(hcgs=False, quant=True, wbits="6,6", abits=13),
    # keep 25% x 37.5% = 3/32 ~ 10.67x, LSTM only
    "hcgs_10x":    dict(hcgs=True, blocks="128,4", drops="75,62.5",
                        mlp_hcgs=False, quant=True, wbits="8,8", abits=16),
    # 16x total = keep 1/16; two level splits of record.md:72-77
    "hcgs_16x_a":  dict(hcgs=True, blocks="128,8", drops="75,75",
                        mlp_hcgs=True, quant=True, wbits="8,8", abits=16),
    "hcgs_16x_b":  dict(hcgs=True, blocks="128,4", drops="50,87.5",
                        mlp_hcgs=True, quant=True, wbits="8,8", abits=16),
    "hcgs_32x":    dict(hcgs=True, blocks="128,8", drops="75,87.5",
                        mlp_hcgs=True, quant=True, wbits="8,8", abits=16),
    "hcgs_64x":    dict(hcgs=True, blocks="128,8", drops="87.5,87.5",
                        mlp_hcgs=True, quant=True, wbits="8,8", abits=16),
    # two-phase lifecycle (ref pattern_search.py: kmeans patterns are
    # cut from a TRAINED dense model, then fine-tuned): dense for the
    # first 2/3 of the 24-epoch flagship schedule, masked after
    "pattern_16":  dict(hcgs=False, quant=True, wbits="8,8", abits=16,
                        pattern=True, pattern_num=16, pattern_shape="8,8",
                        pattern_nnz=4, apply_pattern_ep=17),
    "guided_16x":  dict(hcgs=False, guided=True, blocks="128,8",
                        drops="75,75", apply_guided_ep=2,
                        quant=True, wbits="8,8", abits=16),
}


def _sub(text: str, field: str, value: str, count: int = 0) -> str:
    return re.sub(r"(?m)^%s = .*$" % re.escape(field),
                  "%s = %s" % (field, value), text, count=count)


def write_suite(out_dir: str, template_path: str) -> Dict[str, str]:
    """Materialize every design point as a real-data cfg next to the
    flagship template. Returns {name: path}."""
    base = open(template_path).read()
    out: Dict[str, str] = {}
    for name, p in DESIGN_POINTS.items():
        text = base
        text = _sub(text, "out_folder", "exp/TIMIT_LSTM_fmllr_cgs_%s" % name)
        text = _sub(text, "lstm_hcgs", str(p.get("hcgs", False)))
        if p.get("blocks"):
            text = _sub(text, "hcgsx_block", p["blocks"])
            text = _sub(text, "hcgsh_block", p["blocks"])
            text = _sub(text, "hcgsx_sparse", p["drops"])
            text = _sub(text, "hcgsh_sparse", p["drops"])
            if p.get("mlp_hcgs"):
                text = _sub(text, "mlp_hcgs", "True")
                text = _sub(text, "hcgs_block", p["blocks"])
                text = _sub(text, "hcgs_sparse", p["drops"])
        text = _sub(text, "lstm_quant", str(p.get("quant", False)))
        if p.get("quant"):
            text = _sub(text, "param_quant", p["wbits"], count=1)
            text = _sub(text, "lstm_quant_inp", "True")
            text = _sub(text, "inp_quant", str(p["abits"]), count=1)
        else:
            text = _sub(text, "lstm_quant_inp", "False")
        if p.get("guided"):
            text = _sub(text, "guided_hcgs", "True", count=1)
            if "apply_guided_ep" not in text:
                # must land in [exp] (config.has_option("exp", ...) is
                # the runtime gate) — insert right after N_epochs_tr
                text = re.sub(r"(?m)^(N_epochs_tr = .*)$",
                              r"\1\napply_guided_ep = %d"
                              % p["apply_guided_ep"], text, count=1)
        if p.get("pattern"):
            arch1_extra = ("if_pattern = True\npattern_mode = pattern\n"
                           "pattern_shape = %s\npattern_nnz = %d\n"
                           "pattern_num = %d\n" % (
                               p["pattern_shape"], p["pattern_nnz"],
                               p["pattern_num"]))
            text = text.replace("skip_regularization = True",
                                arch1_extra + "skip_regularization = True", 1)
            if p.get("apply_pattern_ep") and "apply_pattern_ep" not in text:
                text = re.sub(r"(?m)^(N_epochs_tr = .*)$",
                              r"\1\napply_pattern_ep = %d"
                              % p["apply_pattern_ep"], text, count=1)
        path = os.path.join(out_dir, "TIMIT_LSTM_fmllr_cgs_%s.cfg" % name)
        with open(path, "w") as f:
            f.write(text)
        out[name] = path
    return out


def synth_kwargs(name: str) -> Dict:
    """make_synth_cfg keyword arguments reproducing one design point on
    the synthetic task (scaled-down blocks: synth layers are narrow)."""
    p = DESIGN_POINTS[name]
    kw: Dict = dict(model="LSTM", opt="rmsprop", lr=0.01, cw=0)
    if p.get("hcgs") or p.get("guided"):
        # scale blocks to the synthetic width (32): 8,2 keeps shape
        kw.update(hcgs=p.get("hcgs", False), hcgs_block="8,2",
                  hcgs_sparse=p["drops"])
    if p.get("guided"):
        kw.update(guided=True, apply_guided_ep=p["apply_guided_ep"],
                  hcgs=False)
    if p.get("quant"):
        kw.update(quant=True, param_quant=p["wbits"],
                  quant_inp=True, inp_quant=p["abits"])
    if p.get("pattern"):
        kw.update(pattern=True, pattern_shape="4,4",
                  pattern_nnz=p["pattern_nnz"] // 2 or 2,
                  pattern_num=4)   # synth layers have few 4x4 blocks
    return kw
