"""Training-curve extraction + plotting (ref: utils.py:2104-2220
create_curves, driven by plot_acc_and_loss.py).

Parses res.res epoch lines into generated_outputs/{tr,valid}_{loss,err}
text files and renders loss.png / acc.png when matplotlib is available.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List


def parse_res_file(res_path: str) -> List[Dict]:
    out = []
    with open(res_path) as f:
        for line in f:
            if not line.startswith("ep="):
                continue
            d: Dict = {"ep": int(re.search(r"ep=(\d+)", line).group(1))}
            m = re.search(r"loss=([\d.eE+-]+) err=([\d.eE+-]+)", line)
            if m:
                d["tr_loss"] = float(m.group(1))
                d["tr_err"] = float(m.group(2))
            vm = re.findall(r"valid=(\S+) loss=([\d.eE+-]+) err=([\d.eE+-]+)", line)
            d["valid"] = {name: (float(l), float(e)) for name, l, e in vm}
            out.append(d)
    return out


def create_curves(out_folder: str, n_ep: int, valid_data_lst: List[str]) -> None:
    res_path = os.path.join(out_folder, "res.res")
    rows = parse_res_file(res_path)
    gen = os.path.join(out_folder, "generated_outputs")
    os.makedirs(gen, exist_ok=True)

    tr_loss = [r.get("tr_loss", float("nan")) for r in rows]
    tr_err = [r.get("tr_err", float("nan")) for r in rows]
    with open(os.path.join(gen, "tr_loss.txt"), "w") as f:
        f.writelines("%f\n" % v for v in tr_loss)
    with open(os.path.join(gen, "tr_acc.txt"), "w") as f:
        f.writelines("%f\n" % (1.0 - v) for v in tr_err)
    val_loss = {vd: [] for vd in valid_data_lst}
    val_err = {vd: [] for vd in valid_data_lst}
    for r in rows:
        for vd in valid_data_lst:
            l, e = r["valid"].get(vd, (float("nan"), float("nan")))
            val_loss[vd].append(l)
            val_err[vd].append(e)
    for vd in valid_data_lst:
        with open(os.path.join(gen, "valid_%s_loss.txt" % vd), "w") as f:
            f.writelines("%f\n" % v for v in val_loss[vd])
        with open(os.path.join(gen, "valid_%s_acc.txt" % vd), "w") as f:
            f.writelines("%f\n" % (1.0 - v) for v in val_err[vd])

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    eps = [r["ep"] for r in rows]
    fig, ax = plt.subplots()
    ax.plot(eps, tr_loss, label="train")
    for vd in valid_data_lst:
        ax.plot(eps, val_loss[vd], label="valid:%s" % vd)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(os.path.join(gen, "loss.png"))
    plt.close(fig)
    fig, ax = plt.subplots()
    ax.plot(eps, [1 - v for v in tr_err], label="train")
    for vd in valid_data_lst:
        ax.plot(eps, [1 - v for v in val_err[vd]], label="valid:%s" % vd)
    ax.set_xlabel("epoch")
    ax.set_ylabel("accuracy")
    ax.legend()
    fig.savefig(os.path.join(gen, "acc.png"))
    plt.close(fig)
