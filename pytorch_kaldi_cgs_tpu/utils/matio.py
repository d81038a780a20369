"""MATLAB .mat export of weights and masks (ref: save_cgs_mat.py and
the eval-time dumps at neural_networks.py:280-304, :898-948) — used for
offline inspection of HCGS structures and for feeding the ASU hardware
toolchain."""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def save_mat(array, name: str, out_dir: str) -> str:
    import scipy.io as sio
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "%s.mat" % name)
    sio.savemat(path, {name.replace("-", "_"): np.asarray(array)})
    return path


def save_hcgs_mat(mask, name: str, out_dir: str) -> str:
    return save_mat(mask, "CM_%s" % name, out_dir)


def export_model_mats(variables: Dict[str, Any], arch_name: str,
                      out_dir: str) -> int:
    """Dump every >=2D weight and every mask of a model's variables
    (the reference's save_mat pass at valid/forward time). Returns the
    number of files written."""
    n = 0
    for key, w in variables.get("params", {}).items():
        arr = np.asarray(w)
        if arr.ndim >= 2:
            save_mat(arr, "%s_%s" % (arch_name, key), out_dir)
            n += 1
    for key, m in variables.get("masks", {}).items():
        save_hcgs_mat(np.asarray(m), "%s_%s" % (arch_name, key), out_dir)
        n += 1
    return n
