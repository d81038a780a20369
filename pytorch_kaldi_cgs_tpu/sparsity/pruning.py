"""Unified multi-mode pruning dispatcher — the reference's
``sparsity.pruning()`` (ref: sparsity/sparsity.py:33-270) driven by a
``config_train``-style configuration object (ref: config_train.py).

The reference mutates a torch model's state_dict in place; here the
same six modes transform our functional parameter pytrees and return
the masks alongside, so the result can feed the checkpointed ``masks``
collection (and the block-sparse kernels) instead of silently zeroed
weights:

  dense           no-op                                (ref :33-34)
  thre_pruning    |w| < thre -> 0                      (ref :36-57)
  sparse_pruning  keep top (1-sparsity) of nonzeros    (ref :59-86)
  pattern_pruning apply cfg.pattern_mask[name]         (ref :88-108)
  coo_pruning     per-block top-nnz magnitude          (ref :110-161)
  ptcoo_pruning   pattern mask + top-nnz of complement (ref :163-221)
  find_retrain    apply_patterns with per-layer/model
                  k-means pattern sets                 (ref :223-266)

Exclusion rule matches the reference: batch-norm entries and 1-D
parameters (biases, norm affines) pass through untouched
(ref: ``name.split(".")[-2] != "bn" and name.split(".")[-1] != "bias"``,
 sparsity/sparsity.py:50).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .pattern import apply_patterns, coo_mask, find_top_k_by_kmeans


@dataclass
class PruningConfig:
    """The ``config_train`` surface (ref: config_train.py): same
    attribute names so reference-style driver code ports directly."""
    sparse_mode: str = "dense"
    pruning_thre: float = 0.0              # thre_pruning
    sparsity: float = 0.0                  # sparse_pruning
    pattern_num: int = 16                  # pattern/ptcoo/find_retrain
    pattern_shape: Sequence[int] = field(default_factory=lambda: [8, 8])
    pattern_nnz: int = 4
    pt_nnz: int = 4                        # ptcoo_pruning
    coo_shape: Sequence[int] = field(default_factory=lambda: [8, 8])
    coo_nnz: int = 4                       # coo/ptcoo_pruning
    pattern_mask: Dict[str, np.ndarray] = field(default_factory=dict)
    fd_rtn_pattern_set: Dict[str, np.ndarray] = field(default_factory=dict)
    layer_or_model_wise: str = "l"         # find_retrain: "l" | "m"

    @classmethod
    def from_ini_section(cls, sec) -> "PruningConfig":
        """Build from an INI section (e.g. ``[pruning]`` of an
        experiment config): sparse_mode=coo_pruning, coo_shape=8,8 ..."""
        kw: Dict[str, Any] = {}
        if "sparse_mode" in sec:
            kw["sparse_mode"] = sec["sparse_mode"].strip()
        for f_ in ("pruning_thre", "sparsity"):
            if f_ in sec:
                kw[f_] = float(sec[f_])
        for f_ in ("pattern_num", "pattern_nnz", "pt_nnz", "coo_nnz"):
            if f_ in sec:
                kw[f_] = int(sec[f_])
        for f_ in ("pattern_shape", "coo_shape"):
            if f_ in sec:
                kw[f_] = [int(v) for v in sec[f_].split(",")]
        if "layer_or_model_wise" in sec:
            kw["layer_or_model_wise"] = sec["layer_or_model_wise"].strip()
        return cls(**kw)


_MODES = ("dense", "thre_pruning", "sparse_pruning", "pattern_pruning",
          "coo_pruning", "ptcoo_pruning", "find_retrain")


def _prunable(name: str, w) -> bool:
    """The reference skips bn entries and biases; our norm affines and
    biases are 1-D (or dict-of-1-D) leaves, so >=2-D numpy weights with
    non-norm names are exactly the prunable set."""
    arr = np.asarray(w)
    if arr.ndim < 2:
        return False
    low = name.lower()
    return not (low.startswith("bn") or low.startswith("ln"))


def prune_params(params: Dict[str, Any], cfg: PruningConfig,
                 prefix: str = "") -> Tuple[Dict[str, Any],
                                            Dict[str, np.ndarray]]:
    """Apply ``cfg.sparse_mode`` to one flat param dict. Returns
    (new_params, masks) where masks holds the 0/1 mask per pruned
    weight under ``pruning_<name>`` keys."""
    mode = cfg.sparse_mode
    if mode not in _MODES:
        raise ValueError("sparse mode %r does not exist (ref "
                         "sparsity.py:268 asserts here)" % mode)
    new_params: Dict[str, Any] = {}
    masks: Dict[str, np.ndarray] = {}
    for name, w in params.items():
        if isinstance(w, dict):               # norm subtrees pass through
            new_params[name] = w
            continue
        if mode == "dense" or not _prunable(name, w):
            new_params[name] = w
            continue
        arr = np.asarray(w, np.float32)
        full = prefix + name
        mask: Optional[np.ndarray] = None
        if mode == "thre_pruning":
            mask = (np.abs(arr) >= cfg.pruning_thre).astype(np.float32)
        elif mode == "sparse_pruning":
            nz = arr[arr != 0]
            w_num = nz.size
            zero_num = int(w_num * cfg.sparsity)
            if w_num and zero_num:
                # keep the (w_num - zero_num) largest |w|; strict < like
                # the reference's torch.where(abs < thre)
                kth = np.sort(np.abs(nz))[::-1][w_num - zero_num - 1]
                mask = (np.abs(arr) >= kth).astype(np.float32)
            else:
                mask = np.ones_like(arr)
        elif mode == "pattern_pruning":
            m = cfg.pattern_mask.get(full, cfg.pattern_mask.get(name))
            if m is None:
                new_params[name] = w
                continue
            mask = np.asarray(m, np.float32)
        elif mode == "coo_pruning":
            ps = cfg.coo_shape
            if arr.shape[0] % ps[0] or arr.shape[1] % ps[1]:
                new_params[name] = w      # ref skips non-divisible (:131)
                continue
            mask = coo_mask(arr, ps, cfg.coo_nnz)
        elif mode == "ptcoo_pruning":
            ps = cfg.pattern_shape
            if arr.shape[0] % ps[0] or arr.shape[1] % ps[1]:
                new_params[name] = w
                continue
            pm = cfg.pattern_mask.get(full, cfg.pattern_mask.get(name))
            if pm is None:
                # self-derived pattern half: the k-means pattern set at
                # pt_nnz (the reference precomputes cfg.pattern_mask
                # externally the same way)
                pats = find_top_k_by_kmeans(arr, cfg.pattern_num, ps,
                                            cfg.pt_nnz)
                pm = apply_patterns(arr, pats)
            # ref: coo-refill the complement of the pattern mask with
            # the top coo_nnz per block (:163-221)
            pm = np.asarray(pm, np.float32)
            comp = arr * (1.0 - pm)
            mask = np.minimum(pm + coo_mask(comp, ps, cfg.coo_nnz), 1.0)
        elif mode == "find_retrain":
            key = full if cfg.layer_or_model_wise == "l" else "all"
            pats = cfg.fd_rtn_pattern_set.get(
                key, cfg.fd_rtn_pattern_set.get(name))
            if pats is None:
                pats = find_top_k_by_kmeans(
                    arr, cfg.pattern_num, cfg.pattern_shape,
                    cfg.pattern_nnz)
                cfg.fd_rtn_pattern_set[key] = pats
            if arr.shape[0] % cfg.pattern_shape[0] or \
                    arr.shape[1] % cfg.pattern_shape[1]:
                new_params[name] = w
                continue
            mask = apply_patterns(arr, pats)
        if mask is None:
            new_params[name] = w
            continue
        new_params[name] = arr * mask
        masks["pruning_" + name] = mask
    return new_params, masks


def pruning(variables: Dict[str, Any], cfg: PruningConfig
            ) -> Dict[str, Any]:
    """The reference's ``pruning(model, sparse_mode)`` over one model's
    variable pytree ``{"params", "state", "masks"}``: prunes the params,
    records the masks (the reference loses them — its state_dict only
    keeps the zeroed weights, SURVEY §5)."""
    new_params, masks = prune_params(variables["params"], cfg)
    out = dict(variables)
    out["params"] = new_params
    out["masks"] = {**variables.get("masks", {}), **masks}
    return out


def model_sparsity(params: Dict[str, Any]) -> float:
    """Fraction of zero entries over all prunable weights (the
    reference's zero_cnt/all_cnt bookkeeping)."""
    zero = total = 0
    for name, w in params.items():
        if isinstance(w, dict) or not _prunable(name, w):
            continue
        arr = np.asarray(w)
        zero += int((arr == 0).sum())
        total += arr.size
    return zero / total if total else 0.0
