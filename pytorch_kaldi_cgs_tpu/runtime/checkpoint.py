"""Checkpointing: per-net ``{model_par, optimizer_par}`` files with the
same naming contract as the reference (``<stem>_<archsec>.pkl``,
ref: core.py:285-322), storing numpy-ified JAX pytrees via pickle.

Unlike the reference, the ``masks`` collection (HCGS/guided/pattern) is
part of ``model_par``, so masks survive restarts explicitly instead of
riding along as fake Parameters — and pattern state is no longer lost on
resume (SURVEY §5 checkpoint weakness)."""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, model_par: Dict[str, Any],
                    optimizer_par: Any = None, extra: Dict[str, Any] | None = None
                    ) -> None:
    payload = {"model_par": _to_numpy(model_par)}
    if optimizer_par is not None:
        payload["optimizer_par"] = _to_numpy(optimizer_par)
    if extra:
        payload.update(extra)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
