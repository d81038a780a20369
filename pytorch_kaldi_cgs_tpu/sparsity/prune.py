"""Magnitude pruning masks (ref: quantized_modules.py:15-28).

The reference's ``prune(model, perc)`` pools |w| over *all* non-1D
parameters of a module, takes the global percentile as threshold, and
masks each weight with |w| > threshold. Reproduced here over a list of
arrays (the model's weight pytree leaves)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def global_magnitude_masks(weights: Sequence[np.ndarray], prune_perc: float
                           ) -> List[np.ndarray]:
    """One shared global-percentile threshold across all given weights."""
    all_w = np.concatenate([np.abs(np.asarray(w)).ravel() for w in weights])
    threshold = np.percentile(all_w, prune_perc)
    return [(np.abs(np.asarray(w)) > threshold).astype(np.float32) for w in weights]


def magnitude_mask(weight: np.ndarray, prune_perc: float) -> np.ndarray:
    """Per-matrix variant (the models call ref ``prune`` on a single
    Linear, so the 'global' pool is just that weight)."""
    return global_magnitude_masks([weight], prune_perc)[0]
