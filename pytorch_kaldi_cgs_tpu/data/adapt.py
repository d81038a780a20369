"""fMLLR-style speaker-adaptive feature transforms, estimated on-device.

The reference consumes fMLLR features pre-computed by Kaldi GMM tooling
(cfg fea_opts read `$TIMIT/fmllr/...`, ref: cfg/TIMIT_CGS/*.cfg;
SURVEY §2.9 "feature extraction delegated to external Kaldi binaries").
This module provides the TPU-native equivalent of the *adaptation*
step: a per-speaker affine feature transform  x' = x @ A.T + b
estimated by maximum likelihood against the trained acoustic model —
the same objective family as Kaldi's fMLLR (feature-space MLLR), with
the hybrid model's frame posteriors standing in for GMM likelihoods
(the standard "fMLLR for DNN-HMM" recipe).

Estimation is a handful of full-batch gradient steps on (A, b) only
(model frozen), initialized at identity — one jitted program per
speaker batch; everything stays on device.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def estimate_fmllr(loglik_fn: Callable[[jnp.ndarray], jnp.ndarray],
                   feats: jnp.ndarray, labels: jnp.ndarray,
                   steps: int = 20, lr: float = 0.05,
                   ridge: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate one speaker's affine transform (A, b).

    loglik_fn: frames (N, F) -> per-frame log-posteriors (N, C) of the
    TRAINED model (frozen). feats: (N, F) the speaker's frames.
    labels: (N,) int frame alignments (the fMLLR supervision, the role
    of the GMM alignment in Kaldi's est-fmllr).

    Maximizes mean log p(label | A x + b) - ridge * ||A - I||^2 by
    Adam-free plain gradient ascent (few steps, full batch). Returns
    numpy (A (F, F), b (F,)).
    """
    F = feats.shape[1]
    A0 = jnp.eye(F, dtype=jnp.float32)
    b0 = jnp.zeros((F,), jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    feats = jnp.asarray(feats, jnp.float32)

    def objective(A, b):
        logp = loglik_fn(feats @ A.T + b)
        ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return jnp.mean(ll) - ridge * jnp.sum((A - jnp.eye(F)) ** 2)

    @jax.jit
    def run(A, b):
        def step(carry, _):
            A, b = carry
            gA, gb = jax.grad(objective, argnums=(0, 1))(A, b)
            return (A + lr * gA, b + lr * gb), None
        (A, b), _ = jax.lax.scan(step, (A, b), None, length=steps)
        return A, b, objective(A, b)

    A, b, _ = run(A0, b0)
    return np.asarray(A), np.asarray(b)


def estimate_fmllr_per_speaker(loglik_fn, feats_by_spk: Dict[str, np.ndarray],
                               labels_by_spk: Dict[str, np.ndarray],
                               **kw) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Per-speaker transforms (the utt2spk grouping of apply-cmvn
    --utt2spk / est-fmllr); returns {spk: (A, b)}."""
    return {spk: estimate_fmllr(loglik_fn, feats_by_spk[spk],
                                labels_by_spk[spk], **kw)
            for spk in sorted(feats_by_spk)}


def apply_fmllr(feats: np.ndarray, A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """x' = x @ A.T + b (host-side; the in-jit form is inlined where
    needed)."""
    return np.asarray(feats) @ np.asarray(A).T + np.asarray(b)
