"""Shared functional layer library for the acoustic model zoo.

Pure functions over explicit parameter/state pytrees — the TPU-native
replacement for the reference's nn.Module layer helpers
(ref: neural_networks.py:29-78). Everything here is jit-traceable with
static shapes; batch-norm returns updated running statistics instead of
mutating module buffers.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# activations (ref: act_fun neural_networks.py:54-78)
# ---------------------------------------------------------------------------

def hsigmoid(x: Array) -> Array:
    """Hard sigmoid: clip(0.2x + 0.5, 0, 1) (ref: neural_networks.py:29-37)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def act_fun(act_type: str) -> Callable[[Array], Array]:
    if act_type == "relu":
        return jax.nn.relu
    if act_type == "tanh":
        return jnp.tanh
    if act_type == "htanh":
        return lambda x: jnp.clip(x, -1.0, 1.0)
    if act_type == "sigmoid":
        return jax.nn.sigmoid
    if act_type == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if act_type == "elu":
        return jax.nn.elu
    if act_type == "softmax":
        # log-softmax over the feature (last) axis; cost_nll expects log-probs
        return lambda x: jax.nn.log_softmax(x, axis=-1)
    if act_type == "linear":
        return lambda x: x
    raise ValueError("unknown activation %r" % act_type)


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def torch_linear_init(rng: np.random.RandomState, out_f: int, in_f: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """torch.nn.Linear default init: U(+-1/sqrt(fan_in)) for both w and b."""
    bound = 1.0 / math.sqrt(in_f)
    w = rng.uniform(-bound, bound, (out_f, in_f)).astype(np.float32)
    b = rng.uniform(-bound, bound, (out_f,)).astype(np.float32)
    return w, b


def small_uniform_init(rng: np.random.RandomState, out_f: int, in_f: int
                       ) -> np.ndarray:
    """The reference MLP init U(+-sqrt(0.01/(fan_in+fan_out)))
    (ref: neural_networks.py:233-235)."""
    bound = math.sqrt(0.01 / (in_f + out_f))
    return rng.uniform(-bound, bound, (out_f, in_f)).astype(np.float32)


def orthogonal_init(rng: np.random.RandomState, out_f: int, in_f: int
                    ) -> np.ndarray:
    """Orthogonal init for recurrent matrices (ref: neural_networks.py:792-796)."""
    a = rng.randn(out_f, in_f)
    q, r = np.linalg.qr(a if out_f >= in_f else a.T)
    q = q * np.sign(np.diag(r))
    if out_f < in_f:
        q = q.T
    return q[:out_f, :in_f].astype(np.float32)


# ---------------------------------------------------------------------------
# layer norm (ref: neural_networks.py:40-51 — note the torch .std() is
# the *unbiased* estimator and the eps sits outside the sqrt)
# ---------------------------------------------------------------------------

def layer_norm_params(features) -> Dict[str, np.ndarray]:
    shape = (features,) if isinstance(features, int) else tuple(features)
    return {"gamma": np.ones(shape, np.float32),
            "beta": np.zeros(shape, np.float32)}


def layer_norm(params: Dict[str, Array], x: Array, eps: float = 1e-6) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    return params["gamma"] * (x - mean) / (std + eps) + params["beta"]


def layer_norm_safe(params: Dict[str, Array], x: Array,
                    eps: float = 1e-5) -> Array:
    """LayerNorm with eps inside the sqrt: ``(x-mean)/sqrt(var+eps)``.

    The reference-parity :func:`layer_norm` divides by ``std + eps``
    like the reference's LayerNorm (ref: neural_networks.py:40-51);
    its backward is d(sqrt(var)) = 1/(2 sqrt(var)) = inf on a constant
    row. Bucketed chunk batches contain exactly-zero padded frames, and
    cells whose zero-input output is exactly zero (SRU: u, c, skip all
    vanish) feed such rows into the next layer's norm — this variant
    keeps those gradients finite (the loss mask already zeroes their
    contribution, but 0 * inf = nan)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return params["gamma"] * (x - mean) * jax.lax.rsqrt(var + eps) \
        + params["beta"]


def layer_norm_2d(params: Dict[str, Array], x: Array, eps: float = 1e-6) -> Array:
    """The CNN/SincNet LayerNorm([N_filt, L]) variant: (C, L)-shaped
    gamma/beta, but statistics over the LAST axis only — the reference's
    LayerNorm.forward always reduces dim=-1 regardless of the parameter
    shape (ref: neural_networks.py:40-51, constructed at :1985-1987)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    return params["gamma"] * (x - mean) / (jnp.sqrt(var) + eps) + params["beta"]


# ---------------------------------------------------------------------------
# batch norm (torch BatchNorm1d semantics, momentum=0.05, eps=1e-5)
# ---------------------------------------------------------------------------

def batch_norm_params(features: int) -> Dict[str, np.ndarray]:
    return {"gamma": np.ones(features, np.float32),
            "beta": np.zeros(features, np.float32)}


def batch_norm_state(features: int) -> Dict[str, np.ndarray]:
    return {"mean": np.zeros(features, np.float32),
            "var": np.ones(features, np.float32)}


def batch_norm(params: Dict[str, Array], state: Dict[str, Array], x: Array,
               train: bool, momentum: float = 0.05, eps: float = 1e-5
               ) -> Tuple[Array, Dict[str, Array]]:
    """Normalize over all leading axes (feature = last axis). In train
    mode uses batch statistics and returns updated running stats
    (torch convention: running = (1-m)*running + m*batch, with the
    unbiased variance entering the running average)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean((x - mean) ** 2, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {"mean": (1 - momentum) * state["mean"] + momentum * mean,
                     "var": (1 - momentum) * state["var"] + momentum * unbiased}
        x_hat = (x - mean) / jnp.sqrt(var + eps)
    else:
        new_state = state
        x_hat = (x - state["mean"]) / jnp.sqrt(state["var"] + eps)
    return params["gamma"] * x_hat + params["beta"], new_state


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

def dropout(x: Array, rate: float, train: bool, rng) -> Array:
    """Standard inverted dropout (MLP/CNN path, torch nn.Dropout)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def shared_time_drop_mask(rng, shape, rate: float, train: bool) -> Array:
    """The RNN per-sequence dropout mask: one Bernoulli(1-p) draw shared
    across all time steps in train mode; the *scalar* (1-p) at eval —
    non-inverted, exactly like the reference
    (ref: neural_networks.py:843-847)."""
    if train:
        return jax.random.bernoulli(rng, 1.0 - rate, shape).astype(jnp.float32)
    return jnp.full((1, 1), 1.0 - rate, jnp.float32)
