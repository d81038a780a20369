"""Stashed-activation vs recompute BPTT: every fused cell must produce
identical gradients under either backward (PKC_BWD_STASH_CELLS forces
the stash path for cells whose default is recompute, and vice versa).
The per-cell defaults live in ops.fused_lstm._STASH_DEFAULT (see
PERF.md round-4 for the measurements behind them)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.ops import fused_lstm as FL
from pytorch_kaldi_cgs_tpu.ops import fused_rnn as FR


def _grads(fn, g, U, drop, **kw):
    def loss(g, U):
        return jnp.sum(fn(g, U, drop, interpret=True, **kw) ** 2)
    return jax.grad(loss, argnums=(0, 1))(g, U)


CELLS = [
    ("lstm", FL.lstm_scan_fused, 4),
    ("ligru", FR.ligru_scan_fused, 2),
    ("gru", FR.gru_scan_fused, 3),
    ("mgru", FR.mgru_scan_fused, 2),
    ("rnn", FR.rnn_scan_fused, 1),
]


@pytest.mark.parametrize("cell,fn,ng", CELLS)
def test_stash_and_recompute_grads_identical(cell, fn, ng, monkeypatch):
    T, B, H = 7, 3, 8
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(T, B, ng * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(ng * H, H) * 0.3, jnp.float32)
    drop = jnp.asarray((rng.rand(B, H) > 0.25), jnp.float32)

    monkeypatch.setenv("PKC_BWD_STASH_CELLS", cell)
    monkeypatch.delenv("PKC_LSTM_BWD_RECOMPUTE", raising=False)
    assert FL._bwd_stash_enabled(cell)
    gs = _grads(fn, g, U, drop)

    monkeypatch.setenv("PKC_LSTM_BWD_RECOMPUTE", "1")
    assert not FL._bwd_stash_enabled(cell)
    gr = _grads(fn, g, U, drop)

    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cell,fn,ng", CELLS)
def test_stash_grads_with_quantized_input(cell, fn, ng, monkeypatch):
    """The stash path must preserve the STE input-quantizer semantics
    (dU over per-step-quantized h_prev; dh passes straight through)."""
    T, B, H = 6, 2, 8
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(T, B, ng * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(ng * H, H) * 0.3, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)

    monkeypatch.setenv("PKC_BWD_STASH_CELLS", cell)
    monkeypatch.delenv("PKC_LSTM_BWD_RECOMPUTE", raising=False)
    gs = _grads(fn, g, U, drop, quant_bits=8)
    monkeypatch.setenv("PKC_LSTM_BWD_RECOMPUTE", "1")
    gr = _grads(fn, g, U, drop, quant_bits=8)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_default_matrix():
    assert FL._STASH_DEFAULT == {"lstm": True, "gru": True, "mgru": False,
                                 "ligru": False, "rnn": False}
    os.environ.pop("PKC_BWD_STASH_CELLS", None)
    os.environ.pop("PKC_LSTM_BWD_RECOMPUTE", None)
    assert FL._bwd_stash_enabled("lstm")
    assert not FL._bwd_stash_enabled("rnn")
