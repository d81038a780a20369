"""Sequence-pipelined recurrence (parallel/seqpipe.py) on the virtual
8-device CPU mesh: op-level exactness vs lax.scan, gradients through the
ppermute carry handoff, every recurrent cell, and the production
[exp] seq_parallel surface."""
import configparser
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.parallel import (make_mesh, pick_microbatches,
                                            seq_parallel, seq_pipeline_scan)


def _mesh(seq=4):
    return make_mesh(8, seq_axis=seq)


def _rnn_step(params, bargs, carry, x_t):
    U, W = params
    h = jnp.tanh(x_t @ W + carry @ U)
    return h, h


@pytest.mark.parametrize("T,M", [(24, None), (37, None), (24, 2), (24, 8),
                                 (5, None)])
def test_seq_pipeline_scan_matches_lax_scan(T, M):
    mesh = _mesh()
    B, F, H = 8, 5, 7
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(T, B, F), jnp.float32)
    params = (jnp.asarray(rng.randn(H, H) * 0.2, jnp.float32),
              jnp.asarray(rng.randn(F, H) * 0.2, jnp.float32))
    c0 = jnp.asarray(rng.randn(B, H) * 0.1, jnp.float32)

    fin_ref, ys_ref = jax.lax.scan(
        lambda c, x: _rnn_step(params, (), c, x), c0, xs)
    fin, ys = jax.jit(lambda p, c, x: seq_pipeline_scan(
        _rnn_step, p, (), c, x, mesh=mesh, microbatches=M))(params, c0, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-6, atol=1e-6)
    # final carry must be exact even when T pads up to a slab multiple
    np.testing.assert_allclose(np.asarray(fin), np.asarray(fin_ref),
                               rtol=1e-6, atol=1e-6)


def test_seq_pipeline_scan_grads_match():
    mesh = _mesh()
    T, B, F, H = 16, 8, 5, 7
    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.randn(T, B, F), jnp.float32)
    params = (jnp.asarray(rng.randn(H, H) * 0.2, jnp.float32),
              jnp.asarray(rng.randn(F, H) * 0.2, jnp.float32))
    c0 = jnp.zeros((B, H), jnp.float32)

    def loss_ref(p):
        _, ys = jax.lax.scan(lambda c, x: _rnn_step(p, (), c, x), c0, xs)
        return jnp.sum(ys ** 2)

    def loss_sp(p):
        _, ys = seq_pipeline_scan(_rnn_step, p, (), c0, xs, mesh=mesh)
        return jnp.sum(ys ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_sp = jax.jit(jax.grad(loss_sp))(params)
    for a, b in zip(g_ref, g_sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pick_microbatches():
    assert pick_microbatches(8, 4) == 4
    assert pick_microbatches(6, 4) == 6     # smallest divisor >= S
    assert pick_microbatches(7, 4) == 7
    assert pick_microbatches(1, 4) == 1
    assert pick_microbatches(8, 4, requested=3) == 2  # round down to divisor
    assert pick_microbatches(8, 2) == 2


@pytest.mark.parametrize("cls_name,prefix", [
    ("LSTM", "lstm"), ("GRU", "gru"), ("liGRU", "ligru"),
    ("minimalGRU", "minimalgru"), ("RNN", "rnn")])
def test_cells_match_under_seq_parallel(cls_name, prefix):
    """Every recurrent cell produces identical output when its scan is
    sequence-pipelined (bidir + dropout + laynorm + T padding covered)."""
    import pytorch_kaldi_cgs_tpu.models as M
    cls = getattr(M, cls_name)
    opts = {"to_do": "train", "arch_name": "t", "out_folder": "/tmp",
            prefix + "_lay": "16,16", prefix + "_drop": "0.2,0.2",
            prefix + "_use_batchnorm": "False,False",
            prefix + "_use_laynorm": "True,True",
            prefix + "_use_laynorm_inp": "False",
            prefix + "_use_batchnorm_inp": "False",
            prefix + "_act": "tanh,tanh", prefix + "_orthinit": "True",
            prefix + "_bidir": "True"}
    net = cls(opts, 9)
    v = net.init(0)
    T, B = 37, 8
    x = jnp.asarray(np.random.RandomState(0).randn(T, B, 9), jnp.float32)
    key = jax.random.PRNGKey(3)
    mesh = _mesh()

    ref, _ = jax.jit(lambda v, x: net.apply(v, x, train=True, rng=key))(v, x)

    def piped(v, x):
        with seq_parallel(mesh):
            return net.apply(v, x, train=True, rng=key)[0]

    out = jax.jit(piped)(v, x)
    # not bitwise: XLA schedules/fuses the pipelined program differently
    # (observed max |diff| ~2e-5 through 2 laynormed layers, pure f32
    # reassociation noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=5e-5)


def test_seq_parallel_skips_fused_kernels():
    """Under a seq context the fused/sparse one-kernel recurrences are
    ineligible (they own the whole T loop); the cell must take the
    pipelined lax.scan path instead of crashing or going dense-global."""
    from pytorch_kaldi_cgs_tpu.models import LSTM
    opts = {"to_do": "train", "arch_name": "t", "out_folder": "/tmp",
            "lstm_lay": "16", "lstm_drop": "0.0",
            "lstm_use_batchnorm": "False", "lstm_use_laynorm": "False",
            "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False",
            "lstm_fused_scan": "True"}  # force-eligible on CPU
    net = LSTM(opts, 9)
    mesh = _mesh()
    with seq_parallel(mesh):
        assert net._use_fused_scan(False, "tanh", 8, 16) is False
        assert net._sparse_rec_layout(False, "tanh", 8, 16, 0) is None
    assert net._use_fused_scan(False, "tanh", 8, 16) is True


def test_seq_parallel_runs_seeded_fused_slab_and_grads_match(monkeypatch):
    """When T divides the seq axis, the LSTM runs its SEEDED-CARRY fused
    kernel per (slab, microbatch) cell (lstm_scan_fused_seeded — the
    VJP-capable variant, VERDICT round-3 item 4) instead of the lax.scan
    fallback; outputs AND gradients match the plain scan to 1e-4."""
    from pytorch_kaldi_cgs_tpu.models import LSTM
    from pytorch_kaldi_cgs_tpu.ops import fused_lstm as FL

    calls = {"n": 0}
    real = FL.lstm_scan_fused_seeded

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(FL, "lstm_scan_fused_seeded", spy)

    opts = {"to_do": "train", "arch_name": "t", "out_folder": "/tmp",
            "lstm_lay": "16,16", "lstm_drop": "0.0,0.0",
            "lstm_use_batchnorm": "False,False",
            "lstm_use_laynorm": "False,False",
            "lstm_use_laynorm_inp": "False",
            "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh,tanh", "lstm_orthinit": "True",
            "lstm_bidir": "False",
            "lstm_fused_scan": "True"}  # force-eligible on CPU (interpret)
    net = LSTM(opts, 9)
    v = net.init(0)
    T, B = 40, 8          # T % S == 0 -> slab path legal
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(T, B, 9), jnp.float32)
    tgt = jnp.asarray(rng.randn(T, B, 16), jnp.float32)
    key = jax.random.PRNGKey(0)
    mesh = _mesh()

    def loss_plain(v, x):
        # neutralize the zero-state fused path so the reference really
        # is the lax.scan cell (they are exact-equal anyway; this keeps
        # the comparison honest)
        out, _ = plain.apply(v, x, train=True, rng=key)
        return jnp.mean((out - tgt) ** 2)

    plain_opts = dict(opts)
    plain_opts["lstm_fused_scan"] = "False"
    plain = LSTM(plain_opts, 9)

    def loss_piped(v, x):
        with seq_parallel(mesh):
            out, _ = net.apply(v, x, train=True, rng=key)
        return jnp.mean((out - tgt) ** 2)

    # NB must run under jit: this jax version's EAGER shard_map impl
    # rejects partial-manual out_specs (the production path always jits)
    l_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda vv: loss_plain(vv, x)))(v)
    l_sp, g_sp = jax.jit(jax.value_and_grad(
        lambda vv: loss_piped(vv, x)))(v)

    assert calls["n"] >= 2, "seeded fused slab kernel did not run"
    np.testing.assert_allclose(float(l_sp), float(l_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_production_seq_parallel_matches_single_device_loss(tmp_path):
    """The production chunk path with [exp] seq_parallel = 4 reproduces
    the single-device training losses (LSTM flagship shape, CPU mesh)."""
    from pytorch_kaldi_cgs_tpu.data import synth
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg

    root = str(tmp_path / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=12, num_phones=4, states_per_phone=2, feat_dim=8,
        min_len=24, max_len=48, noise=0.4, seed=7))

    losses = {}
    for name, sp in (("single", 1), ("seq4", 4)):
        out = str(tmp_path / ("exp_" + name))
        cfg = make_synth_cfg(str(tmp_path / (name + ".cfg")), root, out,
                             model="LSTM", hidden=16, n_epochs=1, n_chunks=1,
                             batch_size=4, lr=0.005, opt="rmsprop", cw=0,
                             multi_gpu=(sp > 1), seq_parallel=sp)
        run_exp(cfg)
        infos = sorted(glob.glob(os.path.join(out, "exp_files",
                                              "train_*.info")))
        c = configparser.ConfigParser()
        c.read(infos[-1])
        losses[name] = float(c["results"]["loss"])
    np.testing.assert_allclose(losses["seq4"], losses["single"],
                               rtol=1e-4, atol=1e-5)
