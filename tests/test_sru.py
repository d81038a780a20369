"""Native SRU (models/sru.py): the associative-scan cell must match a
naive sequential lax.scan implementation of the same equations; e2e
through the experiment pipeline (the reference gates its SRU behind
`pip install sru[cuda]`, ref neural_networks.py:23-26, :2428-2471)."""
import configparser
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.models import SRU
from pytorch_kaldi_cgs_tpu.models.layers import layer_norm


def _opts(**kw):
    base = {"to_do": "train", "arch_name": "t", "out_folder": "/tmp",
            "sru_hidden_size": "16", "sru_num_layers": "2",
            "sru_dropout": "0.0", "sru_rnn_dropout": "0.0",
            "sru_use_tanh": "True", "sru_use_relu": "False",
            "sru_use_selu": "False", "sru_weight_norm": "False",
            "sru_layer_norm": "False", "sru_bidirectional": "False",
            "sru_is_input_normalized": "False", "sru_has_skip_term": "True",
            "sru_rescale": "False", "sru_highway_bias": "-1.0",
            "sru_n_proj": "0"}
    base.update({k: str(v) for k, v in kw.items()})
    return base


def _naive_sru_layer(w, b, ws, x, H, act, skip, rescale, hb):
    """Sequential reference: same equations, lax.scan over time."""
    T, B, D = x.shape
    pre = (x.reshape(T * B, D) @ w.T).reshape(T, B, 3 * H)
    u, f_pre, r_pre = jnp.split(pre, 3, axis=2)
    f = jax.nn.sigmoid(f_pre + b[:H])
    r = jax.nn.sigmoid(r_pre + b[H:])

    def step(c, ts):
        f_t, u_t = ts
        c = f_t * c + (1 - f_t) * u_t
        return c, c

    _, c = jax.lax.scan(step, jnp.zeros((B, H), jnp.float32), (f, u))
    out = r * act(c)
    if skip:
        xs = x if D == H else (x.reshape(T * B, D) @ ws.T).reshape(T, B, H)
        if rescale:
            xs = xs * np.sqrt(1.0 + 2.0 * np.exp(hb))
        out = out + (1 - r) * xs
    return out


@pytest.mark.parametrize("skip,rescale", [(True, False), (True, True),
                                          (False, False)])
def test_sru_matches_sequential_reference(skip, rescale):
    net = SRU(_opts(sru_num_layers=1, sru_has_skip_term=skip,
                    sru_rescale=rescale), 9)
    v = net.init(0)
    T, B = 23, 4
    x = jnp.asarray(np.random.RandomState(0).randn(T, B, 9), jnp.float32)
    out, _ = jax.jit(lambda v, x: net.apply(v, x, train=False))(v, x)
    ref = _naive_sru_layer(
        jnp.asarray(v["params"]["w0_0"]), jnp.asarray(v["params"]["b0_0"]),
        jnp.asarray(v["params"].get("ws0_0", np.zeros((16, 9), np.float32))),
        x, 16, jnp.tanh, skip, rescale, -1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sru_stack_bidir_laynorm_proj_weightnorm():
    net = SRU(_opts(sru_num_layers=2, sru_bidirectional=True,
                    sru_layer_norm=True, sru_n_proj=4,
                    sru_weight_norm=True, sru_use_relu=True,
                    sru_use_tanh=False), 9)
    assert net.out_dim == 32
    v = net.init(0)
    T, B = 17, 3
    x = jnp.asarray(np.random.RandomState(1).randn(T, B, 9), jnp.float32)
    out, _ = jax.jit(lambda v, x: net.apply(v, x, train=False))(v, x)
    assert out.shape == (T, B, 32)
    assert np.isfinite(np.asarray(out)).all()
    # low-rank factorization actually used
    assert "w10_0" in v["params"] and "w20_0" in v["params"]
    # grads flow through every parameter
    g = jax.grad(lambda p: jnp.sum(
        net.apply({**v, "params": p}, x, train=True,
                  rng=jax.random.PRNGKey(0))[0] ** 2))(v["params"])
    for k, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert np.isfinite(np.asarray(leaf)).all(), k


def test_sru_no_sequential_scan_in_jaxpr():
    """The cell's claim to fame: no lax.scan anywhere in the forward."""
    net = SRU(_opts(sru_num_layers=2), 9)
    v = net.init(0)
    x = jnp.zeros((16, 2, 9), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda v, x: net.apply(v, x, train=False)[0])(v, x)
    assert "scan" not in str(jaxpr), "SRU forward must be scan-free"


def test_sru_e2e_experiment(tmp_path):
    """Full pipeline: SRU + MLP head trains, forwards, decodes on the
    synthetic corpus; loss decreases within the first epoch."""
    from pytorch_kaldi_cgs_tpu.data import synth
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg

    root = str(tmp_path / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=12, num_phones=4, states_per_phone=2, feat_dim=8,
        min_len=24, max_len=48, noise=0.4, seed=9))
    out = str(tmp_path / "exp")
    cfg = make_synth_cfg(str(tmp_path / "sru.cfg"), root, out,
                         model="SRU", hidden=24, n_epochs=2, n_chunks=1,
                         batch_size=4, lr=0.02, opt="rmsprop", cw=0)
    run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out, "exp_files", "train_*.info")))
    assert len(infos) == 2
    losses = []
    for p in infos:
        c = configparser.ConfigParser()
        c.read(p)
        losses.append(float(c["results"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    wer = glob.glob(os.path.join(out, "decode_*", "wer_*"))
    assert wer, "decode must produce wer files"
