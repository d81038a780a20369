"""Full-zoo forward parity + one-train-step parity vs the reference's
own torch code (VERDICT round-3 item 1).

Covers every model class in ref neural_networks.py:364-2416 that the
round-3 matrix missed: GRU (:1240-1426), liGRU (:1429-1599), minimalGRU
(:1602-1777), RNN (:1780-1931), CNN (:1934-2033), SincNet/SincConv
(:2036-2285), and the three cudnn wrappers (:364-465) — including
BN-over-time flattening (:1380-1396-style) and bidirectional variants.
Plus ONE seeded train-step comparison (flagship LSTM+MLP with STE quant
on): loss and gradients vs torch CPU autograd.

Same-weights protocol as tests/test_ref_import.py: build the reference
torch module, copy its state_dict into our variables via
utils.ref_import, compare train-mode forwards (drop=0 so the shared
Bernoulli masks are deterministic ones).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_nn():
    sys.path.insert(0, REF)
    import neural_networks as ref_nn_mod
    yield ref_nn_mod
    sys.path.remove(REF)


# ---------------------------------------------------------------------------
# custom recurrent family (GRU / liGRU / minimalGRU / RNN)
# ---------------------------------------------------------------------------

def _rnn_options(prefix, lay="48", act="tanh", bn="True", ln="False",
                 bidir="False", **over):
    n = len(lay.split(","))
    def rep(v):
        return ",".join([v] * n)
    opts = {
        prefix + "_lay": lay,
        prefix + "_drop": rep("0.0"),
        prefix + "_use_batchnorm": rep(bn),
        prefix + "_use_laynorm": rep(ln),
        prefix + "_use_laynorm_inp": "False",
        prefix + "_use_batchnorm_inp": "False",
        prefix + "_orthinit": "True",
        prefix + "_act": rep(act),
        prefix + "_bidir": bidir,
        "use_cuda": "False", "to_do": "train",
        "out_folder": "/tmp", "arch_name": "parity", "scan_unroll": "1",
    }
    opts.update(over)
    return opts


def _compare_recurrent(ref_nn, ref_cls_name, our_cls, prefix, T=21, B=3,
                       F=26, seed=11, **opt_over):
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        ref_state_dict_to_variables)
    import pytorch_kaldi_cgs_tpu.models as M

    opts = _rnn_options(prefix, **opt_over)
    torch.manual_seed(seed)
    ref = getattr(ref_nn, ref_cls_name)(opts, F)
    ref.train()

    ours = getattr(M, our_cls)(opts, F)
    variables = ref_state_dict_to_variables(dict(ref.state_dict()), ours)

    rng = np.random.RandomState(seed)
    x = rng.randn(T, B, F).astype(np.float32) * 0.5
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    y_our = np.asarray(y_our)
    assert y_ref.shape == y_our.shape
    assert ours.out_dim == ref.out_dim
    np.testing.assert_allclose(y_our, y_ref, atol=1e-4, rtol=1e-4)


def test_gru_forward_parity_bn(ref_nn):
    _compare_recurrent(ref_nn, "GRU", "GRU", "gru")


def test_gru_forward_parity_laynorm(ref_nn):
    _compare_recurrent(ref_nn, "GRU", "GRU", "gru", bn="False", ln="True")


def test_gru_forward_parity_bidir_2layer(ref_nn):
    _compare_recurrent(ref_nn, "GRU", "GRU", "gru", lay="32,24",
                       bidir="True")


def test_ligru_forward_parity_bn(ref_nn):
    _compare_recurrent(ref_nn, "liGRU", "liGRU", "ligru", act="relu")


def test_ligru_forward_parity_bidir(ref_nn):
    _compare_recurrent(ref_nn, "liGRU", "liGRU", "ligru", act="relu",
                       bidir="True")


def test_minimalgru_forward_parity_bn(ref_nn):
    _compare_recurrent(ref_nn, "minimalGRU", "minimalGRU", "minimalgru")


def test_minimalgru_forward_parity_laynorm(ref_nn):
    _compare_recurrent(ref_nn, "minimalGRU", "minimalGRU", "minimalgru",
                       bn="False", ln="True")


def test_rnn_forward_parity_bn_relu(ref_nn):
    _compare_recurrent(ref_nn, "RNN", "RNN", "rnn", act="relu")


def test_rnn_forward_parity_bidir(ref_nn):
    _compare_recurrent(ref_nn, "RNN", "RNN", "rnn", bidir="True")


# ---------------------------------------------------------------------------
# CNN / SincNet
# ---------------------------------------------------------------------------

def _cnn_options(prefix, **over):
    opts = {
        prefix + "_N_filt": "8,6",
        prefix + "_len_filt": "11,5",
        prefix + "_max_pool_len": "2,3",
        prefix + "_act": "relu,relu",
        prefix + "_drop": "0.0,0.0",
        prefix + "_use_laynorm": "False,False",
        prefix + "_use_batchnorm": "True,True",
        prefix + "_use_laynorm_inp": "False",
        prefix + "_use_batchnorm_inp": "False",
        "use_cuda": "False", "to_do": "train",
        "out_folder": "/tmp", "arch_name": "parity",
    }
    opts.update(over)
    return opts


def _compare_conv(ref_nn, ref_cls_name, our_cls, prefix, F=128, B=5,
                  seed=13, **opt_over):
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        ref_state_dict_to_variables)
    import pytorch_kaldi_cgs_tpu.models as M

    opts = _cnn_options(prefix, **opt_over)
    torch.manual_seed(seed)
    ref = getattr(ref_nn, ref_cls_name)(opts, F)
    ref.train()

    ours = getattr(M, our_cls)(opts, F)
    variables = ref_state_dict_to_variables(dict(ref.state_dict()), ours)

    rng = np.random.RandomState(seed)
    x = rng.randn(B, F).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    y_our = np.asarray(y_our)
    assert y_ref.shape == y_our.shape
    assert ours.out_dim == ref.out_dim
    np.testing.assert_allclose(y_our, y_ref, atol=1e-4, rtol=1e-4)


def test_cnn_forward_parity_bn(ref_nn):
    """Exercises the reference's BatchNorm1d(N_filt, <length>) quirk:
    the length lands in the eps slot (ref: neural_networks.py:1988-1990)."""
    _compare_conv(ref_nn, "CNN", "CNN", "cnn")


def test_cnn_forward_parity_laynorm(ref_nn):
    """LayerNorm([N_filt, L]) reduces the LAST dim only
    (ref LayerNorm.forward, neural_networks.py:40-51)."""
    _compare_conv(ref_nn, "CNN", "CNN", "cnn",
                  cnn_use_batchnorm="False,False",
                  cnn_use_laynorm="True,True")


def _sinc_options(**over):
    opts = _cnn_options("sinc")
    opts.update({
        "sinc_N_filt": "8,6", "sinc_len_filt": "31,5",
        "sinc_max_pool_len": "2,3",
        "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50", "sinc_min_band_hz": "50",
    })
    opts.update(over)
    return opts


def test_sincnet_forward_parity_bn(ref_nn):
    """First layer is the reference's SincConv (NOT SincConv_fast):
    normalized band edges, max-normalized band-pass, linspace(0,L,L)
    Hamming window (ref: neural_networks.py:2146-2285)."""
    _compare_conv(ref_nn, "SincNet", "SincNet", "sinc", F=220,
                  **_sinc_options())


def test_sincnet_forward_parity_laynorm(ref_nn):
    _compare_conv(ref_nn, "SincNet", "SincNet", "sinc", F=220,
                  **_sinc_options(sinc_use_batchnorm="False,False",
                                  sinc_use_laynorm="True,True"))


# ---------------------------------------------------------------------------
# cudnn-class wrappers
# ---------------------------------------------------------------------------

def _cudnn_options(**over):
    opts = {
        "hidden_size": "40", "num_layers": "1", "bias": "True",
        "batch_first": "False", "dropout": "0.0", "bidirectional": "False",
        "use_cuda": "False", "to_do": "train",
        "out_folder": "/tmp", "arch_name": "parity",
    }
    opts.update(over)
    return opts


def _compare_cudnn(ref_nn, cls_name, T=19, B=3, F=22, seed=17, **opt_over):
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        ref_state_dict_to_variables)
    import pytorch_kaldi_cgs_tpu.models as M

    opts = _cudnn_options(**opt_over)
    torch.manual_seed(seed)
    ref = getattr(ref_nn, cls_name)(opts, F)
    ref.train()

    ours = getattr(M, cls_name)(opts, F)
    variables = ref_state_dict_to_variables(dict(ref.state_dict()), ours)

    rng = np.random.RandomState(seed)
    x = rng.randn(T, B, F).astype(np.float32) * 0.5
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    y_our = np.asarray(y_our)
    assert y_ref.shape == y_our.shape
    assert ours.out_dim == ref.out_dim
    np.testing.assert_allclose(y_our, y_ref, atol=1e-4, rtol=1e-4)


def test_lstm_cudnn_forward_parity(ref_nn):
    _compare_cudnn(ref_nn, "LSTM_cudnn")


def test_lstm_cudnn_forward_parity_bidir_2layer(ref_nn):
    _compare_cudnn(ref_nn, "LSTM_cudnn", num_layers="2",
                   bidirectional="True")


def test_gru_cudnn_forward_parity(ref_nn):
    _compare_cudnn(ref_nn, "GRU_cudnn")


def test_gru_cudnn_forward_parity_bidir(ref_nn):
    _compare_cudnn(ref_nn, "GRU_cudnn", bidirectional="True")


def test_rnn_cudnn_forward_parity_tanh(ref_nn):
    _compare_cudnn(ref_nn, "RNN_cudnn", nonlinearity="tanh")


def test_rnn_cudnn_forward_parity_relu_bidir(ref_nn):
    _compare_cudnn(ref_nn, "RNN_cudnn", nonlinearity="relu",
                   bidirectional="True", num_layers="2")


# ---------------------------------------------------------------------------
# one seeded train step: loss + gradients vs torch autograd (STE quant on)
# ---------------------------------------------------------------------------

def _flagship_lstm_options(**over):
    opts = {
        "lstm_lay": "64", "lstm_drop": "0.0",
        "lstm_use_batchnorm": "True", "lstm_use_laynorm": "False",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False",
        "use_cuda": "False", "to_do": "train", "lstm_hcgs": "False",
        "hcgsx_block": "8,4", "hcgsh_block": "8,4",
        "hcgsx_sparse": "25,50", "hcgsh_sparse": "25,50",
        "out_folder": "/tmp", "lstm_quant": "True", "param_quant": "8",
        "lstm_quant_inp": "False", "inp_quant": "16",
        "lstm_prune": "False", "lstm_prune_perc": "0.0",
        "skip_regularization": "False", "guided_hcgs": "False",
        "apply_guided_hcgs": "False", "if_hsigmoid": "False",
        "arch_name": "parity", "scan_unroll": "1",
    }
    opts.update(over)
    return opts


def _mlp_head_options(n_out=32):
    return {
        "dnn_lay": str(n_out), "dnn_drop": "0.0",
        "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
        "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
        "dnn_act": "softmax", "use_cuda": "False", "to_do": "train",
        "mlp_hcgs": "False", "dnn_hcgs": "False",
        "hcgs_block": "8,4", "hcgs_sparse": "25,50",
        "out_folder": "/tmp", "dnn_quant": "False", "mlp_quant": "False",
        "param_quant": "8", "dnn_quant_inp": "False",
        "mlp_quant_inp": "False", "inp_quant": "16",
        "dnn_prune": "False", "mlp_prune": "False",
        "dnn_prune_perc": "0.0", "mlp_prune_perc": "0.0",
        "skip_regularization": "False", "guided_hcgs": "False",
        "apply_guided_hcgs": "False", "arch_name": "parity",
    }


def test_train_step_parity_lstm_mlp_quant(ref_nn):
    """One seeded train step of the flagship composition (quantized LSTM
    -> MLP log-softmax head, cost_nll): loss AND gradients match torch
    CPU autograd from identical weights. Pins the STE quant backward
    (ref: quantized_modules.py:207-244 swaps weight.data around
    F.linear, so grads flow to the unquantized Parameter) and the
    masked-BN-over-time backward the reference trains with
    (ref: neural_networks.py:957-976, core.py:216-232)."""
    import jax
    import jax.numpy as jnp
    from pytorch_kaldi_cgs_tpu.models import LSTM, MLP
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        ref_state_dict_to_variables)

    T, B, F, n_out = 15, 4, 20, 32
    torch.manual_seed(3)
    ref_lstm = ref_nn.LSTM(_flagship_lstm_options(), F)
    ref_mlp = ref_nn.MLP(_mlp_head_options(n_out), ref_lstm.out_dim)
    ref_lstm.train()
    ref_mlp.train()

    our_lstm = LSTM(_flagship_lstm_options(), F)
    our_mlp = MLP(_mlp_head_options(n_out), our_lstm.out_dim)
    v_lstm = ref_state_dict_to_variables(dict(ref_lstm.state_dict()),
                                         our_lstm)
    v_mlp = ref_state_dict_to_variables(dict(ref_mlp.state_dict()), our_mlp)

    rng = np.random.RandomState(5)
    x = rng.randn(T, B, F).astype(np.float32) * 0.5
    labels = rng.randint(0, n_out, (T * B,)).astype(np.int64)

    # --- reference train step (torch autograd) ---
    xt = torch.from_numpy(x.copy())
    h_ref = ref_lstm(xt)
    y_ref = ref_mlp(h_ref.reshape(T * B, -1))
    loss_ref = torch.nn.NLLLoss()(y_ref, torch.from_numpy(labels))
    loss_ref.backward()

    # --- our train step (jax.grad) ---
    params = {"lstm": v_lstm["params"], "mlp": v_mlp["params"]}

    def loss_fn(params):
        vl = {**v_lstm, "params": params["lstm"]}
        vm = {**v_mlp, "params": params["mlp"]}
        h, _ = our_lstm.apply(vl, jnp.asarray(x), train=True)
        y, _ = our_mlp.apply(vm, h.reshape(T * B, -1), train=True)
        nll = -jnp.take_along_axis(y, jnp.asarray(labels)[:, None], axis=1)
        return jnp.mean(nll)

    loss_our, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_our), float(loss_ref.detach()),
                               atol=1e-4, rtol=1e-4)

    # gradients: every LSTM gate (x and h), the BN affine, and the head
    checks = [
        (grads["lstm"]["wfx0"], ref_lstm.wfx[0].weight.grad),
        (grads["lstm"]["wcx0"], ref_lstm.wcx[0].weight.grad),
        (grads["lstm"]["ufh0"], ref_lstm.ufh[0].weight.grad),
        (grads["lstm"]["uch0"], ref_lstm.uch[0].weight.grad),
        (grads["lstm"]["bn_wix0"]["gamma"], ref_lstm.bn_wix[0].weight.grad),
        (grads["lstm"]["bn_wix0"]["beta"], ref_lstm.bn_wix[0].bias.grad),
        (grads["mlp"]["w0"], ref_mlp.wx[0].weight.grad),
        (grads["mlp"]["b0"], ref_mlp.wx[0].bias.grad),
    ]
    for ours_g, ref_g in checks:
        np.testing.assert_allclose(np.asarray(ours_g), ref_g.numpy(),
                                   atol=2e-4, rtol=1e-3)

    # and one SGD update from those grads stays in lockstep
    lr = 0.1
    w_ref_new = (ref_lstm.wfx[0].weight.detach()
                 - lr * ref_lstm.wfx[0].weight.grad).numpy()
    w_our_new = np.asarray(params["lstm"]["wfx0"]
                           - lr * grads["lstm"]["wfx0"])
    np.testing.assert_allclose(w_our_new, w_ref_new, atol=2e-4, rtol=1e-3)
