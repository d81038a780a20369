"""Reference-checkpoint import + forward parity (VERDICT round-2 item 3).

Loads the reference's own torch models on CPU, copies weights into our
JAX models via utils.ref_import, and asserts the forwards agree — for
dense, HCGS-masked, quantized, and batchnorm configurations. Also
imports the shipped ``model_file/`` Kaldi-binary LSTM weight dump
(ref: neural_networks.py:1067-1076 write_mat hooks).
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


def _lstm_options(tmp, **over):
    opts = {
        "lstm_lay": "512", "lstm_drop": "0.0",
        "lstm_use_batchnorm": "True", "lstm_use_laynorm": "False",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False",
        "use_cuda": "False", "to_do": "train", "lstm_hcgs": "False",
        "hcgsx_block": "128,4", "hcgsh_block": "128,4",
        "hcgsx_sparse": "25,62.5", "hcgsh_sparse": "25,62.5",
        "out_folder": tmp, "lstm_quant": "False", "param_quant": "8",
        "lstm_quant_inp": "False", "inp_quant": "16",
        "lstm_prune": "False", "lstm_prune_perc": "0.0",
        "skip_regularization": "False", "guided_hcgs": "False",
        "apply_guided_hcgs": "False", "if_hsigmoid": "False",
        "arch_name": "parity", "scan_unroll": "1",
    }
    opts.update(over)
    return opts


def _mlp_options(tmp, **over):
    opts = {
        "dnn_lay": "64,16", "dnn_drop": "0.0,0.0",
        "dnn_use_batchnorm": "False,False", "dnn_use_laynorm": "False,False",
        "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
        "dnn_act": "relu,softmax", "use_cuda": "False", "to_do": "train",
        "mlp_hcgs": "False", "dnn_hcgs": "False",
        "hcgs_block": "8,4", "hcgs_sparse": "25,50",
        "out_folder": tmp, "dnn_quant": "False", "mlp_quant": "False",
        "param_quant": "8,8", "dnn_quant_inp": "False",
        "mlp_quant_inp": "False", "inp_quant": "16",
        "dnn_prune": "False", "mlp_prune": "False",
        "dnn_prune_perc": "0.0,0.0", "mlp_prune_perc": "0.0,0.0",
        "skip_regularization": "False", "guided_hcgs": "False",
        "apply_guided_hcgs": "False", "arch_name": "parity",
    }
    opts.update(over)
    return opts


def _run_both(ref_nn, tmp, T=25, B=2, F=40, ref_over=None, our_over=None,
              mask_fn=None, seed=7):
    """Build reference torch LSTM + our LSTM with the same weights and
    compare train-mode forwards (drop=0 -> deterministic)."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        ref_state_dict_to_variables)

    torch.manual_seed(seed)
    ref = ref_nn.LSTM(_lstm_options(tmp, **(ref_over or {})), F)
    ref.train()

    if mask_fn is not None:
        mask_fn(ref)

    ours = LSTM(_lstm_options(tmp, **(our_over or ref_over or {})), F)
    variables = ref_state_dict_to_variables(
        {k: v for k, v in ref.state_dict().items()}, ours)

    rng = np.random.RandomState(seed)
    x = rng.randn(T, B, F).astype(np.float32) * 0.5

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    y_our = np.asarray(y_our)
    assert y_ref.shape == y_our.shape
    np.testing.assert_allclose(y_our, y_ref, atol=1e-4, rtol=1e-4)
    return ref, ours, variables


def test_lstm_forward_parity_dense_bn(ref_nn, tmp_path):
    # NB the fork's LSTM is constructible only with laynorm/batchnorm on
    # (wfx..uch appends live inside `if laynorm or batchnorm`,
    # ref: neural_networks.py:681-785), so batchnorm=True IS its dense
    # baseline — matching every cfg/TIMIT_CGS config.
    _run_both(ref_nn, str(tmp_path))


def test_lstm_forward_parity_laynorm(ref_nn, tmp_path):
    _run_both(ref_nn, str(tmp_path),
              ref_over={"lstm_use_batchnorm": "False",
                        "lstm_use_laynorm": "True"})


def test_lstm_forward_parity_hcgs(ref_nn, tmp_path):
    """HCGS semantics = in-place weight.data *= mask before the matmuls
    (ref: neural_networks.py:853-861). Pre-multiplying the reference's
    weights by OUR mask and running it dense is exactly equivalent, and
    avoids the reference's hard .cuda() in hcgs.conn_mat."""
    from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask

    F, H = 128, 512
    mx = hcgs_mask(H, F, [64, 4], [25, 62.5], seed=3)
    mh = hcgs_mask(H, H, [128, 4], [25, 62.5], seed=4)

    def mask_ref(ref):
        with torch.no_grad():
            for g in ("wfx", "wix", "wox", "wcx"):
                getattr(ref, g)[0].weight.data.mul_(torch.from_numpy(mx))
            for g in ("ufh", "uih", "uoh", "uch"):
                getattr(ref, g)[0].weight.data.mul_(torch.from_numpy(mh))

    ref, ours, variables = _run_both(
        ref_nn, "/tmp", F=F, mask_fn=mask_ref)

    # now ALSO run ours with lstm_hcgs=True + the same masks over the
    # unmasked weights: must give the identical output
    from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM
    opts = _lstm_options("/tmp", lstm_hcgs="True",
                         hcgsx_block="64,4", hcgsh_block="128,4")
    ours2 = LSTM(opts, F)
    v2 = {"params": dict(variables["params"]),
          "state": dict(variables["state"]), "masks": {}}
    # variables currently hold the masked weights; dividing is unsafe
    # (0/0), so rebuild from the reference's pre-mask weights instead
    torch.manual_seed(7)
    ref_clean = ref_nn.LSTM(_lstm_options("/tmp"), F)
    for g in ("wfx", "wix", "wox", "wcx"):
        v2["params"][g + "0"] = ref_clean.state_dict()[g + ".0.weight"].numpy()
        v2["masks"]["hcgs_%s0" % g] = mx.copy()
    for g in ("ufh", "uih", "uoh", "uch"):
        v2["params"][g + "0"] = ref_clean.state_dict()[g + ".0.weight"].numpy()
        v2["masks"]["hcgs_%s0" % g] = mh.copy()
    rng = np.random.RandomState(7)
    x = rng.randn(25, 2, F).astype(np.float32) * 0.5
    y_masked, _ = ours2.apply(v2, x, train=True)
    y_premul, _ = ours.apply(variables, x, train=True)
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_premul),
                               atol=1e-5, rtol=1e-5)


def test_lstm_forward_parity_quant(ref_nn, tmp_path):
    _run_both(ref_nn, str(tmp_path),
              ref_over={"lstm_quant": "True", "param_quant": "8",
                        "lstm_quant_inp": "True", "inp_quant": "16"})


def test_mlp_parity_from_ref_pkl(ref_nn, tmp_path):
    """Round-trip through the reference's checkpoint format
    (ref: core.py:317-318): torch state_dict pickle -> our variables."""
    from pytorch_kaldi_cgs_tpu.models.mlp import MLP
    from pytorch_kaldi_cgs_tpu.utils.ref_import import variables_from_ref_pkl

    F = 40
    torch.manual_seed(0)
    ref = ref_nn.MLP(_mlp_options(str(tmp_path)), F)
    ref.train()
    pkl = str(tmp_path / "final_parity.pkl")
    torch.save({"model_par": ref.state_dict(), "optimizer_par": {}}, pkl)

    ours = MLP(_mlp_options(str(tmp_path)), F)
    variables = variables_from_ref_pkl(pkl, ours)

    rng = np.random.RandomState(1)
    x = rng.randn(64, F).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    np.testing.assert_allclose(np.asarray(y_our), y_ref, atol=1e-4, rtol=1e-4)


def test_model_file_lstm_dump_import(ref_nn, tmp_path):
    """The shipped model_file/ dump (Kaldi-binary despite .mat names,
    ref: neural_networks.py:1067-1076) loads into a 1-layer 440->512
    LSTM; with those 8-bit-quantized weights our forward matches the
    reference torch forward on the dumped x."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM
    from pytorch_kaldi_cgs_tpu.utils.ref_import import (
        load_kaldi_weight_dir, lstm_variables_from_weight_dir)

    mdir = os.path.join(REF, "model_file")
    mats = load_kaldi_weight_dir(mdir)
    assert mats["wfx"].shape == (512, 440)
    assert mats["ufh"].shape == (512, 512)

    opts = _lstm_options(str(tmp_path))
    ours = LSTM(opts, 440)
    variables = lstm_variables_from_weight_dir(mdir, ours)

    ref = ref_nn.LSTM(opts, 440)
    with torch.no_grad():
        for g in ("wfx", "wix", "wox", "wcx", "ufh", "uih", "uoh", "uch"):
            getattr(ref, g)[0].weight.data.copy_(torch.from_numpy(mats[g]))
    ref.train()

    x = mats["x"].reshape(170, 1, 440)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    y_our, _ = ours.apply(variables, x, train=True)
    np.testing.assert_allclose(np.asarray(y_our), y_ref, atol=1e-4, rtol=1e-4)
