"""Model zoo tests: shapes, jit-ability, gradients, compression wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu import models as M


BASE_OPTS = {"to_do": "train", "arch_name": "test", "out_folder": "/tmp"}


def mlp_opts(lay="16,8", **kw):
    o = dict(BASE_OPTS)
    n = len(lay.split(","))
    o.update({
        "dnn_lay": lay,
        "dnn_drop": ",".join(["0.1"] * n),
        "dnn_use_batchnorm": ",".join(["True"] * (n - 1) + ["False"]),
        "dnn_use_laynorm": ",".join(["False"] * n),
        "dnn_use_laynorm_inp": "False",
        "dnn_use_batchnorm_inp": "False",
        "dnn_act": ",".join(["relu"] * (n - 1) + ["softmax"]),
    })
    o.update(kw)
    return o


def lstm_opts(lay="16", **kw):
    o = dict(BASE_OPTS)
    n = len(lay.split(","))
    o.update({
        "lstm_lay": lay,
        "lstm_drop": ",".join(["0.0"] * n),
        "lstm_use_batchnorm": ",".join(["True"] * n),
        "lstm_use_laynorm": ",".join(["False"] * n),
        "lstm_use_laynorm_inp": "False",
        "lstm_use_batchnorm_inp": "False",
        "lstm_act": ",".join(["tanh"] * n),
        "lstm_orthinit": "True",
        "lstm_bidir": "False",
    })
    o.update(kw)
    return o


def rnn_like_opts(prefix, lay="12", bidir="False", **kw):
    o = dict(BASE_OPTS)
    n = len(lay.split(","))
    o.update({
        prefix + "_lay": lay,
        prefix + "_drop": ",".join(["0.0"] * n),
        prefix + "_use_batchnorm": ",".join(["False"] * n),
        prefix + "_use_laynorm": ",".join(["False"] * n),
        prefix + "_use_laynorm_inp": "False",
        prefix + "_use_batchnorm_inp": "False",
        prefix + "_act": ",".join(["tanh"] * n),
        prefix + "_orthinit": "True",
        prefix + "_bidir": bidir,
    })
    o.update(kw)
    return o


def test_mlp_forward_shapes_and_logprobs():
    m = M.MLP(mlp_opts(), 20)
    assert m.out_dim == 8
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(32, 20), jnp.float32)
    y, st = m.apply(v, x, train=False)
    assert y.shape == (32, 8)
    # softmax head returns log-probs summing to 1
    np.testing.assert_allclose(np.exp(np.array(y)).sum(-1), 1.0, rtol=1e-4)


def test_mlp_batchnorm_state_updates():
    m = M.MLP(mlp_opts(), 10)
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(64, 10) * 3 + 1, jnp.float32)
    _, st = m.apply(v, x, train=True, rng=jax.random.PRNGKey(0))
    # layer-0 bn running stats moved away from init (momentum 0.05)
    assert not np.allclose(np.array(st["bn0"]["mean"]), 0.0)
    # eval mode leaves state untouched
    _, st2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.array(st2["bn0"]["mean"]),
                                  np.array(v["state"]["bn0"]["mean"]))


def test_mlp_jit_and_grad():
    m = M.MLP(mlp_opts(), 12)
    v = m.init(0)
    x = jnp.ones((8, 12))
    lab = jnp.zeros(8, jnp.int32)

    @jax.jit
    def loss_fn(params):
        y, _ = m.apply({**v, "params": params}, x, train=False)
        return -jnp.mean(y[jnp.arange(8), lab])

    g = jax.grad(loss_fn)(v["params"])
    assert float(loss_fn(v["params"])) > 0
    assert not np.allclose(np.array(g["w0"]), 0.0)


def test_mlp_hcgs_masks_zero_weights():
    o = mlp_opts(lay="32,8", mlp_hcgs="True", hcgs_block="8,2",
                 hcgs_sparse="50,50")
    m = M.MLP(o, 16)
    v = m.init(3)
    assert "hcgs_w0" in v["masks"]
    x = jnp.array(np.random.RandomState(0).randn(4, 16), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    # output of layer 0 independent of masked-out weights: perturb them
    params2 = dict(v["params"])
    w0 = np.array(v["params"]["w0"])
    w0_perturbed = w0 + 100.0 * (1 - np.array(v["masks"]["hcgs_w0"]))
    params2["w0"] = jnp.asarray(w0_perturbed)
    y2, _ = m.apply({**v, "params": params2}, x, train=False)
    np.testing.assert_allclose(np.array(y), np.array(y2), atol=1e-5)


def test_mlp_quant_levels():
    o = mlp_opts(lay="8", mlp_quant="True", param_quant="3")
    m = M.MLP(o, 4)
    v = m.init(0)
    x = jnp.eye(4)
    y, _ = m.apply(v, x, train=False)
    assert np.isfinite(np.array(y)).all()


def test_mlp_guided_refresh():
    o = mlp_opts(lay="16,8", guided_hcgs="True", apply_guided_hcgs="True",
                 hcgs_block="4", hcgs_sparse="50")
    m = M.MLP(o, 16)
    v = m.init(0)
    v2 = m.refresh_guided_masks(v, seed=1)
    assert "ghcgs_w0" in v2["masks"]
    from pytorch_kaldi_cgs_tpu.sparsity import mask_density
    assert mask_density(np.array(v2["masks"]["ghcgs_w0"])) == pytest.approx(0.5, abs=0.01)


def test_lstm_forward_and_grad():
    m = M.LSTM(lstm_opts("16,16"), 10)
    assert m.out_dim == 16
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(12, 4, 10), jnp.float32)

    def loss(params):
        y, _ = m.apply({**v, "params": params}, x, train=False)
        return jnp.sum(y ** 2)

    y, st = m.apply(v, x, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (12, 4, 16)
    g = jax.jit(jax.grad(loss))(v["params"])
    assert not np.allclose(np.array(g["wfx0"]), 0.0)
    assert not np.allclose(np.array(g["ufh0"]), 0.0)


def test_lstm_hcgs_shared_gate_mask():
    o = lstm_opts("32", lstm_hcgs="True", hcgsx_block="8,2", hcgsx_sparse="50,50",
                  hcgsh_block="8,2", hcgsh_sparse="50,50")
    m = M.LSTM(o, 16)
    v = m.init(0)
    # all 4 x-gates share one mask (ref: neural_networks.py:858-861)
    np.testing.assert_array_equal(np.array(v["masks"]["hcgs_wfx0"]),
                                  np.array(v["masks"]["hcgs_wix0"]))
    np.testing.assert_array_equal(np.array(v["masks"]["hcgs_ufh0"]),
                                  np.array(v["masks"]["hcgs_uch0"]))
    from pytorch_kaldi_cgs_tpu.sparsity import mask_density
    assert mask_density(np.array(v["masks"]["hcgs_wfx0"])) == pytest.approx(0.25, abs=0.02)


def test_lstm_orthogonal_init():
    m = M.LSTM(lstm_opts("24"), 8)
    v = m.init(0)
    u = np.array(v["params"]["ufh0"])
    np.testing.assert_allclose(u @ u.T, np.eye(24), atol=1e-5)


@pytest.mark.parametrize("cls,prefix", [(M.GRU, "gru"), (M.liGRU, "ligru"),
                                        (M.minimalGRU, "minimalgru"),
                                        (M.RNN, "rnn")])
def test_rnn_family_shapes(cls, prefix):
    m = cls(rnn_like_opts(prefix, "12,12"), 6)
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(7, 3, 6), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (7, 3, 12)
    y2, _ = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))(v, x)
    np.testing.assert_allclose(np.array(y), np.array(y2), rtol=2e-5, atol=1e-5)


def test_bidirectional_gru():
    m = M.GRU(rnn_like_opts("gru", "10", bidir="True"), 5)
    assert m.out_dim == 20
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(9, 2, 5), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (9, 2, 20)
    # backward half over flipped input == forward half over original, flipped
    xf = jnp.flip(x, axis=0)
    yf, _ = m.apply(v, xf, train=False)
    np.testing.assert_allclose(np.array(jnp.flip(yf[:, :, 10:], axis=0)),
                               np.array(y[:, :, :10]), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cls", [M.LSTM_cudnn, M.GRU_cudnn, M.RNN_cudnn])
def test_cudnn_wrappers(cls):
    opts = dict(BASE_OPTS, hidden_size="14", num_layers="2", bias="True",
                batch_first="False", dropout="0.0", bidirectional="True")
    if cls is M.RNN_cudnn:
        opts["nonlinearity"] = "tanh"
    m = cls(opts, 6)
    assert m.out_dim == 28
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(5, 3, 6), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (5, 3, 28)


def test_cnn_shapes():
    opts = dict(BASE_OPTS, cnn_N_filt="8,4", cnn_len_filt="11,5",
                cnn_max_pool_len="2,2",
                cnn_use_laynorm_inp="False", cnn_use_batchnorm_inp="False",
                cnn_use_laynorm="True,True", cnn_use_batchnorm="False,False",
                cnn_act="relu,relu", cnn_drop="0.0,0.0")
    m = M.CNN(opts, 200)
    v = m.init(0)
    x = jnp.array(np.random.RandomState(0).randn(3, 200), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (3, m.out_dim)
    l1 = (200 - 11 + 1) // 2
    l2 = (l1 - 5 + 1) // 2
    assert m.out_dim == l2 * 4


def test_sincnet_filters_and_forward():
    opts = dict(BASE_OPTS, sinc_N_filt="8,4", sinc_len_filt="65,5",
                sinc_max_pool_len="3,2", sinc_sample_rate="16000",
                sinc_min_low_hz="50", sinc_min_band_hz="50",
                sinc_use_laynorm_inp="False", sinc_use_batchnorm_inp="False",
                sinc_use_laynorm="True,True", sinc_use_batchnorm="False,False",
                sinc_act="relu,relu", sinc_drop="0.0,0.0")
    m = M.SincNet(opts, 400)
    v = m.init(0)
    assert v["params"]["sinc_low_hz"].shape == (8, 1)
    x = jnp.array(np.random.RandomState(0).randn(2, 400), jnp.float32)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (2, m.out_dim)
    # filters differentiable: grad wrt sinc params nonzero
    def loss(p):
        y, _ = m.apply({**v, "params": p}, x, train=False)
        return jnp.sum(y ** 2)
    g = jax.grad(loss)(v["params"])
    assert np.abs(np.array(g["sinc_low_hz"])).sum() > 0


def test_model_registry():
    assert M.get_model_class("pytorch_kaldi_cgs_tpu.models", "LSTM") is M.LSTM
    assert M.get_model_class("neural_networks", "MLP") is M.MLP


def test_lstm_block_sparse_path_matches_dense():
    """The fused block-sparse projection path must match the dense
    masked path numerically (interpret-mode kernel on CPU)."""
    o = lstm_opts("256", lstm_hcgs="True", hcgsx_block="128", hcgsx_sparse="50",
                  hcgsh_block="128", hcgsh_sparse="50")
    o["lstm_use_batchnorm"] = "False"
    o["lstm_use_laynorm"] = "False"
    m_dense = M.LSTM(dict(o), 256)
    o2 = dict(o, lstm_block_sparse="True")
    m_bs = M.LSTM(o2, 256)
    v = m_dense.init(0)
    m_bs.prepare_block_sparse(v)
    assert 0 in m_bs._bs_layouts
    v_bs = m_bs.pack_variables(v)
    # weights now live packed: dense x-gate leaves replaced
    assert "wfx0__bs" in v_bs["params"] and "wfx0" not in v_bs["params"]
    # idempotent on resume (already-packed variables)
    v_bs2 = m_bs.pack_variables(v_bs)
    assert set(v_bs2["params"]) == set(v_bs["params"])
    x = jnp.array(np.random.RandomState(0).randn(4, 2, 256), jnp.float32)
    y_d, _ = m_dense.apply(v, x, train=False)
    y_s, _ = m_bs.apply(v_bs, x, train=False)
    np.testing.assert_allclose(np.array(y_s), np.array(y_d), rtol=1e-4,
                               atol=1e-4)
    # unpack round-trips to the masked dense weights
    v_back = m_bs.unpack_variables(v_bs)
    mask = np.asarray(v["masks"]["hcgs_wfx0"])
    np.testing.assert_allclose(np.asarray(v_back["params"]["wfx0"]),
                               np.asarray(v["params"]["wfx0"]) * mask,
                               atol=1e-6)


def test_mlp_block_sparse_path_matches_dense():
    o = mlp_opts(lay="256,8", mlp_hcgs="True", hcgs_block="128",
                 hcgs_sparse="50", mlp_block_sparse="True")
    m = M.MLP(o, 256)
    o2 = dict(o, mlp_block_sparse="False")
    m_dense = M.MLP(o2, 256)
    v = m.init(0)
    m.prepare_block_sparse(v)
    assert 0 in m._bs_layouts
    assert 1 not in m._bs_layouts  # 8-dim output not 128-divisible
    v_bs = m.pack_variables(v)
    assert "w0__bs" in v_bs["params"] and "w0" not in v_bs["params"]
    x = jnp.array(np.random.RandomState(1).randn(8, 256), jnp.float32)
    y_s, _ = m.apply(v_bs, x, train=False)
    y_d, _ = m_dense.apply(v, x, train=False)
    np.testing.assert_allclose(np.array(y_s), np.array(y_d), rtol=1e-4,
                               atol=1e-4)

    # packed grads == dense-masked grads mapped through the packing
    def loss_bs(v_):
        y, _ = m.apply(v_, x, train=False)
        return jnp.sum(y * y)

    def loss_d(v_):
        y, _ = m_dense.apply(v_, x, train=False)
        return jnp.sum(y * y)
    g_bs = jax.grad(loss_bs)(v_bs)["params"]["w0__bs"]
    g_d = jax.grad(loss_d)(v)["params"]["w0"]
    from pytorch_kaldi_cgs_tpu.ops.block_sparse import pack_w3
    layout = m._bs_layouts[0][0]
    mask = np.asarray(v["masks"]["hcgs_w0"])
    np.testing.assert_allclose(np.asarray(g_bs),
                               pack_w3(np.asarray(g_d) * mask, layout),
                               rtol=1e-4, atol=1e-4)


def test_lstm_block_sparse_padded_k_and_m():
    """K-padded layout (input width not a multiple of the block) AND
    T*B not a multiple of the 256-row tile: the M-row padding must pad
    at the widened width, not the original F (ADVICE r4 medium — the
    pad rows were built with F columns after xin was widened to
    layout.K, raising a trace-time shape mismatch)."""
    o = lstm_opts("256", lstm_hcgs="True", hcgsx_block="128",
                  hcgsx_sparse="50", hcgsh_block="128", hcgsh_sparse="50")
    o["lstm_use_batchnorm"] = "False"
    o["lstm_use_laynorm"] = "False"
    inp = 1000                      # kb_eff = ceil(1000/128) = 8, K-padded
    m_dense = M.LSTM(dict(o), inp)
    m_bs = M.LSTM(dict(o, lstm_block_sparse="True"), inp)
    v = m_dense.init(0)
    m_bs.prepare_block_sparse(v)
    assert 0 in m_bs._bs_layouts
    layout = m_bs._bs_layouts[0][0]
    assert layout.K == 1024 and layout.k_true == 1000
    v_bs = m_bs.pack_variables(v)
    x = jnp.array(np.random.RandomState(3).randn(5, 3, inp), jnp.float32)
    assert (5 * 3) % 256 != 0
    y_s, _ = m_bs.apply(v_bs, x, train=False)
    y_d, _ = m_dense.apply(v, x, train=False)
    np.testing.assert_allclose(np.array(y_s), np.array(y_d), rtol=1e-4,
                               atol=1e-4)


def test_bf16_compute_close_to_f32():
    o = lstm_opts("32")
    m32 = M.LSTM(dict(o), 12)
    mbf = M.LSTM(dict(o, compute_dtype="bfloat16"), 12)
    v = m32.init(0)
    x = jnp.array(np.random.RandomState(0).randn(10, 3, 12), jnp.float32)
    y32, _ = m32.apply(v, x, train=False)
    ybf, _ = mbf.apply(v, x, train=False)
    assert ybf.dtype == jnp.float32  # f32 accumulation/output
    # bf16 matmul inputs: outputs close but not identical
    assert np.abs(np.array(y32) - np.array(ybf)).max() < 0.05
    assert not np.array_equal(np.array(y32), np.array(ybf))


@pytest.mark.parametrize("cls", [M.LSTM_cudnn, M.RNN_cudnn])
def test_cudnn_fused_matches_scan(cls):
    """LSTM_cudnn/RNN_cudnn routed through the fused Pallas recurrence
    (torch ifgo gate order permuted, b_hh folded into the projections)
    == the plain lax.scan path."""
    opts = dict(BASE_OPTS, hidden_size="14", num_layers="2", bias="True",
                batch_first="False", dropout="0.0", bidirectional="True")
    if cls is M.RNN_cudnn:
        opts["nonlinearity"] = "tanh"
    m_plain = cls(dict(opts, fused_scan="False"), 6)
    m_fused = cls(dict(opts, fused_scan="True"), 6)
    v = m_plain.init(0)
    x = jnp.array(np.random.RandomState(0).randn(9, 3, 6), jnp.float32)
    y1, _ = m_plain.apply(v, x, train=False)
    y2, _ = m_fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)

    def loss(v_, m):
        y, _ = m.apply(v_, x, train=False)
        return jnp.sum(y * y)
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda v_: loss(v_, m_plain))(v))
    g2 = jax.tree_util.tree_leaves(jax.grad(lambda v_: loss(v_, m_fused))(v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
