"""Fused Pallas LSTM recurrence (ops/fused_lstm.py): exact forward and
near-exact gradients vs the lax.scan path, including per-step input
quantization and per-sequence dropout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.ops.fused_lstm import lstm_scan_fused
from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM


def _scan_ref(g, U, drop, act=jnp.tanh):
    T, B, G4 = g.shape
    H = G4 // 4
    h0 = jnp.zeros((B, H))

    def step(carry, g_t):
        h, c = carry
        u = jnp.einsum("bh,gh->bg", h, U)
        gf, gi, go, gc = jnp.split(g_t + u, 4, axis=-1)
        c = jax.nn.sigmoid(gi) * act(gc) * drop + jax.nn.sigmoid(gf) * c
        h = jax.nn.sigmoid(go) * act(c)
        return (h, c), h

    return jax.lax.scan(step, (h0, h0), g)[1]


def test_fused_forward_and_grads_match_scan():
    T, B, H = 12, 4, 16
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.asarray((rng.rand(B, H) > 0.2), jnp.float32)
    hs_ref = _scan_ref(g, U, drop)
    hs = lstm_scan_fused(g, U, drop, interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)

    tgt = jnp.asarray(rng.randn(T, B, H), jnp.float32)
    gr_ref = jax.grad(lambda g, U: jnp.sum((_scan_ref(g, U, drop) - tgt) ** 2),
                      argnums=(0, 1))(g, U)
    gr = jax.grad(lambda g, U: jnp.sum(
        (lstm_scan_fused(g, U, drop, interpret=True) - tgt) ** 2),
        argnums=(0, 1))(g, U)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gr_ref[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gr_ref[1]),
                               atol=1e-4)


def _scan_ref_seeded(g, U, drop, h0, c0, act=jnp.tanh):
    def step(carry, g_t):
        h, c = carry
        u = jnp.einsum("bh,gh->bg", h, U)
        gf, gi, go, gc = jnp.split(g_t + u, 4, axis=-1)
        c = jax.nn.sigmoid(gi) * act(gc) * drop + jax.nn.sigmoid(gf) * c
        h = jax.nn.sigmoid(go) * act(c)
        return (h, c), h

    (hT, cT), hs = jax.lax.scan(step, (h0, c0), g)
    return hs, (hT, cT)


def test_fused_seeded_forward_and_grads_match_scan():
    """The seeded-carry fused kernel now has a VJP (VERDICT round-3
    item 4): forward, final state, and gradients — including the
    cotangents flowing through h0/c0 and into the final state — all
    match a seeded lax.scan."""
    from pytorch_kaldi_cgs_tpu.ops.fused_lstm import lstm_scan_fused_seeded
    T, B, H = 11, 3, 16
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    h0 = jnp.asarray(rng.randn(B, H) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H) * 0.3, jnp.float32)
    drop = jnp.asarray((rng.rand(B, H) > 0.2), jnp.float32)

    hs_ref, (hT_ref, cT_ref) = _scan_ref_seeded(g, U, drop, h0, c0)
    hs, (hT, cT) = lstm_scan_fused_seeded(g, U, drop, h0, c0,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_ref), atol=1e-6)

    tgt = jnp.asarray(rng.randn(T, B, H), jnp.float32)

    def loss_ref(g, U, h0, c0):
        hs, (hT, cT) = _scan_ref_seeded(g, U, drop, h0, c0)
        return (jnp.sum((hs - tgt) ** 2) + jnp.sum(hT * hT)
                + jnp.sum(jnp.tanh(cT)))

    def loss_fused(g, U, h0, c0):
        hs, (hT, cT) = lstm_scan_fused_seeded(g, U, drop, h0, c0,
                                              interpret=True)
        return (jnp.sum((hs - tgt) ** 2) + jnp.sum(hT * hT)
                + jnp.sum(jnp.tanh(cT)))

    gr_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(g, U, h0, c0)
    gr = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(g, U, h0, c0)
    for a, b in zip(gr, gr_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_bf16_compute_close_to_f32():
    """compute_dtype="bf16" (recurrent dots in bf16, f32 accumulation
    and carries) stays within mixed-precision tolerance of the f32
    lax.scan forward AND its gradients — the bench's PKC_COMPUTE_DTYPE
    path (VERDICT round-3 item 2)."""
    T, B, H = 24, 4, 32
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)
    hs_ref = _scan_ref(g, U, drop)
    hs = lstm_scan_fused(g, U, drop, interpret=True, compute_dtype="bf16")
    # |h| <= 1 (tanh output); bf16 has ~3 decimal digits, recurrence
    # accumulates — 2e-2 abs is the observed envelope with margin
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               atol=2e-2)
    assert float(jnp.max(jnp.abs(hs - hs_ref))) > 0  # really ran bf16

    tgt = jnp.asarray(rng.randn(T, B, H), jnp.float32)
    gr_ref = jax.grad(lambda g, U: jnp.mean(
        (_scan_ref(g, U, drop) - tgt) ** 2), argnums=(0, 1))(g, U)
    gr = jax.grad(lambda g, U: jnp.mean(
        (lstm_scan_fused(g, U, drop, interpret=True,
                         compute_dtype="bf16") - tgt) ** 2),
        argnums=(0, 1))(g, U)
    for a, b in zip(gr, gr_ref):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 3e-2


def test_fused_quantized_dU_uses_per_step_scale():
    """With activation quantization, dU must be computed against the
    PER-STEP quantized h (the fwd kernel's scale is max|h| of each
    (B, H) block); a single global scale over the whole sequence biases
    dU — regression for the dU-outside-the-kernel refactor."""
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import ste_quantize_input
    T, B, H, bits = 12, 4, 16, 8
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    # scale h magnitudes per step so a global max differs a lot
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)

    def scan_q(g, U):
        h0 = jnp.zeros((B, H))

        def step(carry, g_t):
            h, c = carry
            u = jnp.einsum("bh,gh->bg", ste_quantize_input(h, bits), U)
            gf, gi, go, gc = jnp.split(g_t + u, 4, axis=-1)
            c = jax.nn.sigmoid(gi) * jnp.tanh(gc) * drop \
                + jax.nn.sigmoid(gf) * c
            h = jax.nn.sigmoid(go) * jnp.tanh(c)
            return (h, c), h

        return jax.lax.scan(step, (h0, h0), g)[1]

    tgt = jnp.asarray(rng.randn(T, B, H), jnp.float32)
    dU_ref = jax.grad(lambda U: jnp.sum((scan_q(g, U) - tgt) ** 2))(U)
    dU = jax.grad(lambda U: jnp.sum(
        (lstm_scan_fused(g, U, drop, quant_bits=bits, interpret=True)
         - tgt) ** 2))(U)
    hs_ref = scan_q(g, U)
    hs = lstm_scan_fused(g, U, drop, quant_bits=bits, interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("act", ["relu", "htanh"])
def test_fused_other_activations(act):
    from pytorch_kaldi_cgs_tpu.models.layers import act_fun
    T, B, H = 8, 4, 8
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)
    hs_ref = _scan_ref(g, U, drop, act=act_fun(act))
    hs = lstm_scan_fused(g, U, drop, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)


def test_model_fused_path_matches_scan_path():
    """LSTM.apply with lstm_fused_scan on vs off: identical forward,
    ~1e-5 grads — with 8w/16a quantization, dropout and batch norm."""
    opts = {"lstm_lay": "32,32", "lstm_drop": "0.1,0.1",
            "lstm_use_batchnorm": "True,True",
            "lstm_use_laynorm": "False,False",
            "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh,tanh", "lstm_orthinit": "True",
            "lstm_bidir": "False", "to_do": "train", "lstm_hcgs": "False",
            "hcgsx_block": "8,2", "hcgsh_block": "8,2",
            "hcgsx_sparse": "25,50", "hcgsh_sparse": "25,50",
            "lstm_quant": "True", "param_quant": "8,8",
            "lstm_quant_inp": "True", "inp_quant": "16",
            "lstm_prune": "False", "lstm_prune_perc": "0",
            "skip_regularization": "True", "guided_hcgs": "False",
            "apply_guided_hcgs": "False", "arch_name": "t",
            "scan_unroll": "1"}
    x = np.random.RandomState(0).randn(20, 4, 12).astype(np.float32)
    m_plain = LSTM(dict(opts, lstm_fused_scan="False"), 12)
    m_fused = LSTM(dict(opts, lstm_fused_scan="True"), 12)
    v = m_plain.init(0)
    key = jax.random.PRNGKey(5)
    y1, _ = m_plain.apply(v, x, train=True, rng=key)
    y2, _ = m_fused.apply(v, x, train=True, rng=key)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)

    def loss(v, m):
        y, _ = m.apply(v, x, train=True, rng=key)
        return jnp.sum(y * y)
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda v: loss(v, m_plain))(v))
    g2 = jax.tree_util.tree_leaves(jax.grad(lambda v: loss(v, m_fused))(v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_sparse_fused_scan_matches_scan():
    """Block-sparse fused recurrence (ops.fused_lstm.lstm_scan_fused_sparse)
    vs lax.scan over the masked dense U: exact forward, grads incl. the
    dU path through the block-sparse dw kernel."""
    from pytorch_kaldi_cgs_tpu.ops import block_sparse as BS
    from pytorch_kaldi_cgs_tpu.ops import fused_lstm as FL
    from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask

    T, B, H, bs = 10, 4, 16, 8
    rng = np.random.RandomState(0)
    mask = hcgs_mask(H, H, [bs], [50.0], rng=rng)   # ONE per-gate mask
    layout = BS.pack_layout(np.asarray(mask), bs)
    mask4 = np.tile(np.asarray(mask), (4, 1))
    U = (rng.randn(4 * H, H) * 0.2).astype(np.float32) * mask4
    w3g, _ = BS.v3_from_blocks(BS.gather_blocks_multi(
        [jnp.asarray(U[g_ * H:(g_ + 1) * H]) for g_ in range(4)], layout),
        layout, 4)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)

    hs_ref = _scan_ref(g, jnp.asarray(U), drop)
    hs = FL.lstm_scan_fused_sparse(g, w3g, layout, drop, interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)

    tgt = jnp.asarray(rng.randn(T, B, H), jnp.float32)
    gr_ref = jax.grad(lambda g, U: jnp.sum((_scan_ref(g, U, drop) - tgt) ** 2),
                      argnums=(0, 1))(g, jnp.asarray(U))
    gr = jax.grad(lambda g, w: jnp.sum(
        (FL.lstm_scan_fused_sparse(g, w, layout, drop,
                                   interpret=True) - tgt) ** 2),
        argnums=(0, 1))(g, w3g)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gr_ref[0]),
                               atol=1e-4)
    dU_masked = np.asarray(gr_ref[1]) * mask4
    du_ref, _ = BS.v3_from_blocks(BS.gather_blocks_multi(
        [jnp.asarray(dU_masked[g_ * H:(g_ + 1) * H]) for g_ in range(4)],
        layout), layout, 4)
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(du_ref),
                               atol=1e-4)


def test_model_sparse_recurrence_matches_dense():
    """Full LSTM model: sparse fused recurrence + packed projections ==
    the plain masked lax.scan path, forward AND recurrent grads."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM
    opts = {"lstm_lay": "256", "lstm_drop": "0.0",
            "lstm_use_batchnorm": "True", "lstm_use_laynorm": "False",
            "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False",
            "to_do": "train", "lstm_hcgs": "True",
            "hcgsx_block": "128", "hcgsh_block": "128",
            "hcgsx_sparse": "50", "hcgsh_sparse": "50",
            "lstm_quant": "False", "param_quant": "8",
            "lstm_quant_inp": "False", "inp_quant": "16",
            "lstm_prune": "False", "lstm_prune_perc": "0",
            "skip_regularization": "True", "guided_hcgs": "False",
            "apply_guided_hcgs": "False", "arch_name": "t",
            "scan_unroll": "1"}
    x = np.random.RandomState(0).randn(12, 4, 64).astype(np.float32)
    m_plain = LSTM(dict(opts, lstm_fused_scan="False",
                        lstm_block_sparse="False"), 64)
    m_sp = LSTM(dict(opts, lstm_fused_scan="True",
                     lstm_block_sparse="True"), 64)
    v = m_plain.init(0)
    m_sp.prepare_block_sparse(v)
    assert 0 in m_sp._rec_layouts
    v_s = m_sp.pack_variables(v)
    key = jax.random.PRNGKey(3)
    y1, _ = m_plain.apply(v, x, train=True, rng=key)
    y2, _ = m_sp.apply(v_s, x, train=True, rng=key)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)

    def loss(v_, m):
        y, _ = m.apply(v_, x, train=True, rng=key)
        return jnp.sum(y * y)
    g1 = jax.grad(lambda v_: loss(v_, m_plain))(v)["params"]
    g2 = jax.grad(lambda v_: loss(v_, m_sp))(v_s)["params"]
    for k in g1:
        if k.startswith("u"):
            np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                       atol=1e-4)


def test_fused_ligru_and_rnn_match_scan():
    """liGRU/RNN/GRU/minimalGRU fused recurrences == the lax.scan model
    paths, forward and grads, through the full models (forced on CPU)."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import (GRU, RNN, liGRU,
                                                        minimalGRU)

    for cls, prefix, act in ((liGRU, "ligru", "relu"), (RNN, "rnn", "tanh"),
                             (GRU, "gru", "tanh"),
                             (minimalGRU, "minimalgru", "tanh")):
        opts = {prefix + "_lay": "32,32", prefix + "_drop": "0.1,0.1",
                prefix + "_use_batchnorm": "True,True",
                prefix + "_use_laynorm": "False,False",
                prefix + "_use_laynorm_inp": "False",
                prefix + "_use_batchnorm_inp": "False",
                prefix + "_act": "%s,%s" % (act, act),
                prefix + "_orthinit": "True", prefix + "_bidir": "False",
                "to_do": "train", prefix + "_hcgs": "False",
                "hcgsx_block": "8,2", "hcgsh_block": "8,2",
                "hcgsx_sparse": "25,50", "hcgsh_sparse": "25,50",
                prefix + "_quant": "False", "param_quant": "8,8",
                prefix + "_quant_inp": "False", "inp_quant": "16",
                prefix + "_prune": "False", prefix + "_prune_perc": "0",
                "skip_regularization": "True", "guided_hcgs": "False",
                "apply_guided_hcgs": "False", "arch_name": "t",
                "scan_unroll": "1"}
        x = np.random.RandomState(0).randn(15, 4, 12).astype(np.float32)
        m_plain = cls(dict(opts, **{prefix + "_fused_scan": "False"}), 12)
        m_fused = cls(dict(opts, **{prefix + "_fused_scan": "True"}), 12)
        v = m_plain.init(0)
        key = jax.random.PRNGKey(5)
        y1, _ = m_plain.apply(v, x, train=True, rng=key)
        y2, _ = m_fused.apply(v, x, train=True, rng=key)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   atol=1e-5, err_msg=prefix)

        def loss(v_, m):
            y, _ = m.apply(v_, x, train=True, rng=key)
            return jnp.sum(y * y)
        g1 = jax.tree_util.tree_leaves(
            jax.grad(lambda v_: loss(v_, m_plain))(v))
        g2 = jax.tree_util.tree_leaves(
            jax.grad(lambda v_: loss(v_, m_fused))(v))
        for a, b in zip(g1, g2):
            # grads reach O(40); accumulation order differs between the
            # kernel and the scan -> relative tolerance
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-3, err_msg=prefix)


def test_fused_gru_quantized_input_matches_scan():
    """16-bit input quantization flows identically through the fused GRU
    kernel (q(h) for z/r, q(r*h) for the candidate) and the scan."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import GRU

    opts = {"gru_lay": "32", "gru_drop": "0.0",
            "gru_use_batchnorm": "True", "gru_use_laynorm": "False",
            "gru_use_laynorm_inp": "False", "gru_use_batchnorm_inp": "False",
            "gru_act": "tanh", "gru_orthinit": "True", "gru_bidir": "False",
            "to_do": "train", "gru_hcgs": "False",
            "hcgsx_block": "8,2", "hcgsh_block": "8,2",
            "hcgsx_sparse": "25,50", "hcgsh_sparse": "25,50",
            "gru_quant": "True", "param_quant": "8",
            "gru_quant_inp": "True", "inp_quant": "16",
            "gru_prune": "False", "gru_prune_perc": "0",
            "skip_regularization": "True", "guided_hcgs": "False",
            "apply_guided_hcgs": "False", "arch_name": "t",
            "scan_unroll": "1"}
    x = np.random.RandomState(1).randn(12, 4, 10).astype(np.float32)
    m_plain = GRU(dict(opts, gru_fused_scan="False"), 10)
    m_fused = GRU(dict(opts, gru_fused_scan="True"), 10)
    v = m_plain.init(0)
    key = jax.random.PRNGKey(3)
    y1, _ = m_plain.apply(v, x, train=True, rng=key)
    y2, _ = m_fused.apply(v, x, train=True, rng=key)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)

    def loss(v_, m):
        y, _ = m.apply(v_, x, train=True, rng=key)
        return jnp.sum(y * y)
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda v_: loss(v_, m_plain))(v))
    g2 = jax.tree_util.tree_leaves(jax.grad(lambda v_: loss(v_, m_fused))(v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-3)


def test_model_sparse_recurrence_ligru_rnn_matches_dense():
    """liGRU/RNN/GRU/minimalGRU: sparse fused recurrence == plain masked
    lax.scan, forward and recurrent grads (interpret mode, forced on
    CPU). GRU/minimalGRU exercise the two-pass gated-input kernels."""
    from pytorch_kaldi_cgs_tpu.models.recurrent import (GRU, RNN, liGRU,
                                                        minimalGRU)

    for cls, prefix, act in ((liGRU, "ligru", "relu"), (RNN, "rnn", "tanh"),
                             (GRU, "gru", "tanh"),
                             (minimalGRU, "minimalgru", "tanh")):
        opts = {prefix + "_lay": "256", prefix + "_drop": "0.0",
                prefix + "_use_batchnorm": "True",
                prefix + "_use_laynorm": "False",
                prefix + "_use_laynorm_inp": "False",
                prefix + "_use_batchnorm_inp": "False",
                prefix + "_act": act, prefix + "_orthinit": "True",
                prefix + "_bidir": "False", "to_do": "train",
                prefix + "_hcgs": "True",
                "hcgsx_block": "128", "hcgsh_block": "128",
                "hcgsx_sparse": "50", "hcgsh_sparse": "50",
                prefix + "_quant": "False", "param_quant": "8",
                prefix + "_quant_inp": "False", "inp_quant": "16",
                prefix + "_prune": "False", prefix + "_prune_perc": "0",
                "skip_regularization": "True", "guided_hcgs": "False",
                "apply_guided_hcgs": "False", "arch_name": "t",
                "scan_unroll": "1"}
        x = np.random.RandomState(0).randn(12, 4, 64).astype(np.float32)
        m_plain = cls(dict(opts, **{prefix + "_fused_scan": "False",
                                    prefix + "_block_sparse": "False"}), 64)
        m_sp = cls(dict(opts, **{prefix + "_fused_scan": "True",
                                 prefix + "_block_sparse": "True"}), 64)
        v = m_plain.init(0)
        m_sp.prepare_block_sparse(v)
        assert 0 in m_sp._rec_layouts, prefix
        v_s = m_sp.pack_variables(v)
        key = jax.random.PRNGKey(3)
        y1, _ = m_plain.apply(v, x, train=True, rng=key)
        y2, _ = m_sp.apply(v_s, x, train=True, rng=key)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   atol=1e-5, err_msg=prefix)

        def loss(v_, m):
            y, _ = m.apply(v_, x, train=True, rng=key)
            return jnp.sum(y * y)
        g1 = jax.grad(lambda v_: loss(v_, m_plain))(v)["params"]
        g2 = jax.grad(lambda v_: loss(v_, m_sp))(v_s)["params"]
        for k in g1:
            if k.startswith("u"):
                np.testing.assert_allclose(
                    np.asarray(g2[k]), np.asarray(g1[k]), atol=1e-4,
                    err_msg="%s %s" % (prefix, k))


def test_gru_cudnn_fused_matches_scan():
    """The torch-semantics fused GRU kernel (one dot per step,
    r * (U_n h + b_hn)) reproduces the GRU_cudnn lax.scan path exactly,
    gradients included (b_hh too — it enters INSIDE the reset gate)."""
    from pytorch_kaldi_cgs_tpu.models import GRU_cudnn

    def build(force_fused):
        return GRU_cudnn(
            {"to_do": "train", "arch_name": "t", "out_folder": "/tmp",
             "hidden_size": "16", "num_layers": "2", "bias": "True",
             "bidirectional": "True", "dropout": "0.0",
             "fused_scan": "True" if force_fused else "False"}, 9)

    fused, plain = build(True), build(False)
    v = fused.init(0)
    x = jnp.asarray(np.random.RandomState(7).randn(15, 4, 9), jnp.float32)
    yf, _ = fused.apply(v, x, train=False)
    yp, _ = plain.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)

    def loss(net, p):
        y, _ = net.apply({**v, "params": p}, x, train=False)
        return jnp.sum(y ** 2)

    gf = jax.grad(lambda p: loss(fused, p))(v["params"])
    gp = jax.grad(lambda p: loss(plain, p))(v["params"])
    for k in gp:
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gp[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_fits_vmem_dtype_aware():
    """bf16 compute halves U residency: H=1024 dense-fused fits in bf16
    but not f32; H=1448+ overflows both (VERDICT r4 item 5)."""
    from pytorch_kaldi_cgs_tpu.ops.fused_lstm import fits_vmem
    from pytorch_kaldi_cgs_tpu.ops.fused_rnn import fits_vmem as frnn
    assert not fits_vmem(16, 1024)
    assert fits_vmem(16, 1024, "bf16")
    assert fits_vmem(16, 1024, "bfloat16")
    assert not fits_vmem(16, 1448, "bf16")
    # 2-gate family at H=1448: bf16 fits, f32 does not
    assert not frnn(16, 1448, 2)
    assert frnn(16, 1448, 2, "bf16")


def test_fused_eligibility_follows_compute_dtype():
    """The model-level eligibility check passes compute_dtype through:
    a 1024-wide bf16 LSTM is fused-eligible, the f32 one is not."""
    from pytorch_kaldi_cgs_tpu.models import LSTM
    opts = {
        "to_do": "train", "arch_name": "l", "out_folder": "/tmp",
        "lstm_lay": "1024", "lstm_drop": "0.0",
        "lstm_use_batchnorm": "False", "lstm_use_laynorm": "False",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_act": "tanh", "lstm_orthinit": "False", "lstm_bidir": "False",
        "lstm_hcgs": "False", "lstm_quant": "False", "param_quant": "8",
        "lstm_quant_inp": "False", "inp_quant": "16", "lstm_prune": "False",
        "lstm_prune_perc": "50", "skip_regularization": "True",
        "lstm_fused_scan": "True",   # force past the CPU-backend gate
    }
    m32 = LSTM(dict(opts), 64)
    mbf = LSTM(dict(opts, compute_dtype="bfloat16"), 64)
    assert not m32._fused_lstm_ok(False, "tanh", 16, 1024)
    assert mbf._fused_lstm_ok(False, "tanh", 16, 1024)
