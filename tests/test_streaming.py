"""Streaming inference: chunked apply with carried recurrent state must
reproduce the full-utterance forward exactly — for every recurrent cell,
the cudnn-class wrappers, and SRU (whose carry composes through the
associative scan's prefix product). The reference cannot do this at all:
its forward is whole-utterance only (ref core.py:71-72)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_kaldi_cgs_tpu.models as M


def _chunks(x, sizes):
    out, t = [], 0
    for s in sizes:
        out.append(x[t:t + s])
        t += s
    assert t == x.shape[0]
    return out


def _stream_equals_full(net, v, x, atol=2e-5):
    # eager on both sides: jit-vs-eager fp reassociation differences get
    # amplified exponentially by tens of recurrent steps (measured 0.2
    # max-abs divergence for the uniform-init cudnn wrappers); the
    # streamed-equals-full property itself is what's under test
    full, _ = net.apply(v, x, train=False)
    carries, got = None, []
    for chunk in _chunks(x, [7, 1, 16, x.shape[0] - 24]):
        y, carries = net.apply_streaming(v, chunk, carries)
        got.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(got, axis=0),
                               np.asarray(full), rtol=1e-5, atol=atol)


@pytest.mark.parametrize("cls_name,prefix", [
    ("LSTM", "lstm"), ("GRU", "gru"), ("liGRU", "ligru"),
    ("minimalGRU", "minimalgru"), ("RNN", "rnn")])
def test_custom_cells_stream_exactly(cls_name, prefix):
    cls = getattr(M, cls_name)
    opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
            prefix + "_lay": "16,16", prefix + "_drop": "0.2,0.2",
            prefix + "_use_batchnorm": "True,True",
            prefix + "_use_laynorm": "False,False",
            prefix + "_use_laynorm_inp": "False",
            prefix + "_use_batchnorm_inp": "True",
            prefix + "_act": "tanh,tanh", prefix + "_orthinit": "True",
            prefix + "_bidir": "False",
            # force the fused kernel eligible on CPU so the streaming
            # bypass (fused kernels assume zero state) is what's tested
            prefix + "_fused_scan": "True"}
    net = cls(opts, 9)
    v = net.init(0)
    x = jnp.asarray(np.random.RandomState(0).randn(40, 3, 9), jnp.float32)
    _stream_equals_full(net, v, x)


@pytest.mark.parametrize("cls_name", ["LSTM_cudnn", "GRU_cudnn", "RNN_cudnn"])
def test_cudnn_wrappers_stream_exactly(cls_name):
    cls = getattr(M, cls_name)
    opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
            "hidden_size": "16", "num_layers": "2", "bias": "True",
            "bidirectional": "False", "dropout": "0.0",
            "fused_scan": "True"}
    net = cls(opts, 9)
    v = net.init(0)
    x = jnp.asarray(np.random.RandomState(1).randn(40, 3, 9), jnp.float32)
    _stream_equals_full(net, v, x)


def test_sru_streams_exactly():
    opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
            "sru_hidden_size": "16", "sru_num_layers": "2",
            "sru_dropout": "0.0", "sru_rnn_dropout": "0.0",
            "sru_use_tanh": "True", "sru_use_relu": "False",
            "sru_use_selu": "False", "sru_weight_norm": "False",
            "sru_layer_norm": "True", "sru_bidirectional": "False",
            "sru_is_input_normalized": "True", "sru_has_skip_term": "True",
            "sru_rescale": "False", "sru_highway_bias": "-1.0",
            "sru_n_proj": "0"}
    net = M.SRU(opts, 9)
    v = net.init(0)
    x = jnp.asarray(np.random.RandomState(2).randn(40, 3, 9), jnp.float32)
    _stream_equals_full(net, v, x)


def test_bidirectional_refuses_streaming():
    opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
            "lstm_lay": "8", "lstm_drop": "0.0",
            "lstm_use_batchnorm": "False", "lstm_use_laynorm": "False",
            "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "True"}
    net = M.LSTM(opts, 5)
    v = net.init(0)
    x = jnp.zeros((10, 2, 5), jnp.float32)
    with pytest.raises(ValueError, match="bidirectional"):
        net.apply_streaming(v, x)


def test_frame_wise_models_stream_trivially():
    opts = {"to_do": "forward", "arch_name": "m", "out_folder": "/tmp",
            "dnn_lay": "12", "dnn_drop": "0.0", "dnn_use_batchnorm": "False",
            "dnn_use_laynorm": "False", "dnn_use_laynorm_inp": "False",
            "dnn_use_batchnorm_inp": "False", "dnn_act": "softmax"}
    net = M.MLP(opts, 7)
    v = net.init(0)
    x = jnp.asarray(np.random.RandomState(3).randn(20, 7), jnp.float32)
    y, carries = net.apply_streaming(v, x)
    full, _ = net.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(full))
    assert carries == []


def test_streaming_recognizer_end_to_end():
    """StreamingRecognizer: streamed posteriors == batch posteriors;
    finalize() Viterbi-decodes the accumulated stream."""
    from pytorch_kaldi_cgs_tpu.decode.viterbi import PhoneLoopHMM
    from pytorch_kaldi_cgs_tpu.runtime.serve import StreamingRecognizer

    opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
            "lstm_lay": "16", "lstm_drop": "0.0",
            "lstm_use_batchnorm": "False", "lstm_use_laynorm": "False",
            "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh", "lstm_orthinit": "True", "lstm_bidir": "False"}
    lstm = M.LSTM(opts, 6)
    mlp = M.MLP({"to_do": "forward", "arch_name": "m", "out_folder": "/tmp",
                 "dnn_lay": "8", "dnn_drop": "0.0",
                 "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
                 "dnn_use_laynorm_inp": "False",
                 "dnn_use_batchnorm_inp": "False",
                 "dnn_act": "softmax"}, lstm.out_dim)

    class Stack:
        arch_name = "stack"
        bidir = False

        def apply_streaming(self, variables, x, carries=None):
            h, carries = lstm.apply_streaming(variables["lstm"], x, carries)
            T, B, H = h.shape
            y, _ = mlp.apply(variables["mlp"], h.reshape(T * B, H),
                             train=False)
            return y.reshape(T, B, -1), carries

        def apply(self, variables, x, *, train):
            h, _ = lstm.apply(variables["lstm"], x, train=train)
            T, B, H = h.shape
            y, _ = mlp.apply(variables["mlp"], h.reshape(T * B, H),
                             train=train)
            return y.reshape(T, B, -1), {}

    stack = Stack()
    variables = {"lstm": lstm.init(0), "mlp": mlp.init(1)}
    hmm = PhoneLoopHMM(num_phones=4, states_per_phone=2)
    rec = StreamingRecognizer(stack, variables, hmm=hmm, acwt=1.0)

    x = np.random.RandomState(4).randn(36, 2, 6).astype(np.float32)
    session = rec.start()
    for chunk in _chunks(jnp.asarray(x), [12, 12, 12]):
        rec.accept(session, chunk)
    streamed = np.concatenate(session["chunks"], axis=0)
    full, _ = stack.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(streamed, np.asarray(full),
                               rtol=1e-5, atol=2e-5)
    partial = rec.partial(session)
    assert len(partial) == 2 and all(len(p) >= 1 for p in partial)
    final = rec.finalize(session)
    assert len(final) == 2 and all(len(f) >= 1 for f in final)


@pytest.mark.parametrize("cls_name,prefix,act", [
    ("GRU", "gru", "tanh"), ("liGRU", "ligru", "relu"),
    ("minimalGRU", "minimalgru", "tanh"), ("RNN", "rnn", "tanh")])
def test_rnn_family_fused_stream_matches_scan_stream(cls_name, prefix, act):
    """Each cell's seeded-carry ``*_scan_fused_stream`` kernel (wired
    through _RecurrentBase._stream_fused) and the plain scan streaming
    path produce identical chunk outputs AND identical carried state
    across a chunk boundary."""
    def build(force_fused):
        opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
                prefix + "_lay": "16,16", prefix + "_drop": "0.0,0.0",
                prefix + "_use_batchnorm": "False,False",
                prefix + "_use_laynorm": "False,False",
                prefix + "_use_laynorm_inp": "False",
                prefix + "_use_batchnorm_inp": "False",
                prefix + "_act": "%s,%s" % (act, act),
                prefix + "_orthinit": "True", prefix + "_bidir": "False",
                prefix + "_fused_scan": "True" if force_fused else "False"}
        return getattr(M, cls_name)(opts, 9)

    fused = build(True)
    plain = build(False)
    v = fused.init(0)
    x = jnp.asarray(np.random.RandomState(5).randn(24, 3, 9), jnp.float32)
    cf = cp = None
    for chunk in _chunks(x, [9, 15]):
        yf, cf = fused.apply_streaming(v, chunk, cf)
        yp, cp = plain.apply_streaming(v, chunk, cp)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(cf),
                        jax.tree_util.tree_leaves(cp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_lstm_fused_stream_matches_scan_stream():
    """The seeded-carry fused kernel (lstm_scan_fused_stream) and the
    plain scan streaming path produce identical chunk outputs AND
    identical carried (h, c) state."""
    def build(force_fused):
        opts = {"to_do": "forward", "arch_name": "t", "out_folder": "/tmp",
                "lstm_lay": "16,16", "lstm_drop": "0.0,0.0",
                "lstm_use_batchnorm": "False,False",
                "lstm_use_laynorm": "False,False",
                "lstm_use_laynorm_inp": "False",
                "lstm_use_batchnorm_inp": "False",
                "lstm_act": "tanh,tanh", "lstm_orthinit": "True",
                "lstm_bidir": "False",
                "lstm_fused_scan": "True" if force_fused else "False"}
        return M.LSTM(opts, 9)

    fused = build(True)
    plain = build(False)
    v = fused.init(0)
    x = jnp.asarray(np.random.RandomState(5).randn(24, 3, 9), jnp.float32)
    cf = cp = None
    for chunk in _chunks(x, [9, 15]):
        yf, cf = fused.apply_streaming(v, chunk, cf)
        yp, cp = plain.apply_streaming(v, chunk, cp)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(cf),
                        jax.tree_util.tree_leaves(cp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
