"""Tests for native feature/label pipelines (apply-cmvn, add-deltas,
context windows, ali-to-pdf) and the synthetic dataset + chunk loader."""
import gzip
import os

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.data import dataset, features, kaldi_io, synth


def test_cmvn_mean_only():
    x = np.random.RandomState(0).randn(50, 4).astype(np.float32) + 3.0
    stats = features.compute_cmvn_stats(x)
    y = features.apply_cmvn(x, stats)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-4)
    # variance untouched
    np.testing.assert_allclose(y.std(axis=0), x.std(axis=0), rtol=1e-4)


def test_cmvn_norm_vars():
    x = np.random.RandomState(1).randn(200, 3).astype(np.float32) * 5 + 1
    y = features.apply_cmvn(x, features.compute_cmvn_stats(x), norm_vars=True)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-2)


def test_add_deltas_constant_signal():
    x = np.full((20, 2), 7.0, dtype=np.float32)
    y = features.add_deltas(x, order=2)
    assert y.shape == (20, 6)
    np.testing.assert_allclose(y[:, :2], 7.0)
    np.testing.assert_allclose(y[:, 2:], 0.0, atol=1e-6)  # deltas of constant = 0


def test_add_deltas_linear_ramp():
    T = 30
    x = np.arange(T, dtype=np.float32)[:, None]
    y = features.add_deltas(x, order=1, window=2)
    # interior first-order delta of a unit ramp is exactly 1
    np.testing.assert_allclose(y[5:-5, 1], 1.0, atol=1e-5)


def test_context_window_layout():
    T, N = 10, 2
    x = np.arange(T * N, dtype=np.float32).reshape(T, N)
    # symmetric window: the reference's trim (head `left`, tail `right`
    # rows) only avoids np.roll wraparound when left == right, which is
    # what every shipped config uses (e.g. cw_left=cw_right=5)
    left, right = 2, 2
    y = features.context_window(x, left, right)
    assert y.shape == (T - left - right, N * (left + right + 1))
    # ref layout: block for lag l (=-left..right) is roll(x, l); row index
    # r of trimmed output corresponds to original frame t=r+left, so block
    # for lag l holds frame t-l
    for r in range(y.shape[0]):
        t = r + left
        col = 0
        for lag in range(-left, right + 1):
            np.testing.assert_allclose(y[r, col:col + N], x[t - lag])
            col += N


def test_transition_model_identity_and_json(tmp_path):
    tm = features.TransitionModel.identity(10)
    ali = np.array([1, 5, 10], dtype=np.int32)
    np.testing.assert_array_equal(tm.ali_to_pdf(ali), [0, 4, 9])
    p = str(tmp_path / "m.json")
    tm.to_json(p)
    tm2 = features.TransitionModel.from_json(p)
    np.testing.assert_array_equal(tm2.tid2pdf, tm.tid2pdf)
    assert tm2.hmm_info()["number of pdfs"] == 10


def test_transition_model_kaldi_text(tmp_path):
    """Parse a small Kaldi-style text transition model (2 phones, 1-state
    topology with self-loop + forward transition per state)."""
    txt = """<TransitionModel> <Topology>
<TopologyEntry> <ForPhones> 1 2 </ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.5 <Transition> 1 0.5 </State>
<State> 1 </State>
</TopologyEntry>
</Topology>
<Triples> 2
1 0 0
2 0 1
</Triples>
<LogProbs>  [ 0 ] </LogProbs> </TransitionModel>"""
    p = str(tmp_path / "final.mdl")
    with open(p, "w") as f:
        f.write(txt)
    tm = features.TransitionModel.from_kaldi_text(p)
    # 2 triples x 2 transitions each = 4 tids
    assert len(tm.tid2pdf) == 5  # index 0 unused
    np.testing.assert_array_equal(tm.tid2pdf[1:], [0, 0, 1, 1])
    np.testing.assert_array_equal(tm.tid2phone[1:], [1, 1, 2, 2])
    assert tm.num_pdfs == 2


def test_feature_pipeline_parse_and_apply(tmp_path):
    x = np.random.RandomState(2).randn(40, 3).astype(np.float32)
    # build a cmvn stats ark keyed by speaker
    stats = features.compute_cmvn_stats(x)
    cmvn_ark = str(tmp_path / "cmvn.ark")
    kaldi_io.write_mat(cmvn_ark, stats.astype(np.float32), key="spk1")
    u2s = str(tmp_path / "utt2spk")
    with open(u2s, "w") as f:
        f.write("utt1 spk1\n")
    opts = ("apply-cmvn --utt2spk=ark:%s ark:%s ark:- ark:- | "
            "add-deltas --delta-order=2 ark:- ark:- |" % (u2s, cmvn_ark))
    pipe = features.FeaturePipeline(opts)
    y = pipe("utt1", x)
    assert y.shape == (40, 9)
    np.testing.assert_allclose(y[:, :3].mean(axis=0), 0.0, atol=1e-3)


def test_feature_pipeline_rejects_unknown():
    with pytest.raises(ValueError):
        features.FeaturePipeline("frobnicate ark:- ark:- |")


def test_synth_and_load_chunk(tmp_path):
    root = str(tmp_path / "data")
    spec = synth.SynthSpec(num_utts=12, num_phones=6, states_per_phone=2,
                           feat_dim=5, max_len=80)
    paths = synth.generate(root, spec)
    fs = dataset.FeaStream("mfcc", os.path.join(paths["train"], "feats.scp"),
                           "", cw_left=2, cw_right=2)
    ls = dataset.LabStream("lab_cd", paths["train_ali"], "ali-to-pdf")
    chunk = dataset.load_chunk_multi([fs], [ls], max_seq_length=60)
    assert chunk.data.shape[1] == 5 * 5 + 1  # context-windowed feats + 1 lab
    assert chunk.end_index[-1] == chunk.data.shape[0]
    labs = chunk.data[:, chunk.lab_col("lab_cd")]
    assert labs.min() >= 0 and labs.max() < spec.num_pdfs
    # features are chunk-normalized
    feats = chunk.data[:, chunk.fea_cols("mfcc")]
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(feats.std(axis=0), 1.0, atol=1e-4)


def test_sentence_splitting(tmp_path):
    root = str(tmp_path / "data")
    spec = synth.SynthSpec(num_utts=8, num_phones=4, feat_dim=3,
                           min_len=100, max_len=150)
    paths = synth.generate(root, spec, splits={"train": 8})
    fs = dataset.FeaStream("f", os.path.join(paths["train"], "feats.scp"), "")
    ls = dataset.LabStream("l", paths["train_ali"], "ali-to-pdf")
    chunk = dataset.load_chunk_multi([fs], [ls], max_seq_length=50)
    lengths = chunk.seq_lengths
    # split pieces obey: piece <= 50 + 50/4, min final piece semantics
    assert lengths.max() <= 50 + 50 // 4
    assert any("_split" in n for n in chunk.names)
    # sorted by length
    assert np.all(np.diff(lengths) >= 0)


def test_multi_stream_multi_lab(tmp_path):
    root = str(tmp_path / "data")
    spec = synth.SynthSpec(num_utts=6, num_phones=4, states_per_phone=2, feat_dim=4)
    paths = synth.generate(root, spec, splits={"train": 6})
    scp = os.path.join(paths["train"], "feats.scp")
    f1 = dataset.FeaStream("a", scp, "", cw_left=1, cw_right=1)
    f2 = dataset.FeaStream("b", scp, "add-deltas --delta-order=1 ark:- ark:- |")
    l_cd = dataset.LabStream("lab_cd", paths["train_ali"], "ali-to-pdf")
    l_mono = dataset.LabStream("lab_mono", paths["train_ali"],
                               "ali-to-phones --per-frame=true")
    chunk = dataset.load_chunk_multi([f1, f2], [l_cd, l_mono], max_seq_length=100)
    assert chunk.fea_streams["a"].dim == 4 * 3
    assert chunk.fea_streams["b"].dim == 8
    assert chunk.data.shape[1] == 12 + 8 + 2
    cd = chunk.data[:, chunk.lab_col("lab_cd")].astype(int)
    mono = chunk.data[:, chunk.lab_col("lab_mono")].astype(int)
    # cd pdf // states_per_phone == mono phone (modulo the lab.min() shift
    # applied per-stream in load_chunk, ref: data_io.py:137)
    assert cd.shape == mono.shape
    assert (cd // 2 == mono).mean() > 0.9


def test_prior_counts(tmp_path):
    labels = {"a": np.array([0, 0, 1]), "b": np.array([2, 1])}
    c = features.compute_prior_counts(labels, 4)
    np.testing.assert_allclose(c, [2, 2, 1, 0])
    p = str(tmp_path / "counts")
    features.write_prior_counts(c, p)
    np.testing.assert_allclose(kaldi_io.load_counts(p), [2, 2, 1, 0])


def _write_kaldi_binary_tmodel(path, kind="Tuples"):
    """Emit a minimal binary Kaldi TransitionModel: 2 phones, 2-state
    HMM topology (self-loop + forward per emitting state)."""
    import struct

    def tok(t):
        return t.encode() + b" "

    def bint(v):
        return b"\x04" + struct.pack("<i", v)

    def bfloat(v):
        return b"\x04" + struct.pack("<f", v)

    def ivec(vals):
        return bint(len(vals)) + b"".join(bint(v) for v in vals)

    buf = b"\x00B" + tok("<TransitionModel>") + tok("<Topology>")
    buf += ivec([1, 2])                  # phones
    buf += ivec([-1, 0, 0])              # phone2idx (index by phone id)
    buf += bint(1)                       # one topology entry (is_hmm)
    # entry: 3 states (2 emitting + final)
    buf += bint(3)
    for s in range(2):
        buf += bint(s)                   # forward pdf_class
        buf += bint(2)                   # 2 transitions
        buf += bint(s) + bfloat(0.5)     # self loop
        buf += bint(s + 1) + bfloat(0.5)  # advance
    buf += bint(-2) + bint(0)            # final state: kNoPdf(-2), 0 transitions
    buf += tok("</Topology>")
    if kind == "Tuples":
        buf += tok("<Tuples>") + bint(4)
        # (phone, hmm_state, fwd_pdf, self_pdf)
        for phone in (1, 2):
            for s in range(2):
                pdf = (phone - 1) * 2 + s
                buf += bint(phone) + bint(s) + bint(pdf) + bint(pdf)
        buf += tok("</Tuples>")
    else:
        buf += tok("<Triples>") + bint(4)
        for phone in (1, 2):
            for s in range(2):
                pdf = (phone - 1) * 2 + s
                buf += bint(phone) + bint(s) + bint(pdf)
        buf += tok("</Triples>")
    buf += tok("<LogProbs>") + b"FV " + bint(0) + tok("</LogProbs>")
    buf += tok("</TransitionModel>")
    with open(path, "wb") as f:
        f.write(buf)


@pytest.mark.parametrize("kind", ["Tuples", "Triples"])
def test_transition_model_kaldi_binary(tmp_path, kind):
    p = str(tmp_path / "final.mdl")
    _write_kaldi_binary_tmodel(p, kind)
    tm = features.TransitionModel.from_kaldi_binary(p)
    assert tm.num_pdfs == 4
    assert tm.num_phones == 2
    # 4 tuples x 2 transitions = 8 tids
    assert len(tm.tid2pdf) == 9
    np.testing.assert_array_equal(tm.tid2pdf[1:], [0, 0, 1, 1, 2, 2, 3, 3])
    np.testing.assert_array_equal(tm.tid2phone[1:], [1, 1, 1, 1, 2, 2, 2, 2])
    # loader sniffs binary automatically
    tm2 = features.TransitionModel.load(p)
    np.testing.assert_array_equal(tm2.tid2pdf, tm.tid2pdf)
