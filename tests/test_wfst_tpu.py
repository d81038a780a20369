"""On-TPU dense WFST Viterbi (decode/wfst_tpu.py) vs the native C++
token passer: identical best paths on the phone-loop graph AND on a
word-level HCLG with epsilon (backoff/boundary) arcs."""
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu import native as N
from pytorch_kaldi_cgs_tpu.decode.wfst_tpu import TpuWfstDecoder

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native library unavailable")


def _fst_data_from_text(path):
    from pytorch_kaldi_cgs_tpu.decode.openfst import read_fst_text
    return read_fst_text(path)


def test_phone_loop_matches_native(tmp_path):
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 5, 2)
    data = _fst_data_from_text(fst_path)
    nat = N.NativeFst(fst_path)
    dec = TpuWfstDecoder(data)
    rng = np.random.RandomState(3)
    for i in range(4):
        T = rng.randint(20, 70)
        ll = np.log(rng.dirichlet(np.ones(10) * 0.3,
                                  size=T)).astype(np.float32)
        ref = nat.decode(ll, beam=80.0, max_active=0, acwt=1.0)
        hyp = dec.decode(ll, acwt=1.0)
        assert hyp == ref, "utt %d" % i


def test_word_graph_with_eps_matches_native(tmp_path):
    """L·G word graph (built by decode.graph: HMM expansion + backoff
    bigram G with eps backoff arcs) — the eps fixpoint passes must
    reproduce the native decoder's within-frame eps closure."""
    from pytorch_kaldi_cgs_tpu.decode.graph import build_word_graph
    lexicon = {"ab": [[0, 1]], "ba": [[1, 0]], "aa": [[0, 0]]}
    word_ids = {"ab": 1, "ba": 2, "aa": 3}
    arpa = None
    hclg = build_word_graph(lexicon, word_ids, states_per_phone=2,
                            arpa_path=arpa)
    assert (hclg.arcs["ilabel"] == 0).any(), \
        "fixture should contain eps arcs"
    nat = N.NativeFst.from_data(hclg)
    dec = TpuWfstDecoder(hclg)
    n_pdf = int(hclg.arcs["ilabel"].max())
    rng = np.random.RandomState(9)
    agree = 0
    for i in range(4):
        T = rng.randint(16, 48)
        ll = np.log(rng.dirichlet(np.ones(n_pdf) * 0.4,
                                  size=T)).astype(np.float32)
        ref = nat.decode(ll, beam=200.0, max_active=0, acwt=1.0)
        hyp = dec.decode(ll, acwt=1.0)
        assert hyp == ref, "utt %d: %r vs %r" % (i, hyp, ref)
        agree += 1
    assert agree == 4


def test_batched_and_padding_invariance(tmp_path):
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    data = _fst_data_from_text(fst_path)
    dec = TpuWfstDecoder(data)
    rng = np.random.RandomState(5)
    mats = [np.log(rng.dirichlet(np.ones(8) * 0.3,
                                 size=rng.randint(10, 40))).astype(np.float32)
            for _ in range(5)]
    a = dec.decode_batch(mats, acwt=1.0)
    b = [dec.decode(m, acwt=1.0, pad_to=64) for m in mats]
    assert a == b


def test_decode_dnn_tpu_wfst_engine(tmp_path):
    """decode_dnn(engine='tpu-wfst') runs the full scoring path and
    matches the native engine's WER on the phone loop."""
    import json
    import os
    from pytorch_kaldi_cgs_tpu.data.kaldi_io import ArkScpWriter
    from pytorch_kaldi_cgs_tpu.decode.decode_dnn import decode_dnn

    graph = tmp_path / "graph"
    graph.mkdir()
    (graph / "graph.json").write_text(json.dumps(
        {"type": "phone_loop", "num_phones": 4, "states_per_phone": 2}))
    rng = np.random.RandomState(2)
    refs = {}
    w = ArkScpWriter(str(tmp_path / "post.ark"), str(tmp_path / "post.scp"))
    for u in range(6):
        phones = rng.randint(0, 4, size=rng.randint(3, 6))
        pdfs = []
        for p in phones:
            for k in range(rng.randint(4, 8)):
                pdfs.append(p * 2 + (k > 2))
        ll = np.full((len(pdfs), 8), -6.0, np.float32)
        ll[np.arange(len(pdfs)), pdfs] = -0.05
        key = "utt%03d" % u
        w.write(key, ll)
        refs[key] = phones.tolist()
    w.close()
    with open(tmp_path / "text", "w") as f:
        for k, ph in refs.items():
            f.write(k + " " + " ".join(str(p) for p in ph) + "\n")

    outs = {}
    for eng in ("native", "tpu-wfst"):
        out = tmp_path / ("dec_" + eng)
        res = decode_dnn(str(out), str(tmp_path / "post.ark"), str(graph),
                         str(tmp_path / "text"), engine=eng, acwt=1.0,
                         beam=100.0, max_active=0)
        outs[eng] = res["wer"]
        assert os.path.exists(out / "hyp.txt")
    assert outs["tpu-wfst"] == outs["native"]
    assert outs["tpu-wfst"] < 20.0


def test_decode_conf_sharp_posteriors_high_confidence(tmp_path):
    """On-device confidences (decode_batch_conf): sharp posteriors give
    word confidences near 1 and the same labels as decode_batch."""
    from pytorch_kaldi_cgs_tpu.decode.graph import build_word_graph
    lexicon = {"ab": [[0, 1]], "ba": [[1, 0]]}
    word_ids = {"ab": 1, "ba": 2}
    hclg = build_word_graph(lexicon, word_ids, 2)
    dec = TpuWfstDecoder(hclg)
    # pdfs: phone p state k -> p*2+k; say 'ab' sharply: 0,1 then 2,3
    ll = np.full((8, 4), -12.0, np.float32)
    for t, p in enumerate([0, 1, 1, 2, 3, 3, 3, 3]):
        ll[t, p] = -0.05
    (labels, confs), = dec.decode_batch_conf([ll], acwt=1.0)
    assert labels == dec.decode(ll, acwt=1.0) == [1]
    assert len(confs) == 1 and confs[0] > 0.8


def test_decode_conf_ambiguity_lowers_confidence(tmp_path):
    """Two near-equally-likely words: confidence drops toward 0.5."""
    from pytorch_kaldi_cgs_tpu.decode.graph import build_word_graph
    # homophone-ish pair: same first phone, ambiguous second
    lexicon = {"aa": [[0, 0]], "ab": [[0, 1]]}
    word_ids = {"aa": 1, "ab": 2}
    hclg = build_word_graph(lexicon, word_ids, 2)
    dec = TpuWfstDecoder(hclg)
    ll = np.full((8, 4), -12.0, np.float32)
    # phone 0 frames sharp; second phone frames split between pdfs of
    # phone 0 (0,1) and phone 1 (2,3) almost evenly
    for t, p in enumerate([0, 1, 1, 1]):
        ll[t, p] = -0.05
    for t in range(4, 8):
        ll[t, 0] = -0.70   # phone 0 continuation
        ll[t, 2] = -0.75   # phone 1 nearly as likely
    (labels, confs), = dec.decode_batch_conf([ll], acwt=1.0)
    assert labels is not None and len(labels) == 1
    assert confs[0] < 0.9   # genuinely uncertain
    # and a failed decode still reports None
    bad = np.full((4, 4), np.float32(-1e30))
    assert dec.decode_batch_conf([bad], acwt=1.0)[0] is None


def test_forward_backward_exact_vs_numpy(tmp_path):
    """logZ and per-frame path posteriors vs an independent dense
    log-semiring DP in numpy (eps-free graph, exact comparison)."""
    from pytorch_kaldi_cgs_tpu.decode.openfst import FstData, _ARC_DTYPE
    # 3-state chain with a parallel arc: s0 -a0-> s1 -a1/a2-> s2(final)
    arcs = np.zeros(4, _ARC_DTYPE)
    src = np.array([0, 1, 1, 2], np.int32)
    arcs["ilabel"] = [1, 2, 3, 1]
    arcs["olabel"] = [0, 5, 6, 0]
    arcs["nextstate"] = [1, 2, 2, 0]
    arcs["weight"] = [0.3, 0.9, 0.4, 0.7]
    final = np.full(3, np.inf, np.float32)
    final[2] = 0.2
    fst = FstData(start=0, final=final, src=src, arcs=arcs)
    dec = TpuWfstDecoder(fst)
    rng = np.random.RandomState(0)
    T = 5
    ll = np.log(rng.dirichlet(np.ones(3), size=T)).astype(np.float32)

    # independent numpy forward (log semiring over the same arc table)
    alpha = np.full(3, -np.inf)
    alpha[0] = 0.0
    for t in range(T):
        na = np.full(3, -np.inf)
        for a in range(4):
            lp = ll[t, arcs["ilabel"][a] - 1] - arcs["weight"][a]
            na[arcs["nextstate"][a]] = np.logaddexp(
                na[arcs["nextstate"][a]], alpha[src[a]] + lp)
        alpha = na
    fin = np.where(np.isfinite(final), final, 1e30)
    logZ_np = np.logaddexp.reduce(alpha - fin)

    fb = dec._get_fb(8)
    import jax.numpy as jnp
    llp = np.zeros((8, 3), np.float32)
    llp[:T] = ll
    alphas, betas, logZ = fb(jnp.asarray(llp), T, 1.0)
    np.testing.assert_allclose(float(logZ), logZ_np, rtol=1e-5)
    # beta consistency: alpha_t + beta_t summed over states == logZ
    for t in range(T):
        tot = np.logaddexp.reduce(np.asarray(alphas[t]) +
                                  np.asarray(betas[t]))
        np.testing.assert_allclose(tot, logZ_np, rtol=1e-4)
