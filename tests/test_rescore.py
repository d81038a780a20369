"""Lattice LM rescoring (decode/rescore.py): the fglarge-class second
pass of the reference's LibriSpeech table (ref: README.md:278-283).

Core property: on an acoustically ambiguous task (two words with
IDENTICAL pronunciations) the first-pass unigram graph picks one word;
rescoring the LATTICE with a bigger (bigram) LM flips the decoded word
sequence — without re-decoding. Plus invariants: rescoring with the
first-pass LM itself is a no-op, and the ArpaLM backoff scorer matches
hand-computed ARPA scores.
"""
import math

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.decode import graph as G
from pytorch_kaldi_cgs_tpu.decode.rescore import LOG10, ArpaLM, \
    lm_rescore_lattice

OLD_ARPA = """
\\data\\
ngram 1=5

\\1-grams:
-0.30 </s>
-99 <s> -0.30
-0.25 ca -0.30
-0.35 aa -0.30
-0.85 bb -0.30

\\end\\
"""

# bigram LM: after "ca", "bb" is strongly preferred over "aa"
NEW_ARPA = """
\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.30 </s>
-99 <s> -0.30
-0.25 ca -0.30
-0.90 aa -0.30
-0.90 bb -0.30

\\2-grams:
-2.00 ca aa
-0.05 ca bb

\\end\\
"""


@pytest.fixture()
def lms(tmp_path):
    old_p = tmp_path / "old.arpa"
    new_p = tmp_path / "new.arpa"
    old_p.write_text(OLD_ARPA)
    new_p.write_text(NEW_ARPA)
    return str(old_p), str(new_p)


def test_arpa_lm_backoff_scoring(lms):
    old_p, new_p = lms
    lm = ArpaLM(new_p)
    # exact bigram
    assert lm.logp(("ca",), "bb") == pytest.approx(-0.05 * LOG10)
    # backoff: P(ca|bb) = bow(bb) * P(ca) = -0.30 + -0.25 (log10)
    assert lm.logp(("bb",), "ca") == pytest.approx((-0.30 - 0.25) * LOG10)
    # unigram model ignores history
    uni = ArpaLM(old_p)
    assert uni.logp(("ca",), "aa") == pytest.approx(-0.35 * LOG10)


def _decode_lattice(lms_old):
    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")
    # ca = phone 2; aa and bb share the pronunciation [0, 1]
    lex = {"ca": [[2]], "aa": [[0, 1]], "bb": [[0, 1]]}
    wids = {"ca": 1, "aa": 2, "bb": 3}
    hclg = G.build_word_graph(lex, wids, states_per_phone=1,
                              arpa_path=lms_old)
    fst = N.NativeFst.from_data(hclg)
    pdf_seq = [2, 2, 0, 0, 1, 1]
    ll = np.full((len(pdf_seq), 3), -8.0, np.float32)
    for t, p in enumerate(pdf_seq):
        ll[t, p] = 0.0
    lat = fst.decode_lattice(ll, beam=30.0, lat_beam=25.0, acwt=1.0)
    return lat, wids


def test_bigger_lm_flips_word_sequence(lms):
    old_p, new_p = lms
    lat, wids = _decode_lattice(old_p)
    syms = {v: k for k, v in wids.items()}

    # first pass: unigram prefers "ca aa"
    assert lat.best_path(1.0) == [wids["ca"], wids["aa"]]

    old_lm, new_lm = ArpaLM(old_p), ArpaLM(new_p)
    words, cost = lm_rescore_lattice(lat, syms, old_lm, new_lm)
    assert words == [wids["ca"], wids["bb"]], \
        "bigram rescore should flip aa -> bb after ca"
    assert math.isfinite(cost)


def test_rescoring_with_first_pass_lm_is_noop(lms):
    old_p, _ = lms
    lat, wids = _decode_lattice(old_p)
    syms = {v: k for k, v in wids.items()}
    old_lm = ArpaLM(old_p)
    words, _ = lm_rescore_lattice(lat, syms, old_lm, old_lm)
    assert words == lat.best_path(1.0)


def test_decode_dnn_rescore_integration(lms, tmp_path):
    """Production surface: decode_dnn(rescore_arpa=...) decodes
    lattices and LM-rescored hypotheses flow into scoring — the
    [decoding] rescore_arpa config path."""
    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")
    from pytorch_kaldi_cgs_tpu.data import kaldi_io
    from pytorch_kaldi_cgs_tpu.decode.decode_dnn import decode_dnn

    old_p, new_p = lms
    gdir = tmp_path / "graph"
    gdir.mkdir()
    (gdir / "words.txt").write_text(
        "<eps> 0\nca 1\naa 2\nbb 3\n")
    (gdir / "lexicon.txt").write_text("ca 2\naa 0 1\nbb 0 1\n")
    (gdir / "graph.json").write_text(
        '{"type": "word", "states_per_phone": 1}')
    (gdir / "lm.arpa").write_text(OLD_ARPA)

    pdf_seq = [2, 2, 0, 0, 1, 1]
    ll = np.full((len(pdf_seq), 3), -8.0, np.float32)
    for t, p in enumerate(pdf_seq):
        ll[t, p] = 0.0
    ark = str(tmp_path / "post.ark")
    kaldi_io.write_mat(ark, ll, key="utt1")
    text = str(tmp_path / "text")
    with open(text, "w") as f:
        f.write("utt1 ca bb\n")

    # first pass alone decodes "ca aa" -> WER 50; rescored -> 0
    res_first = decode_dnn(str(tmp_path / "dec1"), ark, str(gdir), text,
                           acwt=1.0, beam=30.0)
    assert res_first["wer"] == pytest.approx(50.0)
    res = decode_dnn(str(tmp_path / "dec2"), ark, str(gdir), text,
                     acwt=1.0, beam=30.0, rescore_arpa=new_p)
    assert res["wer"] == pytest.approx(0.0)


def test_lm_scale_sweep_changes_tradeoff(lms):
    """lm_scale sweeps the acoustic/LM balance of the SECOND-pass LM —
    the lattice-rescoring analog of the reference's lmwt loop."""
    old_p, new_p = lms
    lat, wids = _decode_lattice(old_p)
    syms = {v: k for k, v in wids.items()}
    old_lm, new_lm = ArpaLM(old_p), ArpaLM(new_p)
    # with near-zero LM weight the acoustics tie and the first-pass
    # (old-LM-free) graph costs decide; with full weight bb wins
    w_hi, _ = lm_rescore_lattice(lat, syms, old_lm, new_lm, lm_scale=1.0)
    assert w_hi == [wids["ca"], wids["bb"]]
    w_scaled, cost = lm_rescore_lattice(lat, syms, old_lm, new_lm,
                                        lm_scale=3.0)
    assert w_scaled == [wids["ca"], wids["bb"]]
    assert math.isfinite(cost)
