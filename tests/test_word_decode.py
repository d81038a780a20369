"""Word-level (HCLG-class) decoding: OpenFst binary I/O, graph
construction (lexicon + grammar -> pdf-level decoding graph), ARPA
grammars, and the end-to-end synthetic word task (VERDICT round-2
item 2). Reference capability: decoding against a composed HCLG with
latgen-faster-mapped (ref: kaldi_decoding_scripts/decode_dnn.sh:84)."""
import os
import struct

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.decode import graph as G
from pytorch_kaldi_cgs_tpu.decode import openfst as OF


def _toy_graph():
    lex = {"ab": [[0, 1]], "ba": [[1, 0]], "aab": [[0, 0, 1]]}
    wids = {"ab": 1, "ba": 2, "aab": 3}
    return G.build_word_graph(lex, wids, states_per_phone=2), wids


def test_openfst_vector_roundtrip(tmp_path):
    hclg, _ = _toy_graph()
    p = str(tmp_path / "g.fst")
    OF.write_fst(p, hclg)
    back = OF.read_fst(p)
    assert back.start == hclg.start
    assert back.num_states == hclg.num_states
    assert back.num_arcs == hclg.num_arcs
    np.testing.assert_array_equal(np.sort(back.arcs), np.sort(hclg.arcs))
    np.testing.assert_allclose(back.final, hclg.final)


def test_openfst_const_format(tmp_path):
    """Read the const-fst layout (header + 16-byte-aligned state/arc
    arrays); the file is synthesized here per the documented format."""
    hclg, _ = _toy_graph()
    p = str(tmp_path / "g_const.fst")
    order = np.argsort(hclg.src, kind="stable")
    arcs = hclg.arcs[order]
    counts = np.bincount(hclg.src, minlength=hclg.num_states)
    offs = np.concatenate([[0], np.cumsum(counts)])
    with open(p, "wb") as f:
        f.write(struct.pack("<i", OF.FST_MAGIC))
        for s in ("const", "standard"):
            b = s.encode()
            f.write(struct.pack("<i", len(b)) + b)
        f.write(struct.pack("<ii", 2, 0))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<qqq", hclg.start, hclg.num_states,
                            hclg.num_arcs))
        pad = (-f.tell()) % 16
        f.write(b"\0" * pad)
        states = np.zeros(hclg.num_states, OF._CONST_STATE_DTYPE)
        states["final"] = hclg.final
        states["pos"] = offs[:-1]
        states["narcs"] = counts
        f.write(states.tobytes())
        pad = (-f.tell()) % 16
        f.write(b"\0" * pad)
        f.write(arcs.tobytes())
    back = OF.read_fst(p)
    assert back.num_states == hclg.num_states
    assert back.num_arcs == hclg.num_arcs
    np.testing.assert_array_equal(np.sort(back.arcs), np.sort(hclg.arcs))


def test_symbol_table_roundtrip(tmp_path):
    p = str(tmp_path / "words.txt")
    syms = {"<eps>": 0, "hello": 1, "world": 2}
    OF.write_symbol_table(p, syms)
    assert OF.read_symbol_table(p) == syms
    assert OF.invert_symbols(syms)[2] == "world"


def test_word_graph_native_decode():
    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")
    hclg, wids = _toy_graph()
    fst = N.NativeFst.from_data(hclg)
    # frames spelling "ab ba": phone a = pdfs 0,1; b = pdfs 2,3
    pdf_seq = [0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3, 0, 0, 1, 1]
    ll = np.full((len(pdf_seq), 6), -10.0, np.float32)
    for t, p in enumerate(pdf_seq):
        ll[t, p] = 0.0
    assert fst.decode(ll, beam=20.0, acwt=1.0) == [wids["ab"], wids["ba"]]


def test_arpa_grammar_prefers_likely_sequences(tmp_path):
    """Bigram ARPA: acoustically ambiguous input resolves to the
    higher-probability word sequence through the grammar costs."""
    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")
    arpa = str(tmp_path / "lm.arpa")
    with open(arpa, "w") as f:
        f.write("""
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.30 </s>
-99 <s> -0.30
-0.30 aa -0.30
-0.30 bb -0.30

\\2-grams:
-0.05 <s> aa
-0.05 aa bb
-1.50 aa aa

\\end\\
""")
    # two words with IDENTICAL pronunciations -> only the LM separates
    lex = {"aa": [[0]], "bb": [[0]]}
    wids = {"aa": 1, "bb": 2}
    hclg = G.build_word_graph(lex, wids, states_per_phone=1,
                              arpa_path=arpa)
    fst = N.NativeFst.from_data(hclg)
    ll = np.zeros((4, 1), np.float32)   # two segments of phone 0... any path
    out = fst.decode(ll, beam=30.0, acwt=1.0)
    # P(<s> aa) >> P(<s> bb) (unseen bigram backs off), and
    # P(bb | aa) >> P(aa | aa): expect aa first, bb for later words
    assert out[0] == wids["aa"]
    assert all(w == wids["bb"] for w in out[1:]) or len(out) == 1


def test_end_to_end_word_task(tmp_path):
    """LibriSpeech-class capability on synthetic data: train an acoustic
    model, forward, decode through the native WFST decoder against the
    built word graph, and score word-level WER (beats chance easily)."""
    import glob

    from pytorch_kaldi_cgs_tpu.data import synth
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg

    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")

    root = str(tmp_path / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=24, num_phones=6, states_per_phone=2, feat_dim=8,
        min_len=40, max_len=90, noise=0.4, seed=7, lexicon_size=12))
    # graph dir advertises the word task
    assert os.path.exists(os.path.join(root, "graph", "lexicon.txt"))
    assert os.path.exists(os.path.join(root, "graph", "words.txt"))

    out_folder = str(tmp_path / "exp")
    cfg = make_synth_cfg(str(tmp_path / "word.cfg"), root, out_folder,
                         model="MLP", hidden=48, n_epochs=2, n_chunks=2,
                         batch_size=128, lr=0.06, cw=1, lmwt_sweep=False)
    results = run_exp(cfg)
    wer_key = [k for k in results if k.startswith("wer_")]
    assert wer_key, "word decoding did not run"
    assert 0 <= results[wer_key[0]] < 50.0
    # the cached graph was built and is a real OpenFst binary
    hclg = os.path.join(root, "graph", "HCLG.fst")
    assert os.path.exists(hclg)
    data = OF.read_fst(hclg)
    assert data.num_arcs > 0
