"""Real-bytes HCLG interop (VERDICT round-3 item 5): an externally-built
Kaldi-style package — BINARY ``final.mdl`` (transition model in Kaldi's
wire format: \\0B marker, space-terminated tokens, sized basic types,
counted integer vectors; semantics of hmm-topology.cc /
transition-model.cc) + an OpenFst const-format HCLG whose ilabels are
TRANSITION-IDS — decodes end-to-end through the production word path:
binary-mdl parse -> tid->pdf remap (decode/decode_dnn.py) -> const-fst
read -> native WFST decode.

Context-dependent graphs need no C expansion on our side: the external
HCLG already encodes the context; the tid->pdf remap is the whole
interop contract. Native CONSTRUCTION supports mono and triphone
(decode/graph.py expand_context, tests/test_triphone.py) and rejects
anything wider explicitly (tested below).
"""
import os
import struct

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.decode import graph as G
from pytorch_kaldi_cgs_tpu.decode import openfst as OF


# ---------------------------------------------------------------------------
# Kaldi binary writers (independent re-implementation of the wire
# format, so the reader is tested against bytes it did not produce)
# ---------------------------------------------------------------------------

def _w_tok(buf, t):
    buf += t.encode() + b" "


def _w_int(buf, v):
    buf += bytes([4]) + struct.pack("<i", v)


def _w_float(buf, v):
    buf += bytes([4]) + struct.pack("<f", v)


def _w_ivec(buf, vec):
    _w_int(buf, len(vec))
    for v in vec:
        _w_int(buf, v)


def write_kaldi_binary_mdl(path, phones, states_per_phone, pdf_of):
    """Binary <TransitionModel> with a Triples-era HMM topology: each
    phone has ``states_per_phone`` emitting states, each with a
    self-loop + forward transition; pdf_of(phone, state) -> pdf id.
    Returns (tid2pdf, tuples) for cross-checking."""
    buf = bytearray(b"\x00B")
    _w_tok(buf, "<TransitionModel>")
    _w_tok(buf, "<Topology>")
    _w_ivec(buf, phones)
    phone2idx = [-1] * (max(phones) + 1)
    for p in phones:
        phone2idx[p] = 0                 # all phones share entry 0
    _w_ivec(buf, phone2idx)
    _w_int(buf, 1)                       # one topology entry
    _w_int(buf, states_per_phone + 1)    # + final non-emitting state
    for s in range(states_per_phone):
        _w_int(buf, s)                   # pdf-class (hmm style)
        _w_int(buf, 2)                   # two transitions
        _w_int(buf, s)                   # self loop
        _w_float(buf, 0.5)
        _w_int(buf, s + 1)               # forward
        _w_float(buf, 0.5)
    _w_int(buf, -1)                      # final state: pdf-class none
    _w_int(buf, 0)                       # no transitions
    _w_tok(buf, "</Topology>")
    tuples = [(p, s) for p in phones for s in range(states_per_phone)]
    _w_tok(buf, "<Triples>")
    _w_int(buf, len(tuples))
    for p, s in tuples:
        _w_int(buf, p)
        _w_int(buf, s)
        _w_int(buf, pdf_of(p, s))
    _w_tok(buf, "</Triples>")
    _w_tok(buf, "<LogProbs>")
    buf += b"FV " + bytes([4]) + struct.pack(
        "<i", 2 * len(tuples) + 1) + b"\x00" * 4 * (2 * len(tuples) + 1)
    _w_tok(buf, "</LogProbs>")
    _w_tok(buf, "</TransitionModel>")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    # tid layout: per tuple in order, [self, forward]
    tid2pdf = [-1]
    for p, s in tuples:
        tid2pdf += [pdf_of(p, s), pdf_of(p, s)]
    return np.asarray(tid2pdf, np.int32), tuples


def write_const_fst(path, fst):
    """OpenFst const-fst binary layout (header + 16-byte-aligned
    state/arc arrays) — the format real HCLG.fst files ship in."""
    order = np.argsort(fst.src, kind="stable")
    arcs = fst.arcs[order]
    counts = np.bincount(fst.src, minlength=fst.num_states)
    offs = np.concatenate([[0], np.cumsum(counts)])
    with open(path, "wb") as f:
        f.write(struct.pack("<i", OF.FST_MAGIC))
        for s in ("const", "standard"):
            b = s.encode()
            f.write(struct.pack("<i", len(b)) + b)
        f.write(struct.pack("<ii", 2, 0))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<qqq", fst.start, fst.num_states,
                            fst.num_arcs))
        f.write(b"\0" * ((-f.tell()) % 16))
        states = np.zeros(fst.num_states, OF._CONST_STATE_DTYPE)
        states["final"] = fst.final
        states["pos"] = offs[:-1]
        states["narcs"] = counts
        f.write(states.tobytes())
        f.write(b"\0" * ((-f.tell()) % 16))
        f.write(arcs.tobytes())


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_binary_mdl_parses_and_maps_tids(tmp_path):
    from pytorch_kaldi_cgs_tpu.data.features import TransitionModel
    mdl = str(tmp_path / "final.mdl")
    phones = [1, 2, 3]
    tid2pdf, _ = write_kaldi_binary_mdl(
        mdl, phones, 2, lambda p, s: 2 * (p - 1) + s)
    tm = TransitionModel.from_kaldi_binary(mdl)
    np.testing.assert_array_equal(tm.tid2pdf, tid2pdf)
    assert tm.num_pdfs == 6
    # tid->phone too (ali-to-phones role)
    assert tm.tid2phone[1] == 1 and tm.tid2phone[-1] == 3


def test_external_hclg_with_tid_ilabels_decodes(tmp_path):
    """End-to-end: graph dir holding ONLY {HCLG.fst (const, tid
    ilabels), words.txt, final.mdl (binary)} — exactly what a Kaldi
    prepare+mkgraph leaves behind — decodes the right words through
    decode_dnn's remap path (decode/decode_dnn.py:113-122)."""
    N = pytest.importorskip("pytorch_kaldi_cgs_tpu.native")
    if not N.available():
        pytest.skip("native lib unavailable")
    from pytorch_kaldi_cgs_tpu.data import kaldi_io
    from pytorch_kaldi_cgs_tpu.decode.decode_dnn import decode_dnn

    gdir = tmp_path / "graph"
    gdir.mkdir()
    phones = [1, 2, 3]
    spp = 2
    tid2pdf, tuples = write_kaldi_binary_mdl(
        str(gdir / "final.mdl"), phones, spp,
        lambda p, s: spp * (p - 1) + s)

    # build a word graph with our builder (pdf+1 ilabels), then REWRITE
    # ilabels to transition-ids — the external-graph convention
    lex = {"go": [[0, 1]], "stop": [[2, 1, 0]]}   # 0-based phone ids
    wids = {"go": 1, "stop": 2}
    hclg = G.build_word_graph(lex, wids, states_per_phone=spp)
    pdf2tid = {}
    for tid in range(1, len(tid2pdf)):
        pdf2tid.setdefault(int(tid2pdf[tid]), tid)
    il = hclg.arcs["ilabel"]
    nz = il > 0
    il[nz] = np.asarray([pdf2tid[p - 1] for p in il[nz]], np.int32)
    write_const_fst(str(gdir / "HCLG.fst"), hclg)
    OF.write_symbol_table(str(gdir / "words.txt"),
                          {"<eps>": 0, "go": 1, "stop": 2})

    # posteriors spelling "stop go": phone seq 2,1,0 then 0,1
    pdfs = []
    for ph in (2, 1, 0, 0, 1):
        for s in range(spp):
            pdfs += [spp * ph + s] * 2
    ll = np.full((len(pdfs), 6), -8.0, np.float32)
    for t, p in enumerate(pdfs):
        ll[t, p] = 0.0
    ark = str(tmp_path / "post.ark")
    kaldi_io.write_mat(ark, ll, key="u1")
    (tmp_path / "text").write_text("u1 stop go\n")

    res = decode_dnn(str(tmp_path / "dec"), ark, str(gdir),
                     str(tmp_path / "text"), acwt=1.0, beam=30.0)
    assert res["wer"] == pytest.approx(0.0), \
        "tid-labeled external HCLG did not decode through the remap"


def test_native_construction_rejects_unknown_context(tmp_path):
    """Native construction now supports mono AND tri (round 5,
    tests/test_triphone.py); anything else still fails loudly with a
    pointer at the external-HCLG path instead of silently building
    the wrong graph."""
    lex = {"a": [[0]]}
    with pytest.raises(NotImplementedError, match="context"):
        G.build_word_graph(lex, {"a": 1}, states_per_phone=1,
                           context="quinphone")
    # triphone builds (context machinery lives in expand_context)
    tri = G.build_word_graph(lex, {"a": 1}, states_per_phone=1,
                             context="triphone")
    assert tri.num_arcs > 0
