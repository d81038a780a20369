"""Decoding-graph construction: lexicon + grammar -> HCLG-equivalent.

The reference delegates graph building to Kaldi's lexicon/LM tooling
(ref: kaldi_decoding_scripts/utils/make_lexicon_fst.pl,
utils/format_lm.sh) and decodes against the composed HCLG
(ref: kaldi_decoding_scripts/decode_dnn.sh:84). This module builds the
equivalent graph natively for monophone-style models:

  G   : word grammar — unigram loop, or n-gram FST with backoff arcs
        from an ARPA LM (:func:`grammar_from_arpa`);
  L∘G : each word arc substituted by its lexicon phone sequence
        (:func:`compose_lg`) — valid because L is a deterministic
        sequence per pronunciation (multiple prons = multiple arcs);
  HCLG: each phone arc expanded into its left-to-right HMM pdf chain
        with self-loops, ilabel = pdf+1 (:func:`expand_hmm`), matching
        the native decoder's input convention (native/src/decoder.cc).

All graphs are FstData arc tables (decode.openfst) writable as text for
the native decoder or as OpenFst binary for interchange.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .openfst import _ARC_DTYPE, FstData

LOG10 = math.log(10.0)


class _Builder:
    """Incremental FST builder."""

    def __init__(self):
        self.arcs: List[Tuple[int, int, int, float, int]] = []  # s,il,ol,w,d
        self.final: Dict[int, float] = {}
        self.n = 0

    def state(self) -> int:
        s = self.n
        self.n += 1
        return s

    def arc(self, s: int, il: int, ol: int, w: float, d: int) -> None:
        self.arcs.append((s, il, ol, w, d))

    def set_final(self, s: int, w: float = 0.0) -> None:
        self.final[s] = w

    def build(self, start: int = 0) -> FstData:
        final = np.full(max(self.n, 1), np.inf, np.float32)
        for s, w in self.final.items():
            final[s] = w
        src = np.asarray([a[0] for a in self.arcs], np.int32)
        arcs = np.zeros(len(self.arcs), _ARC_DTYPE)
        for i, (s, il, ol, w, d) in enumerate(self.arcs):
            arcs[i] = (il, ol, w, d)
        return FstData(start=start, final=final, src=src, arcs=arcs)


# ---------------------------------------------------------------------------
# grammars
# ---------------------------------------------------------------------------

def unigram_grammar(word_ids: Sequence[int],
                    probs: Optional[Sequence[float]] = None) -> FstData:
    """Single-state word loop; cost = -log P(w) (uniform by default)."""
    b = _Builder()
    s = b.state()
    n = len(word_ids)
    for i, w in enumerate(word_ids):
        p = probs[i] if probs is not None else 1.0 / n
        b.arc(s, w, w, -math.log(max(p, 1e-30)), s)
    b.set_final(s)
    return b.build(start=s)


def parse_arpa(path: str) -> Dict[int, Dict[Tuple[str, ...],
                                            Tuple[float, float]]]:
    """ARPA text LM -> {order: {ngram words: (log10prob, log10backoff)}}."""
    grams: Dict[int, Dict] = {}
    order = 0
    section = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("\\") and "-grams:" in line:
                order = int(line.strip("\\").split("-")[0])
                grams[order] = {}
                section = order
                continue
            if line.startswith("\\"):
                section = None
                continue
            if section:
                parts = line.split()
                logp = float(parts[0])
                words = tuple(parts[1:1 + section])
                backoff = (float(parts[1 + section])
                           if len(parts) > 1 + section else 0.0)
                grams[section][words] = (logp, backoff)
    return grams


def grammar_from_arpa(arpa_path: str, word_ids: Dict[str, int]) -> FstData:
    """Backoff n-gram grammar FST (standard construction: one state per
    seen history, word arcs advance the history, eps backoff arcs drop
    its oldest word; <s>/</s> mapped to start/final)."""
    grams = parse_arpa(arpa_path)
    max_order = max(grams)
    states: Dict[Tuple[str, ...], int] = {}
    b = _Builder()

    def state_for(hist: Tuple[str, ...]) -> int:
        while hist and hist not in _hist_set:
            hist = hist[1:]
        if hist not in states:
            states[hist] = b.state()
        return states[hist]

    # histories = all ngrams of order < max that carry a backoff weight
    # or prefix longer ngrams, plus the empty history
    _hist_set = {()}
    for o in range(1, max_order):
        for words in grams.get(o, {}):
            _hist_set.add(words)

    start_hist = ("<s>",) if ("<s>",) in _hist_set else ()
    start = state_for(start_hist)

    for o in range(1, max_order + 1):
        for words, (logp, backoff) in grams[o].items():
            hist, w = words[:-1], words[-1]
            if hist and hist not in _hist_set:
                continue
            src = state_for(hist)
            cost = -logp * LOG10
            if w == "</s>":
                b.set_final(src, cost)
                continue
            if w == "<s>":
                # only carries backoff weight for the start history
                continue
            if w not in word_ids:
                continue
            nh = words if o < max_order else words[1:]
            dst = state_for(nh)
            b.arc(src, word_ids[w], word_ids[w], cost, dst)
    # backoff eps arcs
    for o in range(1, max_order):
        for words, (logp, backoff) in grams[o].items():
            if words in states and words != ():
                lower = state_for(words[1:])
                b.arc(states[words], 0, 0, -backoff * LOG10, lower)
    fst = b.build(start=start)
    return fst


# ---------------------------------------------------------------------------
# L o G by substitution + HMM expansion
# ---------------------------------------------------------------------------

def compose_lg(g: FstData, lexicon: Dict[int, List[List[int]]]) -> FstData:
    """Replace every word arc of G with its pronunciation phone chain(s).

    lexicon: word id -> list of pronunciations (phone-id sequences,
    0-based phone ids). The first phone arc carries the word olabel;
    eps (backoff) arcs pass through. Result: ilabel = phone+1,
    olabel = word id.
    """
    b = _Builder()
    # keep G's states as the first `g.num_states` builder states
    for _ in range(g.num_states):
        b.state()
    for s, w in enumerate(g.final):
        if np.isfinite(w):
            b.set_final(s, float(w))
    for i in range(g.num_arcs):
        a = g.arcs[i]
        s, d = int(g.src[i]), int(a["nextstate"])
        word = int(a["ilabel"])
        cost = float(a["weight"])
        if word == 0:
            b.arc(s, 0, 0, cost, d)
            continue
        prons = lexicon.get(word)
        if not prons:
            raise KeyError("word id %d has no lexicon entry" % word)
        for pron in prons:
            cur = s
            for j, ph in enumerate(pron):
                nxt = d if j == len(pron) - 1 else b.state()
                b.arc(cur, ph + 1, word if j == 0 else 0,
                      cost if j == 0 else 0.0, nxt)
                cur = nxt
            if not pron:   # empty pronunciation: plain eps arc
                b.arc(s, 0, word, cost, d)
    return b.build(start=g.start)


def expand_hmm(lg: FstData, states_per_phone: int,
               self_loop_prob: float = 0.5) -> FstData:
    """Expand each phone arc (ilabel = phone+1) into the phone's
    left-to-right pdf chain with self-loops; pdf of (phone, k) =
    phone * states_per_phone + k, decoder ilabel = pdf+1 — matching the
    synth transition model (data/synth.py) and the phone-loop graph
    (native.build_phone_loop_fst)."""
    b = _Builder()
    for _ in range(lg.num_states):
        b.state()
    for s, w in enumerate(lg.final):
        if np.isfinite(w):
            b.set_final(s, float(w))
    loop = -math.log(self_loop_prob)
    forward = -math.log(1.0 - self_loop_prob)
    for i in range(lg.num_arcs):
        a = lg.arcs[i]
        s, d = int(lg.src[i]), int(a["nextstate"])
        il, ol, cost = int(a["ilabel"]), int(a["olabel"]), float(a["weight"])
        if il == 0:
            b.arc(s, 0, ol, cost, d)
            continue
        phone = il - 1
        cur = s
        for k in range(states_per_phone):
            pdf = phone * states_per_phone + k
            nxt = b.state()          # dedicated sub-state (owns its loop)
            b.arc(cur, pdf + 1, ol if k == 0 else 0,
                  cost + forward if k == 0 else forward, nxt)
            b.arc(nxt, pdf + 1, 0, loop, nxt)
            cur = nxt
        b.arc(cur, 0, 0, 0.0, d)     # free exit (same pricing as the
        #                              phone loop: cross transitions are
        #                              charged on entry arcs)
    return b.build(start=lg.start)


class MonophoneTying:
    """Context-independent tying: pdf(l, c, r, k) = c * S + k. Makes
    :func:`expand_context` semantically identical to
    :func:`expand_hmm` — the equivalence test for the C machinery."""

    def __init__(self, states_per_phone: int):
        self.S = states_per_phone

    def __call__(self, l: int, c: int, r: int, k: int) -> int:
        return c * self.S + k


class TableTying:
    """Tied-state table: explicit (l, c, r) -> [pdf_0..pdf_{S-1}]
    entries with monophone fallback for unseen triphones — the role of
    Kaldi's decision tree (ref: prepare_lang.sh/mkgraph tree usage),
    table-driven instead of tree-driven. ``table`` keys are
    (l, c, r) tuples with -1 as the boundary context."""

    def __init__(self, states_per_phone: int,
                 table: Dict[Tuple[int, int, int], List[int]]):
        self.S = states_per_phone
        self.table = dict(table)

    def __call__(self, l: int, c: int, r: int, k: int) -> int:
        pdfs = self.table.get((l, c, r))
        if pdfs is None:
            return c * self.S + k
        return pdfs[k]

    @classmethod
    def from_json(cls, path: str) -> "TableTying":
        import json
        with open(path) as f:
            d = json.load(f)
        table = {tuple(int(t) for t in k.split(",")): v
                 for k, v in d["triphones"].items()}
        return cls(int(d["states_per_phone"]), table)


def expand_context(lg: FstData, tying, states_per_phone: int,
                   self_loop_prob: float = 0.5) -> FstData:
    """Triphone (C) expansion + HMM expansion over a phone-level L∘G in
    one pass (VERDICT r4 item 6; the role of Kaldi's C composition in
    mkgraph, ref: kaldi_decoding_scripts/utils/mkgraph-class flow).

    Standard delayed-emission product construction: product states are
    (lg_state, l, c) where ``c`` is the last phone READ but not yet
    emitted and ``l`` its left context (-1 = utterance boundary).
    Reading phone ``r`` on an LG arc emits the HMM pdf chain of the
    triphone (l-c+r) via ``tying(l, c, r, k)`` and advances the context
    to (c, r); eps arcs pass through preserving context; final LG
    states flush the pending phone with right context -1.

    No determinization/minimization is performed (the size cost of the
    raw product is accepted and bounded: reachable context states only,
    built breadth-first). Disambiguation symbols are not needed — they
    exist to make composed lattices determinizable, and nothing here
    determinizes.
    """
    b = _Builder()
    loop = -math.log(self_loop_prob)
    forward = -math.log(1.0 - self_loop_prob)
    BOUND = -1
    # product-state registry, built lazily over reachable states
    states: Dict[Tuple[int, int, int], int] = {}
    from collections import deque
    queue: deque = deque()

    def get(st: Tuple[int, int, int]) -> int:
        if st not in states:
            states[st] = b.state()
            queue.append(st)
        return states[st]

    # arcs grouped by source for the BFS
    order = np.argsort(lg.src, kind="stable")
    arc_of = {}
    for idx in order:
        arc_of.setdefault(int(lg.src[idx]), []).append(int(idx))

    def emit_chain(frm: int, l: int, c: int, r: int, ol: int, cost: float,
                   to: int) -> None:
        """HMM pdf chain of triphone (l-c+r) from builder state ``frm``
        to ``to``, word olabel/cost on the entry arc."""
        cur = frm
        for k in range(states_per_phone):
            pdf = tying(l, c, r, k)
            nxt = b.state()
            b.arc(cur, pdf + 1, ol if k == 0 else 0,
                  cost + forward if k == 0 else forward, nxt)
            b.arc(nxt, pdf + 1, 0, loop, nxt)
            cur = nxt
        b.arc(cur, 0, 0, 0.0, to)

    start = get((int(lg.start), BOUND, BOUND))
    while queue:
        st = queue.popleft()
        s, l, c = st
        sid = states[st]
        fin = float(lg.final[s])
        if np.isfinite(fin):
            if c == BOUND:
                b.set_final(sid, fin)
            else:
                # flush the pending phone with boundary right context
                end = b.state()
                b.set_final(end, fin)
                emit_chain(sid, l, c, BOUND, 0, 0.0, end)
        for idx in arc_of.get(s, []):
            a = lg.arcs[idx]
            d, il = int(a["nextstate"]), int(a["ilabel"])
            ol, cost = int(a["olabel"]), float(a["weight"])
            if il == 0:
                b.arc(sid, 0, ol, cost, get((d, l, c)))
                continue
            r = il - 1
            did = get((d, c, r))
            if c == BOUND:
                # nothing pending yet: just consume r into the context
                b.arc(sid, 0, ol, cost, did)
            else:
                emit_chain(sid, l, c, r, ol, cost, did)
    return b.build(start=start)


def build_word_graph(lexicon_words: Dict[str, List[List[int]]],
                     word_ids: Dict[str, int], states_per_phone: int,
                     arpa_path: Optional[str] = None,
                     context: str = "mono", tying=None) -> FstData:
    """lexicon + (optional) ARPA -> decoder-ready graph: ilabel = pdf+1,
    olabel = word id.

    context="mono": each phone's pdfs depend on the phone alone.
    context="tri": triphone C expansion via :func:`expand_context`,
    with ``tying`` mapping (l, c, r, k) -> pdf (a :class:`TableTying`
    built from the acoustic model's tied states, or
    :class:`MonophoneTying` as the context-free degenerate case). The
    raw product is not determinized/minimized — accepted size cost,
    see expand_context. Externally-built CD HCLGs also decode here:
    drop {HCLG.fst, words.txt, final.mdl} into the graph dir and
    decode_dnn remaps their transition-id ilabels to pdfs
    (tested: tests/test_hclg_interop.py)."""
    if context not in ("mono", "monophone", "tri", "triphone"):
        raise NotImplementedError(
            "unknown context %r: native construction supports mono and "
            "tri; anything else must be built externally and decoded "
            "via the graph-dir final.mdl transition-id remap" % context)
    if arpa_path:
        g = grammar_from_arpa(arpa_path, word_ids)
    else:
        ids = [word_ids[w] for w in lexicon_words]
        g = unigram_grammar(ids)
    lex_by_id = {word_ids[w]: prons for w, prons in lexicon_words.items()}
    lg = compose_lg(g, lex_by_id)
    if context in ("tri", "triphone"):
        if tying is None:
            tying = MonophoneTying(states_per_phone)
        return expand_context(lg, tying, states_per_phone)
    return expand_hmm(lg, states_per_phone)


def read_lexicon(path: str, phone_ids: Dict[str, int]
                 ) -> Dict[str, List[List[int]]]:
    """lexicon.txt: ``word phone phone ...`` (multiple lines = multiple
    pronunciations). Phones map through ``phone_ids`` (0-based)."""
    out: Dict[str, List[List[int]]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            pron = [phone_ids[p] if not p.isdigit() else int(p)
                    for p in parts[1:]]
            out.setdefault(parts[0], []).append(pron)
    return out
