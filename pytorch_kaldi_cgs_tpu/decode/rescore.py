"""Lattice LM rescoring — the fglarge-class second pass.

The reference's headline LibriSpeech table includes WERs after rescoring
the decode lattices with a larger 4-gram LM (ref: README.md:278-283,
via Kaldi's steps/lmrescore*.sh which compose the lattice with G_old^-1
then G_new). Here the same semantics run directly over our native
lattices: a Viterbi dynamic program over (lattice node, n-gram history)
pairs that, per word arc, removes the first-pass grammar's score and
adds the second-pass LM's, and fixes up the sentence-end scores folded
into final costs. Old and new LM scores are both evaluated from their
ARPA tables with standard backoff, exactly the scores
``decode.graph.grammar_from_arpa`` compiles into the first-pass graph
(same -log10 p * ln10 costs), so on the first-pass LM the rescoring is
a no-op by construction (test-pinned).

Why host-side: lattices are small (10^3-10^5 arcs after lat_beam
pruning) and the DP is pointer-chasing over hash states — CPU work, not
MXU work; the decoder stores arcs topologically so one relaxation pass
usually suffices (ref role: lattice-lmrescore + lattice-best-path).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from .graph import parse_arpa

LOG10 = math.log(10.0)


class ArpaLM:
    """Backoff n-gram scorer over a parsed ARPA table.

    ``logp(hist, w)`` returns the natural-log probability of ``w`` given
    the word-string history, with the standard recursive backoff rule:
    exact match first, else backoff-weight(hist) + logp(hist[1:], w).
    """

    def __init__(self, path: str):
        self.grams = parse_arpa(path)
        self.max_order = max(self.grams) if self.grams else 1

    def logp(self, hist: Tuple[str, ...], w: str) -> float:
        if self.max_order > 1:
            hist = tuple(hist)[-(self.max_order - 1):]
        else:
            hist = ()
        bow = 0.0
        while True:
            ng = hist + (w,)
            ent = self.grams.get(len(ng), {}).get(ng)
            if ent is not None:
                return (bow + ent[0]) * LOG10
            if not hist:
                unk = self.grams.get(1, {}).get(("<unk>",))
                return (bow + (unk[0] if unk is not None else -99.0)) * LOG10
            hent = self.grams.get(len(hist), {}).get(hist)
            if hent is not None:
                bow += hent[1]
            hist = hist[1:]

    def advance(self, hist: Tuple[str, ...], w: str) -> Tuple[str, ...]:
        """Next history state: append w, truncate to order-1, and drop
        unseen prefixes (they can never match an n-gram, so merging them
        keeps the DP state space minimal — same rule the grammar FST
        construction uses for its state set)."""
        if self.max_order <= 1:
            return ()
        h = (tuple(hist) + (w,))[-(self.max_order - 1):]
        while h and h not in self.grams.get(len(h), {}):
            h = h[1:]
        return h


def lm_rescore_lattice(lat, word_syms: Dict[int, str], old_lm: ArpaLM,
                       new_lm: ArpaLM, ac_scale: float = 1.0,
                       lm_scale: float = 1.0
                       ) -> Tuple[List[int], float]:
    """Best word-id path of ``lat`` after replacing ``old_lm``'s scores
    with ``new_lm``'s (scaled by ``lm_scale``).

    ``lat`` is a :class:`pytorch_kaldi_cgs_tpu.native.Lattice` (or any
    object exposing its numpy arc/node arrays). Word arcs (olabel != 0)
    get ``graph_cost - old + lm_scale * new``; epsilon arcs pass the
    history through; final costs are corrected for the </s> score the
    first-pass grammar folded into graph finals. Returns
    ``(word_ids, total_cost)`` of the Viterbi-best rescored path.
    """
    src, dst = lat.src, lat.dst
    ola = lat.olabels
    gc, ac = lat.graph_costs, lat.acoustic_costs
    finals = lat.final_costs
    INF = float("inf")

    start_hist = ("<s>",)
    # the DP history serves BOTH models' backoff lookups, so it keeps
    # the raw last max(order)-1 words (each logp() truncates for itself)
    keep = max(old_lm.max_order, new_lm.max_order, 2) - 1
    # per-node expansion: node -> {hist: (cost, parent_key, arc_index)};
    # a parent_key is the (node, hist) pair the backtrace follows
    by_node: Dict[int, Dict[Tuple[str, ...], Tuple[float, Optional[tuple],
                                                   int]]] = {}
    start = getattr(lat, "start_node", 0)
    by_node[start] = {start_hist: (0.0, None, -1)}

    n_arcs = len(src)
    # arcs are stored topologically by the decoder when possible; a few
    # relaxation passes cover the (rare) creation-order fallback —
    # the lattice is acyclic so this converges
    for _ in range(16):
        changed = False
        for i in range(n_arcs):
            states = by_node.get(int(src[i]))
            if not states:
                continue
            f = int(src[i])
            w_id = int(ola[i])
            base = float(gc[i]) + ac_scale * float(ac[i])
            d = int(dst[i])
            dstates = by_node.setdefault(d, {})
            for hist, (cost, _, _) in list(states.items()):
                if w_id == 0:
                    nh = hist
                    c2 = cost + base
                else:
                    w = word_syms.get(w_id, str(w_id))
                    c2 = cost + base \
                        + old_lm.logp(hist, w) \
                        - lm_scale * new_lm.logp(hist, w)
                    nh = (hist + (w,))[-keep:]
                if c2 < dstates.get(nh, (INF,))[0]:
                    dstates[nh] = (c2, (f, hist), i)
                    changed = True
        if not changed:
            break

    # finals: correct the folded-in </s> scores
    best_total, best_key = INF, None
    for node, states in by_node.items():
        fc = float(finals[node])
        if not math.isfinite(fc):
            continue
        for hist, (cost, _, _) in states.items():
            total = cost + fc + old_lm.logp(hist, "</s>") \
                - lm_scale * new_lm.logp(hist, "</s>")
            if total < best_total:
                best_total, best_key = total, (node, hist)

    if best_key is None:
        raise RuntimeError("no final state reachable in lattice rescore")

    words: List[int] = []
    key = best_key
    while key is not None:
        node, hist = key
        _, parent, arc_i = by_node[node][hist]
        if arc_i >= 0 and int(ola[arc_i]) != 0:
            words.append(int(ola[arc_i]))
        key = parent
    words.reverse()
    return words, best_total
