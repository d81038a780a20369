"""Multi-system combination — the ``score_combine.sh`` capability
(ref: kaldi_decoding_scripts/local/score_combine.sh: minimum-Bayes-risk
decode over a union of forward-cost-normalized lattices from N decode
dirs).

Two combination levels, both exercised by the decode driver:

* :func:`combine_posterior_arks` — frame-level log-posterior averaging
  of N systems' forward arks (the hybrid-system combination the
  reference also performs at the model level via its multi-feature
  concatenation); the combined ark decodes through the normal path.
* :func:`rover` / :func:`score_combine` — word-level ROVER voting over
  the systems' 1-best hypotheses: progressive edit-distance alignment
  into a confusion network, per-slot (weighted) majority vote. This is
  the sclite-ROVER member of the same family; a true lattice-MBR can
  ride :mod:`.rescore`'s lattice DP later, but hypothesis voting is
  what the combination recipe's WER gain mostly comes from.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .scoring import score_sequences


# ---------------------------------------------------------------------------
# posterior-level combination
# ---------------------------------------------------------------------------

def combine_posterior_arks(ark_paths: Sequence[str], out_ark: str,
                           weights: Optional[Sequence[float]] = None
                           ) -> int:
    """Weighted average of N systems' log-posterior arks (matched keys)
    into ``out_ark``. Returns the number of utterances written."""
    from ..data import kaldi_io
    if weights is None:
        weights = [1.0 / len(ark_paths)] * len(ark_paths)
    if len(weights) != len(ark_paths):
        raise ValueError("need one weight per system")
    mats: List[Dict[str, np.ndarray]] = []
    for p in ark_paths:
        mats.append({k: m for k, m in kaldi_io.read_mat_ark(p)})
    keys = set(mats[0])
    for d in mats[1:]:
        keys &= set(d)
    n = 0
    with open(out_ark, "wb") as f:
        for k in sorted(keys):
            acc = None
            for w, d in zip(weights, mats):
                m = d[k].astype(np.float64) * w
                acc = m if acc is None else acc + m
            kaldi_io.write_mat(f, acc.astype(np.float32), key=k)
            n += 1
    return n


# ---------------------------------------------------------------------------
# ROVER: progressive confusion-network alignment + voting
# ---------------------------------------------------------------------------

_NULL = ""


def _align_to_cn(cn: List[Dict[str, float]], hyp: List[str],
                 weight: float) -> List[Dict[str, float]]:
    """Align one hypothesis into the confusion network with
    edit-distance DP (match cost 0 when the slot contains the word,
    else 1; ins/del 1) and merge the counts."""
    n, m = len(cn), len(hyp)
    # dp[i][j]: cost aligning cn[:i] with hyp[:j]
    dp = np.zeros((n + 1, m + 1), np.float64)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 0.0 if hyp[j - 1] in cn[i - 1] else 1.0
            dp[i, j] = min(dp[i - 1, j - 1] + sub,
                           dp[i - 1, j] + 1.0,
                           dp[i, j - 1] + 1.0)
    # backtrace building the merged network
    out: List[Dict[str, float]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (
                0.0 if hyp[j - 1] in cn[i - 1] else 1.0):
            slot = dict(cn[i - 1])
            slot[hyp[j - 1]] = slot.get(hyp[j - 1], 0.0) + weight
            out.append(slot)
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1.0:
            slot = dict(cn[i - 1])
            slot[_NULL] = slot.get(_NULL, 0.0) + weight
            out.append(slot)
            i -= 1
        else:
            out.append({hyp[j - 1]: weight})
            j -= 1
    out.reverse()
    return out


def rover(hyps: Sequence[Sequence[str]],
          weights: Optional[Sequence[float]] = None) -> List[str]:
    """ROVER voting over N word-sequence hypotheses for ONE utterance:
    progressive alignment into a confusion network, per-slot weighted
    majority (the first system breaks ties — it anchors the network)."""
    hyps = [list(h) for h in hyps]
    if not hyps:
        return []
    if weights is None:
        weights = [1.0] * len(hyps)
    cn: List[Dict[str, float]] = [{w: weights[0]} for w in hyps[0]]
    for hyp, wt in zip(hyps[1:], list(weights)[1:]):
        cn = _align_to_cn(cn, list(hyp), wt)
    out = []
    for slot in cn:
        # count absent systems as null votes
        total = sum(slot.values())
        null = slot.get(_NULL, 0.0) + (sum(weights) - total)
        best_w, best_c = _NULL, null
        for w, c in slot.items():
            if w != _NULL and c > best_c:
                best_w, best_c = w, c
        if best_w != _NULL:
            out.append(best_w)
    return out


def read_hyp_file(path: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                out[parts[0]] = parts[1:]
    return out


def score_combine(decode_dirs: Sequence[str], text_file: str,
                  out_dir: str,
                  weights: Optional[Sequence[float]] = None,
                  phone_map: Optional[Dict] = None) -> Dict[str, float]:
    """Combine N systems' decode dirs (each holding ``hyp.txt`` as
    written by :func:`..decode.decode_dnn.decode_dnn`) by ROVER voting
    and score the combined hypotheses — the driver role of
    ``score_combine.sh``. Writes ``hyp.txt``/``wer``/``scoring_summary``
    like a normal decode dir and returns the score dict."""
    systems = [read_hyp_file(os.path.join(d, "hyp.txt"))
               for d in decode_dirs]
    keys = set(systems[0])
    for s in systems[1:]:
        keys |= set(s)
    hyps: Dict[str, List[str]] = {}
    for k in sorted(keys):
        avail = [(s[k], (weights[i] if weights else 1.0))
                 for i, s in enumerate(systems) if k in s]
        hyps[k] = rover([h for h, _ in avail], [w for _, w in avail])

    refs: Dict[str, List[str]] = {}
    with open(text_file) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] in hyps:
                refs[parts[0]] = parts[1:]
    result = score_sequences(refs, hyps, phone_map)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "hyp.txt"), "w") as f:
        for k in sorted(hyps):
            f.write("%s %s\n" % (k, " ".join(map(str, hyps[k]))))
    with open(os.path.join(out_dir, "wer"), "w") as f:
        f.write("%%WER %.2f [ %d / %d, %d ins, %d del, %d sub ] "
                "(combine %d systems)\n" % (
                    result["wer"],
                    result["sub"] + result["ins"] + result["del"],
                    result["n_tokens"], result["ins"], result["del"],
                    result["sub"], len(decode_dirs)))
    with open(os.path.join(out_dir, "scoring_summary"), "w") as f:
        f.write("wer=%.4f\nsub=%d\nins=%d\ndel=%d\nn_tokens=%d\n" % (
            result["wer"], result["sub"], result["ins"], result["del"],
            result["n_tokens"]))
    return result
