"""Batched Viterbi decoding over HMM state log-likelihoods.

Native replacement for the phone-recognition decode path the reference
delegates to Kaldi's ``latgen-faster-mapped``
(ref: kaldi_decoding_scripts/decode_dnn.sh:79-87). Stage 1 is a
phone-loop HMM (each phone = left-to-right chain of ``states_per_phone``
pdf states with self-loops; the final state of every phone connects to
the initial state of every phone) — the classical phone-recognition
topology, sufficient for PER scoring. The WFST/HCLG lattice decoder is
the separate native C++ deliverable.

Two engines:
  * :func:`viterbi_decode` — vectorized numpy, per utterance;
  * :func:`batched_viterbi_decode` — jitted JAX ``lax.scan`` over a
    padded (B, T, S) batch, designed for TPU: the per-step transition
    max decomposes into (a) elementwise self-loop/forward shifts inside
    a phone and (b) one max over phone-final states broadcast to all
    phone-initial states — O(S) work per frame instead of O(S^2), no
    dense transition matrix.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


class PhoneLoopHMM:
    """Phone-loop topology over pdf states.

    pdf layout matches the synthetic dataset and any model where
    pdf = phone * states_per_phone + state (identity transition model).
    """

    def __init__(self, num_phones: int, states_per_phone: int,
                 self_loop_prob: float = 0.7, phone_insertion_penalty: float = 0.0):
        self.num_phones = num_phones
        self.states_per_phone = states_per_phone
        self.S = num_phones * states_per_phone
        self.log_self = np.log(self_loop_prob)
        self.log_next = np.log(1.0 - self_loop_prob)
        self.pip = phone_insertion_penalty
        sp = states_per_phone
        self.state_phone = np.arange(self.S) // sp
        self.is_initial = (np.arange(self.S) % sp) == 0
        self.is_final = (np.arange(self.S) % sp) == sp - 1

    @classmethod
    def from_graph_dir(cls, graph_dir: str, **kw) -> "PhoneLoopHMM":
        with open(os.path.join(graph_dir, "graph.json")) as f:
            g = json.load(f)
        if g.get("type") != "phone_loop":
            raise ValueError("graph %s is not a phone_loop graph" % graph_dir)
        return cls(g["num_phones"], g["states_per_phone"], **kw)


def viterbi_decode(loglikes: np.ndarray, hmm: PhoneLoopHMM,
                   acwt: float = 1.0) -> List[int]:
    """Best phone sequence for one utterance (T, S) of log-likelihoods."""
    T, S = loglikes.shape
    assert S == hmm.S, "loglikes dim %d != HMM states %d" % (S, hmm.S)
    sp = hmm.states_per_phone
    ll = acwt * loglikes
    NEG = -1e30

    delta = np.full(S, NEG)
    delta[hmm.is_initial] = ll[0][hmm.is_initial]
    backptr = np.zeros((T, S), dtype=np.int32)
    backptr[0] = np.arange(S)

    idx = np.arange(S)
    prev_in_phone = idx - 1  # state s-1 (valid when not initial)
    for t in range(1, T):
        stay = delta + hmm.log_self
        adv = np.full(S, NEG)
        adv[~hmm.is_initial] = delta[prev_in_phone[~hmm.is_initial]] + hmm.log_next
        # cross-phone: max over final states into any initial state
        final_scores = delta[hmm.is_final] + hmm.log_next - hmm.pip
        best_final = int(np.argmax(final_scores))
        best_final_state = np.where(hmm.is_final)[0][best_final]
        cross = np.full(S, NEG)
        cross[hmm.is_initial] = final_scores[best_final]

        stacked = np.stack([stay, adv, cross])
        choice = np.argmax(stacked, axis=0)
        delta = stacked[choice, idx] + ll[t]
        bp = np.where(choice == 0, idx,
                      np.where(choice == 1, prev_in_phone, best_final_state))
        backptr[t] = bp

    state = int(np.argmax(delta))
    path = np.zeros(T, dtype=np.int32)
    for t in range(T - 1, -1, -1):
        path[t] = state
        state = int(backptr[t, state])
    phones = hmm.state_phone[path]
    # collapse the state path into a phone sequence: new phone segment on
    # phone change, or on re-entry into an initial state (same phone twice)
    seq = [int(phones[0])]
    for t in range(1, T):
        entering = hmm.is_initial[path[t]] and path[t] != path[t - 1]
        if phones[t] != phones[t - 1] or (entering and hmm.is_final[path[t - 1]]):
            seq.append(int(phones[t]))
    return seq


def batched_viterbi_decode(loglikes: np.ndarray, lengths: np.ndarray,
                           hmm: PhoneLoopHMM, acwt: float = 1.0
                           ) -> List[List[int]]:
    """Decode a padded batch (B, T, S) on the accelerator.

    The forward pass (delta recursion + backpointers) runs as one jitted
    ``lax.scan``; backtracking runs on host (cheap, O(T)).
    """
    import jax
    import jax.numpy as jnp

    B, T, S = loglikes.shape
    NEG = -1e30

    # compile once per (hmm, B, T, S): the whole forward recursion AND
    # the backtrace run as one jitted program on the accelerator
    cache = getattr(hmm, "_jit_cache", None)
    if cache is None:
        cache = hmm._jit_cache = {}
    key = (B, T, S)
    if key not in cache:
        cache[key] = _build_batched_viterbi(hmm, B, T, S)
    path, end_state = cache[key](jnp.asarray(loglikes),
                                 jnp.asarray(np.asarray(lengths), jnp.int32),
                                 float(acwt))
    path = np.asarray(path)
    end_state_np = np.asarray(end_state)

    out: List[List[int]] = []
    for b in range(B):
        L = int(lengths[b])
        if L <= 1:
            out.append([int(hmm.state_phone[int(end_state_np[b])])])
            continue
        p = path[:L, b]
        phones = hmm.state_phone[p]
        seq = [int(phones[0])]
        for t in range(1, L):
            entering = hmm.is_initial[p[t]] and p[t] != p[t - 1]
            if phones[t] != phones[t - 1] or (entering and hmm.is_final[p[t - 1]]):
                seq.append(int(phones[t]))
        out.append(seq)
    return out


def _build_batched_viterbi(hmm: PhoneLoopHMM, B: int, T: int, S: int):
    import jax
    import jax.numpy as jnp

    NEG = -1e30
    is_initial = jnp.asarray(hmm.is_initial)
    final_idx = jnp.asarray(np.where(hmm.is_final)[0])
    idx = jnp.arange(S)

    @jax.jit
    def run(loglikes, lengths_j, acwt):
        ll = (acwt * loglikes).transpose(1, 0, 2)  # (T, B, S)
        batch_idx = jnp.arange(B)
        delta0 = jnp.where(is_initial, ll[0], NEG)

        def step(delta, ll_t):
            stay = delta + hmm.log_self
            adv = jnp.where(is_initial, NEG,
                            jnp.roll(delta, 1, axis=-1) + hmm.log_next)
            final_scores = (jnp.take(delta, final_idx, axis=-1)
                            + hmm.log_next - hmm.pip)
            best_final_pos = jnp.argmax(final_scores, axis=-1)        # (B,)
            best_final_state = final_idx[best_final_pos]              # (B,)
            best_final_score = jnp.take_along_axis(
                final_scores, best_final_pos[:, None], axis=-1)[:, 0]  # (B,)
            cross = jnp.where(is_initial, best_final_score[:, None], NEG)
            stacked = jnp.stack([stay, adv, cross])                   # (3,B,S)
            choice = jnp.argmax(stacked, axis=0)                      # (B,S)
            new_delta = jnp.max(stacked, axis=0) + ll_t
            bp = jnp.where(choice == 0, idx[None, :],
                           jnp.where(choice == 1, idx[None, :] - 1,
                                     best_final_state[:, None]))
            return new_delta, (bp, new_delta)

        _, (bps, deltas) = jax.lax.scan(step, delta0, ll[1:] if T > 1
                                        else ll[:0])
        d_last = jnp.where((lengths_j <= 1)[:, None], delta0,
                           deltas[jnp.clip(lengths_j - 2, 0, max(T - 2, 0)),
                                  batch_idx] if T > 1 else delta0)
        end_state = jnp.argmax(d_last, axis=-1).astype(jnp.int32)   # (B,)

        def back(state, inputs):
            bp_t, i = inputs        # bp_t = bps[i], i runs T-2 .. 0
            # at each utterance's last frame, (re)start from its end state
            state = jnp.where(i + 1 == lengths_j - 1, end_state, state)
            emit = state            # state at frame i+1
            prev = bp_t[batch_idx, state].astype(jnp.int32)
            return prev, emit

        if T > 1:
            xs = (jnp.flip(bps, 0), jnp.arange(T - 2, -1, -1))
            state0, emits = jax.lax.scan(back, end_state, xs)
            path_dev = jnp.concatenate([state0[None], jnp.flip(emits, 0)],
                                       axis=0)
        else:
            path_dev = end_state[None]
        return path_dev, end_state

    return run
