"""On-TPU WFST Viterbi decoding over arbitrary arc tables.

The native C++ decoder (native/src/decoder.cc) is a classic sparse
token passer — great on a CPU, but every serving pipeline that runs the
acoustic model on TPU pays a device->host posterior transfer plus host
decode. This decoder keeps the whole search ON the device, in a form
XLA can actually run fast: the WFST is a flat arc table and one Viterbi
frame is two dense vector ops over ALL arcs —

    cand   = score[src] + arc_w + acwt * (-loglike[t, pdf])
    score' = segment_min(cand, dst)          # tropical semiring

— i.e. gathers + a segment reduction, O(A) per frame with no
data-dependent control flow (the lax.scan over frames is the only
sequential axis). Epsilon arcs (backoff/word boundaries) are relaxed by
K fixpoint passes per frame where K = the eps subgraph's topological
depth, computed once host-side. This is EXACT Viterbi over the full
graph (no beam): on TPU the dense formulation makes pruning pointless
until the state space stops fitting HBM — the backtrace array is
T x num_states int32, so graphs up to ~10^6 states at T=1000 fit
comfortably where the reference's latgen would be beam-searching.

Replaces `latgen-faster-mapped --determinize-lattice=false` best-path
duty (ref kaldi_decoding_scripts/decode_dnn.sh:84) for on-device
serving; the native decoder remains the lattice/rescoring engine.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_BIG = np.float32(1e30)


def _eps_depth(num_states: int, z_src: np.ndarray, z_dst: np.ndarray,
               cap: int = 16) -> int:
    """Topological depth of the eps subgraph = fixpoint pass count.
    Cycles (possible in theory, never cost-improving for positive
    weights) fall back to ``cap``."""
    if len(z_src) == 0:
        return 0
    indeg = np.zeros(num_states, np.int64)
    np.add.at(indeg, z_dst, 1)
    order = [int(s) for s in np.where(indeg == 0)[0]]
    depth = np.zeros(num_states, np.int64)
    # adjacency over eps arcs only
    import collections
    adj = collections.defaultdict(list)
    for s, d in zip(z_src.tolist(), z_dst.tolist()):
        adj[s].append(d)
    seen = 0
    best = 0
    while order:
        s = order.pop()
        seen += 1
        for d in adj.get(s, ()):
            depth[d] = max(depth[d], depth[s] + 1)
            best = max(best, int(depth[d]))
            indeg[d] -= 1
            if indeg[d] == 0:
                order.append(int(d))
    if seen < num_states:
        return cap          # eps cycle somewhere: fixpoint-cap passes
    # Acyclic: the computed depth is exact — use it even beyond ``cap``
    # (clamping would silently truncate the per-frame eps closure).
    return max(best, 1)


class TpuWfstDecoder:
    """Exact dense Viterbi over a decode.openfst.FstData arc table,
    running entirely on the default JAX device."""

    def __init__(self, fst, cap_eps_passes: int = 16):
        import jax.numpy as jnp
        self.num_states = int(fst.num_states)
        self.start = int(fst.start)
        arcs = fst.arcs
        src = np.asarray(fst.src, np.int32)
        emit = arcs["ilabel"] > 0
        self._e_src = jnp.asarray(src[emit])
        self._e_dst = jnp.asarray(arcs["nextstate"][emit].astype(np.int32))
        self._e_pdf = jnp.asarray((arcs["ilabel"][emit] - 1).astype(np.int32))
        self._e_w = jnp.asarray(arcs["weight"][emit].astype(np.float32))
        z = ~emit
        self._z_src = jnp.asarray(src[z])
        self._z_dst = jnp.asarray(arcs["nextstate"][z].astype(np.int32))
        self._z_w = jnp.asarray(arcs["weight"][z].astype(np.float32))
        self._K = _eps_depth(self.num_states,
                             src[z], arcs["nextstate"][z].astype(np.int32),
                             cap=cap_eps_passes)
        # host-side arc metadata for the backtrace (olabel + src), eps
        # arcs offset by the emitting count in the stored arc ids
        self._h_olabel = np.concatenate(
            [arcs["olabel"][emit], arcs["olabel"][z]]).astype(np.int64)
        self._h_src = np.concatenate([src[emit], src[z]]).astype(np.int64)
        self._n_emit = int(emit.sum())
        final = np.asarray(fst.final, np.float32)
        self._final = jnp.asarray(np.where(np.isfinite(final), final, _BIG))
        self._jit_cache = {}

    # -- device side ------------------------------------------------------
    def _build(self, T: int):
        import jax
        import jax.numpy as jnp

        S = self.num_states
        K = self._K
        e_src, e_dst, e_pdf, e_w = (self._e_src, self._e_dst,
                                    self._e_pdf, self._e_w)
        z_src, z_dst, z_w = self._z_src, self._z_dst, self._z_w
        n_emit = self._n_emit
        nz = int(z_src.shape[0])

        def eps_pass(score, barc):
            cand = score[z_src] + z_w
            upd = jax.ops.segment_min(cand, z_dst, num_segments=S)
            upd = jnp.minimum(upd, score)
            # winning eps arc id per improved state (offset by n_emit)
            aidx = jnp.where(cand <= upd[z_dst],
                             jnp.arange(nz, dtype=jnp.int32) + n_emit,
                             jnp.int32(2 ** 30))
            win = jax.ops.segment_min(aidx, z_dst, num_segments=S)
            improved = upd < score
            barc = jnp.where(improved, win, barc)
            return upd, barc

        def init_eps(score):
            barc = jnp.full((S,), -1, jnp.int32)
            for _ in range(K):
                score, barc = eps_pass(score, barc)
            return score, barc

        def frame(score, ll_t_and_valid):
            ll_t, valid = ll_t_and_valid
            am = -ll_t[e_pdf]                       # acoustic cost per arc
            cand = score[e_src] + e_w + am
            nscore = jax.ops.segment_min(cand, e_dst, num_segments=S)
            ne = int(e_src.shape[0])
            aidx = jnp.where(cand <= nscore[e_dst],
                             jnp.arange(ne, dtype=jnp.int32),
                             jnp.int32(2 ** 30))
            barc = jax.ops.segment_min(aidx, e_dst, num_segments=S)
            barc = jnp.where(jnp.isfinite(nscore) & (nscore < _BIG),
                             barc, -1)
            for _ in range(K):
                nscore, barc = eps_pass(nscore, barc)
            # padded frames are no-ops: carry the score through
            nscore = jnp.where(valid, nscore, score)
            barc = jnp.where(valid, barc, -1)
            return nscore, barc

        def run_scaled(ll, t_real, acwt):
            # acoustic scaling folded into the scanned input: the frame
            # body uses cost = -(acwt*ll)[pdf]
            init = jnp.full((S,), _BIG, jnp.float32)
            init = init.at[self.start].set(0.0)
            init, barc0 = init_eps(init)
            valid = jnp.arange(T) < t_real
            score, barcs = jax.lax.scan(frame, init, (ll * acwt, valid))
            total = score + self._final
            best_state = jnp.argmin(total)
            return best_state, total[best_state], barc0, barcs

        return jax.jit(run_scaled)

    def _get(self, T: int):
        if T not in self._jit_cache:
            self._jit_cache[T] = self._build(T)
        return self._jit_cache[T]

    # -- API ----------------------------------------------------------------
    def decode(self, loglikes: np.ndarray, acwt: float = 0.2,
               pad_to: Optional[int] = None) -> List[int]:
        """Best-path output labels (epsilons removed) for one utterance.
        ``pad_to`` buckets T to bound jit recompiles."""
        res = self.decode_batch([loglikes], acwt=acwt, pad_to=pad_to)
        return res[0]

    def decode_batch(self, mats, acwt: float = 0.2,
                     pad_to: Optional[int] = None) -> List[List[int]]:
        import jax.numpy as jnp
        out = []
        max_pdf = int(np.asarray(self._e_pdf).max()) if \
            self._e_pdf.shape[0] else -1
        for ll in mats:
            T = int(ll.shape[0])
            if max_pdf >= ll.shape[1]:
                raise ValueError(
                    "graph references pdf %d but posteriors have %d "
                    "columns" % (max_pdf, ll.shape[1]))
            Tp = pad_to or (1 << max(3, (T - 1).bit_length()))
            if Tp < T:
                raise ValueError("pad_to < T")
            llp = np.zeros((Tp, ll.shape[1]), np.float32)
            llp[:T] = np.asarray(ll, np.float32)
            fn = self._get(Tp)
            best_state, cost, barc0, barcs = fn(jnp.asarray(llp), T,
                                                float(acwt))
            if float(cost) >= float(_BIG):
                out.append(None)
                continue
            out.append(self._backtrace(int(best_state),
                                       np.asarray(barc0),
                                       np.asarray(barcs), T))
        return out

    # -- on-device forward/backward (log semiring) --------------------------
    def _build_fb(self, T: int):
        """Posterior machinery for confidences (VERDICT r4 item 7: the
        on-device path to word confidences, previously only reachable
        through the device->host transfer + C++ lattice round-trip).

        Log-semiring forward/backward over the same flat arc table as
        the Viterbi scan. Eps closure uses DELTA propagation — pass k
        adds exactly the mass of paths with k eps arcs, so each acyclic
        eps path is counted once (naive relaxation would re-add mass
        every pass). Memory: two (T+1, S) f32 stacks on device; fine
        for graphs where T*S*8 bytes fits HBM (the big-graph serving
        path stays on the C++ lattice engine)."""
        import jax
        import jax.numpy as jnp

        S, K = self.num_states, self._K
        e_src, e_dst, e_pdf, e_w = (self._e_src, self._e_dst,
                                    self._e_pdf, self._e_w)
        z_src, z_dst, z_w = self._z_src, self._z_dst, self._z_w
        NEG = jnp.float32(-1e30)

        def seg_lse(vals, seg, num):
            m = jax.ops.segment_max(vals, seg, num_segments=num)
            m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
            s = jax.ops.segment_sum(jnp.exp(vals - m_safe[seg]), seg,
                                    num_segments=num)
            return jnp.where(s > 0, m_safe + jnp.log(s), NEG)

        def close_fwd(x):
            total, delta = x, x
            for _ in range(K):
                delta = seg_lse(delta[z_src] - z_w, z_dst, S)
                total = jnp.logaddexp(total, delta)
            return total

        def close_bwd(x):
            total, delta = x, x
            for _ in range(K):
                delta = seg_lse(delta[z_dst] - z_w, z_src, S)
                total = jnp.logaddexp(total, delta)
            return total

        def fwd_frame(alpha, ll_t_and_valid):
            ll_t, valid = ll_t_and_valid
            lp = ll_t[e_pdf] - e_w                  # log-prob of the arc
            na = close_fwd(seg_lse(alpha[e_src] + lp, e_dst, S))
            na = jnp.where(valid, na, alpha)
            return na, na

        def bwd_frame(beta, ll_t_and_valid):
            ll_t, valid = ll_t_and_valid
            lp = ll_t[e_pdf] - e_w
            cb = close_bwd(beta)
            nb = seg_lse(cb[e_dst] + lp, e_src, S)
            nb = jnp.where(valid, nb, beta)
            return nb, beta       # emit beta AFTER frame t (cut point t)

        def run(ll, t_real, acwt):
            lls = ll * acwt
            valid = jnp.arange(T) < t_real
            a0 = jnp.full((S,), NEG).at[self.start].set(0.0)
            a0 = close_fwd(a0)
            _, alphas = jax.lax.scan(fwd_frame, a0, (lls, valid))
            bT = -self._final
            # reverse scan: walk frames T-1..0; emitted value is the
            # beta at cut point t (mass to go after frame t)
            _, betas = jax.lax.scan(bwd_frame, bT, (lls, valid),
                                    reverse=True)
            logZ = jax.scipy.special.logsumexp(alphas[-1] - self._final)
            return alphas, betas, logZ

        return jax.jit(run)

    def _get_fb(self, T: int):
        key = ("fb", T)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_fb(T)
        return self._jit_cache[key]

    def decode_batch_conf(self, mats, acwt: float = 0.2,
                          pad_to: Optional[int] = None):
        """Best-path labels WITH per-word confidences, computed without
        any posterior leaving the device (role of lattice-to-ctm-conf,
        ref kaldi_decoding_scripts/local/score_sclite.sh:57-60).

        Confidence of a word = exp(min over its frame span of the
        best-path state posterior alpha_t + beta_t - logZ) — the
        weakest-link frame posterior of the path segment that carries
        the word. Returns a list of (labels, confs) or None per utt."""
        import jax.numpy as jnp
        out = []
        for ll in mats:
            T = int(ll.shape[0])
            Tp = pad_to or (1 << max(3, (T - 1).bit_length()))
            llp = np.zeros((Tp, ll.shape[1]), np.float32)
            llp[:T] = np.asarray(ll, np.float32)
            fn = self._get(Tp)
            best_state, cost, barc0, barcs = fn(jnp.asarray(llp), T,
                                                float(acwt))
            if float(cost) >= float(_BIG):
                out.append(None)
                continue
            walked = self._backtrace(int(best_state), np.asarray(barc0),
                                     np.asarray(barcs), T, with_path=True)
            if walked is None:
                out.append(None)
                continue
            labels, word_frames, path_states = walked
            fb = self._get_fb(Tp)
            alphas, betas, logZ = fb(jnp.asarray(llp), T, float(acwt))
            idx_t = jnp.arange(T)
            gamma = (alphas[idx_t, jnp.asarray(path_states)]
                     + betas[idx_t, jnp.asarray(path_states)] - logZ)
            gamma = np.asarray(gamma)
            confs = []
            spans = word_frames + [T]
            for i in range(len(labels)):
                lo, hi = spans[i], max(spans[i + 1], spans[i] + 1)
                seg = gamma[lo:hi]
                confs.append(float(np.exp(np.clip(seg.min(), -50.0, 0.0)))
                             if len(seg) else 0.0)
            out.append((labels, confs))
        return out

    # -- host-side backtrace ------------------------------------------------
    def _backtrace(self, state: int, barc0: np.ndarray, barcs: np.ndarray,
                   T: int, with_path: bool = False):
        """Walk best arcs backwards. barcs[t, s] is the LAST arc taken
        into s during frame t (an eps arc chains to another entry at the
        SAME t; an emitting arc steps to t-1). Returns None (a failed
        decode) if the recorded backpointers are inconsistent.

        with_path=True returns (labels, word_frames, path_states)
        instead: the frame index at which each label's arc sits, and
        the best-path state at every frame cut (for the on-device
        posterior gather in decode_batch_conf)."""
        labels: List[int] = []
        word_frames: List[int] = []
        path_states = np.full(T, -1, np.int64)
        t = T - 1
        hops = 0
        max_hops = (T + 2) * (self._K + 2) + len(self._h_src)
        while t >= 0:
            if path_states[t] < 0:      # first visit = the cut-t state
                path_states[t] = state
            a = int(barcs[t, state])
            if a < 0:
                # Inconsistent backtrace: finite Viterbi cost but no
                # recorded arc into this state at frame t. Chaining
                # barc0 from here would be wrong (it only describes the
                # pre-frame-0 eps closure) — report a failed decode.
                return None
            if self._h_olabel[a]:
                labels.append(int(self._h_olabel[a]))
                word_frames.append(t)
            state = int(self._h_src[a])
            if a < self._n_emit:
                t -= 1
            hops += 1
            if hops > max_hops:
                raise RuntimeError("backtrace did not terminate "
                                   "(eps cycle in best path?)")
        while state != self.start:
            a = int(barc0[state])
            if a < 0:
                break
            if self._h_olabel[a]:
                labels.append(int(self._h_olabel[a]))
            state = int(self._h_src[a])
            hops += 1
            if hops > max_hops:
                raise RuntimeError("init backtrace did not terminate")
        labels.reverse()
        if with_path:
            word_frames.reverse()
            # pre-frame-0 (barc0) words sit at frame 0
            while len(word_frames) < len(labels):
                word_frames.insert(0, 0)
            return labels, word_frames, path_states
        return labels
