"""End-to-end on-device ASR pipeline: raw audio → features → acoustic
model → batched Viterbi → phone sequences.

The reference splits this across three processes (Kaldi feature
binaries, PyTorch forward, latgen decode, ref SURVEY §1). Here the whole
recognition path is JAX: the feature frontend (ops/frontend), the
acoustic model, prior normalization and the phone-loop Viterbi all trace
into device programs; the host only sees the final phone sequences.
Intended for batch serving and for measuring audio-seconds/s including
decode (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.viterbi import PhoneLoopHMM, batched_viterbi_decode
from ..ops.frontend import Frontend, add_deltas_jax


class Recognizer:
    """Batch recognizer over equal-length (padded) raw waveforms.

    model: an AcousticModel whose input dim matches the feature dim
    (frontend bins [+deltas] x context window). variables: its trained
    pytree. log_priors: class prior log-probabilities for posterior →
    likelihood conversion (ref: core.py:241-245).
    """

    def __init__(self, model, variables, hmm: PhoneLoopHMM,
                 frontend: Optional[Frontend] = None,
                 log_priors: Optional[np.ndarray] = None,
                 delta_order: int = 0, acwt: float = 1.0,
                 seq_model: bool = False):
        self.model = model
        self.variables = variables
        self.hmm = hmm
        self.frontend = frontend or Frontend()
        self.log_priors = None if log_priors is None else jnp.asarray(log_priors)
        self.delta_order = delta_order
        self.acwt = acwt
        self.seq_model = seq_model
        self._fn = None

    def _build(self, B: int, T_samples: int):
        model = self.model
        frontend = self.frontend
        delta_order = self.delta_order
        log_priors = self.log_priors
        seq_model = self.seq_model
        variables = self.variables

        @jax.jit
        def pipeline(audio):
            feats = jax.vmap(frontend.fbank)(audio)          # (B, T, mel)
            if delta_order:
                feats = jax.vmap(lambda f: add_deltas_jax(
                    f, delta_order, 2))(feats)
            # per-utterance mean/var normalization (chunk-CMVN role)
            mu = jnp.mean(feats, axis=1, keepdims=True)
            sd = jnp.maximum(jnp.std(feats, axis=1, keepdims=True), 1e-5)
            feats = (feats - mu) / sd
            if seq_model:
                x = feats.transpose(1, 0, 2)                  # (T, B, F)
                y, _ = model.apply(variables, x, train=False)
                logp = y.transpose(1, 0, 2)                   # (B, T, C)
            else:
                B_, T_, F_ = feats.shape
                y, _ = model.apply(variables, feats.reshape(B_ * T_, F_),
                                   train=False)
                logp = y.reshape(B_, T_, -1)
            if log_priors is not None:
                logp = logp - log_priors
            return logp

        return pipeline

    def recognize(self, audio: np.ndarray,
                  lengths_samples: Optional[Sequence[int]] = None
                  ) -> List[List[int]]:
        """audio: (B, T_samples) float waveforms (zero-padded)."""
        B, T_samples = audio.shape
        if self._fn is None:
            self._fn = self._build(B, T_samples)
        logp = self._fn(jnp.asarray(audio, jnp.float32))
        n_frames = self.frontend.num_frames(T_samples)
        if lengths_samples is None:
            frame_lengths = np.full(B, n_frames)
        else:
            frame_lengths = np.array([
                max(1, self.frontend.num_frames(int(l)))
                for l in lengths_samples])
        return batched_viterbi_decode(np.asarray(logp), frame_lengths,
                                      self.hmm, acwt=self.acwt)

    def recognize_with_confidence(self, audio: np.ndarray,
                                  lengths_samples=None, decoder=None):
        """Like :meth:`recognize` but returns (labels, per-word
        confidences) per utterance, with the search AND the
        forward-backward posteriors running on-device
        (decode.wfst_tpu.decode_batch_conf) — confidences without the
        device->host posterior transfer + C++ lattice round-trip
        (VERDICT r4 item 7; role of lattice-to-ctm-conf).

        decoder: a TpuWfstDecoder over the serving graph; defaults to
        the recognizer's phone loop."""
        B, T_samples = audio.shape
        if self._fn is None:
            self._fn = self._build(B, T_samples)
        logp = self._fn(jnp.asarray(audio, jnp.float32))
        n_frames = self.frontend.num_frames(T_samples)
        if lengths_samples is None:
            frame_lengths = np.full(B, n_frames)
        else:
            frame_lengths = np.array([
                max(1, self.frontend.num_frames(int(l)))
                for l in lengths_samples])
        if decoder is None:
            decoder = self._phone_loop_decoder()
        mats = [np.asarray(logp[i, :frame_lengths[i]]) for i in range(B)]
        return decoder.decode_batch_conf(mats, acwt=self.acwt)

    def _phone_loop_decoder(self):
        if getattr(self, "_pl_decoder", None) is None:
            import tempfile

            from ..decode.openfst import read_fst_text
            from ..decode.wfst_tpu import TpuWfstDecoder
            from ..native import build_phone_loop_fst
            with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                             delete=False) as f:
                path = f.name
            build_phone_loop_fst(path, self.hmm.num_phones,
                                 self.hmm.states_per_phone)
            self._pl_decoder = TpuWfstDecoder(read_fst_text(path))
        return self._pl_decoder


class StreamingRecognizer:
    """Chunked (incremental) recognition with carried recurrent state —
    a capability the reference cannot express: its forward path is
    whole-utterance only (one sentence per batch, ref core.py:71-72).

    Feed fixed-size feature chunks ``(T_c, B, F)`` through
    :meth:`accept`; the model's recurrent state (h/c per layer) carries
    across calls via ``AcousticModel.apply_streaming``, so the
    concatenated streamed posteriors are exactly the full-utterance
    posteriors (test-pinned). Greedy partial hypotheses are available
    after every chunk; :meth:`finalize` runs batched Viterbi over the
    accumulated posteriors for the final answer.

    Feature normalization must be streaming-safe (global CMVN or
    precomputed stats) — per-utterance CMVN needs the whole utterance
    by definition and belongs to the batch :class:`Recognizer`.
    """

    def __init__(self, model, variables, hmm: Optional[PhoneLoopHMM] = None,
                 log_priors: Optional[np.ndarray] = None, acwt: float = 1.0,
                 seq_model: bool = True):
        self.model = model
        self.variables = variables
        self.hmm = hmm
        self.log_priors = None if log_priors is None else jnp.asarray(log_priors)
        self.acwt = acwt
        self.seq_model = seq_model
        self._step_first = None
        self._step_cont = None

    def _posteriors(self, variables, chunk, carries):
        if self.seq_model:
            y, carries = self.model.apply_streaming(variables, chunk, carries)
        else:
            T_c, B, F = chunk.shape
            y, carries = self.model.apply_streaming(
                variables, chunk.reshape(T_c * B, F), carries)
            y = y.reshape(T_c, B, -1)
        if self.log_priors is not None:
            y = y - self.log_priors
        return y, carries

    def start(self) -> dict:
        """A fresh stream session (per parallel batch of streams)."""
        return {"carries": None, "chunks": [],
                "partials": None, "last_ids": None}

    def accept(self, session: dict, feats_chunk: np.ndarray) -> np.ndarray:
        """Process one (T_c, B, F) feature chunk; returns its
        prior-normalized log-posteriors (T_c, B, C) and advances the
        session state (including the incremental greedy partials)."""
        chunk = jnp.asarray(feats_chunk, jnp.float32)
        if session["carries"] is None:
            if self._step_first is None:
                self._step_first = jax.jit(
                    lambda v, c: self._posteriors(v, c, None))
            y, carries = self._step_first(self.variables, chunk)
        else:
            if self._step_cont is None:
                self._step_cont = jax.jit(self._posteriors)
            y, carries = self._step_cont(self.variables, chunk,
                                         session["carries"])
        session["carries"] = carries
        out = np.asarray(y)
        session["chunks"].append(out)
        # extend the greedy partials incrementally: only this chunk's
        # frames are argmax'd, deduped against the carried last id —
        # partial() stays O(1) per chunk instead of re-scanning history
        ids = out.argmax(axis=2)                          # (T_c, B)
        B = ids.shape[1]
        if session["partials"] is None:
            session["partials"] = [[] for _ in range(B)]
            session["last_ids"] = [None] * B
        for b in range(B):
            prev = session["last_ids"][b]
            seq = session["partials"][b]
            for v in ids[:, b]:
                if v != prev:
                    seq.append(int(v))
                    prev = v
            session["last_ids"][b] = prev
        return out

    def partial(self, session: dict) -> List[List[int]]:
        """Greedy (argmax-frame) partial hypotheses, deduped consecutive
        — maintained incrementally by accept(), returned by reference."""
        return session["partials"] or []

    def finalize(self, session: dict,
                 frame_lengths: Optional[Sequence[int]] = None
                 ) -> List[List[int]]:
        """Viterbi decode over everything streamed so far."""
        if self.hmm is None:
            return self.partial(session)
        logp = np.concatenate(session["chunks"], axis=0).transpose(1, 0, 2)
        B, T = logp.shape[0], logp.shape[1]
        if frame_lengths is None:
            frame_lengths = np.full(B, T)
        return batched_viterbi_decode(logp, np.asarray(frame_lengths),
                                      self.hmm, acwt=self.acwt)
