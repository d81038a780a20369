"""On-TPU feature extraction: framing, STFT, log-mel filterbanks, MFCC.

The reference consumes features precomputed by Kaldi's C++ binaries
(``compute-mfcc-feats``/``compute-fbank-feats``, referenced by the
feats.scp lists in every cfg). This module computes them on-device as
jittable JAX ops so raw audio can stream straight into training — a
batch of utterances becomes framing (gather) + one (frames x fft)
matmul-like rFFT + one (bins x mels) matmul on the MXU + log, all fused
by XLA.

Conventions follow Kaldi defaults: 25 ms windows / 10 ms shift, povey
window, preemphasis 0.97, snip-edges framing, mel filterbank with
HTK-style mel scale, DCT-II with lifter for MFCC.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def frame_signal(signal: jnp.ndarray, frame_length: int, frame_shift: int
                 ) -> jnp.ndarray:
    """(num_frames, frame_length) snip-edges framing of a 1-D signal."""
    T = signal.shape[-1]
    num_frames = max(0, 1 + (T - frame_length) // frame_shift)
    idx = (jnp.arange(num_frames)[:, None] * frame_shift
           + jnp.arange(frame_length)[None, :])
    return signal[..., idx]


def povey_window(frame_length: int) -> np.ndarray:
    n = np.arange(frame_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_length - 1))) ** 0.85


def preemphasize(frames: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    first = frames[..., :1] * (1.0 - coeff)
    rest = frames[..., 1:] - coeff * frames[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


def power_spectrum(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def hz_to_mel(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (np.exp(np.asarray(mel) / 1127.0) - 1.0)


def mel_filterbank(num_bins: int, n_fft: int, sample_rate: int,
                   low_freq: float = 20.0, high_freq: Optional[float] = None
                   ) -> np.ndarray:
    """(num_bins, n_fft//2+1) triangular mel filters (host-side const)."""
    if high_freq is None:
        high_freq = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(low_freq), hz_to_mel(high_freq),
                          num_bins + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((num_bins, n_freqs), np.float32)
    for b in range(num_bins):
        lo, ctr, hi = hz_pts[b], hz_pts[b + 1], hz_pts[b + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[b] = np.maximum(0.0, np.minimum(up, down))
    return fb


def dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """Orthogonal DCT-II rows (num_ceps, num_bins)."""
    m = np.zeros((num_ceps, num_bins), np.float32)
    for k in range(num_ceps):
        m[k] = np.cos(np.pi * k * (2 * np.arange(num_bins) + 1)
                      / (2.0 * num_bins))
    m *= np.sqrt(2.0 / num_bins)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


def lifter_coeffs(num_ceps: int, q: float = 22.0) -> np.ndarray:
    return (1.0 + 0.5 * q * np.sin(np.pi * np.arange(num_ceps) / q)
            ).astype(np.float32)


class Frontend:
    """Configured fbank/MFCC extractor; __call__ is jittable."""

    def __init__(self, sample_rate: int = 16000, frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0, num_mel_bins: int = 23,
                 num_ceps: int = 13, preemph: float = 0.97,
                 low_freq: float = 20.0, high_freq: Optional[float] = None,
                 use_energy: bool = False, cepstral_lifter: float = 22.0):
        self.sample_rate = sample_rate
        self.frame_length = int(sample_rate * frame_length_ms / 1000)
        self.frame_shift = int(sample_rate * frame_shift_ms / 1000)
        self.n_fft = _next_pow2(self.frame_length)
        self.num_mel_bins = num_mel_bins
        self.num_ceps = num_ceps
        self.preemph = preemph
        self.use_energy = use_energy
        self._window = jnp.asarray(povey_window(self.frame_length)[None, :],
                                   jnp.float32)
        self._mel = jnp.asarray(mel_filterbank(
            num_mel_bins, self.n_fft, sample_rate, low_freq, high_freq).T)
        self._dct = jnp.asarray(dct_matrix(num_ceps, num_mel_bins).T)
        self._lifter = jnp.asarray(lifter_coeffs(num_ceps, cepstral_lifter))

    def _frames(self, signal: jnp.ndarray) -> jnp.ndarray:
        frames = frame_signal(signal, self.frame_length, self.frame_shift)
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # dc offset
        if self.preemph:
            frames = preemphasize(frames, self.preemph)
        return frames * self._window

    @partial(jax.jit, static_argnums=0)
    def fbank(self, signal: jnp.ndarray) -> jnp.ndarray:
        """Log-mel filterbank features (num_frames, num_mel_bins)."""
        frames = self._frames(signal)
        pspec = power_spectrum(frames, self.n_fft)
        mel = pspec @ self._mel
        return jnp.log(jnp.maximum(mel, 1e-10))

    @partial(jax.jit, static_argnums=0)
    def mfcc(self, signal: jnp.ndarray) -> jnp.ndarray:
        """MFCCs (num_frames, num_ceps), liftered; C0 replaced by log
        energy when use_energy."""
        frames = self._frames(signal)
        pspec = power_spectrum(frames, self.n_fft)
        mel = jnp.log(jnp.maximum(pspec @ self._mel, 1e-10))
        ceps = (mel @ self._dct) * self._lifter
        if self.use_energy:
            log_e = jnp.log(jnp.maximum(jnp.sum(frames ** 2, axis=-1), 1e-10))
            ceps = ceps.at[..., 0].set(log_e)
        return ceps

    def num_frames(self, num_samples: int) -> int:
        return max(0, 1 + (num_samples - self.frame_length) // self.frame_shift)


@partial(jax.jit, static_argnums=(1, 2))
def add_deltas_jax(feats: jnp.ndarray, order: int = 2, window: int = 2
                   ) -> jnp.ndarray:
    """On-device delta features matching data.features.add_deltas."""
    T = feats.shape[0]
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    idx = jnp.arange(T)
    streams = [feats]
    for _ in range(order):
        prev = streams[-1]
        delta = jnp.zeros_like(prev)
        for k in range(-window, window + 1):
            delta = delta + (k / denom) * prev[jnp.clip(idx + k, 0, T - 1)]
        streams.append(delta)
    return jnp.concatenate(streams, axis=-1)


@jax.jit
def cmvn_jax(feats: jnp.ndarray, norm_vars: bool = False) -> jnp.ndarray:
    out = feats - jnp.mean(feats, axis=0, keepdims=True)
    return jax.lax.cond(
        norm_vars,
        lambda o: o / jnp.maximum(jnp.std(feats, axis=0, keepdims=True), 1e-10),
        lambda o: o, out)
