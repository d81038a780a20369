"""CNN and SincNet raw-waveform front-ends (ref:
neural_networks.py:1934-2416).

Input convention matches the reference: each "frame" of the batch is a
raw waveform window of ``inp_dim`` samples, reshaped to (B, 1, L); a
stack of 1-D convolutions + max-pooling + norm + activation + dropout
produces a flattened (B, out_dim) feature. SincConv is the parametrized
sinc band-pass filterbank (learned low/band Hz, mel-spaced init, Hamming
window) of SincNet.

TPU notes: conv1d lowers to the MXU via lax.conv_general_dilated; the
sinc filters are *computed inside the jitted step* from the (2*N_filt)
Hz parameters — a negligible VPU cost that XLA fuses ahead of the conv.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .base import AcousticModel, opt_bool
from .layers import (act_fun, batch_norm, batch_norm_params, batch_norm_state,
                     dropout, layer_norm, layer_norm_2d, layer_norm_params)


def _conv1d(x, w):
    """x: (B, C, L); w: (O, C, K) -> (B, O, L-K+1) (valid padding)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))


def _max_pool1d(x, k):
    if k <= 1:
        return x
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 1, k),
        window_strides=(1, 1, k), padding="VALID")


class _ConvStack(AcousticModel):
    """Shared machinery for CNN / SincNet."""
    prefix: str

    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        super().__init__(options, inp_dim)
        p = self.prefix
        self.N_filt = [int(v) for v in options[p + "_N_filt"].split(",")]
        self.len_filt = [int(v) for v in options[p + "_len_filt"].split(",")]
        self.max_pool_len = [int(v) for v in options[p + "_max_pool_len"].split(",")]
        self.acts = options[p + "_act"].split(",")
        self.drop = [float(v) for v in options[p + "_drop"].split(",")]
        self.use_laynorm = [v.strip() in ("True", "true", "1")
                            for v in options[p + "_use_laynorm"].split(",")]
        self.use_batchnorm = [v.strip() in ("True", "true", "1")
                              for v in options[p + "_use_batchnorm"].split(",")]
        self.use_laynorm_inp = opt_bool(options, p + "_use_laynorm_inp")
        self.use_batchnorm_inp = opt_bool(options, p + "_use_batchnorm_inp")
        self.Nl = len(self.N_filt)
        self._acts = [act_fun(a) for a in self.acts]
        # output length bookkeeping (ref: neural_networks.py:1996-2002)
        self.lens = []
        cur = inp_dim
        for i in range(self.Nl):
            cur = int((cur - self.len_filt[i] + 1) / self.max_pool_len[i])
            self.lens.append(cur)
        self.out_dim = cur * self.N_filt[-1]

    def _init_common(self, rng) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        if self.use_laynorm_inp:
            params["ln0"] = layer_norm_params(self.input_dim)
        if self.use_batchnorm_inp:
            params["bn0"] = batch_norm_params(self.input_dim)
            state["bn0"] = batch_norm_state(self.input_dim)
        cin = 1
        for i in range(self.Nl):
            if i > 0 or not self._first_layer_special():
                k = 1.0 / np.sqrt(cin * self.len_filt[i])
                params["conv_w%d" % i] = rng.uniform(
                    -k, k, (self.N_filt[i], cin, self.len_filt[i])).astype(np.float32)
                params["conv_b%d" % i] = rng.uniform(
                    -k, k, (self.N_filt[i],)).astype(np.float32)
            if self.use_laynorm[i]:
                params["ln%d" % i] = layer_norm_params((self.N_filt[i], self.lens[i]))
            if self.use_batchnorm[i]:
                params["bn%d" % i] = batch_norm_params(self.N_filt[i])
                state["bn%d" % i] = batch_norm_state(self.N_filt[i])
            cin = self.N_filt[i]
        return {"params": params, "state": state, "masks": {}}

    def _first_layer_special(self) -> bool:
        return False

    def _first_layer_filters(self, params):
        raise NotImplementedError

    def apply(self, variables, x, *, train: bool, rng=None):
        params, state = variables["params"], variables["state"]
        new_state = dict(state)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B = x.shape[0]
        if self.use_laynorm_inp:
            x = layer_norm(params["ln0"], x)
        if self.use_batchnorm_inp:
            x, new_state["bn0"] = batch_norm(params["bn0"], state["bn0"], x, train)
        x = x.reshape(B, 1, self.input_dim)
        for i in range(self.Nl):
            if i == 0 and self._first_layer_special():
                w = self._first_layer_filters(params)
                y = _conv1d(x, w)
            else:
                y = _conv1d(x, params["conv_w%d" % i]) + \
                    params["conv_b%d" % i][None, :, None]
            y = _max_pool1d(y, self.max_pool_len[i])
            if self.use_laynorm[i]:
                y = layer_norm_2d(params["ln%d" % i], y)
            if self.use_batchnorm[i]:
                # torch BatchNorm1d on (B, C, L): stats per channel.
                # NB eps = the layer's output length: the reference passes
                # it as BatchNorm1d's SECOND positional argument (eps),
                # nn.BatchNorm1d(N_filt, int(...), momentum=0.05)
                # (ref: neural_networks.py:1988-1990, :2102-2104) — a
                # quirk, but it is the math its published PERs ran with.
                yt = y.transpose(0, 2, 1)
                yt, new_state["bn%d" % i] = batch_norm(
                    params["bn%d" % i], state["bn%d" % i], yt, train,
                    eps=float(self.lens[i]))
                y = yt.transpose(0, 2, 1)
            y = self._acts[i](y)
            rng, sub = jax.random.split(rng)
            x = dropout(y, self.drop[i], train, sub)
        return x.reshape(B, -1), new_state


class CNN(_ConvStack):
    """Plain 1-D conv stack (ref: neural_networks.py:1934-2033)."""
    prefix = "cnn"

    def init(self, seed: int) -> Dict[str, Any]:
        return self._init_common(np.random.RandomState(seed))


class SincNet(_ConvStack):
    """CNN whose first layer is a SincConv filterbank
    (ref: neural_networks.py:2036-2143).

    The filter math follows the reference's ``SincConv`` class exactly —
    NOT ``SincConv_fast``, which the reference defines but never
    instantiates (SincNet constructs SincConv at
    ref: neural_networks.py:2315-2317): band edges are stored
    *normalized by the sample rate* (ref: :2288), the band-pass is the
    difference of two max-normalized sinc low-passes (ref: :2393-2400),
    and the Hamming window spans linspace(0, L, L) (ref: :2372-2375).
    The kernel is forced odd (ref: :2338-2339)."""
    prefix = "sinc"

    def __init__(self, options, inp_dim):
        super().__init__(options, inp_dim)
        self.sample_rate = int(options.get("sinc_sample_rate", 16000))
        self.min_low_hz = int(options.get("sinc_min_low_hz", 50))
        self.min_band_hz = int(options.get("sinc_min_band_hz", 50))
        # SincConv forces an odd kernel; the SincNet class's out-length
        # bookkeeping keeps the configured (possibly even) length
        # (ref: :2321-2324) — replicate both behaviors
        L = self.len_filt[0]
        self._sinc_L = L + 1 if L % 2 == 0 else L
        L = self._sinc_L
        if L != self.len_filt[0]:
            # true output lengths shift by one vs the reference's
            # bookkeeping; recompute honestly for OUR out_dim
            self.lens = []
            cur = inp_dim
            for i in range(self.Nl):
                k = L if i == 0 else self.len_filt[i]
                cur = int((cur - k + 1) / self.max_pool_len[i])
                self.lens.append(cur)
            self.out_dim = cur * self.N_filt[-1]
        n_lin = np.linspace(0, L, L)
        self._window = jnp.asarray(
            (0.54 - 0.46 * np.cos(2 * np.pi * n_lin / L)).astype(np.float32))
        n = (L - 1) / 2
        self._n = jnp.asarray(
            (np.arange(-n, n + 1) / self.sample_rate).astype(np.float32))

    def _first_layer_special(self) -> bool:
        return True

    def init(self, seed: int) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        out = self._init_common(rng)
        # mel-spaced band-edge init, normalized by the sample rate
        # (ref: neural_networks.py:2280-2296)
        n_filt = self.N_filt[0]
        low_hz = 30.0
        high_hz = self.sample_rate / 2 - (self.min_low_hz + self.min_band_hz)
        def to_mel(hz):
            return 2595 * np.log10(1 + hz / 700)
        def to_hz(mel):
            return 700 * (10 ** (mel / 2595) - 1)
        mel = np.linspace(to_mel(low_hz), to_mel(high_hz), n_filt + 1)
        hz = to_hz(mel) / self.sample_rate
        out["params"]["sinc_low_hz"] = hz[:-1].astype(np.float32)[:, None]
        out["params"]["sinc_band_hz"] = np.diff(hz).astype(np.float32)[:, None]
        return out

    def _sinc(self, x):
        """Numerically stable sinc over a symmetric grid: compute the
        left half, mirror it, center = 1 (ref: :2380-2389)."""
        L = self._sinc_L
        x_left = x[:, : (L - 1) // 2]
        y_left = jnp.sin(x_left) / x_left
        return jnp.concatenate(
            [y_left, jnp.ones((x.shape[0], 1), x.dtype),
             jnp.flip(y_left, axis=1)], axis=1)

    def _first_layer_filters(self, params):
        """Build the (N_filt, 1, L) sinc band-pass bank from the learned
        normalized low/band parameters inside the jitted step
        (ref: neural_networks.py:2391-2407)."""
        low = self.min_low_hz / self.sample_rate + jnp.abs(
            params["sinc_low_hz"])
        high = low + self.min_band_hz / self.sample_rate + jnp.abs(
            params["sinc_band_hz"])
        two_pi_sr = 2 * np.pi * self.sample_rate
        low_pass1 = 2 * low * self._sinc(low * self._n[None, :] * two_pi_sr)
        low_pass2 = 2 * high * self._sinc(high * self._n[None, :] * two_pi_sr)
        band_pass = low_pass2 - low_pass1
        band_pass = band_pass / jnp.max(band_pass, axis=1, keepdims=True)
        return (band_pass * self._window[None, :])[:, None, :]
