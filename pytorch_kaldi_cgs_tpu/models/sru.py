"""SRU (Simple Recurrent Unit) — native, associative-scan parallel.

The reference supports SRU only through an external CUDA package: its
wrapper class is shipped commented out behind ``pip install sru[cuda]``
(ref: neural_networks.py:23-26, :2428-2471) with the config schema in
ref proto/SRU.proto. This implementation is first-party and TPU-native:
the SRU cell's state recurrence is *elementwise affine*,

    c_t = f_t * c_{t-1} + (1 - f_t) * u_t,

so the whole time dimension evaluates with ``jax.lax.associative_scan``
in O(log T) depth — no sequential scan at all. Every per-frame tensor
(gates, candidate, highway) is a batched matmul over (T*B) rows, which
is exactly the MXU-saturating shape; the only non-parallel op left is
the log-depth prefix combine of two (T, B, H) tensors. This makes SRU
the fastest recurrent cell in the zoo on TPU by construction.

Semantics follow the original SRU formulation (Lei et al. 2018, the one
the cell equations above describe): gates depend on the input only,
which is what makes the recurrence linear in c. (The pip package's
later v2 adds ``v * c_{t-1}`` terms inside the gates; those reintroduce
a sequential dependency and are deliberately not replicated.) The
config field vocabulary matches ref proto/SRU.proto:

  sru_hidden_size / sru_num_layers         stack shape
  sru_use_tanh / sru_use_relu / sru_use_selu   activation on c (linear
                                           when all false)
  sru_dropout                              inter-layer dropout
  sru_rnn_dropout                          dropout on the candidate u,
                                           mask shared across time
  sru_weight_norm                          row weight-normalization of W
  sru_layer_norm                           LN on each layer's input
  sru_is_input_normalized                  skip that LN for layer 0
  sru_bidirectional                        reversed-time twin per layer,
                                           concat -> 2H
  sru_has_skip_term                        highway h = r*act(c)+(1-r)*x'
                                           (x' projected when dims differ)
  sru_highway_bias                         init bias of the forget gate
  sru_rescale                              scale the skip term by
                                           sqrt(1 + 2*exp(highway_bias))
                                           (the package's variance fix)
  sru_n_proj                               low-rank bottleneck for W
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .base import AcousticModel, opt_bool
from .layers import Array, layer_norm_safe

_EPS = 1e-6


class SRU(AcousticModel):
    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        super().__init__(options, inp_dim)
        self.H = int(options["sru_hidden_size"])
        self.N = int(options["sru_num_layers"])
        self.dropout = float(options.get("sru_dropout", 0.0) or 0.0)
        self.rnn_dropout = float(options.get("sru_rnn_dropout", 0.0) or 0.0)
        if opt_bool(options, "sru_use_tanh"):
            self.act, self.act_name = jnp.tanh, "tanh"
        elif opt_bool(options, "sru_use_relu"):
            self.act, self.act_name = jax.nn.relu, "relu"
        elif opt_bool(options, "sru_use_selu"):
            self.act, self.act_name = jax.nn.selu, "selu"
        else:
            self.act, self.act_name = (lambda x: x), "linear"
        self.weight_norm = opt_bool(options, "sru_weight_norm")
        self.layer_norm = opt_bool(options, "sru_layer_norm")
        self.bidir = opt_bool(options, "sru_bidirectional")
        self.input_normalized = opt_bool(options, "sru_is_input_normalized")
        self.skip = opt_bool(options, "sru_has_skip_term", True)
        self.highway_bias = float(options.get("sru_highway_bias", 0.0) or 0.0)
        self.rescale = opt_bool(options, "sru_rescale")
        self.n_proj = int(options.get("sru_n_proj", 0) or 0)
        self.ndir = 2 if self.bidir else 1
        self.out_dim = self.H * self.ndir

    # -- parameters ------------------------------------------------------
    def _layer_shapes(self, d_in: int):
        G = 3 * self.H  # candidate, forget, reset
        if self.n_proj > 0 and self.n_proj < min(d_in, G):
            return {"w1": (self.n_proj, d_in), "w2": (G, self.n_proj)}
        return {"w": (G, d_in)}

    def init(self, seed: int) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        params: Dict[str, Any] = {}
        d = self.input_dim
        for i in range(self.N):
            for dirn in range(self.ndir):
                tag = "%d_%d" % (i, dirn)
                for name, shp in self._layer_shapes(d).items():
                    k = math.sqrt(3.0 / shp[1])
                    w = rng.uniform(-k, k, shp).astype(np.float32)
                    params[name + tag] = w
                    if self.weight_norm:
                        params["g_" + name + tag] = np.linalg.norm(
                            w, axis=1).astype(np.float32)
                # highway_bias biases the RESET/highway gate r (b[H:]),
                # matching the sru package's reset_parameters: negative
                # bias -> r small -> the layer is mostly-skip early in
                # training, which is also the premise of the rescale
                # variance fix below
                b = np.zeros((2 * self.H,), np.float32)
                b[self.H:] = self.highway_bias
                params["b" + tag] = b
                if self.skip and d != self.H:
                    k = math.sqrt(3.0 / d)
                    ws = rng.uniform(-k, k, (self.H, d)).astype(np.float32)
                    params["ws" + tag] = ws
                    if self.weight_norm:
                        params["g_ws" + tag] = np.linalg.norm(
                            ws, axis=1).astype(np.float32)
            if self.layer_norm and not (i == 0 and self.input_normalized):
                params["ln%d" % i] = {
                    "gamma": np.ones((d,), np.float32),
                    "beta": np.zeros((d,), np.float32)}
            d = self.H * self.ndir
        return {"params": params, "state": {}, "masks": {}}

    # -- forward ---------------------------------------------------------
    def _weight(self, params, name, tag):
        w = params[name + tag]
        if self.weight_norm:
            g = params["g_" + name + tag]
            w = w * (g / (jnp.linalg.norm(w, axis=1) + _EPS))[:, None]
        return w

    def _dir_pass(self, params, x, i, dirn, rng, train):
        """One direction of one layer; x (T, B, D) in time order."""
        T, B, D = x.shape
        tag = "%d_%d" % (i, dirn)
        shapes = self._layer_shapes(D)
        flat = x.reshape(T * B, D)
        flat_c = self._cast_in(flat)
        if "w1" in shapes:
            w1 = self._weight(params, "w1", tag)
            w2 = self._weight(params, "w2", tag)
            w1, w2 = self._cast_in(w1, w2)
            pre = jnp.dot(jnp.dot(flat_c, w1.T,
                                  preferred_element_type=jnp.float32),
                          self._cast_in(w2.T),
                          preferred_element_type=jnp.float32)
        else:
            w = self._cast_in(self._weight(params, "w", tag))
            pre = jnp.dot(flat_c, w.T, preferred_element_type=jnp.float32)
        u, f_pre, r_pre = jnp.split(pre.reshape(T, B, 3 * self.H), 3, axis=2)
        b = params["b" + tag]
        f = jax.nn.sigmoid(f_pre + b[: self.H])
        r = jax.nn.sigmoid(r_pre + b[self.H:])
        if train and self.rnn_dropout > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(
                sub, 1.0 - self.rnn_dropout, (1, B, self.H))
            u = u * keep / (1.0 - self.rnn_dropout)

        # c_t = f_t c_{t-1} + (1-f_t) u_t: elementwise-affine maps compose
        # associatively ((a1,b1)*(a2,b2) = (a1 a2, a2 b1 + b2)), so the
        # prefix runs in log2(T) parallel rounds instead of T sequential
        # steps — there is no lax.scan in this cell.
        def combine(lhs, rhs):
            al, bl = lhs
            ar, br = rhs
            return al * ar, ar * bl + br

        A, c = jax.lax.associative_scan(combine, (f, (1.0 - f) * u), axis=0)
        from .base import stream_state
        ss = stream_state()
        if ss is not None:
            # composing a nonzero entry state c0 is one more affine map:
            # c_t = B_t + A_t * c0 (A is the prefix forget product)
            c0 = ss.next_carry(jnp.zeros(c.shape[1:], c.dtype))
            c = c + A * c0
            ss.carries_out.append(c[-1])

        out = r * self.act(c)
        if self.skip:
            if D == self.H:
                xs = x
            else:
                ws = self._cast_in(self._weight(params, "ws", tag))
                xs = jnp.dot(flat_c, ws.T,
                             preferred_element_type=jnp.float32
                             ).reshape(T, B, self.H)
            if self.rescale:
                xs = xs * math.sqrt(1.0 + 2.0 * math.exp(self.highway_bias))
            out = out + (1.0 - r) * xs
        return out, rng

    def apply(self, variables, x: Array, *, train: bool, rng=None):
        params = variables["params"]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        for i in range(self.N):
            if "ln%d" % i in params:
                # safe variant: SRU's zero-input output is exactly zero,
                # and padded frames would make the parity LN's backward
                # produce inf on the constant row (see layer_norm_safe)
                x = layer_norm_safe(params["ln%d" % i], x)
            fwd, rng = self._dir_pass(params, x, i, 0, rng, train)
            if self.bidir:
                bwd, rng = self._dir_pass(params, x[::-1], i, 1, rng, train)
                x = jnp.concatenate([fwd, bwd[::-1]], axis=2)
            else:
                x = fwd
            if train and self.dropout > 0 and i < self.N - 1:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout, x.shape)
                x = x * keep / (1.0 - self.dropout)
        return x, dict(variables["state"])
