"""Model protocol and shared compression wiring.

Every model class follows the reference's construction contract —
``cls(options_dict, inp_dim)`` exposing ``out_dim``
(ref: README.md:559-577) — but is functionally pure on the compute path:

    model = MLP(options, inp_dim)
    variables = model.init(seed)          # {"params", "state", "masks"}
    y, new_state = model.apply(variables, x, train=True, rng=key)

``params`` are trainable leaves, ``state`` holds batch-norm running
statistics, ``masks`` holds the static 0/1 compression masks (HCGS,
guided HCGS, pattern). All three are checkpointed, which fixes the
reference's reliance on Parameter-restore ordering to persist masks
across chunks (SURVEY §5 checkpoint notes).

Compression is applied *functionally* inside the jitted step:
``w_eff = quantize(w * mask)``; XLA fuses the mask multiply and the
quantizer into the matmul producers, so unlike the reference's per-step
``weight.data.mul_(mask)`` host mutations (ref: neural_networks.py:258,
:853-896) nothing leaves the device.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.proto import strtobool
from ..sparsity import hcgs as hcgs_mod
from ..sparsity.quantize import ste_quantize_weight, ste_quantize_input
from .layers import Array


def opt_bool(options: Mapping[str, Any], key: str, default: bool = False) -> bool:
    if key not in options or options[key] in ("", None):
        return default
    return strtobool(options[key])


def opt_list(options: Mapping[str, Any], key: str, conv, default=None):
    if key not in options or options[key] in ("", None):
        return default if default is not None else []
    return [conv(v) for v in str(options[key]).split(",")]


class CompressionSpec:
    """Per-architecture compression flags parsed from its config section
    (prefix = 'mlp'/'lstm'/'gru'/..., ref option names:
    cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_hcgs.cfg:163-176)."""

    def __init__(self, options: Mapping[str, Any], prefix: str):
        self.hcgs = opt_bool(options, prefix + "_hcgs")
        # MLP uses hcgs_block/hcgs_sparse; RNNs use hcgsx_*/hcgsh_*
        self.hcgs_block = opt_list(options, "hcgs_block", int, [])
        self.hcgs_sparse = opt_list(options, "hcgs_sparse", float, [])
        self.hcgsx_block = opt_list(options, "hcgsx_block", int, self.hcgs_block)
        self.hcgsx_sparse = opt_list(options, "hcgsx_sparse", float, self.hcgs_sparse)
        self.hcgsh_block = opt_list(options, "hcgsh_block", int, self.hcgs_block)
        self.hcgsh_sparse = opt_list(options, "hcgsh_sparse", float, self.hcgs_sparse)

        self.guided_hcgs = opt_bool(options, "guided_hcgs")
        self.apply_guided_hcgs = opt_bool(options, "apply_guided_hcgs")

        self.quant = opt_bool(options, prefix + "_quant")
        self.param_quant = opt_list(options, "param_quant", int, [8])
        self.quant_inp = opt_bool(options, prefix + "_quant_inp")
        self.inp_quant = opt_list(options, "inp_quant", int, [16])

        self.prune = opt_bool(options, prefix + "_prune")
        self.prune_perc = opt_list(options, prefix + "_prune_perc", float, [0.0])

        self.if_pattern = opt_bool(options, "if_pattern")
        self.pattern_mode = options.get("pattern_mode", "pattern")
        self.pattern_shape = opt_list(options, "pattern_shape", int, [8, 8])
        self.pattern_nnz = opt_list(options, "pattern_nnz", int, [4])
        self.pattern_num = opt_list(options, "pattern_num", int, [16])

        self.skip_regularization = opt_bool(options, "skip_regularization")

    def layer_bits(self, i: int) -> int:
        return self.param_quant[min(i, len(self.param_quant) - 1)]

    def layer_prune_perc(self, i: int) -> float:
        return self.prune_perc[min(i, len(self.prune_perc) - 1)]


def effective_weight(w: Array, masks: Dict[str, Array], name: str,
                     spec: CompressionSpec, layer: int,
                     apply_guided: Optional[bool] = None) -> Array:
    """Compose mask pipeline + quantization for one weight matrix.

    Order matches the reference forward: HCGS mask, guided mask (when the
    guided phase is active), pattern mask, magnitude pruning, then
    quantization (the reference quantizes inside QuantizeLinear *after*
    the in-place mask multiplies, ref: neural_networks.py:853-896 +
    quantized_modules.py:207-222).
    """
    if apply_guided is None:
        apply_guided = spec.apply_guided_hcgs
    m = None
    if spec.hcgs and ("hcgs_" + name) in masks:
        m = masks["hcgs_" + name]
    if spec.guided_hcgs and apply_guided and ("ghcgs_" + name) in masks:
        m = masks["ghcgs_" + name] if m is None else m * masks["ghcgs_" + name]
    if spec.if_pattern and ("pattern_" + name) in masks:
        m = masks["pattern_" + name] if m is None else m * masks["pattern_" + name]
    if m is not None:
        w = w * m
    if spec.prune:
        # per-forward global-percentile magnitude mask over this matrix
        # (ref recomputes it every forward, neural_networks.py:887-896)
        thresh = jnp.percentile(jnp.abs(w), spec.layer_prune_perc(layer))
        w = jnp.where(jnp.abs(w) > thresh, w, 0.0)
    if spec.quant:
        w = ste_quantize_weight(w, spec.layer_bits(layer))
    return w


def maybe_quant_input(x: Array, spec: CompressionSpec) -> Array:
    if spec.quant and spec.quant_inp:
        return ste_quantize_input(x, spec.inp_quant[0])
    return x


def build_hcgs_masks(shapes: Dict[str, tuple], blocks, sparse,
                     rng: np.random.RandomState) -> Dict[str, np.ndarray]:
    """One random hierarchical mask per named shape."""
    return {name: hcgs_mod.hcgs_mask(s[0], s[1], blocks, sparse, rng=rng)
            for name, s in shapes.items()}


class _StreamState:
    """Trace-time carry routing for streaming inference: recurrent
    layers pop their initial carry (FIFO, layers trace in order) and
    push their final carry."""

    def __init__(self, carries_in):
        self.carries_in = None if carries_in is None else list(carries_in)
        self.carries_out: list = []

    def next_carry(self, default):
        if self.carries_in is None or not self.carries_in:
            return default
        return self.carries_in.pop(0)


_STREAM: list = []


def stream_state():
    return _STREAM[-1] if _STREAM else None


class AcousticModel:
    """Base: subclasses set ``out_dim`` in __init__ and implement
    ``init`` / ``apply``.

    ``compute_dtype = bfloat16`` (per-arch option) runs the matmul
    inputs in bf16 while keeping f32 parameters/accumulation — the
    standard TPU mixed-precision recipe (halves HBM traffic on
    activations/weights, doubles MXU rate)."""

    out_dim: int

    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        self.options = options
        self.input_dim = inp_dim
        self.to_do = options.get("to_do", "train")
        self.arch_name = options.get("arch_name", self.__class__.__name__)
        cd = str(options.get("compute_dtype", "") or "").lower()
        self.compute_dtype = jnp.bfloat16 if cd in ("bf16", "bfloat16") else None

    def _cast_in(self, *arrays):
        if self.compute_dtype is None:
            return arrays if len(arrays) > 1 else arrays[0]
        out = tuple(a.astype(self.compute_dtype) for a in arrays)
        return out if len(out) > 1 else out[0]

    def init(self, seed: int) -> Dict[str, Any]:
        raise NotImplementedError

    def apply(self, variables: Dict[str, Any], x: Array, *, train: bool,
              rng=None):
        raise NotImplementedError

    def apply_streaming(self, variables: Dict[str, Any], x: Array,
                        carries=None):
        """Chunked inference with carried recurrent state (impossible in
        the reference — its forward is whole-utterance only). ``x`` is
        one chunk ``(T_c, B, F)`` (or flat frames for frame-wise
        models); ``carries`` is the list returned by the previous call
        (None = fresh streams, zero state). Returns ``(y, carries)``
        where feeding the chunks back-to-back reproduces the
        full-utterance ``apply(train=False)`` output exactly.

        Eligibility: unidirectional models only (bidirectional needs
        the future); frame-wise models (MLP/CNN) stream trivially with
        empty carries. Fused one-kernel recurrences are bypassed (they
        assume zero initial state) — the lax.scan cell form runs
        instead, which at streaming chunk sizes is latency-bound
        anyway."""
        if getattr(self, "bidir", False) or getattr(self, "bidirectional",
                                                    False):
            raise ValueError("bidirectional models cannot stream (%s)"
                             % self.arch_name)
        from ..parallel.seqpipe import seq_parallel_context
        if seq_parallel_context() is not None:
            # the seq-pipelined scan would win the dispatch in _scan_cell
            # and silently drop the stream carries — refuse instead
            raise ValueError(
                "apply_streaming inside an active seq_parallel context is "
                "not supported (the time axis is already sharded)")
        ss = _StreamState(carries)
        _STREAM.append(ss)
        try:
            y, _ = self.apply(variables, x, train=False)
        finally:
            _STREAM.pop()
        return y, ss.carries_out

    # -- host-side compression hooks (called between chunks) ---------------
    def refresh_guided_masks(self, variables: Dict[str, Any], seed: int = 0
                             ) -> Dict[str, Any]:
        """Regenerate guided-HCGS masks from current weights (the
        reference's apply_ghcgs, called after each chunk once the guided
        phase starts, ref: core.py:298-300)."""
        return variables

    def refresh_patterns(self, variables: Dict[str, Any], seed: int = 0
                         ) -> Dict[str, Any]:
        """K-means pattern refresh (ref: neural_networks.py:876-884)."""
        return variables

    def regularizable_params(self, variables: Dict[str, Any]):
        """Non-1D trainable weights for cost_l1/l2/gl
        (ref: utils.py:24-60 iterate all >=2D parameters)."""
        out = []
        def walk(tree):
            for v in jax.tree_util.tree_leaves(tree):
                if v.ndim >= 2:
                    out.append(v)
        walk(variables["params"])
        return out
