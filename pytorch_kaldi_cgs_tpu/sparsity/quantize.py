"""Weight/activation fake-quantization with straight-through gradients.

Replicates the reference's ceil-based symmetric quantizer *verbatim*
(ref: quantized_modules.py:77-119 — this deviates from standard
round-based fake-quant, SURVEY §7.3 item 6) but functionally: instead of
mutating ``weight.data`` around ``F.linear``
(ref: quantized_modules.py:207-222), the jitted step computes
``w + stop_gradient(q(w) - w)`` which XLA fuses into the matmul's
producer — the same straight-through estimator the torch in-place trick
produces, with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Ceil-based symmetric weight quantizer (ref ``Quantize`` with
    ``balanced=False``, quantized_modules.py:77-97):
    clip to [-1,1], then |w| -> ceil(|w| * 2^(b-1)) / 2^(b-1), restore sign.
    """
    scale = 2.0 ** (num_bits - 1)
    w = jnp.clip(w, -1.0, 1.0)
    sign = jnp.sign(w)
    q = jnp.ceil(jnp.abs(w) * scale) / scale
    return q * sign


def quantize_weight_balanced(w: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """The ``balanced=True`` variant: scale by 2.5x the mean of nonzero
    |w| before the ceil quantization (ref: quantized_modules.py:81-89)."""
    scale = 2.0 ** (num_bits - 1)
    w = jnp.clip(w, -1.0, 1.0)
    sign = jnp.sign(w)
    nz = (w != 0).astype(w.dtype)
    mean = jnp.sum(jnp.abs(w) * nz) / jnp.maximum(jnp.sum(nz), 1.0)
    s = mean * 2.5
    q = jnp.ceil(jnp.ceil(jnp.abs(w) / s * scale) * s) / scale
    q = jnp.clip(q, -1.0, 1.0)
    return q * sign


def quantize_input(x: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Activation quantizer (ref ``Quantize_inp``,
    quantized_modules.py:99-119): normalize by max |x|, ceil-quantize the
    magnitude to 2^(b-1) levels, rescale. No-op for an all-zero tensor."""
    scale = 2.0 ** (num_bits - 1)
    var = jnp.max(jnp.abs(x))
    sign = jnp.sign(x)
    safe = jnp.where(var == 0, 1.0, var)
    q = jnp.ceil(jnp.abs(x) / safe * scale) / scale * safe * sign
    return jnp.where(var == 0, x, q)


def _ste(x: jnp.ndarray, qx: jnp.ndarray) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(qx - x)


def ste_quantize_weight(w: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Straight-through weight quantization for training."""
    return _ste(w, quantize_weight(w, num_bits))


def ste_quantize_input(x: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    return _ste(x, quantize_input(x, num_bits))


# ---------------------------------------------------------------------------
# 1-bit (binary) networks (ref: quantized_modules.py:30-34 Binarize,
# :143-178 BinarizeLinear, :247-267 BinarizeConv2d). NB the ceil
# quantizer at num_bits=1 already reduces to sign() on [-1,1]-clipped
# weights — ceil(|w|)/1 = 1 for any nonzero w — so ``param_quant = 1``
# through ste_quantize_weight IS the deterministic binary path; these
# give it an explicit API plus the stochastic variant.
# ---------------------------------------------------------------------------

def binarize(w: jnp.ndarray) -> jnp.ndarray:
    """Deterministic binarization: sign(w) (sign(0) = 0, like torch)."""
    return jnp.sign(w)


def binarize_stochastic(w: jnp.ndarray, key) -> jnp.ndarray:
    """Stochastic binarization (ref Binarize quant_mode!='det'):
    P(+1) = clip((w+1)/2, 0, 1) via additive U(-0.5, 0.5) + round."""
    u = jax.random.uniform(key, w.shape, w.dtype, -0.5, 0.5)
    return jnp.round(jnp.clip((w + 1.0) / 2.0 + u, 0.0, 1.0)) * 2.0 - 1.0


def ste_binarize(w: jnp.ndarray) -> jnp.ndarray:
    """Straight-through sign() for training (the BinarizeLinear
    quantize-matmul-restore trick, functionally)."""
    return _ste(w, binarize(w))


def binary_linear(x: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None) -> jnp.ndarray:
    """F.linear with sign-binarized weights (ref BinarizeLinear.forward)."""
    y = x @ ste_binarize(w).T
    return y if b is None else y + b


def binary_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None, stride=(1, 1),
                  padding="VALID", binarize_input: bool = True
                  ) -> jnp.ndarray:
    """conv2d with sign-binarized weights (+inputs unless the input is
    3-channel RGB, ref BinarizeConv2d.forward). x: (N, C, H, W),
    w: (O, I, kH, kW) — torch layouts."""
    if binarize_input and x.shape[1] != 3:
        x = _ste(x, binarize(x))
    y = jax.lax.conv_general_dilated(
        x, ste_binarize(w), window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y
