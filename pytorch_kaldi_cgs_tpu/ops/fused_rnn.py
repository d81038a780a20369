"""Fused Pallas recurrences for the liGRU and vanilla RNN cells —
same design as ops.fused_lstm: the whole layer time-loop in ONE
pallas_call with the recurrent weights VMEM-resident and h carried in
VMEM scratch, plus a reverse-grid BPTT kernel emitting per-step gate
cotangents (dU is one dense matmul over the unrolled batch outside).

liGRU step (ref: neural_networks.py:1575-1583):
    z  = sigmoid(gz + h @ Uz.T)
    hc = act(gh + h @ Uh.T) * drop
    h  = z * h + (1 - z) * hc
RNN step (ref: neural_networks.py:1780-1931):
    h  = act(g + h @ U.T) * drop
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fused_lstm import (_ACTS, _DACTS, _bwd_stash_enabled,
                         _dact_from_pre, _q_input, _q_vmap)


@functools.lru_cache(maxsize=32)
def _build_ligru_fwd(T: int, B: int, H: int, act: str, qbits: int,
                     interpret: bool, with_init: bool = False,
                     stash: bool = False):
    """with_init=True adds an h0 input that seeds the VMEM carry at
    t==0 instead of zeros — the streaming-inference variant (same
    contract as fused_lstm._build_fwd). stash=True additionally emits
    the post-activation pair [actf(ah), z] (T, B, 2H) so the backward
    kernel skips its u-recompute dot + transcendentals (same lever as
    fused_lstm's stashed BPTT; see PERF.md round-4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(*refs):
        if with_init:
            g_ref, u_ref, drop_ref, h0_ref, *outs, h_ref = refs
        else:
            g_ref, u_ref, drop_ref, *outs, h_ref = refs
            h0_ref = None
        if stash:
            h_out, a_out = outs
        else:
            (h_out,) = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if with_init:
                h_ref[...] = h0_ref[...]
            else:
                h_ref[...] = jnp.zeros_like(h_ref)

        hq = _q_input(h_ref[...], qbits)
        u = jax.lax.dot_general(hq, u_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g_ref[0].astype(jnp.float32) + u         # (B, 2H): [h, z]
        a = actf(g[:, :H])
        hc = a * drop_ref[...]
        z = jax.nn.sigmoid(g[:, H:])
        h = z * h_ref[...] + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)
        if stash:
            a_out[0] = jnp.concatenate([a, z], axis=1).astype(a_out.dtype)

    def call(gates_t, U, drop_mask, h0=None):
        in_specs = [
            pl.BlockSpec((1, B, 2 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ]
        args = [gates_t, U, drop_mask]
        if with_init:
            in_specs.append(pl.BlockSpec((B, H), lambda t: (0, 0)))
            args.append(h0)
        out_specs = [pl.BlockSpec((1, B, H), lambda t: (t, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, 2 * H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, 2 * H),
                                                  jnp.float32))
        res = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs if stash else out_specs[0],
            out_shape=out_shape if stash else out_shape[0],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 2 * H,
                bytes_accessed=(T * B * 2 * H + 2 * H * H
                                + T * B * H
                                + (T * B * 2 * H if stash else 0)) * 4,
                transcendentals=T * B * H * 2),
        )(*args)
        return res

    return call


@functools.lru_cache(maxsize=32)
def _build_ligru_bwd_stash(T: int, B: int, H: int, act: str,
                           interpret: bool):
    """Reverse liGRU BPTT over STASHED [actf(ah), z]: no u-recompute
    dot, no gate transcendentals — the cotangent chain + ONE dot
    (dg @ U -> dh contribution)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dactf = _DACTS[act]

    def kernel(a_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        aa = a_ref[0].astype(jnp.float32)
        a = aa[:, :H]
        z = aa[:, H:]
        h_prev = hprev_ref[0].astype(jnp.float32)
        hc = a * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        daz = dz * z * (1.0 - z)
        dac = dh * (1.0 - z) * drop_ref[...] * dactf(a)
        dg = jnp.concatenate([dac, daz], axis=1)      # (B, 2H)
        dh_prev = dh * z + jax.lax.dot_general(
            dg, u_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(acts_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 2 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(acts_t, U, drop_mask, h_prev_seq, dhs)

    return call


@functools.lru_cache(maxsize=32)
def _build_ligru_bwd(T: int, B: int, H: int, act: str, qbits: int,
                     interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        u = jax.lax.dot_general(hq, u_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g_ref[0].astype(jnp.float32) + u
        ac = g[:, :H]
        hc = actf(ac) * drop_ref[...]
        z = jax.nn.sigmoid(g[:, H:])

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        daz = dz * z * (1.0 - z)
        dac = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ac)
        dg = jnp.concatenate([dac, daz], axis=1)      # (B, 2H)
        dh_prev = dh * z + jax.lax.dot_general(
            dg, u_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 2 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, U, drop_mask, h_prev_seq, dhs)

    return call


def ligru_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                     drop_mask: jnp.ndarray, act: str = "relu",
                     quant_bits: int = 0,
                     interpret: bool = False) -> jnp.ndarray:
    """hs = fused liGRU recurrence. gates_t: (T, B, 2H) ordered
    [wh, wz]; U: (2H, H) stacked [Uh, Uz]. Differentiable w.r.t. both
    (dU = dg^T @ q(h_prev) over the unrolled batch, outside the scan)."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("ligru")
    fwd = _build_ligru_fwd(T, B, H, act, quant_bits, interpret)
    if stash:
        fwd_s = _build_ligru_fwd(T, B, H, act, quant_bits, interpret,
                                 stash=True)
        bwd = _build_ligru_bwd_stash(T, B, H, act, interpret)
    else:
        bwd = _build_ligru_bwd(T, B, H, act, quant_bits, interpret)

    @jax.custom_vjp
    def _op(gates_t, U):
        return fwd(gates_t, U, drop)

    def _fwd_rule(gates_t, U):
        if stash:
            hs, acts = fwd_s(gates_t, U, drop)
            return hs, (None, U, hs, acts)
        hs = fwd(gates_t, U, drop)
        return hs, (gates_t, U, hs, None)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        if stash:
            dg = bwd(acts, U, drop, h_prev, dhs.astype(jnp.float32))
        else:
            dg = bwd(gates_t, U, drop, h_prev, dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        dU = jnp.einsum("mg,mh->gh", dg.reshape(M, 2 * H), hq,
                        preferred_element_type=jnp.float32)
        dgate = dg.astype(g_dt)
        return dgate, dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


def ligru_scan_fused_stream(gates_t: jnp.ndarray, U: jnp.ndarray,
                            drop_mask: jnp.ndarray, h0: jnp.ndarray,
                            act: str = "relu", quant_bits: int = 0,
                            interpret: bool = False):
    """Streaming (inference-only) fused liGRU: seeded with an initial h
    carry, returns ``(hs, h_T)`` so chunked forward passes keep the
    one-Pallas-call-per-layer speed. NOT differentiable (eval path)."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    fwd = _build_ligru_fwd(T, B, H, act, quant_bits, interpret,
                           with_init=True)
    hs = fwd(gates_t.astype(jnp.float32), U.astype(jnp.float32), drop,
             h0.astype(jnp.float32))
    return hs, hs[-1]


# ---------------------------------------------------------------------------
# GRU (update + reset gates; the reset gate re-enters the candidate's
# recurrent input, ref: neural_networks.py:1400-1410):
#     z  = sigmoid(gz + h @ Uz.T)
#     r  = sigmoid(gr + h @ Ur.T)
#     hc = act(gh + (r*h) @ Uh.T) * drop
#     h  = z * h + (1 - z) * hc
# gates_t ordered [h, z, r]; U rows stacked [Uh; Uz; Ur].
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _build_gru_fwd(T: int, B: int, H: int, act: str, qbits: int,
                   interpret: bool, with_init: bool = False,
                   stash: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(*refs):
        if with_init:
            g_ref, u_ref, drop_ref, h0_ref, *outs, h_ref = refs
        else:
            g_ref, u_ref, drop_ref, *outs, h_ref = refs
            h0_ref = None
        if stash:
            h_out, a_out = outs
        else:
            (h_out,) = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if with_init:
                h_ref[...] = h0_ref[...]
            else:
                h_ref[...] = jnp.zeros_like(h_ref)

        h_prev = h_ref[...]
        u = u_ref[...]                                # (3H, H) [Uh;Uz;Ur]
        g = g_ref[0].astype(jnp.float32)              # (B, 3H) [h, z, r]
        hq = _q_input(h_prev, qbits)
        uzr = jax.lax.dot_general(hq, u[H:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(g[:, H:2 * H] + uzr[:, :H])
        r = jax.nn.sigmoid(g[:, 2 * H:] + uzr[:, H:])
        sq = _q_input(r * h_prev, qbits)
        ah = g[:, :H] + jax.lax.dot_general(
            sq, u[:H], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = actf(ah)
        hc = a * drop_ref[...]
        h = z * h_prev + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)
        if stash:
            a_out[0] = jnp.concatenate([a, z, r],
                                       axis=1).astype(a_out.dtype)

    def call(gates_t, U, drop_mask, h0=None):
        in_specs = [
            pl.BlockSpec((1, B, 3 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((3 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ]
        args = [gates_t, U, drop_mask]
        if with_init:
            in_specs.append(pl.BlockSpec((B, H), lambda t: (0, 0)))
            args.append(h0)
        out_specs = [pl.BlockSpec((1, B, H), lambda t: (t, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, 3 * H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, 3 * H),
                                                  jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs if stash else out_specs[0],
            out_shape=out_shape if stash else out_shape[0],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 3 * H,
                bytes_accessed=(T * B * 3 * H + 3 * H * H
                                + T * B * H
                                + (T * B * 3 * H if stash else 0)) * 4,
                transcendentals=T * B * H * 3),
        )(*args)

    return call


@functools.lru_cache(maxsize=32)
def _build_gru_bwd_stash(T: int, B: int, H: int, act: str,
                         interpret: bool):
    """Reverse GRU BPTT over STASHED [actf(ah), z, r]: skips the two
    u-recompute dots and all three gate transcendentals; keeps the two
    backprop dots (ds via dah @ Uh, and dzr @ Uzr)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dactf = _DACTS[act]

    def kernel(a_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        aa = a_ref[0].astype(jnp.float32)
        a = aa[:, :H]
        z = aa[:, H:2 * H]
        r = aa[:, 2 * H:]
        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        hc = a * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        dah = dh * (1.0 - z) * drop_ref[...] * dactf(a)
        # ds = d(r*h_prev) through the STE-identity input quantizer
        ds = jax.lax.dot_general(dah, u[:H], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dr = ds * h_prev
        daz = dz * z * (1.0 - z)
        dar = dr * r * (1.0 - r)
        dzr = jnp.concatenate([daz, dar], axis=1)     # (B, 2H)
        dh_prev = dh * z + ds * r + jax.lax.dot_general(
            dzr, u[H:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = jnp.concatenate([dah, dzr], axis=1).astype(dg_out.dtype)

    def call(acts_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((3 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 3 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(acts_t, U, drop_mask, h_prev_seq, dhs)

    return call


@functools.lru_cache(maxsize=32)
def _build_gru_bwd(T: int, B: int, H: int, act: str, qbits: int,
                   interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        g = g_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        uzr = jax.lax.dot_general(hq, u[H:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(g[:, H:2 * H] + uzr[:, :H])
        r = jax.nn.sigmoid(g[:, 2 * H:] + uzr[:, H:])
        sq = _q_input(r * h_prev, qbits)
        ah = g[:, :H] + jax.lax.dot_general(
            sq, u[:H], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        hc = actf(ah) * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        dah = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ah)
        # ds = d(r*h_prev) through the STE-identity input quantizer
        ds = jax.lax.dot_general(dah, u[:H], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dr = ds * h_prev
        daz = dz * z * (1.0 - z)
        dar = dr * r * (1.0 - r)
        dzr = jnp.concatenate([daz, dar], axis=1)     # (B, 2H)
        dh_prev = dh * z + ds * r + jax.lax.dot_general(
            dzr, u[H:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = jnp.concatenate([dah, dzr], axis=1).astype(dg_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((3 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 3 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, U, drop_mask, h_prev_seq, dhs)

    return call


def gru_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                   drop_mask: jnp.ndarray, act: str = "tanh",
                   quant_bits: int = 0,
                   interpret: bool = False) -> jnp.ndarray:
    """hs = fused GRU recurrence. gates_t: (T, B, 3H) ordered
    [wh, wz, wr]; U: (3H, H) stacked [Uh, Uz, Ur]."""
    T, B, G3 = gates_t.shape
    H = G3 // 3
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("gru")
    fwd = _build_gru_fwd(T, B, H, act, quant_bits, interpret)
    if stash:
        fwd_s = _build_gru_fwd(T, B, H, act, quant_bits, interpret,
                               stash=True)
        bwd = _build_gru_bwd_stash(T, B, H, act, interpret)
    else:
        bwd = _build_gru_bwd(T, B, H, act, quant_bits, interpret)

    @jax.custom_vjp
    def _op(gates_t, U):
        return fwd(gates_t, U, drop)

    def _fwd_rule(gates_t, U):
        if stash:
            hs, acts = fwd_s(gates_t, U, drop)
            return hs, (None, U, hs, acts)
        hs = fwd(gates_t, U, drop)
        return hs, (gates_t, U, hs, None)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        M = T * B
        hp = h_prev.reshape(M, H)
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        if stash:
            dg = bwd(acts, U, drop, h_prev, dhs.astype(jnp.float32))
            # dUh's input (r*h) from the STASHED r — no recompute matmul
            s = acts.reshape(M, 3 * H)[:, 2 * H:] * hp
        else:
            dg = bwd(gates_t, U, drop, h_prev, dhs.astype(jnp.float32))
            # recompute r over the unrolled batch for dUh's input (r*h)
            ar = gates_t.reshape(M, 3 * H)[:, 2 * H:] + jnp.einsum(
                "mh,gh->mg", hq, U[2 * H:],
                preferred_element_type=jnp.float32)
            s = jax.nn.sigmoid(ar) * hp
        sq = _q_vmap(s.reshape(T, B, H), quant_bits).reshape(M, H)
        dgm = dg.reshape(M, 3 * H)
        dUh = jnp.einsum("mg,mh->gh", dgm[:, :H], sq,
                         preferred_element_type=jnp.float32)
        dUzr = jnp.einsum("mg,mh->gh", dgm[:, H:], hq,
                          preferred_element_type=jnp.float32)
        dU = jnp.concatenate([dUh, dUzr], axis=0)
        dgate = dg.astype(g_dt)
        return dgate, dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


def gru_scan_fused_stream(gates_t: jnp.ndarray, U: jnp.ndarray,
                          drop_mask: jnp.ndarray, h0: jnp.ndarray,
                          act: str = "tanh", quant_bits: int = 0,
                          interpret: bool = False):
    """Streaming (inference-only) fused GRU: seeded h carry, returns
    ``(hs, h_T)``. NOT differentiable (eval path)."""
    T, B, G3 = gates_t.shape
    H = G3 // 3
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    fwd = _build_gru_fwd(T, B, H, act, quant_bits, interpret, with_init=True)
    hs = fwd(gates_t.astype(jnp.float32), U.astype(jnp.float32), drop,
             h0.astype(jnp.float32))
    return hs, hs[-1]


# ---------------------------------------------------------------------------
# torch-semantics GRU (the GRU_cudnn wrapper, ref: neural_networks.py
# :400-430 via nn.GRU): the reset gate multiplies the ALREADY-projected
# recurrent candidate (r * (U_n h + b_hn)), unlike the cell GRU's
# (r*h) @ U_h — so the whole step is ONE (B, H) x (H, 3H) dot:
#     u        = h @ U.T + b_hh            # (B, 3H), torch order r,z,n
#     r, z     = sigmoid(gx_{r,z} + u_{r,z})
#     n        = tanh(gx_n + r * u_n)
#     h        = (1 - z) * n + z * h
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _build_gru_torch_fwd(T: int, B: int, H: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(g_ref, u_ref, bh_ref, h_out, h_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        h_prev = h_ref[...]
        u = jax.lax.dot_general(h_prev, u_ref[...],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = u + bh_ref[...]
        g = g_ref[0].astype(jnp.float32)              # (B, 3H) r,z,n
        r = jax.nn.sigmoid(g[:, :H] + u[:, :H])
        z = jax.nn.sigmoid(g[:, H:2 * H] + u[:, H:2 * H])
        n = jnp.tanh(g[:, 2 * H:] + r * u[:, 2 * H:])
        h = (1.0 - z) * n + z * h_prev
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)

    def call(gates_t, U, b_hh):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((3 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((1, 3 * H), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 3 * H,
                bytes_accessed=(T * B * 3 * H + 3 * H * H
                                + T * B * H) * 4,
                transcendentals=T * B * H * 3),
        )(gates_t, U, b_hh)

    return call


@functools.lru_cache(maxsize=32)
def _build_gru_torch_bwd(T: int, B: int, H: int, interpret: bool):
    """Reverse-time BPTT. Emits dg = (da_r, da_z, da_n) for the x-proj
    cotangent and dm = da_n * r (the grad on u_n) separately — dU/db_hh
    are single unrolled-batch reductions outside."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(g_ref, u_ref, bh_ref, hprev_ref, dh_in_ref, dg_out, dm_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        u = jax.lax.dot_general(h_prev, u_ref[...],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = u + bh_ref[...]
        g = g_ref[0].astype(jnp.float32)
        r = jax.nn.sigmoid(g[:, :H] + u[:, :H])
        z = jax.nn.sigmoid(g[:, H:2 * H] + u[:, H:2 * H])
        a_n = g[:, 2 * H:] + r * u[:, 2 * H:]
        n = jnp.tanh(a_n)

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - n)
        da_n = dh * (1.0 - z) * (1.0 - n * n)
        dr = da_n * u[:, 2 * H:]
        dm = da_n * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        du = jnp.concatenate([da_r, da_z, dm], axis=1)     # grads on u
        dh_prev = dh * z + jax.lax.dot_general(
            du, u_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = jnp.concatenate([da_r, da_z, da_n],
                                    axis=1).astype(dg_out.dtype)
        dm_out[0] = dm.astype(dm_out.dtype)

    def call(gates_t, U, b_hh, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((3 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((1, 3 * H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, U, b_hh, h_prev_seq, dhs)

    return call


def gru_cudnn_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                         b_hh, interpret: bool = False) -> jnp.ndarray:
    """hs = fused torch-semantics GRU recurrence for the GRU_cudnn
    wrapper. gates_t: (T, B, 3H) = x @ W_ih.T + b_ih in torch gate order
    [r, z, n]; U: (3H, H) = W_hh; b_hh: (3H,) or scalar 0.
    Differentiable w.r.t. all three."""
    T, B, G3 = gates_t.shape
    H = G3 // 3
    bh = jnp.broadcast_to(jnp.asarray(b_hh, jnp.float32).reshape(1, -1)
                          if np.ndim(b_hh) else
                          jnp.full((1, 3 * H), float(b_hh), jnp.float32),
                          (1, 3 * H))
    fwd = _build_gru_torch_fwd(T, B, H, interpret)
    bwd = _build_gru_torch_bwd(T, B, H, interpret)

    @jax.custom_vjp
    def _op(gates_t, U, bh):
        return fwd(gates_t, U, bh)

    def _fwd_rule(gates_t, U, bh):
        hs = fwd(gates_t, U, bh)
        return hs, (gates_t, U, bh, hs)

    def _bwd_rule(res, dhs):
        gates_t, U, bh, hs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        dg, dm = bwd(gates_t, U, bh, h_prev, dhs.astype(jnp.float32))
        M = T * B
        dgm = dg.reshape(M, 3 * H)
        # grads on u rows are (da_r, da_z, dm); dU/db_hh reduce them
        # over the unrolled batch (K=T*B matmul, not T K=B dots)
        du = jnp.concatenate([dgm[:, :2 * H], dm.reshape(M, H)], axis=1)
        dU = jnp.einsum("mg,mh->gh", du, h_prev.reshape(M, H),
                        preferred_element_type=jnp.float32)
        dbh = jnp.sum(du, axis=0, keepdims=True)
        return dg.astype(gates_t.dtype), dU.astype(U.dtype), dbh
    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U, bh)


# ---------------------------------------------------------------------------
# minimal GRU (the update gate also gates the candidate's recurrent
# input, ref: neural_networks.py:1602-1777):
#     z  = sigmoid(gz + h @ Uz.T)
#     hc = act(gh + (z*h) @ Uh.T) * drop
#     h  = z * h + (1 - z) * hc
# gates_t ordered [h, z]; U rows stacked [Uh; Uz].
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _build_mgru_fwd(T: int, B: int, H: int, act: str, qbits: int,
                    interpret: bool, with_init: bool = False,
                    stash: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(*refs):
        if with_init:
            g_ref, u_ref, drop_ref, h0_ref, *outs, h_ref = refs
        else:
            g_ref, u_ref, drop_ref, *outs, h_ref = refs
            h0_ref = None
        if stash:
            h_out, a_out = outs
        else:
            (h_out,) = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if with_init:
                h_ref[...] = h0_ref[...]
            else:
                h_ref[...] = jnp.zeros_like(h_ref)

        h_prev = h_ref[...]
        u = u_ref[...]                                # (2H, H) [Uh;Uz]
        g = g_ref[0].astype(jnp.float32)              # (B, 2H) [h, z]
        hq = _q_input(h_prev, qbits)
        uz = jax.lax.dot_general(hq, u[H:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(g[:, H:] + uz)
        sq = _q_input(z * h_prev, qbits)
        ah = g[:, :H] + jax.lax.dot_general(
            sq, u[:H], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = actf(ah)
        hc = a * drop_ref[...]
        h = z * h_prev + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)
        if stash:
            a_out[0] = jnp.concatenate([a, z], axis=1).astype(a_out.dtype)

    def call(gates_t, U, drop_mask, h0=None):
        in_specs = [
            pl.BlockSpec((1, B, 2 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ]
        args = [gates_t, U, drop_mask]
        if with_init:
            in_specs.append(pl.BlockSpec((B, H), lambda t: (0, 0)))
            args.append(h0)
        out_specs = [pl.BlockSpec((1, B, H), lambda t: (t, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, 2 * H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, 2 * H),
                                                  jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs if stash else out_specs[0],
            out_shape=out_shape if stash else out_shape[0],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(*args)

    return call


@functools.lru_cache(maxsize=32)
def _build_mgru_bwd_stash(T: int, B: int, H: int, act: str,
                          interpret: bool):
    """Reverse minimalGRU BPTT over STASHED [actf(ah), z]: no
    u-recompute dots, no transcendentals."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dactf = _DACTS[act]

    def kernel(a_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        aa = a_ref[0].astype(jnp.float32)
        a = aa[:, :H]
        z = aa[:, H:]
        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        hc = a * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dah = dh * (1.0 - z) * drop_ref[...] * dactf(a)
        ds = jax.lax.dot_general(dah, u[:H], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # z feeds both the mix and the gated recurrent input s = z*h
        dz = dh * (h_prev - hc) + ds * h_prev
        daz = dz * z * (1.0 - z)
        dh_prev = dh * z + ds * z + jax.lax.dot_general(
            daz, u[H:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = jnp.concatenate([dah, daz], axis=1).astype(dg_out.dtype)

    def call(acts_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 2 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(acts_t, U, drop_mask, h_prev_seq, dhs)

    return call


@functools.lru_cache(maxsize=32)
def _build_mgru_bwd(T: int, B: int, H: int, act: str, qbits: int,
                    interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        g = g_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        uz = jax.lax.dot_general(hq, u[H:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(g[:, H:] + uz)
        sq = _q_input(z * h_prev, qbits)
        ah = g[:, :H] + jax.lax.dot_general(
            sq, u[:H], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        hc = actf(ah) * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dah = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ah)
        ds = jax.lax.dot_general(dah, u[:H], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # z feeds both the mix and the gated recurrent input s = z*h
        dz = dh * (h_prev - hc) + ds * h_prev
        daz = dz * z * (1.0 - z)
        dh_prev = dh * z + ds * z + jax.lax.dot_general(
            daz, u[H:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dg_out[0] = jnp.concatenate([dah, daz], axis=1).astype(dg_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((2 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 2 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, U, drop_mask, h_prev_seq, dhs)

    return call


def mgru_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                    drop_mask: jnp.ndarray, act: str = "tanh",
                    quant_bits: int = 0,
                    interpret: bool = False) -> jnp.ndarray:
    """hs = fused minimalGRU recurrence. gates_t: (T, B, 2H) ordered
    [wh, wz]; U: (2H, H) stacked [Uh, Uz]."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("mgru")
    fwd = _build_mgru_fwd(T, B, H, act, quant_bits, interpret)
    if stash:
        fwd_s = _build_mgru_fwd(T, B, H, act, quant_bits, interpret,
                                stash=True)
        bwd = _build_mgru_bwd_stash(T, B, H, act, interpret)
    else:
        bwd = _build_mgru_bwd(T, B, H, act, quant_bits, interpret)

    @jax.custom_vjp
    def _op(gates_t, U):
        return fwd(gates_t, U, drop)

    def _fwd_rule(gates_t, U):
        if stash:
            hs, acts = fwd_s(gates_t, U, drop)
            return hs, (None, U, hs, acts)
        hs = fwd(gates_t, U, drop)
        return hs, (gates_t, U, hs, None)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        M = T * B
        hp = h_prev.reshape(M, H)
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        if stash:
            dg = bwd(acts, U, drop, h_prev, dhs.astype(jnp.float32))
            s = acts.reshape(M, 2 * H)[:, H:] * hp   # stashed z
        else:
            dg = bwd(gates_t, U, drop, h_prev, dhs.astype(jnp.float32))
            az = gates_t.reshape(M, 2 * H)[:, H:] + jnp.einsum(
                "mh,gh->mg", hq, U[H:], preferred_element_type=jnp.float32)
            s = jax.nn.sigmoid(az) * hp
        sq = _q_vmap(s.reshape(T, B, H), quant_bits).reshape(M, H)
        dgm = dg.reshape(M, 2 * H)
        dUh = jnp.einsum("mg,mh->gh", dgm[:, :H], sq,
                         preferred_element_type=jnp.float32)
        dUz = jnp.einsum("mg,mh->gh", dgm[:, H:], hq,
                         preferred_element_type=jnp.float32)
        dU = jnp.concatenate([dUh, dUz], axis=0)
        dgate = dg.astype(g_dt)
        return dgate, dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


def mgru_scan_fused_stream(gates_t: jnp.ndarray, U: jnp.ndarray,
                           drop_mask: jnp.ndarray, h0: jnp.ndarray,
                           act: str = "tanh", quant_bits: int = 0,
                           interpret: bool = False):
    """Streaming (inference-only) fused minimalGRU: seeded h carry,
    returns ``(hs, h_T)``. NOT differentiable (eval path)."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    fwd = _build_mgru_fwd(T, B, H, act, quant_bits, interpret,
                          with_init=True)
    hs = fwd(gates_t.astype(jnp.float32), U.astype(jnp.float32), drop,
             h0.astype(jnp.float32))
    return hs, hs[-1]


# ---------------------------------------------------------------------------
# vanilla RNN
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _build_rnn_fwd(T: int, B: int, H: int, act: str, qbits: int,
                   interpret: bool, with_init: bool = False,
                   stash: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(*refs):
        if with_init:
            g_ref, u_ref, drop_ref, h0_ref, *outs, h_ref = refs
        else:
            g_ref, u_ref, drop_ref, *outs, h_ref = refs
            h0_ref = None
        if stash:
            h_out, a_out = outs
        else:
            (h_out,) = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if with_init:
                h_ref[...] = h0_ref[...]
            else:
                h_ref[...] = jnp.zeros_like(h_ref)

        hq = _q_input(h_ref[...], qbits)
        u = jax.lax.dot_general(hq, u_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = actf(g_ref[0].astype(jnp.float32) + u)
        h = a * drop_ref[...]
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)
        if stash:
            # post-activation PRE-drop (h/drop divides by dropped zeros)
            a_out[0] = a.astype(a_out.dtype)

    def call(gates_t, U, drop_mask, h0=None):
        in_specs = [
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ]
        args = [gates_t, U, drop_mask]
        if with_init:
            in_specs.append(pl.BlockSpec((B, H), lambda t: (0, 0)))
            args.append(h0)
        out_specs = [pl.BlockSpec((1, B, H), lambda t: (t, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, H),
                                                  jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs if stash else out_specs[0],
            out_shape=out_shape if stash else out_shape[0],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(*args)

    return call


@functools.lru_cache(maxsize=32)
def _build_rnn_bwd_stash(T: int, B: int, H: int, act: str,
                         interpret: bool):
    """Reverse vanilla-RNN BPTT over the STASHED post-activation a:
    dg = dh*drop*act'(a) — no recompute dot, no transcendental."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dactf = _DACTS[act]

    def kernel(a_ref, u_ref, drop_ref, dh_in_ref, dg_out, dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        a = a_ref[0].astype(jnp.float32)
        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dg = dh * drop_ref[...] * dactf(a)
        dh_ref[...] = jax.lax.dot_general(
            dg, u_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(acts_t, U, drop_mask, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(acts_t, U, drop_mask, dhs)

    return call


@functools.lru_cache(maxsize=32)
def _build_rnn_bwd(T: int, B: int, H: int, act: str, qbits: int,
                   interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        u = jax.lax.dot_general(hq, u_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = g_ref[0].astype(jnp.float32) + u
        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dg = dh * drop_ref[...] * _dact_from_pre(act, a)
        dh_ref[...] = jax.lax.dot_general(
            dg, u_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, U, drop_mask, h_prev_seq, dhs)

    return call


def rnn_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                   drop_mask: jnp.ndarray, act: str = "tanh",
                   quant_bits: int = 0,
                   interpret: bool = False) -> jnp.ndarray:
    """hs = fused vanilla-RNN recurrence; gates_t: (T, B, H); U: (H, H)."""
    T, B, H = gates_t.shape
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("rnn")
    fwd = _build_rnn_fwd(T, B, H, act, quant_bits, interpret)
    if stash:
        fwd_s = _build_rnn_fwd(T, B, H, act, quant_bits, interpret,
                               stash=True)
        bwd = _build_rnn_bwd_stash(T, B, H, act, interpret)
    else:
        bwd = _build_rnn_bwd(T, B, H, act, quant_bits, interpret)

    @jax.custom_vjp
    def _op(gates_t, U):
        return fwd(gates_t, U, drop)

    def _fwd_rule(gates_t, U):
        if stash:
            hs, acts = fwd_s(gates_t, U, drop)
            return hs, (None, U, hs, acts)
        hs = fwd(gates_t, U, drop)
        return hs, (gates_t, U, hs, None)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        if stash:
            dg = bwd(acts, U, drop, dhs.astype(jnp.float32))
        else:
            dg = bwd(gates_t, U, drop, h_prev, dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        dU = jnp.einsum("mg,mh->gh", dg.reshape(M, H), hq,
                        preferred_element_type=jnp.float32)
        dgate = dg.astype(g_dt)
        return dgate, dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


def rnn_scan_fused_stream(gates_t: jnp.ndarray, U: jnp.ndarray,
                          drop_mask: jnp.ndarray, h0: jnp.ndarray,
                          act: str = "tanh", quant_bits: int = 0,
                          interpret: bool = False):
    """Streaming (inference-only) fused vanilla RNN: seeded h carry,
    returns ``(hs, h_T)``. NOT differentiable (eval path)."""
    T, B, H = gates_t.shape
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    fwd = _build_rnn_fwd(T, B, H, act, quant_bits, interpret, with_init=True)
    hs = fwd(gates_t.astype(jnp.float32), U.astype(jnp.float32), drop,
             h0.astype(jnp.float32))
    return hs, hs[-1]


def fits_vmem(B: int, H: int, n_gates: int, compute_dtype: str = "") -> bool:
    """Dtype-aware like fused_lstm.fits_vmem: bf16 halves U residency."""
    w_bytes = 2 if compute_dtype in ("bf16", "bfloat16") else 4
    weights = n_gates * H * H * w_bytes
    work = 6 * B * H * 4 + 3 * B * n_gates * H * 4
    return weights + work < 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# block-sparse fused recurrences (liGRU / vanilla RNN) — same design as
# fused_lstm.lstm_scan_fused_sparse: the gates share one HCGS mask, only
# KEPT recurrent blocks live in VMEM (per-gate row-major w3 layout), one
# batched dot per step with static column gathers; dU via the v3 dw
# kernel over the unrolled batch outside. The gated-input cells (GRU,
# minimalGRU) stay on their dense fused kernels: their candidate input
# r*h / z*h would need a second gather+dot per step.
# ---------------------------------------------------------------------------

from .fused_lstm import (_q_vmap, scatter_add_cols, sparse_dU, sparse_dh_parts,
                         sparse_recurrent_u, sparse_scan_fits_vmem)


@functools.lru_cache(maxsize=16)
def _build_ligru_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                            Nb: int, R: int, bs: int, col_idx: tuple,
                            interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    G = 2

    def kernel(g_ref, u_ref, drop_ref, h_out, h_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        hq = _q_input(h_ref[...], qbits)
        u = sparse_recurrent_u(hq, u_ref, Nb, R, bs, G, H, col_idx)
        g = g_ref[0].astype(jnp.float32) + u          # (B, 2H): [h, z]
        hc = actf(g[:, :H]) * drop_ref[...]
        z = jax.nn.sigmoid(g[:, H:])
        h = z * h_ref[...] + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)

    def call(gates_t, w3g, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Nb, G * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * bs * bs * Nb * R * G,
                bytes_accessed=(T * B * 2 * H + Nb * G * R * bs * bs
                                + T * B * H) * 4,
                transcendentals=T * B * H * 2),
        )(gates_t, w3g, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_ligru_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                            Nb: int, R: int, bs: int, col_idx: tuple,
                            interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    G = 2

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        u = sparse_recurrent_u(hq, u_ref, Nb, R, bs, G, H, col_idx)
        g = g_ref[0].astype(jnp.float32) + u
        ac = g[:, :H]
        hc = actf(ac) * drop_ref[...]
        z = jax.nn.sigmoid(g[:, H:])

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        daz = dz * z * (1.0 - z)
        dac = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ac)
        dg = jnp.concatenate([dac, daz], axis=1)      # (B, 2H)
        dpart = sparse_dh_parts(dg, u_ref, Nb, R, bs, G, H, col_idx)
        dh_ref[...] = dh * z
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, w3g, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((Nb, G * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 2 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask, h_prev_seq, dhs)

    return call


def ligru_scan_fused_sparse(gates_t: jnp.ndarray, w3g: jnp.ndarray,
                            layout, drop_mask: jnp.ndarray,
                            act: str = "relu", quant_bits: int = 0,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused liGRU recurrence with BLOCK-SPARSE recurrent matrices
    (uh/uz share one HCGS mask). gates_t: (T, B, 2H) [wh, wz]; w3g:
    (Nb, 2*bs, R*bs) packed kept blocks."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    G = 2
    bs, Nb, R = layout.bs, layout.Nb, layout.R
    col_idx = tuple(int(v) for v in layout.col_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    if sparse_scan_fits_vmem(B, H, layout, G) == "bf16":
        w3g = w3g.astype(jnp.bfloat16)
    fwd = _build_ligru_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                  col_idx, interpret)
    bwd = _build_ligru_bwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                  col_idx, interpret)

    @jax.custom_vjp
    def _op(gates_t, w3g):
        return fwd(gates_t, w3g, drop)

    def _fwd_rule(gates_t, w3g):
        hs = fwd(gates_t, w3g, drop)
        return hs, (gates_t, w3g, hs)

    def _bwd_rule(res, dhs):
        gates_t, w3g, hs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        dg = bwd(gates_t, w3g, drop, h_prev, dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        dw3g = sparse_dU(dg.reshape(M, G * H), hq, layout, G, interpret)
        return dg.astype(gates_t.dtype), dw3g.astype(w3g.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, w3g)


# --- GRU / minimalGRU sparse fused: the candidate's recurrent input is
# gated (r*h / z*h), so each step does TWO gather+dot passes against
# static gate-group slices of the packed w3g (gate-major within each
# block: rows [h | z | r] x bs). The bwd kernel additionally emits the
# gated input sequence s_t so dU needs no block-sparse recompute outside.

@functools.lru_cache(maxsize=16)
def _build_gru_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                          Nb: int, R: int, bs: int, col_idx: tuple,
                          interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, h_out, h_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        h_prev = h_ref[...]
        u = u_ref[...]                       # (Nb, 3*bs, R*bs) [h|z|r]
        g = g_ref[0].astype(jnp.float32)     # (B, 3H) [h, z, r]
        hq = _q_input(h_prev, qbits)
        uzr = sparse_recurrent_u(hq, u[:, bs:], Nb, R, bs, 2, H, col_idx)
        z = jax.nn.sigmoid(g[:, H:2 * H] + uzr[:, :H])
        r = jax.nn.sigmoid(g[:, 2 * H:] + uzr[:, H:])
        sq = _q_input(r * h_prev, qbits)
        uh = sparse_recurrent_u(sq, u[:, :bs], Nb, R, bs, 1, H, col_idx)
        hc = actf(g[:, :H] + uh) * drop_ref[...]
        h = z * h_prev + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)

    def call(gates_t, w3g, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Nb, 3 * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * bs * bs * Nb * R * 3,
                bytes_accessed=(T * B * 3 * H + Nb * 3 * R * bs * bs
                                + T * B * H) * 4,
                transcendentals=T * B * H * 3),
        )(gates_t, w3g, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_gru_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                          Nb: int, R: int, bs: int, col_idx: tuple,
                          interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               s_out, dh_ref, ds_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        g = g_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        uzr = sparse_recurrent_u(hq, u[:, bs:], Nb, R, bs, 2, H, col_idx)
        z = jax.nn.sigmoid(g[:, H:2 * H] + uzr[:, :H])
        r = jax.nn.sigmoid(g[:, 2 * H:] + uzr[:, H:])
        s = r * h_prev
        sq = _q_input(s, qbits)
        uh = sparse_recurrent_u(sq, u[:, :bs], Nb, R, bs, 1, H, col_idx)
        ah = g[:, :H] + uh
        hc = actf(ah) * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dz = dh * (h_prev - hc)
        dah = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ah)
        # ds = dah @ Uh over kept blocks only (STE through the quantizer)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        scatter_add_cols(ds_ref, sparse_dh_parts(dah, u[:, :bs], Nb, R,
                                                 bs, 1, H, col_idx),
                         Nb, R, bs, col_idx)
        ds = ds_ref[...]
        dr = ds * h_prev
        daz = dz * z * (1.0 - z)
        dar = dr * r * (1.0 - r)
        dzr = jnp.concatenate([daz, dar], axis=1)
        dpart = sparse_dh_parts(dzr, u[:, bs:], Nb, R, bs, 2, H, col_idx)
        dh_ref[...] = dh * z + ds * r
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dg_out[0] = jnp.concatenate([dah, dzr], axis=1).astype(dg_out.dtype)
        s_out[0] = s.astype(s_out.dtype)

    def call(gates_t, w3g, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((Nb, 3 * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 3 * H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask, h_prev_seq, dhs)

    return call


def gru_scan_fused_sparse(gates_t: jnp.ndarray, w3g: jnp.ndarray,
                          layout, drop_mask: jnp.ndarray,
                          act: str = "tanh", quant_bits: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused GRU recurrence with BLOCK-SPARSE recurrent matrices
    (uh/uz/ur share one HCGS mask). gates_t: (T, B, 3H) [wh, wz, wr];
    w3g: (Nb, 3*bs, R*bs)."""
    T, B, G3 = gates_t.shape
    H = G3 // 3
    bs, Nb, R = layout.bs, layout.Nb, layout.R
    col_idx = tuple(int(v) for v in layout.col_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    if sparse_scan_fits_vmem(B, H, layout, 3) == "bf16":
        w3g = w3g.astype(jnp.bfloat16)
    fwd = _build_gru_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                col_idx, interpret)
    bwd = _build_gru_bwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                col_idx, interpret)

    @jax.custom_vjp
    def _op(gates_t, w3g):
        return fwd(gates_t, w3g, drop)

    def _fwd_rule(gates_t, w3g):
        hs = fwd(gates_t, w3g, drop)
        return hs, (gates_t, w3g, hs)

    def _bwd_rule(res, dhs):
        gates_t, w3g, hs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        dg, s_seq = bwd(gates_t, w3g, drop, h_prev,
                        dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        sq = _q_vmap(s_seq, quant_bits).reshape(M, H)
        dgm = dg.reshape(M, 3 * H)
        dUh = sparse_dU(dgm[:, :H], sq, layout, 1, interpret)
        dUzr = sparse_dU(dgm[:, H:], hq, layout, 2, interpret)
        dw3g = jnp.concatenate([dUh, dUzr], axis=1)   # [h | z | r]
        return dg.astype(gates_t.dtype), dw3g.astype(w3g.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, w3g)


@functools.lru_cache(maxsize=16)
def _build_mgru_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                           Nb: int, R: int, bs: int, col_idx: tuple,
                           interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, h_out, h_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        h_prev = h_ref[...]
        u = u_ref[...]                       # (Nb, 2*bs, R*bs) [h|z]
        g = g_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        uz = sparse_recurrent_u(hq, u[:, bs:], Nb, R, bs, 1, H, col_idx)
        z = jax.nn.sigmoid(g[:, H:] + uz)
        sq = _q_input(z * h_prev, qbits)
        uh = sparse_recurrent_u(sq, u[:, :bs], Nb, R, bs, 1, H, col_idx)
        hc = actf(g[:, :H] + uh) * drop_ref[...]
        h = z * h_prev + (1.0 - z) * hc
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)

    def call(gates_t, w3g, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Nb, 2 * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_mgru_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                           Nb: int, R: int, bs: int, col_idx: tuple,
                           interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               s_out, dh_ref, ds_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        u = u_ref[...]
        g = g_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        uz = sparse_recurrent_u(hq, u[:, bs:], Nb, R, bs, 1, H, col_idx)
        z = jax.nn.sigmoid(g[:, H:] + uz)
        s = z * h_prev
        sq = _q_input(s, qbits)
        uh = sparse_recurrent_u(sq, u[:, :bs], Nb, R, bs, 1, H, col_idx)
        ah = g[:, :H] + uh
        hc = actf(ah) * drop_ref[...]

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dah = dh * (1.0 - z) * drop_ref[...] * _dact_from_pre(act, ah)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        scatter_add_cols(ds_ref, sparse_dh_parts(dah, u[:, :bs], Nb, R,
                                                 bs, 1, H, col_idx),
                         Nb, R, bs, col_idx)
        ds = ds_ref[...]
        dz = dh * (h_prev - hc) + ds * h_prev
        daz = dz * z * (1.0 - z)
        dpart = sparse_dh_parts(daz, u[:, bs:], Nb, R, bs, 1, H, col_idx)
        dh_ref[...] = dh * z + ds * z
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dg_out[0] = jnp.concatenate([dah, daz], axis=1).astype(dg_out.dtype)
        s_out[0] = s.astype(s_out.dtype)

    def call(gates_t, w3g, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((Nb, 2 * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 2 * H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask, h_prev_seq, dhs)

    return call


def mgru_scan_fused_sparse(gates_t: jnp.ndarray, w3g: jnp.ndarray,
                           layout, drop_mask: jnp.ndarray,
                           act: str = "tanh", quant_bits: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused minimalGRU recurrence with BLOCK-SPARSE recurrent matrices.
    gates_t: (T, B, 2H) [wh, wz]; w3g: (Nb, 2*bs, R*bs)."""
    T, B, G2 = gates_t.shape
    H = G2 // 2
    bs, Nb, R = layout.bs, layout.Nb, layout.R
    col_idx = tuple(int(v) for v in layout.col_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    if sparse_scan_fits_vmem(B, H, layout, 2) == "bf16":
        w3g = w3g.astype(jnp.bfloat16)
    fwd = _build_mgru_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                 col_idx, interpret)
    bwd = _build_mgru_bwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                 col_idx, interpret)

    @jax.custom_vjp
    def _op(gates_t, w3g):
        return fwd(gates_t, w3g, drop)

    def _fwd_rule(gates_t, w3g):
        hs = fwd(gates_t, w3g, drop)
        return hs, (gates_t, w3g, hs)

    def _bwd_rule(res, dhs):
        gates_t, w3g, hs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        dg, s_seq = bwd(gates_t, w3g, drop, h_prev,
                        dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        sq = _q_vmap(s_seq, quant_bits).reshape(M, H)
        dgm = dg.reshape(M, 2 * H)
        dUh = sparse_dU(dgm[:, :H], sq, layout, 1, interpret)
        dUz = sparse_dU(dgm[:, H:], hq, layout, 1, interpret)
        dw3g = jnp.concatenate([dUh, dUz], axis=1)    # [h | z]
        return dg.astype(gates_t.dtype), dw3g.astype(w3g.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, w3g)


@functools.lru_cache(maxsize=16)
def _build_rnn_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                          Nb: int, R: int, bs: int, col_idx: tuple,
                          interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, h_out, h_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        hq = _q_input(h_ref[...], qbits)
        u = sparse_recurrent_u(hq, u_ref, Nb, R, bs, 1, H, col_idx)
        h = actf(g_ref[0].astype(jnp.float32) + u) * drop_ref[...]
        h_ref[...] = h
        h_out[0] = h.astype(h_out.dtype)

    def call(gates_t, w3g, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Nb, bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_rnn_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                          Nb: int, R: int, bs: int, col_idx: tuple,
                          interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, dh_in_ref, dg_out,
               dh_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)

        h_prev = hprev_ref[0].astype(jnp.float32)
        hq = _q_input(h_prev, qbits)
        u = sparse_recurrent_u(hq, u_ref, Nb, R, bs, 1, H, col_idx)
        a = g_ref[0].astype(jnp.float32) + u
        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dg = dh * drop_ref[...] * _dact_from_pre(act, a)
        dpart = sparse_dh_parts(dg, u_ref, Nb, R, bs, 1, H, col_idx)
        dh_ref[...] = jnp.zeros_like(dh_ref)
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, w3g, drop_mask, h_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((Nb, bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(gates_t, w3g, drop_mask, h_prev_seq, dhs)

    return call


def rnn_scan_fused_sparse(gates_t: jnp.ndarray, w3g: jnp.ndarray,
                          layout, drop_mask: jnp.ndarray,
                          act: str = "tanh", quant_bits: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused vanilla-RNN recurrence with a BLOCK-SPARSE recurrent
    matrix. gates_t: (T, B, H); w3g: (Nb, bs, R*bs)."""
    T, B, H = gates_t.shape
    bs, Nb, R = layout.bs, layout.Nb, layout.R
    col_idx = tuple(int(v) for v in layout.col_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    if sparse_scan_fits_vmem(B, H, layout, 1) == "bf16":
        w3g = w3g.astype(jnp.bfloat16)
    fwd = _build_rnn_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                col_idx, interpret)
    bwd = _build_rnn_bwd_sparse(T, B, H, act, quant_bits, Nb, R, bs,
                                col_idx, interpret)

    @jax.custom_vjp
    def _op(gates_t, w3g):
        return fwd(gates_t, w3g, drop)

    def _fwd_rule(gates_t, w3g):
        hs = fwd(gates_t, w3g, drop)
        return hs, (gates_t, w3g, hs)

    def _bwd_rule(res, dhs):
        gates_t, w3g, hs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        dg = bwd(gates_t, w3g, drop, h_prev, dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        dw3g = sparse_dU(dg.reshape(M, H), hq, layout, 1, interpret)
        return dg.astype(gates_t.dtype), dw3g.astype(w3g.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, w3g)
