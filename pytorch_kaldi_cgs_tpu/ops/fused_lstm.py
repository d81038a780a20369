"""Fused LSTM recurrence kernel: the whole layer's time loop inside ONE
Pallas call, with the recurrent weights VMEM-resident across steps.

Why: the flagship train step is dominated by the scan — T sequential
(B, H) x (H, 4H) matmuls. Under ``lax.scan`` XLA re-streams the 4MB
recurrent matrix from HBM every step (T=300, 2 layers -> ~2.4 GB of
pure weight re-reads per forward) and pays per-step loop overhead. Here
the grid is (T,); U lives in VMEM the whole time; h/c persist in VMEM
scratch between grid steps; per step the kernel reads one (B, 4H)
gate slice and writes one (B, H) output slice.

Equations match models.recurrent.LSTM._run_scan exactly
(ref: neural_networks.py:1077-1097):

    u = h @ U.T                      # U: (4H, H), gate order f,i,o,c
    f,i,o = sigmoid(g[...] + u[...])
    c = i * act(gc) * drop + f * c
    h = o * act(c)

Backward is a second sequential kernel (reverse grid) with U
VMEM-resident; activations are recomputed per step from the saved h/c
sequences, so residual memory is the same (T, B, H) pair the scan keeps
anyway. dU is accumulated OUTSIDE the kernel as one (4H, T*B)@(T*B, H)
matmul over the emitted dg sequence (a per-step in-kernel dU dot has
contraction K=B and starves the MXU — measured ~40% of the kernel).

Supported: act in {tanh, relu, htanh}, no in-scan layer norm (laynorm
configs fall back to lax.scan), f32 or bf16 gates. 4H*H weights must
fit VMEM (H <= ~1200 at f32, train and inference alike; larger falls
back automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ACTS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "htanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "linear": lambda x: x,
}

def _q_input(x, bits: int):
    """Per-step recurrent-input quantizer (ref Quantize_inp,
    quantized_modules.py:99-119) applied to h before the recurrent
    matmul when the model trains with activation quantization."""
    if bits <= 0:
        return x
    scale = 2.0 ** (bits - 1)
    var = jnp.max(jnp.abs(x))
    safe = jnp.where(var == 0, 1.0, var)
    q = jnp.ceil(jnp.abs(x) / safe * scale) / scale * safe * jnp.sign(x)
    return jnp.where(var == 0, x, q)


_DACTS = {
    "tanh": lambda y: 1.0 - y * y,            # from act OUTPUT
    "relu": lambda y: (y > 0).astype(y.dtype),
    "htanh": lambda y: ((y > -1.0) & (y < 1.0)).astype(y.dtype),
    "linear": lambda y: jnp.ones_like(y),
}



def _q_vmap(h_seq, bits: int):
    """Per-timestep activation quantization of a (T, B, H) sequence —
    the scale must match the fwd kernels' per-step _q_input over each
    (B, H) block; one global scale over the whole sequence biases dU at
    every step whose max|h| differs from the sequence max."""
    if bits <= 0:
        return h_seq
    return jax.vmap(lambda h: _q_input(h, bits))(h_seq)

def _dact_from_pre(act, x):
    """act'(x) from the PRE-activation (used in backward recompute)."""
    if act == "tanh":
        t = jnp.tanh(x)
        return 1.0 - t * t
    if act == "relu":
        return (x > 0).astype(x.dtype)
    if act == "htanh":
        return ((x > -1.0) & (x < 1.0)).astype(x.dtype)
    return jnp.ones_like(x)


@functools.lru_cache(maxsize=32)
def _build_fwd(T: int, B: int, H: int, act: str, qbits: int,
               interpret: bool, with_init: bool = False,
               cdt: str = "", stash: bool = False):
    """with_init=True adds (h0, c0) inputs that seed the VMEM carry at
    t==0 instead of zeros — the streaming-inference variant.
    cdt="bf16" runs the recurrent dot with bf16 inputs (U resident in
    VMEM as bf16, h cast per step) and f32 accumulation — the dot is
    weight-streaming-bound at small M, so halving the U bytes per MXU
    pass is the win; carries and gate math stay f32.
    stash=True additionally emits the post-activation gates (T, B, 4H)
    so the backward kernel can skip its per-step u-recompute dot +
    transcendentals (PERF.md round-4 lever: bwd was 0.86 ms vs 0.31 ms
    fwd, all recompute)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    in_dt = jnp.bfloat16 if cdt == "bf16" else jnp.float32

    def kernel(*refs):
        if with_init:
            (g_ref, u_ref, drop_ref, h0_ref, c0_ref,
             *outs, h_ref, c_ref) = refs
        else:
            g_ref, u_ref, drop_ref, *outs, h_ref, c_ref = refs
            h0_ref = c0_ref = None
        if stash:
            h_out, c_out, a_out = outs
        else:
            h_out, c_out = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if with_init:
                h_ref[...] = h0_ref[...]
                c_ref[...] = c0_ref[...]
            else:
                h_ref[...] = jnp.zeros_like(h_ref)
                c_ref[...] = jnp.zeros_like(c_ref)

        u = jax.lax.dot_general(
            _q_input(h_ref[...], qbits).astype(in_dt), u_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = g_ref[0].astype(jnp.float32) + u
        gf = jax.nn.sigmoid(g[:, :H])
        gi = jax.nn.sigmoid(g[:, H:2 * H])
        go = jax.nn.sigmoid(g[:, 2 * H:3 * H])
        gc = actf(g[:, 3 * H:])
        c = gi * gc * drop_ref[...] + gf * c_ref[...]
        h = go * actf(c)
        h_ref[...] = h
        c_ref[...] = c
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = c.astype(c_out.dtype)
        if stash:
            a_out[0] = jnp.concatenate([gf, gi, go, gc],
                                       axis=1).astype(a_out.dtype)

    def call(gates_t, U, drop_mask, h0=None, c0=None):
        in_specs = [
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
        ]
        args = [gates_t, U, drop_mask]
        if with_init:
            in_specs += [pl.BlockSpec((B, H), lambda t: (0, 0)),
                         pl.BlockSpec((B, H), lambda t: (0, 0))]
            args += [h0, c0]
        out_specs = [
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, 4 * H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, 4 * H),
                                                  jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 4 * H,
                bytes_accessed=(T * B * 4 * H + 4 * H * H
                                + 2 * T * B * H
                                + (T * B * 4 * H if stash else 0)) * 4,
                transcendentals=T * B * H * 4),
        )(*args)

    return call


def lstm_scan_fused_stream(gates_t: jnp.ndarray, U: jnp.ndarray,
                           drop_mask: jnp.ndarray, h0: jnp.ndarray,
                           c0: jnp.ndarray, act: str = "tanh",
                           quant_bits: int = 0, interpret: bool = False):
    """Streaming (inference-only) fused recurrence: like
    :func:`lstm_scan_fused` but seeded with an initial (h0, c0) carry
    and returning ``(hs, (h_T, c_T))`` so chunked forward passes keep
    the one-Pallas-call-per-layer speed. NOT differentiable (no VJP —
    streaming is an eval path; training always starts from zero state,
    ref core.py:183-200 pads fresh sequences)."""
    T, B, G4 = gates_t.shape
    H = G4 // 4
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    fwd = _build_fwd(T, B, H, act, quant_bits, interpret, with_init=True)
    hs, cs = fwd(gates_t.astype(jnp.float32), U.astype(jnp.float32), drop,
                 h0.astype(jnp.float32), c0.astype(jnp.float32))
    return hs, (hs[-1], cs[-1])


@functools.lru_cache(maxsize=32)
def _build_bwd(T: int, B: int, H: int, act: str, qbits: int,
               interpret: bool, cdt: str = "", with_init: bool = False):
    """Reverse-time BPTT kernel. Grid (T,) with index map t -> T-1-t.
    Recomputes the gate pre-activations from (h_{t-1}, gates_t); carries
    (dh, dc) in scratch. dU is NOT accumulated here: the per-step
    dU += dg^T @ h_prev dot has contraction K=B (16-ish) — MXU-starved —
    and measured ~40% of the kernel; the caller computes dU as ONE
    (4H, T*B)@(T*B, H) matmul over the emitted dg sequence instead
    (the same split the sparse variant uses via sparse_dU).

    with_init=True is the seeded-carry (streaming / seq-parallel slab)
    variant: two extra inputs (dhT, dcT) seed the reverse carry — the
    cotangents of the returned final state — and two extra outputs emit
    (dh0, dc0), the cotangents of the initial state, written at the last
    grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    in_dt = jnp.bfloat16 if cdt == "bf16" else jnp.float32

    def kernel(*refs):
        if with_init:
            (g_ref, u_ref, drop_ref, hprev_ref, cprev_ref, dh_in_ref,
             dhT_ref, dcT_ref, dg_out, dh0_out, dc0_out,
             dh_ref, dc_ref) = refs
        else:
            (g_ref, u_ref, drop_ref, hprev_ref, cprev_ref, dh_in_ref,
             dg_out, dh_ref, dc_ref) = refs
            dhT_ref = dcT_ref = dh0_out = dc0_out = None
        t = pl.program_id(0)          # 0..T-1, processing step T-1-t

        @pl.when(t == 0)
        def _():
            if with_init:
                dh_ref[...] = dhT_ref[...]
                dc_ref[...] = dcT_ref[...]
            else:
                dh_ref[...] = jnp.zeros_like(dh_ref)
                dc_ref[...] = jnp.zeros_like(dc_ref)

        h_prev = _q_input(hprev_ref[0].astype(jnp.float32), qbits)
        c_prev = cprev_ref[0].astype(jnp.float32)
        u = jax.lax.dot_general(h_prev.astype(in_dt), u_ref[...],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g_ref[0].astype(jnp.float32) + u
        gf = jax.nn.sigmoid(g[:, :H])
        gi = jax.nn.sigmoid(g[:, H:2 * H])
        go = jax.nn.sigmoid(g[:, 2 * H:3 * H])
        gc_pre = g[:, 3 * H:]
        gc = actf(gc_pre)
        drop = drop_ref[...]
        c = gi * gc * drop + gf * c_prev
        ac = actf(c)

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dc = dc_ref[...] + dh * go * _dact_from_pre(act, c)
        dgo = dh * ac * go * (1.0 - go)
        dgf = dc * c_prev * gf * (1.0 - gf)
        dgi = dc * gc * drop * gi * (1.0 - gi)
        dgc = dc * gi * drop * _dact_from_pre(act, gc_pre)
        dg = jnp.concatenate([dgf, dgi, dgo, dgc], axis=1)   # (B, 4H)
        # backprop into h_{t-1} through u = h @ U.T
        dh_prev = jax.lax.dot_general(dg.astype(in_dt), u_ref[...],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)
        if with_init:
            @pl.when(t == T - 1)
            def _():
                dh0_out[...] = dh_prev.astype(dh0_out.dtype)
                dc0_out[...] = (dc * gf).astype(dc0_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, c_prev_seq, dhs,
             dhT=None, dcT=None):
        rev = lambda t: (T - 1 - t, 0, 0)
        in_specs = [
            pl.BlockSpec((1, B, 4 * H), rev),
            pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
        ]
        args = [gates_t, U, drop_mask, h_prev_seq, c_prev_seq, dhs]
        out_specs = pl.BlockSpec((1, B, 4 * H), rev)
        out_shape = jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32)
        if with_init:
            in_specs += [pl.BlockSpec((B, H), lambda t: (0, 0)),
                         pl.BlockSpec((B, H), lambda t: (0, 0))]
            args += [dhT, dcT]
            out_specs = [out_specs,
                         pl.BlockSpec((B, H), lambda t: (0, 0)),
                         pl.BlockSpec((B, H), lambda t: (0, 0))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((B, H), jnp.float32),
                         jax.ShapeDtypeStruct((B, H), jnp.float32)]
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * T * B * H * 4 * H,
                bytes_accessed=(2 * T * B * 4 * H + 4 * H * H
                                + 4 * T * B * H) * 4,
                transcendentals=2 * T * B * H * 4),
        )(*args)

    return call


@functools.lru_cache(maxsize=32)
def _build_bwd_stash(T: int, B: int, H: int, act: str,
                     interpret: bool, cdt: str = "",
                     with_init: bool = False):
    """Reverse-time BPTT kernel over STASHED gate activations: the
    forward's post-activation gates (T, B, 4H) stream in, so per step
    this kernel does NO u-recompute dot and NO gate transcendentals —
    just the elementwise cotangent chain, one actf(c) (for d tanh(c)),
    and ONE dot (dg @ U -> dh_prev). Replaces the recompute bwd
    (measured 0.86 ms vs the 0.31 ms fwd at the flagship shape — the
    gap was all recompute). Costs one extra (T, B, 4H) f32 residual in
    HBM (~39 MB at T=300, B=16, H=512).

    No qbits parameter: the quantizer only touched the recomputed u,
    and the dh_prev cotangent passes straight through the quantizer
    (STE, ref quantized_modules.py:207-244) exactly as before."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    dactf = _DACTS[act]
    in_dt = jnp.bfloat16 if cdt == "bf16" else jnp.float32

    def kernel(*refs):
        if with_init:
            (a_ref, u_ref, drop_ref, c_ref_seq, cprev_ref, dh_in_ref,
             dhT_ref, dcT_ref, dg_out, dh0_out, dc0_out,
             dh_ref, dc_ref) = refs
        else:
            (a_ref, u_ref, drop_ref, c_ref_seq, cprev_ref, dh_in_ref,
             dg_out, dh_ref, dc_ref) = refs
            dhT_ref = dcT_ref = dh0_out = dc0_out = None
        t = pl.program_id(0)          # 0..T-1, processing step T-1-t

        @pl.when(t == 0)
        def _():
            if with_init:
                dh_ref[...] = dhT_ref[...]
                dc_ref[...] = dcT_ref[...]
            else:
                dh_ref[...] = jnp.zeros_like(dh_ref)
                dc_ref[...] = jnp.zeros_like(dc_ref)

        a = a_ref[0].astype(jnp.float32)
        gf = a[:, :H]
        gi = a[:, H:2 * H]
        go = a[:, 2 * H:3 * H]
        gc = a[:, 3 * H:]
        cc = c_ref_seq[0].astype(jnp.float32)
        c_prev = cprev_ref[0].astype(jnp.float32)
        drop = drop_ref[...]
        ac = actf(cc)

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dc = dc_ref[...] + dh * go * dactf(ac)
        dgo = dh * ac * go * (1.0 - go)
        dgf = dc * c_prev * gf * (1.0 - gf)
        dgi = dc * gc * drop * gi * (1.0 - gi)
        dgc = dc * gi * drop * dactf(gc)
        dg = jnp.concatenate([dgf, dgi, dgo, dgc], axis=1)   # (B, 4H)
        dh_prev = jax.lax.dot_general(dg.astype(in_dt), u_ref[...],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)
        if with_init:
            @pl.when(t == T - 1)
            def _():
                dh0_out[...] = dh_prev.astype(dh0_out.dtype)
                dc0_out[...] = (dc * gf).astype(dc0_out.dtype)

    def call(acts_t, U, drop_mask, c_seq, c_prev_seq, dhs,
             dhT=None, dcT=None):
        rev = lambda t: (T - 1 - t, 0, 0)
        in_specs = [
            pl.BlockSpec((1, B, 4 * H), rev),
            pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((B, H), lambda t: (0, 0)),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
        ]
        args = [acts_t, U, drop_mask, c_seq, c_prev_seq, dhs]
        out_specs = pl.BlockSpec((1, B, 4 * H), rev)
        out_shape = jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32)
        if with_init:
            in_specs += [pl.BlockSpec((B, H), lambda t: (0, 0)),
                         pl.BlockSpec((B, H), lambda t: (0, 0))]
            args += [dhT, dcT]
            out_specs = [out_specs,
                         pl.BlockSpec((B, H), lambda t: (0, 0)),
                         pl.BlockSpec((B, H), lambda t: (0, 0))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((B, H), jnp.float32),
                         jax.ShapeDtypeStruct((B, H), jnp.float32)]
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 4 * H,
                bytes_accessed=(2 * T * B * 4 * H + 4 * H * H
                                + 4 * T * B * H) * 4,
                transcendentals=T * B * H),
        )(*args)

    return call


#: Which cells default to the stashed-activation backward. Interleaved
#: min-of-N A/B on the shared chip (see PERF.md round-4 'measurement
#: honesty' note — sequential A/Bs swung +-40% in BOTH directions):
#: LSTM ties-or-wins (4H gates, 5 transcendental sets recomputed), GRU
#: wins ~1.2-1.6x (TWO recompute dots), mGRU is a wash, liGRU/RNN lose
#: (their recompute is one cheap dot; the extra stash streams cost more
#: than they save at B=16).
_STASH_DEFAULT = {"lstm": True, "gru": True, "mgru": False,
                  "ligru": False, "rnn": False}


def _bwd_stash_enabled(cell: str = "lstm") -> bool:
    """Per-cell default (see _STASH_DEFAULT), overridable:
    PKC_LSTM_BWD_RECOMPUTE=1 forces the recompute backward everywhere
    (when residual HBM is the binding constraint);
    PKC_BWD_STASH_CELLS=lstm,gru,... forces stash for exactly the
    listed cells."""
    import os
    if os.environ.get("PKC_LSTM_BWD_RECOMPUTE", "") == "1":
        return False
    forced = os.environ.get("PKC_BWD_STASH_CELLS", "")
    if forced:
        return cell in [c.strip() for c in forced.split(",")]
    return _STASH_DEFAULT.get(cell, False)


def fits_vmem(B: int, H: int, compute_dtype: str = "") -> bool:
    """Conservative VMEM budget check (16MB/core, leave headroom).
    dU does not live in the bwd kernel (accumulated outside over the
    unrolled batch), so train costs the same VMEM as inference.

    Dtype-aware (VERDICT r4 item 5): under bf16 compute the kernel
    receives U already cast to bf16 (u_dt in the scan wrappers), so
    resident weight bytes halve — H=1024 dense-fused fits in bf16
    where f32 overflows. Carries/gates stay f32 either way."""
    w_bytes = 2 if compute_dtype in ("bf16", "bfloat16") else 4
    weights = 4 * H * H * w_bytes              # U residency
    work = 8 * B * H * 4 + B * 4 * H * 4 * 3
    return weights + work < 12 * 1024 * 1024


def lstm_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                    drop_mask: jnp.ndarray, act: str = "tanh",
                    quant_bits: int = 0,
                    interpret: bool = False,
                    compute_dtype: str = "") -> jnp.ndarray:
    """hs = fused LSTM recurrence over precomputed gate projections.

    gates_t: (T, B, 4H) in reference gate order (f, i, o, c);
    U: (4H, H) stacked recurrent weights; drop_mask: (B, H) or (1, 1)
    broadcastable per-sequence dropout mask. Differentiable w.r.t.
    gates_t and U (custom VJP; drop_mask is a constant).
    compute_dtype="bf16" runs the recurrent dots (fwd u, bwd u/dh/dU)
    with bf16 inputs and f32 accumulation; carries and gate math stay
    f32. Returns hs: (T, B, H) float32.
    """
    T, B, G4 = gates_t.shape
    H = G4 // 4
    cdt = "bf16" if compute_dtype in ("bf16", "bfloat16") else ""
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32),
                            (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("lstm")
    fwd = _build_fwd(T, B, H, act, quant_bits, interpret, cdt=cdt)
    if stash:
        fwd_s = _build_fwd(T, B, H, act, quant_bits, interpret, cdt=cdt,
                           stash=True)
        bwd = _build_bwd_stash(T, B, H, act, interpret, cdt=cdt)
    else:
        bwd = _build_bwd(T, B, H, act, quant_bits, interpret, cdt=cdt)
    u_dt = jnp.bfloat16 if cdt else jnp.float32

    @jax.custom_vjp
    def _op(gates_t, U):
        hs, _ = fwd(gates_t, U.astype(u_dt), drop)
        return hs

    def _fwd_rule(gates_t, U):
        if stash:
            hs, cs, acts = fwd_s(gates_t, U.astype(u_dt), drop)
            return hs, (None, U, hs, cs, acts)
        hs, cs = fwd(gates_t, U.astype(u_dt), drop)
        return hs, (gates_t, U, hs, cs, None)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, cs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)
        if stash:
            dg = bwd(acts, U.astype(u_dt), drop, cs, c_prev,
                     dhs.astype(jnp.float32))
        else:
            dg = bwd(gates_t, U.astype(u_dt), drop, h_prev, c_prev,
                     dhs.astype(jnp.float32))
        # dU over the unrolled (T*B) batch: one K=T*B matmul instead of
        # T MXU-starved K=B dots inside the kernel. Quantization must be
        # PER-STEP (vmap) to match the fwd kernel's _q_input over each
        # (B, H) block — one global scale over (T, B, H) would bias dU
        # at every step whose max|h| differs from the sequence max.
        hq = _q_vmap(h_prev, quant_bits).reshape(T * B, H)
        dU = jax.lax.dot_general(dg.reshape(T * B, 4 * H).astype(u_dt),
                                 hq.astype(u_dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dgate = dg.astype(g_dt)
        return dgate, dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


def lstm_scan_fused_seeded(gates_t: jnp.ndarray, U: jnp.ndarray,
                           drop_mask: jnp.ndarray, h0: jnp.ndarray,
                           c0: jnp.ndarray, act: str = "tanh",
                           quant_bits: int = 0, interpret: bool = False,
                           compute_dtype: str = ""):
    """Seeded-carry fused LSTM recurrence WITH a VJP: the training-capable
    sibling of :func:`lstm_scan_fused_stream` (VERDICT round-3 item 4).

    Returns ``(hs, (h_T, c_T))``; differentiable w.r.t. gates_t, U, h0
    and c0 — the reverse kernel seeds its (dh, dc) carry from the final
    state's cotangents and emits (dh0, dc0) at its last step, so
    sequence-parallel slabs can run the one-kernel recurrence and BPTT
    flows across slab boundaries through the ppermute transpose.
    """
    T, B, G4 = gates_t.shape
    H = G4 // 4
    cdt = "bf16" if compute_dtype in ("bf16", "bfloat16") else ""
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("lstm")
    fwd = _build_fwd(T, B, H, act, quant_bits, interpret, with_init=True,
                     cdt=cdt)
    if stash:
        fwd_s = _build_fwd(T, B, H, act, quant_bits, interpret,
                           with_init=True, cdt=cdt, stash=True)
        bwd = _build_bwd_stash(T, B, H, act, interpret, cdt=cdt,
                               with_init=True)
    else:
        bwd = _build_bwd(T, B, H, act, quant_bits, interpret, cdt=cdt,
                         with_init=True)
    u_dt = jnp.bfloat16 if cdt else jnp.float32

    # NB drop is a real argument, NOT a closure capture: under
    # shard_map's partial-manual AD the backward rule is re-traced in a
    # separate trace, and a closed-over drop tracer from the forward
    # trace raises UnexpectedTracerError there.
    @jax.custom_vjp
    def _op(gates_t, U, h0, c0, drop):
        hs, cs = fwd(gates_t, U.astype(u_dt), drop, h0, c0)
        return hs, (hs[-1], cs[-1])

    def _fwd_rule(gates_t, U, h0, c0, drop):
        if stash:
            hs, cs, acts = fwd_s(gates_t, U.astype(u_dt), drop, h0, c0)
            return ((hs, (hs[-1], cs[-1])),
                    (None, U, h0, c0, drop, hs, cs, acts))
        hs, cs = fwd(gates_t, U.astype(u_dt), drop, h0, c0)
        return ((hs, (hs[-1], cs[-1])),
                (gates_t, U, h0, c0, drop, hs, cs, None))

    def _bwd_rule(res, cot):
        gates_t, U, h0, c0, drop, hs, cs, acts = res
        dhs, (dhT, dcT) = cot
        h_prev = jnp.concatenate([h0[None].astype(jnp.float32), hs[:-1]],
                                 axis=0)
        c_prev = jnp.concatenate([c0[None].astype(jnp.float32), cs[:-1]],
                                 axis=0)
        if stash:
            dg, dh0, dc0 = bwd(acts, U.astype(u_dt), drop, cs, c_prev,
                               dhs.astype(jnp.float32),
                               dhT.astype(jnp.float32),
                               dcT.astype(jnp.float32))
        else:
            dg, dh0, dc0 = bwd(gates_t, U.astype(u_dt), drop, h_prev,
                               c_prev, dhs.astype(jnp.float32),
                               dhT.astype(jnp.float32),
                               dcT.astype(jnp.float32))
        hq = _q_vmap(h_prev, quant_bits).reshape(T * B, H)
        dU = jax.lax.dot_general(dg.reshape(T * B, 4 * H).astype(u_dt),
                                 hq.astype(u_dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dgate = dg.astype(g_dt)
        return (dgate, dU.astype(U.dtype),
                dh0.astype(h0.dtype), dc0.astype(c0.dtype),
                jnp.zeros_like(drop))

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U, h0, c0, drop)


# ---------------------------------------------------------------------------
# block-sparse fused recurrence: the per-gate recurrent matrices (H, H)
# share one HCGS mask (ref: neural_networks.py:978-983), so the kept
# blocks pack into the same (Nb, G*bs, R*bs) row-major w3 layout the
# projection kernels use — NO column padding (the CSC layout's C_max
# padding overflowed VMEM at 2048-wide) and NO scatter in the forward:
# per step ONE batched dot over out-blocks,
#   gath (Nb, B, R*bs)  x  w3g (Nb, G*bs, R*bs)  ->  (Nb, B, G*bs)
# with static column gathers (col_idx are compile-time ints). dU comes
# from the v3 dw kernel over the unrolled (T*B) batch outside the scan.
# ---------------------------------------------------------------------------


# --- shared static-index helpers for the sparse recurrence kernels ----
# (also used by the liGRU/RNN sparse fused scans in ops.fused_rnn)

def sparse_recurrent_u(h, u_ref, Nb, R, bs, G, H, col_idx):
    """u = h @ U_stacked.T touching only KEPT blocks: gather the R kept
    bs-column slices per out-block (STATIC indices), one batched dot
    against w3g, reshape to the dense gate-major (B, G*H) layout."""
    B = h.shape[0]
    gath = jnp.stack([
        jnp.concatenate([h[:, col_idx[j * R + k] * bs:
                           (col_idx[j * R + k] + 1) * bs]
                         for k in range(R)], axis=1)
        for j in range(Nb)])                      # (Nb, B, R*bs)
    part = jax.lax.dot_general(
        gath.astype(u_ref.dtype), u_ref[...],
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (Nb, B, G*bs)
    # -> (B, G, Nb, bs) -> (B, G*H): gate-major, block j at offset
    # g*H + j*bs — matching the dense u = h @ U_stacked.T layout
    part = part.reshape(Nb, B, G, bs).transpose(1, 2, 0, 3)
    return part.reshape(B, G * H)


def sparse_dh_parts(dg, u_ref, Nb, R, bs, G, H, col_idx):
    """d(h_prev) contribution per kept block: gather dg per (gate,
    out-block) -> (Nb, B, G*bs), batched dot with w3g over its G*bs
    dim -> (Nb, B, R*bs) to scatter-add back into dh columns."""
    dgb = jnp.stack([
        jnp.concatenate([dg[:, g_ * H + j * bs:g_ * H + (j + 1) * bs]
                         for g_ in range(G)], axis=1)
        for j in range(Nb)])                       # (Nb, B, G*bs)
    return jax.lax.dot_general(
        dgb.astype(u_ref.dtype), u_ref[...],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (Nb, B, R*bs)


def scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx):
    """dh_ref[:, cols] += dpart slices (STATIC indices; .at[].add inside
    a Pallas kernel materializes full-array copies — measured 0.81x)."""
    for j in range(Nb):
        for k in range(R):
            c_ = col_idx[j * R + k]
            dh_ref[:, c_ * bs:(c_ + 1) * bs] += dpart[j, :, k * bs:(k + 1) * bs]


@functools.lru_cache(maxsize=16)
def _build_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                      Nb: int, R: int, bs: int, G: int, col_idx: tuple,
                      interpret: bool, stash: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def _recurrent_u(h, u_ref):
        return sparse_recurrent_u(h, u_ref, Nb, R, bs, G, H, col_idx)

    def kernel(g_ref, u_ref, drop_ref, *outs):
        if stash:
            h_out, c_out, a_out, h_ref, c_ref = outs
        else:
            h_out, c_out, h_ref, c_ref = outs
            a_out = None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        hq = _q_input(h_ref[...], qbits)
        u = _recurrent_u(hq, u_ref)
        g = g_ref[0].astype(jnp.float32) + u
        gf = jax.nn.sigmoid(g[:, :H])
        gi = jax.nn.sigmoid(g[:, H:2 * H])
        go = jax.nn.sigmoid(g[:, 2 * H:3 * H])
        gc = actf(g[:, 3 * H:])
        cc = gi * gc * drop_ref[...] + gf * c_ref[...]
        h = go * actf(cc)
        h_ref[...] = h
        c_ref[...] = cc
        h_out[0] = h.astype(h_out.dtype)
        c_out[0] = cc.astype(c_out.dtype)
        if stash:
            a_out[0] = jnp.concatenate([gf, gi, go, gc],
                                       axis=1).astype(a_out.dtype)

    def call(gates_t, w3g, drop_mask):
        out_specs = [
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ]
        if stash:
            out_specs.append(pl.BlockSpec((1, B, 4 * H),
                                          lambda t: (t, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((T, B, 4 * H),
                                                  jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Nb, G * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * bs * bs * Nb * R * G,
                bytes_accessed=(T * B * 4 * H + Nb * G * R * bs * bs
                                + 2 * T * B * H
                                + (T * B * 4 * H if stash else 0)) * 4,
                transcendentals=T * B * H * 4),
        )(gates_t, w3g, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_bwd_sparse_stash(T: int, B: int, H: int, act: str,
                            Nb: int, R: int, bs: int, G: int,
                            col_idx: tuple, interpret: bool):
    """Reverse BPTT over STASHED gate activations for the block-sparse
    recurrence: no per-step u-recompute (which cost a whole sparse
    gather+dot pass) and no gate transcendentals — just the cotangent
    chain, one actf(c), and the sparse dh dot + static scatter-adds.
    dU handled outside (v3 dw kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]
    dactf = _DACTS[act]

    def kernel(a_ref, u_ref, drop_ref, c_ref_seq, cprev_ref, dh_in_ref,
               dg_out, dh_ref, dc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)
            dc_ref[...] = jnp.zeros_like(dc_ref)

        a = a_ref[0].astype(jnp.float32)
        gf = a[:, :H]
        gi = a[:, H:2 * H]
        go = a[:, 2 * H:3 * H]
        gc = a[:, 3 * H:]
        cc = c_ref_seq[0].astype(jnp.float32)
        c_prev = cprev_ref[0].astype(jnp.float32)
        drop = drop_ref[...]
        ac = actf(cc)

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dc = dc_ref[...] + dh * go * dactf(ac)
        dgo = dh * ac * go * (1.0 - go)
        dgf = dc * c_prev * gf * (1.0 - gf)
        dgi = dc * gc * drop * gi * (1.0 - gi)
        dgc = dc * gi * drop * dactf(gc)
        dg = jnp.concatenate([dgf, dgi, dgo, dgc], axis=1)   # (B, 4H)
        dpart = sparse_dh_parts(dg, u_ref, Nb, R, bs, G, H, col_idx)
        dh_ref[...] = jnp.zeros_like(dh_ref)
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(acts_t, w3g, drop_mask, c_seq, c_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), rev),
                pl.BlockSpec((Nb, G * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 4 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
        )(acts_t, w3g, drop_mask, c_seq, c_prev_seq, dhs)

    return call


@functools.lru_cache(maxsize=16)
def _build_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                      Nb: int, R: int, bs: int, G: int, col_idx: tuple,
                      interpret: bool):
    """Reverse BPTT emitting dg_t; dh_{t-1} via one batched dot + static
    scatter-adds into a VMEM scratch. dU handled outside (v3 dw kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, cprev_ref, dh_in_ref,
               dg_out, dh_ref, dc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)
            dc_ref[...] = jnp.zeros_like(dc_ref)

        h_prev = _q_input(hprev_ref[0].astype(jnp.float32), qbits)
        c_prev = cprev_ref[0].astype(jnp.float32)
        u = sparse_recurrent_u(h_prev, u_ref, Nb, R, bs, G, H, col_idx)
        g = g_ref[0].astype(jnp.float32) + u
        gf = jax.nn.sigmoid(g[:, :H])
        gi = jax.nn.sigmoid(g[:, H:2 * H])
        go = jax.nn.sigmoid(g[:, 2 * H:3 * H])
        gc_pre = g[:, 3 * H:]
        gc = actf(gc_pre)
        drop = drop_ref[...]
        cc = gi * gc * drop + gf * c_prev
        ac = actf(cc)

        dh = dh_ref[...] + dh_in_ref[0].astype(jnp.float32)
        dc = dc_ref[...] + dh * go * _dact_from_pre(act, cc)
        dgo = dh * ac * go * (1.0 - go)
        dgf = dc * c_prev * gf * (1.0 - gf)
        dgi = dc * gc * drop * gi * (1.0 - gi)
        dgc = dc * gi * drop * _dact_from_pre(act, gc_pre)
        dg = jnp.concatenate([dgf, dgi, dgo, dgc], axis=1)   # (B, 4H)
        dpart = sparse_dh_parts(dg, u_ref, Nb, R, bs, G, H, col_idx)
        dh_ref[...] = jnp.zeros_like(dh_ref)
        scatter_add_cols(dh_ref, dpart, Nb, R, bs, col_idx)
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, w3g, drop_mask, h_prev_seq, c_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), rev),
                pl.BlockSpec((Nb, G * bs, R * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=pl.BlockSpec((1, B, 4 * H), rev),
            out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
        )(gates_t, w3g, drop_mask, h_prev_seq, c_prev_seq, dhs)

    return call


def sparse_dU(dg_m, hq_m, layout, G, interpret):
    """dw3g (Nb, G*bs, R*bs) from per-step gate cotangents over the
    unrolled batch, via the v3 dw kernel. dg_m: (M, G*H) gate-major;
    hq_m: (M, H) the (quantized) recurrent inputs."""
    from . import block_sparse as BS
    M = dg_m.shape[0]
    Nb, bs = layout.Nb, layout.bs
    # flatten to the (M, Nb*G*bs) layout the dw kernel streams: per
    # out-block j, the G gates' bs-slices adjacent
    dg_flat = dg_m.reshape(M, G, Nb, bs).transpose(0, 2, 1, 3) \
        .reshape(M, Nb * G * bs)
    tile = 8
    t_ = 8
    bound = max(8, (1024 * 1024 // layout.K) // 8 * 8)
    while t_ <= min(M, bound):
        if M % t_ == 0:
            tile = t_
        t_ += 8
    _, _, dwk = BS._build_v3_ops(layout, G, tile, interpret)
    return dwk(dg_flat, hq_m, jnp.float32)


def sparse_scan_fits_vmem(B: int, H: int, layout, G: int = 4) -> str:
    """Returns the resident w3g VMEM dtype ("f32"/"bf16") or "" when
    even bf16 overflows. Row-major packing has zero padding: bytes =
    nnz * G * bs^2 * dtype."""
    import os
    work = 10 * B * H * 4 + 3 * B * 4 * H * 4
    budget = int(os.environ.get("PKC_SPARSE_SCAN_VMEM_MB", "15")) \
        * 1024 * 1024
    u_f32 = layout.nnz * G * layout.bs * layout.bs * 4
    if u_f32 + work < budget:
        return "f32"
    if u_f32 // 2 + work < budget:
        return "bf16"
    return ""


def lstm_scan_fused_sparse(gates_t: jnp.ndarray, w3g: jnp.ndarray,
                           layout, drop_mask: jnp.ndarray,
                           act: str = "tanh", quant_bits: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused LSTM recurrence with BLOCK-SPARSE per-gate recurrent
    matrices sharing one HCGS mask.

    gates_t: (T, B, 4H) in (f, i, o, c) order; w3g: (Nb, G*bs, R*bs)
    packed per-gate kept blocks (ops.block_sparse.v3_from_blocks /
    gather_blocks_multi over the per-gate (H, H) layout). Differentiable
    w.r.t. gates_t and w3g.
    """
    T, B, G4 = gates_t.shape
    H = G4 // 4
    G = 4
    bs, Nb, R = layout.bs, layout.Nb, layout.R
    col_idx = tuple(int(v) for v in layout.col_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    mode = sparse_scan_fits_vmem(B, H, layout, G)
    if mode == "bf16":
        w3g = w3g.astype(jnp.bfloat16)
    g_dt = gates_t.dtype
    stash = _bwd_stash_enabled("lstm")
    fwd = _build_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs, G,
                            col_idx, interpret)
    if stash:
        fwd_s = _build_fwd_sparse(T, B, H, act, quant_bits, Nb, R, bs, G,
                                  col_idx, interpret, stash=True)
        bwd = _build_bwd_sparse_stash(T, B, H, act, Nb, R, bs, G,
                                      col_idx, interpret)
    else:
        bwd = _build_bwd_sparse(T, B, H, act, quant_bits, Nb, R, bs, G,
                                col_idx, interpret)

    @jax.custom_vjp
    def _op(gates_t, w3g):
        hs, _ = fwd(gates_t, w3g, drop)
        return hs

    def _fwd_rule(gates_t, w3g):
        if stash:
            hs, cs, acts = fwd_s(gates_t, w3g, drop)
            return hs, (None, w3g, hs, cs, acts)
        hs, cs = fwd(gates_t, w3g, drop)
        return hs, (gates_t, w3g, hs, cs, None)

    def _bwd_rule(res, dhs):
        gates_t, w3g, hs, cs, acts = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)
        if stash:
            dg = bwd(acts, w3g, drop, cs, c_prev, dhs.astype(jnp.float32))
        else:
            dg = bwd(gates_t, w3g, drop, h_prev, c_prev,
                     dhs.astype(jnp.float32))
        M = T * B
        hq = _q_vmap(h_prev, quant_bits).reshape(M, H)
        dw3g = sparse_dU(dg.reshape(M, G * H), hq, layout, G, interpret)
        dgate = dg.astype(g_dt)
        return dgate, dw3g.astype(w3g.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, w3g)
