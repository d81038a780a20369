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

Backward is a second sequential kernel (reverse grid) with U and a dU
accumulator both VMEM-resident; activations are recomputed per step
from the saved h/c sequences, so residual memory is the same (T, B, H)
pair the scan keeps anyway.

Supported: act in {tanh, relu, htanh}, no in-scan layer norm (laynorm
configs fall back to lax.scan), f32 or bf16 gates. H*4H weights + dU
must fit VMEM (H <= 1024 at f32 fwd / H <= 512 for the fused backward;
larger falls back automatically).
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
               interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, h_out, c_out, h_ref, c_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        u = jax.lax.dot_general(_q_input(h_ref[...], qbits), u_ref[...],
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

    def call(gates_t, U, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * H * 4 * H,
                bytes_accessed=(T * B * 4 * H + 4 * H * H
                                + 2 * T * B * H) * 4,
                transcendentals=T * B * H * 4),
        )(gates_t, U, drop_mask)

    return call


@functools.lru_cache(maxsize=32)
def _build_bwd(T: int, B: int, H: int, act: str, qbits: int,
               interpret: bool):
    """Reverse-time BPTT kernel. Grid (T,) with index map t -> T-1-t.
    Recomputes the gate pre-activations from (h_{t-1}, gates_t); carries
    (dh, dc) in scratch; accumulates dU in a VMEM f32 buffer written out
    on the last step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, cprev_ref, dh_in_ref,
               dg_out, du_out, dh_ref, dc_ref, du_acc):
        t = pl.program_id(0)          # 0..T-1, processing step T-1-t

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)
            dc_ref[...] = jnp.zeros_like(dc_ref)
            du_acc[...] = jnp.zeros_like(du_acc)

        h_prev = _q_input(hprev_ref[0].astype(jnp.float32), qbits)
        c_prev = cprev_ref[0].astype(jnp.float32)
        u = jax.lax.dot_general(h_prev, u_ref[...],
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
        dh_prev = jax.lax.dot_general(dg, u_ref[...],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        du_acc[...] += jax.lax.dot_general(dg, h_prev,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dh_ref[...] = dh_prev
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            du_out[...] = du_acc[...].astype(du_out.dtype)

    def call(gates_t, U, drop_mask, h_prev_seq, c_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), rev),
                pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
                pl.BlockSpec((1, B, H), rev),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 4 * H), rev),
                pl.BlockSpec((4 * H, H), lambda t: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
                jax.ShapeDtypeStruct((4 * H, H), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((4 * H, H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=6 * T * B * H * 4 * H,
                bytes_accessed=(2 * T * B * 4 * H + 2 * 4 * H * H
                                + 4 * T * B * H) * 4,
                transcendentals=2 * T * B * H * 4),
        )(gates_t, U, drop_mask, h_prev_seq, c_prev_seq, dhs)

    return call


def fits_vmem(B: int, H: int, train: bool) -> bool:
    """Conservative VMEM budget check (16MB/core, leave headroom)."""
    weights = 4 * H * H * 4                    # U f32
    if train:
        weights *= 2                           # + dU accumulator
    work = 8 * B * H * 4 + B * 4 * H * 4 * 3
    return weights + work < 12 * 1024 * 1024


def lstm_scan_fused(gates_t: jnp.ndarray, U: jnp.ndarray,
                    drop_mask: jnp.ndarray, act: str = "tanh",
                    quant_bits: int = 0,
                    interpret: bool = False) -> jnp.ndarray:
    """hs = fused LSTM recurrence over precomputed gate projections.

    gates_t: (T, B, 4H) in reference gate order (f, i, o, c);
    U: (4H, H) stacked recurrent weights; drop_mask: (B, H) or (1, 1)
    broadcastable per-sequence dropout mask. Differentiable w.r.t.
    gates_t and U (custom VJP; drop_mask is a constant).
    Returns hs: (T, B, H) float32.
    """
    T, B, G4 = gates_t.shape
    H = G4 // 4
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32),
                            (B, H))
    fwd = _build_fwd(T, B, H, act, quant_bits, interpret)
    bwd = _build_bwd(T, B, H, act, quant_bits, interpret)

    @jax.custom_vjp
    def _op(gates_t, U):
        hs, _ = fwd(gates_t, U, drop)
        return hs

    def _fwd_rule(gates_t, U):
        hs, cs = fwd(gates_t, U, drop)
        return hs, (gates_t, U, hs, cs)

    def _bwd_rule(res, dhs):
        gates_t, U, hs, cs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)
        dg, dU = bwd(gates_t, U, drop, h_prev, c_prev,
                     dhs.astype(jnp.float32))
        return dg.astype(gates_t.dtype), dU.astype(U.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, U)


# ---------------------------------------------------------------------------
# block-sparse fused recurrence: the recurrent matrix U (4H, H) is HCGS
# block-sparse; only its KEPT blocks live in VMEM, in a per-in-block
# (CSC) layout, so wide layers whose dense U overflows VMEM (2048-wide =
# 64MB) still run the whole time loop in one kernel. Per step:
#   for each in-block c: part_c = h_c @ Ucsc[c]        (one deep dot)
#   scatter-add part_c slices into u at the kept out-block rows
# dU does NOT accumulate in the kernel (VMEM): the backward scan emits
# the per-step gate cotangents dg_t, and dU comes from the existing
# block-sparse dw kernel over the whole (T*B) batch outside the scan.
# ---------------------------------------------------------------------------

def pack_u_csc(U: np.ndarray, layout) -> np.ndarray:
    """Dense (4H, H) recurrent weights -> (Kb, bs, C*bs): for in-block
    c, column k holds kept out-block t_row_idx[c*C+k]'s (bs, bs) block,
    TRANSPOSED so that  h_c @ Ucsc[c]  yields that block's u slice.
    Padded (t_perm == nnz) slots are zero."""
    bs = layout.bs
    U = np.asarray(U)
    out = np.zeros((layout.Kb, bs, layout.C * bs), U.dtype)
    blocks = None
    from .block_sparse import pack_blocks
    blocks = pack_blocks(U, layout)            # (nnz, bs, bs) [out, in]
    for c in range(layout.Kb):
        for k in range(layout.C):
            p = layout.t_perm[c * layout.C + k]
            if p < layout.nnz:
                out[c, :, k * bs:(k + 1) * bs] = blocks[p].T
    return out


@functools.lru_cache(maxsize=16)
def _build_fwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                      Kb: int, C: int, bs: int, t_row: tuple,
                      interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, h_out, c_out, h_ref, c_ref,
               u_acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        hq = _q_input(h_ref[...], qbits)
        u_acc[...] = jnp.zeros_like(u_acc)
        # ONE batched dot over all in-blocks: (Kb,B,bs)x(Kb,bs,C*bs)
        hb = jnp.swapaxes(hq.reshape(B, Kb, bs), 0, 1).astype(u_ref.dtype)
        part_all = jax.lax.dot_general(
            hb, u_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (Kb, B, C*bs)
        for c in range(Kb):
            for k in range(C):
                r = t_row[c * C + k]    # python int: STATIC ref slices
                u_acc[:, r * bs:(r + 1) * bs] += \
                    part_all[c, :, k * bs:(k + 1) * bs]
        g = g_ref[0].astype(jnp.float32) + u_acc[...]
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

    def call(gates_t, u_csc, drop_mask):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0)),
                pl.BlockSpec((Kb, bs, C * bs), lambda t: (0, 0, 0)),
                pl.BlockSpec((B, H), lambda t: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, 4 * H), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * B * bs * bs * Kb * C,
                bytes_accessed=(T * B * 4 * H + Kb * C * bs * bs
                                + 2 * T * B * H) * 4,
                transcendentals=T * B * H * 4),
        )(gates_t, u_csc, drop_mask)

    return call


@functools.lru_cache(maxsize=16)
def _build_bwd_sparse(T: int, B: int, H: int, act: str, qbits: int,
                      Kb: int, C: int, bs: int, t_row: tuple,
                      interpret: bool):
    """Reverse BPTT emitting dg_t only; dh_{t-1} = gather(dg) @ Ucsc^T
    per in-block. dU is computed OUTSIDE by the block-sparse dw kernel
    over the whole batch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    actf = _ACTS[act]

    def kernel(g_ref, u_ref, drop_ref, hprev_ref, cprev_ref, dh_in_ref,
               dg_out, dh_ref, dc_ref, u_acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh_ref[...] = jnp.zeros_like(dh_ref)
            dc_ref[...] = jnp.zeros_like(dc_ref)

        h_prev = _q_input(hprev_ref[0].astype(jnp.float32), qbits)
        c_prev = cprev_ref[0].astype(jnp.float32)
        u_acc[...] = jnp.zeros_like(u_acc)
        hb = jnp.swapaxes(h_prev.reshape(B, Kb, bs), 0, 1) \
            .astype(u_ref.dtype)
        part_all = jax.lax.dot_general(
            hb, u_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (Kb, B, C*bs)
        for c in range(Kb):
            for k in range(C):
                r = t_row[c * C + k]
                u_acc[:, r * bs:(r + 1) * bs] += \
                    part_all[c, :, k * bs:(k + 1) * bs]
        g = g_ref[0].astype(jnp.float32) + u_acc[...]
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
        # dh_prev: per in-block, gather the kept dg slices and contract
        # with Ucsc[c]^T — write each bs-wide result straight into the
        # carry ref (static slices)
        gath_all = jnp.stack(
            [jnp.concatenate(
                [dg[:, t_row[c * C + k] * bs:(t_row[c * C + k] + 1) * bs]
                 for k in range(C)], axis=1) for c in range(Kb)])
        dh_all = jax.lax.dot_general(
            gath_all.astype(u_ref.dtype), u_ref[...],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (Kb, B, bs)
        dh_ref[...] = jnp.swapaxes(dh_all, 0, 1).reshape(B, H)
        dc_ref[...] = dc * gf
        dg_out[0] = dg.astype(dg_out.dtype)

    def call(gates_t, u_csc, drop_mask, h_prev_seq, c_prev_seq, dhs):
        rev = lambda t: (T - 1 - t, 0, 0)
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * H), rev),
                pl.BlockSpec((Kb, bs, C * bs), lambda t: (0, 0, 0)),
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
                pltpu.VMEM((B, 4 * H), jnp.float32),
            ],
            interpret=interpret,
        )(gates_t, u_csc, drop_mask, h_prev_seq, c_prev_seq, dhs)

    return call


def sparse_scan_fits_vmem(B: int, H: int, layout) -> str:
    """Returns the u_csc VMEM dtype to use ("f32"/"bf16") or "" when
    even bf16 storage overflows. bf16 halves the resident CSC (the
    C-padding waste makes 2048-wide/87.5%-drop overflow f32); dots
    still accumulate f32."""
    work = 10 * B * H * 4 + 3 * B * 4 * H * 4
    budget = 13 * 1024 * 1024
    u_f32 = layout.Kb * layout.C * layout.bs * layout.bs * 4
    if u_f32 + work < budget:
        return "f32"
    if u_f32 // 2 + work < budget:
        return "bf16"
    return ""



def lstm_scan_fused_sparse(gates_t: jnp.ndarray, u_csc: jnp.ndarray,
                           layout, drop_mask: jnp.ndarray,
                           act: str = "tanh", quant_bits: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused LSTM recurrence with a BLOCK-SPARSE recurrent matrix.

    gates_t: (T, B, 4H); u_csc: (Kb, bs, C*bs) from :func:`pack_u_csc`
    over the hcgsh mask's BlockLayout of the stacked (4H, H) recurrent
    weights. Differentiable w.r.t. gates_t and u_csc (dU computed by the
    block-sparse dw kernel over the whole unrolled batch).
    """
    T, B, G4 = gates_t.shape
    H = G4 // 4
    bs, Kb, C = layout.bs, layout.Kb, layout.C
    t_row = tuple(int(v) for v in layout.t_row_idx)
    drop = jnp.broadcast_to(jnp.asarray(drop_mask, jnp.float32), (B, H))
    mode = sparse_scan_fits_vmem(B, H, layout)
    if mode == "bf16":
        u_csc = u_csc.astype(jnp.bfloat16)
    fwd = _build_fwd_sparse(T, B, H, act, quant_bits, Kb, C, bs, t_row,
                            interpret)
    bwd = _build_bwd_sparse(T, B, H, act, quant_bits, Kb, C, bs, t_row,
                            interpret)

    @jax.custom_vjp
    def _op(gates_t, u_csc):
        hs, _ = fwd(gates_t, u_csc, drop)
        return hs

    def _fwd_rule(gates_t, u_csc):
        hs, cs = fwd(gates_t, u_csc, drop)
        return hs, (gates_t, u_csc, hs, cs)

    def _bwd_rule(res, dhs):
        from . import block_sparse as BS
        gates_t, u_csc, hs, cs = res
        zeros = jnp.zeros((1, B, H), jnp.float32)
        h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)
        dg = bwd(gates_t, u_csc, drop, h_prev, c_prev,
                 dhs.astype(jnp.float32))
        # dU over the whole unrolled batch via the v3 dw kernel:
        # dU_dense = dg_flat^T @ q(h_prev)_flat restricted to kept blocks
        M = T * B
        dg_flat = dg.reshape(M, 4 * H)
        hq = _q_input(h_prev.reshape(M, H), quant_bits) \
            if quant_bits > 0 else h_prev.reshape(M, H)
        # the dw kernel consumes gy in the (M, Nb*G*bs) flat layout with
        # G=1 over the (4H, H) layout: that's dg_flat as-is
        tile = 8
        t_ = 8
        bound = max(8, (1024 * 1024 // layout.K) // 8 * 8)
        while t_ <= min(M, bound):
            if M % t_ == 0:
                tile = t_
            t_ += 8
        _, _, dwk = BS._build_v3_ops(layout, 1, tile, interpret)
        dw3 = dwk(dg_flat, hq, jnp.float32)     # (Nb, bs, R*bs)
        # map row-major dw3 -> the CSC layout of u_csc
        dw_csc = _w3_to_csc(dw3, layout)
        return dg.astype(gates_t.dtype), dw_csc.astype(u_csc.dtype)

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(gates_t, u_csc)


def _w3_to_csc(w3: jnp.ndarray, layout) -> jnp.ndarray:
    """(Nb, bs, R*bs) row-major packed blocks -> (Kb, bs, C*bs) CSC
    (transposed per block), zero-padding unused slots."""
    bs = layout.bs
    blocks = w3.reshape(layout.Nb, bs, layout.R, bs) \
        .transpose(0, 2, 1, 3).reshape(layout.nnz, bs, bs)
    pad = jnp.zeros((1, bs, bs), w3.dtype)
    blocks_pad = jnp.concatenate([blocks, pad], axis=0)
    csc = blocks_pad[jnp.asarray(layout.t_perm)]      # (Kb*C, bs, bs)
    csc = jnp.swapaxes(csc, 1, 2)                     # transpose blocks
    return csc.reshape(layout.Kb, layout.C, bs, bs) \
        .transpose(0, 2, 1, 3).reshape(layout.Kb, bs, layout.C * bs)


def csc_from_dense(U: jnp.ndarray, layout) -> jnp.ndarray:
    """Traceable dense (4H, H) -> (Kb, bs, C*bs) CSC gather (gradients
    scatter back to the dense weights)."""
    bs = layout.bs
    Ub = U.reshape(layout.Nb, bs, layout.Kb, bs)
    blocks = Ub[jnp.asarray(layout.rows), :, jnp.asarray(layout.cols), :]
    pad = jnp.zeros((1, bs, bs), U.dtype)
    blocks_pad = jnp.concatenate([blocks, pad], axis=0)
    csc = blocks_pad[jnp.asarray(layout.t_perm)]
    csc = jnp.swapaxes(csc, 1, 2)
    return csc.reshape(layout.Kb, layout.C, bs, bs) \
        .transpose(0, 2, 1, 3).reshape(layout.Kb, bs, layout.C * bs)
