"""Block-sparse matmul for HCGS weights — the TPU payoff of coarse-grain
sparsity.

The reference multiplies dense weights by 0/1 masks every forward
(ref: neural_networks.py:258, :853-896): dropped blocks still burn full
matmul FLOPs. HCGS level-1 blocks are 64/128-square — exactly MXU tile
granularity — and HCGS keeps the *same number of blocks in every block
row* (``round(n_blk_cols * keep)``, ref: hcgs.py:26), so the kept blocks
form a regular (N_blk_rows x R) structure. This module stores the weight
as the packed (nnz, bs, bs) array of kept blocks plus index arrays and
computes

    y[M,N] = x[M,K] @ w_dense.T      (w_dense = scatter of packed blocks)

as a Pallas kernel whose grid enumerates only kept blocks: compute and
HBM traffic drop by the block-level density (e.g. 4x for 75% dropped
blocks) instead of multiplying zeros.

Custom VJP: dx uses a padded transpose (CSC) layout of the same packed
blocks; dw accumulates per-kept-block outer products — dropped blocks
never materialize gradients.

Level-2 sub-block masks (the 4x4/8x8 fine masks inside kept blocks) stay
elementwise: multiply them into the packed blocks *before* the kernel
(one cheap fused elementwise op over nnz*bs*bs elements).

All kernels also run under ``interpret=True`` so the CPU test mesh
exercises them; :func:`block_sparse_matmul_xla` is the pure-XLA
reference/fallback (used when bs is not MXU-aligned).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# layout packing (host side, static per mask)
# ---------------------------------------------------------------------------

@dataclass(frozen=True, eq=False)   # identity hash: reuse layout objects
class BlockLayout:
    """Static index structure of one HCGS mask at block size ``bs``.

    For w of shape (N, K) with Nb x Kb block grid and R kept blocks per
    block-row:
      col_idx[j*R + k]  : in-block column of the k-th kept block of row j
      (transposed, padded to C = max blocks per column, with one zero
       block appended at packed position nnz)
      t_row_idx[c*C + k]: out-block row of the k-th block in column c
      t_perm[c*C + k]   : its packed position (nnz => zero pad block)
    """
    N: int
    K: int
    bs: int
    R: int
    C: int
    nnz: int
    col_idx: np.ndarray      # (Nb*R,) int32
    t_row_idx: np.ndarray    # (Kb*C,) int32
    t_perm: np.ndarray       # (Kb*C,) int32
    rows: np.ndarray         # (nnz,) out-block row per packed block
    cols: np.ndarray         # (nnz,) in-block col per packed block
    K_orig: int = 0          # pre-padding K (0 => K, no padding)

    @property
    def k_true(self) -> int:
        return self.K_orig or self.K

    @property
    def Nb(self) -> int:
        return self.N // self.bs

    @property
    def Kb(self) -> int:
        return self.K // self.bs

    def density(self) -> float:
        return self.nnz / (self.Nb * self.Kb)


def pack_layout(mask: np.ndarray, bs: int,
                pad_k: bool = False) -> BlockLayout:
    """Build the BlockLayout from a 0/1 mask (N, K). Requires equal kept
    count per block-row (guaranteed by HCGS generation).

    pad_k=True zero-pads the mask's column dim to the next multiple of
    ``bs`` so non-MXU-aligned input widths (e.g. the 143-dim fMLLR
    front end) can still run the packed kernels: ``layout.K`` becomes
    the padded width, ``layout.K_orig`` keeps the true one, and callers
    zero-pad x / dense weights to ``layout.K`` (pack_blocks does the
    weight side automatically)."""
    N, K = mask.shape
    K_orig = K
    if pad_k and K % bs:
        mask = np.concatenate(
            [np.asarray(mask), np.zeros((N, bs - K % bs), mask.dtype)],
            axis=1)
        K = mask.shape[1]
    if N % bs or K % bs:
        raise ValueError("mask %s not divisible by block %d" % (mask.shape, bs))
    Nb, Kb = N // bs, K // bs
    occ = mask.reshape(Nb, bs, Kb, bs).transpose(0, 2, 1, 3).any(axis=(2, 3))
    counts = occ.sum(axis=1)
    R = int(counts.max()) if counts.size else 0
    if not np.all(counts == R):
        raise ValueError("HCGS layout requires equal kept blocks per row, "
                         "got %s" % np.unique(counts))
    rows_l, cols_l = [], []
    col_idx = np.zeros(Nb * R, np.int32)
    for j in range(Nb):
        cs = np.where(occ[j])[0]
        col_idx[j * R:(j + 1) * R] = cs
        rows_l.extend([j] * R)
        cols_l.extend(cs.tolist())
    rows = np.asarray(rows_l, np.int32)
    cols = np.asarray(cols_l, np.int32)
    nnz = Nb * R
    # transposed (per in-block column) with padding
    percol = [[] for _ in range(Kb)]
    for p in range(nnz):
        percol[cols[p]].append(p)
    C = max((len(v) for v in percol), default=0)
    C = max(C, 1)
    t_row_idx = np.zeros(Kb * C, np.int32)
    t_perm = np.full(Kb * C, nnz, np.int32)  # nnz => zero pad block
    for c in range(Kb):
        for k, p in enumerate(percol[c]):
            t_row_idx[c * C + k] = rows[p]
            t_perm[c * C + k] = p
    return BlockLayout(N=N, K=K, bs=bs, R=R, C=C, nnz=nnz, col_idx=col_idx,
                       t_row_idx=t_row_idx, t_perm=t_perm, rows=rows,
                       cols=cols, K_orig=K_orig if K_orig != K else 0)


def pack_blocks(w: np.ndarray, layout: BlockLayout) -> np.ndarray:
    """Gather dense (N,K) into packed (nnz, bs, bs). A K-padded layout
    (pack_layout(pad_k=True)) accepts the ORIGINAL-width w and zero-pads
    the tail block columns here."""
    w = np.asarray(w)
    if w.shape[1] < layout.K:
        w = np.concatenate(
            [w, np.zeros((w.shape[0], layout.K - w.shape[1]), w.dtype)],
            axis=1)
    bs = layout.bs
    out = np.zeros((layout.nnz, bs, bs), w.dtype)
    for p in range(layout.nnz):
        r, c = layout.rows[p], layout.cols[p]
        out[p] = w[r * bs:(r + 1) * bs, c * bs:(c + 1) * bs]
    return out


def unpack_blocks(w_packed: np.ndarray, layout: BlockLayout) -> np.ndarray:
    bs = layout.bs
    out = np.zeros((layout.N, layout.K), np.asarray(w_packed).dtype)
    for p in range(layout.nnz):
        r, c = layout.rows[p], layout.cols[p]
        out[r * bs:(r + 1) * bs, c * bs:(c + 1) * bs] = w_packed[p]
    return out[:, :layout.k_true]


def pack_submasks(mask: np.ndarray, layout: BlockLayout) -> np.ndarray:
    """Level-2 fine masks inside kept blocks, packed like the weights."""
    return pack_blocks(mask.astype(np.float32), layout)


# ---------------------------------------------------------------------------
# XLA reference / fallback
# ---------------------------------------------------------------------------

def block_sparse_matmul_xla(x: jnp.ndarray, w_packed: jnp.ndarray,
                            layout: BlockLayout) -> jnp.ndarray:
    """Gather/einsum implementation — correct for any bs; used as the
    numerical reference and as fallback off the MXU-aligned path."""
    bs = layout.bs
    M = x.shape[0]
    xb = x.reshape(M, layout.Kb, bs)
    # per packed block: y_rows[p] = x[:, col_p] @ w_p.T
    xg = xb[:, layout.cols, :]                      # (M, nnz, bs)
    yb = jnp.einsum("mpk,pnk->mpn", xg, w_packed)   # (M, nnz, bs)
    # sum blocks of the same out-row: segment over rows
    y = jax.ops.segment_sum(yb.transpose(1, 0, 2),
                            jnp.asarray(layout.rows),
                            num_segments=layout.Nb)  # (Nb, M, bs)
    return y.transpose(1, 0, 2).reshape(M, layout.N)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _make_fwd(layout: BlockLayout, TILE_M: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, R, Nb = layout.bs, layout.R, layout.Nb

    def kernel(col_idx_ref, x_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == R - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def call(x, w_packed):
        M = x.shape[0]
        grid = (M // TILE_M, Nb, R)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TILE_M, bs),
                                 lambda i, j, k, ci: (i, ci[j * R + k])),
                    pl.BlockSpec((1, bs, bs),
                                 lambda i, j, k, ci: (j * R + k, 0, 0)),
                ],
                out_specs=pl.BlockSpec((TILE_M, bs),
                                       lambda i, j, k, ci: (i, j)),
                scratch_shapes=[pltpu.VMEM((TILE_M, bs), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((M, layout.N), x.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * layout.nnz * bs * bs,
                bytes_accessed=(M * layout.K + layout.nnz * bs * bs
                                + M * layout.N) * 4,
                transcendentals=0),
        )(jnp.asarray(layout.col_idx), x, w_packed)

    return call


def _make_dx(layout: BlockLayout, TILE_M: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, C, Kb = layout.bs, layout.C, layout.Kb

    def kernel(t_row_ref, t_perm_ref, g_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            g_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == C - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def call(g, w_packed_padded):
        M = g.shape[0]
        grid = (M // TILE_M, Kb, C)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TILE_M, bs),
                                 lambda i, c, k, tr, tp: (i, tr[c * C + k])),
                    pl.BlockSpec((1, bs, bs),
                                 lambda i, c, k, tr, tp: (tp[c * C + k], 0, 0)),
                ],
                out_specs=pl.BlockSpec((TILE_M, bs),
                                       lambda i, c, k, tr, tp: (i, c)),
                scratch_shapes=[pltpu.VMEM((TILE_M, bs), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((M, layout.K), g.dtype),
            interpret=interpret,
        )(jnp.asarray(layout.t_row_idx), jnp.asarray(layout.t_perm),
          g, w_packed_padded)

    return call


def _make_dw(layout: BlockLayout, TILE_M: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs = layout.bs

    def kernel(rows_ref, cols_ref, g_ref, x_ref, o_ref, acc_ref):
        m = pl.program_id(1)
        n_m = pl.num_programs(1)

        @pl.when(m == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            g_ref[...], x_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(m == n_m - 1)
        def _():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def call(g, x):
        M = g.shape[0]
        grid = (layout.nnz, M // TILE_M)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TILE_M, bs),
                                 lambda p, m, rw, cl: (m, rw[p])),
                    pl.BlockSpec((TILE_M, bs),
                                 lambda p, m, rw, cl: (m, cl[p])),
                ],
                out_specs=pl.BlockSpec((1, bs, bs),
                                       lambda p, m, rw, cl: (p, 0, 0)),
                scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((layout.nnz, bs, bs), g.dtype),
            interpret=interpret,
        )(jnp.asarray(layout.rows), jnp.asarray(layout.cols), g, x)

    return call


@functools.lru_cache(maxsize=64)
def _build_ops(layout: BlockLayout, TILE_M: int, interpret: bool):
    return (_make_fwd(layout, TILE_M, interpret),
            _make_dx(layout, TILE_M, interpret),
            _make_dw(layout, TILE_M, interpret))


# ---------------------------------------------------------------------------
# fused multi-matrix variant: G weight matrices sharing ONE layout (the
# LSTM's 4 gates share the hcgsx mask, ref: neural_networks.py:858-861).
# Stacking the G blocks at each kept position into (nnz, G*bs, bs) makes
# every grid step a (TILE_M,bs)x(bs,G*bs) MXU op: the x tile loaded from
# HBM is amortized over G gates -> Gx arithmetic intensity in fwd, dx
# and dw alike.
# ---------------------------------------------------------------------------

def pack_blocks_multi(ws, layout: BlockLayout) -> np.ndarray:
    """Stack G dense (N,K) matrices into (nnz, G*bs, bs)."""
    G = len(ws)
    bs = layout.bs
    out = np.zeros((layout.nnz, G * bs, bs), np.asarray(ws[0]).dtype)
    for g, w in enumerate(ws):
        pk = pack_blocks(np.asarray(w), layout)
        out[:, g * bs:(g + 1) * bs, :] = pk
    return out


def gather_blocks_multi(ws, layout: BlockLayout) -> jnp.ndarray:
    """Traceable version of pack_blocks_multi over jnp arrays: gathers
    kept blocks from dense (N,K) weights (grads scatter-add back)."""
    bs = layout.bs
    rows = jnp.asarray(layout.rows)
    cols = jnp.asarray(layout.cols)
    parts = []
    for w in ws:
        wb = w.reshape(layout.Nb, bs, layout.Kb, bs)
        parts.append(wb[rows, :, cols, :])        # (nnz, bs, bs)
    return jnp.concatenate(parts, axis=1)         # (nnz, G*bs, bs)


def _make_fwd_multi(layout: BlockLayout, G: int, TILE_M: int, interpret: bool):
    """x-row-stationary forward: grid (M/T, Nb); the whole (TILE_M, K)
    x row-block sits in VMEM across the inner j loop, the R-block
    reduction runs *inside* the kernel (fori + dynamic slices), so per-
    grid-step work is a full output tile instead of one 128-wide dot —
    amortizing grid overhead and x DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, R, Nb = layout.bs, layout.R, layout.Nb

    def kernel(col_idx_ref, x_ref, w_ref, o_ref):
        j = pl.program_id(1)

        def body(k, acc):
            ci = col_idx_ref[j * R + k]
            xb = x_ref[:, pl.ds(ci * bs, bs)]              # (TILE_M, bs)
            wb = w_ref[k]                                  # (G*bs, bs)
            return acc + jax.lax.dot_general(
                xb, wb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, R, body, jnp.zeros((TILE_M, G * bs), jnp.float32))
        o_ref[0] = acc.astype(o_ref.dtype)

    def call(x, w_stacked):
        M = x.shape[0]
        grid = (M // TILE_M, Nb)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TILE_M, layout.K),
                                 lambda i, j, ci: (i, 0)),
                    pl.BlockSpec((R, G * bs, bs),
                                 lambda i, j, ci: (j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, TILE_M, G * bs),
                                       lambda i, j, ci: (i, 0, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((M // TILE_M, TILE_M, Nb * G * bs),
                                           x.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * layout.nnz * bs * bs * G,
                bytes_accessed=(M * layout.K + layout.nnz * G * bs * bs
                                + M * layout.N * G) * 4,
                transcendentals=0),
        )(jnp.asarray(layout.col_idx), x, w_stacked)
        # out: (M/T, TILE_M, Nb*G*bs) where column block j holds the G
        # gates' bs-wide slices for out-block j -> regroup to (G, M, N)
        out = out.reshape(M, Nb, G, bs)
        return out.transpose(2, 0, 1, 3).reshape(G, M, layout.N)

    return call


def _make_dx_multi(layout: BlockLayout, G: int, TILE_M: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, C, Kb = layout.bs, layout.C, layout.Kb

    def kernel(t_row_ref, t_perm_ref, g_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        gmat = g_ref[0]                               # (TILE_M, G*bs)
        acc_ref[...] += jax.lax.dot_general(
            gmat, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (TILE_M, bs)

        @pl.when(k == C - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def call(g_grouped, w_stacked_padded):
        # g_grouped: (M/T, TILE_M, Nb*G*bs) layout produced by forward
        M = g_grouped.shape[0] * TILE_M
        grid = (M // TILE_M, Kb, C)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, TILE_M, G * bs),
                                 lambda i, c, k, tr, tp: (i, 0, tr[c * C + k])),
                    pl.BlockSpec((1, G * bs, bs),
                                 lambda i, c, k, tr, tp: (tp[c * C + k], 0, 0)),
                ],
                out_specs=pl.BlockSpec((TILE_M, bs),
                                       lambda i, c, k, tr, tp: (i, c)),
                scratch_shapes=[pltpu.VMEM((TILE_M, bs), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((M, layout.K), g_grouped.dtype),
            interpret=interpret,
        )(jnp.asarray(layout.t_row_idx), jnp.asarray(layout.t_perm),
          g_grouped, w_stacked_padded)

    return call


def _make_dw_multi(layout: BlockLayout, G: int, TILE_M: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs = layout.bs

    def kernel(rows_ref, cols_ref, g_ref, x_ref, o_ref, acc_ref):
        m = pl.program_id(1)
        n_m = pl.num_programs(1)

        @pl.when(m == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            g_ref[0], x_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (G*bs, bs)

        @pl.when(m == n_m - 1)
        def _():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def call(g_grouped, x):
        M = x.shape[0]
        grid = (layout.nnz, M // TILE_M)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, TILE_M, G * bs),
                                 lambda p, m, rw, cl: (m, 0, rw[p])),
                    pl.BlockSpec((TILE_M, bs),
                                 lambda p, m, rw, cl: (m, cl[p])),
                ],
                out_specs=pl.BlockSpec((1, G * bs, bs),
                                       lambda p, m, rw, cl: (p, 0, 0)),
                scratch_shapes=[pltpu.VMEM((G * bs, bs), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((layout.nnz, G * bs, bs),
                                           g_grouped.dtype),
            interpret=interpret,
        )(jnp.asarray(layout.rows), jnp.asarray(layout.cols), g_grouped, x)

    return call


@functools.lru_cache(maxsize=64)
def _build_multi_ops(layout: BlockLayout, G: int, TILE_M: int, interpret: bool):
    return (_make_fwd_multi(layout, G, TILE_M, interpret),
            _make_dx_multi(layout, G, TILE_M, interpret),
            _make_dw_multi(layout, G, TILE_M, interpret))


def block_sparse_matmul_multi(x: jnp.ndarray, w_stacked: jnp.ndarray,
                              layout: BlockLayout, n_mats: int,
                              tile_m: int = 256,
                              interpret: bool = False) -> jnp.ndarray:
    """ys[g] = x @ scatter(w_g).T for G matrices sharing one layout.

    x: (M, K); w_stacked: (nnz, G*bs, bs); returns (G, M, N).
    """
    M = x.shape[0]
    tile_m = min(tile_m, M)
    if M % tile_m:
        raise ValueError("M=%d not divisible by tile_m=%d" % (M, tile_m))
    G = n_mats
    bs, Nb = layout.bs, layout.Nb
    fwd, dxk, dwk = _build_multi_ops(layout, G, tile_m, interpret)

    def _regroup(g):
        """(G, M, N) cotangent -> the (M/T, TILE_M, Nb*G*bs) layout the
        backward kernels index."""
        gg = g.reshape(G, M, Nb, bs).transpose(1, 2, 0, 3)   # (M, Nb, G, bs)
        return gg.reshape(M // tile_m, tile_m, Nb * G * bs)

    @jax.custom_vjp
    def _op(x, w_stacked):
        return fwd(x, w_stacked)

    def _fwd_rule(x, w_stacked):
        return fwd(x, w_stacked), (x, w_stacked)

    def _bwd_rule(res, g):
        x, w_stacked = res
        gg = _regroup(g)
        pad = jnp.zeros((1,) + w_stacked.shape[1:], w_stacked.dtype)
        w_pad = jnp.concatenate([w_stacked, pad], axis=0)
        dx = dxk(gg, w_pad)
        dw = dwk(gg, x)
        return dx, dw

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(x, w_stacked)


def block_sparse_matmul(x: jnp.ndarray, w_packed: jnp.ndarray,
                        layout: BlockLayout, tile_m: int = 256,
                        interpret: bool = False) -> jnp.ndarray:
    """y = x @ scatter(w_packed).T via Pallas, differentiable.

    x: (M, K) with M padded to tile_m; w_packed: (nnz, bs, bs).
    """
    M = x.shape[0]
    tile_m = min(tile_m, M)
    if M % tile_m:
        raise ValueError("M=%d not divisible by tile_m=%d" % (M, tile_m))
    fwd, dxk, dwk = _build_ops(layout, tile_m, interpret)

    @jax.custom_vjp
    def _op(x, w_packed):
        return fwd(x, w_packed)

    def _fwd(x, w_packed):
        return fwd(x, w_packed), (x, w_packed)

    def _bwd(res, g):
        x, w_packed = res
        pad = jnp.zeros((1,) + w_packed.shape[1:], w_packed.dtype)
        w_pad = jnp.concatenate([w_packed, pad], axis=0)
        dx = dxk(g, w_pad)
        dw = dwk(g, x)
        return dx, dw

    _op.defvjp(_fwd, _bwd)
    return _op(x, w_packed)


# ---------------------------------------------------------------------------
# v3 "deep contraction" kernels.
#
# The v1/v2 kernels top out ~8x below XLA's matmul throughput because
# each MXU op only contracts one 128-block. v3 gathers the R kept
# x-blocks of a row into VMEM scratch and issues ONE dot with
# contraction depth R*bs (e.g. 768 at 25% drop), reaching dense-matmul
# efficiency while still skipping dropped blocks entirely:
#   w3    : (Nb, G*bs, R*bs)   row-major kept blocks (forward + dw)
#   w3csc : (Kb, C*G*bs, bs)   column-oriented copy (dx), zero-padded
# Both are cheap XLA gathers from the dense (masked) weights, so
# gradients flow back to the dense params through the gather.
# ---------------------------------------------------------------------------

def v3_from_blocks(blocks: jnp.ndarray, layout: BlockLayout, G: int):
    """Packed (nnz, G*bs, bs) blocks -> (w3, w3csc) kernel layouts
    (traceable: gradients flow back through the rearrangement)."""
    bs = layout.bs
    pad = jnp.zeros((1,) + blocks.shape[1:], blocks.dtype)
    blocks_pad = jnp.concatenate([blocks, pad], axis=0)
    w3 = blocks.reshape(layout.Nb, layout.R, G * bs, bs)
    w3 = w3.transpose(0, 2, 1, 3).reshape(layout.Nb, G * bs, layout.R * bs)
    w3csc = blocks_pad[jnp.asarray(layout.t_perm)]
    w3csc = w3csc.reshape(layout.Kb, layout.C * G * bs, bs)
    return w3, w3csc


def gather_v3(ws, layout: BlockLayout):
    """Dense (N,K) weights -> (w3, w3csc) gathered layouts (traceable)."""
    blocks = gather_blocks_multi(ws, layout)               # (nnz, G*bs, bs)
    return v3_from_blocks(blocks, layout, len(ws))


def _ceil_quant(w, bits: int):
    """In-kernel ceil-based symmetric weight quantizer — must equal
    sparsity.quantize.quantize_weight exactly (parity-tested)."""
    scale = 2.0 ** (bits - 1)
    w = jnp.clip(w, -1.0, 1.0)
    return jnp.sign(w) * (jnp.ceil(jnp.abs(w) * scale) / scale)


def _make_fwd_v3(layout: BlockLayout, G: int, TILE_M: int, interpret: bool,
                 fuse_sub: bool = False, qbits: int = 0):
    """fuse_sub/qbits: apply the level-2 submask multiply and/or the STE
    ceil quantizer to each streamed weight block INSIDE the kernel (VPU
    work overlapped with the MXU dot) instead of a separate XLA
    elementwise pass that re-reads and re-writes the whole packed weight
    every step (PERF.md: exactly this ate the win at 75% drop)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, R, Nb = layout.bs, layout.R, layout.Nb

    def kernel(col_idx_ref, x_ref, w_ref, *rest):
        if fuse_sub:
            sub_ref, o_ref, xg_ref, sems = rest
        else:
            o_ref, xg_ref, sems = rest
            sub_ref = None
        i = pl.program_id(0)
        j = pl.program_id(1)
        # x stays in HBM (ANY); DMA only the R kept blocks into scratch —
        # auto-fetching the whole (TILE_M, K) row per grid step was the
        # measured bandwidth floor
        for k in range(R):
            ci = pl.multiple_of(col_idx_ref[j * R + k] * bs, bs)
            pltpu.make_async_copy(
                x_ref.at[pl.ds(i * TILE_M, TILE_M), pl.ds(ci, bs)],
                xg_ref.at[:, k * bs:(k + 1) * bs],
                sems.at[k]).start()
        for k in range(R):
            ci = pl.multiple_of(col_idx_ref[j * R + k] * bs, bs)
            pltpu.make_async_copy(
                x_ref.at[pl.ds(i * TILE_M, TILE_M), pl.ds(ci, bs)],
                xg_ref.at[:, k * bs:(k + 1) * bs],
                sems.at[k]).wait()
        w_eff = w_ref[0]
        if qbits:
            w_eff = _ceil_quant(w_eff, qbits)
        if fuse_sub:
            w_eff = w_eff * sub_ref[0]
        # one deep dot per gate, each writing its output plane directly
        xg = xg_ref[...]
        for g in range(G):
            acc_g = jax.lax.dot_general(
                xg, w_eff[g * bs:(g + 1) * bs, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (TILE_M, bs)
            o_ref[g, 0] = acc_g.astype(o_ref.dtype)

    def call(x, w3, sub3=None):
        M = x.shape[0]
        grid = (M // TILE_M, Nb)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, G * bs, R * bs),
                         lambda i, j, ci: (j, 0, 0)),
        ]
        args = [jnp.asarray(layout.col_idx), x, w3]
        if fuse_sub:
            in_specs.append(pl.BlockSpec((1, G * bs, R * bs),
                                         lambda i, j, ci: (j, 0, 0)))
            args.append(sub3)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((G, 1, TILE_M, bs),
                                       lambda i, j, ci: (0, i, 0, j)),
                scratch_shapes=[pltpu.VMEM((TILE_M, R * bs), jnp.float32),
                                pltpu.SemaphoreType.DMA((R,))],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (G, M // TILE_M, TILE_M, layout.N), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * layout.nnz * bs * bs * G,
                bytes_accessed=(M * layout.K + layout.nnz * G * bs * bs
                                + M * layout.N * G) * 4,
                transcendentals=0),
        )(*args)
        return out.reshape(G, M, layout.N)

    return call


def _make_dx_v3(layout: BlockLayout, G: int, TILE_M: int, interpret: bool,
                fuse_sub: bool = False, qbits: int = 0):
    """Row-stationary dx: grid (M/TILE,); the (TILE, K) dx row-block
    accumulates in VMEM while gy blocks and w3 blocks stream through
    double buffers — gy and w3 are each read exactly ONCE per row-block
    (the earlier column-parallel design auto-fetched the whole
    (TILE, Nb*G*bs) gy row per output column: Kb x the traffic, measured
    0.63x vs dense at 2048/75%). fuse_sub/qbits: see _make_fwd_v3 — dx
    contracts against the same effective weight the forward used."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, R, Nb = layout.bs, layout.R, layout.Nb

    def kernel(col_idx_ref, gy_ref, w_ref, *rest):
        if fuse_sub:
            (sub_ref, o_ref, acc_ref, gy_buf, w_buf, sub_buf, sems) = rest
        else:
            o_ref, acc_ref, gy_buf, w_buf, sems = rest
            sub_ref = sub_buf = None
        i = pl.program_id(0)

        def gy_dma(slot, j):
            return pltpu.make_async_copy(
                gy_ref.at[pl.ds(i * TILE_M, TILE_M),
                          pl.ds(j * G * bs, G * bs)],
                gy_buf.at[slot], sems.at[slot])

        def w_dma(slot, j):
            return pltpu.make_async_copy(
                w_ref.at[j], w_buf.at[slot], sems.at[2 + slot])

        def sub_dma(slot, j):
            return pltpu.make_async_copy(
                sub_ref.at[j], sub_buf.at[slot], sems.at[4 + slot])

        gy_dma(0, 0).start()
        w_dma(0, 0).start()
        if fuse_sub:
            sub_dma(0, 0).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)

        # static unroll over out-blocks (Nb is a layout constant): all
        # DMA slots/indices become compile-time values — the fori_loop
        # version's traced double-buffer indexing stalled the Mosaic
        # compiler for minutes
        for j in range(Nb):
            slot = j % 2
            if j + 1 < Nb:
                gy_dma(1 - slot, j + 1).start()
                w_dma(1 - slot, j + 1).start()
                if fuse_sub:
                    sub_dma(1 - slot, j + 1).start()
            gy_dma(slot, j).wait()
            w_dma(slot, j).wait()
            w_eff = w_buf[slot]
            if qbits:
                w_eff = _ceil_quant(w_eff, qbits)
            if fuse_sub:
                sub_dma(slot, j).wait()
                w_eff = w_eff * sub_buf[slot]
            part = jax.lax.dot_general(
                gy_buf[slot], w_eff, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (TILE, R*bs)
            for k in range(R):
                ci = pl.multiple_of(col_idx_ref[j * R + k] * bs, bs)
                acc_ref[:, pl.ds(ci, bs)] += part[:, k * bs:(k + 1) * bs]
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def call(gy_flat, w3, dtype, sub3=None):
        M = gy_flat.shape[0]
        grid = (M // TILE_M,)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        args = [jnp.asarray(layout.col_idx), gy_flat, w3]
        scratch = [
            pltpu.VMEM((TILE_M, layout.K), jnp.float32),
            pltpu.VMEM((2, TILE_M, G * bs), gy_flat.dtype),
            pltpu.VMEM((2, G * bs, R * bs), w3.dtype),
        ]
        if fuse_sub:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
            args.append(sub3)
            scratch.append(pltpu.VMEM((2, G * bs, R * bs), sub3.dtype))
            scratch.append(pltpu.SemaphoreType.DMA((6,)))
        else:
            scratch.append(pltpu.SemaphoreType.DMA((4,)))
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((TILE_M, layout.K),
                                       lambda i, ci: (i, 0)),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((M, layout.K), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * layout.nnz * bs * bs * G,
                bytes_accessed=(M * G * layout.N + layout.nnz * G * bs * bs
                                + M * layout.K) * 4,
                transcendentals=0),
        )(*args)

    return call


def _make_dw_v3(layout: BlockLayout, G: int, TILE_M: int, interpret: bool,
                fuse_sub: bool = False):
    """dw: grid (Nb, M/T), per-out-block accumulator (G*bs, R*bs) in
    VMEM; only the R kept x column-blocks are DMA'd (the earlier version
    auto-fetched the full (TILE, K) x row per (j, m): Kb/R x the x
    traffic). fuse_sub: multiply the accumulated dw by the level-2
    submask block at the final write (effective weight = quant(w)*sub;
    STE passes the quantizer, the mask multiplies — so dw = acc*sub)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bs, R, Nb = layout.bs, layout.R, layout.Nb

    def kernel(col_idx_ref, gy_ref, x_ref, *rest):
        if fuse_sub:
            sub_ref, o_ref, xg_ref, acc_ref, sems = rest
        else:
            o_ref, xg_ref, acc_ref, sems = rest
            sub_ref = None
        j = pl.program_id(0)
        m = pl.program_id(1)
        n_m = pl.num_programs(1)

        def dma(slot, mm, k):
            ci = pl.multiple_of(col_idx_ref[j * R + k] * bs, bs)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(mm * TILE_M, TILE_M), pl.ds(ci, bs)],
                xg_ref.at[slot, :, k * bs:(k + 1) * bs], sems.at[slot * R + k])

        # double-buffered x gather: slot m%2 was started on the previous
        # step; kick off m+1 before computing so the DMA hides under dot
        @pl.when(m == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            for k in range(R):
                dma(0, m, k).start()

        slot = jax.lax.rem(m, 2)
        nxt = jax.lax.rem(m + 1, 2)

        @pl.when(m + 1 < n_m)
        def _():
            for k in range(R):
                dma(nxt, m + 1, k).start()

        for k in range(R):
            dma(slot, m, k).wait()

        acc_ref[...] += jax.lax.dot_general(
            gy_ref[...], xg_ref[slot], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(m == n_m - 1)
        def _():
            if fuse_sub:
                o_ref[0] = (acc_ref[...] *
                            sub_ref[0].astype(jnp.float32)).astype(
                                o_ref.dtype)
            else:
                o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def call(gy_flat, x, dtype, sub3=None):
        M = x.shape[0]
        grid = (Nb, M // TILE_M)
        in_specs = [
            pl.BlockSpec((TILE_M, G * bs),
                         lambda j, m, ci: (m, j)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        args = [jnp.asarray(layout.col_idx), gy_flat, x]
        if fuse_sub:
            in_specs.append(pl.BlockSpec((1, G * bs, R * bs),
                                         lambda j, m, ci: (j, 0, 0)))
            args.append(sub3)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, G * bs, R * bs),
                                       lambda j, m, ci: (j, 0, 0)),
                scratch_shapes=[pltpu.VMEM((2, TILE_M, R * bs), x.dtype),
                                pltpu.VMEM((G * bs, R * bs), jnp.float32),
                                pltpu.SemaphoreType.DMA((2 * R,))],
            ),
            out_shape=jax.ShapeDtypeStruct((Nb, G * bs, R * bs), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * layout.nnz * bs * bs * G,
                bytes_accessed=(M * G * layout.N + M * layout.R * bs
                                + layout.nnz * G * bs * bs) * 4,
                transcendentals=0),
        )(*args)

    return call


@functools.lru_cache(maxsize=64)
def _build_v3_ops(layout: BlockLayout, G: int, TILE_M: int, interpret: bool,
                  fuse_sub: bool = False, qbits: int = 0):
    return (_make_fwd_v3(layout, G, TILE_M, interpret, fuse_sub, qbits),
            _make_dx_v3(layout, G, TILE_M, interpret, fuse_sub, qbits),
            _make_dw_v3(layout, G, TILE_M, interpret, fuse_sub))


def block_sparse_matmul_v3(x: jnp.ndarray, w3: jnp.ndarray,
                           w3csc=None, layout: BlockLayout = None,
                           n_mats: int = 1, tile_m: int = 256,
                           interpret: bool = False,
                           sub3: jnp.ndarray = None,
                           quant_bits: int = 0) -> jnp.ndarray:
    """Deep-contraction block-sparse matmul: ys[g] = x @ w_g_dense.T.

    x: (M, K); w3 from :func:`gather_v3` / :func:`pack_w3`. Returns
    (G, M, N). ``w3csc`` is accepted for API compatibility but unused —
    the backward kernels stream w3 directly (threading an unused
    multi-MB operand through the custom_vjp materialized zero
    cotangents for it every step).

    sub3 (level-2 submask in the w3 layout) and quant_bits (STE ceil
    quantizer) are applied to the streamed weight blocks INSIDE the
    kernels: effective weight = ceil_quant(w3)*sub3, grads flow to w3
    through the STE + constant mask. Passing them here replaces the
    per-step XLA elementwise passes over the full packed weight that
    PERF.md measured eating the sparse win at 75% drop.
    """
    M = x.shape[0]
    tile_m = min(tile_m, M)
    if M % tile_m:
        raise ValueError("M=%d not divisible by tile_m=%d" % (M, tile_m))
    G = n_mats
    bs, Nb = layout.bs, layout.Nb
    fuse_sub = sub3 is not None
    fwd, _, _ = _build_v3_ops(layout, G, tile_m, interpret, fuse_sub,
                              quant_bits)
    # backward tile: the dx kernel keeps a (TILE, K) f32 accumulator +
    # output row-block in VMEM (2*TILE*K*4 <= ~8MB) + streaming buffers;
    # bigger tiles amortize the per-j DMA/dot overhead (TILE 256
    # measured DMA-latency-bound). Must divide M and stay 8-aligned.
    bound = max(8, (1024 * 1024 // layout.K) // 8 * 8)
    tile_bwd = M if M < 8 else 8
    t = 8
    while t <= min(M, bound):
        if M % t == 0:
            tile_bwd = t
        t += 8
    _, dxk, dwk = _build_v3_ops(layout, G, tile_bwd, interpret, fuse_sub,
                                quant_bits)

    def _flatten_cotangent(g):
        """(G, M, N) -> (M, Nb*G*bs): block j's columns hold all G
        gates' bs-wide slices for out-block j (the layout both backward
        kernels stream)."""
        gg = g.reshape(G, M, Nb, bs).transpose(1, 2, 0, 3)
        return gg.reshape(M, Nb * G * bs)

    if fuse_sub:
        @jax.custom_vjp
        def _opf(x, w3, sub3):
            return fwd(x, w3, sub3)

        def _fwd_rule_f(x, w3, sub3):
            return fwd(x, w3, sub3), (x, w3, sub3)

        def _bwd_rule_f(res, g):
            x, w3, sub3 = res
            gg = _flatten_cotangent(g)
            dx = dxk(gg, w3, x.dtype, sub3)
            dw3 = dwk(gg, x, w3.dtype, sub3)
            return dx, dw3, jnp.zeros_like(sub3)

        _opf.defvjp(_fwd_rule_f, _bwd_rule_f)
        return _opf(x, w3, sub3)

    @jax.custom_vjp
    def _op(x, w3):
        return fwd(x, w3)

    def _fwd_rule(x, w3):
        return fwd(x, w3), (x, w3)

    def _bwd_rule(res, g):
        x, w3 = res
        gg = _flatten_cotangent(g)
        dx = dxk(gg, w3, x.dtype)
        dw3 = dwk(gg, x, w3.dtype)
        return dx, dw3

    _op.defvjp(_fwd_rule, _bwd_rule)
    return _op(x, w3)


# ---------------------------------------------------------------------------
# packed-parameter storage: block-sparse layers keep their weights IN
# the w3 kernel layout (Nb, bs, R*bs) as trainable leaves. HCGS masks
# are fixed for the whole run (ref: cfg/record.md §3), so the dropped
# blocks are dead weights — storing only kept blocks removes the
# per-step dense->packed gather AND its backward scatter (measured:
# dense-stored sparse MLP 0.88x vs dense-masked, packed-stored 1.40x),
# and shrinks params + optimizer state by the block compression ratio.
# ---------------------------------------------------------------------------

def pack_w3(w: np.ndarray, layout: BlockLayout) -> np.ndarray:
    """Dense (N, K) -> packed (Nb, bs, R*bs) (host-side, numpy)."""
    blocks = pack_blocks(np.asarray(w), layout)            # (nnz, bs, bs)
    return blocks.reshape(layout.Nb, layout.R, layout.bs, layout.bs) \
        .transpose(0, 2, 1, 3) \
        .reshape(layout.Nb, layout.bs, layout.R * layout.bs)


def unpack_w3(w3: np.ndarray, layout: BlockLayout) -> np.ndarray:
    """Packed (Nb, bs, R*bs) -> dense (N, K) with dropped blocks zero."""
    blocks = np.asarray(w3).reshape(layout.Nb, layout.bs, layout.R,
                                    layout.bs).transpose(0, 2, 1, 3) \
        .reshape(layout.nnz, layout.bs, layout.bs)
    return unpack_blocks(blocks, layout)


def stack_w3_gates(gate_w3s) -> jnp.ndarray:
    """Per-gate packed (Nb, bs, R*bs) -> the kernel's (Nb, G*bs, R*bs)."""
    return jnp.concatenate(list(gate_w3s), axis=1)
