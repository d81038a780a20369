"""Analytic storage-overhead calculators for sparse weight encodings.

Counterpart of the reference's calculators
(ref: sparsity/sparsity.py:1153-1315): given a weight shape, sparsity
and bit width, estimate the total storage (payload + index structures)
for dense / CSR / CSC / COO / run-length / bitmap / pattern encodings.
Computed analytically (expected values) instead of sampling random
sparse matrices, so results are deterministic.
"""

from __future__ import annotations

import math
from typing import Sequence


def _dims(shape: Sequence[int]):
    rows = shape[0]
    cols = 1
    for s in shape[1:]:
        cols *= s
    return rows, cols


def dense_bits(shape, sparsity: float = 0.0, weight_bit: int = 8) -> float:
    rows, cols = _dims(shape)
    return rows * cols * weight_bit


def csr_bits(shape, sparsity: float, weight_bit: int = 8) -> float:
    rows, cols = _dims(shape)
    nnz = rows * cols * (1.0 - sparsity)
    col_idx_bits = max(math.log2(max(cols, 2)), 1.0)
    ptr_bits = max(math.log2(max(nnz, 2)), 1.0)
    return nnz * col_idx_bits + (rows + 1) * ptr_bits + nnz * weight_bit


def csc_bits(shape, sparsity: float, weight_bit: int = 8) -> float:
    rows, cols = _dims(shape)
    nnz = rows * cols * (1.0 - sparsity)
    row_idx_bits = max(math.log2(max(rows, 2)), 1.0)
    ptr_bits = max(math.log2(max(nnz, 2)), 1.0)
    return nnz * row_idx_bits + (cols + 1) * ptr_bits + nnz * weight_bit


def coo_bits(shape, sparsity: float, weight_bit: int = 8) -> float:
    rows, cols = _dims(shape)
    nnz = rows * cols * (1.0 - sparsity)
    return nnz * (math.log2(max(rows, 2)) + math.log2(max(cols, 2)) + weight_bit)


def rlc_bits(shape, sparsity: float, weight_bit: int = 8,
             run_bits: int = 4) -> float:
    """Run-length coding of zero gaps between nonzeros."""
    rows, cols = _dims(shape)
    nnz = rows * cols * (1.0 - sparsity)
    if nnz <= 0:
        return 0.0
    mean_gap = sparsity / max(1.0 - sparsity, 1e-9)
    # each nonzero stores its gap in run_bits chunks (escape on overflow)
    chunks = max(1.0, math.ceil((mean_gap + 1) / (2 ** run_bits - 1)))
    return nnz * (run_bits * chunks + weight_bit)


def bitmap_bits(shape, sparsity: float, weight_bit: int = 8) -> float:
    rows, cols = _dims(shape)
    nnz = rows * cols * (1.0 - sparsity)
    return rows * cols * 1.0 + nnz * weight_bit


def pattern_bits(shape, sparsity: float, weight_bit: int = 8,
                 pattern_shape=(8, 8), pattern_num: int = 16,
                 pattern_nnz: int = 4) -> float:
    """Pattern encoding: per block a pattern index + nnz payload, plus
    the shared pattern table."""
    rows, cols = _dims(shape)
    ph, pw = pattern_shape
    n_blocks = (rows // ph) * (cols // pw)
    idx_bits = math.log2(max(pattern_num, 2))
    table_bits = pattern_num * ph * pw
    return n_blocks * (idx_bits + pattern_nnz * weight_bit) + table_bits


def hcgs_bits(shape, block_sizes, drop_ratios, weight_bit: int = 8) -> float:
    """HCGS encoding: per level, each surviving super-block stores per
    block-row the indices of its kept column blocks; payload only for
    surviving elements."""
    rows, cols = _dims(shape)
    density = 1.0       # fraction of matrix surviving *before* this level
    bits = 0.0
    r, c = rows, cols   # size of one surviving region at this level
    for block, drop in zip(block_sizes, drop_ratios):
        keep = 1.0 - drop / 100.0
        n_blk_rows = math.ceil(r / block)
        n_blk_cols = math.ceil(c / block)
        n_sel = round(n_blk_cols * keep)
        sel_bits = n_sel * math.log2(max(n_blk_cols, 2))
        n_regions = density * (rows * cols) / (r * c)
        bits += n_regions * n_blk_rows * sel_bits
        density *= keep
        r, c = block, block
    return rows * cols * density * weight_bit + bits


def compression_summary(shape, sparsity: float, weight_bit: int = 8) -> dict:
    base = dense_bits(shape, 0.0, weight_bit)
    return {
        "dense": 1.0,
        "csr": base / csr_bits(shape, sparsity, weight_bit),
        "csc": base / csc_bits(shape, sparsity, weight_bit),
        "coo": base / coo_bits(shape, sparsity, weight_bit),
        "rlc": base / rlc_bits(shape, sparsity, weight_bit),
        "bitmap": base / bitmap_bits(shape, sparsity, weight_bit),
        "pattern": base / pattern_bits(shape, sparsity, weight_bit),
    }
