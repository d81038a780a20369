"""HCGS — Hierarchical Coarse-Grain Sparsity mask generators.

Re-implements the reference's recursive block-mask construction
(ref: hcgs.py:8-74, cgs_base.py:4-58, guided_hcgs.py:9-77,
guided_choices.py:4-31) as pure seeded numpy:

  * level l partitions the matrix into ``block_sizes[l]``-square blocks;
  * per block-row, ``round(n_block_cols * (1 - drop%/100))`` column
    blocks are kept — chosen uniformly at random (HCGS) or as the top-k
    blocks by mean |W| (guided HCGS);
  * each surviving block recursively receives the next level's mask;
    when levels are exhausted the block is dense.

e.g. ``blocks=(128,4), drop=(25,62.5)`` keeps 75% of 128x128 blocks and
37.5% of 4x4 sub-blocks inside them → 28.1% density ≈ 3.6x compression
(cfg semantics of ``hcgs_block``/``hcgs_sparse``,
ref: cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_hcgs.cfg:163-166).

Masks are generated once per experiment from a seeded generator and then
live in the checkpointed ``masks`` collection of the model variables —
which also fixes the reference's accidental dependence on Parameter
restore ordering for mask persistence across chunks.

TPU note: the level-1 blocks (64/128-sized) align with the 128x128 MXU
tile; :mod:`pytorch_kaldi_cgs_tpu.ops.block_sparse` consumes the
block-level occupancy map produced here to skip whole tiles instead of
multiplying by zeros.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _keep_count(n_blocks: int, drop_ratio: float) -> int:
    """Kept blocks per row at one level — clamped to >= 1.

    The reference's ``int(round(n_blk_cols * sparsity))``
    (hcgs.py:26) rounds to ZERO whenever the block grid is narrow
    relative to the drop (e.g. a 143-wide fMLLR input under a 128
    block with >= 75% level-1 drop: round(2 * 0.25) = 0) — the whole
    projection masks out and the layer can never see its input; the
    reference only avoids this because its shipped cfgs pair narrow
    inputs with gentle level-1 drops (25%). Clamping to one kept block
    keeps the layer alive; the effective compression of narrow layers
    is then bounded by the grid (documented in examples/cgs_curve.py)."""
    return max(1, int(round(n_blocks * (1.0 - drop_ratio / 100.0))))


def _block_grid(n: int, block: int) -> int:
    return n // block + (1 if n % block else 0)


def hcgs_mask(n_rows: int, n_cols: int, block_sizes: Sequence[int],
              drop_ratios: Sequence[float],
              rng: np.random.RandomState | None = None,
              seed: int | None = None) -> np.ndarray:
    """Random hierarchical block mask of shape ``(n_rows, n_cols)``.

    Equivalent to ref ``hcgs.conn_mat(n_rows, n_cols, blocks, drops)``
    with ``equal_blks_for_input=True`` (the only mode the models use,
    ref: HCGS.py:28): selection happens per *row* block across *column*
    blocks.
    """
    if len(block_sizes) != len(drop_ratios):
        raise ValueError("block_sizes and drop_ratios must have equal length")
    if rng is None:
        rng = np.random.RandomState(seed)
    return _level_mask(n_rows, n_cols, list(block_sizes), list(drop_ratios), rng, None)


def guided_hcgs_mask(weight: np.ndarray, block_sizes: Sequence[int],
                     drop_ratios: Sequence[float],
                     rng: np.random.RandomState | None = None,
                     seed: int | None = None) -> np.ndarray:
    """Weight-magnitude-guided hierarchical block mask shaped like
    ``weight``: per row block, keep the top-k column blocks by mean |W|
    (ref: guided_hcgs.py:32, guided_choices.py:4-31)."""
    if rng is None:
        rng = np.random.RandomState(seed)
    w = np.abs(np.asarray(weight, dtype=np.float64))
    return _level_mask(w.shape[0], w.shape[1], list(block_sizes),
                       list(drop_ratios), rng, w)


def _level_mask(n_rows: int, n_cols: int, blocks: list, drops: list,
                rng: np.random.RandomState, guide: np.ndarray | None) -> np.ndarray:
    if not blocks:
        return np.ones((n_rows, n_cols), dtype=np.float32)
    block = blocks[0]
    drop = drops[0]
    n_blk_rows = _block_grid(n_rows, block)
    n_blk_cols = _block_grid(n_cols, block)
    n_keep = _keep_count(n_blk_cols, drop)
    mask = np.zeros((n_rows, n_cols), dtype=np.float32)
    for bi in range(n_blk_rows):
        r0, r1 = bi * block, min((bi + 1) * block, n_rows)
        if guide is None:
            chosen = rng.choice(n_blk_cols, n_keep, replace=False)
        else:
            chosen = _top_blocks_by_mean(guide[r0:r1], block, n_blk_cols, n_keep)
        for bj in chosen:
            c0, c1 = bj * block, min((bj + 1) * block, n_cols)
            sub_guide = guide[r0:r1, c0:c1] if guide is not None else None
            mask[r0:r1, c0:c1] = _level_mask(r1 - r0, c1 - c0, blocks[1:],
                                             drops[1:], rng, sub_guide)
    return mask


def _top_blocks_by_mean(row_band: np.ndarray, block: int, n_blk_cols: int,
                        n_keep: int) -> np.ndarray:
    """Mean |W| per column block of one row band → indices of the top
    ``n_keep`` (ref: guided_choices.py:4-31, avg-pool + argsort)."""
    scores = np.empty(n_blk_cols, dtype=np.float64)
    for bj in range(n_blk_cols):
        c0, c1 = bj * block, min((bj + 1) * block, row_band.shape[1])
        scores[bj] = row_band[:, c0:c1].mean()
    return np.argsort(scores, kind="stable")[-n_keep:]


def mask_density(mask: np.ndarray) -> float:
    return float(np.count_nonzero(mask)) / mask.size


def expected_density(block_sizes: Sequence[int], drop_ratios: Sequence[float]) -> float:
    """Product of per-level keep fractions (exact when shapes divide evenly)."""
    d = 1.0
    for drop in drop_ratios:
        d *= 1.0 - drop / 100.0
    return d


def block_occupancy(mask: np.ndarray, block: int) -> np.ndarray:
    """Level-1 occupancy map: 1 where a ``block``-square tile of the mask
    has any nonzero. Feed to the block-sparse Pallas matmul to skip
    whole MXU tiles."""
    R = _block_grid(mask.shape[0], block)
    C = _block_grid(mask.shape[1], block)
    occ = np.zeros((R, C), dtype=np.bool_)
    for i in range(R):
        for j in range(C):
            occ[i, j] = np.any(mask[i * block:(i + 1) * block,
                                    j * block:(j + 1) * block])
    return occ
