"""Pattern-based structured sparsity.

Covers the reference's pattern stack:
  * static mask modes ``pattern`` / ``coo`` / ``pattern_coo``
    (ref: Pattern.py:77-133) — tile a weight matrix with fixed-shape
    (e.g. 8x8) blocks, each masked by one of ``pattern_num`` candidate
    nnz-patterns (random, per-block top-|w|, or half/half);
  * k-means pattern *search* (ref: sparsity/sparsity.py:999-1049
    ``find_top_k_by_kmeans``): per-block top-nnz binary codes clustered
    with KMeans, cluster centers re-binarized to top-nnz patterns;
  * pattern *application* (ref: sparsity/sparsity.py:1112-1146
    ``apply_patterns``): score every block against every pattern by the
    |w| mass it retains, choose the argmax pattern per block;
  * the exhaustive C(n,k) pattern set + similarity-scored top-k
    (ref: sparsity/sparsity.py:937-997) used by ``pattern_from_weight``.

All pure numpy — pattern refresh happens on the host between chunks
(the reference refreshes on the first forward of a chunk when the
pattern dict is empty, ref: neural_networks.py:876-884); the resulting
masks enter the jitted step as constants.
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# static mask modes (ref: Pattern.py)
# ---------------------------------------------------------------------------

def random_patterns(pattern_shape: Sequence[int], pattern_nnz: int,
                    pattern_num: int, rng: np.random.RandomState) -> np.ndarray:
    """``pattern_num`` random patterns of shape ``pattern_shape``.

    NB: the reference draws positions *with replacement*
    (ref: Pattern.py:73, np.random.choice default), so a pattern's true
    nnz can be below ``pattern_nnz`` — reproduced intentionally.
    """
    size = int(np.prod(pattern_shape))
    out = np.zeros((pattern_num, size), dtype=np.float32)
    for i in range(pattern_num):
        out[i, rng.choice(size, pattern_nnz)] = 1
    return out.reshape((pattern_num,) + tuple(pattern_shape))


def _check_divisible(shape, pattern_shape):
    if shape[0] % pattern_shape[0] or shape[1] % pattern_shape[1]:
        raise ValueError("weight %s not divisible by pattern %s"
                         % (shape, tuple(pattern_shape)))


def pattern_mask(weight_shape: Sequence[int], patterns: np.ndarray,
                 rng: np.random.RandomState) -> np.ndarray:
    """Tile the weight with uniformly random choices from ``patterns``
    (ref: Pattern.py:77-91)."""
    _check_divisible(weight_shape, patterns.shape[1:])
    ph, pw = patterns.shape[1:]
    mask = np.zeros(weight_shape, dtype=np.float32)
    for i in range(weight_shape[0] // ph):
        for j in range(weight_shape[1] // pw):
            mask[i * ph:(i + 1) * ph, j * pw:(j + 1) * pw] = \
                patterns[rng.choice(len(patterns))]
    return mask


def coo_mask(weight: np.ndarray, pattern_shape: Sequence[int],
             pattern_nnz: int) -> np.ndarray:
    """Per-block top-nnz |w| mask (ref: Pattern.py:93-110)."""
    _check_divisible(weight.shape, pattern_shape)
    ph, pw = pattern_shape
    mask = np.zeros(weight.shape, dtype=np.float32)
    for i in range(weight.shape[0] // ph):
        for j in range(weight.shape[1] // pw):
            block = np.abs(weight[i * ph:(i + 1) * ph, j * pw:(j + 1) * pw]).ravel()
            keep = np.argsort(block)[-pattern_nnz:]
            m = np.zeros(block.shape, dtype=np.float32)
            m[keep] = 1
            mask[i * ph:(i + 1) * ph, j * pw:(j + 1) * pw] = m.reshape(ph, pw)
    return mask


def pattern_coo_mask(weight: np.ndarray, pattern_shape: Sequence[int],
                     pattern_nnz: int, pattern_num: int,
                     rng: np.random.RandomState) -> np.ndarray:
    """Half pattern + half per-block coo fill (ref: Pattern.py:112-133)."""
    import math
    _check_divisible(weight.shape, pattern_shape)
    ph, pw = pattern_shape
    pat_nnz = math.ceil(pattern_nnz / 2)
    coo_nnz = pattern_nnz - pat_nnz
    patterns = random_patterns(pattern_shape, pat_nnz, pattern_num, rng)
    mask = np.zeros(weight.shape, dtype=np.float32)
    for i in range(weight.shape[0] // ph):
        for j in range(weight.shape[1] // pw):
            m = patterns[rng.choice(pattern_num)].ravel().copy()
            block = np.abs(weight[i * ph:(i + 1) * ph, j * pw:(j + 1) * pw]).ravel()
            scored = block * (1.0 - m)
            m[np.argsort(scored)[-coo_nnz:]] = 1
            mask[i * ph:(i + 1) * ph, j * pw:(j + 1) * pw] = m.reshape(ph, pw)
    return mask


# ---------------------------------------------------------------------------
# pattern search (k-means / exhaustive similarity)
# ---------------------------------------------------------------------------

def _comb_num(n: int, k: int) -> int:
    import math
    return math.comb(n, k)


def _block_codes(absw: np.ndarray, pattern_shape, stride, pattern_nnz) -> np.ndarray:
    """Per-block binary top-nnz codes, flattened (one row per block)."""
    ph, pw = pattern_shape
    sh, sw = stride
    nx = (absw.shape[0] - ph) // sh + 1
    ny = (absw.shape[1] - pw) // sw + 1
    codes = np.zeros((nx * ny, ph * pw), dtype=np.float32)
    k = 0
    for i in range(nx):
        for j in range(ny):
            block = absw[i * sh:i * sh + ph, j * sw:j * sw + pw].ravel()
            thresh = np.sort(block)[-pattern_nnz]
            codes[k] = (block >= thresh).astype(np.float32)
            k += 1
    return codes


def find_top_k_by_kmeans(weight: np.ndarray, pattern_num: int,
                         pattern_shape: Sequence[int], pattern_nnz: int,
                         stride: Sequence[int] | None = None,
                         seed: int = 0) -> np.ndarray:
    """KMeans over per-block top-nnz binary codes; centers re-binarized
    to top-nnz patterns (ref: sparsity/sparsity.py:999-1049). Returns
    (pattern_num, ph, pw)."""
    from sklearn.cluster import KMeans
    if stride is None:
        stride = pattern_shape
    total = int(np.prod(pattern_shape))
    pattern_num = min(pattern_num, _comb_num(total, pattern_nnz))
    codes = _block_codes(np.abs(np.asarray(weight, dtype=np.float64)),
                         pattern_shape, stride, pattern_nnz)
    # can't have more clusters than blocks (tiny layers)
    pattern_num = min(pattern_num, len(codes))
    clf = KMeans(n_clusters=pattern_num, n_init=10, random_state=seed)
    clf.fit(codes)
    patterns = np.zeros((pattern_num, total), dtype=np.float32)
    for i, center in enumerate(clf.cluster_centers_):
        top = np.argsort(center, kind="stable")[-pattern_nnz:]
        patterns[i, top] = 1
    return patterns.reshape((pattern_num,) + tuple(pattern_shape))


def apply_patterns(weight: np.ndarray, patterns: np.ndarray) -> np.ndarray:
    """For each block, keep the pattern retaining the most |w| mass
    (ref: sparsity/sparsity.py:1112-1146, conv2d scoring + argmax).

    Vectorized: reshape into blocks, score = blocks·patternsᵀ, argmax.
    """
    absw = np.abs(np.asarray(weight, dtype=np.float64))
    P, ph, pw = patterns.shape
    _check_divisible(absw.shape, (ph, pw))
    R, C = absw.shape[0] // ph, absw.shape[1] // pw
    blocks = absw.reshape(R, ph, C, pw).transpose(0, 2, 1, 3).reshape(R * C, ph * pw)
    scores = blocks @ patterns.reshape(P, ph * pw).T       # (R*C, P)
    best = np.argmax(scores, axis=1)
    mask_blocks = patterns.reshape(P, ph * pw)[best]       # (R*C, ph*pw)
    mask = mask_blocks.reshape(R, C, ph, pw).transpose(0, 2, 1, 3).reshape(absw.shape)
    return mask.astype(np.float32)


def generate_complete_pattern_set(pattern_shape: Sequence[int],
                                  pattern_nnz: int) -> np.ndarray:
    """All C(n, nnz) patterns (ref: sparsity/sparsity.py:937-953).
    Guard against explosion — only sensible for small shapes."""
    total = int(np.prod(pattern_shape))
    n = _comb_num(total, pattern_nnz)
    if n > 200000:
        raise ValueError("complete pattern set too large: C(%d,%d)=%d"
                         % (total, pattern_nnz, n))
    out = np.zeros((n, total), dtype=np.float32)
    for i, idx in enumerate(combinations(range(total), pattern_nnz)):
        out[i, list(idx)] = 1
    return out.reshape((n,) + tuple(pattern_shape))


def find_top_k_by_similarity(weight: np.ndarray, candidates: np.ndarray,
                             pattern_num: int,
                             stride: Sequence[int] | None = None) -> np.ndarray:
    """Top-k candidate patterns by total retained |w| across blocks
    (ref: sparsity/sparsity.py:956-997)."""
    absw = np.abs(np.asarray(weight, dtype=np.float64))
    P, ph, pw = candidates.shape
    if stride is None:
        stride = (ph, pw)
    nx = (absw.shape[0] - ph) // stride[0] + 1
    ny = (absw.shape[1] - pw) // stride[1] + 1
    blocks = np.zeros((nx * ny, ph * pw))
    k = 0
    for i in range(nx):
        for j in range(ny):
            blocks[k] = absw[i * stride[0]:i * stride[0] + ph,
                             j * stride[1]:j * stride[1] + pw].ravel()
            k += 1
    scores = blocks @ candidates.reshape(P, ph * pw).T     # (B, P)
    # per-block argmax votes weighted by score mass
    totals = np.zeros(P)
    best = np.argmax(scores, axis=1)
    for b, p in enumerate(best):
        totals[p] += scores[b, p]
    top = np.argsort(totals, kind="stable")[-pattern_num:][::-1]
    return candidates[top]


def cal_sparsity(mask: np.ndarray) -> float:
    """Fraction of zeros (ref: sparsity/sparsity.py:579-604)."""
    return 1.0 - float(np.count_nonzero(mask)) / mask.size


# ---------------------------------------------------------------------------
# similarity-driven pattern mining + storage-curve analysis
# (ref: sparsity/sparsity.py:607-753 find_pattern_by_similarity,
#  :754-798 pattern_curve_analyse)
# ---------------------------------------------------------------------------

def find_pattern_by_similarity(weight: np.ndarray, pattern_num: int,
                               pattern_shape: Sequence[int], sparsity: float,
                               coo_threshold: int):
    """Greedy pattern mining: binarize by global sparsity threshold,
    walk candidate blocks in ascending-nnz order, and let each live
    candidate "absorb" every block whose nnz outside the candidate is
    <= coo_threshold (those leftovers go to COO storage).

    Returns (patterns, match_num, coo_nnz, nnz, inner_nnz) with patterns
    (P, ph, pw) sorted by match count descending — same stats the
    reference's dict machinery produces (ref: sparsity/sparsity.py:
    607-753), vectorized over blocks instead of the triple python loop.
    """
    w = np.asarray(weight, dtype=np.float32)
    ph, pw = pattern_shape
    w_num = int(np.count_nonzero(w))
    zero_num = int(w_num * sparsity)
    flat = np.sort(np.abs(w).ravel())[::-1]
    zero_threshold = abs(flat[w_num - zero_num - 1])
    mask = (np.abs(w) > zero_threshold).astype(np.float32)

    nx = (w.shape[0] - ph) // ph + 1
    ny = (w.shape[1] - pw) // pw + 1
    blocks = mask[:nx * ph, :ny * pw].reshape(nx, ph, ny, pw) \
        .transpose(0, 2, 1, 3).reshape(nx * ny, ph * pw)
    sums = blocks.sum(axis=1)
    order = sorted(range(len(blocks)), key=lambda k: sums[k])  # stable asc

    removed = np.zeros(len(blocks), dtype=bool)
    stats = {}   # pattern bytes -> [inner_nnz, match_num, coo_nnz, nnz]
    for b in order:
        p = blocks[b]
        if p.sum() < coo_threshold / 2:
            continue
        if removed[b]:
            continue
        outside = blocks @ (1.0 - p)            # nnz not covered by p
        newly = (~removed) & (outside <= coo_threshold)
        stats[p.tobytes()] = [float(p.sum()), float(newly.sum()),
                              float(outside[newly].sum()),
                              float(blocks[newly].sum())]
        removed |= newly
    assert removed.all(), "pattern mining left unabsorbed blocks"

    # order by (match_num, pattern bytes) descending — the reference's
    # sorted(zip(values, keys), reverse=True)
    items = sorted(((v[1], k) for k, v in stats.items()), reverse=True)
    P = min(pattern_num, len(items))
    patterns = np.zeros((len(items), ph, pw), dtype=np.float32)
    match_num = np.zeros(len(items))
    coo_nnz = np.zeros(len(items))
    nnz = np.zeros(len(items))
    inner_nnz = np.zeros(len(items))
    for i, (_, key) in enumerate(items):
        patterns[i] = np.frombuffer(key, dtype=np.float32).reshape(ph, pw)
        inner_nnz[i], match_num[i], coo_nnz[i], nnz[i] = stats[key]
    return patterns[:max(P, len(items))], match_num, coo_nnz, nnz, inner_nnz


def pattern_curve_analyse(raw_w_shape: Sequence[int],
                          pattern_shape: Sequence[int],
                          patterns: np.ndarray, pattern_match_num,
                          pattern_coo_nnz, pattern_nnz, pattern_inner_nnz):
    """Memory/compute cost curves over pattern-set sizes
    (ref: sparsity/sparsity.py:754-798): for each candidate set size,
    bits = pattern dictionaries + per-block pattern indices + COO indices
    for leftovers and unmatched blocks; cal = kept multiplies."""
    import math
    pattern_match_num = np.asarray(pattern_match_num, dtype=np.float64)
    pattern_coo_nnz = np.asarray(pattern_coo_nnz, dtype=np.float64)
    pattern_nnz = np.asarray(pattern_nnz, dtype=np.float64)
    pattern_inner_nnz = np.asarray(pattern_inner_nnz, dtype=np.float64)
    idx_bits = math.log(pattern_shape[0], 2) + math.log(pattern_shape[1], 2)
    memory_dict, cal_dict, coo_dict = {}, {}, {}
    for pattern_num in [1, 2, 4, 8, 12, 16, 32, 64, 128, 256, 512]:
        if pattern_num >= len(patterns) * 2:
            break
        pattern_bit_num = pattern_inner_nnz[:pattern_num].sum() * idx_bits
        pattern_bit = 1 if pattern_num == 1 else math.log(pattern_num, 2)
        pattern_idx_bit_num = pattern_bit * pattern_match_num[:pattern_num].sum()
        coo_idx_num = (pattern_coo_nnz[:pattern_num].sum()
                       + pattern_nnz[pattern_num:].sum())
        coo_idx_bit_num = idx_bits * coo_idx_num
        memory_dict[pattern_num] = (pattern_idx_bit_num + coo_idx_bit_num
                                    + pattern_bit_num)
        cal_dict[pattern_num] = ((pattern_match_num[:pattern_num]
                                  * pattern_inner_nnz[:pattern_num]).sum()
                                 + coo_idx_num)
        coo_dict[pattern_num] = coo_idx_num
    return memory_dict, cal_dict, coo_dict
