"""Tests for HCGS/guided/pattern mask generators, pruning, quantization."""
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu import sparsity as S


# ---------------------------------------------------------------------------
# HCGS
# ---------------------------------------------------------------------------

def test_hcgs_density_two_level():
    # 25% drop of 32-blocks, 62.5% drop of 4-blocks -> 0.75*0.375 density
    m = S.hcgs_mask(256, 256, [32, 4], [25, 62.5], seed=0)
    assert m.shape == (256, 256)
    assert S.mask_density(m) == pytest.approx(0.75 * 0.375, abs=1e-6)


def test_hcgs_block_structure():
    m = S.hcgs_mask(128, 128, [32], [50], seed=1)
    # every 32x32 block is all-ones or all-zeros
    blocks = m.reshape(4, 32, 4, 32).transpose(0, 2, 1, 3).reshape(16, -1)
    sums = blocks.sum(axis=1)
    assert set(sums.tolist()) <= {0.0, 32.0 * 32.0}
    # per block-row exactly 2 of 4 blocks kept
    per_row = (sums.reshape(4, 4) > 0).sum(axis=1)
    np.testing.assert_array_equal(per_row, [2, 2, 2, 2])


def test_hcgs_deterministic_seed():
    a = S.hcgs_mask(64, 64, [8], [50], seed=42)
    b = S.hcgs_mask(64, 64, [8], [50], seed=42)
    c = S.hcgs_mask(64, 64, [8], [50], seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_hcgs_ragged_edges():
    m = S.hcgs_mask(100, 70, [32], [25], seed=0)
    assert m.shape == (100, 70)
    # density approximately 75%, not exact due to ragged edge
    assert 0.5 < S.mask_density(m) < 1.0


def test_guided_hcgs_keeps_heavy_blocks():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 64) * 0.01
    # plant heavy blocks at (0, 3) and (1, 0) in an 8x8 grid of 8-blocks
    w[0:8, 24:32] += 10.0
    w[8:16, 0:8] += 10.0
    m = S.guided_hcgs_mask(w, [8], [87.5], seed=0)  # keep 1 of 8 per row
    assert m[0:8, 24:32].all()
    assert m[8:16, 0:8].all()
    assert S.mask_density(m) == pytest.approx(1 / 8, abs=1e-6)


def test_block_occupancy():
    m = S.hcgs_mask(64, 64, [16, 4], [50, 50], seed=0)
    occ = S.hcgs.block_occupancy(m, 16)
    assert occ.shape == (4, 4)
    assert occ.sum() == 8  # 50% of 16 level-1 blocks


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------

def test_magnitude_mask():
    w = np.arange(1, 101, dtype=np.float32).reshape(10, 10)
    m = S.magnitude_mask(w, 50)
    assert m.sum() == 50  # top half survives
    assert m.ravel()[-1] == 1 and m.ravel()[0] == 0


def test_global_masks_share_threshold():
    w1 = np.full((4, 4), 1.0, np.float32)
    w2 = np.full((4, 4), 10.0, np.float32)
    m1, m2 = S.global_magnitude_masks([w1, w2], 50)
    assert m1.sum() == 0 and m2.sum() == 16  # threshold between the two


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

def test_quantize_weight_ceil_semantics():
    import jax.numpy as jnp
    w = jnp.array([0.1, -0.3, 0.9, 1.5, -2.0])
    q = np.array(S.quantize_weight(w, 3))  # scale 4, clip to [-1,1]
    # ceil(0.1*4)/4 = 0.25 ; ceil(0.3*4)/4=0.5 ; ceil(0.9*4)/4=1.0 ; clipped 1.5->1
    np.testing.assert_allclose(q, [0.25, -0.5, 1.0, 1.0, -1.0])


def test_quantize_levels():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    w = jnp.array(rng.uniform(-1, 1, 1000).astype(np.float32))
    q = np.array(S.quantize_weight(w, 4))
    # at most 2*2^(b-1)+1 distinct levels
    assert len(np.unique(q)) <= 2 ** 4 + 1


def test_quantize_input_scale_invariance():
    import jax.numpy as jnp
    x = jnp.array([0.0, 0.5, -1.0, 2.0])
    q = np.array(S.quantize_input(x, 8))
    assert q[0] == 0.0
    assert abs(q[3]) == pytest.approx(2.0, abs=0.05)  # max maps near itself
    z = np.array(S.quantize_input(jnp.zeros(4), 8))
    np.testing.assert_allclose(z, 0.0)


def test_ste_gradient_passthrough():
    import jax
    import jax.numpy as jnp
    g = jax.grad(lambda w: jnp.sum(S.ste_quantize_weight(w, 4) * 2.0))(
        jnp.array([0.3, -0.7]))
    np.testing.assert_allclose(np.array(g), [2.0, 2.0])


# ---------------------------------------------------------------------------
# patterns
# ---------------------------------------------------------------------------

def test_random_patterns_shape():
    rng = np.random.RandomState(0)
    p = S.random_patterns((8, 8), 4, 16, rng)
    assert p.shape == (16, 8, 8)
    assert (p.reshape(16, -1).sum(axis=1) <= 4).all()  # replacement may collide


def test_coo_mask_exact_nnz():
    rng = np.random.RandomState(1)
    w = rng.randn(16, 16).astype(np.float32)
    m = S.coo_mask(w, (8, 8), 4)
    blocks = m.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, -1)
    np.testing.assert_array_equal(blocks.sum(axis=1), [4, 4, 4, 4])
    # kept entries are the top-4 by |w| per block
    b0 = np.abs(w[:8, :8]).ravel()
    kept = np.sort(b0[m[:8, :8].ravel() > 0])
    np.testing.assert_array_equal(kept, np.sort(b0)[-4:])


def test_pattern_mask_tiles_from_set():
    rng = np.random.RandomState(2)
    pats = S.random_patterns((4, 4), 2, 4, rng)
    m = S.pattern_mask((8, 8), pats, rng)
    for i in range(2):
        for j in range(2):
            block = m[i * 4:(i + 1) * 4, j * 4:(j + 1) * 4]
            assert any(np.array_equal(block, p) for p in pats)


def test_kmeans_pattern_search_and_apply():
    rng = np.random.RandomState(3)
    # weights with two clear structures: diagonal-heavy and column-heavy 4x4s
    w = np.zeros((32, 32), dtype=np.float32)
    for i in range(0, 32, 4):
        for j in range(0, 32, 4):
            if (i // 4 + j // 4) % 2 == 0:
                w[i:i + 4, j:j + 4] = np.eye(4) * (1 + rng.rand())
            else:
                w[i:i + 4, j:j + 4][:, 0] = 1 + rng.rand()
    pats = S.find_top_k_by_kmeans(w, 2, (4, 4), 4, seed=0)
    assert pats.shape == (2, 4, 4)
    assert (pats.reshape(2, -1).sum(axis=1) == 4).all()
    m = S.apply_patterns(w, pats)
    assert m.shape == w.shape
    # the mask keeps nearly all the weight mass
    assert (np.abs(w) * m).sum() / np.abs(w).sum() > 0.95


def test_complete_pattern_set():
    p = S.generate_complete_pattern_set((2, 2), 2)
    assert p.shape == (6, 2, 2)
    assert (p.reshape(6, -1).sum(axis=1) == 2).all()
    with pytest.raises(ValueError):
        S.generate_complete_pattern_set((8, 8), 32)


def test_similarity_topk():
    cands = S.generate_complete_pattern_set((2, 2), 2)
    w = np.zeros((4, 4), np.float32)
    w[0::2, 0::2] = 5.0  # mass on the (0,0)/(0,2)... positions
    top = S.find_top_k_by_similarity(w, cands, 1)
    assert top.shape == (1, 2, 2)
    assert top[0, 0, 0] == 1  # best pattern covers position (0,0)


def test_cal_sparsity_and_storage():
    m = np.zeros((8, 8))
    m[0] = 1
    assert S.cal_sparsity(m) == pytest.approx(7 / 8)
    summ = S.storage.compression_summary((128, 16, 8), 0.9)
    assert summ["csr"] > 1.0 and summ["bitmap"] > 1.0
    b = S.storage.hcgs_bits((1024, 1024), [128, 4], [25, 62.5])
    dense = S.storage.dense_bits((1024, 1024))
    assert dense / b > 3.0  # ~3.55x payload compression + small index cost
