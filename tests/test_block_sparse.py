"""Block-sparse matmul: layout packing, XLA reference, Pallas kernels
(interpret mode on CPU), gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.ops import block_sparse as B
from pytorch_kaldi_cgs_tpu.sparsity import hcgs_mask


BS = 8  # small block for CPU tests; TPU path uses 128


@pytest.fixture(scope="module")
def layout_and_w():
    mask = hcgs_mask(32, 48, [BS], [50], seed=0)     # keep 3 of 6 per row
    layout = B.pack_layout(mask, BS)
    rng = np.random.RandomState(0)
    w = rng.randn(32, 48).astype(np.float32) * mask
    wp = B.pack_blocks(w, layout)
    return mask, layout, w, wp


def test_pack_unpack_roundtrip(layout_and_w):
    mask, layout, w, wp = layout_and_w
    assert layout.R == 3 and layout.nnz == 4 * 3
    np.testing.assert_allclose(B.unpack_blocks(wp, layout), w)


def test_pack_rejects_unequal_rows():
    m = np.zeros((16, 16), np.float32)
    m[:8, :8] = 1          # row 0 has 1 block, row 1 has 0
    with pytest.raises(ValueError):
        B.pack_layout(m, 8)


def test_xla_reference_matches_dense(layout_and_w):
    mask, layout, w, wp = layout_and_w
    x = np.random.RandomState(1).randn(16, 48).astype(np.float32)
    y_ref = x @ w.T
    y = B.block_sparse_matmul_xla(jnp.asarray(x), jnp.asarray(wp), layout)
    np.testing.assert_allclose(np.array(y), y_ref, rtol=1e-4, atol=1e-4)


def test_pallas_forward_interpret(layout_and_w):
    mask, layout, w, wp = layout_and_w
    x = np.random.RandomState(2).randn(16, 48).astype(np.float32)
    y = B.block_sparse_matmul(jnp.asarray(x), jnp.asarray(wp), layout,
                              tile_m=8, interpret=True)
    np.testing.assert_allclose(np.array(y), x @ w.T, rtol=1e-4, atol=1e-4)


def test_pallas_grads_interpret(layout_and_w):
    mask, layout, w, wp = layout_and_w
    x = jnp.asarray(np.random.RandomState(3).randn(16, 48).astype(np.float32))
    wp = jnp.asarray(wp)
    g_out = np.random.RandomState(4).randn(16, 32).astype(np.float32)

    def f(x, wp):
        y = B.block_sparse_matmul(x, wp, layout, tile_m=8, interpret=True)
        return jnp.sum(y * jnp.asarray(g_out))

    dx, dwp = jax.grad(f, argnums=(0, 1))(x, wp)
    # dense reference
    w_d = jnp.asarray(w)

    def f_ref(x, w_d):
        return jnp.sum((x @ w_d.T) * jnp.asarray(g_out))

    dx_ref, dw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w_d)
    np.testing.assert_allclose(np.array(dx), np.array(dx_ref), rtol=1e-4,
                               atol=1e-4)
    dw_unpacked = B.unpack_blocks(np.array(dwp), layout)
    # gradient only lives on kept blocks
    np.testing.assert_allclose(dw_unpacked, np.array(dw_ref) * mask,
                               rtol=1e-4, atol=1e-4)


def test_two_level_submask(layout_and_w):
    """Level-2 fine mask multiplied into packed blocks before the kernel."""
    mask1, layout, w, wp = layout_and_w
    fine = hcgs_mask(32, 48, [BS, 2], [50, 50], seed=0)  # same level-1 seed
    sub = B.pack_submasks(fine, layout)
    x = np.random.RandomState(5).randn(8, 48).astype(np.float32)
    wp_masked = jnp.asarray(wp) * jnp.asarray(sub)
    y = B.block_sparse_matmul(jnp.asarray(x), wp_masked, layout,
                              tile_m=8, interpret=True)
    w_masked = B.unpack_blocks(np.array(wp_masked), layout)
    np.testing.assert_allclose(np.array(y), x @ w_masked.T, rtol=1e-4,
                               atol=1e-4)


def test_density_accounting(layout_and_w):
    _, layout, _, _ = layout_and_w
    assert layout.density() == pytest.approx(0.5)


def test_multi_gate_forward_and_grads(layout_and_w):
    """Fused 4-gate variant vs per-gate dense reference."""
    mask, layout, w, wp = layout_and_w
    G = 4
    rng = np.random.RandomState(9)
    ws = [rng.randn(32, 48).astype(np.float32) * mask for _ in range(G)]
    w_stacked = jnp.asarray(B.pack_blocks_multi(ws, layout))
    x = jnp.asarray(rng.randn(16, 48).astype(np.float32))
    ys = B.block_sparse_matmul_multi(x, w_stacked, layout, G, tile_m=8,
                                     interpret=True)
    assert ys.shape == (G, 16, 32)
    for g in range(G):
        np.testing.assert_allclose(np.array(ys[g]), np.array(x) @ ws[g].T,
                                   rtol=1e-4, atol=1e-4)
    # grads
    g_out = rng.randn(G, 16, 32).astype(np.float32)

    def f(x, w_stacked):
        ys = B.block_sparse_matmul_multi(x, w_stacked, layout, G, tile_m=8,
                                         interpret=True)
        return jnp.sum(ys * jnp.asarray(g_out))

    dx, dws = jax.grad(f, argnums=(0, 1))(x, w_stacked)
    wd = jnp.asarray(np.stack(ws))

    def f_ref(x, wd):
        ys = jnp.einsum("mk,gnk->gmn", x, wd)
        return jnp.sum(ys * jnp.asarray(g_out))

    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, wd)
    np.testing.assert_allclose(np.array(dx), np.array(dx_r), rtol=1e-4,
                               atol=1e-4)
    for g in range(G):
        got = B.unpack_blocks(np.array(dws)[:, g * BS:(g + 1) * BS, :], layout)
        np.testing.assert_allclose(got, np.array(dw_r)[g] * mask,
                                   rtol=1e-4, atol=1e-4)


def test_gather_blocks_multi_matches_pack(layout_and_w):
    mask, layout, w, wp = layout_and_w
    ws = [w, w * 2]
    packed = B.pack_blocks_multi(ws, layout)
    gathered = B.gather_blocks_multi([jnp.asarray(v) for v in ws], layout)
    np.testing.assert_allclose(np.array(gathered), packed)


def test_v3_forward_and_grads(layout_and_w):
    """Deep-contraction v3 kernels vs dense reference (interpret mode)."""
    mask, layout, w, wp = layout_and_w
    G = 4
    rng = np.random.RandomState(13)
    ws = [rng.randn(32, 48).astype(np.float32) * mask for _ in range(G)]
    ws_j = [jnp.asarray(v) for v in ws]
    x = jnp.asarray(rng.randn(16, 48).astype(np.float32))
    g_out = rng.randn(G, 16, 32).astype(np.float32)

    def f(x, ws_list):
        w3, w3csc = B.gather_v3(ws_list, layout)
        ys = B.block_sparse_matmul_v3(x, w3, w3csc, layout, G, tile_m=8,
                                      interpret=True)
        return ys

    ys = f(x, ws_j)
    for g in range(G):
        np.testing.assert_allclose(np.array(ys[g]), np.array(x) @ ws[g].T,
                                   rtol=1e-4, atol=1e-4)

    def loss(x, ws_list):
        return jnp.sum(f(x, ws_list) * jnp.asarray(g_out))

    dx, dws = jax.grad(loss, argnums=(0, 1))(x, ws_j)
    wd = jnp.asarray(np.stack(ws))

    def loss_ref(x, wd):
        return jnp.sum(jnp.einsum("mk,gnk->gmn", x, wd) * jnp.asarray(g_out))

    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wd)
    np.testing.assert_allclose(np.array(dx), np.array(dx_r), rtol=1e-4,
                               atol=1e-4)
    for g in range(G):
        np.testing.assert_allclose(np.array(dws[g]),
                                   np.array(dw_r)[g] * mask,
                                   rtol=1e-4, atol=1e-4)


# --- K-padded layouts (non-MXU-aligned input widths) -----------------------

def _equal_count_mask(N, K, bs, keep_per_row, seed=0):
    """Synthetic level-1 mask with exactly keep_per_row kept blocks per
    block-row over a ceil(K/bs) column grid, cropped to K columns."""
    rng = np.random.RandomState(seed)
    Nb, Kb = N // bs, -(-K // bs)
    m = np.zeros((N, Kb * bs), np.float32)
    for j in range(Nb):
        cols = rng.choice(Kb, keep_per_row, replace=False)
        for c in cols:
            m[j * bs:(j + 1) * bs, c * bs:(c + 1) * bs] = 1
    return m[:, :K]


def test_pad_k_layout_matmul_matches_dense():
    """pack_layout(pad_k=True) on a non-multiple K: the v3 kernel over
    column-padded x equals the dense masked matmul on true-width x
    (VERDICT r3 weak item 2: the (512, 143) x-proj fallback)."""
    N, K, bs = 32, 42, BS          # 42 = 5*8 + 2 -> pads to 48
    mask = _equal_count_mask(N, K, bs, 3, seed=5)
    layout = B.pack_layout(mask, bs, pad_k=True)
    assert layout.K == 48 and layout.k_true == 42
    rng = np.random.RandomState(6)
    w = (rng.randn(N, K) * mask).astype(np.float32)
    wp = B.pack_blocks(w, layout)          # pads w's tail block itself
    x = rng.randn(16, K).astype(np.float32)
    xp = np.concatenate([x, np.zeros((16, layout.K - K), np.float32)], 1)
    y = B.block_sparse_matmul(jnp.asarray(xp), jnp.asarray(wp), layout,
                              tile_m=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y), x @ w.T, rtol=1e-4,
                               atol=1e-4)
    # round-trip crops back to the true width
    np.testing.assert_allclose(B.unpack_blocks(wp, layout), w)


def test_narrow_input_no_alignment_warning(caplog):
    """The flagship's (512, 143) layer-0 x-proj must NOT warn: narrow
    inputs are a deliberate dense-is-optimal decision, not a fallback
    (BENCH_r03 tail item)."""
    import logging
    from pytorch_kaldi_cgs_tpu.models import LSTM
    opts = {
        "to_do": "train", "arch_name": "l", "out_folder": "/tmp",
        "lstm_lay": "512", "lstm_drop": "0.0",
        "lstm_use_batchnorm": "False", "lstm_use_laynorm": "False",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_act": "tanh", "lstm_orthinit": "False", "lstm_bidir": "False",
        "lstm_hcgs": "True", "hcgsx_block": "128,4",
        "hcgsx_sparse": "25,62.5", "hcgsh_block": "128,4",
        "hcgsh_sparse": "25,62.5", "lstm_quant": "False",
        "param_quant": "8", "lstm_quant_inp": "False", "inp_quant": "16",
        "lstm_prune": "False", "lstm_prune_perc": "50",
        "skip_regularization": "True",
    }
    lstm = LSTM(opts, 143)
    variables = lstm.init(0)
    with caplog.at_level(logging.WARNING):
        lstm.prepare_block_sparse(variables)
    assert not [r for r in caplog.records
                if "not MXU-alignable" in r.message]


def test_v3_fused_submask_quant_matches_unfused():
    """sub3/quant_bits fused into the v3 kernels == the XLA-side
    ste_quantize_weight + submask-multiply path: forward, dx and dw
    (STE: dw passes the quantizer, multiplies the mask)."""
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import ste_quantize_weight
    mask = hcgs_mask(32, 64, [BS], [50], seed=7)
    layout = B.pack_layout(mask, BS)
    rng = np.random.RandomState(8)
    sub = (rng.rand(32, 64) > 0.5).astype(np.float32) * mask
    w = (rng.randn(32, 64) * 0.3 * mask).astype(np.float32)
    w3 = jnp.asarray(B.pack_w3(w, layout))
    sub3 = jnp.asarray(B.pack_w3(sub, layout))
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    qb = 8

    def ref(x, w3):
        wm = ste_quantize_weight(w3, qb) * sub3
        return B.block_sparse_matmul_v3(x, wm, None, layout, 1,
                                        tile_m=8, interpret=True)

    def fused(x, w3):
        return B.block_sparse_matmul_v3(x, w3, None, layout, 1,
                                        tile_m=8, interpret=True,
                                        sub3=sub3, quant_bits=qb)

    y_ref = ref(x, w3)
    y = fused(x, w3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    tgt = jnp.asarray(rng.randn(*y_ref.shape).astype(np.float32))
    gr = jax.grad(lambda x, w: jnp.sum((ref(x, w) - tgt) ** 2),
                  argnums=(0, 1))(x, w3)
    gf = jax.grad(lambda x, w: jnp.sum((fused(x, w) - tgt) ** 2),
                  argnums=(0, 1))(x, w3)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)
