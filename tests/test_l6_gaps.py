"""Parity tests for the round-2 L6 gap closures: binary (1-bit) layers
and similarity-driven pattern mining, each checked against the
reference's own torch implementations executed on CPU."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_qm():
    sys.path.insert(0, REF)
    import quantized_modules as qm
    yield qm
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def ref_sparsity():
    sys.path.insert(0, REF)
    from sparsity import sparsity as sp
    yield sp
    sys.path.remove(REF)


def test_binarize_matches_reference(ref_qm):
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import binarize
    rng = np.random.RandomState(0)
    w = rng.randn(32, 16).astype(np.float32)
    w[0, :4] = 0.0
    ours = np.asarray(binarize(w))
    ref = ref_qm.Binarize(torch.from_numpy(w.copy()), quant_mode="det").numpy()
    np.testing.assert_array_equal(ours, ref)


def test_binarize_is_one_bit_ceil_quant():
    """param_quant=1 through the ceil quantizer IS sign-binarization on
    clipped weights — the claimed-missing 1-bit path was never a
    different function."""
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import (binarize,
                                                         quantize_weight)
    rng = np.random.RandomState(1)
    w = np.clip(rng.randn(64, 64) * 0.3, -1, 1).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(quantize_weight(w, 1)),
                                  np.asarray(binarize(w)))


def test_binary_linear_matches_reference(ref_qm):
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import binary_linear
    rng = np.random.RandomState(2)
    x = rng.randn(8, 16).astype(np.float32)
    lin = ref_qm.BinarizeLinear(16, 12, bias=True)
    w = np.asarray(lin.weight.detach().numpy())
    b = np.asarray(lin.bias.detach().numpy())
    with torch.no_grad():
        y_ref = lin(torch.from_numpy(x.copy())).numpy()
    y_our = np.asarray(binary_linear(x, w, b))
    np.testing.assert_allclose(y_our, y_ref, atol=1e-5)


def test_binary_conv2d_matches_reference(ref_qm):
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import binary_conv2d
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 10, 10).astype(np.float32)   # 4 chans -> input binarized
    conv = ref_qm.BinarizeConv2d(4, 6, 3, bias=True)
    w = np.asarray(conv.weight.detach().numpy())
    b = np.asarray(conv.bias.detach().numpy())
    with torch.no_grad():
        y_ref = conv(torch.from_numpy(x.copy())).numpy()
    y_our = np.asarray(binary_conv2d(x, w, b))
    np.testing.assert_allclose(y_our, y_ref, atol=1e-4)


def test_ste_binarize_gradient_passthrough():
    import jax
    import jax.numpy as jnp
    from pytorch_kaldi_cgs_tpu.sparsity.quantize import ste_binarize
    g = jax.grad(lambda w: jnp.sum(ste_binarize(w) * 3.0))(jnp.ones((4,)) * 0.2)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_find_pattern_by_similarity_matches_reference(ref_sparsity,
                                                      monkeypatch):
    """Same pattern set + same per-pattern stats as the reference's
    triple-loop implementation (ref: sparsity/sparsity.py:607-753),
    with its hard .cuda() neutralized for CPU execution."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from pytorch_kaldi_cgs_tpu.sparsity.pattern import (
        find_pattern_by_similarity)
    rng = np.random.RandomState(4)
    w = rng.randn(16, 16).astype(np.float32)
    args = (8, [4, 4], 0.5, 4)

    pats_ref, match_ref, coo_ref, nnz_ref, inner_ref = \
        ref_sparsity.find_pattern_by_similarity(
            torch.from_numpy(w.copy()), *args)
    pats_our, match_our, coo_our, nnz_our, inner_our = \
        find_pattern_by_similarity(w, *args)

    # reference returns (match_num, key_bytes) tuples; rebuild its masks
    ref_masks = [np.frombuffer(k, dtype=np.float32).reshape(4, 4)
                 for _, k in pats_ref]
    assert len(ref_masks) == len(pats_our)
    for i in range(len(ref_masks)):
        np.testing.assert_array_equal(pats_our[i], ref_masks[i])
    np.testing.assert_allclose(match_our[:len(match_ref)], match_ref)
    np.testing.assert_allclose(coo_our[:len(coo_ref)], coo_ref)
    np.testing.assert_allclose(nnz_our[:len(nnz_ref)], nnz_ref)
    np.testing.assert_allclose(inner_our[:len(inner_ref)], inner_ref)


def test_pattern_curve_analyse_matches_reference(ref_sparsity, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from pytorch_kaldi_cgs_tpu.sparsity.pattern import (
        find_pattern_by_similarity, pattern_curve_analyse)
    rng = np.random.RandomState(5)
    w = rng.randn(32, 32).astype(np.float32)
    args = (8, [4, 4], 0.6, 4)
    pats, match, coo, nnz, inner = find_pattern_by_similarity(w, *args)
    mem_our, cal_our, coo_our = pattern_curve_analyse(
        w.shape, [4, 4], pats, match, coo, nnz, inner)
    mem_ref, cal_ref, coo_ref = ref_sparsity.pattern_curve_analyse(
        w.shape, [4, 4], pats, match, coo, nnz, inner)
    assert set(mem_our) == set(mem_ref)
    for k in mem_our:
        np.testing.assert_allclose(mem_our[k], mem_ref[k])
        np.testing.assert_allclose(cal_our[k], cal_ref[k])
        np.testing.assert_allclose(coo_our[k], coo_ref[k])
