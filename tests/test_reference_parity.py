"""Cross-checks against the reference implementation itself.

These tests import the *reference's* numpy mask generator (via its
``for_test=True`` escape hatch, ref: hcgs.py:64-67) and verify our
HCGS masks have identical structural statistics. Skipped when the
reference checkout is not mounted.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


@pytest.fixture()
def ref_hcgs(tmp_path, monkeypatch):
    sys.path.insert(0, REF)
    try:
        import importlib
        import cgs_base  # noqa: F401  (hcgs imports it)
        import hcgs as ref_hcgs_mod
        importlib.reload(ref_hcgs_mod)
        yield ref_hcgs_mod, str(tmp_path)
    finally:
        sys.path.remove(REF)


def _block_rowcounts(mask, bs):
    Nb, Kb = mask.shape[0] // bs, mask.shape[1] // bs
    occ = mask.reshape(Nb, bs, Kb, bs).transpose(0, 2, 1, 3).any(axis=(2, 3))
    return occ.sum(axis=1)


def test_hcgs_structure_matches_reference(ref_hcgs, tmp_path):
    """Same per-block-row kept counts and densities as the reference's
    conn_mat for the flagship (128,4)/(25,62.5) configuration."""
    ref_mod, mat_dir = ref_hcgs
    from pytorch_kaldi_cgs_tpu.sparsity import hcgs_mask, mask_density

    np.random.seed(0)
    ref_mask = ref_mod.conn_mat(512, 512, [128, 4], [25, 62.5],
                                mat_num="t", dir=mat_dir, for_test=True)
    ours = hcgs_mask(512, 512, [128, 4], [25, 62.5], seed=0)

    assert ref_mask.shape == ours.shape
    # level-1: identical kept-block counts per block row
    np.testing.assert_array_equal(_block_rowcounts(ref_mask, 128),
                                  _block_rowcounts(ours, 128))
    # level-2: identical kept sub-block counts inside surviving blocks
    ref_l2 = _block_rowcounts(ref_mask, 4)
    our_l2 = _block_rowcounts(ours, 4)
    assert sorted(ref_l2.tolist()) == sorted(our_l2.tolist())
    # overall density identical
    assert mask_density(np.asarray(ref_mask)) == pytest.approx(
        mask_density(ours), abs=1e-9)


def test_quantizer_matches_reference_rule():
    """Our ceil quantizer equals the reference's Quantize(balanced=False)
    (quantized_modules.py:77-97) computed with torch."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from quantized_modules import Quantize as RefQuantize
    finally:
        sys.path.remove(REF)
    import jax.numpy as jnp
    from pytorch_kaldi_cgs_tpu.sparsity import quantize_weight

    rng = np.random.RandomState(0)
    w = rng.uniform(-1.5, 1.5, 256).astype(np.float32)
    for bits in (3, 6, 8):
        ref = RefQuantize(torch.tensor(w.copy()), numBits=bits,
                          balanced=False).numpy()
        got = np.array(quantize_weight(jnp.asarray(w), bits))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_context_window_matches_reference():
    sys.path.insert(0, REF)
    try:
        import importlib
        import data_io as ref_data_io
        importlib.reload(ref_data_io)
    finally:
        sys.path.remove(REF)
    from pytorch_kaldi_cgs_tpu.data.features import context_window

    rng = np.random.RandomState(1)
    x = rng.randn(30, 4).astype(np.float64)
    ref = ref_data_io.context_window(x, 3, 3)
    got = context_window(x, 3, 3)
    np.testing.assert_allclose(got, ref)
