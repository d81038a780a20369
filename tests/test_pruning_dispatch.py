"""Unified pruning() dispatcher (sparsity/pruning.py) — VERDICT round-3
item 8 / SURVEY table row 52.

Parity protocol: run the REFERENCE's own ``sparsity.pruning()``
(ref: sparsity/sparsity.py:33-270) on torch modules with a stubbed
``config_train`` module, and assert our dispatcher produces the same
pruned weights from the same inputs — for thre/sparse/coo modes. The
pattern/ptcoo/find_retrain modes are pinned against our own mask
primitives (which have their own reference-parity tests in
tests/test_l6_gaps.py).
"""
import os
import sys
import types

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.sparsity.pruning import (PruningConfig,
                                                    model_sparsity,
                                                    prune_params, pruning)

REF = "/root/reference"


def _ref_pruning(cfg_attrs):
    """Import the reference's sparsity.pruning with a stub config_train
    carrying ``cfg_attrs`` (the module-level constants it reads)."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not mounted")
    stub = types.ModuleType("config_train")
    for k, v in cfg_attrs.items():
        setattr(stub, k, v)
    saved_ct = sys.modules.get("config_train")
    saved_sp = sys.modules.get("sparsity")
    sys.modules["config_train"] = stub
    sys.modules.pop("sparsity", None)
    sys.path.insert(0, os.path.join(REF, "sparsity"))
    try:
        import importlib
        import sparsity as ref_sp
        importlib.reload(ref_sp)
        return ref_sp, torch
    finally:
        sys.path.remove(os.path.join(REF, "sparsity"))
        if saved_ct is not None:
            sys.modules["config_train"] = saved_ct
        else:
            sys.modules.pop("config_train", None)
        if saved_sp is not None:
            sys.modules["sparsity"] = saved_sp


class _TorchNet:
    def __new__(cls, w):
        import torch
        net = torch.nn.Module()
        net.fc = torch.nn.Linear(w.shape[1], w.shape[0], bias=True)
        with torch.no_grad():
            net.fc.weight.copy_(torch.from_numpy(w))
        return net


def test_thre_pruning_matches_reference():
    rng = np.random.RandomState(0)
    w = rng.randn(12, 10).astype(np.float32)
    ref_sp, torch = _ref_pruning({"pruning_thre": 0.7})
    net = _TorchNet(w)
    bias_before = net.fc.bias.detach().numpy().copy()
    ref_sp.pruning(net, "thre_pruning")
    ref_w = net.fc.weight.detach().numpy()

    ours, masks = prune_params({"w0": w.copy(), "b0": bias_before.copy()},
                               PruningConfig(sparse_mode="thre_pruning",
                                             pruning_thre=0.7))
    np.testing.assert_allclose(ours["w0"], ref_w, atol=0)
    # biases untouched on both sides (ref skips name endswith bias)
    np.testing.assert_allclose(ours["b0"], bias_before)
    np.testing.assert_allclose(net.fc.bias.detach().numpy(), bias_before)
    assert "pruning_w0" in masks and "pruning_b0" not in masks


def test_sparse_pruning_matches_reference():
    rng = np.random.RandomState(1)
    w = rng.randn(16, 14).astype(np.float32)
    ref_sp, torch = _ref_pruning({"sparsity": 0.6})
    net = _TorchNet(w)
    ref_sp.pruning(net, "sparse_pruning")
    ref_w = net.fc.weight.detach().numpy()

    ours, _ = prune_params({"w0": w.copy()},
                           PruningConfig(sparse_mode="sparse_pruning",
                                         sparsity=0.6))
    np.testing.assert_allclose(ours["w0"], ref_w, atol=0)
    assert 0.55 < float((ours["w0"] == 0).mean()) < 0.65


def test_coo_pruning_matches_reference():
    """The reference's coo loop iterates a 3rd kernel dim (wavenet conv
    weights); a (out, in, 1) conv weight pins the same per-block
    top-nnz rule our 2-D coo_mask applies."""
    rng = np.random.RandomState(2)
    w2 = rng.randn(16, 8).astype(np.float32)
    ref_sp, torch = _ref_pruning({"coo_shape": [4, 4], "coo_nnz": 5})
    net = torch.nn.Module()
    net.cv = torch.nn.Conv1d(8, 16, 1, bias=False)
    with torch.no_grad():
        net.cv.weight.copy_(torch.from_numpy(w2[:, :, None]))
    ref_sp.pruning(net, "coo_pruning")
    ref_w = net.cv.weight.detach().numpy()[:, :, 0]

    ours, _ = prune_params({"w0": w2.copy()},
                           PruningConfig(sparse_mode="coo_pruning",
                                         coo_shape=[4, 4], coo_nnz=5))
    np.testing.assert_allclose(ours["w0"], ref_w, atol=0)


def test_pattern_pruning_applies_given_masks():
    rng = np.random.RandomState(3)
    w = rng.randn(8, 8).astype(np.float32)
    m = (rng.rand(8, 8) > 0.5).astype(np.float32)
    ours, masks = prune_params(
        {"w0": w.copy()},
        PruningConfig(sparse_mode="pattern_pruning",
                      pattern_mask={"w0": m}))
    np.testing.assert_allclose(ours["w0"], w * m)
    np.testing.assert_allclose(masks["pruning_w0"], m)


def test_ptcoo_pruning_pattern_plus_refill():
    rng = np.random.RandomState(4)
    w = rng.randn(16, 16).astype(np.float32)
    cfg = PruningConfig(sparse_mode="ptcoo_pruning", pattern_num=4,
                        pattern_shape=[8, 8], pt_nnz=6, coo_nnz=4)
    ours, masks = prune_params({"w0": w.copy()}, cfg)
    m = masks["pruning_w0"]
    # every 8x8 block has pt_nnz pattern slots + coo_nnz refills
    blocks = m.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 64)
    nnz = blocks.sum(axis=1)
    assert np.all(nnz >= 6) and np.all(nnz <= 10)
    np.testing.assert_allclose(ours["w0"], w * m)


def test_find_retrain_layer_and_model_wise():
    rng = np.random.RandomState(5)
    w = rng.randn(16, 16).astype(np.float32)
    for mode in ("l", "m"):
        cfg = PruningConfig(sparse_mode="find_retrain", pattern_num=4,
                            pattern_shape=[4, 4], pattern_nnz=6,
                            layer_or_model_wise=mode)
        ours, masks = prune_params({"w0": w.copy()}, cfg)
        m = masks["pruning_w0"]
        blocks = m.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
        assert np.all(blocks.sum(axis=1) == 6)
        key = "w0" if mode == "l" else "all"
        assert key in cfg.fd_rtn_pattern_set


def test_pruning_over_variables_records_masks():
    rng = np.random.RandomState(6)
    v = {"params": {"w0": rng.randn(8, 8).astype(np.float32),
                    "b0": rng.randn(8).astype(np.float32),
                    "bn0": {"gamma": np.ones(8, np.float32),
                            "beta": np.zeros(8, np.float32)}},
         "state": {}, "masks": {"hcgs_w0": np.ones((8, 8), np.float32)}}
    out = pruning(v, PruningConfig(sparse_mode="thre_pruning",
                                   pruning_thre=0.5))
    assert "pruning_w0" in out["masks"]
    assert "hcgs_w0" in out["masks"]          # existing masks preserved
    assert model_sparsity(out["params"]) > 0.1
    assert isinstance(out["params"]["bn0"], dict)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        prune_params({}, PruningConfig(sparse_mode="nope"))


def test_from_ini_section():
    import configparser
    c = configparser.ConfigParser()
    c.read_string("[pruning]\nsparse_mode=coo_pruning\ncoo_shape=4,4\n"
                  "coo_nnz=3\n")
    cfg = PruningConfig.from_ini_section(c["pruning"])
    assert cfg.sparse_mode == "coo_pruning"
    assert cfg.coo_shape == [4, 4] and cfg.coo_nnz == 3
