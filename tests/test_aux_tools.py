"""Aux tooling tests: hyperparameter tuner, curves, run_test pattern
pruning, raw-feature extraction."""
import configparser
import os

import numpy as np

from pytorch_kaldi_cgs_tpu.bin import tune_hyperparameters as tune
from pytorch_kaldi_cgs_tpu.bin.run_test import pattern_prune_variables
from pytorch_kaldi_cgs_tpu.bin.save_raw_fea import wav_to_frames
from pytorch_kaldi_cgs_tpu.runtime import plots


def test_tune_hyperparameters(tmp_path):
    base = tmp_path / "base.cfg"
    base.write_text("out_folder = /x\narch_lr = 0.1\nbatch_size_train = 64\n"
                    "dnn_act = relu,softmax\n")
    files = tune.generate(str(base), str(tmp_path / "tuning"), 3,
                          ["arch_lr=randfloat(0.001,0.01)",
                           "batch_size_train=randint(32,256)",
                           "dnn_act=choose_str{relu,softmax|tanh,softmax}"])
    assert len(files) == 3
    for i, f in enumerate(files):
        text = open(f).read()
        assert ("out_folder = %s/exp%d" % (tmp_path / "tuning", i)) in text
        lr = float([l for l in text.splitlines() if l.startswith("arch_lr")][0]
                   .split("=")[1])
        assert 0.001 <= lr <= 0.01
        bs = int([l for l in text.splitlines() if l.startswith("batch_size_train")][0]
                 .split("=")[1])
        assert 32 <= bs <= 256
        act = [l for l in text.splitlines() if l.startswith("dnn_act")][0]
        assert act.split("=")[1].strip() in ("relu,softmax", "tanh,softmax")
    # deterministic across calls
    files2 = tune.generate(str(base), str(tmp_path / "tuning2"), 3,
                           ["arch_lr=randfloat(0.001,0.01)"])
    a = open(files[0]).read().splitlines()
    # (different spec sets -> only check generation runs deterministically)
    assert len(files2) == 3


def test_curves(tmp_path):
    out = tmp_path / "exp"
    os.makedirs(out)
    with open(out / "res.res", "w") as f:
        f.write("ep=0 tr=[d] loss=2.0 err=0.5 valid=dev loss=2.1 err=0.55 lr=a=0.1 time(s)=10\n")
        f.write("ep=1 tr=[d] loss=1.0 err=0.2 valid=dev loss=1.4 err=0.30 lr=a=0.1 time(s)=10\n")
    plots.create_curves(str(out), 2, ["dev"])
    gen = out / "generated_outputs"
    tr_loss = [float(v) for v in open(gen / "tr_loss.txt").read().split()]
    assert tr_loss == [2.0, 1.0]
    v_acc = [float(v) for v in open(gen / "valid_dev_acc.txt").read().split()]
    assert v_acc == [0.45, 0.7]


def test_pattern_prune_variables():
    rng = np.random.RandomState(0)
    variables = {"params": {"w0": rng.randn(16, 16).astype(np.float32),
                            "b0": np.zeros(16, np.float32)},
                 "state": {}, "masks": {}}
    out = pattern_prune_variables(variables, [8, 8], 4)
    w = out["params"]["w0"]
    # each 8x8 block keeps exactly 4 entries
    blocks = (w != 0).reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, -1)
    np.testing.assert_array_equal(blocks.sum(axis=1), [4, 4, 4, 4])
    assert "pattern_w0" in out["masks"]
    # bias untouched
    np.testing.assert_array_equal(out["params"]["b0"], variables["params"]["b0"])


def test_wav_to_frames():
    sig = (np.sin(np.linspace(0, 100, 16000)) * 32767).astype(np.int16)
    frames = wav_to_frames(sig, n_frames=50, wlen=3200, shift=160)
    assert frames.shape == (50, 3200)
    assert np.abs(frames).max() <= 1.0


def test_matio_export(tmp_path):
    pytest_importorskip = __import__("pytest").importorskip
    pytest_importorskip("scipy")
    from pytorch_kaldi_cgs_tpu.utils.matio import export_model_mats
    variables = {"params": {"w0": np.ones((4, 4), np.float32),
                            "b0": np.zeros(4, np.float32)},
                 "masks": {"hcgs_w0": np.eye(4, dtype=np.float32)}}
    n = export_model_mats(variables, "arch", str(tmp_path))
    assert n == 2
    import scipy.io as sio
    d = sio.loadmat(str(tmp_path / "arch_w0.mat"))
    np.testing.assert_allclose(d["arch_w0"], np.ones((4, 4)))


def test_getresults(tmp_path):
    from pytorch_kaldi_cgs_tpu.bin.getresults import collect
    d = tmp_path / "exp" / "run1" / "decode_test_out"
    os.makedirs(d)
    with open(d / "wer", "w") as f:
        f.write("%WER 12.34 [ 10 / 81, 1 ins, 2 del, 7 sub ]\n")
    rows = collect(str(tmp_path / "exp"))
    assert rows == [("run1", 12.34, str(d))]
