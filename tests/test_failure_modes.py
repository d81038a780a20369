"""Failure-mode contracts for the data/checkpoint layer (VERDICT r4
item 8): truncated archives, corrupt/partial checkpoints, and the
missing-.info-vs-missing-.pkl resume divergence must each produce a
diagnosable error at the point of failure, not a shape mismatch three
layers later. (The reference hard-exits without context,
ref: run_exp.py:215-219.)"""
import glob
import os
import pickle

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.data import kaldi_io
from pytorch_kaldi_cgs_tpu.data.kaldi_io import KaldiIOError
from pytorch_kaldi_cgs_tpu.runtime.checkpoint import (CheckpointError,
                                                      load_checkpoint,
                                                      save_checkpoint)


def _one_mat_ark(path, mat):
    with open(path, "wb") as f:
        kaldi_io.write_mat(f, mat, key="u1")


def test_truncated_binary_mat_mid_body(tmp_path):
    p = str(tmp_path / "a.ark")
    _one_mat_ark(p, np.arange(40, dtype=np.float32).reshape(10, 4))
    full = open(p, "rb").read()
    open(p, "wb").write(full[:-17])          # cut inside the matrix body
    with pytest.raises(KaldiIOError, match="truncated.*matrix body"):
        list(kaldi_io.read_mat_ark(p))


def test_truncated_binary_mat_mid_header(tmp_path):
    p = str(tmp_path / "a.ark")
    _one_mat_ark(p, np.zeros((3, 3), np.float32))
    full = open(p, "rb").read()
    # keep key + binary marker + token but cut inside the rows int32
    open(p, "wb").write(full[:9])
    with pytest.raises(KaldiIOError):
        list(kaldi_io.read_mat_ark(p))


def test_truncated_int_vector(tmp_path):
    p = str(tmp_path / "ali.ark")
    with open(p, "wb") as f:
        kaldi_io.write_vec_int(f, np.arange(20, dtype=np.int32), key="u1")
    full = open(p, "rb").read()
    open(p, "wb").write(full[:-7])
    with pytest.raises(KaldiIOError, match="truncated.*int32 vector"):
        list(kaldi_io.read_vec_int_ark(p))


def test_truncated_compressed_mat(tmp_path):
    """CM2-format truncation mid-codes errors with context, not a numpy
    frombuffer ValueError."""
    import struct
    rows, cols = 12, 5
    codes16 = np.arange(rows * cols, dtype="<u2")
    buf = (b"u1 \x00BCM2 " + struct.pack("<ffii", -1.0, 2.0, rows, cols)
           + codes16.tobytes())
    p = str(tmp_path / "cm.ark")
    open(p, "wb").write(buf[:-9])
    with pytest.raises(KaldiIOError, match="truncated"):
        list(kaldi_io.read_mat_ark(p))


def test_checkpoint_missing_names_resume_contract(tmp_path):
    with pytest.raises(CheckpointError, match=r"\.info"):
        load_checkpoint(str(tmp_path / "never_written.pkl"))


def test_checkpoint_corrupt_partial(tmp_path):
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, {"w": np.zeros(4)})
    full = open(p, "rb").read()
    open(p, "wb").write(full[: len(full) // 2])   # partial pickle
    with pytest.raises(CheckpointError, match="corrupt"):
        load_checkpoint(p)
    open(p, "wb").write(b"\x80\x05garbage-not-a-pickle")
    with pytest.raises(CheckpointError):
        load_checkpoint(p)


def test_checkpoint_roundtrip_still_works(tmp_path):
    p = str(tmp_path / "ok.pkl")
    save_checkpoint(p, {"w": np.arange(3.0)}, optimizer_par={"m": 1})
    ck = load_checkpoint(p)
    np.testing.assert_array_equal(ck["model_par"]["w"], np.arange(3.0))


def test_resume_with_deleted_checkpoint_is_diagnosable(tmp_path):
    """.info present but the chunk checkpoint .pkl deleted: resuming a
    longer run must fail with CheckpointError naming the file and the
    .info remedy — our defined contract for the reference's hard-exit."""
    from pytorch_kaldi_cgs_tpu.data import synth
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg

    root = str(tmp_path / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=8, num_phones=4, states_per_phone=1, feat_dim=6,
        min_len=20, max_len=30, noise=0.4, seed=11))
    out = str(tmp_path / "exp")
    cfg = make_synth_cfg(str(tmp_path / "r.cfg"), root, out, model="MLP",
                         hidden=16, n_epochs=1, n_chunks=2, batch_size=32,
                         lr=0.02, cw=0, lmwt_sweep=False)
    run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out, "exp_files",
                                          "train_*ck*.info")))
    assert len(infos) >= 2
    # run_exp itself deletes chunk 1's checkpoint once chunk 2 is
    # durable; removing chunk 2's .info therefore resumes into a state
    # where chunk 2 must retrain from a checkpoint that no longer
    # exists — which must be a diagnosable CheckpointError, not a
    # silent restart from random init
    os.remove(infos[-1])
    with pytest.raises(CheckpointError, match="missing"):
        run_exp(cfg)
