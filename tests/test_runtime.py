"""Runtime tests: optimizers, graph executor, chunk training, and the
full end-to-end experiment (train → valid → forward → decode → PER) on
the synthetic miniature dataset."""
import configparser
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.data import synth
from pytorch_kaldi_cgs_tpu.runtime import optim as O
from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg


def test_torch_sgd_momentum():
    tx = O.make_optimizer({"arch_opt": "sgd", "arch_lr": "0.1",
                           "opt_momentum": "0.9", "opt_weight_decay": "0",
                           "opt_dampening": "0", "opt_nesterov": "False"})
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    upd, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.array(upd["w"]), -0.1, rtol=1e-6)
    upd, state = tx.update(g, state, params)
    # second step: buf = 0.9*1 + 1 = 1.9 -> update -0.19
    np.testing.assert_allclose(np.array(upd["w"]), -0.19, rtol=1e-6)


def test_torch_rmsprop_matches_reference_rule():
    tx = O.make_optimizer({"arch_opt": "rmsprop", "arch_lr": "1.0",
                           "opt_momentum": "0.0", "opt_alpha": "0.5",
                           "opt_eps": "1e-8", "opt_centered": "False",
                           "opt_weight_decay": "0"})
    params = {"w": jnp.zeros(1)}
    state = tx.init(params)
    g = {"w": jnp.array([2.0])}
    upd, state = tx.update(g, state, params)
    # sq = 0.5*0 + 0.5*4 = 2 ; update = -lr * 2/(sqrt(2)+eps)
    np.testing.assert_allclose(np.array(upd["w"]), [-2 / np.sqrt(2)], rtol=1e-5)


def test_set_learning_rate():
    tx = O.make_optimizer({"arch_opt": "sgd", "arch_lr": "0.5",
                           "opt_momentum": "0", "opt_weight_decay": "0",
                           "opt_dampening": "0", "opt_nesterov": "False"})
    params = {"w": jnp.ones(2)}
    state = tx.init(params)
    state = O.set_learning_rate(state, 0.25)
    upd, _ = tx.update({"w": jnp.ones(2)}, state, params)
    np.testing.assert_allclose(np.array(upd["w"]), -0.25, rtol=1e-6)


def test_adam_runs():
    tx = O.make_optimizer({"arch_opt": "adam", "arch_lr": "0.001",
                           "opt_betas": "0.9,0.999", "opt_eps": "1e-8",
                           "opt_weight_decay": "0.01", "opt_amsgrad": "False"})
    params = {"w": jnp.ones(4)}
    state = tx.init(params)
    upd, state = tx.update({"w": jnp.ones(4)}, state, params)
    assert np.all(np.array(upd["w"]) < 0)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    root = str(tmp / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=24, num_phones=6, states_per_phone=2, feat_dim=8,
        min_len=40, max_len=90, noise=0.4, seed=7))
    return tmp, root


def test_end_to_end_mlp(synth_root):
    """The round-1 milestone: full experiment (L1,L2,L3,L4,L5,L7,L8) on
    one device — MLP acoustic model, cost_nll+cost_err, forward with
    prior normalization into ark, phone-loop Viterbi decode, PER."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_mlp")
    cfg = make_synth_cfg(str(tmp / "mlp.cfg"), root, out_folder,
                         model="MLP", hidden=48, n_epochs=2, n_chunks=2,
                         batch_size=128, lr=0.06, cw=1)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)

    # res.res written with epoch lines
    res = open(results["res_file"]).read()
    assert "ep=0" in res and "ep=1" in res

    # training error decreased vs chance (11/12 ≈ 0.92 for 12 pdfs)
    infos = sorted(glob.glob(os.path.join(out_folder, "exp_files",
                                          "train_*ep1*.info")))
    c = configparser.ConfigParser()
    c.read(infos[-1])
    assert float(c["results"]["err"]) < 0.5

    # forward arks exist and decode produced a finite PER
    arks = glob.glob(os.path.join(out_folder, "exp_files",
                                  "forward_*_to_decode.ark"))
    assert arks
    wer_key = [k for k in results if k.startswith("wer_")]
    assert wer_key, "decoding did not run"
    per = results[wer_key[0]]
    assert 0 <= per < 60.0  # learnable synthetic task: PER well under chance

    # final checkpoint for production exists
    assert os.path.exists(os.path.join(out_folder, "exp_files",
                                       "final_architecture1.pkl"))

    # observability tail: curves + architecture diagram auto-generated
    # (ref: utils.py:2104-2220, :1417-1532)
    for rel in ("generated_outputs/loss.png", "generated_outputs/acc.png",
                "model.svg"):
        assert os.path.exists(os.path.join(out_folder, rel)), rel


def test_end_to_end_resume(synth_root):
    """Interrupting and rerunning must skip completed chunks (the .info
    resume contract, ref: run_exp.py:189)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_mlp")  # same folder as previous test
    cfg = str(tmp / "mlp.cfg")
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    # all .info files exist -> rerun touches nothing but still reports
    before = sorted(glob.glob(os.path.join(out_folder, "exp_files", "*.info")))
    mtimes = {p: os.path.getmtime(p) for p in before}
    results = run_exp(cfg)
    after = {p: os.path.getmtime(p) for p in before}
    assert mtimes == after


def test_end_to_end_lstm_hcgs(synth_root):
    """Sequential path: LSTM+HCGS+quantization trains end to end."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_lstm")
    cfg = make_synth_cfg(str(tmp / "lstm.cfg"), root, out_folder,
                         model="LSTM", hidden=32, n_epochs=1, n_chunks=2,
                         batch_size=4, lr=0.01, opt="rmsprop", cw=0,
                         hcgs=True, hcgs_block="8,2", hcgs_sparse="25,50",
                         quant=True, param_quant="8,8")
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out_folder, "exp_files",
                                          "train_*.info")))
    assert infos
    c = configparser.ConfigParser()
    c.read(infos[-1])
    assert float(c["results"]["err"]) < 0.95
    # HCGS masks persisted in the checkpoint
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    pkls = glob.glob(os.path.join(out_folder, "exp_files", "train_*ck1*.pkl"))
    found_mask = False
    for p in pkls:
        ck = load_checkpoint(p)
        if any(k.startswith("hcgs_") for k in ck["model_par"].get("masks", {})):
            found_mask = True
    assert found_mask


def test_end_to_end_multi_device_dp(synth_root):
    """[exp] multi_gpu=True shards batches over the 8-device CPU mesh
    (the reference's DataParallel flag, ref: utils.py:1781-1784)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_dp")
    cfg = make_synth_cfg(str(tmp / "dp.cfg"), root, out_folder,
                         model="MLP", hidden=32, n_epochs=1, n_chunks=2,
                         batch_size=128, lr=0.06, cw=1)
    # enable the DP flag
    text = open(cfg).read().replace("multi_gpu = False", "multi_gpu = True")
    open(cfg, "w").write(text)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out_folder, "exp_files",
                                          "train_*.info")))
    assert infos
    c = configparser.ConfigParser()
    c.read(infos[-1])
    assert float(c["results"]["err"]) < 0.8


def test_end_to_end_ligru_multitask(synth_root):
    """liGRU + cd/mono multitask heads (the reference flagship wiring:
    compute->compute x2, cost_nll x2, mult_constant, sum)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_ligru")
    cfg = make_synth_cfg(str(tmp / "ligru.cfg"), root, out_folder,
                         model="liGRU", hidden=32, n_epochs=1, n_chunks=2,
                         batch_size=4, lr=0.004, opt="rmsprop", cw=0,
                         multitask_mono=True, lmwt_sweep=False)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out_folder, "exp_files",
                                          "train_*.info")))
    c = configparser.ConfigParser()
    c.read(infos[-1])
    assert float(c["results"]["err"]) < 0.95


def test_end_to_end_guided_hcgs_two_phase(synth_root):
    """Guided-HCGS lifecycle: dense epochs, then apply_guided_ep flips
    the masks on (ref: utils.py:1085-1095, core.py:298-300)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_guided")
    cfg = make_synth_cfg(str(tmp / "guided.cfg"), root, out_folder,
                         model="MLP", hidden=32, n_epochs=3, n_chunks=2,
                         batch_size=128, lr=0.06, cw=1,
                         hcgs=False, guided=True, apply_guided_ep=2,
                         hcgs_block="8", hcgs_sparse="50", lmwt_sweep=False)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    # chunk cfgs: guided off at ep0, on from ep1 (ep+1 >= 2)
    cc0 = configparser.ConfigParser()
    cc0.read(glob.glob(os.path.join(out_folder, "exp_files",
                                    "train_*ep0_ck0.cfg"))[0])
    assert cc0["architecture1"]["apply_guided_hcgs"] == "False"
    cc2 = configparser.ConfigParser()
    cc2.read(glob.glob(os.path.join(out_folder, "exp_files",
                                    "train_*ep2_ck0.cfg"))[0])
    assert cc2["architecture1"]["apply_guided_hcgs"] == "True"
    # final checkpoint carries guided masks at ~50% density
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    ck = load_checkpoint(os.path.join(out_folder, "exp_files",
                                      "final_architecture1.pkl"))
    masks = ck["model_par"]["masks"]
    gm = [v for k, v in masks.items() if k.startswith("ghcgs_")]
    assert gm, "guided masks missing from checkpoint"
    # keep fraction = round(n_col_blocks * 0.5)/n_col_blocks per row;
    # with 3 column blocks of 8 on the 24-wide input that is 2/3
    d = np.count_nonzero(gm[0]) / gm[0].size
    assert 0.3 < d < 0.75


def test_end_to_end_pattern_refresh(synth_root):
    """Pattern mode: k-means pattern refresh between chunks, masks
    applied in-step and persisted (ref: neural_networks.py:876-884)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_pattern")
    cfg = make_synth_cfg(str(tmp / "pattern.cfg"), root, out_folder,
                         model="MLP", hidden=32, n_epochs=1, n_chunks=2,
                         batch_size=128, lr=0.06, cw=1,
                         pattern=True, pattern_shape="4,4", pattern_nnz=8,
                         pattern_num=6, lmwt_sweep=False)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    ck = load_checkpoint(os.path.join(out_folder, "exp_files",
                                      "final_architecture1.pkl"))
    masks = ck["model_par"]["masks"]
    pm = [v for k, v in masks.items() if k.startswith("pattern_")]
    assert pm, "pattern masks missing"
    # each 4x4 block of the mask keeps exactly 8 entries
    m = pm[0]
    R, C = m.shape[0] // 4, m.shape[1] // 4
    blocks = m.reshape(R, 4, C, 4).transpose(0, 2, 1, 3).reshape(-1, 16)
    np.testing.assert_array_equal(blocks.sum(1), 8)


def test_pattern_two_phase_and_compute_once(synth_root):
    """apply_pattern_ep trains dense first, then cuts kmeans patterns
    ONCE and keeps the mask fixed for the fine-tune tail — the
    reference's record.md:105 lifecycle (pattern_search.py on a trained
    model; its per-chunk update hook is commented out, core.py:304-316)."""
    tmp, root = synth_root
    out_folder = str(tmp / "exp_pattern2ph")
    cfg = make_synth_cfg(str(tmp / "pattern2ph.cfg"), root, out_folder,
                         model="MLP", hidden=32, n_epochs=3, n_chunks=1,
                         batch_size=128, lr=0.06, cw=1,
                         pattern=True, pattern_shape="4,4", pattern_nnz=8,
                         pattern_num=6, apply_pattern_ep=2,
                         lmwt_sweep=False)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    run_exp(cfg)
    import configparser
    # phase 1 chunk trains dense (if_pattern off), phase 2 patterned
    cc0 = configparser.ConfigParser()
    cc0.read(glob.glob(os.path.join(out_folder, "exp_files",
                                    "train_*ep0_ck0.cfg"))[0])
    assert cc0["architecture1"]["if_pattern"] == "False"
    cc1 = configparser.ConfigParser()
    cc1.read(glob.glob(os.path.join(out_folder, "exp_files",
                                    "train_*ep1_ck0.cfg"))[0])
    assert cc1["architecture1"]["if_pattern"] == "True"
    # masks present in the final (fine-tuned) checkpoint
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    ck = load_checkpoint(os.path.join(out_folder, "exp_files",
                                      "final_architecture1.pkl"))
    assert any(k.startswith("pattern_") for k in ck["model_par"]["masks"])

    # compute-once directly on the model hook: a second refresh with
    # DIFFERENT weights must not move the existing masks
    from pytorch_kaldi_cgs_tpu.models import MLP
    opts = {"to_do": "train", "arch_name": "m", "out_folder": str(tmp),
            "dnn_lay": "16", "dnn_drop": "0.0",
            "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_act": "relu", "if_pattern": "True",
            "pattern_mode": "pattern", "pattern_shape": "4,4",
            "pattern_nnz": "8", "pattern_num": "4"}
    net = MLP(opts, 16)
    v = net.init(0)
    v1 = net.refresh_patterns(v, seed=0)
    m1 = np.asarray(v1["masks"]["pattern_w0"])
    v_shuf = {**v1, "params": {**v1["params"],
                               "w0": np.asarray(v1["params"]["w0"])[::-1]}}
    v2 = net.refresh_patterns(v_shuf, seed=7)
    np.testing.assert_array_equal(m1, np.asarray(v2["masks"]["pattern_w0"]))


def test_recognizer_pipeline_runs():
    """Raw audio -> fbank -> MLP -> Viterbi in one device pipeline."""
    from pytorch_kaldi_cgs_tpu.runtime.serve import Recognizer
    from pytorch_kaldi_cgs_tpu.ops.frontend import Frontend
    from pytorch_kaldi_cgs_tpu.decode.viterbi import PhoneLoopHMM
    from pytorch_kaldi_cgs_tpu import models as M

    fe = Frontend(sample_rate=8000, num_mel_bins=10)
    hmm = PhoneLoopHMM(4, 2)
    opts = {"to_do": "forward", "arch_name": "m", "out_folder": "/tmp",
            "dnn_lay": "16,8", "dnn_drop": "0.0,0.0",
            "dnn_use_batchnorm": "False,False",
            "dnn_use_laynorm": "False,False",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_act": "relu,softmax"}
    model = M.MLP(opts, 10)
    v = model.init(0)
    rec = Recognizer(model, v, hmm, frontend=fe, acwt=1.0)
    rng = np.random.RandomState(0)
    audio = rng.randn(3, 8000).astype(np.float32)
    seqs = rec.recognize(audio, lengths_samples=[8000, 4000, 6000])
    assert len(seqs) == 3
    assert all(len(s) >= 1 for s in seqs)
    assert all(0 <= p < 4 for s in seqs for p in s)
    # confidences without leaving the device (VERDICT r4 item 7): the
    # phone-loop olabels are phone+1
    res = rec.recognize_with_confidence(audio,
                                        lengths_samples=[8000, 4000, 6000])
    assert len(res) == 3
    for r in res:
        assert r is not None
        labels, confs = r
        assert len(labels) == len(confs) >= 1
        assert all(1 <= l <= 4 for l in labels)
        assert all(0.0 <= c <= 1.0 for c in confs)


def test_decoding_cli(synth_root):
    """bin.decoding re-runs the decode stage over existing forward arks
    (depends on test_end_to_end_mlp's artifacts)."""
    tmp, root = synth_root
    cfg = str(tmp / "mlp.cfg")
    if not os.path.exists(cfg):
        pytest.skip("mlp e2e has not run")
    from pytorch_kaldi_cgs_tpu.bin.decoding import main
    assert main([cfg, "--acwt", "1.0"]) == 0
    wer = os.path.join(str(tmp / "exp_mlp"),
                       "decode_synth_test_out_out_dnn1", "wer")
    assert os.path.exists(wer)


def test_run_test_cli_pattern_prune(synth_root):
    """bin.run_test applies [pattern] post-training pruning and re-runs
    forward+decode FROM THE PRUNED checkpoints (the forward arks must
    change — the round-3 code regenerated the pkl but still forwarded
    the unpruned model)."""
    tmp, root = synth_root
    cfg_src = str(tmp / "mlp.cfg")
    if not os.path.exists(cfg_src):
        pytest.skip("mlp e2e has not run")
    cfg = str(tmp / "mlp_test.cfg")
    text = open(cfg_src).read()
    text += "\n[pattern]\npattern_prun = True\npattern_num = 4\n" \
            "pattern_shape = 4,4\npattern_nnz = 8\n"
    open(cfg, "w").write(text)
    arks_before = {p: open(p, "rb").read() for p in glob.glob(
        os.path.join(str(tmp / "exp_mlp"), "exp_files", "forward_*.ark"))}
    assert arks_before, "mlp e2e left no forward arks"
    from pytorch_kaldi_cgs_tpu.bin.run_test import main
    assert main([cfg]) == 0
    pruned = glob.glob(os.path.join(str(tmp / "exp_mlp"), "exp_files",
                                    "final_*_4_4x4_8_pattern.pkl"))
    assert pruned
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    ck = load_checkpoint(pruned[0])
    w = ck["model_par"]["params"]["w0"]
    blocks = (np.asarray(w) != 0).reshape(
        w.shape[0] // 4, 4, w.shape[1] // 4, 4).transpose(0, 2, 1, 3)
    counts = blocks.reshape(-1, 16).sum(1)
    assert (counts <= 8).all() and counts.max() == 8
    # forward re-ran with the pruned model: posteriors differ
    changed = False
    for p, before in arks_before.items():
        assert os.path.exists(p), "forward ark %s not regenerated" % p
        if open(p, "rb").read() != before:
            changed = True
    assert changed, "forward output identical — pruned model not used"


def test_run_test_cli_unified_pruning(synth_root):
    """bin.run_test's [pruning] section drives the unified pruning()
    dispatcher (ref sparsity/sparsity.py:33-270) over the final
    checkpoints before forward+decode (SURVEY table row 52)."""
    tmp, root = synth_root
    cfg_src = str(tmp / "mlp.cfg")
    if not os.path.exists(cfg_src):
        pytest.skip("mlp e2e has not run")
    cfg = str(tmp / "mlp_prune_test.cfg")
    text = open(cfg_src).read()
    text += "\n[pruning]\nsparse_mode = sparse_pruning\nsparsity = 0.5\n"
    open(cfg, "w").write(text)
    from pytorch_kaldi_cgs_tpu.bin.run_test import main
    assert main([cfg]) == 0
    pruned = glob.glob(os.path.join(str(tmp / "exp_mlp"), "exp_files",
                                    "final_*_sparse_pruning.pkl"))
    assert pruned
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    ck = load_checkpoint(pruned[0])
    w = np.asarray(ck["model_par"]["params"]["w0"])
    assert 0.45 < float((w == 0).mean()) < 0.55
    assert "pruning_w0" in ck["model_par"]["masks"]
    # the forward chunk cfgs point at the pruned checkpoint
    import configparser
    fwd_cfgs = glob.glob(os.path.join(str(tmp / "exp_mlp"), "exp_files",
                                      "forward_*.cfg"))
    assert fwd_cfgs
    c = configparser.ConfigParser()
    c.read(fwd_cfgs[0])
    arch_sec = [s for s in c.sections() if "architecture" in s][0]
    assert c[arch_sec]["arch_pretrain_file"].endswith(
        "_sparse_pruning.pkl")


def test_checkpoint_atomicity_under_crash(tmp_path, monkeypatch):
    """A crash mid-save must never leave a truncated checkpoint under
    the final name (fault injection into the pickle)."""
    import pickle as _pickle

    from pytorch_kaldi_cgs_tpu.runtime import checkpoint as C

    path = str(tmp_path / "net.pkl")
    C.save_checkpoint(path, {"params": {"w": np.ones(3)}})
    good = open(path, "rb").read()

    calls = {"n": 0}
    orig = _pickle.dump

    def failing_dump(obj, f, protocol=None):
        f.write(b"PARTIAL")
        raise IOError("simulated crash mid-write")

    monkeypatch.setattr(_pickle, "dump", failing_dump)
    with pytest.raises(IOError):
        C.save_checkpoint(path, {"params": {"w": np.zeros(3)}})
    monkeypatch.setattr(_pickle, "dump", orig)
    # the old checkpoint is intact; no temp litter under the final name
    assert open(path, "rb").read() == good
    ck = C.load_checkpoint(path)
    np.testing.assert_array_equal(ck["model_par"]["params"]["w"], np.ones(3))
    assert not [p for p in os.listdir(str(tmp_path)) if p.endswith(".tmp")]


def test_async_checkpointer_orders_marker_after_saves(tmp_path):
    """The .info-style completion marker queued via run() lands only
    after earlier saves are durable; worker errors surface on wait()."""
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import (AsyncCheckpointer,
                                                          load_checkpoint)

    ck = AsyncCheckpointer()
    pkl = str(tmp_path / "a.pkl")
    marker = str(tmp_path / "a.info")
    ck.save(pkl, {"params": {"w": np.arange(4.0)}})

    def write_marker():
        assert os.path.exists(pkl), "marker ran before its checkpoint!"
        open(marker, "w").write("[results]\n")

    ck.run(write_marker)
    ck.wait()
    assert os.path.exists(marker)
    np.testing.assert_array_equal(
        load_checkpoint(pkl)["model_par"]["params"]["w"], np.arange(4.0))

    # worker failures are not silent
    ck.save(str(tmp_path / "nodir" / "x.pkl"), {"params": {}})
    with pytest.raises(FileNotFoundError):
        ck.wait()
    ck.close()


def test_cluster_cmd_hook_runs_decode_as_subprocess(synth_root, tmp_path):
    """[exp] cmd prepends a scheduler prefix to the decode job
    (ref: run_exp.py:467-469) — using `env` as a benign run.pl
    stand-in, decoding must go through bin.decode_cli and still
    produce the WER result."""
    tmp, root = synth_root
    out_folder = str(tmp_path / "exp_cmd")
    cfg = make_synth_cfg(str(tmp_path / "cmd.cfg"), root, out_folder,
                         model="MLP", hidden=32, n_epochs=1, n_chunks=1,
                         batch_size=64, lr=0.05, cw=1, lmwt_sweep=False)
    text = open(cfg).read().replace("cmd =", "cmd = env JAX_PLATFORMS=cpu")
    open(cfg, "w").write(text)
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    wer_key = [k for k in results if k.startswith("wer_")]
    assert wer_key and 0 <= results[wer_key[0]] < 80.0


def test_batched_forward_matches_single():
    """make_forward_batches at B=4 produces per-utterance tensors
    identical to B=1 (the reference's one-sentence-per-batch stream,
    ref: core.py:71-72), for both a seq net and a flat (T*B,C) net."""
    from pytorch_kaldi_cgs_tpu.data.dataset import ChunkData
    from pytorch_kaldi_cgs_tpu.runtime.chunk import make_forward_batches

    rng = np.random.RandomState(0)
    lens = [37, 52, 61, 90, 101, 113]          # 6 utts -> batch 4 + partial 2
    data = rng.randn(sum(lens), 10).astype(np.float32)
    chunk = ChunkData(names=["u%d" % i for i in range(len(lens))],
                      data=data, end_index=np.cumsum(lens))

    def run(model_fn, bs):
        outs = {}
        for inp, ls, names in make_forward_batches(chunk, bs, bucket=32):
            y = np.asarray(model_fn(jnp.asarray(inp)))
            T, B = inp.shape[0], inp.shape[1]
            if y.ndim == 2:
                y = y.reshape(T, B, -1)
            for j, nm in enumerate(names):
                outs[nm] = y[:ls[j], j]
        return outs

    W = rng.randn(10, 7).astype(np.float32)

    def seq_net(x):                             # causal cumulative net
        return jnp.cumsum(jnp.tanh(x @ W), axis=0)

    def flat_net(x):                            # per-frame net via (T*B,C)
        flat = x.reshape(-1, x.shape[-1])
        return jnp.tanh(flat @ W)

    for net in (seq_net, flat_net):
        o1 = run(net, 1)
        o4 = run(net, 4)
        assert sorted(o1) == sorted(o4) == sorted(chunk.names)
        for nm in o1:
            np.testing.assert_allclose(o4[nm], o1[nm], atol=1e-6,
                                       err_msg=nm)


def test_sigkill_mid_training_resume(tmp_path):
    """Elasticity: SIGKILL the experiment process mid-training, rerun,
    and the experiment completes with the same artifact contract — the
    chunk-granularity crash recovery of the reference (.info markers +
    pretrain chain, ref: run_exp.py:189-219) plus our atomic checkpoint
    writes (a killed write must never leave a corrupt .pkl behind)."""
    import subprocess
    import sys
    import time as _t

    root = str(tmp_path / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=24, num_phones=6, states_per_phone=2, feat_dim=8,
        min_len=40, max_len=90, noise=0.4, seed=7))
    out_folder = str(tmp_path / "exp_kill")
    cfg = make_synth_cfg(str(tmp_path / "kill.cfg"), root, out_folder,
                         model="MLP", hidden=48, n_epochs=3, n_chunks=3,
                         batch_size=64, lr=0.06, cw=1)
    code = ("import jax; jax.config.update('jax_platforms','cpu')\n"
            "from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp\n"
            "run_exp(%r)\n" % cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen([sys.executable, "-c", code], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # wait for the first chunk artifacts, then kill hard mid-flight
    info_glob = os.path.join(out_folder, "exp_files", "*.info")
    deadline = _t.time() + 120
    while _t.time() < deadline and not glob.glob(info_glob):
        _t.sleep(0.3)
    assert glob.glob(info_glob), "no chunk ever completed before timeout"
    proc.kill()
    proc.wait()
    done_before = set(glob.glob(info_glob))

    # no partial checkpoint corruption: every .pkl on disk must load
    from pytorch_kaldi_cgs_tpu.runtime.checkpoint import load_checkpoint
    for pkl in glob.glob(os.path.join(out_folder, "exp_files", "*.pkl")):
        load_checkpoint(pkl)

    # resume in-process: completed chunks skipped, run finishes
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    results = run_exp(cfg)
    res = open(results["res_file"]).read()
    assert "ep=2" in res
    assert done_before <= set(glob.glob(info_glob))
    assert os.path.exists(os.path.join(out_folder, "exp_files",
                                       "final_architecture1.pkl"))
