"""Real-data runbook validation (VERDICT r4 item 9; docs/REAL_DATA.md):
a mocked Kaldi egs/timit/s5 tree mapped onto a SHIPPED cfg through
bin/run_real — placeholder substitution, tree validation, typed proto
cfg check, and chunk-list generation (everything short of training)."""
import gzip
import os

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.bin.run_real import (collect_paths, main,
                                                substitute, validate_tree)
from pytorch_kaldi_cgs_tpu.data import kaldi_io
from pytorch_kaldi_cgs_tpu.data.features import (TransitionModel,
                                                 compute_cmvn_stats,
                                                 write_prior_counts)

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "cfg", "TIMIT_CGS", "TIMIT_LSTM_fmllr_cgs_dense.cfg")

N_PDFS, N_PHONES, DIM = 8, 4, 13


def _mock_s5(root):
    """Minimal egs/timit/s5 tree with the files the dense cfg names."""
    rng = np.random.RandomState(0)
    tm = TransitionModel.identity(N_PDFS)
    tm.tid2phone = np.concatenate(
        [[-1], np.arange(N_PDFS, dtype=np.int32) // 2])
    tm.num_phones = N_PHONES
    for split, ali in (("train", "dnn4_pretrain-dbn_dnn_ali"),
                       ("dev", "dnn4_pretrain-dbn_dnn_ali_dev"),
                       ("test", "dnn4_pretrain-dbn_dnn_ali_test")):
        fdir = os.path.join(root, "data-fmllr-tri3", split)
        ddir = os.path.join(root, "data", split)
        adir = os.path.join(root, "exp", ali)
        fml = os.path.join(fdir, "_fmllr")
        for d in (fdir, ddir, adir, fml):
            os.makedirs(d, exist_ok=True)
        counts = np.zeros(N_PDFS)
        with kaldi_io.ArkScpWriter(os.path.join(fdir, "feats.ark"),
                                   os.path.join(fdir, "feats.scp")) as w, \
                open(os.path.join(fdir, "utt2spk"), "w") as u2s, \
                open(os.path.join(ddir, "text"), "w") as txt, \
                gzip.open(os.path.join(adir, "ali.1.gz"), "wb") as ab:
            cm_stats = {}
            for k in range(3):
                utt = "%s_u%d" % (split, k)
                T = 20 + 5 * k
                feats = rng.randn(T, DIM).astype(np.float32)
                w.write(utt, feats)
                spk = "spk%d" % (k % 2)
                u2s.write("%s %s\n" % (utt, spk))
                pdf = rng.randint(0, N_PDFS, T).astype(np.int32)
                kaldi_io.write_vec_int(ab, pdf + 1, key=utt)
                counts += np.bincount(pdf, minlength=N_PDFS)
                txt.write("%s %s\n" % (utt, " ".join(
                    str(p) for p in pdf[:4] // 2)))
                cm_stats.setdefault(spk, []).append(feats)
            with open(os.path.join(fml, "cmvn_%s.ark" % split), "wb") as cf:
                for spk, mats in cm_stats.items():
                    kaldi_io.write_mat(
                        cf, compute_cmvn_stats(np.concatenate(mats)),
                        key=spk)
        tm.to_json(os.path.join(adir, "final.mdl.json"))
        write_prior_counts(counts,
                           os.path.join(adir, "ali_train_pdf.counts"))
    # graph dirs the cfg names (tri3 = cd decode, mono = mono labels)
    import json
    for g in ("exp/tri3/graph", "exp/mono/graph"):
        gd = os.path.join(root, g)
        os.makedirs(gd, exist_ok=True)
        with open(os.path.join(gd, "graph.json"), "w") as f:
            json.dump({"type": "phone_loop", "num_phones": N_PHONES,
                       "states_per_phone": 2}, f)
    return root


def test_mocked_tree_validates_and_checks(tmp_path, monkeypatch):
    root = _mock_s5(str(tmp_path / "s5"))
    monkeypatch.chdir(tmp_path)
    rc = main([os.path.abspath(CFG), "--root", root, "--check-only",
               "--out", str(tmp_path / "exp_real")])
    assert rc == 0
    lsts = [f for f in os.listdir(str(tmp_path / "exp_real" / "exp_files"))
            if f.endswith(".lst")]
    assert lsts, "chunk lists not generated"
    assert os.path.exists(str(tmp_path / "exp_real" /
                              "TIMIT_LSTM_fmllr_cgs_dense.mapped.cfg"))


def test_validation_reports_missing_pieces(tmp_path):
    root = _mock_s5(str(tmp_path / "s5"))
    text = substitute(open(CFG).read(), "TIMIT", root)
    assert "$TIMIT" not in text
    paths = collect_paths(text)
    assert validate_tree(paths) == []
    # break the tree piecewise; each break is named in the report
    os.remove(os.path.join(root, "data-fmllr-tri3", "dev", "feats.scp"))
    probs = validate_tree(paths)
    assert any("fea_lst" in p and "dev" in p for p in probs)
    os.remove(os.path.join(root, "exp", "dnn4_pretrain-dbn_dnn_ali",
                           "final.mdl.json"))
    probs = validate_tree(paths)
    assert any("transition model" in p for p in probs)
    os.remove(os.path.join(root, "exp", "tri3", "graph", "graph.json"))
    probs = validate_tree(paths)
    assert any("graph dir" in p for p in probs)


def test_unmapped_cfg_fails_validation(tmp_path):
    """Without substitution the literal $TIMIT paths are reported."""
    paths = collect_paths(open(CFG).read())
    probs = validate_tree(paths)
    assert probs and all("$TIMIT" in p for p in probs[:2])
