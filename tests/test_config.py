"""Tests for the typed proto config system, schedules, model DSL and
chunk config generation."""
import configparser
import glob
import os

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu import config as C
from pytorch_kaldi_cgs_tpu.data import synth
from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg


# ---------------------------------------------------------------------------
# field-type checks
# ---------------------------------------------------------------------------

def test_check_field_types():
    assert C.check_field("5", "int(1,10)", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("11", "int(1,10)", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("0", "int(1,inf)", "x")
    assert C.check_field("0.5", "float(0,1)", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("1.5", "float(0,1)", "x")
    assert C.check_field("True", "bool", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("maybe", "bool", "x")
    assert C.check_field("1,2,3", "int_list(1,inf)", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("1,0,3", "int_list(1,inf)", "x")
    assert C.check_field("True,False", "bool_list", "x")
    assert C.check_field("sgd", "{sgd,rmsprop,adam}", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("sgdx", "{sgd,rmsprop,adam}", "x")
    with pytest.raises(C.ConfigError):
        C.check_field("", "str", "notcmd")
    assert C.check_field("", "str", "cmd")  # cmd may be empty


def test_expand_str_ep():
    assert C.expand_str_ep("128*12|64*10|32*2", "int", 24) == \
        ["128"] * 12 + ["64"] * 10 + ["32"] * 2
    assert C.expand_str_ep("0.08", "float", 3) == ["0.08"] * 3
    with pytest.raises(C.ConfigError):
        C.expand_str_ep("128*2|64*3", "int", 4)  # 5 != 4
    with pytest.raises(C.ConfigError):
        C.expand_str_ep("abc", "int", 2)


def test_newbob():
    # big improvement: keep lr
    assert C.newbob_update(0.1, 10.0, 8.0, 0.001, 0.5) == 0.1
    # tiny improvement: halve
    assert C.newbob_update(0.1, 10.0, 9.999, 0.001, 0.5) == pytest.approx(0.05)


# ---------------------------------------------------------------------------
# model DSL
# ---------------------------------------------------------------------------

def test_parse_model_lines_ok():
    model = ("out_dnn1=compute(LSTM_layers,fmllr)\n"
             "out_dnn2=compute(MLP_layers,out_dnn1)\n"
             "loss_mono=cost_nll(out_dnn2,lab_mono)\n"
             "loss_mono_w=mult_constant(loss_mono,1.0)\n"
             "loss_final=sum(loss_mono_w,loss_mono)\n"
             "err_final=cost_err(out_dnn2,lab_mono)")
    g = C.parse_model_field_from_strings = C.dsl.parse_model_lines(
        model, "proto/model.proto", ["fmllr"], ["lab_mono"],
        ["LSTM_layers", "MLP_layers"])
    assert g.used_archs() == ["LSTM_layers", "MLP_layers"]
    assert g.used_features(["fmllr"]) == ["fmllr"]
    assert [o.op for o in g][:2] == ["compute", "compute"]


def test_parse_model_lines_errors():
    with pytest.raises(C.ConfigError):  # unknown arch
        C.dsl.parse_model_lines("out=compute(NoArch,fmllr)\nloss_final=cost_nll(out,lab)\nerr_final=cost_err(out,lab)",
                                "proto/model.proto", ["fmllr"], ["lab"], ["A"])
    with pytest.raises(C.ConfigError):  # input not defined yet
        C.dsl.parse_model_lines("out=compute(A,nope)\nloss_final=cost_nll(out,lab)\nerr_final=cost_err(out,lab)",
                                "proto/model.proto", ["fmllr"], ["lab"], ["A"])
    with pytest.raises(C.ConfigError):  # missing loss_final
        C.dsl.parse_model_lines("out=compute(A,fmllr)\nerr_final=cost_err(out,lab)",
                                "proto/model.proto", ["fmllr"], ["lab"], ["A"])
    with pytest.raises(C.ConfigError):  # unknown op
        C.dsl.parse_model_lines("out=frob(A,fmllr)\nloss_final=cost_nll(out,lab)\nerr_final=cost_err(out,lab)",
                                "proto/model.proto", ["fmllr"], ["lab"], ["A"])


def test_cost_gl_three_args():
    g = C.dsl.parse_model_lines(
        "out=compute(A,fmllr)\nloss_gl=cost_gl(out,0.1,8)\n"
        "loss_final=cost_nll(out,lab)\nerr_final=cost_err(out,lab)",
        "proto/model.proto", ["fmllr"], ["lab"], ["A"])
    gl = [o for o in g if o.op == "cost_gl"][0]
    assert gl.inputs == ["out", "0.1", "8"]


# ---------------------------------------------------------------------------
# full config pipeline on synthetic data
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_exp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cfgexp")
    root = str(tmp / "data")
    synth.generate(root, synth.SynthSpec(num_utts=12, num_phones=6,
                                         states_per_phone=2, feat_dim=5))
    out_folder = str(tmp / "exp" / "run1")
    cfg_path = make_synth_cfg(str(tmp / "exp.cfg"), root, out_folder,
                              model="MLP", hidden=32, n_epochs=2, n_chunks=2)
    return cfg_path, out_folder, root


def test_check_cfg_and_generation(synth_exp):
    cfg_path, out_folder, root = synth_exp
    config = configparser.ConfigParser()
    config.read(cfg_path)
    config, name_data, name_arch = C.check_cfg(cfg_path, config, "proto/global.proto")
    assert name_data == ["synth_tr", "synth_dev", "synth_test"]
    assert name_arch == ["MLP_layers"]
    # N_out_lab_cd substituted with 12 pdfs
    assert config["architecture1"]["dnn_lay"].endswith("12")
    # counts file generated
    counts_path = config["forward"]["normalize_with_counts_from"]
    assert os.path.exists(counts_path)

    C.create_lists(config)
    lsts = glob.glob(os.path.join(out_folder, "exp_files", "train_*ck*.lst"))
    assert len(lsts) == 2 * 2  # 2 epochs x 2 chunks x 1 fea
    # all utterances covered in each epoch
    for ep in ("ep0", "ep1"):
        utts = []
        for lst in glob.glob(os.path.join(out_folder, "exp_files",
                                          "train_*%s*.lst" % ep)):
            utts.extend(line.split()[0] for line in open(lst))
        assert len(utts) == 12 and len(set(utts)) == 12

    C.create_configs(config)
    chunk_cfgs = open(os.path.join(out_folder, "exp_files",
                                   "list_chunks.txt")).read().split()
    # 2 eps x (2 train + 2 valid) + 2 forward
    assert len(chunk_cfgs) == 2 * 4 + 2
    assert all(os.path.exists(c) for c in chunk_cfgs)

    # chunk cfg must carry the chained pretrain files
    cc = configparser.ConfigParser()
    cc.read(chunk_cfgs[1])
    # checkpoints are named by arch *section* like the reference
    # (ref: utils.py:833-834)
    assert cc["architecture1"]["arch_pretrain_file"].endswith(
        "_architecture1.pkl")
    assert cc["exp"]["to_do"] == "train"
    # seed offset: ep0 ck1 => seed+1
    assert int(cc["exp"]["seed"]) == 1234 + 1

    # dict_fea_lab_arch on the chunk cfg
    fea_streams, lab_streams, arch_used = C.dict_fea_lab_arch(cc)
    assert [f.name for f in fea_streams] == ["feats"]
    assert [l.name for l in lab_streams] == ["lab_cd"]
    assert arch_used == {"MLP_layers": "architecture1"}
    assert fea_streams[0].cw_left == 2
    assert fea_streams[0].fea_lst.endswith(".lst")


def test_cli_overrides(synth_exp):
    cfg_path, _, _ = synth_exp
    config = configparser.ConfigParser()
    config.read(cfg_path)
    C.read_args_command_line(["--batches,batch_size_train=64"], config)
    assert config["batches"]["batch_size_train"] == "64"
    C.read_args_command_line(['--dataset1,fea,0,fea_lst="/tmp/new.lst"'], config)
    assert "/tmp/new.lst" in config["dataset1"]["fea"]
    with pytest.raises(C.ConfigError):
        C.read_args_command_line(["--nosection,x=1"], config)
    with pytest.raises(C.ConfigError):
        C.read_args_command_line(["badform"], config)


def test_split_chunks():
    chunks = C.split_chunks(list("abcdefghij"), 3)
    assert sum(chunks, []) == list("abcdefghij")
    assert len(chunks) == 3
