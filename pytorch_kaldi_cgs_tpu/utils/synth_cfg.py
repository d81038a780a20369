"""Write a complete experiment config (same INI dialect as the reference
cfgs, e.g. cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_hcgs.cfg) that points at a
generated synthetic dataset. Used by tests, the end-to-end example and
the benchmark harness."""

from __future__ import annotations

import os
from typing import Dict, Optional


_ARCH_TEMPLATES: Dict[str, str] = {
    "MLP": """\
arch_name = MLP_layers
arch_proto = proto/MLP.proto
arch_library = pytorch_kaldi_cgs_tpu.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = {hidden},{hidden},N_out_lab_cd
dnn_drop = 0.1,0.1,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = False,False,False
dnn_use_laynorm = True,True,False
dnn_act = relu,relu,softmax
""",
    "LSTM": """\
arch_name = LSTM_layers
arch_proto = proto/LSTM.proto
arch_library = pytorch_kaldi_cgs_tpu.models
arch_class = LSTM
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
lstm_lay = {hidden},{hidden}
lstm_drop = {drop},{drop}
lstm_use_laynorm_inp = False
lstm_use_batchnorm_inp = False
lstm_use_laynorm = False,False
lstm_use_batchnorm = True,True
lstm_bidir = False
lstm_act = tanh,tanh
lstm_orthinit = True
""",
}

_OPT = """\
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = {opt}
opt_momentum = 0.0
opt_alpha = 0.95
opt_eps = 1e-8
opt_centered = False
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
opt_betas = 0.9,0.999
opt_amsgrad = False
"""

_SPARSITY_MLP = """\
mlp_hcgs = {hcgs}
guided_hcgs = False
apply_guided_hcgs = False
hcgs_block = {hcgs_block}
hcgs_sparse = {hcgs_sparse}
mlp_quant = {quant}
param_quant = {param_quant}
mlp_quant_inp = {quant_inp}
inp_quant = {inp_quant}
mlp_prune = False
mlp_prune_perc = 50
skip_regularization = True
"""

_SPARSITY_LSTM = """\
lstm_hcgs = {hcgs}
guided_hcgs = False
apply_guided_hcgs = False
hcgsx_block = {hcgs_block}
hcgsx_sparse = {hcgs_sparse}
hcgsh_block = {hcgs_block}
hcgsh_sparse = {hcgs_sparse}
lstm_quant = {quant}
param_quant = {param_quant}
lstm_quant_inp = {quant_inp}
inp_quant = {inp_quant}
lstm_prune = False
lstm_prune_perc = 50
skip_regularization = True
"""


_RNN_TEMPLATE = """\
arch_name = {cls}_layers
arch_proto = proto/{proto}.proto
arch_library = pytorch_kaldi_cgs_tpu.models
arch_class = {cls}
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
{p}_lay = {hidden},{hidden}
{p}_drop = 0.0,0.0
{p}_use_laynorm_inp = False
{p}_use_batchnorm_inp = False
{p}_use_laynorm = False,False
{p}_use_batchnorm = True,True
{p}_bidir = False
{p}_act = {act},{act}
{p}_orthinit = True
"""


def make_synth_cfg(cfg_path: str, data_root: str, out_folder: str,
                   model: str = "MLP", hidden: int = 128, n_epochs: int = 2,
                   n_chunks: int = 2, batch_size: int = 128, lr: float = 0.08,
                   opt: str = "sgd", cw: int = 2, seed: int = 1234,
                   hcgs: bool = False, hcgs_block: str = "32,4",
                   hcgs_sparse: str = "25,50", quant: bool = False,
                   param_quant: str = "8", quant_inp: bool = False,
                   inp_quant: int = 16, lmwt_sweep: bool = True,
                   guided: bool = False, apply_guided_ep: Optional[int] = None,
                   pattern: bool = False, pattern_shape: str = "4,4",
                   pattern_nnz: int = 4, pattern_num: int = 8,
                   apply_pattern_ep: Optional[int] = None,
                   drop: float = 0.0,
                   multitask_mono: bool = False,
                   multi_gpu: bool = False, model_parallel: int = 1,
                   seq_parallel: int = 1,
                   scoring_recipe: Optional[str] = None,
                   extra_arch_lines: Optional[str] = None) -> str:
    """Create <cfg_path> wiring the synthetic dataset at ``data_root``
    into a train/valid/forward experiment with the given flagship arch
    (MLP: direct softmax output; LSTM: LSTM + MLP softmax head)."""
    extra_sparsity = ""
    if guided:
        extra_sparsity += "guided_hcgs = True\n"
    if pattern:
        extra_sparsity += ("if_pattern = True\npattern_mode = pattern\n"
                           "pattern_shape = %s\npattern_nnz = %d\n"
                           "pattern_num = %d\n" % (pattern_shape, pattern_nnz,
                                                    pattern_num))

    def _fix_guided(block: str) -> str:
        if guided:
            block = block.replace("guided_hcgs = False", "", 1)
        return block + extra_sparsity

    if model == "MLP":
        arch1 = _ARCH_TEMPLATES["MLP"].format(hidden=hidden) + _OPT.format(lr=lr, opt=opt)
        arch1 += _fix_guided(_SPARSITY_MLP.format(hcgs=hcgs, hcgs_block=hcgs_block,
                                      hcgs_sparse=hcgs_sparse, quant=quant,
                                      param_quant=param_quant, quant_inp=quant_inp,
                                      inp_quant=inp_quant))
        arch_secs = "[architecture1]\n" + arch1
        model_field = """model = out_dnn1=compute(MLP_layers,feats)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)"""
        forward_out = "out_dnn1"
        seq_flag = "False"
    elif model == "LSTM":
        arch1 = _ARCH_TEMPLATES["LSTM"].format(hidden=hidden, drop=drop) \
            + _OPT.format(lr=lr, opt=opt)
        arch1 += _fix_guided(_SPARSITY_LSTM.format(hcgs=hcgs, hcgs_block=hcgs_block,
                                       hcgs_sparse=hcgs_sparse, quant=quant,
                                       param_quant=param_quant, quant_inp=quant_inp,
                                       inp_quant=inp_quant))
        arch2 = ("arch_name = MLP_out\narch_proto = proto/MLP.proto\n"
                 "arch_library = pytorch_kaldi_cgs_tpu.models\narch_class = MLP\n"
                 "arch_pretrain_file = none\narch_freeze = False\n"
                 "arch_seq_model = False\n"
                 "dnn_lay = N_out_lab_cd\ndnn_drop = 0.0\n"
                 "dnn_use_laynorm_inp = False\ndnn_use_batchnorm_inp = False\n"
                 "dnn_use_batchnorm = False\ndnn_use_laynorm = False\n"
                 "dnn_act = softmax\n") + _OPT.format(lr=lr, opt=opt)
        arch_secs = "[architecture1]\n" + arch1 + "\n[architecture2]\n" + arch2
        model_field = """model = out_rnn=compute(LSTM_layers,feats)
\tout_dnn1=compute(MLP_out,out_rnn)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)"""
        forward_out = "out_dnn1"
        seq_flag = "True"
    elif model in ("GRU", "liGRU", "minimalGRU", "RNN"):
        prefix = {"GRU": "gru", "liGRU": "ligru",
                  "minimalGRU": "minimalgru", "RNN": "rnn"}[model]
        proto = {"GRU": "GRU", "liGRU": "liGRU",
                 "minimalGRU": "minimalGRU", "RNN": "RNN"}[model]
        act = "relu" if model == "liGRU" else "tanh"
        arch1 = _RNN_TEMPLATE.format(cls=model, proto=proto, p=prefix,
                                     hidden=hidden, act=act)
        arch1 += _OPT.format(lr=lr, opt=opt) + "skip_regularization = True\n"
        arch2 = ("arch_name = MLP_out\narch_proto = proto/MLP.proto\n"
                 "arch_library = pytorch_kaldi_cgs_tpu.models\narch_class = MLP\n"
                 "arch_pretrain_file = none\narch_freeze = False\n"
                 "arch_seq_model = False\n"
                 "dnn_lay = N_out_lab_cd\ndnn_drop = 0.0\n"
                 "dnn_use_laynorm_inp = False\ndnn_use_batchnorm_inp = False\n"
                 "dnn_use_batchnorm = False\ndnn_use_laynorm = False\n"
                 "dnn_act = softmax\n") + _OPT.format(lr=lr, opt=opt)
        arch_secs = "[architecture1]\n" + arch1 + "\n[architecture2]\n" + arch2
        model_field = """model = out_rnn=compute(%s_layers,feats)
\tout_dnn1=compute(MLP_out,out_rnn)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)""" % model
        forward_out = "out_dnn1"
        seq_flag = "True"
    elif model == "SRU":
        arch1 = ("arch_name = SRU_layers\narch_proto = proto/SRU.proto\n"
                 "arch_library = pytorch_kaldi_cgs_tpu.models\n"
                 "arch_class = SRU\narch_pretrain_file = none\n"
                 "arch_freeze = False\narch_seq_model = True\n"
                 "sru_hidden_size = %d\nsru_num_layers = 2\n"
                 "sru_dropout = 0.1\nsru_rnn_dropout = 0.1\n"
                 "sru_use_tanh = True\nsru_use_relu = False\n"
                 "sru_use_selu = False\nsru_weight_norm = False\n"
                 "sru_layer_norm = True\nsru_bidirectional = False\n"
                 "sru_is_input_normalized = True\nsru_has_skip_term = True\n"
                 "sru_rescale = False\nsru_highway_bias = -1.0\n"
                 "sru_n_proj = 0\n" % hidden) + _OPT.format(lr=lr, opt=opt)
        arch2 = ("arch_name = MLP_out\narch_proto = proto/MLP.proto\n"
                 "arch_library = pytorch_kaldi_cgs_tpu.models\narch_class = MLP\n"
                 "arch_pretrain_file = none\narch_freeze = False\n"
                 "arch_seq_model = False\n"
                 "dnn_lay = N_out_lab_cd\ndnn_drop = 0.0\n"
                 "dnn_use_laynorm_inp = False\ndnn_use_batchnorm_inp = False\n"
                 "dnn_use_batchnorm = False\ndnn_use_laynorm = False\n"
                 "dnn_act = softmax\n") + _OPT.format(lr=lr, opt=opt)
        arch_secs = "[architecture1]\n" + arch1 + "\n[architecture2]\n" + arch2
        model_field = """model = out_rnn=compute(SRU_layers,feats)
\tout_dnn1=compute(MLP_out,out_rnn)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)"""
        forward_out = "out_dnn1"
        seq_flag = "True"
    else:
        raise ValueError("unknown flagship model %r" % model)

    # multitask mono head: cd + weighted mono loss (the reference
    # flagship wiring, cfg/TIMIT_CGS/*.cfg [model])
    if multitask_mono and model != "MLP":
        arch3 = ("arch_name = MLP_mono\narch_proto = proto/MLP.proto\n"
                 "arch_library = pytorch_kaldi_cgs_tpu.models\narch_class = MLP\n"
                 "arch_pretrain_file = none\narch_freeze = False\n"
                 "arch_seq_model = False\n"
                 "dnn_lay = N_out_lab_mono\ndnn_drop = 0.0\n"
                 "dnn_use_laynorm_inp = False\ndnn_use_batchnorm_inp = False\n"
                 "dnn_use_batchnorm = False\ndnn_use_laynorm = False\n"
                 "dnn_act = softmax\n") + _OPT.format(lr=lr, opt=opt)
        arch_secs += "\n[architecture3]\n" + arch3
        model_field = model_field.replace(
            "\tloss_final=cost_nll(out_dnn1,lab_cd)",
            "\tout_mono=compute(MLP_mono,out_rnn)\n"
            "\tloss_mono=cost_nll(out_mono,lab_mono)\n"
            "\tloss_mono_w=mult_constant(loss_mono,1.0)\n"
            "\tloss_cd=cost_nll(out_dnn1,lab_cd)\n"
            "\tloss_final=sum(loss_cd,loss_mono_w)")

    if extra_arch_lines:
        arch_secs += "\n" + extra_arch_lines

    def dataset_block(idx: int, name: str, split: str) -> str:
        return """[dataset{idx}]
data_name = {name}
fea = fea_name=feats
\tfea_lst={root}/{split}/feats.scp
\tfea_opts=add-deltas --delta-order=0 ark:- ark:- |
\tcw_left={cw}
\tcw_right={cw}
lab = lab_name=lab_cd
\tlab_folder={root}/{split}_ali
\tlab_opts=ali-to-pdf
\tlab_count_file=auto
\tlab_data_folder={root}/{split}/
\tlab_graph={root}/graph{mono}
N_chunks = {n_chunks}
""".format(idx=idx, name=name, root=data_root, split=split, cw=cw,
           n_chunks=n_chunks,
           mono=("\n\n\tlab_name=lab_mono"
                 "\n\tlab_folder={root}/{split}_ali"
                 "\n\tlab_opts=ali-to-phones --per-frame=true"
                 "\n\tlab_count_file=none"
                 "\n\tlab_data_folder={root}/{split}/"
                 "\n\tlab_graph={root}/graph").format(
                     root=data_root, split=split) if multitask_mono else "")

    cfg = """[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = {out_folder}
seed = {seed}
use_cuda = False
multi_gpu = {multi_gpu}
model_parallel = {model_parallel}
seq_parallel = {seq_parallel}
save_gpumem = False
N_epochs_tr = {n_epochs}{guided_ep}

{ds1}
{ds2}
{ds3}
[data_use]
train_with = synth_tr
valid_with = synth_dev
forward_with = synth_test

[batches]
batch_size_train = {batch_size}
max_seq_length_train = 400
increase_seq_length_train = False
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = {batch_size}
max_seq_length_valid = 400

{arch_secs}

[model]
model_proto = proto/model.proto
{model_field}

[forward]
forward_out = {forward_out}
normalize_posteriors = True
normalize_with_counts_from = lab_cd
save_out_file = False
require_decoding = True

[decoding]
decoding_script_folder = {decode_folder}
decoding_script = decode_dnn.sh
decoding_proto = proto/decoding.proto
min_active = 200
max_active = 7000
max_mem = 50000000
beam = 13.0
latbeam = 8.0
acwt = 0.2
max_arcs = -1
skip_scoring = false
scoring_opts = "{scoring_opts}"
norm_vars = False
{recipe_line}""".format(
           recipe_line=("scoring_recipe = %s\n" % scoring_recipe)
           if scoring_recipe else "",scoring_opts="--min-lmwt 1 --max-lmwt 10" if lmwt_sweep
           else "--min-lmwt 5 --max-lmwt 5",
           guided_ep=("\napply_guided_ep = %d" % apply_guided_ep
                      if apply_guided_ep is not None else "")
           + ("\napply_pattern_ep = %d" % apply_pattern_ep
              if apply_pattern_ep is not None else ""),
           out_folder=out_folder, seed=seed, n_epochs=n_epochs,
           multi_gpu=multi_gpu, model_parallel=model_parallel,
           seq_parallel=seq_parallel,
           ds1=dataset_block(1, "synth_tr", "train"),
           ds2=dataset_block(2, "synth_dev", "dev"),
           ds3=dataset_block(3, "synth_test", "test"),
           batch_size=batch_size, arch_secs=arch_secs,
           model_field=model_field, forward_out=forward_out,
           decode_folder=data_root)

    os.makedirs(os.path.dirname(os.path.abspath(cfg_path)), exist_ok=True)
    with open(cfg_path, "w") as f:
        f.write(cfg)
    return cfg_path
