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
lstm_drop = 0.0,0.0
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


def make_synth_cfg(cfg_path: str, data_root: str, out_folder: str,
                   model: str = "MLP", hidden: int = 128, n_epochs: int = 2,
                   n_chunks: int = 2, batch_size: int = 128, lr: float = 0.08,
                   opt: str = "sgd", cw: int = 2, seed: int = 1234,
                   hcgs: bool = False, hcgs_block: str = "32,4",
                   hcgs_sparse: str = "25,50", quant: bool = False,
                   param_quant: str = "8", quant_inp: bool = False,
                   inp_quant: int = 16, lmwt_sweep: bool = True,
                   extra_arch_lines: Optional[str] = None) -> str:
    """Create <cfg_path> wiring the synthetic dataset at ``data_root``
    into a train/valid/forward experiment with the given flagship arch
    (MLP: direct softmax output; LSTM: LSTM + MLP softmax head)."""
    if model == "MLP":
        arch1 = _ARCH_TEMPLATES["MLP"].format(hidden=hidden) + _OPT.format(lr=lr, opt=opt)
        arch1 += _SPARSITY_MLP.format(hcgs=hcgs, hcgs_block=hcgs_block,
                                      hcgs_sparse=hcgs_sparse, quant=quant,
                                      param_quant=param_quant, quant_inp=quant_inp,
                                      inp_quant=inp_quant)
        arch_secs = "[architecture1]\n" + arch1
        model_field = """model = out_dnn1=compute(MLP_layers,feats)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)"""
        forward_out = "out_dnn1"
        seq_flag = "False"
    elif model == "LSTM":
        arch1 = _ARCH_TEMPLATES["LSTM"].format(hidden=hidden) + _OPT.format(lr=lr, opt=opt)
        arch1 += _SPARSITY_LSTM.format(hcgs=hcgs, hcgs_block=hcgs_block,
                                       hcgs_sparse=hcgs_sparse, quant=quant,
                                       param_quant=param_quant, quant_inp=quant_inp,
                                       inp_quant=inp_quant)
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
    else:
        raise ValueError("unknown flagship model %r" % model)

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
\tlab_graph={root}/graph
N_chunks = {n_chunks}
""".format(idx=idx, name=name, root=data_root, split=split, cw=cw,
           n_chunks=n_chunks)

    cfg = """[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = {out_folder}
seed = {seed}
use_cuda = False
multi_gpu = False
save_gpumem = False
N_epochs_tr = {n_epochs}

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
""".format(scoring_opts="--min-lmwt 1 --max-lmwt 10" if lmwt_sweep
           else "--min-lmwt 5 --max-lmwt 5",
           out_folder=out_folder, seed=seed, n_epochs=n_epochs,
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
