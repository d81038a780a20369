"""CI-sized slice of the CGS accuracy curve (VERDICT r4 item 1 'done
when'): on the capacity-discriminating hard corpus, dense must beat the
64x design point with margin. The full 10-point curve lives in
RESULTS.md (examples/cgs_curve.py); this pins the discriminating
property itself so a mask/quant regression that silently flattens the
curve fails CI. (The round-4 goldens could not fail this way: their
easy corpus scored 0.0 PER at every compression.)"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))


@pytest.fixture(scope="module")
def hard_root(tmp_path_factory):
    from pytorch_kaldi_cgs_tpu.data import synth
    root = str(tmp_path_factory.mktemp("hard") / "data")
    synth.generate(root, synth.SynthSpec(
        hard=True, num_phones=24, states_per_phone=2, feat_dim=24,
        num_utts=72, min_len=50, max_len=120, seed=77),
        splits={"train": 72, "dev": 16, "test": 16})
    return root


def _run(root, tmp_path, name, **kw):
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg
    out = str(tmp_path / ("exp_" + name))
    cfg = make_synth_cfg(str(tmp_path / (name + ".cfg")), root, out,
                         model="LSTM", hidden=256, n_epochs=3, n_chunks=1,
                         batch_size=16, lr=0.008, opt="rmsprop", cw=0,
                         lmwt_sweep=False, seed=1234, **kw)
    results = run_exp(cfg)
    return min(v for k, v in results.items() if k.startswith("wer_"))


def test_dense_beats_64x_with_margin(hard_root, tmp_path):
    """The one ordering claim cheap enough for CI: dense PER must be
    far below the 64x-compressed point (ref record.md: 16.4 vs 35.5).
    Blocks 32,8 at 256 wide = the reference's 8-blocks-per-row grid."""
    dense = _run(hard_root, tmp_path, "dense")
    sparse = _run(hard_root, tmp_path, "hcgs64",
                  hcgs=True, hcgs_block="32,8", hcgs_sparse="87.5,87.5",
                  quant=True, param_quant="8,8", quant_inp=True,
                  inp_quant=16)
    assert dense < 45.0, "dense failed to learn the hard corpus"
    assert sparse > dense + 10.0, (
        "64x compression should cost real accuracy on the hard corpus "
        "(dense %.2f vs 64x %.2f)" % (dense, sparse))
