"""Every record.md CGS design point (ref: cfg/record.md:29-105) exists
as a shipped cfg AND smoke-runs end to end on synthetic data."""
import configparser
import glob
import os

import pytest

from pytorch_kaldi_cgs_tpu.data import synth
from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg
from pytorch_kaldi_cgs_tpu.utils.cgs_suite import DESIGN_POINTS, synth_kwargs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_suite_cfgs_shipped():
    for name in DESIGN_POINTS:
        path = os.path.join(REPO, "cfg", "TIMIT_CGS",
                            "TIMIT_LSTM_fmllr_cgs_%s.cfg" % name)
        assert os.path.exists(path), path
        c = configparser.ConfigParser()
        c.read(path)
        assert c.has_section("architecture1")
        # sparsity/quant fields landed where intended
        p = DESIGN_POINTS[name]
        assert c["architecture1"]["lstm_hcgs"] == str(p.get("hcgs", False))
        if p.get("quant"):
            assert c["architecture1"]["param_quant"] == p["wbits"]
        # the two-phase epoch switches are read from [exp]
        # (config/experiment.py make_chunk_config); anywhere else they
        # silently never fire
        if p.get("guided"):
            assert c.has_option("exp", "apply_guided_ep")
        if p.get("apply_pattern_ep"):
            assert c.has_option("exp", "apply_pattern_ep")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cgs_suite")
    root = str(tmp / "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=12, num_phones=4, states_per_phone=2, feat_dim=8,
        min_len=24, max_len=48, noise=0.4, seed=9))
    return tmp, root


@pytest.mark.parametrize("name", sorted(DESIGN_POINTS))
def test_design_point_smoke(synth_root, name):
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp
    tmp, root = synth_root
    kw = synth_kwargs(name)
    n_ep = 2 if kw.get("guided") else 1
    out = str(tmp / ("exp_" + name))
    cfg = make_synth_cfg(str(tmp / (name + ".cfg")), root, out,
                         hidden=16, n_epochs=n_ep, n_chunks=1, batch_size=4,
                         lmwt_sweep=False, **kw)
    run_exp(cfg)
    infos = sorted(glob.glob(os.path.join(out, "exp_files", "train_*.info")))
    assert infos, name
    c = configparser.ConfigParser()
    c.read(infos[-1])
    assert float(c["results"]["loss"]) == float(c["results"]["loss"])  # finite
