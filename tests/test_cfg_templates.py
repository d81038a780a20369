"""Every shipped experiment template validates against the typed proto
schema: all mandatory fields present, every field typechecks. Path
fields are skipped (templates carry $TIMIT/$LIBRI placeholders), and
N_out_lab_* placeholders are skipped (resolved by check_cfg at run
time from the alignment dir, ref: utils.py:628-640)."""
import configparser
import glob
import os

import pytest

from pytorch_kaldi_cgs_tpu.config.proto import (check_field, expand_section,
                                                resolve_proto)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = sorted(glob.glob(os.path.join(REPO, "cfg", "*", "*.cfg")))


def test_templates_exist():
    names = {os.path.basename(p) for p in CFGS}
    # the reference baseline families (README.md:207-216, :745-754) and
    # the BASELINE.json config list all have a shipped template
    for req in ("TIMIT_MLP_mfcc.cfg", "TIMIT_MLP_fbank.cfg",
                "TIMIT_MLP_fmllr.cfg", "TIMIT_LSTM_fmllr.cfg",
                "TIMIT_GRU_fmllr.cfg", "TIMIT_liGRU_fmllr.cfg",
                "TIMIT_RNN_fmllr.cfg", "TIMIT_CNN_fbank.cfg",
                "TIMIT_SincNet_raw.cfg", "TIMIT_SincNet_raw_LSTM_quant.cfg",
                "TIMIT_liGRU_fmllr_hcgs.cfg", "libri_liGRU_fmllr.cfg",
                "libri_GRU_hcgs_multihost.cfg"):
        assert req in names, req


@pytest.mark.parametrize("cfg_path", CFGS, ids=os.path.basename)
def test_template_validates(cfg_path):
    config = configparser.ConfigParser()
    assert config.read(cfg_path), cfg_path
    proto = configparser.ConfigParser()
    proto.read(resolve_proto(config["cfg_proto"]["cfg_proto"]))
    proto, _, _ = expand_section(proto, config)
    for sec in proto.sections():
        assert any(sec in s for s in config.sections()), \
            "%s lacks section [%s]" % (cfg_path, sec)
        for field, ftype in proto.items(sec):
            assert field in config[sec], \
                "%s lacks [%s] %s" % (cfg_path, sec, field)
            val = config[sec][field]
            if ftype == "path" or "$" in val or "N_out_lab" in val:
                continue
            check_field(val, ftype, field)

    # the [model] DSL lines reference declared archs and feature names
    arch_names = {config[s]["arch_name"] for s in config.sections()
                  if "architecture" in s}
    for line in config["model"]["model"].splitlines():
        line = line.strip()
        if "=compute(" in line:
            arch = line.split("compute(")[1].split(",")[0]
            assert arch in arch_names, "%s: unknown arch %r" % (cfg_path, arch)
