from .synth_cfg import make_synth_cfg
