"""Acoustic model zoo — the classes named by ``arch_class`` in configs
(ref: neural_networks.py; class registry contract README.md:559-577).

Configs reference models as ``arch_library=pytorch_kaldi_cgs_tpu.models``
+ ``arch_class=<name>``; the runtime resolves them via
:func:`get_model_class` (importlib fallback for user libraries, like the
reference's dynamic import at utils.py:1762-1778).
"""

from .base import AcousticModel, CompressionSpec
from .mlp import MLP
from .recurrent import (GRU, LSTM, RNN, GRU_cudnn, LSTM_cudnn, RNN_cudnn,
                        liGRU, minimalGRU)
from .cnn import CNN, SincNet
from .sru import SRU
from . import layers

_REGISTRY = {
    "MLP": MLP,
    "LSTM": LSTM,
    "GRU": GRU,
    "liGRU": liGRU,
    "minimalGRU": minimalGRU,
    "RNN": RNN,
    "CNN": CNN,
    "SincNet": SincNet,
    "SRU": SRU,
    "LSTM_cudnn": LSTM_cudnn,
    "GRU_cudnn": GRU_cudnn,
    "RNN_cudnn": RNN_cudnn,
}


def get_model_class(arch_library: str, arch_class: str):
    """Resolve an architecture class: built-in registry first, then
    importlib over ``arch_library`` (so user model libraries keep working
    the way the reference allows, ref: utils.py:1762-1778)."""
    if arch_class in _REGISTRY and arch_library in (
            "pytorch_kaldi_cgs_tpu.models", "neural_networks", "models", ""):
        return _REGISTRY[arch_class]
    import importlib
    mod = importlib.import_module(arch_library)
    return getattr(mod, arch_class)
