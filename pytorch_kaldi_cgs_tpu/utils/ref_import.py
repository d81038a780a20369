"""Import reference (pytorch-kaldi-CGS) checkpoints and weight dumps.

The reference persists models as ``{'model_par': state_dict,
'optimizer_par': ...}`` torch pickles (ref: core.py:317-318, loaded by
run_test.py:182-196), and ships raw LSTM weight dumps under
``model_file/*.mat`` — which despite the extension are *Kaldi binary
matrices* written by ``data_io.write_mat`` (ref: neural_networks.py:
1067-1076, commented write_mat hooks).

This module maps those artifacts into our functional variable pytrees
(``{"params", "state", "masks"}``) so reference-trained models run
unchanged on TPU, and so parity tests can assert our forward equals the
reference's torch forward from identical weights.

Name mapping (reference nn.ModuleList state_dict -> our flat params):

  MLP     wx.{i}.weight -> w{i}      wx.{i}.bias -> b{i}
          ln.{i}.gamma/beta -> ln{i} bn.{i}.* -> bn{i} (+ state)
          hcgs.{i}.mask -> masks[hcgs_w{i}]
          ghcgs.{i}.mask -> masks[ghcgs_w{i}]
  RNNs    {gate}.{i}.weight -> {gate}{i}   {gate}.{i}.bias -> {gate}_b{i}
          bn_{g}.{i}.* -> bn_{g}{i}   ln.{i} -> ln{i}
          hcgsx.{i}.mask -> masks[hcgs_{gx}{i}] for every x-gate gx
          hcgsh.{i}.mask -> masks[hcgs_{gh}{i}] for every h-gate gh
          ghcgs_{g}.{i}.mask -> masks[ghcgs_{g}{i}]
  cudnn   {rnn}.0.weight_ih_l{i}[_reverse] -> w_ih_l{i}[_r], same for
          weight_hh/bias_ih/bias_hh
  both    ln0.gamma/beta -> ln0, bn0.* -> bn0 (+ state)
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Mapping

import numpy as np

from ..data.kaldi_io import read_mat


# ---------------------------------------------------------------------------
# raw artifacts
# ---------------------------------------------------------------------------

def load_kaldi_weight_dir(dirpath: str) -> Dict[str, np.ndarray]:
    """Read every Kaldi-binary matrix dump in a directory (the
    reference's ``model_file/`` layout: wfx/wix/wox/wcx, ufh/uih/uoh/uch,
    x, hiddens0, c_init, h_init)."""
    out = {}
    for fn in sorted(os.listdir(dirpath)):
        if not fn.endswith(".mat"):
            continue
        out[fn[:-4]] = read_mat(os.path.join(dirpath, fn))
    return out


def load_ref_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``final_*.pkl`` / chunk checkpoint and return the
    model state_dict as {name: numpy array}. Uses torch when available
    (reference pickles contain torch.Tensor leaves)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError("importing reference .pkl checkpoints requires "
                          "torch (cpu) to unpickle tensors") from e
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_par", ckpt)
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# state_dict -> variables
# ---------------------------------------------------------------------------

def _as_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _put_norms(sd: Mapping[str, Any], params: Dict, state: Dict,
               src: str, dst: str) -> None:
    """Copy one LayerNorm (gamma/beta) or BatchNorm1d
    (weight/bias/running_*) module's entries if present."""
    if src + ".gamma" in sd:
        params[dst] = {"gamma": _as_np(sd[src + ".gamma"]),
                       "beta": _as_np(sd[src + ".beta"])}
    elif src + ".weight" in sd:
        params[dst] = {"gamma": _as_np(sd[src + ".weight"]),
                       "beta": _as_np(sd[src + ".bias"])}
        state[dst] = {"mean": _as_np(sd[src + ".running_mean"]),
                      "var": _as_np(sd[src + ".running_var"])}


def ref_state_dict_to_variables(sd: Mapping[str, Any], model) -> Dict[str, Any]:
    """Convert a reference state_dict into ``model``'s variable pytree.

    ``model`` is one of our AcousticModel instances (MLP, LSTM, GRU,
    liGRU, minimalGRU, RNN, or a cudnn-class wrapper). Starts from
    ``model.init(0)`` so every always-present leaf exists, then
    overwrites the ones the reference provides.
    """
    variables = model.init(0)
    params, state, masks = (variables["params"], variables["state"],
                            variables["masks"])
    cls = type(model).__name__

    _put_norms(sd, params, state, "ln0", "ln0")
    _put_norms(sd, params, state, "bn0", "bn0")

    if cls == "MLP":
        for i in range(model.N):
            w = sd.get("wx.%d.weight" % i)
            if w is None:
                continue
            params["w%d" % i] = _as_np(w)
            b = sd.get("wx.%d.bias" % i)
            # our MLP always carries b{i}; ref omits it under norms
            params["b%d" % i] = (_as_np(b) if b is not None else
                                 np.zeros(model.dnn_lay[i], np.float32))
            _put_norms(sd, params, state, "ln.%d" % i, "ln%d" % i)
            _put_norms(sd, params, state, "bn.%d" % i, "bn%d" % i)
            if "hcgs.%d.mask" % i in sd:
                masks["hcgs_w%d" % i] = _as_np(sd["hcgs.%d.mask" % i])
            if "ghcgs.%d.mask" % i in sd:
                masks["ghcgs_w%d" % i] = _as_np(sd["ghcgs.%d.mask" % i])
        return variables

    if cls in ("CNN", "SincNet"):
        # ref conv stacks: conv.{i} (SincNet's conv.0 is SincConv with
        # low_hz_/band_hz_ parameters instead of weight/bias,
        # ref: neural_networks.py:2315-2317)
        for i in range(model.Nl):
            w = sd.get("conv.%d.weight" % i)
            if w is not None:
                params["conv_w%d" % i] = _as_np(w)
            b = sd.get("conv.%d.bias" % i)
            if b is not None:
                params["conv_b%d" % i] = _as_np(b)
            _put_norms(sd, params, state, "ln.%d" % i, "ln%d" % i)
            _put_norms(sd, params, state, "bn.%d" % i, "bn%d" % i)
        if "conv.0.low_hz_" in sd:
            params["sinc_low_hz"] = _as_np(sd["conv.0.low_hz_"])
            params["sinc_band_hz"] = _as_np(sd["conv.0.band_hz_"])
        return variables

    if hasattr(model, "gates_x"):       # custom recurrent family
        for i in range(model.N):
            for g in model.gates_x + model.gates_h:
                w = sd.get("%s.%d.weight" % (g, i))
                if w is not None:
                    params["%s%d" % (g, i)] = _as_np(w)
                b = sd.get("%s.%d.bias" % (g, i))
                if b is not None:
                    params["%s_b%d" % (g, i)] = _as_np(b)
            for g in model.bn_gates:
                _put_norms(sd, params, state, "bn_%s.%d" % (g, i),
                           "bn_%s%d" % (g, i))
            _put_norms(sd, params, state, "ln.%d" % i, "ln%d" % i)
            if "hcgsx.%d.mask" % i in sd:
                for g in model.gates_x:
                    masks["hcgs_%s%d" % (g, i)] = _as_np(
                        sd["hcgsx.%d.mask" % i]).copy()
            if "hcgsh.%d.mask" % i in sd:
                for g in model.gates_h:
                    masks["hcgs_%s%d" % (g, i)] = _as_np(
                        sd["hcgsh.%d.mask" % i]).copy()
            for g in model.gates_x + model.gates_h:
                k = "ghcgs_%s.%d.mask" % (g, i)
                if k in sd:
                    masks["ghcgs_%s%d" % (g, i)] = _as_np(sd[k])
        return variables

    if hasattr(model, "n_gates"):       # cudnn-class wrappers
        # reference wraps one nn.LSTM/GRU/RNN in a ModuleList at index 0
        # (ref: neural_networks.py:377,413,447)
        pfx = {"LSTM_cudnn": "lstm", "GRU_cudnn": "gru",
               "RNN_cudnn": "rnn"}[cls]
        for i in range(model.num_layers):
            for d in ("", "_reverse"):
                sfx_ref = "l%d%s" % (i, d)
                sfx_our = "l%d%s" % (i, "_r" if d else "")
                for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    k = "%s.0.%s_%s" % (pfx, kind, sfx_ref)
                    if k in sd:
                        our = "%s_%s" % (kind.replace("weight", "w")
                                         .replace("bias", "b"), sfx_our)
                        params[our] = _as_np(sd[k])
        return variables

    raise TypeError("don't know how to import into %s" % cls)


def variables_from_ref_pkl(path: str, model) -> Dict[str, Any]:
    """One-call import: reference checkpoint file -> our variables."""
    return ref_state_dict_to_variables(load_ref_checkpoint(path), model)


# ---------------------------------------------------------------------------
# model_file/ convenience: the shipped dumps are a 1-layer 440->512 LSTM
# ---------------------------------------------------------------------------

def lstm_variables_from_weight_dir(dirpath: str, model) -> Dict[str, Any]:
    """Load the reference ``model_file/`` LSTM dump into ``model``
    (a 1-layer LSTM whose lay[0] matches the dump's hidden size)."""
    mats = load_kaldi_weight_dir(dirpath)
    variables = model.init(0)
    params = variables["params"]
    for g in ("wfx", "wix", "wox", "wcx", "ufh", "uih", "uoh", "uch"):
        if g in mats:
            params[g + "0"] = mats[g].astype(np.float32)
    return variables
