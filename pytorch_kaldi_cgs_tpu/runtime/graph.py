"""Computation-graph executor for the model DSL.

The TPU-native replacement for the reference's ``model_init`` +
``forward_model`` pair (ref: utils.py:1749-1830, :1884-2050): given a
chunk config and the loaded chunk layout, instantiate every architecture
the [model] section uses, then execute the DSL ops as one pure jittable
function over the batch tensor.

Differences from the reference, by design:
  * the whole graph (all nets, costs, combinators) traces into ONE XLA
    computation — per-op host dispatch disappears;
  * losses/error are *padding-masked*: the reference grades zero-padded
    frames against class 0 (ref: core.py:186-196 pads, utils.py:1938-1943
    reads labels including the padding); we weight padded frames out.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.dsl import ModelGraph, parse_model_lines
from ..config.proto import strtobool
from ..data.dataset import ChunkData
from ..models import get_model_class

Array = jnp.ndarray


def _masked_mean(values: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.mean(values)
    m = mask.reshape(values.shape)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


class NetGraph:
    """Nets + DSL ops for one chunk config.

    Construction mirrors model_init: walk compute ops in order, resolving
    each architecture's class via arch_library/arch_class and threading
    output dims (ref: utils.py:1762-1803).
    """

    def __init__(self, config, chunk: ChunkData):
        self.config = config
        self.to_do = config["exp"]["to_do"]
        from ..config.experiment import dict_fea_lab_arch
        fea_streams, lab_streams, arch_secs = dict_fea_lab_arch(config)
        # column layout comes from the loaded chunk
        self.fea_cols = {name: (s.col_start, s.col_end)
                         for name, s in chunk.fea_streams.items()}
        self.lab_cols = {name: s.col for name, s in chunk.lab_streams.items()}
        self.arch_secs = arch_secs

        fea_names = list(chunk.fea_streams.keys()) or [f.name for f in fea_streams]
        lab_names = list(chunk.lab_streams.keys()) or [l.name for l in lab_streams]
        self.graph: ModelGraph = parse_model_lines(
            config["model"]["model"], config["model"]["model_proto"],
            fea_names, lab_names, list(arch_secs.keys()))

        self.seq_flags: Dict[str, bool] = {}
        self.nets: Dict[str, Any] = {}
        self.net_order: List[str] = []
        dims: Dict[str, int] = {name: c[1] - c[0] for name, c in self.fea_cols.items()}
        for op in self.graph.ops:
            if op.op == "compute":
                arch, inp = op.inputs
                sec = arch_secs[arch]
                options = dict(config.items(sec))
                options["to_do"] = self.to_do
                options["arch_name"] = options.get("arch_name", arch)
                cls = get_model_class(options["arch_library"], options["arch_class"])
                if arch not in self.nets:
                    net = cls(options, dims[inp])
                    self.nets[arch] = net
                    self.net_order.append(arch)
                self.seq_flags[arch] = strtobool(config[sec]["arch_seq_model"])
                dims[op.out] = self.nets[arch].out_dim
            elif op.op == "concatenate":
                dims[op.out] = dims[op.inputs[0]] + dims[op.inputs[1]]
            else:
                dims[op.out] = 1
        self.dims = dims
        self.freeze = {arch: strtobool(config[arch_secs[arch]]["arch_freeze"])
                       for arch in self.nets}

    # ------------------------------------------------------------------
    def init_variables(self, seed: int) -> Dict[str, Any]:
        vs = {}
        for i, arch in enumerate(self.net_order):
            vs[arch] = self.nets[arch].init(seed + i)
        return vs

    # ------------------------------------------------------------------
    def forward(self, variables: Dict[str, Any], inp: Array, *,
                train: bool, rng=None, frame_mask: Optional[Array] = None,
                forward_outs: Optional[List[str]] = None
                ) -> Tuple[Dict[str, Array], Dict[str, Any]]:
        """Execute the DSL over one batch tensor.

        inp: (T, B, C) for sequential chunks or (N, C) for flat chunks,
        where C = fea columns + label columns. frame_mask: (T, B) with 1
        on real frames (None = all real).
        """
        outs: Dict[str, Array] = {}
        new_states: Dict[str, Any] = {}
        if rng is None:
            rng = jax.random.PRNGKey(0)
        is_seq_batch = inp.ndim == 3
        if is_seq_batch:
            T, B = inp.shape[0], inp.shape[1]
        for name, (c0, c1) in self.fea_cols.items():
            outs[name] = inp[..., c0:c1]

        def labels_for(lab_name):
            lab = inp[..., self.lab_cols[lab_name]]
            return lab.reshape(-1).astype(jnp.int32)

        to_do = self.to_do
        for op in self.graph.ops:
            if op.op == "compute":
                arch, src = op.inputs
                x = outs[src]
                seq = self.seq_flags[arch]
                if x.ndim == 3 and not seq:
                    x = x.reshape(x.shape[0] * x.shape[1], x.shape[2])
                elif x.ndim == 2 and seq and is_seq_batch:
                    x = x.reshape(T, B, -1)
                rng, sub = jax.random.split(rng)
                net_train = train and not self.freeze[arch]
                y, st = self.nets[arch].apply(variables[arch], x,
                                              train=net_train, rng=sub)
                new_states[arch] = st
                outs[op.out] = y
            elif op.op == "concatenate":
                outs[op.out] = jnp.concatenate(
                    [outs[op.inputs[0]], outs[op.inputs[1]]], axis=-1)
            elif op.op == "cost_nll":
                if to_do == "forward":
                    continue
                out = outs[op.inputs[0]]
                logp = out.reshape(-1, out.shape[-1])
                lab = labels_for(op.inputs[1])
                nll = -jnp.take_along_axis(logp, lab[:, None], axis=1)[:, 0]
                outs[op.out] = _masked_mean(nll, frame_mask)
            elif op.op == "cost_err":
                if to_do == "forward":
                    continue
                out = outs[op.inputs[0]]
                pred = jnp.argmax(out.reshape(-1, out.shape[-1]), axis=1)
                lab = labels_for(op.inputs[1])
                err = (pred != lab).astype(jnp.float32)
                outs[op.out] = _masked_mean(err, frame_mask)
            elif op.op in ("cost_l1", "cost_l2", "cost_gl"):
                if to_do == "forward":
                    continue
                outs[op.out] = self._regularizer(op, variables)
            elif op.op == "mult":
                outs[op.out] = outs[op.inputs[0]] * outs[op.inputs[1]]
            elif op.op == "sum":
                outs[op.out] = outs[op.inputs[0]] + outs[op.inputs[1]]
            elif op.op == "mult_constant":
                outs[op.out] = outs[op.inputs[0]] * float(op.inputs[1])
            elif op.op == "sum_constant":
                outs[op.out] = outs[op.inputs[0]] + float(op.inputs[1])
            elif op.op == "avg":
                outs[op.out] = (outs[op.inputs[0]] + outs[op.inputs[1]]) / 2
            elif op.op == "mse":
                outs[op.out] = jnp.mean(
                    (outs[op.inputs[0]] - outs[op.inputs[1]]) ** 2)
            if to_do == "forward" and forward_outs and op.out == forward_outs[-1]:
                break
        return outs, new_states

    # ------------------------------------------------------------------
    def _regularizer(self, op, variables) -> Array:
        """cost_l1/l2/gl over all >=2D params of all non-skip nets;
        each net drops out of the sum once ITS guided-HCGS phase is
        active or it sets skip_regularization — per-net, not gated on
        the first net (ref: utils.py:24-60, :1954-1991 zero per
        condition; heterogeneous graphs mix guided and plain nets)."""
        lam = float(op.inputs[1])
        total = jnp.zeros(())
        for arch in self.net_order:
            net = self.nets[arch]
            spec = getattr(net, "spec", None)
            if spec is not None and (
                    spec.skip_regularization or
                    (spec.guided_hcgs and spec.apply_guided_hcgs)):
                continue
            for leaf in jax.tree_util.tree_leaves(variables[arch]["params"]):
                if leaf.ndim < 2:
                    continue
                if op.op == "cost_l1":
                    total = total + jnp.sum(jnp.abs(leaf))
                elif op.op == "cost_l2":
                    total = total + jnp.sqrt(jnp.sum(leaf ** 2))
                else:  # cost_gl: block l2 norms over num_blk x num_blk grid
                    nb = int(float(op.inputs[2]))
                    for rows in jnp.array_split(leaf, nb, axis=0):
                        for blk in jnp.array_split(rows, nb, axis=1):
                            total = total + jnp.sqrt(jnp.sum(blk ** 2) + 1e-12)
        return total * lam

    # ------------------------------------------------------------------
    def trainable_filter(self, variables: Dict[str, Any]):
        """Pytree mask: params of frozen nets excluded from updates
        (ref: core.py:230-232)."""
        return {arch: not self.freeze[arch] for arch in self.nets}

    # -- host-side compression refresh between chunks -------------------
    def post_chunk_refresh(self, variables: Dict[str, Any], if_prune: bool,
                           seed: int = 0) -> Dict[str, Any]:
        """Guided-mask regeneration (once the dense phase ends) and
        pattern refresh, mirroring the reference's post-chunk hooks
        (ref: core.py:291-306)."""
        out = {}
        for arch in self.net_order:
            net = self.nets[arch]
            v = variables[arch]
            spec = getattr(net, "spec", None)
            if spec is not None:
                if spec.guided_hcgs and not spec.apply_guided_hcgs:
                    v = net.refresh_guided_masks(v, seed=seed)
                if spec.if_pattern:
                    v = net.refresh_patterns(v, seed=seed)
                if spec.prune and if_prune:
                    # bake the magnitude mask into the weights
                    v = _bake_prune(net, v)
            out[arch] = v
        return out


def _bake_prune(net, variables):
    """Apply per-matrix global-percentile pruning to the stored params
    (ref prune_parameters, neural_networks.py:321-327)."""
    from ..sparsity.prune import magnitude_mask
    params = dict(variables["params"])
    for k, w in params.items():
        arr = np.asarray(w)
        if arr.ndim >= 2 and k[0] in ("w", "u"):
            perc = net.spec.layer_prune_perc(0)
            params[k] = arr * magnitude_mask(arr, perc)
    return {**variables, "params": params}
