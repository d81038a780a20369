"""MLP acoustic model (ref: neural_networks.py:81-361).

Configurable feed-forward stack: per-layer dims / dropout / batch-layer
norm / activation, with the full CGS compression stack (HCGS masks,
guided HCGS, patterns, magnitude pruning, weight+activation
quantization). Compute is a chain of (masked, quantized) matmuls — on
TPU these land directly on the MXU; the compression pipeline is fused by
XLA into the matmul producers instead of mutating weights on the host.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..sparsity import hcgs as hcgs_mod
from ..sparsity import pattern as pattern_mod
from .base import (AcousticModel, CompressionSpec, effective_weight,
                   maybe_quant_input, opt_bool)
from .layers import (act_fun, batch_norm, batch_norm_params, batch_norm_state,
                     dropout, layer_norm, layer_norm_params,
                     small_uniform_init)


class MLP(AcousticModel):
    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        super().__init__(options, inp_dim)
        self.dnn_lay = [int(v) for v in options["dnn_lay"].split(",")]
        self.dnn_drop = [float(v) for v in options["dnn_drop"].split(",")]
        self.use_batchnorm = [s.strip() in ("True", "true", "1")
                              for s in options["dnn_use_batchnorm"].split(",")]
        self.use_laynorm = [s.strip() in ("True", "true", "1")
                            for s in options["dnn_use_laynorm"].split(",")]
        self.use_laynorm_inp = opt_bool(options, "dnn_use_laynorm_inp")
        self.use_batchnorm_inp = opt_bool(options, "dnn_use_batchnorm_inp")
        self.dnn_act = options["dnn_act"].split(",")
        self.spec = CompressionSpec(options, "mlp")
        self.N = len(self.dnn_lay)
        self.out_dim = self.dnn_lay[-1]
        self._acts = [act_fun(a) for a in self.dnn_act]
        # "auto" (default): per-layer block-sparse when profitable
        # (same rule as the recurrent family, see models/recurrent.py)
        self.block_sparse_mode = str(
            options.get("mlp_block_sparse", "auto") or "auto").strip()
        self.block_sparse = self.block_sparse_mode.lower() not in (
            "false", "0", "no")
        self._bs_layouts = {}

    def prepare_block_sparse(self, variables) -> None:
        """Host-side layout derivation for the block-sparse matmul path
        (plain HCGS only)."""
        if not (self.block_sparse and self.spec.hcgs) or \
                self.spec.guided_hcgs or self.spec.if_pattern or self.spec.prune:
            return
        from ..ops import block_sparse as BS
        masks = variables["masks"]
        for i in range(self.N):
            key = "hcgs_w%d" % i
            if key not in masks:
                continue
            mask = np.asarray(masks[key])
            bs = self.spec.hcgs_block[0]
            if bs % 128 or mask.shape[0] % bs:
                import logging
                logging.getLogger(__name__).warning(
                    "mlp layer %d: block %d/out-dim %s not MXU-alignable "
                    "— falling back to the dense masked path", i, bs,
                    mask.shape)
                continue
            # narrow inputs run faster dense-masked (see recurrent.py)
            kb_eff = -(-mask.shape[1] // bs)
            if self.block_sparse_mode.lower() == "auto" and kb_eff < 16:
                continue
            try:
                layout = BS.pack_layout(mask, bs, pad_k=True)
            except ValueError as e:
                import logging
                logging.getLogger(__name__).warning(
                    "mlp layer %d: irregular HCGS layout (%s) — falling "
                    "back to the dense masked path", i, e)
                continue
            if layout.R < 1:
                import logging
                logging.getLogger(__name__).warning(
                    "mlp layer %d: HCGS drop leaves 0 kept blocks per row "
                    "— dense masked path", i)
                continue
            if self.block_sparse_mode.lower() == "auto" and not (
                    layout.Kb >= 16 and layout.R * 2 <= layout.Kb):
                # Kb >= 16 is MEASURED, not assumed: at Kb=8 (the
                # 1024-wide/128-block libri GRU shape, G=3, level-2
                # submask fused) the v3 kernels run 0.93x dense across
                # two independent real-chip sessions (BENCH_r05 +
                # PERF.md round-5); the 5.4x+ wins start at Kb=16
                # (2048-wide). Force with <prefix>_block_sparse=True.
                continue   # not profitable: stay dense-masked
            # level-2 submask in the w3 layout + a zero CSC placeholder
            # (the v3 backward never reads it)
            sub3 = jnp.asarray(BS.pack_w3(mask, layout))
            self._bs_layouts[i] = (layout, sub3, None)

    def pack_variables(self, variables):
        """Host-side: convert eligible layers' dense weights to the
        packed w3 layout (trainable leaves; dropped blocks removed).
        Masks are fixed for the run, so this is lossless for training;
        idempotent on already-packed (resumed) variables."""
        if not self._bs_layouts:
            return variables
        from ..ops import block_sparse as BS
        params = dict(variables["params"])
        for i, (layout, _, _) in self._bs_layouts.items():
            key = "w%d" % i
            if key in params:
                params[key + "__bs"] = jnp.asarray(
                    BS.pack_w3(np.asarray(params.pop(key)), layout))
        return {**variables, "params": params}

    def unpack_variables(self, variables):
        """Packed -> dense (for export / reference interchange)."""
        if not self._bs_layouts:
            return variables
        from ..ops import block_sparse as BS
        params = dict(variables["params"])
        for i, (layout, _, _) in self._bs_layouts.items():
            key = "w%d__bs" % i
            if key in params:
                params["w%d" % i] = BS.unpack_w3(np.asarray(params.pop(key)),
                                                 layout)
        return {**variables, "params": params}

    # ------------------------------------------------------------------
    def init(self, seed: int) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        masks: Dict[str, Any] = {}
        if self.use_laynorm_inp:
            params["ln0"] = layer_norm_params(self.input_dim)
        if self.use_batchnorm_inp:
            params["bn0"] = batch_norm_params(self.input_dim)
            state["bn0"] = batch_norm_state(self.input_dim)
        cur = self.input_dim
        for i, out_f in enumerate(self.dnn_lay):
            # ref init: U(+-sqrt(0.01/(fan_in+fan_out))), zero bias
            # (neural_networks.py:233-235)
            params["w%d" % i] = small_uniform_init(rng, out_f, cur)
            params["b%d" % i] = np.zeros(out_f, np.float32)
            if self.use_laynorm[i]:
                params["ln%d" % i] = layer_norm_params(out_f)
            if self.use_batchnorm[i]:
                params["bn%d" % i] = batch_norm_params(out_f)
                state["bn%d" % i] = batch_norm_state(out_f)
            if self.spec.hcgs:
                masks["hcgs_w%d" % i] = hcgs_mod.hcgs_mask(
                    out_f, cur, self.spec.hcgs_block, self.spec.hcgs_sparse, rng=rng)
            if self.spec.guided_hcgs:
                masks["ghcgs_w%d" % i] = hcgs_mod.guided_hcgs_mask(
                    params["w%d" % i], self.spec.hcgs_block,
                    self.spec.hcgs_sparse, rng=rng)
            cur = out_f
        return {"params": params, "state": state, "masks": masks}

    # ------------------------------------------------------------------
    def apply(self, variables: Dict[str, Any], x, *, train: bool, rng=None):
        params, state, masks = (variables["params"], variables["state"],
                                variables["masks"])
        new_state = dict(state)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.use_laynorm_inp:
            x = layer_norm(params["ln0"], x)
        if self.use_batchnorm_inp:
            x, new_state["bn0"] = batch_norm(params["bn0"], state["bn0"], x, train)
        for i in range(self.N):
            xin = maybe_quant_input(x, self.spec)
            if i in self._bs_layouts and ("w%d__bs" % i) in params:
                y = self._apply_block_sparse(params, xin, i) + params["b%d" % i]
            else:
                w = effective_weight(params["w%d" % i], masks, "w%d" % i,
                                     self.spec, i)
                if self.compute_dtype is not None:
                    xin_c, w_c = self._cast_in(xin, w)
                    y = jnp.einsum("nf,of->no", xin_c, w_c,
                                   preferred_element_type=jnp.float32)
                    y = y + params["b%d" % i]
                else:
                    y = xin @ w.T + params["b%d" % i]
            if self.use_laynorm[i] and not self.use_batchnorm[i]:
                y = layer_norm(params["ln%d" % i], y)
            elif self.use_batchnorm[i] and not self.use_laynorm[i]:
                y, new_state["bn%d" % i] = batch_norm(
                    params["bn%d" % i], state["bn%d" % i], y, train)
            elif self.use_batchnorm[i] and self.use_laynorm[i]:
                y = layer_norm(params["ln%d" % i], y)
                y, new_state["bn%d" % i] = batch_norm(
                    params["bn%d" % i], state["bn%d" % i], y, train)
            y = self._acts[i](y)
            rng, sub = jax.random.split(rng)
            x = dropout(y, self.dnn_drop[i], train, sub)
        return x, new_state

    def _apply_block_sparse(self, params, xin, i):
        """Packed-param fast path: the weight LIVES in the w3 kernel
        layout; per step only the (cheap, elementwise) level-2 submask
        multiply + quantizer run before the kernel — no dense gather,
        no backward scatter (measured 1.40x over the dense masked
        matmul at 2048-wide/75% vs 0.88x when packing per step)."""
        from ..ops import block_sparse as BS
        layout, sub3, _ = self._bs_layouts[i]
        if xin.shape[1] < layout.K:   # K-padded layout
            xin = jnp.concatenate(
                [xin, jnp.zeros((xin.shape[0], layout.K - xin.shape[1]),
                                xin.dtype)], axis=1)
        M = xin.shape[0]
        tile_m = 256
        pad = (-M) % tile_m
        if pad:
            xin = jnp.concatenate(
                [xin, jnp.zeros((pad, xin.shape[1]), xin.dtype)], axis=0)
        w3 = params["w%d__bs" % i]
        interpret = jax.default_backend() not in ("tpu", "axon")
        # quantizer + level-2 submask fused into the kernels (VPU work
        # on streamed blocks instead of whole-weight XLA passes)
        qb = self.spec.layer_bits(i) if self.spec.quant else 0
        y = BS.block_sparse_matmul_v3(
            xin, w3, None, layout, 1, tile_m=min(tile_m, xin.shape[0]),
            interpret=interpret, sub3=sub3, quant_bits=qb)[0]
        return y[:M]

    # ------------------------------------------------------------------
    def refresh_guided_masks(self, variables, seed: int = 0):
        """Rebuild guided masks from the current weights
        (ref apply_ghcgs, neural_networks.py:329-337)."""
        if not self.spec.guided_hcgs:
            return variables
        rng = np.random.RandomState(seed)
        masks = dict(variables["masks"])
        for i in range(self.N):
            masks["ghcgs_w%d" % i] = hcgs_mod.guided_hcgs_mask(
                np.asarray(variables["params"]["w%d" % i]),
                self.spec.hcgs_block, self.spec.hcgs_sparse, rng=rng)
        return {**variables, "masks": masks}

    def refresh_patterns(self, variables, seed: int = 0):
        """K-means pattern search + mask application per layer
        (ref: neural_networks.py:339-361)."""
        if not self.spec.if_pattern:
            return variables
        # compute-once, like the reference (patterns built lazily when
        # absent, never re-clustered; core.py:304-316 hook is a no-op)
        masks = dict(variables["masks"])
        changed = False
        for i in range(self.N):
            key = "pattern_w%d" % i
            if key in masks:
                continue
            w = np.asarray(variables["params"]["w%d" % i])
            pats = pattern_mod.find_top_k_by_kmeans(
                w, self.spec.pattern_num[min(i, len(self.spec.pattern_num) - 1)],
                self.spec.pattern_shape,
                self.spec.pattern_nnz[min(i, len(self.spec.pattern_nnz) - 1)],
                seed=seed)
            masks[key] = pattern_mod.apply_patterns(w, pats)
            changed = True
        return {**variables, "masks": masks} if changed else variables
