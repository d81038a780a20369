"""Recurrent acoustic models: LSTM, GRU, liGRU, minimalGRU, RNN, and the
fused "cudnn-class" wrappers (ref: neural_networks.py:364-1931).

TPU-first design:
  * time-major (T, B, F) layout like the reference;
  * all gate input projections are ONE fused matmul per layer
    (weights stored per-gate for checkpoint parity, concatenated at
    trace time — XLA folds the concat), computed for every timestep at
    once exactly like the reference's batched feed-forward pass
    (ref: neural_networks.py:950-954) — this is the MXU-heavy part;
  * the recurrence runs in a single ``lax.scan`` whose step does one
    (B,H)x(H,nG*H) matmul — no per-timestep Python loop
    (replaces ref: neural_networks.py:1077-1097);
  * bidirectionality = concatenate the time-reversed copy along the
    batch axis and run ONE scan, then split/flip/concat features
    (the reference's flip trick, ref: neural_networks.py:836-838 —
    on TPU this doubles the scan's matmul batch instead of running a
    second scan);
  * per-sequence dropout masks are sampled once outside the scan
    (ref: neural_networks.py:843-847), batch-norm over the flattened
    (T*B, H) gate activations (ref: neural_networks.py:957-976);
  * the HCGS/guided/prune/quant pipeline is fused into the gate weight
    producers (see models.base.effective_weight).

NB the reference LSTM hard-disables hsigmoid gates and bidir inside
forward (neural_networks.py:1080, :835) even when configured on; we
honor the semantics that actually ran (sigmoid gates) but implement
bidir properly since other RNNs support it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..sparsity import hcgs as hcgs_mod
from ..sparsity import pattern as pattern_mod
from .base import (AcousticModel, CompressionSpec, effective_weight,
                   maybe_quant_input, opt_bool)
from ..sparsity.quantize import ste_quantize_input
from .layers import (act_fun, batch_norm, batch_norm_params, batch_norm_state,
                     layer_norm, layer_norm_params, orthogonal_init,
                     shared_time_drop_mask, torch_linear_init)


def _flip_time(x):
    return jnp.flip(x, axis=0)


class _RecurrentBase(AcousticModel):
    """Shared construction/execution for the custom RNN family."""

    prefix: str            # option prefix: lstm / gru / ligru / minimalgru / rnn
    gates_x: List[str]     # input projection names, e.g. [wfx, wix, wox, wcx]
    gates_h: List[str]     # recurrent projection names, e.g. [ufh, ...]
    bn_gates: List[str]    # which input projections get batch norm

    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        super().__init__(options, inp_dim)
        p = self.prefix
        # block-sparse compute path (kept HCGS blocks only, fused
        # multi-gate Pallas kernels): "auto" (default) turns it on per
        # layer when the layout is profitable — measured wins start at
        # K >= 1024 with >= 50% level-1 block drop (examples/
        # bench_kernels.py, fwd 1.9x / dx 1.4x / dw 1.6x at 2048/75%);
        # narrower or denser layers stay on the dense masked path.
        self.block_sparse_mode = str(
            options.get(p + "_block_sparse", "auto") or "auto").strip()
        self.block_sparse = self.block_sparse_mode.lower() not in (
            "false", "0", "no")
        self._bs_layouts: Dict[int, Any] = {}
        self.lay = [int(v) for v in options[p + "_lay"].split(",")]
        self.drop = [float(v) for v in options[p + "_drop"].split(",")]
        self.use_batchnorm = [v.strip() in ("True", "true", "1")
                              for v in options[p + "_use_batchnorm"].split(",")]
        self.use_laynorm = [v.strip() in ("True", "true", "1")
                            for v in options[p + "_use_laynorm"].split(",")]
        self.use_laynorm_inp = opt_bool(options, p + "_use_laynorm_inp")
        self.use_batchnorm_inp = opt_bool(options, p + "_use_batchnorm_inp")
        self.act_names = options[p + "_act"].split(",")
        self.orthinit = opt_bool(options, p + "_orthinit", True)
        self.bidir = opt_bool(options, p + "_bidir")
        # lax.scan unroll factor: amortizes per-step loop overhead of the
        # recurrence (small-batch scans are dispatch-bound on TPU)
        self.scan_unroll = int(options.get("scan_unroll", 4) or 4)
        self.spec = CompressionSpec(options, p)
        self.N = len(self.lay)
        self._acts = [act_fun(a) for a in self.act_names]
        self.out_dim = self.lay[-1] * (2 if self.bidir else 1)

    # -- construction ---------------------------------------------------
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
        for i, H in enumerate(self.lay):
            use_norm = self.use_laynorm[i] or self.use_batchnorm[i]
            for g in self.gates_x:
                w, b = torch_linear_init(rng, H, cur)
                params["%s%d" % (g, i)] = w
                if not use_norm:   # norm replaces the bias (ref add_bias logic)
                    params["%s_b%d" % (g, i)] = b
            for g in self.gates_h:
                if self.orthinit:
                    params["%s%d" % (g, i)] = orthogonal_init(rng, H, H)
                else:
                    params["%s%d" % (g, i)] = torch_linear_init(rng, H, H)[0]
            if self.use_batchnorm[i]:
                for g in self.bn_gates:
                    params["bn_%s%d" % (g, i)] = batch_norm_params(H)
                    state["bn_%s%d" % (g, i)] = batch_norm_state(H)
            if self.use_laynorm[i]:
                params["ln%d" % i] = layer_norm_params(H)
            # HCGS: one mask shared by all x-gates, one by all h-gates
            # (ref: neural_networks.py:853-861, :978-983)
            if self.spec.hcgs:
                mx = hcgs_mod.hcgs_mask(H, cur, self.spec.hcgsx_block,
                                        self.spec.hcgsx_sparse, rng=rng)
                mh = hcgs_mod.hcgs_mask(H, H, self.spec.hcgsh_block,
                                        self.spec.hcgsh_sparse, rng=rng)
                # independent copies: aliased buffers break jit donation
                for g in self.gates_x:
                    masks["hcgs_%s%d" % (g, i)] = mx.copy()
                for g in self.gates_h:
                    masks["hcgs_%s%d" % (g, i)] = mh.copy()
            # guided HCGS: per-matrix masks (ref: neural_networks.py:727-806)
            if self.spec.guided_hcgs:
                for g in self.gates_x:
                    masks["ghcgs_%s%d" % (g, i)] = hcgs_mod.guided_hcgs_mask(
                        params["%s%d" % (g, i)], self.spec.hcgsx_block,
                        self.spec.hcgsx_sparse, rng=rng)
                for g in self.gates_h:
                    masks["ghcgs_%s%d" % (g, i)] = hcgs_mod.guided_hcgs_mask(
                        params["%s%d" % (g, i)], self.spec.hcgsh_block,
                        self.spec.hcgsh_sparse, rng=rng)
            cur = H * (2 if self.bidir else 1)
        return {"params": params, "state": state, "masks": masks}

    # -- helpers --------------------------------------------------------
    def _stacked(self, params, masks, names, i) -> jnp.ndarray:
        """Effective per-gate weights stacked to (nG*H, in)."""
        ws = [effective_weight(params["%s%d" % (g, i)], masks, "%s%d" % (g, i),
                               self.spec, i) for g in names]
        return jnp.concatenate(ws, axis=0)

    def prepare_block_sparse(self, variables) -> None:
        """Host-side: derive the static level-1 block layouts + packed
        level-2 submasks from the (numpy) HCGS masks. Must run before
        jit-tracing apply when the block-sparse path is enabled."""
        if not (self.block_sparse and self.spec.hcgs):
            return
        if self.spec.guided_hcgs or self.spec.if_pattern or self.spec.prune:
            return  # dynamic-mask modes stay on the dense-masked path
        from ..ops import block_sparse as BS
        masks = variables["masks"]
        self._prepare_sparse_recurrence(variables)
        for i in range(self.N):
            key = "hcgs_%s%d" % (self.gates_x[0], i)
            if key not in masks:
                continue
            mask = np.asarray(masks[key])
            bs = self.spec.hcgsx_block[0]
            if bs % 128 or mask.shape[0] % bs:
                import logging
                logging.getLogger(__name__).warning(
                    "%s layer %d: block %d/out-dim %s not MXU-alignable "
                    "— falling back to the dense masked path", self.prefix,
                    i, bs, mask.shape)
                continue
            # profitability pre-check BEFORE packing: narrow inputs
            # (e.g. the 143-dim fMLLR front end -> Kb=2 padded) run
            # faster dense-masked; not a fallback, dense IS optimal
            kb_eff = -(-mask.shape[1] // bs)
            if self.block_sparse_mode.lower() == "auto" and kb_eff < 16:
                continue
            try:
                # pad_k: non-multiple input widths zero-pad to the next
                # block boundary (x is padded to match at apply time)
                layout = BS.pack_layout(mask, bs, pad_k=True)
            except ValueError as e:
                import logging
                logging.getLogger(__name__).warning(
                    "%s layer %d: irregular HCGS layout (%s) — falling "
                    "back to the dense masked path", self.prefix, i, e)
                continue
            if layout.R < 1:
                import logging
                logging.getLogger(__name__).warning(
                    "%s layer %d: HCGS drop leaves 0 kept blocks per row "
                    "— dense masked path", self.prefix, i)
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
            # per-gate level-2 submasks in the w3 layout (stacked along
            # the gate axis the kernel consumes) + zero CSC placeholder
            sub3 = jnp.concatenate(
                [jnp.asarray(BS.pack_w3(
                    np.asarray(masks["hcgs_%s%d" % (g, i)]), layout))
                 for g in self.gates_x], axis=1)
            self._bs_layouts[i] = (layout, sub3, None)

    def _prepare_sparse_recurrence(self, variables) -> None:
        """A block-sparse FUSED recurrence layout over the stacked
        (nG*H, H) recurrent mask — lets wide layers whose dense U
        overflows VMEM still run the whole time loop in one kernel,
        touching only kept blocks (ops.fused_lstm / ops.fused_rnn).
        GRU/minimalGRU gate the candidate's recurrent input; their
        kernels do two gather+dot passes per step."""
        if self.prefix not in ("lstm", "ligru", "rnn", "gru",
                               "minimalgru"):
            return
        from ..ops import block_sparse as BS
        masks = variables["masks"]
        self._rec_layouts: Dict[int, Any] = {}
        bs_ = self.spec.hcgsh_block[0] if self.spec.hcgsh_block else 0
        if not bs_ or bs_ % 128:
            return
        for i in range(self.N):
            key = "hcgs_%s%d" % (self.gates_h[0], i)
            if key not in masks:
                continue
            # the h-gates share ONE mask (ref: neural_networks.py:
            # 978-983): a per-gate (H, H) layout packs all gates into
            # the (Nb, G*bs, R*bs) row-major form with zero padding
            try:
                layout = BS.pack_layout(np.asarray(masks[key]), bs_)
            except ValueError:
                continue
            # only worthwhile with a real FLOP cut; the VMEM fit is
            # checked at trace time when the batch size is known
            if layout.R < 1 or layout.R * 2 > layout.Kb:
                continue
            self._rec_layouts[i] = layout

    def pack_variables(self, variables):
        """Dense x-gate weights -> packed w3 leaves for block-sparse
        layers (idempotent on resumed/already-packed variables)."""
        if not self._bs_layouts:
            return variables
        from ..ops import block_sparse as BS
        params = dict(variables["params"])
        for i, (layout, _, _) in self._bs_layouts.items():
            for g in self.gates_x:
                key = "%s%d" % (g, i)
                if key in params:
                    params[key + "__bs"] = jnp.asarray(
                        BS.pack_w3(np.asarray(params.pop(key)), layout))
        return {**variables, "params": params}

    def unpack_variables(self, variables):
        if not self._bs_layouts:
            return variables
        from ..ops import block_sparse as BS
        params = dict(variables["params"])
        for i, (layout, _, _) in self._bs_layouts.items():
            for g in self.gates_x:
                key = "%s%d__bs" % (g, i)
                if key in params:
                    params["%s%d" % (g, i)] = BS.unpack_w3(
                        np.asarray(params.pop(key)), layout)
        return {**variables, "params": params}

    def _proj_x_block_sparse(self, params, x, i):
        """Input projections through the fused multi-gate block-sparse
        kernel. Weights LIVE in the packed w3 layout (see
        pack_variables): per step only the elementwise submask multiply
        and quantizer run before the kernel — no dense gather and no
        backward scatter."""
        from ..ops import block_sparse as BS
        layout, sub3, _ = self._bs_layouts[i]
        G = len(self.gates_x)
        T, B, F = x.shape
        xin = maybe_quant_input(x, self.spec).reshape(T * B, F)
        if F < layout.K:     # K-padded layout (non-multiple input width)
            xin = jnp.concatenate(
                [xin, jnp.zeros((xin.shape[0], layout.K - F), xin.dtype)],
                axis=1)
        tile_m = 256
        M = T * B
        pad = (-M) % tile_m
        if pad:
            # xin may already have been widened to layout.K columns
            # above, so pad rows at the *current* width, not F.
            xin = jnp.concatenate(
                [xin, jnp.zeros((pad, xin.shape[1]), xin.dtype)], axis=0)
        w3 = BS.stack_w3_gates(params["%s%d__bs" % (g, i)]
                               for g in self.gates_x)
        interpret = jax.default_backend() not in ("tpu", "axon")
        # quantizer + level-2 submask fused into the kernels (VPU work
        # on streamed blocks instead of whole-weight XLA passes)
        qb = self.spec.layer_bits(i) if self.spec.quant else 0
        ys = BS.block_sparse_matmul_v3(xin, w3, None, layout, G,
                                       tile_m=min(tile_m, xin.shape[0]),
                                       interpret=interpret, sub3=sub3,
                                       quant_bits=qb)
        H = layout.N
        return [ys[g][:M].reshape(T, B, H) for g in range(G)]

    def _proj_x(self, params, state, new_state, masks, x, i, train):
        """Fused input projections + per-gate batch norm. Returns a list
        of (T, B, H) arrays, one per x-gate."""
        if i in self._bs_layouts and \
                ("%s%d__bs" % (self.gates_x[0], i)) in params:
            outs = self._proj_x_block_sparse(params, x, i)
        else:
            W = self._stacked(params, masks, self.gates_x, i)
            xin = maybe_quant_input(x, self.spec)
            if self.compute_dtype is not None:
                xin, W = self._cast_in(xin, W)
            proj = jnp.einsum("tbf,gf->tbg", xin, W,
                              preferred_element_type=jnp.float32)
            outs = list(jnp.split(proj, len(self.gates_x), axis=-1))
        for k, g in enumerate(self.gates_x):
            bkey = "%s_b%d" % (g, i)
            if bkey in params:
                outs[k] = outs[k] + params[bkey]
        if self.use_batchnorm[i]:
            T, B, H = outs[0].shape
            for k, g in enumerate(self.gates_x):
                if g not in self.bn_gates:
                    continue
                key = "bn_%s%d" % (g, i)
                flat, new_state[key] = batch_norm(
                    params[key], state[key], outs[k].reshape(T * B, H), train)
                outs[k] = flat.reshape(T, B, H)
        return outs

    def _fused_forced(self) -> bool:
        return str(self.options.get(self.prefix + "_fused_scan",
                                    "")).strip() in ("True", "true", "1")

    def _fused_rnn_ok(self, use_ln, act_name, B, H, n_gates) -> bool:
        """Context-free fused-recurrence eligibility (liGRU/GRU/mGRU/RNN
        family): supported activation, no in-scan layer norm, VMEM
        budget, real TPU backend or forced (interpret mode) for tests.
        Also used by the streaming path, which seeds the carry."""
        if not opt_bool(self.options, self.prefix + "_fused_scan", True):
            return False
        if use_ln or act_name not in ("tanh", "relu", "htanh", "linear"):
            return False
        from ..ops.fused_rnn import fits_vmem as frnn_fits
        if not frnn_fits(B, H, n_gates,
                         "bf16" if self.compute_dtype is not None else ""):
            return False
        return (jax.default_backend() in ("tpu", "axon") or
                self._fused_forced())

    def _fused_ok(self, use_ln, act_name, B, H, n_gates) -> bool:
        """Training/whole-utterance fused eligibility: the one-kernel
        recurrence assumes zero initial state, so it is off under a seq
        or stream context (streaming takes the seeded-carry variant via
        each cell's _run_scan directly)."""
        from ..parallel.seqpipe import seq_parallel_context
        from .base import stream_state
        if seq_parallel_context() is not None or stream_state() is not None:
            return False
        return self._fused_rnn_ok(use_ln, act_name, B, H, n_gates)

    def _fused_lstm_ok(self, use_ln, act_name, B, H) -> bool:
        """Context-free fused-LSTM eligibility: supported activation, no
        in-scan layer norm, VMEM budget, and either a real TPU backend
        or interpret-capable tests forcing it via <prefix>_fused_scan.
        Also used by the streaming path (which seeds the carry instead
        of assuming zeros)."""
        if self.prefix != "lstm":
            return False
        if not opt_bool(self.options, self.prefix + "_fused_scan", True):
            return False
        if use_ln or act_name not in ("tanh", "relu", "htanh", "linear"):
            return False
        from ..ops.fused_lstm import fits_vmem
        if not fits_vmem(B, H,
                         "bf16" if self.compute_dtype is not None else ""):
            return False
        if jax.default_backend() in ("tpu", "axon"):
            return True
        # CPU: only when explicitly requested (interpret mode is slow)
        return str(self.options.get("lstm_fused_scan", "")).strip() in (
            "True", "true", "1")

    def _use_fused_scan(self, use_ln, act_name, B, H) -> bool:
        """Training/whole-utterance fused eligibility: the one-kernel
        recurrence assumes zero initial state, so it is off under a seq
        or stream context (streaming takes the seeded-carry variant via
        _run_scan directly)."""
        from ..parallel.seqpipe import seq_parallel_context
        from .base import stream_state
        if seq_parallel_context() is not None or stream_state() is not None:
            return False
        return self._fused_lstm_ok(use_ln, act_name, B, H)

    def _stream_fused(self, stream_fn, gates_t, U, drop_mask, act_name,
                      qb, B, H):
        """Run a seeded-carry ``*_scan_fused_stream`` kernel under an
        active streaming context: pop the initial h carry (zeros on the
        first chunk), push the final one. Mirrors the LSTM streaming
        branch in LSTM._run_scan."""
        from .base import stream_state
        ss = stream_state()
        z = jnp.zeros((B, H), jnp.float32)
        h0 = ss.next_carry(z)
        hs, fin = stream_fn(
            gates_t.astype(jnp.float32), U.astype(jnp.float32), drop_mask,
            h0, act=act_name, quant_bits=qb,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        ss.carries_out.append(fin)
        return hs

    def _maybe_bidir_in(self, x):
        if self.bidir:
            return jnp.concatenate([x, _flip_time(x)], axis=1)
        return x

    def _maybe_bidir_out(self, h, orig_B):
        if self.bidir:
            h_f = h[:, :orig_B]
            h_b = _flip_time(h[:, orig_B:])
            return jnp.concatenate([h_f, h_b], axis=2)
        return h

    # -- forward --------------------------------------------------------
    def apply(self, variables, x, *, train: bool, rng=None):
        params, state, masks = (variables["params"], variables["state"],
                                variables["masks"])
        new_state = dict(state)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.use_laynorm_inp:
            x = layer_norm(params["ln0"], x)
        if self.use_batchnorm_inp:
            T, B, F = x.shape
            flat, new_state["bn0"] = batch_norm(params["bn0"], state["bn0"],
                                                x.reshape(T * B, F), train)
            x = flat.reshape(T, B, F)
        for i in range(self.N):
            orig_B = x.shape[1]
            x = self._maybe_bidir_in(x)
            B = x.shape[1]
            H = self.lay[i]
            rng, sub = jax.random.split(rng)
            drop_mask = shared_time_drop_mask(sub, (B, H), self.drop[i], train)
            proj = self._proj_x(params, state, new_state, masks, x, i, train)
            U = self._stacked(params, masks, self.gates_h, i)
            ln_p = params.get("ln%d" % i)
            h = self._run_scan(proj, U, drop_mask, self._acts[i], ln_p,
                               self.use_laynorm[i], B, H,
                               act_name=self.act_names[i], layer=i)
            x = self._maybe_bidir_out(h, orig_B)
        return x, new_state

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        raise NotImplementedError

    def _scan_cell(self, step, params, bargs, carry0, gates_t,
                   slab_fn=None):
        """Run the cell recurrence: ``step(params, bargs, carry, g_t) ->
        (carry, h)``, pure. Dispatches to the sequence-pipelined scan
        (time axis sharded over the mesh's "seq" axis, ppermute carry
        handoff) when a seq_parallel context is active, else plain
        lax.scan. ``slab_fn`` (optional) is the cell's seeded-carry
        fused whole-slab kernel; the pipelined scan uses it per (slab,
        microbatch) cell when the time axis divides evenly."""
        from ..parallel.seqpipe import seq_parallel_context, seq_pipeline_scan
        from .base import stream_state
        ctx = seq_parallel_context()
        if ctx is not None:
            slab = slab_fn if (slab_fn is not None and gates_t.shape[0]
                               % ctx.mesh.shape[ctx.axis] == 0) else None
            _, hs = seq_pipeline_scan(
                step, params, bargs, carry0, gates_t, mesh=ctx.mesh,
                axis=ctx.axis, microbatches=ctx.microbatches, slab_fn=slab)
            return hs
        ss = stream_state()
        if ss is not None:
            carry0 = ss.next_carry(carry0)
        fin, hs = jax.lax.scan(lambda c, g: step(params, bargs, c, g),
                               carry0, gates_t, unroll=self.scan_unroll)
        if ss is not None:
            ss.carries_out.append(fin)
        return hs

    def _sparse_rec_layout(self, use_ln, act_name, B, H, layer):
        """The layer's block-sparse fused-recurrence layout, or None when
        ineligible (laynorm in-scan, unsupported act, VMEM overflow at
        this batch size, CPU backend without the force flag, or an
        active seq_parallel context — the fused kernels run the whole T
        loop in one kernel with zero initial state, so time-sharded
        slabs use the lax.scan cell form instead)."""
        from ..parallel.seqpipe import seq_parallel_context
        from .base import stream_state
        if seq_parallel_context() is not None or stream_state() is not None:
            return None
        layout = getattr(self, "_rec_layouts", {}).get(layer)
        if layout is None:
            return None
        from ..ops.fused_lstm import sparse_scan_fits_vmem
        if not sparse_scan_fits_vmem(B, H, layout, len(self.gates_h)):
            return None
        if use_ln or act_name not in ("tanh", "relu", "htanh", "linear"):
            return None
        if not (jax.default_backend() in ("tpu", "axon") or
                self._fused_forced()):
            return None
        return layout

    def _rec_w3g(self, U, layout, n_gates):
        """Pack the stacked (nG*H, H) recurrent weights into the per-gate
        row-major kept-block form the sparse fused kernels consume."""
        from ..ops import block_sparse as BS
        H = U.shape[1]
        Uf = U.astype(jnp.float32)
        gates = [Uf[g_ * H:(g_ + 1) * H] for g_ in range(n_gates)]
        w3g, _ = BS.v3_from_blocks(
            BS.gather_blocks_multi(gates, layout), layout, n_gates)
        return w3g

    def _rmm(self, h, U):
        """Recurrent matmul with f32 accumulation (bf16 inputs when
        compute_dtype is set)."""
        hin = self._recurrent_input(h)
        if self.compute_dtype is not None:
            U = U.astype(self.compute_dtype)
        return jnp.einsum("bh,gh->bg", hin, U,
                          preferred_element_type=jnp.float32)

    def _recurrent_input(self, h):
        if self.spec.quant and self.spec.quant_inp:
            h = ste_quantize_input(h, self.spec.inp_quant[0])
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        return h

    # -- host-side refresh hooks ---------------------------------------
    def refresh_guided_masks(self, variables, seed: int = 0):
        if not self.spec.guided_hcgs:
            return variables
        rng = np.random.RandomState(seed)
        masks = dict(variables["masks"])
        for i in range(self.N):
            for g in self.gates_x:
                masks["ghcgs_%s%d" % (g, i)] = hcgs_mod.guided_hcgs_mask(
                    np.asarray(variables["params"]["%s%d" % (g, i)]),
                    self.spec.hcgsx_block, self.spec.hcgsx_sparse, rng=rng)
            for g in self.gates_h:
                masks["ghcgs_%s%d" % (g, i)] = hcgs_mod.guided_hcgs_mask(
                    np.asarray(variables["params"]["%s%d" % (g, i)]),
                    self.spec.hcgsh_block, self.spec.hcgsh_sparse, rng=rng)
        return {**variables, "masks": masks}

    def refresh_patterns(self, variables, seed: int = 0):
        """Per-matrix k-means pattern search, keyed like the reference's
        pattern dicts pattern_wfx..pattern_uch
        (ref: neural_networks.py:566-589, :1162-1223).

        Compute-once: the reference builds patterns lazily the first time
        a matrix has none and never re-clusters (its per-chunk
        update_patterns hook is commented out, ref core.py:304-316), so
        masks stay fixed once applied. Re-clustering every chunk churned
        masks and cost accuracy on the CGS curve."""
        if not self.spec.if_pattern:
            return variables
        masks = dict(variables["masks"])
        changed = False
        for i in range(self.N):
            for g in self.gates_x + self.gates_h:
                key = "pattern_%s%d" % (g, i)
                if key in masks:
                    continue
                w = np.asarray(variables["params"]["%s%d" % (g, i)])
                pats = pattern_mod.find_top_k_by_kmeans(
                    w, self.spec.pattern_num[min(i, len(self.spec.pattern_num) - 1)],
                    self.spec.pattern_shape,
                    self.spec.pattern_nnz[min(i, len(self.spec.pattern_nnz) - 1)],
                    seed=seed)
                masks[key] = pattern_mod.apply_patterns(w, pats)
                changed = True
        return {**variables, "masks": masks} if changed else variables


# ---------------------------------------------------------------------------
# concrete cells
# ---------------------------------------------------------------------------

class LSTM(_RecurrentBase):
    """4-gate LSTM (ref: neural_networks.py:468-1237): ft/it/ot sigmoid
    gates, candidate through the layer activation, per-sequence dropout
    on the candidate term only, optional laynorm on h."""
    prefix = "lstm"
    gates_x = ["wfx", "wix", "wox", "wcx"]
    gates_h = ["ufh", "uih", "uoh", "uch"]
    bn_gates = ["wfx", "wix", "wox", "wcx"]

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        wfx, wix, wox, wcx = proj
        gates_t = jnp.concatenate([wfx, wix, wox, wcx], axis=-1)  # (T,B,4H)
        qb = (self.spec.inp_quant[0]
              if (self.spec.quant and self.spec.quant_inp) else 0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        rec_layout = self._sparse_rec_layout(use_ln, act_name, B, H, layer)
        if rec_layout is not None:
            from ..ops.fused_lstm import lstm_scan_fused_sparse
            return lstm_scan_fused_sparse(
                gates_t.astype(jnp.float32),
                self._rec_w3g(U, rec_layout, 4), rec_layout, drop_mask,
                act=act_name, quant_bits=qb, interpret=interpret)
        if self._use_fused_scan(use_ln, act_name, B, H):
            from ..ops.fused_lstm import lstm_scan_fused
            return lstm_scan_fused(gates_t.astype(jnp.float32),
                                   U.astype(jnp.float32), drop_mask,
                                   act=act_name, quant_bits=qb,
                                   interpret=interpret,
                                   compute_dtype=(
                                       "bf16" if self.compute_dtype
                                       is not None else ""))
        from .base import stream_state
        ss = stream_state()
        if ss is not None and self._fused_lstm_ok(use_ln, act_name, B, H):
            # streaming keeps one-kernel speed: the seeded-carry fused
            # forward (inference-only, no VJP needed on this path)
            from ..ops.fused_lstm import lstm_scan_fused_stream
            z = jnp.zeros((B, H), jnp.float32)
            cin = ss.next_carry((z, z))
            hs, fin = lstm_scan_fused_stream(
                gates_t.astype(jnp.float32), U.astype(jnp.float32),
                drop_mask, cin[0], cin[1], act=act_name, quant_bits=qb,
                interpret=interpret)
            ss.carries_out.append(fin)
            return hs
        h0 = jnp.zeros((B, H), gates_t.dtype)

        def step(params, bargs, carry, g_t):
            U_, ln_ = params
            (dm,) = bargs
            h, c = carry
            u = self._rmm(h, U_)                                  # (B,4H)
            gf, gi, go, gc = jnp.split(g_t + u, 4, axis=-1)
            f = jax.nn.sigmoid(gf)
            i = jax.nn.sigmoid(gi)
            o = jax.nn.sigmoid(go)
            c = i * act(gc) * dm + f * c                          # ref :1090-1091
            h = o * act(c)
            if use_ln:
                h = layer_norm(ln_, h)
            return (h, c), h

        # seeded-carry fused slab kernel for seq-parallel contexts: the
        # whole T/S slab runs one Pallas call per (slab, microbatch)
        # cell and BPTT crosses slabs through (dh0, dc0) + the ppermute
        # transpose — the SP path no longer pays the lax.scan fallback
        slab_fn = None
        if self._fused_lstm_ok(use_ln, act_name, B, H):
            from ..ops.fused_lstm import lstm_scan_fused_seeded

            def slab_fn(params_, bargs_, carry, g_slab):
                U_, _ = params_
                (dm,) = bargs_
                h0_, c0_ = carry
                hs, fin = lstm_scan_fused_seeded(
                    g_slab.astype(jnp.float32), U_.astype(jnp.float32),
                    dm, h0_.astype(jnp.float32), c0_.astype(jnp.float32),
                    act=act_name, quant_bits=qb, interpret=interpret,
                    compute_dtype=("bf16" if self.compute_dtype
                                   is not None else ""))
                return fin, hs

        return self._scan_cell(step, (U, ln_p), (drop_mask,), (h0, h0),
                               gates_t, slab_fn=slab_fn)


class GRU(_RecurrentBase):
    """GRU with update/reset gates (ref: neural_networks.py:1240-1426)."""
    prefix = "gru"
    gates_x = ["wh", "wz", "wr"]
    gates_h = ["uh", "uz", "ur"]
    bn_gates = ["wh", "wz", "wr"]

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        qb = (self.spec.inp_quant[0]
              if (self.spec.quant and self.spec.quant_inp) else 0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        rec_layout = self._sparse_rec_layout(use_ln, act_name, B, H, layer)
        if rec_layout is not None:
            from ..ops.fused_rnn import gru_scan_fused_sparse
            gates_t = jnp.concatenate(proj, axis=-1)
            return gru_scan_fused_sparse(
                gates_t.astype(jnp.float32),
                self._rec_w3g(U, rec_layout, 3), rec_layout, drop_mask,
                act=act_name, quant_bits=qb, interpret=interpret)
        if self._fused_ok(use_ln, act_name, B, H, 3):
            from ..ops.fused_rnn import gru_scan_fused
            gates_t = jnp.concatenate(proj, axis=-1)
            return gru_scan_fused(gates_t.astype(jnp.float32),
                                  U.astype(jnp.float32), drop_mask,
                                  act=act_name, quant_bits=qb,
                                  interpret=interpret)
        from .base import stream_state
        if stream_state() is not None and \
                self._fused_rnn_ok(use_ln, act_name, B, H, 3):
            from ..ops.fused_rnn import gru_scan_fused_stream
            return self._stream_fused(gru_scan_fused_stream,
                                      jnp.concatenate(proj, axis=-1), U,
                                      drop_mask, act_name, qb, B, H)
        wh, wz, wr = proj
        gates_t = jnp.concatenate([wh, wz, wr], axis=-1)
        h0 = jnp.zeros((B, H), gates_t.dtype)

        def step(params, bargs, h, g_t):
            (Uh, Uz, Ur), ln_ = params
            (dm,) = bargs
            gh, gz, gr = jnp.split(g_t, 3, axis=-1)
            z = jax.nn.sigmoid(gz + self._rmm(h, Uz))
            r = jax.nn.sigmoid(gr + self._rmm(h, Ur))
            at = gh + self._rmm(r * h, Uh)
            hcand = act(at) * dm
            h = z * h + (1 - z) * hcand
            if use_ln:
                h = layer_norm(ln_, h)
            return h, h

        return self._scan_cell(step, (tuple(jnp.split(U, 3, axis=0)), ln_p),
                               (drop_mask,), h0, gates_t)


class liGRU(_RecurrentBase):
    """Light GRU: single update gate, batchnormed candidate
    (ref: neural_networks.py:1429-1599)."""
    prefix = "ligru"
    gates_x = ["wh", "wz"]
    gates_h = ["uh", "uz"]
    bn_gates = ["wh", "wz"]

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        qb = (self.spec.inp_quant[0]
              if (self.spec.quant and self.spec.quant_inp) else 0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        rec_layout = self._sparse_rec_layout(use_ln, act_name, B, H, layer)
        if rec_layout is not None:
            from ..ops.fused_rnn import ligru_scan_fused_sparse
            gates_t = jnp.concatenate(proj, axis=-1)
            return ligru_scan_fused_sparse(
                gates_t.astype(jnp.float32),
                self._rec_w3g(U, rec_layout, 2), rec_layout, drop_mask,
                act=act_name, quant_bits=qb, interpret=interpret)
        if self._fused_ok(use_ln, act_name, B, H, 2):
            from ..ops.fused_rnn import ligru_scan_fused
            gates_t = jnp.concatenate(proj, axis=-1)
            return ligru_scan_fused(gates_t.astype(jnp.float32),
                                    U.astype(jnp.float32), drop_mask,
                                    act=act_name, quant_bits=qb,
                                    interpret=interpret)
        from .base import stream_state
        if stream_state() is not None and \
                self._fused_rnn_ok(use_ln, act_name, B, H, 2):
            from ..ops.fused_rnn import ligru_scan_fused_stream
            return self._stream_fused(ligru_scan_fused_stream,
                                      jnp.concatenate(proj, axis=-1), U,
                                      drop_mask, act_name, qb, B, H)
        wh, wz = proj
        gates_t = jnp.concatenate([wh, wz], axis=-1)
        h0 = jnp.zeros((B, H), gates_t.dtype)

        def step(params, bargs, h, g_t):
            (Uh, Uz), ln_ = params
            (dm,) = bargs
            gh, gz = jnp.split(g_t, 2, axis=-1)
            z = jax.nn.sigmoid(gz + self._rmm(h, Uz))
            hcand = act(gh + self._rmm(h, Uh)) * dm
            h = z * h + (1 - z) * hcand
            if use_ln:
                h = layer_norm(ln_, h)
            return h, h

        return self._scan_cell(step, (tuple(jnp.split(U, 2, axis=0)), ln_p),
                               (drop_mask,), h0, gates_t)


class minimalGRU(_RecurrentBase):
    """Minimal GRU: the update gate also gates the recurrent candidate
    input (ref: neural_networks.py:1602-1777)."""
    prefix = "minimalgru"
    gates_x = ["wh", "wz"]
    gates_h = ["uh", "uz"]
    bn_gates = ["wh", "wz"]

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        qb = (self.spec.inp_quant[0]
              if (self.spec.quant and self.spec.quant_inp) else 0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        rec_layout = self._sparse_rec_layout(use_ln, act_name, B, H, layer)
        if rec_layout is not None:
            from ..ops.fused_rnn import mgru_scan_fused_sparse
            gates_t = jnp.concatenate(proj, axis=-1)
            return mgru_scan_fused_sparse(
                gates_t.astype(jnp.float32),
                self._rec_w3g(U, rec_layout, 2), rec_layout, drop_mask,
                act=act_name, quant_bits=qb, interpret=interpret)
        if self._fused_ok(use_ln, act_name, B, H, 2):
            from ..ops.fused_rnn import mgru_scan_fused
            gates_t = jnp.concatenate(proj, axis=-1)
            return mgru_scan_fused(gates_t.astype(jnp.float32),
                                   U.astype(jnp.float32), drop_mask,
                                   act=act_name, quant_bits=qb,
                                   interpret=interpret)
        from .base import stream_state
        if stream_state() is not None and \
                self._fused_rnn_ok(use_ln, act_name, B, H, 2):
            from ..ops.fused_rnn import mgru_scan_fused_stream
            return self._stream_fused(mgru_scan_fused_stream,
                                      jnp.concatenate(proj, axis=-1), U,
                                      drop_mask, act_name, qb, B, H)
        wh, wz = proj
        gates_t = jnp.concatenate([wh, wz], axis=-1)
        h0 = jnp.zeros((B, H), gates_t.dtype)

        def step(params, bargs, h, g_t):
            (Uh, Uz), ln_ = params
            (dm,) = bargs
            gh, gz = jnp.split(g_t, 2, axis=-1)
            z = jax.nn.sigmoid(gz + self._rmm(h, Uz))
            at = gh + self._rmm(z * h, Uh)
            hcand = act(at) * dm
            h = z * h + (1 - z) * hcand
            if use_ln:
                h = layer_norm(ln_, h)
            return h, h

        return self._scan_cell(step, (tuple(jnp.split(U, 2, axis=0)), ln_p),
                               (drop_mask,), h0, gates_t)


class RNN(_RecurrentBase):
    """Vanilla RNN (ref: neural_networks.py:1780-1931); dropout applies
    to the full hidden state."""
    prefix = "rnn"
    gates_x = ["wh"]
    gates_h = ["uh"]
    bn_gates = ["wh"]

    def _run_scan(self, proj, U, drop_mask, act, ln_p, use_ln, B, H,
                  act_name="", layer=-1):
        qb = (self.spec.inp_quant[0]
              if (self.spec.quant and self.spec.quant_inp) else 0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        rec_layout = self._sparse_rec_layout(use_ln, act_name, B, H, layer)
        if rec_layout is not None:
            from ..ops.fused_rnn import rnn_scan_fused_sparse
            return rnn_scan_fused_sparse(
                proj[0].astype(jnp.float32),
                self._rec_w3g(U, rec_layout, 1), rec_layout, drop_mask,
                act=act_name, quant_bits=qb, interpret=interpret)
        if self._fused_ok(use_ln, act_name, B, H, 1):
            from ..ops.fused_rnn import rnn_scan_fused
            return rnn_scan_fused(proj[0].astype(jnp.float32),
                                  U.astype(jnp.float32), drop_mask,
                                  act=act_name, quant_bits=qb,
                                  interpret=interpret)
        from .base import stream_state
        if stream_state() is not None and \
                self._fused_rnn_ok(use_ln, act_name, B, H, 1):
            from ..ops.fused_rnn import rnn_scan_fused_stream
            return self._stream_fused(rnn_scan_fused_stream, proj[0], U,
                                      drop_mask, act_name, qb, B, H)
        wh = proj[0]
        h0 = jnp.zeros((B, H), wh.dtype)

        def step(params, bargs, h, g_t):
            U_, ln_ = params
            (dm,) = bargs
            at = g_t + self._rmm(h, U_)
            h = act(at) * dm
            if use_ln:
                h = layer_norm(ln_, h)
            return h, h

        return self._scan_cell(step, (U, ln_p), (drop_mask,), h0, wh)


# ---------------------------------------------------------------------------
# "cudnn-class" fused wrappers (ref: neural_networks.py:364-465) — plain
# multi-layer cells with both input and recurrent biases, standard
# inter-layer dropout, bidirectional support. On TPU the same fused-proj
# + scan machinery IS the fast path, so these share it.
# ---------------------------------------------------------------------------

class _CudnnBase(AcousticModel):
    n_gates: int

    def __init__(self, options: Mapping[str, Any], inp_dim: int):
        super().__init__(options, inp_dim)
        self.hidden_size = int(options["hidden_size"])
        self.num_layers = int(options["num_layers"])
        self.bias = opt_bool(options, "bias", True)
        self.bidirectional = opt_bool(options, "bidirectional", False)
        self.dropout_p = float(options.get("dropout", 0.0) or 0.0)
        self.scan_unroll = int(options.get("scan_unroll", 4) or 4)
        self.out_dim = self.hidden_size * (2 if self.bidirectional else 1)

    def init(self, seed: int) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        params: Dict[str, Any] = {}
        cur = self.input_dim
        H = self.hidden_size
        nd = 2 if self.bidirectional else 1
        k = 1.0 / np.sqrt(H)
        for i in range(self.num_layers):
            for d in range(nd):
                sfx = "l%d%s" % (i, "_r" if d else "")
                params["w_ih_" + sfx] = rng.uniform(
                    -k, k, (self.n_gates * H, cur)).astype(np.float32)
                params["w_hh_" + sfx] = rng.uniform(
                    -k, k, (self.n_gates * H, H)).astype(np.float32)
                if self.bias:
                    params["b_ih_" + sfx] = rng.uniform(
                        -k, k, (self.n_gates * H,)).astype(np.float32)
                    params["b_hh_" + sfx] = rng.uniform(
                        -k, k, (self.n_gates * H,)).astype(np.float32)
            cur = H * nd
        return {"params": params, "state": {}, "masks": {}}

    def _fused_capable(self, B, H) -> bool:
        """Context-free fused-kernel capability check."""
        from ..ops.fused_rnn import fits_vmem
        if not fits_vmem(B, H, self.n_gates):
            return False
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return str(self.options.get("fused_scan", "")).strip() in (
            "True", "true", "1")

    def _fused_eligible(self, B, H) -> bool:
        """Route through the fused Pallas recurrence when it fits VMEM
        (LSTM_cudnn/RNN_cudnn share the custom cells' kernels after a
        gate permutation; GRU_cudnn has its own torch-semantics kernel,
        gru_cudnn_scan_fused). Off under streaming — LSTM_cudnn takes
        the seeded-carry stream variant, the others the scan path."""
        from .base import stream_state
        if stream_state() is not None:
            return False  # zero-state kernels; stream path seeds carry
        return self._fused_capable(B, H)

    def _dir(self, params, x, sfx, train):
        proj = jnp.einsum("tbf,gf->tbg", x, params["w_ih_" + sfx])
        if self.bias:
            proj = proj + params["b_ih_" + sfx]
        W_hh = params["w_hh_" + sfx]
        b_hh = params.get("b_hh_" + sfx, 0.0)
        return self._scan(proj, W_hh, b_hh)

    def _stream_scan(self, step, carry0, xs):
        """lax.scan that honors an active streaming context (initial
        carry in, final carry out)."""
        from .base import stream_state
        ss = stream_state()
        if ss is not None:
            carry0 = ss.next_carry(carry0)
        fin, hs = jax.lax.scan(step, carry0, xs, unroll=self.scan_unroll)
        if ss is not None:
            ss.carries_out.append(fin)
        return hs

    def apply(self, variables, x, *, train: bool, rng=None):
        params = variables["params"]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        for i in range(self.num_layers):
            fwd = self._dir(params, x, "l%d" % i, train)
            if self.bidirectional:
                bwd = _flip_time(self._dir(params, _flip_time(x),
                                           "l%d_r" % i, train))
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            if train and self.dropout_p > 0 and i < self.num_layers - 1:
                rng, sub = jax.random.split(rng)
                keep = 1.0 - self.dropout_p
                mask = jax.random.bernoulli(sub, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
        return x, variables["state"]


class LSTM_cudnn(_CudnnBase):
    n_gates = 4

    def _scan(self, proj, W_hh, b_hh):
        B = proj.shape[1]
        H = self.hidden_size
        if self._fused_eligible(B, H):
            # same equations as the fused kernel after permuting torch's
            # (i,f,g,o) gate order to (f,i,o,c) and folding b_hh into the
            # time-batched projections
            from ..ops.fused_lstm import lstm_scan_fused
            perm = [1, 0, 3, 2]   # ifgo -> fioc
            g = proj + b_hh
            gs = jnp.split(g, 4, axis=-1)
            g = jnp.concatenate([gs[k] for k in perm], axis=-1)
            Us = jnp.split(W_hh, 4, axis=0)
            U = jnp.concatenate([Us[k] for k in perm], axis=0)
            hs = lstm_scan_fused(g.astype(jnp.float32),
                                 U.astype(jnp.float32),
                                 jnp.ones((B, H), jnp.float32),
                                 act="tanh",
                                 interpret=jax.default_backend()
                                 not in ("tpu", "axon"))
            return hs.astype(proj.dtype)
        from .base import stream_state
        ss = stream_state()
        if ss is not None and self._fused_capable(B, H):
            from ..ops.fused_lstm import lstm_scan_fused_stream
            perm = [1, 0, 3, 2]   # ifgo -> fioc
            g = proj + b_hh
            gs = jnp.split(g, 4, axis=-1)
            g = jnp.concatenate([gs[k] for k in perm], axis=-1)
            Us = jnp.split(W_hh, 4, axis=0)
            U = jnp.concatenate([Us[k] for k in perm], axis=0)
            z = jnp.zeros((B, H), jnp.float32)
            cin = ss.next_carry((z, z))
            hs, fin = lstm_scan_fused_stream(
                g.astype(jnp.float32), U.astype(jnp.float32),
                jnp.ones((B, H), jnp.float32), cin[0], cin[1], act="tanh",
                interpret=jax.default_backend() not in ("tpu", "axon"))
            ss.carries_out.append(fin)
            return hs.astype(proj.dtype)
        h0 = jnp.zeros((B, H), proj.dtype)

        def step(carry, g_t):
            h, c = carry
            g = g_t + h @ W_hh.T + b_hh
            gi, gf, gc, go = jnp.split(g, 4, axis=-1)   # torch gate order i,f,g,o
            i = jax.nn.sigmoid(gi)
            f = jax.nn.sigmoid(gf)
            o = jax.nn.sigmoid(go)
            c = f * c + i * jnp.tanh(gc)
            h = o * jnp.tanh(c)
            return (h, c), h

        return self._stream_scan(step, (h0, h0), proj)


class GRU_cudnn(_CudnnBase):
    n_gates = 3

    def _scan(self, proj, W_hh, b_hh):
        B = proj.shape[1]
        H = self.hidden_size
        if self._fused_eligible(B, H):
            # torch-semantics fused kernel: r * (U_n h + b_hn) is ONE
            # dot per step (unlike the cell GRU's (r*h) @ U_h)
            from ..ops.fused_rnn import gru_cudnn_scan_fused
            hs = gru_cudnn_scan_fused(
                proj.astype(jnp.float32), W_hh.astype(jnp.float32), b_hh,
                interpret=jax.default_backend() not in ("tpu", "axon"))
            return hs.astype(proj.dtype)
        h0 = jnp.zeros((B, H), proj.dtype)
        # NB not isinstance(b_hh, jnp.ndarray): numpy params (eager
        # calls) would silently drop the recurrent bias
        bh = jnp.zeros(3 * H) if np.ndim(b_hh) == 0 else jnp.asarray(b_hh)

        def step(h, g_t):
            u = h @ W_hh.T + bh
            gr_x, gz_x, gn_x = jnp.split(g_t, 3, axis=-1)  # torch order r,z,n
            gr_h, gz_h, gn_h = jnp.split(u, 3, axis=-1)
            r = jax.nn.sigmoid(gr_x + gr_h)
            z = jax.nn.sigmoid(gz_x + gz_h)
            n = jnp.tanh(gn_x + r * gn_h)
            h = (1 - z) * n + z * h
            return h, h

        return self._stream_scan(step, h0, proj)


class RNN_cudnn(_CudnnBase):
    n_gates = 1

    def __init__(self, options, inp_dim):
        super().__init__(options, inp_dim)
        self.nonlinearity = options.get("nonlinearity", "tanh")

    def _scan(self, proj, W_hh, b_hh):
        B = proj.shape[1]
        H = self.hidden_size
        act_name = "tanh" if "tanh" in self.nonlinearity else "relu"
        if self._fused_eligible(B, H):
            from ..ops.fused_rnn import rnn_scan_fused
            g = proj + b_hh
            hs = rnn_scan_fused(g.astype(jnp.float32),
                                W_hh.astype(jnp.float32),
                                jnp.ones((B, H), jnp.float32),
                                act=act_name,
                                interpret=jax.default_backend()
                                not in ("tpu", "axon"))
            return hs.astype(proj.dtype)
        h0 = jnp.zeros((B, H), proj.dtype)
        act = jnp.tanh if "tanh" in self.nonlinearity else jax.nn.relu

        def step(h, g_t):
            h = act(g_t + h @ W_hh.T + b_hh)
            return h, h

        return self._stream_scan(step, h0, proj)
