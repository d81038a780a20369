"""Benchmark: flagship acoustic-model training throughput on one chip.

Model: the CGS headline configuration — 2x512 LSTM with 2-level HCGS
block sparsity (128/4 blocks, 25/62.5% drop) + 8-bit weight
quantization, MLP softmax head with 1944 senone outputs, TIMIT-shaped
inputs (143-dim fMLLR-like features, ref
cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_hcgs.cfg). Measures full training steps
(forward + backward + optimizer) in frames/second.

Timing is honest per utils/timing.py: chained dispatches whose final
scalar VALUE is read back to the host, differenced across two window
sizes so constant RPC latency cancels. (Round 1 used
``block_until_ready``, which this environment's tunnel acknowledges
without waiting for execution; the 8.1M frames/s it reported implied
217 TFLOP/s — above the v5e's 197 TFLOP/s bf16 peak — and is void.)

FLOP accounting (written out so MFU is checkable):
  per frame, forward matmul MACs =
      layer1: 143*2048 (x-proj) + 512*2048 (recurrent)
    + layer2: 512*2048 + 512*2048
    + MLP head: 512*1944                     = 4.43M MACs
  forward flops  = 2*MACs           = 8.87M
  training step ~= 3x forward       = 26.6M flops/frame
  (XLA cost_analysis cross-check: it reports 13.8M "flops"/frame for
  the jitted train step — XLA counts dot flops as M*N*K (MACs), so
  times two minus elementwise ops this matches the analytic number.)

MFU is reported against BOTH the chip's nominal bf16 peak (v5e:
197 TFLOP/s) and a same-session dense-matmul calibration.

Baseline: the reference reports ~87 s/epoch for TIMIT training on its
GPU (ref README.md:171-181); TIMIT train is ~1.12M frames, giving
~12.9k frames/s — and that number is for the *cheaper* MLP; the LSTM
configs are slower. vs_baseline = ours / 12900.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os

import numpy as np

FLOPS_PER_FRAME = 2 * 3 * (143 * 2048 + 3 * 512 * 2048 + 512 * 1944)
PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0,
                    "TPU v4": 275.0, "TPU v5p": 459.0}


def build_train_step():
    import jax
    import jax.numpy as jnp
    import optax
    from __graft_entry__ import _flagship
    from pytorch_kaldi_cgs_tpu.runtime.optim import make_optimizer

    T, B = 300, 16
    FEAT, NOUT = 143, 1944
    # bf16 compute (f32 params/accum) is the production default: the
    # mixed-precision recipe every TPU training stack uses. Closeness vs
    # f32 is test-pinned (tests/test_fused_lstm.py::
    # test_fused_bf16_compute_close_to_f32, tests/test_models.py bf16
    # parity); PKC_COMPUTE_DTYPE= (empty) reverts to pure f32.
    lstm, mlp = _flagship(hidden=512, feat_dim=FEAT, n_out=NOUT, hcgs=True,
                          compute_dtype=os.environ.get("PKC_COMPUTE_DTYPE",
                                                       "bfloat16"))
    variables = {"lstm": lstm.init(0), "mlp": mlp.init(1)}
    lstm.prepare_block_sparse(variables["lstm"])
    tx = make_optimizer({"arch_opt": "rmsprop", "arch_lr": "0.0016",
                         "opt_momentum": "0", "opt_alpha": "0.95",
                         "opt_eps": "1e-8", "opt_centered": "False",
                         "opt_weight_decay": "0"})
    params0 = {"lstm": variables["lstm"]["params"],
               "mlp": variables["mlp"]["params"]}
    opt_state = tx.init(params0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, B, FEAT), jnp.float32)
    labels = jnp.asarray(rng.randint(0, NOUT, (T, B)), jnp.int32)

    @jax.jit
    def train_step(variables, opt_state, x, labels, key):
        params = {"lstm": variables["lstm"]["params"],
                  "mlp": variables["mlp"]["params"]}

        def loss_fn(params):
            vl = {**variables["lstm"], "params": params["lstm"]}
            vm = {**variables["mlp"], "params": params["mlp"]}
            h, st_l = lstm.apply(vl, x, train=True, rng=key)
            TT, BB, H = h.shape
            y, st_m = mlp.apply(vm, h.reshape(TT * BB, H), train=True, rng=key)
            nll = -jnp.take_along_axis(y, labels.reshape(-1)[:, None], axis=1)
            return jnp.mean(nll), (st_l, st_m)

        (loss, (st_l, st_m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return ({"lstm": {"params": new_params["lstm"], "state": st_l,
                          "masks": variables["lstm"]["masks"]},
                 "mlp": {"params": new_params["mlp"], "state": st_m,
                         "masks": variables["mlp"]["masks"]}},
                opt_state, loss)

    return train_step, (variables, opt_state, x, labels), T * B


def measure_block_sparse_speedup(drop=87.5, width=2048, M=2560):
    """Dense masked 4-gate projection vs the v3 block-sparse forward at
    a record.md 32x-class design point (within this process, honest).
    Data lives on-device from birth (a host mask constant would upload
    16MB through the ~MB/s tunnel per gate)."""
    import jax
    import jax.numpy as jnp
    from pytorch_kaldi_cgs_tpu.ops import block_sparse as BS
    from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask
    from pytorch_kaldi_cgs_tpu.utils.timing import device_loop_time

    G = 4
    mask = hcgs_mask(width, width, [128], [drop], seed=0)
    layout = BS.pack_layout(np.asarray(mask), 128)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, width), jnp.float32)
    mask_d = jnp.asarray(np.packbits(np.asarray(mask, bool), axis=0))

    @jax.jit
    def make_ws(key, mask_d):
        m = jnp.unpackbits(mask_d, axis=0, count=width).astype(jnp.float32)
        return [jax.random.normal(jax.random.fold_in(key, g),
                                  (width, width), jnp.float32) * m
                for g in range(G)]

    ws = make_ws(key, mask_d)
    w_cat = jnp.concatenate([w.T for w in ws], axis=1)
    w3, _ = BS.gather_v3(ws, layout)

    def dense_body(c):
        y = jnp.dot(c, w_cat, preferred_element_type=jnp.float32)
        return c + jnp.sum(y, axis=1, keepdims=True) * 1e-9

    def v3_body(c):
        ys = BS.block_sparse_matmul_v3(c, w3, None, layout, G, tile_m=256)
        return c + jnp.sum(ys, axis=(0, 2))[:, None] * 1e-9

    # FLOP floor: the dense op cannot run faster than 2x the chip's
    # physical peak; a measurement below it is a degenerate differencing
    # artifact (contention burst), not a real time. INTERLEAVE the two
    # variants and min each independently — sequential A/B on the shared
    # chip swung the reported ratio 3.1x-10x across driver runs for
    # identical code (PERF.md measurement-honesty note).
    import jax
    peak = PEAK_BF16_TFLOPS.get(jax.devices()[0].device_kind, 197.0)
    dense_floor = (2 * G * M * width * width) / (2 * peak * 1e12)
    td_best = tv_best = None
    for _ in range(3):
        td = device_loop_time(dense_body, x, n_lo=3, n_hi=18)
        tv = device_loop_time(v3_body, x, n_lo=3, n_hi=18)
        if td > dense_floor:
            td_best = td if td_best is None else min(td_best, td)
        if tv > dense_floor / 8:
            tv_best = tv if tv_best is None else min(tv_best, tv)
    if td_best and tv_best and 0.1 < td_best / tv_best < 30:
        return td_best / tv_best
    return None


def main():
    import time as _time
    import jax
    from pytorch_kaldi_cgs_tpu.utils.timing import (chained_step_time,
                                                    matmul_calibration)

    t_start = _time.time()
    train_step, (variables, opt_state, x, labels), frames = build_train_step()
    key0 = jax.random.PRNGKey(0)

    def chain(cur, out, i):
        v, o, _ = out[0], out[1], out[2]
        return (v, o, cur[2], cur[3], jax.random.fold_in(key0, i))

    # repeats=5: cross-run spread on the shared chip measured 2.24-2.83
    # ms for identical code; more windows -> the min is a better clean
    # estimate, at ~seconds of extra wall time
    dt = chained_step_time(
        train_step, (variables, opt_state, x, labels, key0),
        chain=chain, readback=lambda out: out[2], n_lo=2, n_hi=12, repeats=5)

    frames_per_s = frames / dt
    tflops = FLOPS_PER_FRAME * frames_per_s / 1e12
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_TFLOPS.get(kind, 197.0)
    calib = matmul_calibration(n=4096)  # 2048-windows jitter >peak
    # block-sparse vs dense masked projection at a 32x design point —
    # skipped when compiles/contention already burned the time budget
    # (measurement itself takes ~60s; driver budget is 550s)
    bs_speedup = None
    if _time.time() - t_start < 430:
        try:
            bs_speedup = measure_block_sparse_speedup()
            if bs_speedup is not None:
                bs_speedup = round(bs_speedup, 3)
        except Exception:
            bs_speedup = None
    baseline = 12900.0  # ref ~87 s/epoch TIMIT (1.12M frames), MLP on GPU
    print(json.dumps({
        "metric": "lstm_hcgs_train_frames_per_sec",
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline, 3),
        "step_ms": round(dt * 1e3, 3),
        "flops_per_frame": FLOPS_PER_FRAME,
        "achieved_tflops": round(tflops, 2),
        "mfu": round(tflops / peak, 4),
        "mfu_vs_calibration": round(tflops / calib, 4),
        "matmul_calibration_tflops": round(calib, 1),
        "block_sparse_speedup": bs_speedup,
        "device_kind": kind,
        "peak_bf16_tflops": peak,
        "compute_dtype": os.environ.get("PKC_COMPUTE_DTYPE", "bfloat16")
        or "float32",
    }))


if __name__ == "__main__":
    main()
