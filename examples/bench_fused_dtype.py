"""Within-process A/B: fused LSTM recurrence kernel f32 vs bf16 dots,
at the flagship shape (T=300, B=16, H=512), forward and fwd+bwd.

Honest timing per utils/timing.py (chained value-readback, differenced
windows). Run on the real chip: python examples/bench_fused_dtype.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_cgs_tpu.ops.fused_lstm import lstm_scan_fused
from pytorch_kaldi_cgs_tpu.utils.timing import chained_step_time


def main():
    T, B, H = 300, 16, 512
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)

    def fwd_f32(x):
        hs = lstm_scan_fused(x, U, drop)
        return x + jnp.mean(hs) * 1e-9

    def fwd_bf16(x):
        hs = lstm_scan_fused(x, U, drop, compute_dtype="bf16")
        return x + jnp.mean(hs) * 1e-9

    def train_f32(x):
        def loss(x, U):
            return jnp.mean(lstm_scan_fused(x, U, drop) ** 2)
        dg, dU = jax.grad(loss, argnums=(0, 1))(x, U)
        return x + dg * 1e-9 + jnp.mean(dU) * 1e-9

    def train_bf16(x):
        def loss(x, U):
            return jnp.mean(lstm_scan_fused(x, U, drop,
                                            compute_dtype="bf16") ** 2)
        dg, dU = jax.grad(loss, argnums=(0, 1))(x, U)
        return x + dg * 1e-9 + jnp.mean(dU) * 1e-9

    import os
    only = os.environ.get("PKC_DTYPE_BENCH", "all")
    cases = {"fwd": [("fwd f32", fwd_f32), ("fwd bf16", fwd_bf16)],
             "train": [("fwd+bwd f32", train_f32),
                       ("fwd+bwd bf16", train_bf16)]}
    todo = cases["fwd"] + cases["train"] if only == "all" else cases[only]
    for name, fn in todo:
        # composite grad-of-pallas steps must be timed by CHAINED
        # dispatches, not an on-device fori_loop (PERF.md methodology
        # item 3: XLA's while-loop schedule measured 12x slower)
        jf = jax.jit(fn)
        t = chained_step_time(jf, (g,), chain=lambda cur, out, i: (out,),
                              readback=lambda out: out, n_lo=2, n_hi=10,
                              repeats=2)
        print("%-14s %.3f ms" % (name, t * 1e3), flush=True)


if __name__ == "__main__":
    main()
