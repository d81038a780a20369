"""Within-process A/B: fused LSTM backward — recompute vs stashed gate
activations — at the flagship shape (T=300, B=16, H=512).

The recompute bwd re-evaluates u = h @ U + 4 transcendentals per step
before the cotangent chain (PERF.md: 0.86 ms bwd vs 0.31 ms fwd). The
stash variant streams the forward's post-activation gates (T, B, 4H)
into the reverse kernel instead: zero recompute dots, one tanh(c).

Measured (TPU v5 lite, bf16 dots): fwd+bwd 0.832 -> 0.496 ms = 1.68x.

Run on the real chip: python examples/bench_bwd_stash.py
"""
import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_cgs_tpu.utils.timing import chained_step_time


def main():
    T, B, H = 300, 16, 512
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    U = jnp.asarray(rng.randn(4 * H, H) * 0.2, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)
    cdt = os.environ.get("PKC_COMPUTE_DTYPE", "bf16")

    from pytorch_kaldi_cgs_tpu.ops.fused_lstm import lstm_scan_fused

    for name, env in [("stash bwd", ""), ("recompute bwd", "1")]:
        # the flag is read at trace time; builders are lru_cached per
        # stash flag so both variants coexist in one process
        os.environ["PKC_LSTM_BWD_RECOMPUTE"] = env

        def train(x, U):
            def loss(x, U):
                return jnp.mean(lstm_scan_fused(
                    x, U, drop, compute_dtype=cdt) ** 2)
            dg, dU = jax.grad(loss, argnums=(0, 1))(x, U)
            return x + dg * 1e-9 + jnp.mean(dU) * 1e-9

        jf = jax.jit(train)
        t = chained_step_time(jf, (g, U),
                              chain=lambda cur, out, i: (out, U),
                              readback=lambda out: out, n_lo=2, n_hi=10,
                              repeats=2)
        print("%-16s (%s) %.3f ms" % (name, cdt or "f32", t * 1e3),
              flush=True)
    os.environ["PKC_LSTM_BWD_RECOMPUTE"] = ""


if __name__ == "__main__":
    main()
