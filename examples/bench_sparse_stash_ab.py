"""INTERLEAVED A/B: sparse fused-LSTM backward — stash vs recompute —
at a production sparse shape (H=512, 128-block recurrent mask, 75%
level-1 drop; T=300, B=16).

PERF.md round-4 shipped the stash default for the sparse pair on a
SEQUENTIAL A/B (0.860 -> 0.764 ms, flagged unverified); the same
section shows sequential A/Bs can flip sign under chip contention.
This harness interleaves the two variants — each round measures stash
then recompute back-to-back — and reports per-round pairs plus the
min-per-variant ratio, which contention can only push toward 1, not
flip (VERDICT r4 item 5).

Run on the real chip: python examples/bench_sparse_stash_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_cgs_tpu.utils.timing import chained_step_time


def build(stash_env: str):
    """Build the jitted train fn for one stash setting (builders are
    lru-cached per flag, so both coexist in-process)."""
    from pytorch_kaldi_cgs_tpu.ops import block_sparse as BS
    from pytorch_kaldi_cgs_tpu.ops import fused_lstm as FL
    from pytorch_kaldi_cgs_tpu.sparsity.hcgs import hcgs_mask

    T, B, H, bs = 300, 16, 512, 128
    rng = np.random.RandomState(0)
    mask = hcgs_mask(H, H, [bs], [75.0], rng=rng)
    layout = BS.pack_layout(np.asarray(mask), bs)
    mask4 = np.tile(np.asarray(mask), (4, 1))
    U = (rng.randn(4 * H, H) * 0.2).astype(np.float32) * mask4
    w3g, _ = BS.v3_from_blocks(BS.gather_blocks_multi(
        [jnp.asarray(U[k * H:(k + 1) * H]) for k in range(4)], layout),
        layout, 4)
    g = jnp.asarray(rng.randn(T, B, 4 * H) * 0.5, jnp.float32)
    drop = jnp.ones((B, H), jnp.float32)

    os.environ["PKC_LSTM_BWD_RECOMPUTE"] = stash_env

    def train(x, w):
        def loss(x, w):
            return jnp.mean(FL.lstm_scan_fused_sparse(x, w, layout,
                                                      drop) ** 2)
        dg, dw = jax.grad(loss, argnums=(0, 1))(x, w)
        return x + dg * 1e-9 + jnp.mean(dw) * 1e-9

    jf = jax.jit(train)
    out = jf(g, w3g)                    # compile under this flag
    jax.block_until_ready(out)
    return jf, g, w3g


# physical floor: 300 sequential recurrence steps cannot run faster
# than ~0.5us each (kernel dispatch + VPU latency) — a window estimate
# below T*0.5us is a degenerate differencing artifact (an inflated
# t_lo paired with a clean t_hi) and must not enter the min.
FLOOR_S = 300 * 0.5e-6


def measure_once(jf, g, w3g):
    t = chained_step_time(jf, (g, w3g),
                          chain=lambda cur, out, i: (out, cur[1]),
                          readback=lambda out: out, n_lo=2, n_hi=10,
                          repeats=2)
    return t if t > FLOOR_S else None


def main(rounds: int = 5):
    jf_stash, g, w3g = build("")        # stash default
    jf_rec, _, _ = build("1")           # recompute forced
    os.environ["PKC_LSTM_BWD_RECOMPUTE"] = ""
    pairs = []
    best_s = best_r = None
    for r in range(rounds):
        ts = measure_once(jf_stash, g, w3g)
        tr = measure_once(jf_rec, g, w3g)
        pairs.append((ts, tr))
        if ts is not None:
            best_s = ts if best_s is None else min(best_s, ts)
        if tr is not None:
            best_r = tr if best_r is None else min(best_r, tr)
        print("round %d: stash %s ms  recompute %s ms" % (
            r, "%.3f" % (ts * 1e3) if ts else "floor-reject",
            "%.3f" % (tr * 1e3) if tr else "floor-reject"), flush=True)
    if best_s and best_r:
        print("min-per-variant: stash %.3f ms, recompute %.3f ms, "
              "recompute/stash = %.3fx" % (best_s * 1e3, best_r * 1e3,
                                           best_r / best_s))
    else:
        print("no valid rounds survived the physical floor")


if __name__ == "__main__":
    main()
