"""Honest device timing through asynchronous runtimes.

Measuring TPU work from the host is subtle here because the transport
(an RPC tunnel in this environment) acknowledges ``block_until_ready``
without waiting for device execution: chained dispatches "complete" at
dispatch rate, and a naive timer reports impossible numbers (round 1
reported 8.1M frames/s = 217 TFLOP/s, above the chip's 197 TFLOP/s
peak; the artifact, not the model, was the anomaly).

Two rules make timing honest:

1. **Sync by value readback.** Fetching a scalar *value* to the host
   (``float(jnp.sum(x))``) cannot return before the producing
   computation actually ran. This is the only trustworthy barrier.
2. **Difference two window sizes.** Per-call RPC latency through the
   tunnel is tens of milliseconds and variable. Run the op chained
   n_lo and n_hi times and report ``(t_hi - t_lo) / (n_hi - n_lo)``:
   constant dispatch/readback overhead cancels.

For *micro* kernels (single matmul-like ops) prefer
:func:`device_loop_time`, which runs the repeat loop on-device inside
one jitted ``fori_loop`` — one dispatch, zero per-iteration overhead.
For *composite* steps (a full train step with grad-of-scan), the
fori_loop wrapping itself changes what XLA generates (measured 12x
slower than the flat executable); use :func:`chained_step_time`, which
times the real executable by chaining its outputs into its inputs.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def sync_value(x) -> float:
    """Force completion of everything ``x`` depends on by reading back a
    scalar value (not just a readiness event)."""
    x = jnp.asarray(x)
    if x.ndim == 0:
        return float(x)
    return float(jnp.sum(x))


def chained_step_time(step: Callable, args: Sequence, chain: Callable,
                      readback: Callable, n_lo: int = 2, n_hi: int = 12,
                      repeats: int = 2) -> float:
    """Seconds per call of jitted ``step``, timed honestly.

    ``chain(prev_args, outputs, i) -> next_args`` must make every call
    data-depend on the previous one (so the device cannot overlap or
    skip), and should vary any RNG key with ``i`` so no two calls are
    byte-identical. ``readback(outputs) -> array`` selects a (small)
    output whose *value* is fetched as the barrier.

    Chip contention only ever ADDS time, so the minimum over repeats is
    the best estimate of the clean duration of each window size; the
    estimate is the difference of those minima.
    """
    if n_hi <= n_lo:
        raise ValueError("need n_hi > n_lo")
    # warmup: compile + one real execution
    out = step(*args)
    sync_value(readback(out))
    counter = [0]

    def run(n, cur):
        t0 = time.perf_counter()
        for _ in range(n):
            counter[0] += 1
            out = step(*cur)
            cur = chain(cur, out, counter[0])
        sync_value(readback(out))
        return time.perf_counter() - t0, cur

    times = {n_lo: [], n_hi: []}
    cur = args
    for _ in range(repeats + 1):  # one extra pair; first is a warm window
        t_lo, cur = run(n_lo, cur)
        t_hi, cur = run(n_hi, cur)
        times[n_lo].append(t_lo)
        times[n_hi].append(t_hi)
    est = (min(times[n_hi][1:]) - min(times[n_lo][1:])) / (n_hi - n_lo)
    return max(est, 1e-9)


def interleaved_step_time(step: Callable, args: Sequence, chain: Callable,
                          readback: Callable, n_lo: int = 2, n_hi: int = 12,
                          rounds: int = 5, interleave: Callable = None):
    """Like :func:`chained_step_time`, but alternates the step's window
    pairs with ``interleave()`` (typically a fixed calibration kernel)
    and returns the per-round evidence instead of one scalar:
    ``(est, per_round_ests, interleave_results)``.

    Rationale (PERF.md measurement honesty): sequential A/B on this
    shared chip swings arbitrarily with contention — the round-4 driver
    scoreboard "regressed" 2.482->2.554 ms on a round that made the code
    faster. Interleaving a known-cost kernel makes contention VISIBLE
    (its per-round result moves when the chip is busy), and reporting
    the spread of per-round estimates makes cross-round comparisons of
    the min meaningful."""
    if n_hi <= n_lo:
        raise ValueError("need n_hi > n_lo")
    out = step(*args)
    sync_value(readback(out))
    counter = [0]

    def run(n, cur):
        t0 = time.perf_counter()
        for _ in range(n):
            counter[0] += 1
            out = step(*cur)
            cur = chain(cur, out, counter[0])
        sync_value(readback(out))
        return time.perf_counter() - t0, cur

    cur = args
    _, cur = run(n_lo, cur)      # warm round, discarded
    _, cur = run(n_hi, cur)
    lo, hi, inter = [], [], []
    for _ in range(rounds):
        if interleave is not None:
            inter.append(interleave())
        t_lo, cur = run(n_lo, cur)
        t_hi, cur = run(n_hi, cur)
        lo.append(t_lo)
        hi.append(t_hi)
    den = n_hi - n_lo
    est = max((min(hi) - min(lo)) / den, 1e-9)
    per_round = [(h - l) / den for l, h in zip(lo, hi)]
    return est, per_round, inter


def device_loop_time(body: Callable, init, n_lo: int = 10, n_hi: int = 110,
                     repeats: int = 2) -> float:
    """Seconds per iteration of ``body(carry) -> carry``, run on-device
    inside one jitted ``fori_loop`` per window (one dispatch each).

    Correct for micro-kernels; do NOT use for composite train steps
    (wrapping those in fori_loop changes XLA's schedule — measured 12x
    slower than the flat executable)."""

    @partial(jax.jit, static_argnums=1)
    def loop(carry, n):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), carry)

    leaf = lambda c: jax.tree_util.tree_leaves(c)[0]
    sync_value(leaf(loop(init, n_lo)))
    sync_value(leaf(loop(init, n_hi)))
    # min each window size INDEPENDENTLY before differencing: contention
    # only ever adds time, but min over paired (t_hi - t_lo) lets an
    # inflated t_lo pair with a clean t_hi and under-estimate (measured
    # "above physical peak" calibrations came from exactly this).
    t_lo_best, t_hi_best = None, None
    total = 0
    while True:
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync_value(leaf(loop(init, n_lo)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync_value(leaf(loop(init, n_hi)))
            t_hi = time.perf_counter() - t0
            t_lo_best = t_lo if t_lo_best is None else min(t_lo_best, t_lo)
            t_hi_best = t_hi if t_hi_best is None else min(t_hi_best, t_hi)
            total += 1
        est = (t_hi_best - t_lo_best) / (n_hi - n_lo)
        if est > 0:
            return est
        # Degenerate differencing: a contention burst inflated every
        # t_lo window beyond the best t_hi (observed in driver runs,
        # where it surfaced as "block_sparse_speedup: 0.0"). Retry a few
        # more window pairs; if the chip never quiets down, fall back to
        # the amortized upper bound t_hi/n_hi (includes one dispatch +
        # readback spread over n_hi iterations — an overestimate, but a
        # sane one) rather than a meaningless 1e-9.
        if total >= 3 * repeats:
            return t_hi_best / n_hi


def matmul_calibration(n: int = 2048, dtype=jnp.bfloat16) -> float:
    """Achieved dense-matmul TFLOP/s on this chip right now (chained
    (n,n)@(n,n) on-device loop). The honest ceiling for MFU accounting.

    Matrices are generated on-device (host->device uploads through the
    tunnel run at ~0.2-40 MB/s and would dominate wall time)."""
    key = jax.random.PRNGKey(0)
    w = (jax.random.normal(key, (n, n), jnp.float32) * 0.01).astype(dtype)
    x = (jax.random.normal(jax.random.fold_in(key, 1), (n, n),
                           jnp.float32) * 0.01).astype(dtype)

    def body(c):
        return jnp.dot(c, w, preferred_element_type=dtype) * jnp.asarray(
            0.1, dtype)

    t = device_loop_time(body, x, n_lo=10, n_hi=110)
    return 2 * n ** 3 / t / 1e12
