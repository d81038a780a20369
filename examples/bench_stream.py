"""Streaming-inference latency on one chip.

Measures the per-chunk device time of the flagship acoustic model
(2x512 HCGS+quant LSTM + 1944-way head) running in streaming mode:
fixed 16-frame chunks (160 ms of audio at 10 ms frame shift), carried
recurrent state, B concurrent streams per batch. Reports per-chunk
latency, per-stream real-time factor and aggregate audio-seconds/s.

The streamed path is the lax.scan cell form (the fused one-kernel
recurrence assumes zero initial state), so this also quantifies the
price of statefulness vs the batch path in bench_serve.py.

Timing per utils/timing.py: chained dispatches (the carry feeds the
next chunk — streaming is *naturally* chained), scalar value readback,
two window sizes differenced.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship  # noqa: E402
from pytorch_kaldi_cgs_tpu.utils.timing import sync_value  # noqa: E402

FRAME_SHIFT_S = 0.01


def main(T_c=16, B=16, feat=143, n_out=1944):
    lstm, mlp = _flagship(hidden=512, feat_dim=feat, n_out=n_out, hcgs=True)
    variables = jax.device_put({"lstm": lstm.init(0), "mlp": mlp.init(1)})
    key = jax.random.PRNGKey(0)

    @jax.jit
    def first(v, chunk):
        h, carries = lstm.apply_streaming(v["lstm"], chunk, None)
        y, _ = mlp.apply(v["mlp"], h.reshape(T_c * B, -1), train=False)
        return y, carries

    @jax.jit
    def step(v, chunk, carries):
        h, carries = lstm.apply_streaming(v["lstm"], chunk, carries)
        y, _ = mlp.apply(v["mlp"], h.reshape(T_c * B, -1), train=False)
        return y, carries

    chunk0 = jax.random.normal(key, (T_c, B, feat), jnp.float32)
    y, carries = first(variables, chunk0)
    sync_value(y[0, :2])

    def run(n):
        c = carries
        t0 = time.perf_counter()
        out = y
        for i in range(n):
            # next chunk derives from the last output: dispatches chain
            chunk = chunk0 + out[0, 0] * 1e-12
            out, c = step(variables, chunk, c)
        sync_value(out[0, :2])
        return time.perf_counter() - t0

    run(2)
    best = {}
    for n in (4, 24):
        best[n] = min(run(n) for _ in range(3))
    per_chunk = (best[24] - best[4]) / 20
    audio_per_chunk = T_c * FRAME_SHIFT_S
    rtf = per_chunk / audio_per_chunk
    print("streaming flagship: chunk %d frames x %d streams" % (T_c, B))
    print("per-chunk latency: %.3f ms" % (per_chunk * 1e3))
    print("per-stream RTF: %.4f (%.0fx faster than real time)"
          % (rtf, 1.0 / max(rtf, 1e-9)))
    print("aggregate: %.0f audio-s/s" % (B * audio_per_chunk / per_chunk))


if __name__ == "__main__":
    main()
