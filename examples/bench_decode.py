"""Decode-path throughput (honest): native C++ WFST decoder on CPU
(plain wall-clock — no tunnel between us and the work) and the batched
on-TPU Viterbi (value-readback timing).

Reports audio-seconds decoded per second (frame shift 10ms), the
BASELINE.json north-star decode unit.

Run: python examples/bench_decode.py [n_utts] [T] [n_pdfs]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def synth_posteriors(n, T, S, seed=0):
    rng = np.random.RandomState(seed)
    # peaky log-posteriors along a random pdf path (decodable quickly)
    out = []
    for i in range(n):
        path = np.repeat(rng.randint(0, S, T // 8 + 1), 8)[:T]
        ll = np.full((T, S), -8.0, np.float32)
        ll[np.arange(T), path] = -0.5
        ll += rng.randn(T, S).astype(np.float32) * 0.3
        out.append(ll)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 1944
    spp = 3
    n_phones = S // spp
    audio_s = n * T * 0.01

    from pytorch_kaldi_cgs_tpu import native as N
    if not N.available():
        print("native lib unavailable")
        return
    import tempfile
    fst_txt = tempfile.mktemp(suffix=".fst.txt")
    N.build_phone_loop_fst(fst_txt, n_phones, spp)
    fst = N.NativeFst(fst_txt)
    posts = synth_posteriors(n, T, S)

    # --- best-path beam decode (latgen best path role) ---
    fst.decode(posts[0])                      # warm up allocators
    t0 = time.perf_counter()
    for ll in posts:
        fst.decode(ll, beam=13.0, max_active=7000, acwt=0.2)
    dt = time.perf_counter() - t0
    print("native beam decode  : %6.1f audio-s/s  (%.1f ms/utt, "
          "%d states, %d pdfs)" % (audio_s / dt, dt / n * 1e3,
                                   fst.num_states, S), flush=True)

    # --- lattice decode + rescoring sweep ---
    t0 = time.perf_counter()
    for ll in posts[:n // 4]:
        lat = fst.decode_lattice(ll, beam=13.0, lat_beam=8.0, acwt=0.2)
        lat.rescore_sweep([1.0 / w for w in range(1, 11)])
    dt = time.perf_counter() - t0
    print("lattice + 10-lmwt   : %6.1f audio-s/s  (%.1f ms/utt)"
          % (audio_s / 4 / dt, dt / (n // 4) * 1e3), flush=True)

    # --- on-TPU batched Viterbi (honest readback timing) ---
    try:
        import jax
        import jax.numpy as jnp
        from pytorch_kaldi_cgs_tpu.decode.viterbi import (PhoneLoopHMM,
                                                          batched_viterbi_decode)
        from pytorch_kaldi_cgs_tpu.utils.timing import sync_value
        hmm = PhoneLoopHMM(num_phones=n_phones, states_per_phone=spp)
        batch = np.stack(posts)
        lengths = np.full(n, T, np.int64)
        seqs = batched_viterbi_decode(batch, lengths, hmm, 0.2)  # compile
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            seqs = batched_viterbi_decode(batch + r * 1e-6, lengths, hmm, 0.2)
        # host-side result forces completion (returns python lists)
        dt = (time.perf_counter() - t0) / reps
        print("on-TPU batched vit  : %6.1f audio-s/s  (batch of %d)"
              % (audio_s / dt, n), flush=True)
    except Exception as e:
        print("on-TPU viterbi skipped: %s" % str(e)[:120])


if __name__ == "__main__":
    main()
