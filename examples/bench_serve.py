"""Serving-path throughput: audio -> fbank -> acoustic model ->
batched on-device Viterbi, measured honestly (audio born on-device,
chained dispatches, value readback barrier — utils/timing.py rules).

Reports audio-seconds decoded per second per chip including decode,
the BASELINE.json north-star serving unit.

Run: python examples/bench_serve.py [batch] [seconds_per_utt]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_cgs_tpu.decode.viterbi import PhoneLoopHMM
    from pytorch_kaldi_cgs_tpu.decode.viterbi import _build_batched_viterbi
    from pytorch_kaldi_cgs_tpu.models.recurrent import LSTM
    from pytorch_kaldi_cgs_tpu.models.mlp import MLP
    from pytorch_kaldi_cgs_tpu.ops.frontend import Frontend
    from pytorch_kaldi_cgs_tpu.utils.timing import sync_value

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    sr = 16000
    T_samples = int(secs * sr)
    n_phones, spp = 40, 3
    n_pdfs = n_phones * spp

    # flagship-shaped acoustic model: HCGS LSTM 2x512 + softmax head
    opts = {"lstm_lay": "512,512", "lstm_drop": "0.0,0.0",
            "lstm_use_batchnorm": "True,True",
            "lstm_use_laynorm": "False,False",
            "lstm_use_laynorm_inp": "False",
            "lstm_use_batchnorm_inp": "False",
            "lstm_act": "tanh,tanh", "lstm_orthinit": "True",
            "lstm_bidir": "False", "to_do": "forward", "lstm_hcgs": "True",
            "hcgsx_block": "128,4", "hcgsh_block": "128,4",
            "hcgsx_sparse": "25,62.5", "hcgsh_sparse": "25,62.5",
            "lstm_quant": "False", "param_quant": "8,8",
            "lstm_quant_inp": "False", "inp_quant": "16",
            "lstm_prune": "False", "lstm_prune_perc": "0",
            "skip_regularization": "True", "guided_hcgs": "False",
            "apply_guided_hcgs": "False", "arch_name": "lstm",
            "scan_unroll": "1"}
    lstm = LSTM(opts, 40)
    v = jax.device_put(lstm.init(0))
    mopts = {"dnn_lay": str(n_pdfs), "dnn_drop": "0.0",
             "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
             "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
             "dnn_act": "softmax", "to_do": "forward", "dnn_hcgs": "False",
             "hcgsx_block": "8,2", "hcgsh_block": "8,2",
             "hcgsx_sparse": "25,50", "hcgsh_sparse": "25,50",
             "dnn_quant": "False", "param_quant": "8",
             "dnn_quant_inp": "False", "inp_quant": "16",
             "dnn_prune": "False", "dnn_prune_perc": "0",
             "skip_regularization": "True", "guided_hcgs": "False",
             "apply_guided_hcgs": "False", "arch_name": "mlp"}
    mlp = MLP(mopts, 512)
    vm = jax.device_put(mlp.init(1))

    frontend = Frontend(sample_rate=sr, num_mel_bins=40)
    hmm = PhoneLoopHMM(num_phones=n_phones, states_per_phone=spp)
    T_frames = frontend.num_frames(T_samples)
    vit = _build_batched_viterbi(hmm, B, T_frames, n_pdfs)
    lengths = jnp.full((B,), T_frames, jnp.int32)

    @jax.jit
    def recognize(key):
        audio = jax.random.normal(key, (B, T_samples), jnp.float32)
        feats = jax.vmap(frontend.fbank)(audio)               # (B, T, 40)
        mu = jnp.mean(feats, axis=1, keepdims=True)
        sd = jnp.maximum(jnp.std(feats, axis=1, keepdims=True), 1e-5)
        x = ((feats - mu) / sd).transpose(1, 0, 2)            # (T, B, 40)
        h, _ = lstm.apply(v, x, train=False)
        y, _ = mlp.apply(vm, h.reshape(-1, 512), train=False)
        logp = y.reshape(T_frames, B, n_pdfs).transpose(1, 0, 2)
        path, end = vit(logp, lengths, 0.2)
        return path

    key0 = jax.random.PRNGKey(0)
    p = recognize(key0)
    sync_value(jnp.sum(p[:1, :1]))                            # compile+run

    # differenced windows: each call keyed off the previous result so the
    # device cannot overlap or elide work
    def run(n, salt):
        t0 = time.perf_counter()
        carry = jnp.int32(salt)
        for i in range(n):
            p = recognize(jax.random.fold_in(key0, carry + i))
            carry = p[0, 0].astype(jnp.int32)
        sync_value(carry)
        return time.perf_counter() - t0

    n_lo, n_hi = 2, 8
    t_lo = min(run(n_lo, s) for s in (1, 2))
    t_hi = min(run(n_hi, s) for s in (3, 4))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    audio_s = B * secs
    print("serve pipeline (B=%d, %.0fs utts, %d pdfs): %.1f ms/batch, "
          "%.0f audio-s/s incl. on-device Viterbi"
          % (B, secs, n_pdfs, dt * 1e3, audio_s / dt))


if __name__ == "__main__":
    main()
