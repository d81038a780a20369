"""Golden end-to-end run on the synthetic miniature dataset.

Generates data, trains the MLP and the HCGS LSTM experiments, decodes,
and prints PER plus decode real-time factors. Run on any backend:

    python examples/golden_synth.py [out_dir]

Golden results (seeds fixed):
    CPU 2026-08-17:      {"mlp_per": 0.0, "lstm_hcgs_per": 0.0}
    real TPU 2026-08-18: {"mlp_per": 0.0, "lstm_hcgs_per": 0.0}
                         (61s / 119s wall through the RPC tunnel)
— both the dense MLP and the HCGS(16/4-block 25/50%)+8-bit LSTM learn
the synthetic task to 0.0 PER through the complete pipeline
(train → newbob → forward → prior normalization → phone-loop decode →
scoring). Chance PER on this task is >90%. The assertions below allow
slack (<10 / <20) for backend numeric drift.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_root=None):
    out_root = out_root or "golden_out"
    from pytorch_kaldi_cgs_tpu.data import synth
    from pytorch_kaldi_cgs_tpu.utils import make_synth_cfg
    from pytorch_kaldi_cgs_tpu.runtime.experiment import run_exp

    root = os.path.join(out_root, "data")
    synth.generate(root, synth.SynthSpec(
        num_utts=60, num_phones=12, states_per_phone=2, feat_dim=13,
        min_len=60, max_len=180, noise=0.5, seed=17))

    results = {}
    t0 = time.time()
    cfg = make_synth_cfg(os.path.join(out_root, "mlp.cfg"), root,
                         os.path.join(out_root, "exp_mlp"), model="MLP",
                         hidden=128, n_epochs=4, n_chunks=2,
                         batch_size=128, lr=0.08, cw=2, lmwt_sweep=False)
    r = run_exp(cfg)
    per = [v for k, v in r.items() if k.startswith("wer_")]
    results["mlp_per"] = per[0] if per else None
    results["mlp_wall_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    cfg = make_synth_cfg(os.path.join(out_root, "lstm.cfg"), root,
                         os.path.join(out_root, "exp_lstm"), model="LSTM",
                         hidden=64, n_epochs=10, n_chunks=2,
                         batch_size=8, lr=0.004, opt="rmsprop", cw=0,
                         hcgs=True, hcgs_block="16,4", hcgs_sparse="25,50",
                         quant=True, param_quant="8,8")
    r = run_exp(cfg)
    per = [v for k, v in r.items() if k.startswith("wer_")]
    results["lstm_hcgs_per"] = per[0] if per else None
    results["lstm_wall_s"] = round(time.time() - t0, 1)

    print(json.dumps(results))
    ok = (results["mlp_per"] is not None and results["mlp_per"] < 10.0 and
          results["lstm_hcgs_per"] is not None and results["lstm_hcgs_per"] < 20.0)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
