"""Native feature extraction CLI — the ``compute-mfcc-feats`` /
``compute-fbank-feats`` role (the Kaldi binaries that produce the
feats.scp every reference config consumes), computed with the on-device
frontend (ops/frontend).

usage: python -m pytorch_kaldi_cgs_tpu.bin.compute_feats \
    --wav-scp wav.scp --out-ark feats.ark --out-scp feats.scp \
    [--type mfcc|fbank] [--sample-rate 16000] [--num-mel-bins 23]
    [--num-ceps 13] [--frame-length-ms 25] [--frame-shift-ms 10]

wav.scp lines: "utt_id /path/file.wav".
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..data import kaldi_io
from ..ops.frontend import Frontend


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav-scp", required=True)
    p.add_argument("--out-ark", required=True)
    p.add_argument("--out-scp", default=None)
    p.add_argument("--type", choices=["mfcc", "fbank"], default="mfcc")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--num-mel-bins", type=int, default=23)
    p.add_argument("--num-ceps", type=int, default=13)
    p.add_argument("--frame-length-ms", type=float, default=25.0)
    p.add_argument("--frame-shift-ms", type=float, default=10.0)
    p.add_argument("--use-energy", action="store_true")
    args = p.parse_args(argv)

    import scipy.io.wavfile

    fe = Frontend(sample_rate=args.sample_rate,
                  frame_length_ms=args.frame_length_ms,
                  frame_shift_ms=args.frame_shift_ms,
                  num_mel_bins=args.num_mel_bins, num_ceps=args.num_ceps,
                  use_energy=args.use_energy)
    extract = fe.mfcc if args.type == "mfcc" else fe.fbank

    n = 0
    with kaldi_io.ArkScpWriter(args.out_ark, args.out_scp) as w:
        for line in open(args.wav_scp):
            parts = line.split()
            if len(parts) < 2:
                continue
            utt, path = parts[0], parts[1]
            fs, signal = scipy.io.wavfile.read(path)
            if fs != args.sample_rate:
                raise ValueError("%s: sample rate %d != %d"
                                 % (path, fs, args.sample_rate))
            if signal.ndim > 1:
                signal = signal[:, 0]
            sig = signal.astype(np.float32)
            if signal.dtype.kind == "i":
                sig = sig / np.iinfo(signal.dtype).max
            feats = np.asarray(extract(sig))
            w.write(utt, feats.astype(np.float32))
            n += 1
    print("extracted %s features for %d utterances -> %s"
          % (args.type, n, args.out_ark))
    return 0


if __name__ == "__main__":
    sys.exit(main())
