"""Raw-waveform feature extraction for SincNet/CNN front-ends
(ref: save_raw_fea.py): slices each wav into per-frame windows aligned
with the label alignments and writes them as a feature ark/scp, so raw
samples flow through the standard chunk pipeline.

usage: python -m pytorch_kaldi_cgs_tpu.bin.save_raw_fea \
    --wav-lst wav.scp --lab-folder ali_dir --out-folder raw/train \
    [--wlen-ms 200] [--fs 16000] [--shift-ms 10]

wav.scp lines: "utt_id /path/file.wav".
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

from ..data import kaldi_io
from ..data.dataset import find_transition_model
from ..data.features import LabelPipeline


def wav_to_frames(signal: np.ndarray, n_frames: int, wlen: int,
                  shift: int) -> np.ndarray:
    """(n_frames, wlen) sliding windows, zero-padded at the edges,
    amplitude-normalized."""
    signal = signal.astype(np.float32)
    peak = np.abs(signal).max() or 1.0
    signal = signal / peak
    pad = np.zeros(wlen, np.float32)
    signal = np.concatenate([pad, signal, pad])
    out = np.zeros((n_frames, wlen), np.float32)
    for i in range(n_frames):
        beg = i * shift
        out[i] = signal[beg:beg + wlen]
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav-lst", required=True)
    p.add_argument("--lab-folder", required=True)
    p.add_argument("--lab-opts", default="ali-to-pdf")
    p.add_argument("--out-folder", required=True)
    p.add_argument("--fs", type=int, default=16000)
    p.add_argument("--wlen-ms", type=float, default=200.0)
    p.add_argument("--shift-ms", type=float, default=10.0)
    args = p.parse_args(argv)

    import scipy.io.wavfile

    os.makedirs(args.out_folder, exist_ok=True)
    wlen = int(args.fs * args.wlen_ms / 1000)
    shift = int(args.fs * args.shift_ms / 1000)

    tmodel = find_transition_model(args.lab_folder)
    pipe = LabelPipeline(args.lab_opts, tmodel)
    n_frames_by_utt = {}
    for ali_path in sorted(glob.glob(os.path.join(args.lab_folder, "ali*.gz"))):
        for key, ali in kaldi_io.read_vec_int_ark(ali_path):
            n_frames_by_utt[key] = len(pipe(ali))

    ark = os.path.join(args.out_folder, "feats_raw.ark")
    scp = os.path.join(args.out_folder, "feats_raw.scp")
    n_done = 0
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        for line in open(args.wav_lst):
            parts = line.split()
            if len(parts) < 2:
                continue
            utt, path = parts[0], parts[1]
            if utt not in n_frames_by_utt:
                continue
            fs, signal = scipy.io.wavfile.read(path)
            if signal.ndim > 1:
                signal = signal[:, 0]
            w.write(utt, wav_to_frames(signal, n_frames_by_utt[utt], wlen, shift))
            n_done += 1
    print("wrote %d utterances to %s" % (n_done, ark))
    return 0


if __name__ == "__main__":
    sys.exit(main())
