"""Synthetic miniature TIMIT-shaped dataset generator.

The upstream toolkit's de-facto integration fixture is a tiny Kaldi data
folder (``quick_test/``) that is referenced throughout the reference
README (ref: README.md:334-379) but not shipped. This module generates a
fully self-contained stand-in on disk in the same on-disk dialect our
native readers speak: feature ark/scp files, gzipped alignment archives,
a JSON transition model, utt2spk, prior counts and reference phone
transcriptions — enough to run every phase (train/valid/forward/decode)
end-to-end without Kaldi or real speech.

Data model: ``num_phones`` classes; each utterance is a random sequence
of phone segments (3-20 frames); frame features are drawn from a
class-conditional Gaussian (distinct random means), so acoustic models
can genuinely learn the frame classification task and PER falls well
below chance. Context-dependent ("cd") labels are simulated with
``states_per_phone`` sub-states per phone walked left-to-right within
each segment.
"""

from __future__ import annotations

import gzip
import json
import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from . import kaldi_io
from .features import TransitionModel, write_prior_counts


@dataclass
class SynthSpec:
    num_phones: int = 24
    states_per_phone: int = 2      # cd pdfs = num_phones * states_per_phone
    feat_dim: int = 13
    num_utts: int = 60
    min_len: int = 60
    max_len: int = 220
    min_seg: int = 3
    max_seg: int = 20
    noise: float = 0.6
    seed: int = 1234
    # word-level task: >0 builds a random lexicon of this many words
    # (2-4 phones each); utterances become word sequences, `text` holds
    # word transcripts, and the graph dir gains lexicon.txt/words.txt
    # for HCLG construction (the LibriSpeech-class capability)
    lexicon_size: int = 0
    # --- hard mode (capacity-discriminating corpus) --------------------
    # The default corpus (distinct Gaussian means, low noise) is frame-
    # wise separable: every CGS design point reaches ~0 PER, so accuracy
    # runs cannot reproduce the reference's PER-vs-compression curve
    # (ref: cfg/record.md:29-105). hard=True layers in the variabilities
    # that make real acoustic modelling capacity-hungry:
    #   * overlapping classes: latent class means with small separation
    #     (mean_scale) + frame noise -> high frame-wise Bayes error that
    #     only temporal integration over the segment can recover;
    #   * coarticulation: frames near segment boundaries interpolate
    #     between the neighbouring phones' latents (boundary_frac);
    #   * segment-coherent nuisance latent (seg_noise): averaging over
    #     the segment helps, rewarding recurrent capacity;
    #   * speaker variability: per-speaker random affine warp of the
    #     latent (spk_scale), with DISJOINT speakers per split, so the
    #     model must learn a speaker-invariant decision rule;
    #   * a fixed random nonlinear observation map latent->tanh->feats
    #     (mix_dim), so inverting it is a genuine function-approximation
    #     load that shrinks with parameter count.
    hard: bool = False
    latent_dim: int = 24
    mix_dim: int = 96
    mean_scale: float = 1.0
    boundary_frac: float = 0.3
    seg_noise: float = 0.35
    spk_scale: float = 0.35
    num_speakers: int = 24

    @property
    def num_pdfs(self) -> int:
        return self.num_phones * self.states_per_phone


def generate(root: str, spec: SynthSpec = SynthSpec(),
             splits: Dict[str, int] | None = None) -> Dict[str, str]:
    """Write train/dev/test splits under ``root``; returns folder paths.

    Layout per split (mirrors the Kaldi data-folder conventions the
    reference configs point at, cfg/TIMIT_CGS/*.cfg):
      <root>/<split>/feats.scp, feats.ark, utt2spk, text
      <root>/<split>_ali/ali.1.gz, final.mdl.json, ali_train_pdf.counts
    """
    if splits is None:
        splits = {"train": spec.num_utts, "dev": max(spec.num_utts // 4, 4),
                  "test": max(spec.num_utts // 4, 4)}
    rng = np.random.RandomState(spec.seed)
    if spec.hard:
        # latent class means (small separation) + fixed nonlinear
        # observation map, shared across splits
        means_lat = rng.randn(spec.num_pdfs, spec.latent_dim) * spec.mean_scale
        phone_lat = means_lat.reshape(
            spec.num_phones, spec.states_per_phone, -1).mean(axis=1)
        mix_w1 = rng.randn(spec.mix_dim, spec.latent_dim) * (
            1.5 / np.sqrt(spec.latent_dim))
        mix_b1 = rng.randn(spec.mix_dim) * 0.5
        mix_w2 = rng.randn(spec.feat_dim, spec.mix_dim) * (
            2.0 / np.sqrt(spec.mix_dim))
        means = None
    else:
        # class-conditional means shared across splits
        means = rng.randn(spec.num_pdfs, spec.feat_dim) * 2.0
    # word-level mode: fixed random lexicon (distinct pronunciations)
    lexicon: Dict[str, List[int]] = {}
    if spec.lexicon_size > 0:
        seen = set()
        while len(lexicon) < spec.lexicon_size:
            pron = tuple(rng.randint(spec.num_phones)
                         for _ in range(rng.randint(2, 5)))
            if pron in seen:
                continue
            seen.add(pron)
            lexicon["w%03d" % len(lexicon)] = list(pron)
        lex_words = sorted(lexicon)
    tmodel = TransitionModel.identity(spec.num_pdfs)
    # phone of pdf p is p // states_per_phone; expose through tid2phone
    tmodel.tid2phone = np.concatenate(
        [[-1], np.arange(spec.num_pdfs, dtype=np.int32) // spec.states_per_phone])
    tmodel.num_phones = spec.num_phones

    out: Dict[str, str] = {}
    for split, n_utts in splits.items():
        if spec.hard:
            # DISJOINT speakers per split (test speakers unseen in
            # training, as in TIMIT): affine latent warps drawn from a
            # split-specific stream
            s_rng = np.random.RandomState(
                (spec.seed + sum(ord(c) for c in split) * 7919) % 2 ** 31)
            spk_A = np.stack([
                np.eye(spec.latent_dim)
                + spec.spk_scale * s_rng.randn(spec.latent_dim,
                                               spec.latent_dim)
                / np.sqrt(spec.latent_dim)
                for _ in range(spec.num_speakers)])
            spk_b = spec.spk_scale * s_rng.randn(spec.num_speakers,
                                                 spec.latent_dim)
        data_dir = os.path.join(root, split)
        ali_dir = os.path.join(root, split + "_ali")
        os.makedirs(data_dir, exist_ok=True)
        os.makedirs(ali_dir, exist_ok=True)

        utt2spk = open(os.path.join(data_dir, "utt2spk"), "w")
        text = open(os.path.join(data_dir, "text"), "w")
        ali_buf = gzip.open(os.path.join(ali_dir, "ali.1.gz"), "wb")
        counts = np.zeros(spec.num_pdfs, dtype=np.float64)

        with kaldi_io.ArkScpWriter(os.path.join(data_dir, "feats.ark"),
                                   os.path.join(data_dir, "feats.scp")) as w:
            for u in range(n_utts):
                utt = "%s_utt%03d" % (split, u)
                T = rng.randint(spec.min_len, spec.max_len + 1)
                phones: List[int] = []
                words: List[str] = []
                pdf_seq: List[int] = []
                seg_lens: List[int] = []

                def emit_phone(ph: int) -> None:
                    seg = rng.randint(spec.min_seg, spec.max_seg + 1)
                    phones.append(ph)
                    seg_lens.append(seg)
                    # walk sub-states left to right within the segment
                    for i in range(seg):
                        state = min(i * spec.states_per_phone // seg,
                                    spec.states_per_phone - 1)
                        pdf_seq.append(ph * spec.states_per_phone + state)

                if lexicon:
                    # word-level: sample whole words until T frames filled
                    while len(pdf_seq) < T:
                        wd = lex_words[rng.randint(len(lex_words))]
                        words.append(wd)
                        for ph in lexicon[wd]:
                            emit_phone(ph)
                    # never truncate mid-word: extend T to the word end
                    T = len(pdf_seq)
                else:
                    while len(pdf_seq) < T:
                        emit_phone(rng.randint(spec.num_phones))
                pdf_seq = np.array(pdf_seq[:T], dtype=np.int32)
                if spec.hard:
                    spk = u % spec.num_speakers
                    # per-frame latent = state mean blended with a
                    # time-smoothed phone-center track (coarticulation)
                    lat = means_lat[pdf_seq]
                    pc = phone_lat[pdf_seq // spec.states_per_phone]
                    kern = np.array([1., 2., 3., 2., 1.])
                    kern /= kern.sum()
                    sm = np.empty_like(pc)
                    for d in range(pc.shape[1]):
                        sm[:, d] = np.convolve(pc[:, d], kern, mode="same")
                    # convolve zero-pads past the edges; renormalize
                    ones = np.convolve(np.ones(len(pc)), kern, mode="same")
                    sm /= ones[:, None]
                    lat = (1.0 - spec.boundary_frac) * lat \
                        + spec.boundary_frac * sm
                    # segment-coherent nuisance latent + frame noise
                    seg_u = rng.randn(len(seg_lens), spec.latent_dim) \
                        * spec.seg_noise
                    lat = lat + np.repeat(seg_u, seg_lens, axis=0)[:T] \
                        + rng.randn(T, spec.latent_dim) * spec.noise
                    # speaker warp, then the fixed nonlinear mixing
                    z = lat @ spk_A[spk].T + spk_b[spk]
                    h = np.tanh(z @ mix_w1.T + mix_b1)
                    feats = h @ mix_w2.T \
                        + rng.randn(T, spec.feat_dim) * 0.1
                else:
                    feats = means[pdf_seq] \
                        + rng.randn(T, spec.feat_dim) * spec.noise
                w.write(utt, feats.astype(np.float32))
                # alignments hold transition-ids = pdf+1 (identity model)
                kaldi_io.write_vec_int(ali_buf, pdf_seq + 1, key=utt)
                counts += np.bincount(pdf_seq, minlength=spec.num_pdfs)
                utt2spk.write("%s spk%d\n" % (
                    utt, u % spec.num_speakers if spec.hard else u % 5))
                if lexicon:
                    text.write("%s %s\n" % (utt, " ".join(words)))
                else:
                    text.write("%s %s\n" % (utt,
                                            " ".join(str(p) for p in phones)))
        utt2spk.close()
        text.close()
        ali_buf.close()
        tmodel.to_json(os.path.join(ali_dir, "final.mdl.json"))
        write_prior_counts(counts, os.path.join(ali_dir, "ali_train_pdf.counts"))
        out[split] = data_dir
        out[split + "_ali"] = ali_dir
    # "graph" descriptor for the decoder: phone-loop HMM, or a word task
    # with lexicon/word-symbol files for HCLG construction
    graph_dir = os.path.join(root, "graph")
    os.makedirs(graph_dir, exist_ok=True)
    if lexicon:
        with open(os.path.join(graph_dir, "graph.json"), "w") as f:
            json.dump({"type": "word", "num_phones": spec.num_phones,
                       "states_per_phone": spec.states_per_phone}, f)
        with open(os.path.join(graph_dir, "lexicon.txt"), "w") as f:
            for wd in lex_words:
                f.write("%s %s\n" % (wd, " ".join(str(p)
                                                  for p in lexicon[wd])))
        with open(os.path.join(graph_dir, "words.txt"), "w") as f:
            f.write("<eps> 0\n")
            for i, wd in enumerate(lex_words):
                f.write("%s %d\n" % (wd, i + 1))
    else:
        with open(os.path.join(graph_dir, "graph.json"), "w") as f:
            json.dump({"type": "phone_loop", "num_phones": spec.num_phones,
                       "states_per_phone": spec.states_per_phone}, f)
    out["graph"] = graph_dir
    return out


def read_text(path: str) -> Dict[str, List[int]]:
    """Read reference transcriptions (utt -> phone-id sequence)."""
    out: Dict[str, List[int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            out[parts[0]] = [int(t) for t in parts[1:]]
    return out
