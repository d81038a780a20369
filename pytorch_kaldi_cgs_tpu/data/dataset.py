"""Chunk dataset assembly: the native equivalent of the reference's
``load_dataset`` / ``load_chunk`` / ``read_lab_fea``
(ref: data_io.py:16-282), with Kaldi subprocess pipes replaced by the
native readers in :mod:`.kaldi_io` / :mod:`.features`.

Output contract (kept verbatim so the chunk trainer and model DSL can
index it the same way the reference does):
  * all feature streams and then all label streams are column-stacked
    into one big ``(total_frames, sum(dims)+n_labs)`` float matrix;
  * ``end_index`` holds cumulative sentence end rows;
  * each feature stream records its column range ``[col_start, col_end)``
    (ref: data_io.py:225-240), each label its column (ref: data_io.py:258-263).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import kaldi_io
from .features import (FeaturePipeline, LabelPipeline, TransitionModel,
                       context_window)


@dataclass
class FeaStream:
    """One feature stream of a dataset (one fea_name block in the cfg)."""
    name: str
    fea_lst: str
    fea_opts: str = ""
    cw_left: int = 0
    cw_right: int = 0
    # filled in by load_chunk_multi:
    col_start: int = -1
    col_end: int = -1

    @property
    def dim(self) -> int:
        return self.col_end - self.col_start


@dataclass
class LabStream:
    """One label stream (one lab_name block in the cfg)."""
    name: str
    lab_folder: str
    lab_opts: str = "ali-to-pdf"
    lab_count_file: str = "auto"
    lab_data_folder: str = ""
    lab_graph: str = ""
    col: int = -1


def find_transition_model(lab_folder: str) -> TransitionModel:
    """Locate the transition model for a label folder. Prefers our JSON
    sidecar, then Kaldi text models (``final.txt``/text ``final.mdl``)."""
    for cand in ("final.mdl.json", "trans.json"):
        p = os.path.join(lab_folder, cand)
        if os.path.exists(p):
            return TransitionModel.from_json(p)
    for cand in ("final.txt", "final.mdl"):
        p = os.path.join(lab_folder, cand)
        if os.path.exists(p):
            with open(p, "rb") as f:
                head = f.read(64)
            if head.startswith(b"\x00B"):
                return TransitionModel.from_kaldi_binary(p)
            if b"<TransitionModel>" in head:
                return TransitionModel.from_kaldi_text(p)
    raise FileNotFoundError(
        "no usable transition model in %s (need final.mdl.json or a "
        "binary/text Kaldi final.mdl)" % lab_folder)


def load_dataset(fea_scp: str, fea_opts: str, lab_folder: Optional[str],
                 lab_opts: Optional[str], max_seq_length: int,
                 fea_only: bool = False
                 ) -> Tuple[List[str], np.ndarray, np.ndarray, np.ndarray]:
    """Load one (feature-list, label-folder) pair as concatenated frames.

    Mirrors ref data_io.py:16-88: inner-join fea/lab keys, sort by length,
    split sentences longer than ``max_seq_length`` into max-length pieces
    with a minimum final piece of max/4, return
    (names, frames, labels, end_index).
    """
    pipeline = FeaturePipeline(fea_opts)
    fea: Dict[str, np.ndarray] = {}
    # multi-host: each host reads only its interleaved share of the list
    # (chunk lists are shuffled/length-sorted upstream, so shards stay
    # balanced); single-host this is the path itself, zero overhead
    from ..parallel.multihost import shard_scp_for_host
    for key, mat in kaldi_io.read_mat_scp(shard_scp_for_host(fea_scp)):
        fea[key] = pipeline(key, mat)

    lab: Dict[str, np.ndarray] = {}
    if not fea_only:
        tmodel = find_transition_model(lab_folder)
        lpipe = LabelPipeline(lab_opts, tmodel)
        import glob
        ali_paths = sorted(glob.glob(os.path.join(lab_folder, "ali*.gz"))) or \
            sorted(glob.glob(os.path.join(lab_folder, "ali*.ark")))
        for path in ali_paths:
            for key, ali in kaldi_io.read_vec_int_ark(path):
                if key in fea:
                    lab[key] = lpipe(ali)
        fea = {k: v for k, v in fea.items() if k in lab}

    names: List[str] = []
    fea_parts: List[np.ndarray] = []
    lab_parts: List[np.ndarray] = []
    for k in sorted(sorted(fea.keys()), key=lambda k: len(fea[k])):
        f = fea[k]
        l = lab[k] if not fea_only else np.zeros((f.shape[0],), dtype=np.int32)
        if max_seq_length > 0 and len(f) > max_seq_length:
            # split with a minimum final piece of max/4 (ref: data_io.py:41-65)
            start = 0
            piece = 0
            while start < len(f):
                remaining = len(f) - start
                if remaining > max_seq_length + max_seq_length / 4:
                    stop = start + max_seq_length
                else:
                    stop = len(f)
                fea_parts.append(f[start:stop])
                lab_parts.append(l[start:stop])
                names.append("%s_split%d" % (k, piece))
                piece += 1
                start = stop
        else:
            fea_parts.append(f)
            lab_parts.append(l)
            names.append(k)

    # final sort by (possibly split) length
    order = sorted(range(len(fea_parts)), key=lambda i: fea_parts[i].shape[0])
    fea_parts = [fea_parts[i] for i in order]
    lab_parts = [lab_parts[i] for i in order]
    names = [names[i] for i in order]

    end_index = np.cumsum([p.shape[0] for p in fea_parts]).astype(np.int64)
    return (names, np.concatenate(fea_parts) if fea_parts else np.zeros((0, 0)),
            np.concatenate(lab_parts) if lab_parts else np.zeros((0,)),
            end_index)


def load_chunk(fea_scp: str, fea_opts: str, lab_folder: Optional[str],
               lab_opts: Optional[str], cw_left: int, cw_right: int,
               max_seq_length: int, fea_only: bool = False
               ) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Load + context window + chunk-level mean/var normalization + label
    column append (ref: data_io.py:121-145)."""
    names, data, labs, end_index = load_dataset(
        fea_scp, fea_opts, lab_folder, lab_opts, max_seq_length, fea_only)
    if cw_left != 0 or cw_right != 0:
        data = context_window(data, cw_left, cw_right)
    end_index = end_index - cw_left
    end_index[-1] = end_index[-1] - cw_right
    # per-chunk mean/variance normalization (ref: data_io.py:134)
    data = (data - np.mean(data, axis=0)) / np.maximum(np.std(data, axis=0), 1e-10)
    labs = labs - labs.min() if not fea_only and labs.size else labs
    if cw_right > 0:
        labs = labs[cw_left:-cw_right]
    else:
        labs = labs[cw_left:]
    data = np.column_stack((data, labs))
    return names, data, end_index


@dataclass
class ChunkData:
    """One loaded chunk: the concatenated frame matrix plus stream layout."""
    names: List[str]
    data: np.ndarray                 # (frames, fea_cols + n_labs)
    end_index: np.ndarray            # cumulative sentence ends
    fea_streams: Dict[str, FeaStream] = field(default_factory=dict)
    lab_streams: Dict[str, LabStream] = field(default_factory=dict)

    def fea_cols(self, name: str) -> slice:
        s = self.fea_streams[name]
        return slice(s.col_start, s.col_end)

    def lab_col(self, name: str) -> int:
        return self.lab_streams[name].col

    @property
    def seq_lengths(self) -> np.ndarray:
        prev = np.concatenate([[0], self.end_index[:-1]])
        return self.end_index - prev


def load_chunk_multi(fea_streams: List[FeaStream], lab_streams: List[LabStream],
                     max_seq_length: int, fea_only: bool = False,
                     shuffle_frames: bool = False,
                     seed: int = 0) -> ChunkData:
    """Load all feature × label streams of a chunk and column-stack them,
    compensating for per-stream context windows (ref: data_io.py:155-282)."""
    cw_left_max = max(s.cw_left for s in fea_streams)
    cw_right_max = max(s.cw_right for s in fea_streams)

    data_set = None
    labs = None
    names: List[str] = []
    end_index = None
    fea_index = 0
    out_fea: Dict[str, FeaStream] = {}
    out_lab: Dict[str, LabStream] = {}

    lab_iter = lab_streams if (lab_streams and not fea_only) else [
        LabStream(name="none", lab_folder="", lab_opts="")]

    for cnt_fea, fs in enumerate(fea_streams):
        for cnt_lab, ls in enumerate(lab_iter):
            lab_folder = None if fea_only else ls.lab_folder
            lab_opts = None if fea_only else ls.lab_opts
            nm, dat, ei = load_chunk(fs.fea_lst, fs.fea_opts, lab_folder,
                                     lab_opts, fs.cw_left, fs.cw_right,
                                     max_seq_length, fea_only)
            # align streams with different context windows (ref: data_io.py:213-216)
            lo = cw_left_max - fs.cw_left
            hi = dat.shape[0] - (cw_right_max - fs.cw_right)
            labs_fea = dat[lo:hi, -1]
            dat_fea = dat[lo:hi, :-1]
            ei = ei - lo
            ei[-1] = ei[-1] - (cw_right_max - fs.cw_right)

            if cnt_fea == 0 and cnt_lab == 0:
                data_set = dat_fea
                labs = labs_fea
                end_index = ei
                names = nm
            else:
                if cnt_fea == 0:
                    labs = np.column_stack((labs, labs_fea))
                if cnt_lab == 0:
                    if nm != names:
                        raise ValueError("sentence ids differ across feature streams")
                    if not np.array_equal(end_index, ei):
                        raise ValueError("end_index differs across feature streams")
                    data_set = np.column_stack((data_set, dat_fea))
            if cnt_lab == 0:
                stream = FeaStream(fs.name, fs.fea_lst, fs.fea_opts,
                                   fs.cw_left, fs.cw_right,
                                   col_start=fea_index,
                                   col_end=fea_index + dat_fea.shape[1])
                fea_index += dat_fea.shape[1]
                out_fea[fs.name] = stream

    if labs is not None and labs.ndim == 1:
        labs = labs[:, None]

    n_fea_cols = data_set.shape[1]
    if not fea_only:
        for i, ls in enumerate(lab_iter):
            out_lab[ls.name] = LabStream(ls.name, ls.lab_folder, ls.lab_opts,
                                         ls.lab_count_file, ls.lab_data_folder,
                                         ls.lab_graph, col=n_fea_cols + i)
        data_set = np.column_stack((data_set, labs))

    if shuffle_frames:
        rng = np.random.RandomState(seed)
        rng.shuffle(data_set)

    return ChunkData(names=names, data=data_set, end_index=end_index,
                     fea_streams=out_fea, lab_streams=out_lab)
