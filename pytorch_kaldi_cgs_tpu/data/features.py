"""Native feature/label pipelines replacing the reference's Kaldi pipes.

The reference executes arbitrary shell pipelines from config fields, e.g.
``fea_opts=apply-cmvn --utt2spk=ark:... ark:cmvn.ark ark:- ark:- |
add-deltas --delta-order=2 ark:- ark:- |`` (ref:
cfg/TIMIT_CGS/TIMIT_LSTM_fmllr_hcgs.cfg:20, data_io.py:18) and
``lab_opts=ali-to-pdf`` / ``ali-to-phones --per-frame=true``
(ref: data_io.py:20-22). Here those commands are interpreted natively:
a small pipeline parser maps each command onto a pure-numpy transform, so
no Kaldi installation is required. Unknown commands raise, with an
escape-hatch flag to run the real shell pipeline if one exists.
"""

from __future__ import annotations

import re
import shlex
from typing import Callable, Dict, Iterator, Tuple

import numpy as np

from . import kaldi_io


# ---------------------------------------------------------------------------
# core transforms
# ---------------------------------------------------------------------------

def compute_cmvn_stats(feats: np.ndarray) -> np.ndarray:
    """Accumulate Kaldi-style CMVN stats: 2 x (dim+1) matrix
    (row0=[sum..., count], row1=[sumsq..., 0])."""
    dim = feats.shape[1]
    stats = np.zeros((2, dim + 1), dtype=np.float64)
    stats[0, :dim] = feats.sum(axis=0)
    stats[0, dim] = feats.shape[0]
    stats[1, :dim] = (feats.astype(np.float64) ** 2).sum(axis=0)
    return stats


def apply_cmvn(feats: np.ndarray, stats: np.ndarray, norm_vars: bool = False) -> np.ndarray:
    """Mean (and optionally variance) normalize using accumulated stats,
    matching Kaldi ``apply-cmvn`` semantics."""
    dim = feats.shape[1]
    count = stats[0, dim]
    mean = stats[0, :dim] / count
    out = feats - mean.astype(feats.dtype)
    if norm_vars:
        var = stats[1, :dim] / count - mean ** 2
        scale = 1.0 / np.sqrt(np.maximum(var, 1e-20))
        out = out * scale.astype(feats.dtype)
    return out


def add_deltas(feats: np.ndarray, order: int = 2, window: int = 2) -> np.ndarray:
    """Append delta features, matching Kaldi ``add-deltas``.

    Order-k deltas are the order-(k-1) stream convolved with the scaled
    ramp [-w..w]/(2*sum(i^2)), with edge frames replicated.
    """
    if order == 0:
        return feats
    T = feats.shape[0]
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    scales = np.arange(-window, window + 1, dtype=np.float64) / denom
    streams = [feats.astype(np.float64)]
    idx = np.arange(T)
    for _ in range(order):
        prev = streams[-1]
        delta = np.zeros_like(prev)
        for k, s in zip(range(-window, window + 1), scales):
            shifted = prev[np.clip(idx + k, 0, T - 1)]
            delta += s * shifted
        streams.append(delta)
    return np.concatenate(streams, axis=1).astype(feats.dtype)


def context_window(feats: np.ndarray, cw_left: int, cw_right: int) -> np.ndarray:
    """Splice +-N frames of context as extra columns (ref: data_io.py:105-118).

    Column block for lag l in [-left, right] is roll(x, l) (so the first
    block holds frames `left` steps in the future, matching the reference
    layout bit-for-bit), and the `left`/`right` wrapped edge rows are
    trimmed, shrinking the output to T - left - right rows.
    """
    if cw_left == 0 and cw_right == 0:
        return feats
    N = feats.shape[1]
    out = np.empty((feats.shape[0], N * (cw_left + cw_right + 1)), dtype=feats.dtype)
    col = 0
    for lag in range(-cw_left, cw_right + 1):
        out[:, col:col + N] = np.roll(feats, lag, axis=0)
        col += N
    return out[cw_left:out.shape[0] - cw_right]


# ---------------------------------------------------------------------------
# transition-model: ali-to-pdf / ali-to-phones
# ---------------------------------------------------------------------------

class TransitionModel:
    """Maps Kaldi transition-ids to pdf-ids / phones.

    Supports (a) our native JSON sidecar format ``{"tid2pdf": [...],
    "tid2phone": [...], "num_pdfs": N, "num_phones": P}`` and (b) the
    Kaldi *text* transition-model format (``<TransitionModel>`` ...
    ``<Triples>``/``<Tuples>``), which is what
    ``copy-transition-model --binary=false`` emits. Replaces the external
    ``ali-to-pdf`` / ``ali-to-phones`` / ``hmm-info`` binaries
    (ref: data_io.py:20-22, utils.py:628-640).
    """

    def __init__(self, tid2pdf: np.ndarray, tid2phone: np.ndarray,
                 num_pdfs: int, num_phones: int):
        # index 0 unused: kaldi transition-ids are 1-based
        self.tid2pdf = tid2pdf
        self.tid2phone = tid2phone
        self.num_pdfs = int(num_pdfs)
        self.num_phones = int(num_phones)

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, num_pdfs: int) -> "TransitionModel":
        """1:1 tid->pdf model (used by the synthetic dataset)."""
        ids = np.arange(-1, num_pdfs, dtype=np.int32)  # tid i+1 -> pdf i
        return cls(ids, ids, num_pdfs, num_pdfs)

    @classmethod
    def from_json(cls, path: str) -> "TransitionModel":
        import json
        with open(path) as f:
            d = json.load(f)
        return cls(np.asarray(d["tid2pdf"], dtype=np.int32),
                   np.asarray(d["tid2phone"], dtype=np.int32),
                   d["num_pdfs"], d["num_phones"])

    def to_json(self, path: str) -> None:
        import json
        with open(path, "w") as f:
            json.dump({"tid2pdf": self.tid2pdf.tolist(),
                       "tid2phone": self.tid2phone.tolist(),
                       "num_pdfs": self.num_pdfs,
                       "num_phones": self.num_phones}, f)

    @classmethod
    def from_kaldi_text(cls, path: str) -> "TransitionModel":
        """Parse the Kaldi text transition model: topology + triples/tuples.

        Transition-ids are laid out per transition-state; transition-state s
        (1-based, one per triple) owns as many tids as its HMM state has
        transitions in the topology. For the Triples (old) format both the
        self-loop and forward transitions share one pdf; for Tuples the
        self-loop uses self_loop_pdf and others use forward_pdf.
        """
        with open(path) as f:
            text = f.read()
        topo = _parse_text_topology(text)
        m = re.search(r"<(Triples|Tuples)>\s+(\d+)", text)
        if not m:
            raise ValueError("no <Triples>/<Tuples> in %s" % path)
        kind, count = m.group(1), int(m.group(2))
        body = text[m.end():text.index("</" + kind + ">")]
        nums = [int(t) for t in body.split()]
        per = 3 if kind == "Triples" else 4
        tuples = [tuple(nums[i * per:(i + 1) * per]) for i in range(count)]
        tid2pdf = [-1]
        tid2phone = [-1]
        max_pdf = -1
        for tup in tuples:
            if kind == "Triples":
                phone, hmm_state, fwd_pdf = tup
                self_pdf = fwd_pdf
            else:
                phone, hmm_state, fwd_pdf, self_pdf = tup
            max_pdf = max(max_pdf, fwd_pdf, self_pdf)
            transitions = topo[phone][hmm_state]
            for (dest, _p) in transitions:
                is_self = dest == hmm_state
                tid2pdf.append(self_pdf if is_self else fwd_pdf)
                tid2phone.append(phone)
        phones = sorted(topo.keys())
        return cls(np.asarray(tid2pdf, dtype=np.int32),
                   np.asarray(tid2phone, dtype=np.int32),
                   max_pdf + 1, len(phones))

    @classmethod
    def from_kaldi_binary(cls, path: str) -> "TransitionModel":
        """Parse a binary Kaldi model file (final.mdl): the leading
        TransitionModel object ("\\0B<TransitionModel> <Topology> ...
        <Triples>/<Tuples> ... <LogProbs> ...") — the acoustic model that
        follows is ignored. Implements the public Kaldi serialization:
        tokens are space-terminated strings, basic ints/floats are
        (size-byte, value) pairs, integer vectors are a counted sequence
        of such pairs."""
        import struct as _struct

        with open(path, "rb") as f:
            data = f.read()
        if not data.startswith(b"\x00B"):
            raise ValueError("%s is not a binary Kaldi file" % path)
        pos = [2]

        def tok() -> str:
            chars = []
            while data[pos[0]:pos[0] + 1] == b" ":
                pos[0] += 1
            while True:
                c = data[pos[0]:pos[0] + 1]
                pos[0] += 1
                if c in (b" ", b""):
                    break
                chars.append(c)
            return b"".join(chars).decode()

        def expect(t: str) -> None:
            got = tok()
            if got != t:
                raise ValueError("expected %s got %s in %s" % (t, got, path))

        def basic_int() -> int:
            size = data[pos[0]]
            pos[0] += 1
            if size == 4:
                v = _struct.unpack_from("<i", data, pos[0])[0]
            elif size == 8:
                v = _struct.unpack_from("<q", data, pos[0])[0]
            else:
                raise ValueError("unexpected int size %d" % size)
            pos[0] += size
            return v

        def basic_float() -> float:
            size = data[pos[0]]
            pos[0] += 1
            v = _struct.unpack_from("<f" if size == 4 else "<d", data, pos[0])[0]
            pos[0] += size
            return v

        def int_vector() -> list:
            n = basic_int()
            return [basic_int() for _ in range(n)]

        expect("<TransitionModel>")
        expect("<Topology>")
        phones = int_vector()
        _phone2idx = int_vector()
        sz = basic_int()
        is_hmm = True
        if sz == -1:  # newer "not-hmm" marker: separate self-loop pdf-classes
            is_hmm = False
            sz = basic_int()
        entries = []
        for _ in range(sz):
            n_states = basic_int()
            states = []
            for _s in range(n_states):
                fwd_class = basic_int()
                self_class = fwd_class if is_hmm else basic_int()
                n_trans = basic_int()
                trans = []
                for _t in range(n_trans):
                    dest = basic_int()
                    prob = basic_float()
                    trans.append((dest, prob))
                states.append((fwd_class, self_class, trans))
            entries.append(states)
        expect("</Topology>")
        kind = tok()
        if kind not in ("<Triples>", "<Tuples>"):
            raise ValueError("expected <Triples>/<Tuples>, got %s" % kind)
        n_tuples = basic_int()
        tuples = []
        for _ in range(n_tuples):
            phone = basic_int()
            hmm_state = basic_int()
            fwd_pdf = basic_int()
            self_pdf = basic_int() if kind == "<Tuples>" else fwd_pdf
            tuples.append((phone, hmm_state, fwd_pdf, self_pdf))
        expect("</Triples>" if kind == "<Triples>" else "</Tuples>")

        # phone2idx_ is indexed by phone id (length max_phone+1, -1 holes)
        entry_of_phone = {}
        for p in phones:
            idx = _phone2idx[p] if p < len(_phone2idx) else -1
            if 0 <= idx < len(entries):
                entry_of_phone[p] = entries[idx]

        tid2pdf = [-1]
        tid2phone = [-1]
        max_pdf = -1
        for phone, hmm_state, fwd_pdf, self_pdf in tuples:
            max_pdf = max(max_pdf, fwd_pdf, self_pdf)
            states = entry_of_phone[phone]
            _fc, _sc, trans = states[hmm_state]
            for dest, _p in trans:
                is_self = dest == hmm_state
                tid2pdf.append(self_pdf if is_self else fwd_pdf)
                tid2phone.append(phone)
        return cls(np.asarray(tid2pdf, dtype=np.int32),
                   np.asarray(tid2phone, dtype=np.int32),
                   max_pdf + 1, len(phones))

    @classmethod
    def load(cls, path: str) -> "TransitionModel":
        if path.endswith(".json"):
            return cls.from_json(path)
        with open(path, "rb") as f:
            head = f.read(2)
        if head == b"\x00B":
            return cls.from_kaldi_binary(path)
        return cls.from_kaldi_text(path)

    # -- ali mapping --------------------------------------------------------
    def ali_to_pdf(self, ali: np.ndarray) -> np.ndarray:
        return self.tid2pdf[np.asarray(ali, dtype=np.int64)]

    def ali_to_phones_per_frame(self, ali: np.ndarray) -> np.ndarray:
        return self.tid2phone[np.asarray(ali, dtype=np.int64)]

    def hmm_info(self) -> Dict[str, int]:
        """Replaces `hmm-info` output parsing (ref: utils.py:628-640)."""
        return {"number of pdfs": self.num_pdfs,
                "number of phones": self.num_phones}


def _parse_text_topology(text: str):
    """Parse <Topology> from Kaldi text model into
    {phone: {state: [(dest_state, prob), ...]}}."""
    topo_txt = text[text.index("<Topology>"):text.index("</Topology>")]
    entries = {}
    for m in re.finditer(r"<TopologyEntry>(.*?)</TopologyEntry>", topo_txt, re.S):
        body = m.group(1)
        fs = re.search(r"<ForPhones>(.*?)</ForPhones>", body, re.S)
        phones = [int(t) for t in fs.group(1).split()]
        states = {}
        for sm in re.finditer(
                r"<State>\s+(\d+)((?:\s+<PdfClass>\s+\d+)?(?:\s+<ForwardPdfClass>\s+\d+\s+<SelfLoopPdfClass>\s+\d+)?)"
                r"((?:\s+<Transition>\s+\d+\s+[\d.eE+-]+)*)\s+</State>", body):
            state = int(sm.group(1))
            trans = [(int(t), float(p)) for t, p in
                     re.findall(r"<Transition>\s+(\d+)\s+([\d.eE+-]+)", sm.group(3))]
            if sm.group(2).strip():  # emitting state
                states[state] = trans
        for ph in phones:
            entries[ph] = states
    return entries


# ---------------------------------------------------------------------------
# pipeline interpreter for fea_opts / lab_opts strings
# ---------------------------------------------------------------------------

def _parse_utt2spk(path: str) -> Dict[str, str]:
    mapping = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                mapping[parts[0]] = parts[1]
    return mapping


def _strip_rspec(arg: str) -> str:
    for pre in ("ark:", "scp:", "ark,t:"):
        if arg.startswith(pre):
            return arg[len(pre):]
    return arg


class FeaturePipeline:
    """Native interpreter for a ``fea_opts`` shell-pipeline string.

    Produces a per-utterance matrix→matrix transform. Supported commands:
    ``copy-feats``, ``apply-cmvn``, ``add-deltas``, ``splice-feats``.
    """

    def __init__(self, fea_opts: str):
        self.stages = []
        fea_opts = (fea_opts or "").strip()
        if not fea_opts:
            return
        for stage in fea_opts.split("|"):
            stage = stage.strip()
            if not stage:
                continue
            argv = shlex.split(stage)
            cmd, args = argv[0], argv[1:]
            if cmd == "copy-feats":
                continue
            elif cmd == "apply-cmvn":
                self.stages.append(self._make_cmvn(args))
            elif cmd == "add-deltas":
                self.stages.append(self._make_deltas(args))
            elif cmd == "splice-feats":
                self.stages.append(self._make_splice(args))
            else:
                raise ValueError(
                    "fea_opts command %r has no native equivalent" % cmd)

    @staticmethod
    def _make_cmvn(args):
        utt2spk = None
        norm_vars = False
        positional = []
        for a in args:
            if a.startswith("--utt2spk="):
                utt2spk = _parse_utt2spk(_strip_rspec(a.split("=", 1)[1]))
            elif a.startswith("--norm-vars="):
                norm_vars = a.split("=", 1)[1].lower() == "true"
            elif not a.startswith("--"):
                positional.append(a)
        stats_rspec = positional[0] if positional else None
        stats_by_key: Dict[str, np.ndarray] = {}
        if stats_rspec and _strip_rspec(stats_rspec) not in ("-", ""):
            for k, m in kaldi_io.read_mat_ark(stats_rspec):
                stats_by_key[k] = m

        def fn(key: str, mat: np.ndarray) -> np.ndarray:
            skey = utt2spk.get(key, key) if utt2spk else key
            if skey in stats_by_key:
                return apply_cmvn(mat, stats_by_key[skey], norm_vars)
            # fall back to per-utterance stats
            return apply_cmvn(mat, compute_cmvn_stats(mat), norm_vars)

        return fn

    @staticmethod
    def _make_deltas(args):
        order, window = 2, 2
        for a in args:
            if a.startswith("--delta-order="):
                order = int(a.split("=", 1)[1])
            elif a.startswith("--delta-window="):
                window = int(a.split("=", 1)[1])
        return lambda key, mat: add_deltas(mat, order, window)

    @staticmethod
    def _make_splice(args):
        left = right = 4
        for a in args:
            if a.startswith("--left-context="):
                left = int(a.split("=", 1)[1])
            elif a.startswith("--right-context="):
                right = int(a.split("=", 1)[1])
        return lambda key, mat: context_window(mat, left, right)

    def __call__(self, key: str, mat: np.ndarray) -> np.ndarray:
        for fn in self.stages:
            mat = fn(key, mat)
        return mat


def read_features(fea_scp: str, fea_opts: str = "") -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (key, processed-feature-matrix) from an scp list, applying
    the fea_opts pipeline natively (replaces ``copy-feats scp:.. ark:- |
    <fea_opts>``, ref: data_io.py:18)."""
    pipeline = FeaturePipeline(fea_opts)
    for key, mat in kaldi_io.read_mat_scp(fea_scp):
        yield key, pipeline(key, mat)


class LabelPipeline:
    """Native interpreter for ``lab_opts``: ali-to-pdf / ali-to-phones."""

    def __init__(self, lab_opts: str, tmodel: TransitionModel):
        self.tmodel = tmodel
        lab_opts = (lab_opts or "ali-to-pdf").strip()
        argv = lab_opts.split()
        cmd = argv[0]
        if cmd == "ali-to-pdf":
            self.fn = tmodel.ali_to_pdf
        elif cmd == "ali-to-phones":
            per_frame = any(a.startswith("--per-frame") and "true" in a for a in argv)
            if not per_frame:
                raise ValueError("only ali-to-phones --per-frame=true is supported")
            self.fn = tmodel.ali_to_phones_per_frame
        else:
            raise ValueError("lab_opts command %r has no native equivalent" % cmd)

    def __call__(self, ali: np.ndarray) -> np.ndarray:
        return self.fn(ali)


def read_labels(lab_folder: str, lab_opts: str, tmodel: TransitionModel
                ) -> Dict[str, np.ndarray]:
    """Read all ali.*.gz archives in a folder and map transition-ids with
    lab_opts (replaces ``gunzip -c dir/ali*.gz | ali-to-pdf dir/final.mdl``,
    ref: data_io.py:20-22)."""
    import glob
    pipeline = LabelPipeline(lab_opts, tmodel)
    out: Dict[str, np.ndarray] = {}
    paths = sorted(glob.glob(lab_folder.rstrip("/") + "/ali*.gz")) or \
        sorted(glob.glob(lab_folder.rstrip("/") + "/ali*.ark"))
    for path in paths:
        for key, ali in kaldi_io.read_vec_int_ark(path):
            out[key] = pipeline(ali)
    return out


def compute_prior_counts(labels: Dict[str, np.ndarray], num_classes: int) -> np.ndarray:
    """Class priors for posterior normalization (replaces
    ``analyze-counts``, ref: utils.py:684-689)."""
    counts = np.zeros(num_classes, dtype=np.float64)
    for lab in labels.values():
        counts += np.bincount(lab, minlength=num_classes)
    return counts


def write_prior_counts(counts: np.ndarray, path: str) -> None:
    with open(path, "w") as f:
        f.write("[ " + " ".join(str(int(c)) for c in counts) + " ]\n")
