"""ctypes bindings for the native C++ components (native/libpkc_native.so):
fast ark I/O and the WFST beam-search decoder.

The library is built with ``make -C native`` (done lazily here on first
use if a toolchain is available). Everything has a pure-Python fallback,
so the framework works without the native lib — it is the fast path, not
a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_ROOT, "native", "libpkc_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.join(_ROOT, "native"), "-s"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pkc_ark_open.restype = ctypes.c_void_p
    lib.pkc_ark_open.argtypes = [ctypes.c_char_p]
    lib.pkc_ark_close.argtypes = [ctypes.c_void_p]
    lib.pkc_ark_next_mat_header.restype = ctypes.c_int
    lib.pkc_ark_next_mat_header.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.pkc_ark_read_mat_data.restype = ctypes.c_int
    lib.pkc_ark_read_mat_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pkc_ark_next_vec_header.restype = ctypes.c_int
    lib.pkc_ark_next_vec_header.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64)]
    lib.pkc_ark_read_vec_data.restype = ctypes.c_int
    lib.pkc_ark_read_vec_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pkc_ark_write_mat.restype = ctypes.c_int
    lib.pkc_ark_write_mat.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64]
    lib.pkc_fst_load_text.restype = ctypes.c_void_p
    lib.pkc_fst_load_text.argtypes = [ctypes.c_char_p]
    lib.pkc_fst_load_raw.restype = ctypes.c_void_p
    lib.pkc_fst_load_raw.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
    lib.pkc_fst_free.argtypes = [ctypes.c_void_p]
    lib.pkc_fst_num_states.restype = ctypes.c_int64
    lib.pkc_fst_num_states.argtypes = [ctypes.c_void_p]
    lib.pkc_fst_num_arcs.restype = ctypes.c_int64
    lib.pkc_fst_num_arcs.argtypes = [ctypes.c_void_p]
    lib.pkc_decode.restype = ctypes.c_int64
    lib.pkc_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_double, ctypes.c_int64,
                               ctypes.c_double, ctypes.c_void_p,
                               ctypes.c_int64]
    lib.pkc_decode_ctm.restype = ctypes.c_int64
    lib.pkc_decode_ctm.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_double, ctypes.c_int64,
                                   ctypes.c_double, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_int64]
    lib.pkc_decode_batch.restype = None
    lib.pkc_decode_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_double,
                                     ctypes.c_int64, ctypes.c_double,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.pkc_decode_lattice.restype = ctypes.c_void_p
    lib.pkc_decode_lattice.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_double, ctypes.c_double,
                                       ctypes.c_int64, ctypes.c_double]
    lib.pkc_decode_lattice_batch.restype = None
    lib.pkc_decode_lattice_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64]
    lib.pkc_lattice_free.argtypes = [ctypes.c_void_p]
    lib.pkc_lattice_num_nodes.restype = ctypes.c_int64
    lib.pkc_lattice_num_nodes.argtypes = [ctypes.c_void_p]
    lib.pkc_lattice_num_arcs.restype = ctypes.c_int64
    lib.pkc_lattice_num_arcs.argtypes = [ctypes.c_void_p]
    lib.pkc_lattice_nodes.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p]
    lib.pkc_lattice_arcs.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.pkc_lattice_best_path.restype = ctypes.c_int64
    lib.pkc_lattice_best_path.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                          ctypes.c_void_p, ctypes.c_int64]
    lib.pkc_lattice_ctm_conf.restype = ctypes.c_int64
    lib.pkc_lattice_ctm_conf.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# ark reading
# ---------------------------------------------------------------------------

def read_mat_ark_native(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Fast native matrix-ark iterator (binary FM/DM only)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    r = lib.pkc_ark_open(path.encode())
    if not r:
        raise FileNotFoundError(path)
    key = ctypes.create_string_buffer(512)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    try:
        while True:
            rc = lib.pkc_ark_next_mat_header(r, key, 512,
                                             ctypes.byref(rows),
                                             ctypes.byref(cols))
            if rc == 0:
                return
            if rc < 0:
                raise IOError("bad ark entry in %s" % path)
            out = np.empty((rows.value, cols.value), np.float32)
            if lib.pkc_ark_read_mat_data(r, out.ctypes.data_as(ctypes.c_void_p)) < 0:
                raise IOError("short read in %s" % path)
            yield key.value.decode(), out
    finally:
        lib.pkc_ark_close(r)


def read_vec_int_ark_native(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    r = lib.pkc_ark_open(path.encode())
    if not r:
        raise FileNotFoundError(path)
    key = ctypes.create_string_buffer(512)
    n = ctypes.c_int64()
    try:
        while True:
            rc = lib.pkc_ark_next_vec_header(r, key, 512, ctypes.byref(n))
            if rc == 0:
                return
            if rc < 0:
                raise IOError("bad ark entry in %s" % path)
            out = np.empty(n.value, np.int32)
            if lib.pkc_ark_read_vec_data(r, out.ctypes.data_as(ctypes.c_void_p)) < 0:
                raise IOError("short read in %s" % path)
            yield key.value.decode(), out
    finally:
        lib.pkc_ark_close(r)


def write_mat_native(path: str, key: str, mat: np.ndarray) -> None:
    lib = get_lib()
    mat = np.ascontiguousarray(mat, np.float32)
    rc = lib.pkc_ark_write_mat(path.encode(), key.encode(),
                               mat.ctypes.data_as(ctypes.c_void_p),
                               mat.shape[0], mat.shape[1])
    if rc < 0:
        raise IOError("write failed: %s" % path)


# ---------------------------------------------------------------------------
# WFST decoding
# ---------------------------------------------------------------------------

class NativeFst:
    def __init__(self, path: Optional[str] = None, _fst=None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        if _fst is not None:
            self._fst = _fst
        else:
            self._fst = lib.pkc_fst_load_text(path.encode())
        if not self._fst:
            raise IOError("failed to load FST %s" % path)

    @classmethod
    def from_data(cls, fst_data) -> "NativeFst":
        """Build from a decode.openfst.FstData arc table (bulk CSR)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        finals = np.ascontiguousarray(fst_data.final, np.float64)
        src = np.ascontiguousarray(fst_data.src, np.int32)
        dst = np.ascontiguousarray(fst_data.arcs["nextstate"], np.int32)
        il = np.ascontiguousarray(fst_data.arcs["ilabel"], np.int32)
        ol = np.ascontiguousarray(fst_data.arcs["olabel"], np.int32)
        w = np.ascontiguousarray(fst_data.arcs["weight"], np.float32)
        ptr = lib.pkc_fst_load_raw(
            fst_data.num_states, fst_data.start,
            finals.ctypes.data_as(ctypes.c_void_p), fst_data.num_arcs,
            src.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p),
            il.ctypes.data_as(ctypes.c_void_p),
            ol.ctypes.data_as(ctypes.c_void_p),
            w.ctypes.data_as(ctypes.c_void_p))
        if not ptr:
            raise ValueError("invalid FST data (out-of-range states?)")
        return cls(_fst=ptr)

    @classmethod
    def from_file(cls, path: str, tmodel=None) -> "NativeFst":
        """Load a text FST, or an OpenFst binary (vector/const) graph —
        e.g. an externally built Kaldi HCLG.fst. Kaldi HCLG ilabels are
        transition ids; pass the experiment's TransitionModel to remap
        them to the decoder's pdf+1 convention."""
        with open(path, "rb") as f:
            magic = f.read(4)
        from .decode import openfst as OF
        import struct as _struct
        if len(magic) == 4 and _struct.unpack("<i", magic)[0] == OF.FST_MAGIC:
            data = OF.read_fst(path)
            if tmodel is not None:
                il = data.arcs["ilabel"]
                nz = il > 0
                remap = np.asarray(tmodel.tid2pdf, np.int32)
                data.arcs["ilabel"][nz] = remap[il[nz]] + 1
            return cls.from_data(data)
        return cls(path)

    @property
    def num_states(self) -> int:
        return self._lib.pkc_fst_num_states(self._fst)

    @property
    def num_arcs(self) -> int:
        return self._lib.pkc_fst_num_arcs(self._fst)

    def decode(self, loglikes: np.ndarray, beam: float = 13.0,
               max_active: int = 7000, acwt: float = 0.2) -> List[int]:
        ll = np.ascontiguousarray(loglikes, np.float32)
        T, S = ll.shape
        out = np.zeros(4 * T + 16, np.int32)
        n = self._lib.pkc_decode(self._fst, ll.ctypes.data_as(ctypes.c_void_p),
                                 T, S, beam, max_active, acwt,
                                 out.ctypes.data_as(ctypes.c_void_p),
                                 len(out))
        if n < 0:
            raise RuntimeError("decode failed (beam too tight?)")
        return out[:n].tolist()

    def decode_ctm(self, loglikes: np.ndarray, beam: float = 13.0,
                   max_active: int = 7000, acwt: float = 0.2,
                   frame_shift: float = 0.01):
        """Best path with time alignment: list of (label, start_time_s)
        — the lattice-to-ctm-conf role of the reference scoring path."""
        ll = np.ascontiguousarray(loglikes, np.float32)
        T, S = ll.shape
        out = np.zeros(4 * T + 16, np.int32)
        frames = np.zeros(4 * T + 16, np.int32)
        n = self._lib.pkc_decode_ctm(
            self._fst, ll.ctypes.data_as(ctypes.c_void_p), T, S, beam,
            max_active, acwt, out.ctypes.data_as(ctypes.c_void_p),
            frames.ctypes.data_as(ctypes.c_void_p), len(out))
        if n < 0:
            raise RuntimeError("decode failed (beam too tight?)")
        return [(int(out[i]), float(frames[i]) * frame_shift)
                for i in range(n)]

    def decode_batch(self, loglikes_list, beam: float = 13.0,
                     max_active: int = 7000, acwt: float = 0.2,
                     n_threads: int = 0, with_frames: bool = False):
        """Decode MANY utterances in ONE library call on a native
        std::thread pool (ref decode_dnn.sh fans out latgen processes
        per split; this is the shared-memory equivalent). Removes the
        per-utterance Python/ctypes/GIL round-trip that dominates on
        many tiny utterances. Returns a list of label lists (or
        (labels, frames) pairs when with_frames), None entries for
        failed utterances."""
        N = len(loglikes_list)
        if N == 0:
            return []
        S = int(loglikes_list[0].shape[1])
        lls = [np.ascontiguousarray(ll, np.float32) for ll in loglikes_list]
        offsets = np.zeros(N + 1, np.int64)
        for i, ll in enumerate(lls):
            if ll.shape[1] != S:
                raise ValueError("inconsistent posterior dims in batch")
            offsets[i + 1] = offsets[i] + ll.shape[0]
        cat = np.concatenate(lls, axis=0)
        stride = int(4 * max(ll.shape[0] for ll in lls) + 16)
        out = np.zeros((N, stride), np.int32)
        frames = np.zeros((N, stride), np.int32) if with_frames else None
        lens = np.zeros(N, np.int64)
        self._lib.pkc_decode_batch(
            self._fst, cat.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p), N, S, beam,
            max_active, acwt, out.ctypes.data_as(ctypes.c_void_p),
            frames.ctypes.data_as(ctypes.c_void_p) if with_frames else None,
            stride, lens.ctypes.data_as(ctypes.c_void_p), n_threads)
        res = []
        for i in range(N):
            n = int(lens[i])
            if n < 0:
                res.append(None)
            elif with_frames:
                res.append((out[i, :n].tolist(), frames[i, :n].tolist()))
            else:
                res.append(out[i, :n].tolist())
        return res

    def decode_lattice(self, loglikes: np.ndarray, beam: float = 13.0,
                       lat_beam: float = 8.0, max_active: int = 7000,
                       acwt: float = 0.2) -> "Lattice":
        """Lattice-generating decode (the `latgen` role): all within-beam
        paths, graph/acoustic costs separated for rescoring."""
        ll = np.ascontiguousarray(loglikes, np.float32)
        T, S = ll.shape
        ptr = self._lib.pkc_decode_lattice(
            self._fst, ll.ctypes.data_as(ctypes.c_void_p), T, S,
            beam, lat_beam, max_active, acwt)
        if not ptr:
            raise RuntimeError("lattice decode failed (beam too tight?)")
        return Lattice(self._lib, ptr)

    def decode_lattice_batch(self, loglikes_list, beam: float = 13.0,
                             lat_beam: float = 8.0, max_active: int = 7000,
                             acwt: float = 0.2, n_threads: int = 0):
        """Batched lattice generation: one library call, native thread
        pool (the rescoring pipeline consumes one lattice/utterance).
        Returns a list of Lattice (None for failed utterances)."""
        N = len(loglikes_list)
        if N == 0:
            return []
        S = int(loglikes_list[0].shape[1])
        lls = [np.ascontiguousarray(ll, np.float32) for ll in loglikes_list]
        offsets = np.zeros(N + 1, np.int64)
        for i, ll in enumerate(lls):
            if ll.shape[1] != S:
                raise ValueError("inconsistent posterior dims in batch")
            offsets[i + 1] = offsets[i] + ll.shape[0]
        cat = np.concatenate(lls, axis=0)
        ptrs = (ctypes.c_void_p * N)()
        self._lib.pkc_decode_lattice_batch(
            self._fst, cat.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p), N, S, beam,
            lat_beam, max_active, acwt, ptrs, n_threads)
        return [Lattice(self._lib, ptrs[i]) if ptrs[i] else None
                for i in range(N)]

    def __del__(self):
        try:
            self._lib.pkc_fst_free(self._fst)
        except Exception:
            pass


class Lattice:
    """Pruned word/phone lattice over (frame, state) nodes.

    Arc arrays keep graph and acoustic costs separate, so
    ``best_path(ac_scale)`` rescoring sweeps (the lattice-rescoring role
    of the reference's lmwt loop) need no re-decode.
    """

    def __init__(self, lib, ptr):
        self._lib = lib
        self._ptr = ptr
        n_nodes = lib.pkc_lattice_num_nodes(ptr)
        n_arcs = lib.pkc_lattice_num_arcs(ptr)
        self.frames = np.zeros(n_nodes, np.int32)
        self.final_costs = np.zeros(n_nodes, np.float64)
        lib.pkc_lattice_nodes(ptr, self.frames.ctypes.data_as(ctypes.c_void_p),
                              self.final_costs.ctypes.data_as(ctypes.c_void_p))
        self.src = np.zeros(n_arcs, np.int32)
        self.dst = np.zeros(n_arcs, np.int32)
        self.ilabels = np.zeros(n_arcs, np.int32)
        self.olabels = np.zeros(n_arcs, np.int32)
        self.graph_costs = np.zeros(n_arcs, np.float32)
        self.acoustic_costs = np.zeros(n_arcs, np.float32)
        lib.pkc_lattice_arcs(ptr, *(a.ctypes.data_as(ctypes.c_void_p) for a in
                                    (self.src, self.dst, self.ilabels,
                                     self.olabels, self.graph_costs,
                                     self.acoustic_costs)))

    @property
    def num_nodes(self) -> int:
        return len(self.frames)

    @property
    def num_arcs(self) -> int:
        return len(self.src)

    def best_path(self, ac_scale: float = 1.0) -> List[int]:
        out = np.zeros(self.num_arcs + 16, np.int32)
        n = self._lib.pkc_lattice_best_path(
            self._ptr, ac_scale, out.ctypes.data_as(ctypes.c_void_p), len(out))
        if n < 0:
            raise RuntimeError("no final path in lattice")
        return out[:n].tolist()

    def rescore_sweep(self, scales) -> Dict[float, List[int]]:
        """Best path per acoustic-scale factor — the lattice equivalent
        of the reference's lmwt 1..10 scoring loop, without re-decoding."""
        return {s: self.best_path(s) for s in scales}

    def ctm(self, ac_scale: float = 1.0, frame_shift: float = 0.01
            ) -> List[tuple]:
        """Best-path tokens with time + posterior confidence:
        (label, start_s, duration_s, confidence) rows — the
        lattice-to-ctm-conf role (ref: local/score.sh:55-60).
        Confidence = posterior mass of all lattice paths through the
        token's arc (log-sum forward/backward at this scale)."""
        cap = self.num_arcs + 16
        labs = np.zeros(cap, np.int32)
        frames = np.zeros(cap, np.int32)
        conf = np.zeros(cap, np.float32)
        n = self._lib.pkc_lattice_ctm_conf(
            self._ptr, ac_scale, labs.ctypes.data_as(ctypes.c_void_p),
            frames.ctypes.data_as(ctypes.c_void_p),
            conf.ctypes.data_as(ctypes.c_void_p), cap)
        if n < 0:
            raise RuntimeError("no final path in lattice")
        T = int(self.frames.max()) + 1 if self.num_nodes else 0
        rows = []
        for i in range(n):
            start = int(frames[i])
            end = int(frames[i + 1]) if i + 1 < n else T
            rows.append((int(labs[i]), start * frame_shift,
                         max(end - start, 1) * frame_shift,
                         float(conf[i])))
        return rows

    def best_path_arcs(self, ac_scale: float = 1.0) -> List[int]:
        """Indices of the arcs on the best path (Bellman-Ford over the
        arc arrays; the C++ stores arcs near-topologically so passes
        converge in ~longest-eps-chain + 1). The start node is the one
        the decoder created first (frame -1 before remap -> index 0)."""
        w = (self.graph_costs.astype(np.float64)
             + ac_scale * self.acoustic_costs.astype(np.float64))
        n = self.num_nodes
        cost = np.full(n, np.inf)
        cost[0] = 0.0
        for _ in range(n + 1):
            cand = cost[self.src] + w
            new = cost.copy()
            np.minimum.at(new, self.dst, cand)
            if np.array_equal(new, cost, equal_nan=True):
                break
            cost = new
        best_in = np.full(n, -1, np.int64)
        cand = cost[self.src] + w
        on = cand <= cost[self.dst] + 1e-9
        # last writer wins — any optimal incoming arc is fine
        best_in[self.dst[on]] = np.nonzero(on)[0]
        totals = cost + self.final_costs
        end = int(np.argmin(totals))
        if not np.isfinite(totals[end]):
            raise RuntimeError("no final path in lattice")
        path = []
        node = end
        while node != 0:
            a = int(best_in[node])
            if a < 0:
                raise RuntimeError("broken backtrace in lattice")
            path.append(a)
            node = int(self.src[a])
        path.reverse()
        return path

    def align_phones(self, tmodel, ac_scale: float = 1.0,
                     frame_shift: float = 0.01) -> List[tuple]:
        """Phone-level time alignment of the best path — the
        ``lattice-align-phones`` role (ref: local/score.sh:55-60).

        Our lattice arcs are per-frame (one emitting arc per frame), so
        phone boundaries are exact by construction: take the best
        path's per-frame ilabels (transition-ids for HCLG graphs, built
        by decode.graph / the transition-id remap), map them to phones
        through the transition model, and merge consecutive runs.
        ``tmodel`` is a ``TransitionModel`` (its
        ``ali_to_phones_per_frame``) or any callable mapping an int32
        ilabel array to per-frame phone ids. Returns
        ``(phone, start_s, duration_s)`` rows.
        """
        arcs = self.best_path_arcs(ac_scale)
        tids = np.asarray([self.ilabels[a] for a in arcs
                           if self.ilabels[a] != 0], np.int64)
        if tids.size == 0:
            return []
        mapper = getattr(tmodel, "ali_to_phones_per_frame", tmodel)
        phones = np.asarray(mapper(tids))
        rows = []
        start = 0
        for i in range(1, len(phones) + 1):
            if i == len(phones) or phones[i] != phones[start]:
                rows.append((int(phones[start]), start * frame_shift,
                             (i - start) * frame_shift))
                start = i
        return rows

    def write_text(self, path: str) -> str:
        """Kaldi-style text lattice: 'src dst olabel ilabel gc,ac' lines
        + final lines."""
        with open(path, "w") as f:
            for i in range(self.num_arcs):
                f.write("%d %d %d %d %.4f,%.4f\n" % (
                    self.src[i], self.dst[i], self.olabels[i],
                    self.ilabels[i], self.graph_costs[i],
                    self.acoustic_costs[i]))
            for n in range(self.num_nodes):
                if np.isfinite(self.final_costs[n]):
                    f.write("%d %.4f\n" % (n, self.final_costs[n]))
        return path

    def __del__(self):
        try:
            self._lib.pkc_lattice_free(self._ptr)
        except Exception:
            pass


def build_phone_loop_fst(path: str, num_phones: int, states_per_phone: int,
                         self_loop_prob: float = 0.7,
                         phone_insertion_penalty: float = 0.0) -> str:
    """Write the phone-loop HMM as a text FST: ilabel = pdf+1, olabel =
    phone+1 on the phone-entry arc. State 0 is the loop start."""
    log_self = -np.log(self_loop_prob)
    log_next = -np.log(1.0 - self_loop_prob)
    lines = []
    state = 1
    for p in range(num_phones):
        first = state
        for s in range(states_per_phone):
            pdf = p * states_per_phone + s
            cur = state
            # entry arc (from loop start for s=0, from prev state otherwise)
            src = 0 if s == 0 else cur - 1
            ol = p + 1 if s == 0 else 0
            cost = (log_next + phone_insertion_penalty) if s == 0 else log_next
            lines.append("%d %d %d %d %f" % (src, cur, pdf + 1, ol, cost))
            lines.append("%d %d %d 0 %f" % (cur, cur, pdf + 1, log_self))
            state += 1
        # exit back to loop start — free: the cross-phone log_next is
        # charged on the entry arc (matches the JAX PhoneLoopHMM, which
        # prices a phone change with a single log_next)
        lines.append("%d 0 0 0 0.0" % (state - 1))
    # every state is final so utterances may end mid-phone, matching the
    # JAX decoder's argmax over all states at the last frame
    for s in range(state):
        lines.append("%d 0.0" % s)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
