"""OpenFst binary I/O — load externally built Kaldi graphs (HCLG.fst).

The reference decodes word tasks against an HCLG graph compiled by
Kaldi/OpenFst tooling (ref: kaldi_decoding_scripts/decode_dnn.sh:84
``latgen-faster-mapped ... $graphdir/HCLG.fst``). This module reads (and
writes, for round-trip tests and interchange) the OpenFst binary
container for ``StdArc`` (tropical weight) FSTs:

  header:  int32 magic 2125659606, fsttype string, arctype string,
           int32 version, int32 flags, uint64 properties,
           int64 start, int64 numstates, int64 numarcs
  strings: int32 length + bytes
  vector (version 2): per state -> float final, int64 narcs,
           narcs x {int32 ilabel, int32 olabel, float weight,
                     int32 nextstate}
  const  (version 2, aligned): pad to 16-byte offset, numstates x
           {float final, uint32 pos, uint32 narcs, uint32 niepsilons,
            uint32 noepsilons}, pad, numarcs x arc (as above)

Arcs come back as numpy arrays; ilabels of Kaldi HCLG graphs are
*transition ids* — remap them to pdf+1 with a TransitionModel before
handing to the native decoder (see native.NativeFst.from_file).

Also parses/writes OpenFst symbol tables (words.txt / phones.txt).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

FST_MAGIC = 2125659606
_ARC_DTYPE = np.dtype([("ilabel", "<i4"), ("olabel", "<i4"),
                       ("weight", "<f4"), ("nextstate", "<i4")])
_CONST_STATE_DTYPE = np.dtype([("final", "<f4"), ("pos", "<u4"),
                               ("narcs", "<u4"), ("niepsilons", "<u4"),
                               ("noepsilons", "<u4")])
_ALIGN = 16
# OpenFst header flag: file has (input/output) symbol tables attached
_HAS_ISYMBOLS = 0x1
_HAS_OSYMBOLS = 0x2
_IS_ALIGNED = 0x4


@dataclass
class FstData:
    """Flat arc-table representation of one FST."""
    start: int
    final: np.ndarray        # (num_states,) float32; +inf = non-final
    src: np.ndarray          # (num_arcs,) int32
    arcs: np.ndarray         # (num_arcs,) _ARC_DTYPE

    @property
    def num_states(self) -> int:
        return len(self.final)

    @property
    def num_arcs(self) -> int:
        return len(self.arcs)


def _read_string(f) -> str:
    n = struct.unpack("<i", f.read(4))[0]
    return f.read(n).decode()


def _write_string(f, s: str) -> None:
    b = s.encode()
    f.write(struct.pack("<i", len(b)))
    f.write(b)


def read_fst(path: str) -> FstData:
    """Read an OpenFst binary StdArc FST (vector or const format)."""
    with open(path, "rb") as f:
        magic = struct.unpack("<i", f.read(4))[0]
        if magic != FST_MAGIC:
            raise ValueError("%s: not an OpenFst binary file (magic %d)"
                             % (path, magic))
        fsttype = _read_string(f)
        arctype = _read_string(f)
        if arctype != "standard":
            raise ValueError("%s: unsupported arc type %r (only StdArc)"
                             % (path, arctype))
        version, flags = struct.unpack("<ii", f.read(8))
        struct.unpack("<Q", f.read(8))[0]  # properties
        start, num_states, num_arcs = struct.unpack("<qqq", f.read(24))
        if flags & (_HAS_ISYMBOLS | _HAS_OSYMBOLS):
            raise ValueError("%s: attached symbol tables unsupported — "
                             "strip with fstcompile/--keep_*symbols=false"
                             % path)
        if fsttype == "vector":
            return _read_vector_body(f, start, num_states)
        if fsttype == "const":
            return _read_const_body(f, start, num_states, num_arcs,
                                    aligned=version >= 2)
        raise ValueError("%s: unsupported fst type %r (vector/const only; "
                         "use fstconvert)" % (path, fsttype))


def _read_vector_body(f, start: int, num_states: int) -> FstData:
    final = np.full(max(num_states, 0), np.inf, np.float32)
    src_parts, arc_parts = [], []
    for s in range(num_states):
        w, narcs = struct.unpack("<fq", f.read(12))
        final[s] = w
        if narcs:
            arcs = np.frombuffer(f.read(_ARC_DTYPE.itemsize * narcs),
                                 dtype=_ARC_DTYPE)
            arc_parts.append(arcs)
            src_parts.append(np.full(narcs, s, np.int32))
    arcs = (np.concatenate(arc_parts) if arc_parts
            else np.zeros(0, _ARC_DTYPE))
    src = (np.concatenate(src_parts) if src_parts
           else np.zeros(0, np.int32))
    return FstData(start=start, final=final, src=src, arcs=arcs)


def _read_const_body(f, start, num_states, num_arcs, aligned) -> FstData:
    def align():
        if aligned:
            pos = f.tell()
            pad = (-pos) % _ALIGN
            if pad:
                f.read(pad)
    align()
    states = np.frombuffer(f.read(_CONST_STATE_DTYPE.itemsize * num_states),
                           dtype=_CONST_STATE_DTYPE)
    align()
    arcs = np.frombuffer(f.read(_ARC_DTYPE.itemsize * num_arcs),
                         dtype=_ARC_DTYPE)
    final = states["final"].astype(np.float32)
    src = np.repeat(np.arange(num_states, dtype=np.int32),
                    states["narcs"].astype(np.int64))
    return FstData(start=start, final=final, src=src, arcs=arcs.copy())


def write_fst(path: str, fst: FstData, fsttype: str = "vector") -> None:
    """Write the OpenFst binary container (vector format, version 2)."""
    if fsttype != "vector":
        raise ValueError("only vector writing is supported")
    order = np.argsort(fst.src, kind="stable")
    src = fst.src[order]
    arcs = fst.arcs[order]
    counts = np.bincount(src, minlength=fst.num_states).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    with open(path, "wb") as f:
        f.write(struct.pack("<i", FST_MAGIC))
        _write_string(f, "vector")
        _write_string(f, "standard")
        f.write(struct.pack("<ii", 2, 0))          # version, flags
        f.write(struct.pack("<Q", 0))              # properties
        f.write(struct.pack("<qqq", fst.start, fst.num_states,
                            fst.num_arcs))
        for s in range(fst.num_states):
            f.write(struct.pack("<fq", float(fst.final[s]), int(counts[s])))
            if counts[s]:
                f.write(arcs[offsets[s]:offsets[s + 1]].tobytes())


def read_symbol_table(path: str) -> Dict[str, int]:
    """OpenFst symbol table text format: ``symbol id`` per line."""
    out: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = int(parts[1])
    return out


def write_symbol_table(path: str, symbols: Dict[str, int]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for sym, idx in sorted(symbols.items(), key=lambda kv: kv[1]):
            f.write("%s %d\n" % (sym, idx))


def invert_symbols(symbols: Dict[str, int]) -> Dict[int, str]:
    return {v: k for k, v in symbols.items()}


def read_fst_text(path: str) -> FstData:
    """AT&T text format (the native decoder's text dialect)."""
    src_l, arcs_l, finals = [], [], {}
    start = -1
    max_state = -1
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 4:
                s, d, il, ol = (int(float(p)) for p in parts[:4])
                w = float(parts[4]) if len(parts) > 4 else 0.0
                src_l.append(s)
                arcs_l.append((il, ol, w, d))
                max_state = max(max_state, s, d)
            else:
                s = int(float(parts[0]))
                finals[s] = float(parts[1]) if len(parts) > 1 else 0.0
                max_state = max(max_state, s)
            if start < 0:
                start = int(float(parts[0]))
    final = np.full(max_state + 1, np.inf, np.float32)
    for s, w in finals.items():
        final[s] = w
    return FstData(start=start, final=final,
                   src=np.asarray(src_l, np.int32),
                   arcs=np.asarray(arcs_l, _ARC_DTYPE))


def write_fst_text(path: str, fst: FstData) -> None:
    with open(path, "w") as f:
        order = np.argsort(fst.src != fst.start, kind="stable")
        for i in order:
            a = fst.arcs[i]
            f.write("%d %d %d %d %.6f\n" % (fst.src[i], a["nextstate"],
                                            a["ilabel"], a["olabel"],
                                            a["weight"]))
        for s in np.where(np.isfinite(fst.final))[0]:
            f.write("%d %.6f\n" % (s, fst.final[s]))
