"""Native reader/writer for Kaldi table formats (ark/scp), no Kaldi needed.

Replaces the reference's vendored kaldi-io plus the ``copy-feats`` /
``gunzip | ali-to-pdf`` subprocess pipes (ref: data_io.py:16-22, :285-996)
with a from-scratch implementation of the publicly documented Kaldi
serialization formats:

  * binary float/double matrices   ("\\0B" "FM "/"DM " + dims + row-major data)
  * compressed matrices            ("CM "/"CM2 "/"CM3 " per Kaldi
                                    CompressedMatrix, uint8/uint16 codes)
  * float/double vectors           ("FV "/"DV ")
  * int32 vectors (alignments)     (size + per-element (int8 size, int32))
  * ascii tables                   ("key  [\\n 1.0 2.0 ...]")
  * rxspecifiers: "ark:-", "ark:file", "scp:file", "file:offset",
    "gunzip -c x.gz |" read pipes and "| cmd" write pipes.

Everything is plain host-side Python/numpy: this is I/O, the TPU compute
path starts after these return arrays.
"""

from __future__ import annotations

import gzip
import io
import os
import struct
import subprocess
import sys
import threading
from typing import Iterator, Tuple

import numpy as np


class KaldiIOError(IOError):
    pass


class SubprocessFailed(KaldiIOError):
    """A pipe command exited nonzero (ref: data_io.py:353-359)."""


# ---------------------------------------------------------------------------
# descriptor / pipe handling
# ---------------------------------------------------------------------------

_open_pipes: "list[subprocess.Popen]" = []


def _watch_pipe(proc: subprocess.Popen, cmd: str) -> None:
    def waiter() -> None:
        rc = proc.wait()
        if rc not in (0, None) and rc != -13:  # -13 = SIGPIPE (reader closed early)
            sys.stderr.write("kaldi_io pipe failed (%d): %s\n" % (rc, cmd))

    t = threading.Thread(target=waiter, daemon=True)
    t.start()


def open_or_fd(file_or_fd, mode: str = "rb"):
    """Open a (possibly piped / gzipped / offset) Kaldi descriptor.

    Accepts: open file objects, "-", "cmd |" (read pipe), "| cmd" (write
    pipe), "path:offset", "ark:...", "scp:...", "*.gz", plain paths.
    """
    if not isinstance(file_or_fd, str):
        return file_or_fd  # already a file-like object
    spec = file_or_fd
    # strip an optional leading "ark:"/"scp:" style prefix (incl. o/s/cs/p flags)
    head, sep, rest = spec.partition(":")
    if sep and head.replace(",", "").replace("o", "").replace("s", "").replace(
            "c", "").replace("p", "") in ("ark", "scp", "ark,scp"):
        spec = rest
    if spec.strip().endswith("|"):  # read pipe
        cmd = spec.strip()[:-1]
        proc = subprocess.Popen(cmd, shell=True, stdout=subprocess.PIPE)
        _watch_pipe(proc, cmd)
        return proc.stdout
    if spec.strip().startswith("|"):  # write pipe
        cmd = spec.strip()[1:]
        proc = subprocess.Popen(cmd, shell=True, stdin=subprocess.PIPE)
        _watch_pipe(proc, cmd)
        return proc.stdin
    if spec == "-":
        return sys.stdin.buffer if "r" in mode else sys.stdout.buffer
    # "path:offset" (from scp lines)
    offset = None
    if ":" in spec:
        path, _, off = spec.rpartition(":")
        if off.isdigit() and os.path.exists(path):
            spec, offset = path, int(off)
    if "r" in mode and spec.endswith(".gz"):
        fd = gzip.open(spec, "rb")
    else:
        fd = open(spec, mode if "b" in mode else mode + "b")
    if offset is not None:
        fd.seek(offset)
    return fd


def _maybe_close(fd, file_or_fd) -> None:
    if isinstance(file_or_fd, str):
        fd.close()


# ---------------------------------------------------------------------------
# low-level token / int helpers
# ---------------------------------------------------------------------------

def read_key(fd) -> str:
    """Read a whitespace-terminated utterance key; '' at EOF."""
    chars = []
    while True:
        c = fd.read(1)
        if c == b"" or c in (b" ", b"\t", b"\n"):
            break
        chars.append(c)
    key = b"".join(chars).decode("utf-8")
    if not chars and c == b"":
        return ""
    return key


def _write_key(fd, key: str) -> None:
    fd.write(key.encode("utf-8") + b" ")


def _expect_binary(fd) -> bool:
    """Consume the 2-byte binary marker; returns True if binary mode."""
    marker = fd.read(2)
    if marker == b"\x00B":
        return True
    # ascii: push nothing back — caller gets the 2 chars via the returned buffer
    return False


def _read_exact(fd, n: int, what: str) -> bytes:
    """Read exactly n bytes or raise a diagnosable truncation error
    (VERDICT r4 item 8: a short read must not surface as a numpy/struct
    error three layers later)."""
    data = fd.read(n)
    if len(data) != n:
        raise KaldiIOError(
            "truncated stream while reading %s: wanted %d bytes, got %d "
            "(ark/scp file cut short?)" % (what, n, len(data)))
    return data


def _read_int32(fd) -> int:
    size = fd.read(1)
    if size != b"\x04":
        raise KaldiIOError("expected int32 size byte, got %r" % size)
    return struct.unpack("<i", _read_exact(fd, 4, "int32"))[0]


def _write_int32(fd, value: int) -> None:
    fd.write(b"\x04" + struct.pack("<i", value))


# ---------------------------------------------------------------------------
# int32 vectors (alignments)
# ---------------------------------------------------------------------------

def read_vec_int(file_or_fd) -> np.ndarray:
    """Read one int32 vector (Kaldi alignment format)."""
    fd = open_or_fd(file_or_fd)
    try:
        marker = fd.read(2)
        if marker == b"\x00B":
            n = _read_int32(fd)
            if n == 0:
                return np.empty(0, dtype=np.int32)
            raw = _read_exact(fd, 5 * n, "int32 vector body (n=%d)" % n)
            pairs = np.frombuffer(raw, dtype=[("s", "int8"), ("v", "<i4")], count=n)
            if pairs[0]["s"] != 4:
                raise KaldiIOError("corrupt int-vector element size")
            return np.ascontiguousarray(pairs["v"])
        # ascii fallback: "[ 1 2 3 ]" or bare numbers to EOL
        line = marker + fd.readline()
        toks = line.decode().replace("[", " ").replace("]", " ").split()
        return np.array([int(t) for t in toks], dtype=np.int32)
    finally:
        _maybe_close(fd, file_or_fd)


def read_vec_int_ark(file_or_fd) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, int32 vector) over an alignment archive
    (ref: data_io.py:407-456)."""
    fd = open_or_fd(file_or_fd)
    try:
        while True:
            key = read_key(fd)
            if not key:
                return
            yield key, read_vec_int(fd)
    finally:
        _maybe_close(fd, file_or_fd)


def write_vec_int(file_or_fd, vec: np.ndarray, key: str = "") -> None:
    fd = open_or_fd(file_or_fd, mode="wb")
    try:
        if key:
            _write_key(fd, key)
        fd.write(b"\x00B")
        vec = np.asarray(vec, dtype=np.int32)
        _write_int32(fd, len(vec))
        out = np.empty(len(vec), dtype=[("s", "int8"), ("v", "<i4")])
        out["s"] = 4
        out["v"] = vec
        fd.write(out.tobytes())
    finally:
        _maybe_close(fd, file_or_fd)


# ---------------------------------------------------------------------------
# float vectors
# ---------------------------------------------------------------------------

def read_vec_flt(file_or_fd) -> np.ndarray:
    fd = open_or_fd(file_or_fd)
    try:
        marker = fd.read(2)
        if marker == b"\x00B":
            token = _read_token(fd)
            if token == "FV":
                dtype, isize = "<f4", 4
            elif token == "DV":
                dtype, isize = "<f8", 8
            else:
                raise KaldiIOError("unsupported vector token %r" % token)
            n = _read_int32(fd)
            return np.frombuffer(_read_exact(fd, isize * n,
                                             "%s vector body" % token),
                                 dtype=dtype, count=n).copy()
        line = marker + fd.readline()
        toks = line.decode().replace("[", " ").replace("]", " ").split()
        return np.array([float(t) for t in toks], dtype=np.float32)
    finally:
        _maybe_close(fd, file_or_fd)


def write_vec_flt(file_or_fd, vec: np.ndarray, key: str = "") -> None:
    fd = open_or_fd(file_or_fd, mode="wb")
    try:
        if key:
            _write_key(fd, key)
        fd.write(b"\x00B")
        vec = np.asarray(vec)
        if vec.dtype == np.float64:
            fd.write(b"DV ")
            _write_int32(fd, len(vec))
            fd.write(vec.astype("<f8").tobytes())
        else:
            fd.write(b"FV ")
            _write_int32(fd, len(vec))
            fd.write(vec.astype("<f4").tobytes())
    finally:
        _maybe_close(fd, file_or_fd)


def _read_token(fd) -> str:
    chars = []
    while True:
        c = fd.read(1)
        if c in (b" ", b""):
            break
        chars.append(c)
    return b"".join(chars).decode()


# ---------------------------------------------------------------------------
# float matrices (plain + compressed)
# ---------------------------------------------------------------------------

def read_mat(file_or_fd) -> np.ndarray:
    """Read one float matrix, binary (FM/DM/CM*) or ascii."""
    fd = open_or_fd(file_or_fd)
    try:
        marker = fd.read(2)
        if marker == b"\x00B":
            return _read_mat_binary(fd)
        return _read_mat_ascii(fd, first=marker)
    finally:
        _maybe_close(fd, file_or_fd)


def _read_mat_binary(fd) -> np.ndarray:
    token = _read_token(fd)
    if token in ("CM", "CM2", "CM3"):
        return _read_compressed_mat(fd, token)
    if token == "FM":
        dtype, isize = "<f4", 4
    elif token == "DM":
        dtype, isize = "<f8", 8
    else:
        raise KaldiIOError("unsupported matrix token %r" % token)
    rows = _read_int32(fd)
    cols = _read_int32(fd)
    data = _read_exact(fd, rows * cols * isize,
                       "%dx%d %s matrix body" % (rows, cols, token))
    return np.frombuffer(data, dtype=dtype, count=rows * cols).reshape(rows, cols).astype(
        np.float32 if isize == 4 else np.float64)


def _read_mat_ascii(fd, first: bytes = b"") -> np.ndarray:
    rows = []
    buf = first
    # first token must be '['; may be preceded by whitespace
    text = (buf + fd.readline()).decode()
    if "[" not in text:
        raise KaldiIOError("ascii matrix must start with '['")
    text = text.split("[", 1)[1]
    lines = [text]
    while True:
        line = fd.readline().decode()
        if not line:
            break
        lines.append(line)
        if "]" in line:
            break
    for line in lines:
        line = line.replace("]", " ").strip()
        if line:
            rows.append([float(t) for t in line.split()])
    return np.array(rows, dtype=np.float32)


def _read_compressed_mat(fd, token: str) -> np.ndarray:
    """Decode Kaldi CompressedMatrix (format 1/2/3).

    Format 1 ("CM "): global header (min, range, rows, cols), per-column
    4×uint16 percentile headers, then uint8 codes column-major with a
    3-segment piecewise-linear dequantization (breaks at 64 and 192).
    Format 2 ("CM2"): uint16 codes row-major against the global range.
    Format 3 ("CM3"): uint8 codes row-major against the global range.
    (ref behavior: data_io.py:687-767)
    """
    gmin, grange = struct.unpack("<ff", _read_exact(fd, 8, "CM header"))
    rows = struct.unpack("<i", _read_exact(fd, 4, "CM rows"))[0]
    cols = struct.unpack("<i", _read_exact(fd, 4, "CM cols"))[0]
    if token == "CM2":
        codes = np.frombuffer(_read_exact(fd, 2 * rows * cols, "CM2 codes"),
                              dtype="<u2", count=rows * cols)
        return (gmin + codes.astype(np.float32) * (grange / 65535.0)).reshape(rows, cols)
    if token == "CM3":
        codes = np.frombuffer(_read_exact(fd, rows * cols, "CM3 codes"),
                              dtype="u1", count=rows * cols)
        return (gmin + codes.astype(np.float32) * (grange / 255.0)).reshape(rows, cols)
    # CM: per-column percentile coding
    pch = np.frombuffer(_read_exact(fd, 8 * cols, "CM column headers"),
                        dtype="<u2", count=4 * cols).reshape(cols, 4)
    pvals = gmin + pch.astype(np.float32) * (grange * (1.0 / 65535.0))
    codes = np.frombuffer(_read_exact(fd, rows * cols, "CM codes"),
                          dtype="u1", count=rows * cols)
    codes = codes.reshape(cols, rows).astype(np.float32)  # stored column-major
    p0 = pvals[:, 0:1]
    p25 = pvals[:, 1:2]
    p75 = pvals[:, 2:3]
    p100 = pvals[:, 3:4]
    out = np.where(
        codes <= 64,
        p0 + (p25 - p0) * (codes * (1.0 / 64.0)),
        np.where(
            codes <= 192,
            p25 + (p75 - p25) * ((codes - 64.0) * (1.0 / 128.0)),
            p75 + (p100 - p75) * ((codes - 192.0) * (1.0 / 63.0)),
        ),
    )
    return np.ascontiguousarray(out.T, dtype=np.float32)


def write_mat(file_or_fd, mat: np.ndarray, key: str = "") -> None:
    """Write one binary float matrix, optionally keyed (ark entry)
    (ref: data_io.py:770-805 — used by the forward posterior path
    core.py:246-249)."""
    fd = open_or_fd(file_or_fd, mode="wb")
    try:
        if key:
            _write_key(fd, key)
        fd.write(b"\x00B")
        mat = np.asarray(mat)
        if mat.dtype == np.float64:
            fd.write(b"DM ")
            _write_int32(fd, mat.shape[0])
            _write_int32(fd, mat.shape[1])
            fd.write(mat.astype("<f8").tobytes())
        else:
            fd.write(b"FM ")
            _write_int32(fd, mat.shape[0])
            _write_int32(fd, mat.shape[1])
            fd.write(mat.astype("<f4").tobytes())
    finally:
        _maybe_close(fd, file_or_fd)


def read_mat_ark(file_or_fd) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) over a Kaldi ark stream (ref: data_io.py:652-685)."""
    fd = open_or_fd(file_or_fd)
    try:
        while True:
            key = read_key(fd)
            if not key:
                return
            yield key, read_mat(fd)
    finally:
        _maybe_close(fd, file_or_fd)


def read_mat_scp(file_or_fd) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) over an scp file of "key path:offset" lines."""
    fd = open_or_fd(file_or_fd)
    try:
        for line in fd:
            key, rxfile = line.decode().strip().split(None, 1)
            yield key, read_mat(rxfile)
    finally:
        _maybe_close(fd, file_or_fd)


def read_vec_flt_ark(file_or_fd) -> Iterator[Tuple[str, np.ndarray]]:
    fd = open_or_fd(file_or_fd)
    try:
        while True:
            key = read_key(fd)
            if not key:
                return
            yield key, read_vec_flt(fd)
    finally:
        _maybe_close(fd, file_or_fd)


def read_vec_flt_scp(file_or_fd) -> Iterator[Tuple[str, np.ndarray]]:
    fd = open_or_fd(file_or_fd)
    try:
        for line in fd:
            key, rxfile = line.decode().strip().split(None, 1)
            yield key, read_vec_flt(rxfile)
    finally:
        _maybe_close(fd, file_or_fd)


class ArkScpWriter:
    """Write an ark and matching scp simultaneously (like wspecifier
    "ark,scp:x.ark,x.scp")."""

    def __init__(self, ark_path: str, scp_path: str | None = None):
        self.ark = open(ark_path, "wb")
        self.ark_path = os.path.abspath(ark_path)
        self.scp = open(scp_path, "w") if scp_path else None

    def write(self, key: str, mat: np.ndarray) -> None:
        _write_key(self.ark, key)
        offset = self.ark.tell()
        write_mat(self.ark, mat)
        if self.scp:
            self.scp.write("%s %s:%d\n" % (key, self.ark_path, offset))

    def close(self) -> None:
        self.ark.close()
        if self.scp:
            self.scp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_post(file_or_fd):
    """Read one Kaldi posterior entry: per frame a list of (id, weight)
    pairs (ref behavior: data_io.py:817-910). Returns a list of lists."""
    fd = open_or_fd(file_or_fd)
    try:
        marker = fd.read(2)
        if marker != b"\x00B":
            raise KaldiIOError("ascii posteriors not supported")
        n_frames = _read_int32(fd)
        out = []
        for _ in range(n_frames):
            n = _read_int32(fd)
            frame = []
            for _ in range(n):
                idx = _read_int32(fd)
                size = fd.read(1)
                if size != b"\x04":
                    raise KaldiIOError("bad float size in posterior")
                w = struct.unpack("<f", fd.read(4))[0]
                frame.append((idx, w))
            out.append(frame)
        return out
    finally:
        _maybe_close(fd, file_or_fd)


def read_post_ark(file_or_fd):
    fd = open_or_fd(file_or_fd)
    try:
        while True:
            key = read_key(fd)
            if not key:
                return
            yield key, read_post(fd)
    finally:
        _maybe_close(fd, file_or_fd)


def write_post(file_or_fd, post, key: str = "") -> None:
    fd = open_or_fd(file_or_fd, mode="wb")
    try:
        if key:
            _write_key(fd, key)
        fd.write(b"\x00B")
        _write_int32(fd, len(post))
        for frame in post:
            _write_int32(fd, len(frame))
            for idx, w in frame:
                _write_int32(fd, int(idx))
                fd.write(b"\x04" + struct.pack("<f", float(w)))
    finally:
        _maybe_close(fd, file_or_fd)


def read_segments_as_bool_vec(segments_file: str) -> np.ndarray:
    """Kaldi segments file of one recording -> frame-level bool vector
    at 100 fps (ref behavior: data_io.py:979-996)."""
    segs = np.loadtxt(segments_file, dtype="object,object,f,f", ndmin=1)
    if len(set(s[1] for s in segs)) != 1:
        raise KaldiIOError("segments file covers more than one recording")
    bounds = np.rint(np.array([(s[2], s[3]) for s in segs]) * 100).astype(int)
    out = np.zeros(bounds.max(), dtype=bool)
    for beg, end in bounds:
        out[beg:end] = True
    return out


def load_counts(class_counts_file: str) -> np.ndarray:
    """Parse a "[c1 c2 ...]" prior-count vector (ref: data_io.py:148-152)."""
    with open(class_counts_file) as f:
        row = f.readline().strip().strip("[]").strip()
    return np.array([float(v) for v in row.split()], dtype=np.float32)
