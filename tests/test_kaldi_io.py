"""Round-trip and golden-byte tests for the native Kaldi-format I/O."""
import gzip
import os
import struct

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.data import kaldi_io


def test_mat_roundtrip(tmp_path):
    mat = np.random.randn(17, 5).astype(np.float32)
    p = str(tmp_path / "m.ark")
    kaldi_io.write_mat(p, mat, key="utt1")
    entries = list(kaldi_io.read_mat_ark(p))
    assert len(entries) == 1
    key, got = entries[0]
    assert key == "utt1"
    np.testing.assert_allclose(got, mat, rtol=1e-6)


def test_mat_double_roundtrip(tmp_path):
    mat = np.random.randn(3, 4).astype(np.float64)
    p = str(tmp_path / "m.ark")
    kaldi_io.write_mat(p, mat, key="u")
    _, got = next(kaldi_io.read_mat_ark(p))
    np.testing.assert_allclose(got, mat)


def test_multi_entry_ark_and_scp(tmp_path):
    mats = {"a": np.ones((4, 3), np.float32), "b": np.full((2, 3), 2.0, np.float32)}
    ark = str(tmp_path / "x.ark")
    scp = str(tmp_path / "x.scp")
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        for k, m in mats.items():
            w.write(k, m)
    got_ark = dict(kaldi_io.read_mat_ark(ark))
    got_scp = dict(kaldi_io.read_mat_scp(scp))
    for k, m in mats.items():
        np.testing.assert_allclose(got_ark[k], m)
        np.testing.assert_allclose(got_scp[k], m)


def test_vec_int_roundtrip(tmp_path):
    vec = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)
    p = str(tmp_path / "ali.ark")
    with open(p, "wb") as f:
        kaldi_io.write_vec_int(f, vec, key="utt9")
    key, got = next(kaldi_io.read_vec_int_ark(p))
    assert key == "utt9"
    np.testing.assert_array_equal(got, vec)


def test_vec_int_gzip(tmp_path):
    p = str(tmp_path / "ali.1.gz")
    with gzip.open(p, "wb") as f:
        kaldi_io.write_vec_int(f, np.arange(10, dtype=np.int32), key="u0")
        kaldi_io.write_vec_int(f, np.arange(5, dtype=np.int32) + 7, key="u1")
    entries = dict(kaldi_io.read_vec_int_ark(p))
    np.testing.assert_array_equal(entries["u0"], np.arange(10))
    np.testing.assert_array_equal(entries["u1"], np.arange(5) + 7)


def test_vec_flt_roundtrip(tmp_path):
    v = np.random.randn(33).astype(np.float32)
    p = str(tmp_path / "v.ark")
    kaldi_io.write_vec_flt(p, v, key="k")
    key, got = next(kaldi_io.read_vec_flt_ark(p))
    np.testing.assert_allclose(got, v, rtol=1e-6)


def test_golden_binary_layout(tmp_path):
    """The exact byte layout must match Kaldi's: key, space, \\0B, 'FM ',
    int32 dims each preceded by a \\x04 size byte, row-major float32."""
    mat = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    p = str(tmp_path / "g.ark")
    kaldi_io.write_mat(p, mat, key="g")
    raw = open(p, "rb").read()
    expect = (b"g \x00BFM "
              + b"\x04" + struct.pack("<i", 2)
              + b"\x04" + struct.pack("<i", 2)
              + struct.pack("<4f", 1.0, 2.0, 3.0, 4.0))
    assert raw == expect


def test_compressed_matrix_cm():
    """Decode a hand-built format-1 compressed matrix."""
    rows, cols = 6, 2
    rng = np.random.RandomState(0)
    mat = rng.randn(rows, cols).astype(np.float32)
    gmin = float(mat.min())
    grange = float(mat.max() - mat.min()) or 1.0

    def to_u16(v):
        return int(np.clip(round((v - gmin) / grange * 65535), 0, 65535))

    buf = b"CM " + struct.pack("<ffii", gmin, grange, rows, cols)
    # per-column headers: quartiles as uint16
    codes = np.zeros((cols, rows), dtype=np.uint8)
    for c in range(cols):
        colv = np.sort(mat[:, c])
        p0, p25, p75, p100 = colv[0], colv[rows // 4], colv[(3 * rows) // 4], colv[-1]
        buf += struct.pack("<4H", to_u16(p0), to_u16(p25), to_u16(p75), to_u16(p100))
        # encode each value in the 3-segment scheme (approximately: nearest code)
        for r in range(rows):
            v = mat[r, c]
            if v <= p25:
                code = 0 if p25 == p0 else int(np.clip(round((v - p0) / (p25 - p0) * 64), 0, 64))
            elif v <= p75:
                code = 64 + int(np.clip(round((v - p25) / max(p75 - p25, 1e-9) * 128), 0, 128))
            else:
                code = 192 + int(np.clip(round((v - p75) / max(p100 - p75, 1e-9) * 63), 0, 63))
            codes[c, r] = code
    buf += codes.tobytes()

    import io
    full = io.BytesIO(b"\x00B" + buf)
    got = kaldi_io.read_mat(full)
    assert got.shape == (rows, cols)
    # coarse quantization: tolerate the quartile-coded error
    assert np.abs(got - mat).max() < grange / 16


def test_cm2_cm3_decode():
    import io
    rows, cols = 3, 4
    mat = np.linspace(-1.0, 1.0, rows * cols, dtype=np.float32).reshape(rows, cols)
    gmin, grange = -1.0, 2.0
    codes16 = np.clip(np.round((mat - gmin) / grange * 65535), 0, 65535).astype("<u2")
    buf = b"\x00BCM2 " + struct.pack("<ffii", gmin, grange, rows, cols) + codes16.tobytes()
    got = kaldi_io.read_mat(io.BytesIO(buf))
    np.testing.assert_allclose(got, mat, atol=1e-3)

    codes8 = np.clip(np.round((mat - gmin) / grange * 255), 0, 255).astype("u1")
    buf = b"\x00BCM3 " + struct.pack("<ffii", gmin, grange, rows, cols) + codes8.tobytes()
    got = kaldi_io.read_mat(io.BytesIO(buf))
    np.testing.assert_allclose(got, mat, atol=2e-2)


def test_ascii_matrix(tmp_path):
    p = str(tmp_path / "a.txt")
    with open(p, "w") as f:
        f.write(" [\n 1.0 2.0\n 3.0 4.0 ]\n")
    got = kaldi_io.read_mat(p)
    np.testing.assert_allclose(got, [[1, 2], [3, 4]])


def test_load_counts(tmp_path):
    p = str(tmp_path / "counts")
    with open(p, "w") as f:
        f.write("[ 10 20 30 ]\n")
    np.testing.assert_allclose(kaldi_io.load_counts(p), [10, 20, 30])


def test_read_pipe(tmp_path):
    mat = np.random.randn(4, 2).astype(np.float32)
    p = str(tmp_path / "m.ark")
    kaldi_io.write_mat(p, mat, key="u")
    entries = list(kaldi_io.read_mat_ark("cat %s |" % p))
    np.testing.assert_allclose(entries[0][1], mat, rtol=1e-6)


def test_posterior_roundtrip(tmp_path):
    post = [[(1, 0.5), (2, 0.5)], [(3, 1.0)], []]
    p = str(tmp_path / "p.ark")
    with open(p, "wb") as f:
        kaldi_io.write_post(f, post, key="u1")
    key, got = next(kaldi_io.read_post_ark(p))
    assert key == "u1"
    assert len(got) == 3
    assert got[0][0][0] == 1 and abs(got[0][0][1] - 0.5) < 1e-6
    assert got[2] == []


def test_segments_bool_vec(tmp_path):
    p = str(tmp_path / "segments")
    with open(p, "w") as f:
        f.write("utt1 rec1 0.00 0.50\n")
        f.write("utt2 rec1 1.00 1.20\n")
    v = kaldi_io.read_segments_as_bool_vec(p)
    assert v.shape == (120,)
    assert v[:50].all() and not v[50:100].any() and v[100:120].all()
