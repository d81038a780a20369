"""Native C++ component tests (built on demand via make; skipped when no
toolchain)."""
import os

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu import native as N
from pytorch_kaldi_cgs_tpu.data import kaldi_io

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native library unavailable")


def test_native_ark_roundtrip(tmp_path):
    mats = {"a": np.random.RandomState(0).randn(7, 3).astype(np.float32),
            "b": np.random.RandomState(1).randn(2, 3).astype(np.float32)}
    p = str(tmp_path / "x.ark")
    for k, m in mats.items():
        N.write_mat_native(p, k, m)
    got = dict(N.read_mat_ark_native(p))
    for k, m in mats.items():
        np.testing.assert_allclose(got[k], m, rtol=1e-6)
    # python reader agrees with native writer and vice versa
    got_py = dict(kaldi_io.read_mat_ark(p))
    np.testing.assert_allclose(got_py["a"], mats["a"], rtol=1e-6)
    p2 = str(tmp_path / "y.ark")
    kaldi_io.write_mat(p2, mats["a"], key="a")
    got2 = dict(N.read_mat_ark_native(p2))
    np.testing.assert_allclose(got2["a"], mats["a"], rtol=1e-6)


def test_native_vec_ark(tmp_path):
    p = str(tmp_path / "ali.ark")
    with open(p, "wb") as f:
        kaldi_io.write_vec_int(f, np.array([5, 4, 3], np.int32), key="u1")
        kaldi_io.write_vec_int(f, np.arange(6, dtype=np.int32), key="u2")
    got = dict(N.read_vec_int_ark_native(p))
    np.testing.assert_array_equal(got["u1"], [5, 4, 3])
    np.testing.assert_array_equal(got["u2"], np.arange(6))


def test_native_fst_decode_oracle(tmp_path):
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 5, 2)
    fst = N.NativeFst(fst_path)
    assert fst.num_states == 11
    rng = np.random.RandomState(3)
    phones = [2, 4, 0, 4, 1]
    pdfs = []
    for p in phones:
        seg = rng.randint(4, 9)
        for i in range(seg):
            pdfs.append(p * 2 + min(i * 2 // seg, 1))
    T = len(pdfs)
    ll = np.full((T, 10), -8.0, np.float32)
    ll[np.arange(T), pdfs] = 0.0
    labs = fst.decode(ll, beam=20.0, acwt=1.0)
    assert [l - 1 for l in labs] == phones


def test_native_decode_matches_jax_viterbi(tmp_path):
    """Native WFST beam decode and the JAX phone-loop Viterbi agree on
    noisy posteriors (same topology, wide beam)."""
    from pytorch_kaldi_cgs_tpu.decode.viterbi import PhoneLoopHMM, viterbi_decode
    rng = np.random.RandomState(7)
    hmm = PhoneLoopHMM(4, 2)
    T = 60
    ll = np.log(rng.dirichlet(np.ones(8) * 0.3, size=T)).astype(np.float32)
    ref = viterbi_decode(ll, hmm, acwt=1.0)
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    fst = N.NativeFst(fst_path)
    hyp = [l - 1 for l in fst.decode(ll, beam=50.0, max_active=0, acwt=1.0)]
    assert hyp == ref


def test_decode_dnn_native_engine(tmp_path):
    """decode_dnn with engine=native end to end on oracle posteriors."""
    import json
    from pytorch_kaldi_cgs_tpu.decode.decode_dnn import decode_dnn
    graph = tmp_path / "graph"
    graph.mkdir()
    with open(graph / "graph.json", "w") as f:
        json.dump({"type": "phone_loop", "num_phones": 4,
                   "states_per_phone": 2}, f)
    rng = np.random.RandomState(0)
    refs = {}
    ark = str(tmp_path / "post.ark")
    for u in range(5):
        phones = rng.randint(0, 4, size=rng.randint(3, 7)).tolist()
        # avoid adjacent repeats (repeats decode fine but keep refs simple)
        refs["utt%d" % u] = phones
        pdfs = []
        for p in phones:
            for i in range(6):
                pdfs.append(p * 2 + (0 if i < 3 else 1))
        ll = np.full((len(pdfs), 8), -8.0, np.float32)
        ll[np.arange(len(pdfs)), pdfs] = 0.0
        kaldi_io.write_mat(open(ark, "ab"), ll, key="utt%d" % u)
    with open(tmp_path / "text", "w") as f:
        for k, v in refs.items():
            f.write("%s %s\n" % (k, " ".join(map(str, v))))
    res = decode_dnn(str(tmp_path / "dec"), ark, str(graph),
                     str(tmp_path / "text"), acwt=1.0, beam=20.0,
                     engine="native")
    assert res["wer"] == 0.0


def test_native_ctm_alignment(tmp_path):
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 3, 2)
    fst = N.NativeFst(fst_path)
    # phones 0 for 10 frames, then 2 for 10 frames
    pdfs = [0] * 5 + [1] * 5 + [4] * 5 + [5] * 5
    ll = np.full((20, 6), -8.0, np.float32)
    ll[np.arange(20), pdfs] = 0.0
    ctm = fst.decode_ctm(ll, beam=20.0, acwt=1.0)
    assert [l - 1 for l, _ in ctm] == [0, 2]
    assert ctm[0][1] == 0.0
    # phone 2 starts at frame 10 => 0.10 s
    assert abs(ctm[1][1] - 0.10) < 0.021


def test_lattice_generation_and_rescoring(tmp_path):
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    fst = N.NativeFst(fst_path)
    rng = np.random.RandomState(11)
    # ambiguous posteriors -> nontrivial lattice
    T = 40
    ll = np.log(rng.dirichlet(np.ones(8) * 0.5, size=T)).astype(np.float32)
    lat = fst.decode_lattice(ll, beam=30.0, lat_beam=10.0, acwt=1.0)
    assert lat.num_nodes > T            # alternatives kept
    assert lat.num_arcs > lat.num_nodes
    # best path at stored scale == direct decode best path
    direct = fst.decode(ll, beam=30.0, max_active=0, acwt=1.0)
    assert lat.best_path(1.0) == direct
    # rescoring sweep returns plausible (possibly different) paths
    sweep = lat.rescore_sweep([0.5, 1.0, 2.0])
    assert all(len(v) >= 1 for v in sweep.values())
    # text lattice round-trips through the file system
    p = lat.write_text(str(tmp_path / "lat.txt"))
    lines = open(p).read().strip().split("\n")
    assert len(lines) == lat.num_arcs + np.isfinite(lat.final_costs).sum()


def test_lattice_oracle_single_path(tmp_path):
    """Sharp posteriors + tight lat_beam -> lattice collapses to ~1 path."""
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 3, 2)
    fst = N.NativeFst(fst_path)
    pdfs = [0]*4 + [1]*4 + [2]*4 + [3]*4
    ll = np.full((16, 6), -20.0, np.float32)
    ll[np.arange(16), pdfs] = 0.0
    lat = fst.decode_lattice(ll, beam=10.0, lat_beam=0.1, acwt=1.0)
    assert [l - 1 for l in lat.best_path(1.0)] == [0, 1]
    # near-deterministic: arcs ~= frames + eps transitions
    assert lat.num_arcs <= 16 + 8


def test_batched_viterbi_ragged_matches_numpy():
    """Device-side backtrack must equal per-utterance numpy Viterbi on
    ragged batches (incl. length-1 edge case)."""
    from pytorch_kaldi_cgs_tpu.decode.viterbi import (PhoneLoopHMM,
                                                      batched_viterbi_decode,
                                                      viterbi_decode)
    rng = np.random.RandomState(3)
    hmm = PhoneLoopHMM(5, 2)
    lens = [17, 40, 28, 1, 40]
    B, T, S = len(lens), max(lens), 10
    ll = np.full((B, T, S), -1e30, np.float32)
    for b, L in enumerate(lens):
        ll[b, :L] = np.log(rng.dirichlet(np.ones(S) * 0.4, size=L)).astype(np.float32)
    got = batched_viterbi_decode(ll, np.array(lens), hmm, acwt=1.0)
    for b, L in enumerate(lens):
        assert got[b] == viterbi_decode(ll[b, :L], hmm, acwt=1.0)


def test_lattice_ctm_confidence_hand_computed(tmp_path):
    """lattice-to-ctm-conf equivalent: two competing tokens with known
    acoustic scores -> confidence must equal the exact softmax posterior
    (ref role: local/score.sh:55-60 lattice-to-ctm-conf)."""
    import numpy as np
    from pytorch_kaldi_cgs_tpu import native as N
    if not N.available():
        import pytest
        pytest.skip("native lib unavailable")
    fst_txt = str(tmp_path / "two.fst.txt")
    with open(fst_txt, "w") as f:
        # state 0 start; two competing arcs (pdf 0 vs pdf 1) to final 1
        f.write("0 1 1 1 0.0\n0 1 2 2 0.0\n1 0.0\n")
    fst = N.NativeFst(fst_txt)
    ll = np.array([[2.0, 1.0]], np.float32)     # frame 0: pdf0 wins
    lat = fst.decode_lattice(ll, beam=100.0, lat_beam=100.0, acwt=1.0)
    rows = lat.ctm(ac_scale=1.0)
    assert len(rows) == 1
    label, start_s, dur_s, conf = rows[0]
    assert label == 1
    assert start_s == 0.0 and dur_s > 0
    expected = np.exp(2.0) / (np.exp(2.0) + np.exp(1.0))   # 0.73106
    np.testing.assert_allclose(conf, expected, rtol=1e-5)
    # flipping the evidence flips the winner and its confidence
    ll2 = np.array([[1.0, 3.0]], np.float32)
    rows2 = fst.decode_lattice(ll2, beam=100.0, lat_beam=100.0,
                               acwt=1.0).ctm(ac_scale=1.0)
    assert rows2[0][0] == 2
    np.testing.assert_allclose(
        rows2[0][3], np.exp(3.0) / (np.exp(3.0) + np.exp(1.0)), rtol=1e-5)


def test_lattice_ctm_confidence_multi_token(tmp_path):
    """Confidences stay in [0,1] and the unambiguous token is ~1.0."""
    import numpy as np
    from pytorch_kaldi_cgs_tpu import native as N
    if not N.available():
        import pytest
        pytest.skip("native lib unavailable")
    fst_txt = str(tmp_path / "chain.fst.txt")
    with open(fst_txt, "w") as f:
        # frame 1 ambiguous (pdf1 vs pdf2), frame 0 forced (pdf 0)
        f.write("0 1 1 7 0.0\n"
                "1 2 2 8 0.0\n1 2 3 9 0.0\n"
                "2 0.0\n")
    fst = N.NativeFst(fst_txt)
    ll = np.array([[5.0, -10.0, -10.0],
                   [-10.0, 0.5, 0.4]], np.float32)
    rows = fst.decode_lattice(ll, beam=100.0, lat_beam=100.0,
                              acwt=1.0).ctm(ac_scale=1.0)
    assert [r[0] for r in rows] == [7, 8]
    assert rows[0][3] > 0.999                      # forced token
    exp = np.exp(0.5) / (np.exp(0.5) + np.exp(0.4))
    np.testing.assert_allclose(rows[1][3], exp, rtol=1e-4)
    assert all(0.0 <= r[3] <= 1.0 for r in rows)


def test_lattice_best_path_arcs_matches_best_path(tmp_path):
    """Python-side backtrace over the arc arrays reproduces the C++
    best path's token sequence (prerequisite for align_phones)."""
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    fst = N.NativeFst(fst_path)
    rng = np.random.RandomState(13)
    T = 30
    ll = np.log(rng.dirichlet(np.ones(8) * 0.5, size=T)).astype(np.float32)
    lat = fst.decode_lattice(ll, beam=30.0, lat_beam=10.0, acwt=1.0)
    for scale in (1.0, 0.5, 2.0):
        arcs = lat.best_path_arcs(scale)
        toks = [int(lat.olabels[a]) for a in arcs if lat.olabels[a] != 0]
        assert toks == lat.best_path(scale)
        # per-frame emitting arcs: exactly T nonzero-ilabel arcs
        assert sum(1 for a in arcs if lat.ilabels[a] != 0) == T


def test_lattice_align_phones(tmp_path):
    """lattice-align-phones role (ref: local/score.sh:55-60): best-path
    per-frame ilabels -> phones via the transition mapping, merged into
    (phone, start, duration) rows with exact boundaries."""
    sp = 2
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 3, sp)
    fst = N.NativeFst(fst_path)
    # phone 0 frames 0-9, phone 2 frames 10-19 (sharp posteriors)
    pdfs = [0] * 5 + [1] * 5 + [4] * 5 + [5] * 5
    ll = np.full((20, 6), -8.0, np.float32)
    ll[np.arange(20), pdfs] = 0.0
    lat = fst.decode_lattice(ll, beam=20.0, lat_beam=5.0, acwt=1.0)
    # phone-loop ilabel = pdf+1; mapper plays the TransitionModel role
    rows = lat.align_phones(lambda tids: (np.asarray(tids) - 1) // sp,
                            ac_scale=1.0)
    assert [r[0] for r in rows] == [0, 2]
    assert rows[0][1] == 0.0 and abs(rows[0][2] - 0.10) < 1e-9
    assert abs(rows[1][1] - 0.10) < 1e-9 and abs(rows[1][2] - 0.10) < 1e-9
    # durations tile the utterance exactly
    assert abs(sum(r[2] for r in rows) - 0.20) < 1e-9


def test_decode_batch_matches_single(tmp_path):
    """pkc_decode_batch (one native call, thread pool) produces exactly
    the per-utterance pkc_decode results, for mixed-length utterances
    and with CTM frames."""
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    fst = N.NativeFst(fst_path)
    rng = np.random.RandomState(11)
    mats = [np.log(rng.dirichlet(np.ones(8) * 0.3,
                                 size=rng.randint(5, 40))).astype(np.float32)
            for _ in range(17)]
    singles = [fst.decode(m, beam=50.0, max_active=0, acwt=1.0)
               for m in mats]
    batched = fst.decode_batch(mats, beam=50.0, max_active=0, acwt=1.0,
                               n_threads=4)
    assert batched == singles
    # with frame alignment
    ctm_single = [fst.decode_ctm(m, beam=50.0, max_active=0, acwt=1.0)
                  for m in mats]
    ctm_batch = fst.decode_batch(mats, beam=50.0, max_active=0, acwt=1.0,
                                 n_threads=3, with_frames=True)
    for (labs, frames), pairs in zip(ctm_batch, ctm_single):
        assert labs == [p[0] for p in pairs]
        assert [f * 0.01 for f in frames] == pytest.approx(
            [p[1] for p in pairs])


def test_decode_lattice_batch_matches_single(tmp_path):
    """Batched lattice generation == per-utterance lattices (node/arc
    counts + best paths at two acoustic scales)."""
    fst_path = N.build_phone_loop_fst(str(tmp_path / "g.txt"), 4, 2)
    fst = N.NativeFst(fst_path)
    rng = np.random.RandomState(12)
    mats = [np.log(rng.dirichlet(np.ones(8) * 0.3,
                                 size=rng.randint(8, 30))).astype(np.float32)
            for _ in range(9)]
    singles = [fst.decode_lattice(m, beam=50.0, lat_beam=10.0,
                                  max_active=0, acwt=1.0) for m in mats]
    batched = fst.decode_lattice_batch(mats, beam=50.0, lat_beam=10.0,
                                       max_active=0, acwt=1.0, n_threads=3)
    for ls, lb in zip(singles, batched):
        assert lb is not None
        assert lb.num_nodes == ls.num_nodes
        assert lb.num_arcs == ls.num_arcs
        for sc in (0.5, 1.0):
            assert lb.best_path(sc) == ls.best_path(sc)
