"""Multi-system combination (decode/combine.py) — the score_combine.sh
capability (SURVEY table row 53, ref:
kaldi_decoding_scripts/local/score_combine.sh)."""
import os

import numpy as np
import pytest

from pytorch_kaldi_cgs_tpu.decode.combine import (combine_posterior_arks,
                                                  read_hyp_file, rover,
                                                  score_combine)


def test_rover_majority_vote():
    hyps = [["a", "b", "c"],
            ["a", "x", "c"],
            ["a", "b", "c"]]
    assert rover(hyps) == ["a", "b", "c"]


def test_rover_handles_insertions_and_deletions():
    # system 2 drops "b", system 3 inserts "z"; majority keeps a b c
    hyps = [["a", "b", "c"],
            ["a", "c"],
            ["a", "b", "z", "c"]]
    assert rover(hyps) == ["a", "b", "c"]


def test_rover_weights_break_majority():
    hyps = [["a"], ["b"], ["b"]]
    assert rover(hyps) == ["b"]
    assert rover(hyps, weights=[3.0, 1.0, 1.0]) == ["a"]


def test_rover_null_votes_can_delete():
    # two of three systems say nothing at the slot -> word dropped
    hyps = [["a", "x"], ["a"], ["a"]]
    assert rover(hyps) == ["a"]


def test_combine_posterior_arks(tmp_path):
    from pytorch_kaldi_cgs_tpu.data import kaldi_io
    rng = np.random.RandomState(0)
    m1 = rng.randn(5, 4).astype(np.float32)
    m2 = rng.randn(5, 4).astype(np.float32)
    a1, a2 = str(tmp_path / "s1.ark"), str(tmp_path / "s2.ark")
    kaldi_io.write_mat(a1, m1, key="u1")
    kaldi_io.write_mat(a2, m2, key="u1")
    out = str(tmp_path / "comb.ark")
    n = combine_posterior_arks([a1, a2], out, weights=[0.25, 0.75])
    assert n == 1
    got = dict(kaldi_io.read_mat_ark(out))["u1"]
    np.testing.assert_allclose(got, 0.25 * m1 + 0.75 * m2, atol=1e-6)


def test_score_combine_beats_worst_system(tmp_path):
    """Three systems with complementary errors: the ROVER combination
    scores at least as well as the best single system (here: exact)."""
    ref = "u1 the cat sat\nu2 dogs bark loud\n"
    (tmp_path / "text").write_text(ref)
    sys_hyps = [
        {"u1": "the cat sat", "u2": "dogs bark loud"},     # perfect
        {"u1": "the bat sat", "u2": "dogs bark"},          # 2 errs
        {"u1": "the cat sat", "u2": "dogs bark loud now"}, # 1 err
    ]
    dirs = []
    for i, h in enumerate(sys_hyps):
        d = tmp_path / ("dec%d" % i)
        d.mkdir()
        with open(d / "hyp.txt", "w") as f:
            for k, v in h.items():
                f.write("%s %s\n" % (k, v))
        dirs.append(str(d))
    out = str(tmp_path / "comb")
    res = score_combine(dirs, str(tmp_path / "text"), out)
    assert res["wer"] == pytest.approx(0.0)
    assert os.path.exists(os.path.join(out, "wer"))
    got = read_hyp_file(os.path.join(out, "hyp.txt"))
    assert got["u1"] == ["the", "cat", "sat"]
    assert got["u2"] == ["dogs", "bark", "loud"]
