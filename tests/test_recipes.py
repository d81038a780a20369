"""Per-corpus scoring recipes (decode/recipes.py) — native ports of the
reference's local/score_basic.sh, score_wsj.sh, score_sclite.sh,
score_phrich.sh (VERDICT r4 item 3: the last partial component row)."""
import os

import pytest

import importlib

DD = importlib.import_module("pytorch_kaldi_cgs_tpu.decode.decode_dnn")
from pytorch_kaldi_cgs_tpu.decode.recipes import RECIPES, get_recipe
from pytorch_kaldi_cgs_tpu.decode.scoring import score_sequences


def test_registry_and_sh_suffix():
    assert get_recipe("score_wsj") is RECIPES["score_wsj"]
    assert get_recipe("score_wsj.sh") is RECIPES["score_wsj"]
    assert get_recipe("") is RECIPES["score"]      # default TIMIT recipe
    assert get_recipe(None) is RECIPES["score"]
    with pytest.raises(ValueError):
        get_recipe("score_nope")


def test_lmwt_ranges_match_reference():
    """Sweep ranges come from the reference scripts' defaults
    (score_wsj.sh:12-14 -> 5..20; score_phrich.sh:10-11 -> 1..15)."""
    assert (RECIPES["score"].min_lmwt, RECIPES["score"].max_lmwt) == (1, 10)
    assert (RECIPES["score_basic"].min_lmwt,
            RECIPES["score_basic"].max_lmwt) == (1, 10)
    assert (RECIPES["score_wsj"].min_lmwt,
            RECIPES["score_wsj"].max_lmwt) == (5, 20)
    assert (RECIPES["score_sclite"].min_lmwt,
            RECIPES["score_sclite"].max_lmwt) == (1, 10)
    assert (RECIPES["score_phrich"].min_lmwt,
            RECIPES["score_phrich"].max_lmwt) == (1, 15)


def test_wsj_word_level_conventions():
    """<NOISE>/<SPOKEN_NOISE> stripped from ref (score_wsj.sh:55), <UNK>
    from hyp (:100), %HESITATION free on both sides (:86-88 glm), case
    folded (hubscr -l english)."""
    rec = get_recipe("score_wsj")
    ref = ["<NOISE>", "the", "cat", "<SPOKEN_NOISE>", "sat"]
    hyp = ["THE", "<UNK>", "CAT", "%HESITATION", "SAT"]
    r, h = rec.filter_ref(ref), rec.filter_hyp(hyp)
    assert r == ["THE", "CAT", "SAT"]
    assert h == ["THE", "CAT", "SAT"]
    res = score_sequences({"u1": r}, {"u1": h})
    assert res["wer"] == 0.0
    # without the recipe the same pair scores badly
    raw = score_sequences({"u1": ref}, {"u1": hyp})
    assert raw["wer"] > 0.0
    assert not rec.use_phone_map


def test_basic_matches_default_on_phone_task():
    """score_basic differs from score.sh only in the Kaldi tool chain
    (best-path+compute-wer vs ctm+sclite); with a native aligner the
    conventions are identical."""
    d, b = get_recipe("score"), get_recipe("score_basic")
    seq = ["ax", "sil", "k"]
    assert d.filter_ref(seq) == b.filter_ref(seq) == seq
    assert d.use_phone_map and b.use_phone_map


def test_sclite_and_phrich_silence_conventions():
    """sclite: silence optionally deletable (stm '.', score_sclite.sh:49);
    phrich: silence deleted from both sides (score_phrich.sh:55-57,73).
    Both make sil insertions/deletions free in the native aligner."""
    for name in ("score_sclite", "score_phrich"):
        rec = get_recipe(name)
        ref = ["sil", "ax", "k", "sil"]
        hyp = ["ax", "sil", "k"]
        res = score_sequences({"u": rec.filter_ref(ref)},
                              {"u": rec.filter_hyp(hyp)})
        assert res["wer"] == 0.0, name
        assert rec.use_phone_map


def test_wsj_scoring_tail_equivalence():
    """The exact transformation decode_dnn applies under recipe=score_wsj
    (filter ref/hyp, then align): a wsj-style pair with noise/unk/case
    tokens scores 0 under the recipe and nonzero without it."""
    rec = get_recipe("score_wsj")
    refs = {"u1": ["the", "<NOISE>", "cat"]}
    hyps = {"u1": ["THE", "<UNK>", "CAT"]}
    scored = score_sequences({k: rec.filter_ref(v) for k, v in refs.items()},
                             {k: rec.filter_hyp(v) for k, v in hyps.items()})
    assert scored["wer"] == 0.0
    raw = score_sequences(refs, hyps)
    assert raw["wer"] > 0.0


def test_decode_dnn_sweep_honors_recipe_range(tmp_path, monkeypatch):
    """With no explicit lmwt range, decode_dnn_sweep sweeps the
    recipe's own range (wsj: 5..20)."""
    seen = []

    def stub(out_dir, ark_glob, graph_dir, text_file, acwt=0.2, **kw):
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "wer"), "w") as f:
            f.write("%WER 10.00 [ stub ]\n")
        seen.append(round(1.0 / acwt))
        return {"wer": 10.0}

    monkeypatch.setattr(DD, "decode_dnn", stub)
    res = DD.decode_dnn_sweep(str(tmp_path / "dec"), "*.ark", "g", "t",
                              recipe="score_wsj")
    assert seen == list(range(5, 21))
    assert res["lmwt"] in range(5, 21)
    # default recipe (none given): 1..10
    seen.clear()
    DD.decode_dnn_sweep(str(tmp_path / "dec2"), "*.ark", "g", "t")
    assert seen == list(range(1, 11))
