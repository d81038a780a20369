"""Per-corpus scoring recipes — native ports of the reference's
alternative scoring scripts (ref: kaldi_decoding_scripts/local/
score_basic.sh, score_wsj.sh, score_sclite.sh, score_phrich.sh, and the
TIMIT default score.sh).

The recipes differ in hypothesis/reference token conventions, not in
the aligner:

  score        TIMIT default: 48->39 phone map on ref and hyp, lmwt
               sweep 1..10 (ref: local/score.sh:47-60).
  score_basic  same conventions via best-path + compute-wer instead of
               the ctm/sclite path (ref: local/score_basic.sh:41-60) —
               mechanically identical here, where the aligner is native.
  score_wsj    word-level: <NOISE>/<SPOKEN_NOISE> stripped from the
               reference, <UNK> stripped from the hypothesis,
               %HESITATION optionally deletable (the glm rule,
               score_wsj.sh:86-88), case-folded (hubscr.pl -l english),
               lmwt sweep 5..20 (ref: local/score_wsj.sh:12-14,55,100).
  score_sclite TIMIT ctm/sclite variant: 48->39 map with silence
               OPTIONAL (the stm '.' convention, score_sclite.sh:49),
               lmwt 1..10.
  score_phrich phone-rich TIMIT variant: 48->39 map with silence
               DELETED from both sides (score_phrich.sh:55-57,73),
               lmwt 1..15.

Optional tokens (sclite's optionally-deletable convention) are
implemented by removing them from BOTH reference and hypothesis before
alignment — deletions and insertions of an optional token are free,
which is the convention's intent; the exact sclite algorithm differs
only when an optional token aligns against a different token, a case
that cannot lower the reported WER.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple


@dataclass(frozen=True)
class ScoringRecipe:
    name: str
    min_lmwt: int = 1
    max_lmwt: int = 10
    # tokens removed from the reference / hypothesis before alignment
    strip_ref: Tuple[str, ...] = ()
    strip_hyp: Tuple[str, ...] = ()
    # tokens removed from BOTH sides (sclite optionally-deletable)
    optional: Tuple[str, ...] = ()
    case_fold: bool = False
    # whether the TIMIT 48->39 phone map applies when one is configured
    use_phone_map: bool = True

    def filter_ref(self, seq: Sequence) -> List:
        return self._filter(seq, self.strip_ref)

    def filter_hyp(self, seq: Sequence) -> List:
        return self._filter(seq, self.strip_hyp)

    def _filter(self, seq: Sequence, strip: Tuple[str, ...]) -> List:
        drop = set(strip) | set(self.optional)
        out = []
        for t in seq:
            s = str(t)
            if self.case_fold:
                s = s.upper()
                t = s if isinstance(t, str) else t
            if s in drop or (self.case_fold and s.upper() in drop):
                continue
            out.append(t)
        return out


RECIPES: Dict[str, ScoringRecipe] = {
    "score": ScoringRecipe("score", 1, 10),
    "score_basic": ScoringRecipe("score_basic", 1, 10),
    "score_wsj": ScoringRecipe(
        "score_wsj", 5, 20,
        strip_ref=("<NOISE>", "<SPOKEN_NOISE>"),
        strip_hyp=("<UNK>",),
        optional=("%HESITATION",),
        case_fold=True, use_phone_map=False),
    "score_sclite": ScoringRecipe("score_sclite", 1, 10,
                                  optional=("sil",)),
    "score_phrich": ScoringRecipe("score_phrich", 1, 15,
                                  optional=("sil",)),
}


def get_recipe(name: str) -> ScoringRecipe:
    key = (name or "score").strip().removesuffix(".sh")
    if key not in RECIPES:
        raise ValueError("unknown scoring recipe %r (have: %s)"
                         % (name, ", ".join(sorted(RECIPES))))
    return RECIPES[key]
