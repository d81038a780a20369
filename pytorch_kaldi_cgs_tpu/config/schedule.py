"""Compact per-epoch schedule strings and newbob LR annealing.

The schedule grammar is the reference's public config syntax
(ref: utils.py:2260-2303, README.md:684-713): ``"v1*n1|v2*n2|..."``
expands to a per-epoch array — e.g. ``128*12|64*10|32*2`` for 24 epochs.
A single bare value replicates across all epochs.
"""

from __future__ import annotations

from typing import List

from .proto import ConfigError


def expand_str_ep(str_compact: str, type_inp: str, n_ep: int,
                  split_elem: str = "|", mult_elem: str = "*") -> List[str]:
    out: List[str] = []
    parts = str_compact.split(split_elem)
    for elem in parts:
        pieces = elem.split(mult_elem)
        conv = int if type_inp == "int" else float
        try:
            conv(pieces[0])
        except ValueError:
            raise ConfigError("schedule %r must contain %ss, got %r"
                              % (str_compact, type_inp, pieces[0]))
        if len(pieces) == 2:
            try:
                reps = int(pieces[1])
            except ValueError:
                raise ConfigError("schedule %r repeat count must be int, got %r"
                                  % (str_compact, pieces[1]))
            out.extend([pieces[0]] * reps)
        elif len(pieces) == 1:
            out.append(pieces[0])
        else:
            raise ConfigError("malformed schedule element %r" % elem)
    if len(parts) == 1 and len(parts[0].split(mult_elem)) == 1:
        out.extend([parts[0]] * (n_ep - 1))
    if len(out) != n_ep:
        raise ConfigError("schedule %r expands to %d values but N_epochs_tr=%d"
                          % (str_compact, len(out), n_ep))
    return out


def newbob_update(lr: float, err_prev: float, err_curr: float,
                  improvement_threshold: float, halving_factor: float) -> float:
    """Newbob annealing: halve the LR when the relative dev-error
    improvement drops below the threshold (ref: run_exp.py:317-332)."""
    if err_prev <= 0:
        return lr
    rel_improvement = (err_prev - err_curr) / err_prev
    if rel_improvement < improvement_threshold:
        return lr * halving_factor
    return lr
