"""Decode driver — native replacement for ``decode_dnn.sh`` + scoring
(ref: kaldi_decoding_scripts/decode_dnn.sh, local/score.sh,
check_res_dec.sh/best_wer.sh).

Given the posterior ark files a forward pass produced, decode each ark
(one worker per ark, like the reference's one background
``latgen-faster-mapped`` per chunk, ref: decode_dnn.sh:79-87), score
against the reference transcriptions, and write ``wer_*`` files plus a
``scoring_summary`` the orchestrator greps into ``res.res``.

Currently decodes with the batched phone-loop Viterbi (phone-recognition
tasks, TIMIT-style PER); WFST/HCLG graphs will route to the native
lattice decoder once it lands.
"""

from __future__ import annotations

import concurrent.futures as futures
import glob
import os
import re
from typing import Dict, List, Optional

import numpy as np

from ..data import kaldi_io
from .scoring import read_phone_map, score_sequences
from .viterbi import PhoneLoopHMM, batched_viterbi_decode


def _decode_one_ark_native(ark_path: str, fst, acwt: float, beam: float,
                           max_active: int) -> Dict[str, List[int]]:
    """Decode one ark with the native C++ WFST beam decoder (olabels are
    phone+1 on the phone-loop graph). The whole ark goes through ONE
    pkc_decode_batch call on a native thread pool — per-utterance
    ctypes round-trips were the host-side bottleneck on many tiny
    utterances (ROADMAP item 5)."""
    from .. import native as N
    keys, mats = [], []
    for key, mat in N.read_mat_ark_native(ark_path):
        keys.append(key)
        mats.append(mat)
    hyps: Dict[str, List[int]] = {}
    for key, labs in zip(keys, fst.decode_batch(
            mats, beam=beam, max_active=max_active, acwt=acwt)):
        if labs is None:
            raise RuntimeError("decode failed for %s (beam too tight?)"
                               % key)
        hyps[key] = [l - 1 for l in labs]
    return hyps


def _decode_one_ark(ark_path: str, hmm: PhoneLoopHMM, acwt: float,
                    batch: int = 16) -> Dict[str, List[int]]:
    """Decode all utterances of one posterior ark with the batched
    JAX Viterbi (padded batches)."""
    entries = list(kaldi_io.read_mat_ark(ark_path))
    hyps: Dict[str, List[int]] = {}
    entries.sort(key=lambda kv: kv[1].shape[0])
    for i in range(0, len(entries), batch):
        group = entries[i:i + batch]
        T = max(m.shape[0] for _, m in group)
        S = group[0][1].shape[1]
        pad = np.full((len(group), T, S), -1e30, np.float32)
        lengths = np.zeros(len(group), np.int64)
        for j, (_, m) in enumerate(group):
            pad[j, :m.shape[0]] = m
            lengths[j] = m.shape[0]
        seqs = batched_viterbi_decode(pad, lengths, hmm, acwt)
        for (k, _), seq in zip(group, seqs):
            hyps[k] = seq
    return hyps


def _word_graph_files(graph_dir: str):
    """Detect a word-level graph dir: an externally built HCLG
    (OpenFst binary or our text dialect) + words.txt, or a lexicon to
    build the graph from (decode.graph)."""
    import json
    words_txt = os.path.join(graph_dir, "words.txt")
    if not os.path.exists(words_txt):
        return None
    for name in ("HCLG.fst", "HCLG.fst.txt"):
        p = os.path.join(graph_dir, name)
        if os.path.exists(p):
            return p, words_txt
    gj = os.path.join(graph_dir, "graph.json")
    lex = os.path.join(graph_dir, "lexicon.txt")
    if os.path.exists(gj) and os.path.exists(lex):
        with open(gj) as f:
            meta = json.load(f)
        if meta.get("type") == "word":
            return ("__build__", words_txt, lex,
                    int(meta["states_per_phone"]))
    return None


def _load_word_fst_data(graph_dir: str, spec):
    """FstData for a word graph, built ONCE before the decode pool
    (building + atomically caching HCLG when the dir only carries
    lexicon/words files); workers each build their own CSR from it."""
    from .openfst import read_fst, read_fst_text
    if spec[0] == "__build__":
        _, words_txt, lex_path, spp = spec
        from .openfst import read_symbol_table, write_fst
        from .graph import build_word_graph, read_lexicon
        cache = os.path.join(graph_dir, "HCLG.fst")
        if not os.path.exists(cache):
            word_ids = read_symbol_table(words_txt)
            lexicon = read_lexicon(lex_path, {})
            word_ids = {w: i for w, i in word_ids.items() if i > 0}
            # a first-pass ARPA shipped with the graph dir becomes the
            # grammar (and the LM that lattice rescoring subtracts)
            arpa = os.path.join(graph_dir, "lm.arpa")
            hclg = build_word_graph(lexicon, word_ids, spp,
                                    arpa_path=arpa if os.path.exists(arpa)
                                    else None)
            tmp = cache + ".tmp.%d" % os.getpid()
            write_fst(tmp, hclg)
            os.replace(tmp, cache)       # atomic vs concurrent decoders
            return hclg
        return read_fst(cache)
    path = spec[0]
    if path.endswith(".txt"):
        data = read_fst_text(path)
    else:
        data = read_fst(path)
    for mdl in ("final.mdl", "final.mdl.json"):
        if os.path.exists(os.path.join(graph_dir, mdl)):
            # Kaldi HCLG ilabels are transition ids -> pdf+1
            from ..data.dataset import find_transition_model
            tmodel = find_transition_model(graph_dir)
            il = data.arcs["ilabel"]
            nz = il > 0
            remap = np.asarray(tmodel.tid2pdf, np.int32)
            data.arcs["ilabel"][nz] = remap[il[nz]] + 1
            break
    return data


def decode_dnn(out_dir: str, ark_glob: str, graph_dir: str,
               text_file: str, acwt: float = 0.2, beam: float = 13.0,
               max_active: int = 7000,
               phone_map_file: Optional[str] = None,
               num_workers: int = 4, engine: str = "auto",
               rescore_arpa: Optional[str] = None,
               first_pass_arpa: Optional[str] = None,
               recipe: Optional[str] = None
               ) -> Dict[str, float]:
    """Decode every ark matching ``ark_glob``, score, write results.

    engine: "native" (C++ WFST beam decoder), "jax" (batched on-device
    Viterbi), or "auto" (native when the library is available). Word
    graphs (HCLG.fst + words.txt, or a lexicon-bearing graph dir) decode
    word sequences and score WER; otherwise the phone loop scores PER.

    ``rescore_arpa``: path to a second-pass ARPA LM — word decodes then
    generate LATTICES and each is LM-rescored (the fglarge second pass
    of ref README.md:278-283, role of steps/lmrescore*.sh). The
    first-pass grammar's ARPA is ``first_pass_arpa`` (default:
    <graph_dir>/lm.arpa), needed to subtract its scores.

    Returns the score dict (wer/sub/ins/del/...). Writes
    ``<out_dir>/hyp.txt``, ``<out_dir>/wer`` and ``scoring_summary``.
    """
    os.makedirs(out_dir, exist_ok=True)
    arks = sorted(glob.glob(ark_glob))
    if not arks:
        raise FileNotFoundError("no posterior arks match %s" % ark_glob)

    word_spec = _word_graph_files(graph_dir)
    old_lm = new_lm = None
    if rescore_arpa:
        from .rescore import ArpaLM
        if word_spec is None:
            raise ValueError("rescore_arpa requires a word-level graph dir")
        fp = first_pass_arpa or os.path.join(graph_dir, "lm.arpa")
        if not os.path.exists(fp):
            raise FileNotFoundError(
                "LM rescoring needs the first-pass ARPA to subtract its "
                "scores: pass first_pass_arpa or put lm.arpa in %s"
                % graph_dir)
        old_lm, new_lm = ArpaLM(fp), ArpaLM(rescore_arpa)

    use_native = False
    if engine in ("auto", "native"):
        from .. import native as N
        if N.available():
            use_native = True
        elif engine == "native":
            raise RuntimeError("native decoder requested but unavailable")
    if word_spec is not None and not use_native and engine != "tpu-wfst":
        raise RuntimeError("word-level decoding requires the native "
                           "decoder (make -C native) or engine='tpu-wfst'")

    hyps: Dict[str, List[int]] = {}
    if engine == "tpu-wfst":
        # exact dense on-device Viterbi over the full graph: the
        # serving path that keeps posteriors on the accelerator
        # (decode/wfst_tpu.py; rescoring stays on the native engine)
        if old_lm is not None:
            raise ValueError("LM rescoring needs lattices: use the "
                             "native engine")
        from .. import native as N
        from .wfst_tpu import TpuWfstDecoder
        if word_spec is not None:
            from .openfst import invert_symbols, read_symbol_table
            id2word = invert_symbols(read_symbol_table(word_spec[1]))
            dec = TpuWfstDecoder(_load_word_fst_data(graph_dir, word_spec))
        else:
            from .openfst import read_fst_text
            hmm = PhoneLoopHMM.from_graph_dir(graph_dir)
            fst_txt = os.path.join(graph_dir, "phone_loop.fst.txt")
            if not os.path.exists(fst_txt):
                N.build_phone_loop_fst(fst_txt, hmm.num_phones,
                                       hmm.states_per_phone)
            id2word = None
            dec = TpuWfstDecoder(read_fst_text(fst_txt))
        from ..data.kaldi_io import read_mat_ark
        for a in arks:
            keys, mats = [], []
            reader = (N.read_mat_ark_native(a) if N.available()
                      else read_mat_ark(a))
            for key, mat in reader:
                keys.append(key)
                mats.append(mat)
            for key, ids in zip(keys, dec.decode_batch(mats, acwt=acwt)):
                if ids is None:
                    raise RuntimeError("decode failed for %s" % key)
                if id2word is not None:
                    hyps[key] = [id2word.get(i, "<unk>") for i in ids]
                else:
                    hyps[key] = [i - 1 for i in ids]
    elif word_spec is not None:
        from .. import native as N
        from .openfst import invert_symbols, read_symbol_table
        id2word = invert_symbols(read_symbol_table(word_spec[1]))
        fst_data = _load_word_fst_data(graph_dir, word_spec)
        with futures.ThreadPoolExecutor(max_workers=num_workers) as ex:
            def work(a):
                fst = N.NativeFst.from_data(fst_data)  # per-worker CSR
                out: Dict[str, List] = {}
                if old_lm is not None:
                    # batched lattice generation (one native call); the
                    # rescore DP itself stays host-side per utterance
                    from .rescore import lm_rescore_lattice
                    keys, mats = [], []
                    for key, mat in N.read_mat_ark_native(a):
                        keys.append(key)
                        mats.append(mat)
                    lats = fst.decode_lattice_batch(
                        mats, beam=beam, max_active=max_active, acwt=acwt)
                    for key, lat in zip(keys, lats):
                        if lat is None:
                            raise RuntimeError("lattice decode failed "
                                               "for %s" % key)
                        ids, _ = lm_rescore_lattice(lat, id2word, old_lm,
                                                    new_lm)
                        out[key] = [id2word.get(i, "<unk>") for i in ids]
                    return out
                # whole ark in one batched native call (thread pool
                # inside the library; see _decode_one_ark_native)
                keys, mats = [], []
                for key, mat in N.read_mat_ark_native(a):
                    keys.append(key)
                    mats.append(mat)
                for key, ids in zip(keys, fst.decode_batch(
                        mats, beam=beam, max_active=max_active,
                        acwt=acwt)):
                    if ids is None:
                        raise RuntimeError("decode failed for %s" % key)
                    out[key] = [id2word.get(i, "<unk>") for i in ids]
                return out
            for part in ex.map(work, arks):
                hyps.update(part)
    elif use_native:
        from .. import native as N
        hmm = PhoneLoopHMM.from_graph_dir(graph_dir)
        fst_txt = os.path.join(graph_dir, "phone_loop.fst.txt")
        if not os.path.exists(fst_txt):
            N.build_phone_loop_fst(fst_txt, hmm.num_phones,
                                   hmm.states_per_phone)
        with futures.ThreadPoolExecutor(max_workers=num_workers) as ex:
            def work(a):
                fst = N.NativeFst(fst_txt)   # per-worker FST instance
                return _decode_one_ark_native(a, fst, acwt, beam, max_active)
            for part in ex.map(work, arks):
                hyps.update(part)
    else:
        hmm = PhoneLoopHMM.from_graph_dir(graph_dir)
        with futures.ThreadPoolExecutor(max_workers=num_workers) as ex:
            for part in ex.map(lambda a: _decode_one_ark(a, hmm, acwt), arks):
                hyps.update(part)

    refs: Dict[str, List] = {}
    with open(text_file) as f:
        for line in f:
            parts = line.split()
            if word_spec is not None:
                refs[parts[0]] = parts[1:]          # word strings
            else:
                refs[parts[0]] = [int(t) for t in parts[1:]]
    refs = {k: v for k, v in refs.items()
            if k in hyps or any(h.startswith(k) for h in hyps)}

    # per-corpus scoring recipe: token filtering/casing conventions
    # (ref: kaldi_decoding_scripts/local/score_*.sh; decode/recipes.py)
    rec = None
    if recipe:
        from .recipes import get_recipe
        rec = get_recipe(recipe)
        refs = {k: rec.filter_ref(v) for k, v in refs.items()}
        hyps = {k: rec.filter_hyp(v) for k, v in hyps.items()}
    phone_map = read_phone_map(phone_map_file) \
        if phone_map_file and (rec is None or rec.use_phone_map) else None
    result = score_sequences(refs, hyps, phone_map)

    with open(os.path.join(out_dir, "hyp.txt"), "w") as f:
        for k in sorted(hyps):
            f.write("%s %s\n" % (k, " ".join(map(str, hyps[k]))))
    with open(os.path.join(out_dir, "wer"), "w") as f:
        f.write("%%WER %.2f [ %d / %d, %d ins, %d del, %d sub ]\n" % (
            result["wer"], result["sub"] + result["ins"] + result["del"],
            result["n_tokens"], result["ins"], result["del"], result["sub"]))
    with open(os.path.join(out_dir, "scoring_summary"), "w") as f:
        f.write("wer=%.4f\nsub=%d\nins=%d\ndel=%d\nn_tokens=%d\n" % (
            result["wer"], result["sub"], result["ins"], result["del"],
            result["n_tokens"]))
    return result


def decode_dnn_sweep(out_dir: str, ark_glob: str, graph_dir: str,
                     text_file: str, min_lmwt: Optional[int] = None,
                     max_lmwt: Optional[int] = None,
                     **kw) -> Dict[str, float]:
    """Decode with a sweep of LM weights (acwt = 1/lmwt) and keep the
    best WER — the reference scores every lmwt 1..10 and greps the best
    (ref: local/score.sh:55-60 + best_wer.sh). Writes wer_<lmwt> files
    and returns the best score dict (with "lmwt" recorded).

    When min/max are not given they default to the scoring recipe's
    range (e.g. score_wsj sweeps 5..20, ref local/score_wsj.sh:12-14)."""
    if min_lmwt is None or max_lmwt is None:
        from .recipes import get_recipe
        rec = get_recipe(kw.get("recipe") or "score")
        min_lmwt = rec.min_lmwt if min_lmwt is None else min_lmwt
        max_lmwt = rec.max_lmwt if max_lmwt is None else max_lmwt
    best = None
    for lmwt in range(min_lmwt, max_lmwt + 1):
        sub = os.path.join(out_dir, "score_%d" % lmwt)
        res = decode_dnn(sub, ark_glob, graph_dir, text_file,
                         acwt=1.0 / lmwt, **kw)
        with open(os.path.join(out_dir, "wer_%d" % lmwt), "w") as f:
            f.write(open(os.path.join(sub, "wer")).read())
        if best is None or res["wer"] < best["wer"]:
            best = dict(res, lmwt=lmwt)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "wer"), "w") as f:
        f.write(open(os.path.join(out_dir, "score_%d" % best["lmwt"],
                                  "wer")).read())
    return best


def best_wer(decode_dirs: List[str]) -> str:
    """Pick the best wer line across decode dirs (ref: best_wer.sh:25-40)."""
    best = None
    best_line = ""
    for d in decode_dirs:
        wf = os.path.join(d, "wer")
        if not os.path.exists(wf):
            continue
        line = open(wf).readline().strip()
        m = re.search(r"%WER ([\d.]+)", line)
        if m and (best is None or float(m.group(1)) < best):
            best = float(m.group(1))
            best_line = "%s %s" % (line, d)
    return best_line
