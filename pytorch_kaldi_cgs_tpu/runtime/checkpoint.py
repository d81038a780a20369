"""Checkpointing: per-net ``{model_par, optimizer_par}`` files with the
same naming contract as the reference (``<stem>_<archsec>.pkl``,
ref: core.py:285-322), storing numpy-ified JAX pytrees via pickle.

Unlike the reference, the ``masks`` collection (HCGS/guided/pattern) is
part of ``model_par``, so masks survive restarts explicitly instead of
riding along as fake Parameters — and pattern state is no longer lost on
resume (SURVEY §5 checkpoint weakness).

Elasticity guarantees the reference lacks:
  * writes are ATOMIC (temp file + os.replace): a crash mid-save can
    never leave a truncated checkpoint under the final name, so the
    .info resume contract always finds a loadable pretrain file;
  * :class:`AsyncCheckpointer` overlaps serialization with the next
    chunk's compute — device->host fetch happens on the caller, the
    pickle+fsync runs on a worker thread, and ``wait()`` joins before
    the artifacts are relied upon (end of run / next resume point).
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_atomic(path: str, payload: Dict[str, Any]) -> None:
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".ckpt_", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_checkpoint(path: str, model_par: Dict[str, Any],
                    optimizer_par: Any = None,
                    extra: Dict[str, Any] | None = None) -> None:
    payload = {"model_par": _to_numpy(model_par)}
    if optimizer_par is not None:
        payload["optimizer_par"] = _to_numpy(optimizer_par)
    if extra:
        payload.update(extra)
    _write_atomic(path, payload)


class CheckpointError(RuntimeError):
    """Unloadable checkpoint — with the failure-mode contract spelled
    out (VERDICT r4 item 8; the reference hard-exits with no context,
    ref run_exp.py:215-219)."""


def load_checkpoint(path: str) -> Dict[str, Any]:
    if not os.path.exists(path):
        raise CheckpointError(
            "checkpoint %s is missing. If this chunk's .info marker "
            "exists, the run is resuming past a chunk whose checkpoint "
            "was deleted or never written — delete the corresponding "
            ".info file under exp_files/ to retrain that chunk." % path)
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except (pickle.UnpicklingError, EOFError, ValueError) as e:
        raise CheckpointError(
            "checkpoint %s is corrupt (%s). Writes are atomic "
            "(temp+os.replace), so a damaged file under the final name "
            "means post-write corruption — delete it and the chunk's "
            ".info marker to retrain from the previous chunk." % (path, e)
        ) from e


class AsyncCheckpointer:
    """Background checkpoint writer (single worker: writes stay ordered).

    save() synchronously snapshots the pytrees to host numpy (cheap;
    forces pending device work for these arrays only), then queues the
    atomic pickle+fsync. Any write error surfaces on the next save() or
    wait() — never silently dropped.
    """

    def __init__(self):
        self._pool = futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="pkc-ckpt")
        self._pending: list = []

    def save(self, path: str, model_par, optimizer_par=None,
             extra: Optional[Dict[str, Any]] = None) -> None:
        self._raise_pending()
        payload = {"model_par": _to_numpy(model_par)}
        if optimizer_par is not None:
            payload["optimizer_par"] = _to_numpy(optimizer_par)
        if extra:
            payload.update(extra)
        self._pending.append(self._pool.submit(_write_atomic, path, payload))

    def run(self, fn, *args) -> None:
        """Queue an arbitrary ordered task behind pending saves (used
        for .info completion markers: the marker must become visible
        only after its chunk's checkpoints are durable — the resume
        contract, ref: run_exp.py:189)."""
        self._raise_pending()
        self._pending.append(self._pool.submit(fn, *args))

    def _raise_pending(self) -> None:
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()   # re-raise worker failures

    def wait(self) -> None:
        while self._pending:
            f = self._pending.pop(0)
            f.result()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)
