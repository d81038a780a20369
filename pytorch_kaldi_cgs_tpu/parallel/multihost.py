"""Multi-host training helpers.

The reference never runs multi-node (its ``cmd`` cluster hook is a
config passthrough, SURVEY §2.10). The TPU-native design is multi-host
by construction: GSPMD shardings already express the cross-host layout;
what multi-host adds is (a) jax.distributed initialization and (b)
feeding each host its own slice of the data. The chunk-list machinery
the toolkit inherits from the reference makes (b) natural — each host
takes an interleaved subset of the per-chunk sentence lists.

Typical use on each host::

    from pytorch_kaldi_cgs_tpu.parallel import multihost
    multihost.initialize()                  # reads JAX coordinator env
    ...
    # inside the data loader: keep only this host's sentences
    lines = multihost.shard_list_for_host(open(lst).readlines())
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    """Number of hosts. PKC_PROCESS_COUNT overrides (simulation hook for
    testing multi-host data sharding without jax.distributed)."""
    env = os.environ.get("PKC_PROCESS_COUNT")
    if env:
        return int(env)
    return jax.process_count()


def process_index() -> int:
    env = os.environ.get("PKC_PROCESS_INDEX")
    if env:
        return int(env)
    return jax.process_index()


def shard_list_for_host(items: Sequence, host: Optional[int] = None,
                        n_hosts: Optional[int] = None) -> List:
    """Interleaved per-host split of a sentence list: host i takes items
    i, i+n, i+2n, ... — keeps each host's shard length-balanced because
    chunk lists are sorted/shuffled upstream."""
    host = process_index() if host is None else host
    n_hosts = process_count() if n_hosts is None else n_hosts
    return list(items[host::n_hosts])


def shard_scp_for_host(scp_path: str):
    """This host's interleaved share of an scp/lst file, as a binary
    file-like consumable by the kaldi_io scp readers. Returns the path
    unchanged when single-host (zero-copy fast path)."""
    if process_count() <= 1:
        return scp_path
    import io
    with open(scp_path, "rb") as f:
        lines = [ln for ln in f if ln.strip()]
    return io.BytesIO(b"".join(shard_list_for_host(lines)))


def global_batch_per_host(global_batch: int) -> int:
    """Per-host batch size for a given global batch (must divide)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError("global batch %d not divisible by %d hosts"
                         % (global_batch, n))
    return global_batch // n
