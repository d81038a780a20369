"""Sequence-pipelined recurrence over a "seq" mesh axis (beyond-reference).

The reference has no sequence scaling beyond host-side truncation: any
sentence longer than ``max_seq_length`` is hard-split into independent
pieces (ref: data_io.py:41-65), destroying recurrent state across the
cut. On TPU the natural alternative is to *shard the time axis of the
scan over devices* and pipeline the recurrent carry across them:

  * the sequence (T, B, F) is sharded over a ``"seq"`` mesh axis of S
    devices — each holds one contiguous time slab of T/S steps;
  * the batch is split into M microbatches; at pipeline step k, device
    s runs its local ``lax.scan`` over microbatch ``k - s`` and hands
    the final carry to device s+1 with ``lax.ppermute`` (one (Bm, H)
    hop over ICI per step — tiny next to the weights);
  * after M + S - 1 steps every (slab, microbatch) cell has run:
    classic GPipe skew applied to *time* instead of layers, utilization
    M / (M + S - 1).

This turns "sequence too long for one chip's step-time budget" from a
data-mangling problem into a mesh-shape choice, while keeping bit-exact
recurrence (same op order inside each scan; ppermute moves values
unchanged). Gradients flow through ppermute's transpose (the reversed
permutation) — BPTT across devices needs no custom VJP.

Used by the recurrent model zoo when a :func:`seq_parallel` context is
active (production surface: ``[exp] seq_parallel = S``). The fused
single-kernel recurrences assume the whole T loop lives in one kernel
and zero initial state, so under sequence parallelism the cells use
their ``lax.scan`` form inside each slab.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@dataclass(frozen=True)
class SeqParallelContext:
    mesh: Mesh
    microbatches: Optional[int] = None  # None: pick from B and S
    axis: str = "seq"


_ACTIVE: list = []  # stack; contextvars not needed (tracing is sync)


def seq_parallel_context() -> Optional[SeqParallelContext]:
    """The active sequence-parallel context, consulted by the recurrent
    models at trace time, or None."""
    if _ACTIVE and _ACTIVE[-1].mesh.shape.get(_ACTIVE[-1].axis, 1) > 1:
        return _ACTIVE[-1]
    return None


@contextlib.contextmanager
def seq_parallel(mesh: Mesh, microbatches: Optional[int] = None,
                 axis: str = "seq"):
    """Enable sequence-pipelined scans for model code traced inside."""
    _ACTIVE.append(SeqParallelContext(mesh, microbatches, axis))
    try:
        yield
    finally:
        _ACTIVE.pop()


def pick_microbatches(B: int, S: int, requested: Optional[int] = None) -> int:
    """Largest feasible microbatch count: divides B, defaults to the
    smallest M >= S that divides B (bubble fraction (S-1)/(M+S-1) while
    keeping per-microbatch rows MXU-worthy); 1 when B is prime-ish."""
    if requested is not None:
        m = max(1, min(int(requested), B))
        while B % m:
            m -= 1
        return m
    for m in range(min(S, B), B + 1):
        if B % m == 0:
            return m
    return 1


def seq_pipeline_scan(step: Callable, params: Any, bargs: Sequence,
                      carry0: Any, xs: jnp.ndarray, *, mesh: Mesh,
                      axis: str = "seq", microbatches: Optional[int] = None,
                      slab_fn: Optional[Callable] = None):
    """Pipelined equivalent of
    ``lax.scan(lambda c, x: step(params, bargs, c, x), carry0, xs)``.

    ``step(params, bargs_mb, carry_mb, x_t) -> (carry_mb, y_t)`` must be
    pure. ``params`` is any pytree (replicated into every slab);
    ``bargs`` is a tuple of per-batch arrays: leaves with leading dim B
    are microbatch-sliced alongside the carry (e.g. per-sequence
    dropout masks), any other shape passes through unchanged (e.g. the
    broadcastable (1,1) eval-mode mask); ``carry0`` is a pytree of
    ``(B, ...)`` arrays; ``xs`` is ``(T, B, F)``. Returns
    ``(final_carry, ys)`` exactly like lax.scan.

    T is zero-padded up to a multiple of S; padded steps carry the state
    through unchanged (a per-step validity flag gates the carry update),
    so both the outputs ys[:T] and the returned final carry are exactly
    lax.scan's.

    ``slab_fn(params, bargs_mb, carry_mb, xs_slab) -> (carry_out, ys)``,
    when given, replaces the per-timestep lax.scan over one (slab,
    microbatch) cell with a whole-slab call — the hook that lets the
    recurrent cells run their seeded-carry FUSED Pallas kernels inside
    sequence-parallel slabs (differentiable: BPTT crosses slabs through
    the ppermute transpose and the kernel's (dh0, dc0) outputs). Only
    legal when T divides evenly by S (no padded steps to gate).
    """
    S = mesh.shape[axis]
    T, B = xs.shape[0], xs.shape[1]
    if slab_fn is not None and T % S:
        raise ValueError("slab_fn requires T %% S == 0 (got T=%d, S=%d)"
                         % (T, S))
    M = pick_microbatches(B, S, microbatches)
    Bm = B // M
    Tl = -(-T // S)  # ceil
    pad = Tl * S - T
    tmask = jnp.arange(Tl * S, dtype=jnp.int32) < T
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.zeros((pad,) + xs.shape[1:], xs.dtype)], axis=0)

    def mb_split(a):
        return a.reshape((M, Bm) + a.shape[1:])

    def mb_split_barg(a):
        return mb_split(a) if a.shape[0] == B else a

    def local(params, bargs, carry0, xs_l, tmask_l):
        s = jax.lax.axis_index(axis)
        xs_mb = xs_l.reshape((Tl, M, Bm) + xs_l.shape[2:])
        c0_mb = jax.tree_util.tree_map(mb_split, carry0)
        ba_mb = jax.tree_util.tree_map(mb_split_barg, bargs)
        # output slab buffer: probe the step's output shape abstractly
        c_probe = jax.tree_util.tree_map(lambda c: c[0], c0_mb)
        b_probe = jax.tree_util.tree_map(
            lambda b, o: b[0] if o.shape[0] == B else b, ba_mb, bargs)
        y_shape = jax.eval_shape(
            lambda p, b, c, x: step(p, b, c, x)[1],
            params, b_probe, c_probe, xs_mb[0, 0])
        ybuf = jnp.zeros((Tl, M) + y_shape.shape, y_shape.dtype)
        fbuf = jax.tree_util.tree_map(
            lambda c: jnp.zeros_like(c), c0_mb)
        recv = jax.tree_util.tree_map(lambda c: jnp.zeros_like(c), c_probe)
        take = jax.lax.dynamic_index_in_dim
        put = jax.lax.dynamic_update_index_in_dim
        for k in range(M + S - 1):
            m = k - s
            active = jnp.logical_and(m >= 0, m < M)
            mc = jnp.clip(m, 0, M - 1)
            x_mb = take(xs_mb, mc, 1, keepdims=False)
            b_mb = jax.tree_util.tree_map(
                lambda a, o: (take(a, mc, 0, keepdims=False)
                              if o.shape[0] == B else a), ba_mb, bargs)
            cin = jax.tree_util.tree_map(
                lambda r, c: jnp.where(s == 0,
                                       take(c, mc, 0, keepdims=False), r),
                recv, c0_mb)

            def guarded(c, xv):
                x_t, valid = xv
                c2, y = step(params, b_mb, c, x_t)
                c2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(valid, a, b), c2, c)
                return c2, y

            if slab_fn is not None:
                cout, ys = slab_fn(params, b_mb, cin, x_mb)
            else:
                cout, ys = jax.lax.scan(guarded, cin, (x_mb, tmask_l))
            ybuf = put(ybuf, jnp.where(active, ys,
                                       take(ybuf, mc, 1, keepdims=False)),
                       mc, 1)
            # the final carry of microbatch m leaves the pipeline on the
            # device holding the last REAL timestep
            last = (s == S - 1)
            fbuf = jax.tree_util.tree_map(
                lambda f, co: put(
                    f, jnp.where(jnp.logical_and(active, last), co,
                                 take(f, mc, 0, keepdims=False)), mc, 0),
                fbuf, cout)
            recv = jax.tree_util.tree_map(
                lambda co: jax.lax.ppermute(
                    co, axis, [(i, i + 1) for i in range(S - 1)]), cout)
        ys_out = ybuf.reshape((Tl, B) + ybuf.shape[3:])
        # only device S-1 holds real finals; psum replicates them
        fin = jax.tree_util.tree_map(
            lambda f: jax.lax.psum(
                jnp.where(s == S - 1, f, jnp.zeros_like(f)), axis),
            fbuf)
        fin = jax.tree_util.tree_map(
            lambda f: f.reshape((B,) + f.shape[2:]), fin)
        return fin, ys_out

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), jax.tree_util.tree_map(lambda _: P(), tuple(bargs)),
                  jax.tree_util.tree_map(lambda _: P(), carry0),
                  P(axis), P(axis)),
        out_specs=(jax.tree_util.tree_map(lambda _: P(), carry0), P(axis)),
        axis_names={axis}, check_vma=False)
    fin, ys = fn(params, tuple(bargs), carry0, xs, tmask)
    if pad:
        ys = ys[:T]
    return fin, ys
