"""Device mesh + sharding layout for distributed training.

The reference's only parallelism is single-host ``nn.DataParallel``
(replicate + scatter batch + NCCL allreduce, ref: utils.py:1781-1784).
The TPU-native design replaces it with GSPMD over a
``jax.sharding.Mesh``:

  * axis "data": the global batch is sharded (DP). Gradients reduce via
    the ``psum`` XLA inserts for the loss mean — riding ICI, not host
    memory;
  * axis "model": optional tensor parallelism — weight matrices whose
    leading (output) dim is divisible by the axis size are sharded on
    that dim; XLA inserts the all-gathers/reduce-scatters (scaling-book
    recipe: annotate shardings, let the compiler place collectives).

Masks are sharded exactly like their weights; batch-norm state is
replicated (its stats already reduce over the batch inside the step).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              seq_axis: int = 1) -> Mesh:
    """1-D data mesh by default; pass model_axis>1 to split off a tensor-
    parallel axis, seq_axis>1 for a sequence-pipeline axis (see
    parallel/seqpipe.py). n must be divisible by the product."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    split = model_axis * seq_axis
    if n % split:
        raise ValueError(
            "n_devices %d not divisible by model_axis %d x seq_axis %d"
            % (n, model_axis, seq_axis))
    if seq_axis > 1:
        return Mesh(devices.reshape(n // split, model_axis, seq_axis),
                    ("data", "model", "seq"))
    return Mesh(devices.reshape(n // split, model_axis), ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int) -> NamedSharding:
    """Shard the batch axis over "data", replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """Tensor-parallel rule: shard dim 0 (the output/hidden dim of our
    (out,in) weights) over "model" when divisible and large enough."""
    model_size = mesh.shape["model"]
    if model_size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2 \
            and leaf.shape[0] % model_size == 0 and leaf.shape[0] >= 2 * model_size:
        spec = ["model"] + [None] * (leaf.ndim - 1)
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def model_sharding_rules(mesh: Mesh, variables: Dict[str, Any]):
    """Sharding pytree matching a variables pytree: weights (and their
    masks) split over "model", everything else replicated."""
    return jax.tree_util.tree_map(lambda leaf: _leaf_sharding(mesh, leaf),
                                  variables)


def shard_variables(variables: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = model_sharding_rules(mesh, variables)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), variables, shardings)
