"""Parameter sharding rules (tensor parallelism via pjit).

At reference scale (15.7M + 84.7M params) pure data parallelism is optimal —
but the framework supports sharding parameters over the 'model' mesh axis so
the same train steps scale past a single chip's HBM.  The rule is shape-based
(Megatron-style column split): any rank>=2 leaf whose last (output) dimension
divides the model-axis size is sharded on that dimension; vectors and scalars
replicate.  Because our kernels are all [..., in, out] / [k, in, out] layouts,
this splits FFN/attention/conv output channels, and XLA inserts the matching
all-gathers/reduce-scatters during pjit partitioning — no hand-written
collectives.

Optimizer states mirror parameter shapes, so the same rule shards Adam's
mu/nu consistently with their parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def tp_sharding_for_leaf(x, mesh: Mesh) -> NamedSharding:
    model_size = mesh.shape[MODEL_AXIS]
    shape = np.shape(x)
    if model_size > 1 and len(shape) >= 2 and shape[-1] % model_size == 0:
        spec = P(*([None] * (len(shape) - 1)), MODEL_AXIS)
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def tp_shardings_by_shape(tree: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `tree` under the shape rule."""
    return jax.tree.map(lambda x: tp_sharding_for_leaf(x, mesh), tree)


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its rule-derived sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, tp_sharding_for_leaf(x, mesh)), tree
    )
