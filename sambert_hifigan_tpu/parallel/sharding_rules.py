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

Exception — ConvTranspose (upsampler) kernels stay replicated.  Sharding the
lhs-dilated transposed conv's out-channels makes the SPMD partitioner lower
its *backward* pad as ~dozens of tiny per-slice all-to-alls over the model
axis (measured: 144 all-to-all ops in the HiFi-GAN GAN step HLO at the dryrun
config).  That is a terrible collective schedule on any backend, and on
XLA:CPU's in-process communicator the flood of independent subgroup
collectives can deadlock the thunk executor outright.  The `up_*` kernels are
<1% of generator params; replicating them costs nothing and keeps the
partitioned program clean.  Path-based exclusion (`_TP_EXCLUDE_KEYS`) applies
identically to optimizer-state mirrors, so Adam's mu/nu stay consistent with
their parameters.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# Pytree-path key prefixes whose leaves always replicate (see module docstring).
_TP_EXCLUDE_KEYS: Tuple[str, ...] = ("up_",)


def _path_key_names(path) -> Iterable[str]:
    for k in path:
        yield str(getattr(k, "key", getattr(k, "name", k)))


def _tp_excluded(path) -> bool:
    return any(
        name.startswith(pref)
        for name in _path_key_names(path)
        for pref in _TP_EXCLUDE_KEYS
    )


def tp_sharding_for_leaf(x, mesh: Mesh, path=()) -> NamedSharding:
    model_size = mesh.shape[MODEL_AXIS]
    shape = np.shape(x)
    if (
        model_size > 1
        and len(shape) >= 2
        and shape[-1] % model_size == 0
        and not _tp_excluded(path)
    ):
        spec = P(*([None] * (len(shape) - 1)), MODEL_AXIS)
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def tp_shardings_by_shape(tree: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `tree` under the shape rule."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: tp_sharding_for_leaf(x, mesh, path), tree
    )


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its rule-derived sharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, tp_sharding_for_leaf(x, mesh, path)),
        tree,
    )
