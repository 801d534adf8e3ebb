"""Device mesh and sharding utilities.

The reference has NO distributed code of any kind (no torch.distributed, no
NCCL — first-class absence, SURVEY.md section 2.4 rows I-1/I-2).  The
TPU-native replacement: a jax.sharding.Mesh with axes ('data', 'model'),
batch sharded over 'data', parameters replicated (the models are 15.7M +
84.7M params — data parallelism saturates ICI long before model parallelism
pays off; 'model' is available for d_ff/channel sharding at larger scales).

Gradient reduction is NOT hand-written: train steps are ordinary jitted
functions whose inputs carry NamedShardings, and XLA inserts the psum /
all-reduce over ICI (the "let the compiler insert collectives" recipe).

Multi-host: call `initialize_distributed()` once per process before building
the mesh; jax.distributed wires the hosts and `jax.devices()` becomes global.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op on a single host).

    Must run before the first backend touch (jax.devices() etc.).  On the
    CPU backend, cross-process collectives need an implementation picked
    before client creation — gloo is the one baked into jaxlib; TPU pods
    ignore the setting (ICI collectives are native).  Executed for real by
    scripts/multiprocess_dp.py + tests/test_multiprocess.py (2 coordinated
    CPU processes, global DP mesh, bitwise-matching train metrics)."""
    if num_processes is not None and num_processes > 1:
        # NOTE: must not touch the backend here (jax.default_backend() would
        # instantiate it before the distributed client exists) — decide from
        # the platform config instead.
        platforms = jax.config.jax_platforms or ""
        if platforms.startswith("cpu") or os.environ.get("SAMBERT_FORCE_CPU"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def create_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence[Any]] = None
) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data * model} != {n} devices")
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put every leaf with its leading axis sharded over 'data'.

    Multi-process: every process passes the SAME global batch (the host data
    pipeline is deterministic), and each contributes only the slice its
    addressable devices own — a cross-process device_put is not a thing, so
    the global array is assembled from process-local shards."""
    nproc = jax.process_count()

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sharding)
        # Every process holds the full global batch, so let the runtime ask
        # for exactly the index range each addressable shard owns — correct
        # for ANY device order in the mesh (a hand-computed
        # process_index()*per slice silently misassigns rows when the data
        # axis is not contiguous per process, e.g. topology-ordered pods).
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state).

    Multi-process: every process must hold identical values (same init
    seed / same checkpoint); each contributes its full copy and the runtime
    stitches the replicated global array without any data movement."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
