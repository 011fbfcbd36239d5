"""Multi-host (pod / DCN) initialization and mesh construction.

The reference's genuinely-remote tier is its websocket grid (hospitals
are separate trust domains — that stays RPC, ``primia_tpu.serve``).
WITHIN one trust domain, scaling past a single host is the TPU-native
equivalent of nothing the reference has: a pod slice driven as one SPMD
program, processes connected by ``jax.distributed`` over DCN and chips
by ICI (SURVEY.md §2.4 / §5 "Distributed communication backend").

Usage (same script on every host of the slice)::

    from primia_tpu.parallel import multihost

    multihost.initialize()                  # no-op on a single host
    mesh = multihost.federated_mesh(n_nodes=3)
    # leaves of a stacked pytree sharded P("node") ride ICI/DCN;
    # jit'ed steps and secure_fedavg work unchanged over this mesh

Under a TPU runtime the coordinator address / process count come from
the environment (GKE, gcloud, or JAX_COORDINATOR_ADDRESS etc.), so
``initialize`` takes no required arguments.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Connect this process to the slice via ``jax.distributed``.

    Returns True when a multi-process runtime was initialized, False for
    the single-process case (nothing to do). Safe to call twice.
    Explicit arguments override the environment (useful for CPU
    multi-process tests); with none given and no cluster environment,
    this is a no-op rather than an error.
    """
    import jax

    if getattr(initialize, "_done", False):
        return True
    explicit = coordinator_address is not None
    env_cluster = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    )
    if not explicit and not env_cluster:
        return False
    if not explicit:
        # auto-detected cluster env: only valid before the XLA backend
        # exists; if something already initialized it (imports, another
        # library), degrade to single-process instead of raising
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            import warnings

            warnings.warn(
                "cluster environment detected but the XLA backend is "
                "already initialized; continuing single-process. Call "
                "multihost.initialize() before any other jax use."
            )
            return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    initialize._done = True
    return True


def slice_topology() -> Tuple[int, int, int]:
    """(process_index, process_count, global_device_count)."""
    import jax

    return jax.process_index(), jax.process_count(), jax.device_count()


def factor_mesh(n_devices: int, n_nodes: int) -> Tuple[int, int]:
    """Split ``n_devices`` into (node, data) axis sizes.

    The node axis carries the federated replicas; remaining parallelism
    goes to per-node batch data-parallelism. When the device count is
    not divisible by ``n_nodes``, node count falls back to the largest
    divisor <= n_nodes (nodes beyond the axis are masked by the
    federated driver, same as heterogeneous shards).
    """
    node_n = max(d for d in range(1, min(n_nodes, n_devices) + 1)
                 if n_devices % d == 0)
    return node_n, n_devices // node_n


def federated_mesh(n_nodes: int, devices=None):
    """A global (node, data) ``Mesh`` over every device in the slice.

    On one host this is the same mesh ``dryrun_multichip`` builds; on a
    pod it spans hosts — ``jax.devices()`` is global after
    ``initialize()``, and XLA routes the node-axis collectives
    (``secure_fedavg``'s share sums, FedAvg ``psum``) over ICI within a
    host and DCN across hosts.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(devices if devices is not None else jax.devices())
    node_n, data_n = factor_mesh(devs.size, n_nodes)
    return Mesh(devs.reshape(node_n, data_n), axis_names=("node", "data"))
