"""Multi-chip data parallelism over a device mesh.

The reference has no per-step gradient parallelism — its only "data
parallel" form is federated round-robin with periodic FedAvg
(SURVEY.md §2.4). On TPU, scaling one site's training across chips is
the standard mesh recipe (How to Scale Your Model): replicate the
parameters, shard the batch over a ``data`` axis, and let XLA insert
the gradient ``psum`` over ICI when it partitions the backward pass.

This module wraps the single-chip train/eval steps with those shardings.
It composes with the federated layer: a (node, data) mesh gives each
simulated hospital a slice of chips, with FedAvg reducing over the
``node`` axis (see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_train_step(model_def, optimizer, args, mean, std,
                     class_weights=None, *, mesh: Mesh, axis: str = "data",
                     donate: bool = True):
    """Build the train step jitted for data parallelism on ``mesh``.

    Signature matches ``build_train_step``'s product:
    ``step(ts, key, images_u8, labels, mask, lr) -> (ts, loss)`` with
    the TrainState replicated and the batch arrays sharded over
    ``axis``. The per-shard batch is ``batch_size / mesh.size`` — pass
    globally-batched arrays, XLA scatters them.
    """
    from primia_tpu.train.steps import TrainState, build_train_step

    raw = build_train_step(model_def, optimizer, args, mean, std,
                           class_weights, jit_compile=False)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    return jax.jit(
        raw,
        in_shardings=(TrainState(repl, repl, repl), repl, bsh, bsh, bsh, None),
        out_shardings=(TrainState(repl, repl, repl), repl),
        donate_argnums=(0,) if donate else (),
    )


def shard_eval_step(model_def, args, mean, std, class_weights=None, *,
                    mesh: Mesh, axis: str = "data"):
    """Eval step with a batch-sharded forward (logits gathered back)."""
    from primia_tpu.train.steps import build_eval_step

    inner = build_eval_step(model_def, args, mean, std, class_weights)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    return jax.jit(
        inner,
        in_shardings=(repl, repl, bsh, bsh, bsh),
        out_shardings=(repl, bsh),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place batch arrays sharded over ``axis`` (leading dim)."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
