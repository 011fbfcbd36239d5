"""Plans: trace-once, execute-anywhere computation graphs.

Reference: ``syft/execution/plan.py`` (+ ``role.py``, ``placeholder.py``)
records torch actions on PlaceHolders so a computation can be shipped to
and executed by a remote worker without shipping Python code.

TPU-native form: ``jax.jit`` tracing already *is* the plan — so a Plan
here is a serialized ``jax.export`` artifact (StableHLO + calling
convention), portable across processes and, when traced with multiple
lowering platforms, across backends (cpu <-> tpu). Unlike the
reference's action lists, the artifact is a compiler IR: the executing
node jit-compiles it natively and runs it at full speed, and it cannot
smuggle arbitrary Python (a safer remote-execution contract than
pickled closures).

Wire contract: a plan's inputs/outputs are flat lists of arrays (the
pytree is flattened at trace time), which keeps the msgpack RPC frame
trivial. ``GridNode`` verbs: ``host_plan`` / ``list_plans`` /
``get_plan`` (download for local execution — the reference's plan
fetch) / ``run_plan`` (remote execution).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import numpy as np
from jax import export as jax_export

from primia_tpu.serve.protocol import pack, unpack


class Plan:
    """A traced, serialized computation. Call with the example-time
    argument structure; returns what the function returned."""

    def __init__(self, exported, name: str, n_inputs: int):
        self._exported = exported
        self.name = name
        self.n_inputs = n_inputs

    # ------------------------------------------------------- build

    @staticmethod
    def trace(fn: Callable, *example_args, name: str = "plan",
              platforms: Sequence[str] = ("cpu", "tpu")) -> "Plan":
        """Trace ``fn`` on example args (any pytree) into a Plan
        (reference ``func2plan`` / ``Plan.build``)."""
        flat, in_tree = jax.tree.flatten(example_args)

        def flat_fn(*flat_args):
            args = jax.tree.unflatten(in_tree, flat_args)
            return jax.tree.leaves(fn(*args))

        jitted = jax.jit(flat_fn)
        try:
            exported = jax_export.export(jitted, platforms=tuple(platforms))(*flat)
        except Exception as e:  # narrow by message: jax has no stable type here
            # Some backends reject cross-platform lowering for specific
            # primitives. Only THAT failure may fall back to a
            # single-platform export — anything else is a genuine trace
            # bug and must propagate, not be masked by a confusing
            # second error.
            msg = str(e).lower()
            if not ("platform" in msg and
                    ("lowering" in msg or "not implemented" in msg
                     or "unsupported" in msg)):
                raise
            import warnings

            warnings.warn(
                f"plan {name!r}: cross-platform export failed ({e}); "
                "falling back to a single-platform plan that only runs "
                "on the tracing backend", stacklevel=2)
            exported = jax_export.export(jitted)(*flat)
        return Plan(exported, name, len(flat))

    # --------------------------------------------------- serialize

    def serialize(self) -> bytes:
        return pack({"name": self.name, "n_inputs": self.n_inputs,
                     "artifact": self._exported.serialize()})

    @staticmethod
    def deserialize(blob: bytes) -> "Plan":
        msg = unpack(blob)
        exported = jax_export.deserialize(bytearray(msg["artifact"]))
        return Plan(exported, msg["name"], int(msg["n_inputs"]))

    # ----------------------------------------------------- execute

    def run_flat(self, flat_inputs: List[np.ndarray]) -> List[np.ndarray]:
        if len(flat_inputs) != self.n_inputs:
            raise ValueError(
                f"plan {self.name!r} expects {self.n_inputs} inputs, "
                f"got {len(flat_inputs)}")
        outs = self._exported.call(*[np.asarray(a) for a in flat_inputs])
        return [np.asarray(o) for o in jax.tree.leaves(outs)]

    def __call__(self, *args):
        flat = jax.tree.flatten(args)[0]
        outs = self.run_flat(flat)
        return outs[0] if len(outs) == 1 else outs


class Protocol:
    """A multi-role computation: an ordered pipeline of (role, Plan).

    Reference: ``syft/execution/protocol.py:337`` — a Protocol maps
    roles to Plans, is deployed by assigning each role to a worker, and
    runs by executing each role's plan and forwarding its outputs as the
    next role's inputs (the reference's placeholder wiring specialised
    to the sequential-forwarding case, which is the only wiring its own
    examples use).

    Deployment maps roles to nodes; ``run`` executes each stage
    remotely via the grid's ``run_plan`` verb, so each role's plan runs
    on *its* worker and only the intermediate flat arrays travel.
    """

    def __init__(self, name: str, stages: Sequence[tuple]):
        # stages: [(role_name, Plan), ...] executed in order
        self.name = name
        self.stages = list(stages)
        if not self.stages:
            raise ValueError("a Protocol needs at least one (role, plan) stage")
        self.assignments: dict = {}

    @property
    def roles(self) -> List[str]:
        return [r for r, _ in self.stages]

    # --------------------------------------------------- serialize

    def serialize(self) -> bytes:
        return pack({
            "name": self.name,
            "stages": [{"role": r, "plan": p.serialize()}
                       for r, p in self.stages],
        })

    @staticmethod
    def deserialize(blob: bytes) -> "Protocol":
        msg = unpack(blob)
        return Protocol(msg["name"], [
            (s["role"], Plan.deserialize(s["plan"])) for s in msg["stages"]])

    # ------------------------------------------------------ deploy

    def deploy(self, grid, assignments: dict) -> "Protocol":
        """Host each role's plan on its assigned node
        (``{role: node_id}``); returns self for chaining."""
        missing = set(self.roles) - set(assignments)
        if missing:
            raise ValueError(f"unassigned roles: {sorted(missing)}")
        for role, plan in self.stages:
            grid.serve_plan(assignments[role], plan)
        self.assignments = dict(assignments)
        return self

    # --------------------------------------------------------- run

    def run(self, grid, *args):
        """Execute the pipeline across the deployed workers: stage i's
        flat outputs are stage i+1's inputs."""
        if not self.assignments:
            raise RuntimeError(f"protocol {self.name!r} is not deployed")
        flat = [np.asarray(a) for a in jax.tree.leaves(list(args))]
        for role, plan in self.stages:
            out = grid.run_remote_plan(self.assignments[role], plan.name, *flat)
            flat = out if isinstance(out, list) else [out]
        return flat[0] if len(flat) == 1 else flat

    def run_local(self, *args):
        """Execute all stages in-process (VirtualWorker analogue)."""
        flat = [np.asarray(a) for a in jax.tree.leaves(list(args))]
        for _, plan in self.stages:
            flat = plan.run_flat(flat)
        return flat[0] if len(flat) == 1 else flat
