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
