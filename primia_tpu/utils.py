"""Observability utilities: op tracing and device profiling.

The reference's only introspection tools are ``LoggingTensor`` (logs
each op as it forwards down the tensor chain,
``syft/frameworks/torch/tensors/decorators/logging.py``) and per-message
``verbose`` prints; it has no profiler (SURVEY.md §5).

* :class:`LoggingEngine` is the LoggingTensor equivalent for the engine
  protocol: wrap any engine (``PLAIN`` or an ``MpcEngine``) and every op
  the model graph executes is recorded with its operand shapes — same
  graphs, observed instead of monkey-patched.
* :func:`profile` wraps ``jax.profiler`` into a context manager that
  writes a TensorBoard-loadable device trace — a strict improvement over
  the reference (which has wall-clock prints only).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, List, Tuple


class LoggingEngine:
    """Engine decorator: records every op call as (name, arg shapes).

    >>> eng = LoggingEngine(PLAIN)
    >>> model_def.forward(params, state, x, E=eng)
    >>> eng.log  # [("conv2d", [(1,224,224,1), (7,7,1,64)]), ...]
    """

    def __init__(self, inner):
        self._inner = inner
        self.name = f"logged({inner.name})"
        self.log: List[Tuple[str, List[Any]]] = []

    def __getattr__(self, op):
        target = getattr(self._inner, op)
        if not callable(target):
            return target

        def wrapper(*args, **kwargs):
            shapes = [getattr(a, "shape", a) for a in args]
            self.log.append((op, shapes))
            return target(*args, **kwargs)

        return wrapper

    def summary(self) -> str:
        lines = [f"{i:3d}  {op:10s} {shapes}" for i, (op, shapes) in enumerate(self.log)]
        return "\n".join(lines)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/primia_trace", host_only: bool = False):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    >>> with profile("/tmp/trace"):
    ...     step(...)  # traced
    """
    import jax

    if host_only:
        t0 = time.perf_counter()
        yield
        print(f"[profile] wall: {time.perf_counter() - t0:.3f}s")
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {logdir}")
