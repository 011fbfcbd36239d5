"""Checkpoint save/load and the completed-trainings registry.

Reference contract (``torchlib/utils.py:1470-1493`` ``save_model``,
``train.py:344-389`` resume, ``inference.py:82-93`` restore): a single
checkpoint file holding ``{epoch, model_state_dict, optim_state_dict
(per-worker dict when federated), args, val_mean_std}``; ``val_mean_std``
is the normalization contract between training and inference.

Format: a numpy ``.npz`` archive (no pickling) — pytrees are flattened
with a JSON structure skeleton and the leaves stored as arrays. Dicts,
lists, tuples, the optimizer NamedTuples, scalars, and None round-trip
without needing a template at load time.
"""

from __future__ import annotations

import io
import json
import os
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from primia_tpu.config import Arguments
from primia_tpu.train.optim import AdamState, SGDState

_NAMEDTUPLES = {"AdamState": AdamState, "SGDState": SGDState}


def _encode(obj, leaves: list):
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, dict):
        return {"t": "dict", "v": {k: _encode(obj[k], leaves) for k in obj}}
    for name, cls in _NAMEDTUPLES.items():
        if isinstance(obj, cls):
            return {"t": "nt", "c": name,
                    "v": [_encode(x, leaves) for x in obj]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "v": [_encode(x, leaves) for x in obj]}
    if isinstance(obj, (str,)):
        return {"t": "str", "v": obj}
    if isinstance(obj, bool):
        return {"t": "bool", "v": obj}
    if isinstance(obj, int):
        return {"t": "int", "v": obj}
    if isinstance(obj, float):
        return {"t": "float", "v": obj}
    # array leaf (jax or numpy, incl. 0-d)
    leaves.append(np.asarray(obj))
    return {"t": "arr", "i": len(leaves) - 1}


def _decode(spec, leaves):
    t = spec["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode(v, leaves) for k, v in spec["v"].items()}
    if t == "nt":
        cls = _NAMEDTUPLES[spec["c"]]
        return cls(*[_decode(x, leaves) for x in spec["v"]])
    if t == "list":
        return [_decode(x, leaves) for x in spec["v"]]
    if t == "tuple":
        return tuple(_decode(x, leaves) for x in spec["v"])
    if t in ("str", "bool", "int", "float"):
        return spec["v"]
    if t == "arr":
        return leaves[spec["i"]]
    raise ValueError(f"bad checkpoint spec node {t!r}")


def save_tree(path, tree: Dict[str, Any]) -> None:
    """Serialize an arbitrary pytree-of-arrays dict to ``path``."""
    leaves: list = []
    spec = _encode(tree, leaves)
    payload = {f"leaf_{i}": a for i, a in enumerate(leaves)}
    payload["__spec__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8
    )
    path = Path(path)
    if path.parent and not path.parent.is_dir():
        path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.BytesIO()
    # stored, not deflated: float parameters are incompressible noise
    # (zlib-6 costs ~6 s per ResNet checkpoint to shave 7%)
    np.savez(buf, **payload)
    path.write_bytes(buf.getvalue())


def load_tree(path) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["__spec__"].tobytes()).decode())
        leaves = {int(k.split("_")[1]): z[k] for k in z.files if k.startswith("leaf_")}
    return _decode(spec, [leaves[i] for i in range(len(leaves))])


def save_model(
    path,
    *,
    epoch: int,
    params,
    model_state,
    opt_state,
    args: Arguments,
    val_mean_std: Tuple[np.ndarray, np.ndarray],
    executor=None,
) -> None:
    """Write a training checkpoint (reference ``save_model``).

    When federated, pass the *local model* params and the per-worker
    ``{worker_id: opt_state}`` dict as ``opt_state`` — same semantics as
    the reference (``utils.py:1470-1482``).

    ``executor``: optional ``concurrent.futures`` executor — with one,
    the caller only pays for a device-side snapshot copy (~ms; the
    copies decouple the checkpoint from buffers the next train step may
    donate), and the ~2.6 s device fetch + ~130 MB disk write both run
    in the background, hidden behind the next epoch's compute.

    Returns the submitted ``Future`` when an executor is given (callers
    MUST ``.result()`` it eventually — a dropped future swallows fetch
    or disk errors and silently loses the checkpoint), else ``None``
    after writing synchronously.
    """
    import jax
    import jax.numpy as jnp

    dev = {"p": params, "s": model_state, "o": opt_state}
    if executor is not None:
        dev = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, dev
        )
    meta = {
        "epoch": int(epoch),
        "args": args.to_json(),
        "val_mean_std": (
            np.asarray(val_mean_std[0]),
            np.asarray(val_mean_std[1]),
        ),
    }

    def fetch_and_write():
        # ONE device_get over the whole checkpoint: the async host
        # copies for every leaf are issued before the first blocking
        # wait, so the device->host round-trip cost is paid once, not
        # per tensor (the axon tunnel charges ~0.4 s per blocking fetch)
        fetched = jax.device_get(dev)
        tree = {
            **meta,
            "model_state_dict": {
                "params": fetched["p"],
                "state": fetched["s"],
            },
            "optim_state_dict": fetched["o"],
        }
        save_tree(path, tree)

    if executor is not None:
        return executor.submit(fetch_and_write)
    fetch_and_write()
    return None


def load_model(path) -> Dict[str, Any]:
    """Read a checkpoint; ``args`` comes back as an ``Arguments``."""
    tree = load_tree(path)
    tree["args"] = Arguments.from_json(tree["args"])
    return tree


def save_config_results(args: Arguments, score: float, timestamp: Optional[str] = None,
                        table: str = "") -> None:
    """Append the run's full config + best score to the registry CSV
    (reference ``save_config_results``, ``utils.py:859-874``)."""
    import pandas as pd

    d = args.to_dict()
    d["timestamp"] = timestamp or datetime.now().strftime("%d.%m.%Y %H:%M:%S")
    d["best_validation_score"] = score
    d["stats_table"] = table
    path = Path(args.save_file)
    if path.parent and not path.parent.is_dir():
        path.parent.mkdir(parents=True, exist_ok=True)
    row = pd.DataFrame([d])
    if path.is_file():
        old = pd.read_csv(path)
        row = pd.concat([old, row], ignore_index=True)
    row.to_csv(path, index=False)
