"""Device-trace analysis: per-op timing, byte/FLOP attribution, roofline.

The reference's only tracing facilities are the LoggingTensor decorator
and per-worker message history (SURVEY §5; ``syft/.../decorators/
logging.py``, ``workers/base.py:115-123``) — op *logs*, no timing. This
module is the TPU-native upgrade: capture an XLA device trace with
``primia_tpu.utils.profile`` (jax.profiler), then parse the xplane
protobuf offline into per-op statistics and a roofline attribution
against the chip's HBM-bandwidth and MXU roofs.

Shapes are recovered from the op metadata names XLA embeds in the trace
(``%fusion.12 = bf16[256,112,112,64]{...} fusion(bf16[...] %arg, ...)``)
— the first tensor is the output, the rest are operands; their byte sum
upper-bounds the op's HBM traffic (fused intermediates never touch HBM).
Conv FLOPs are estimated from kernel/activation shapes. The parser needs
the ``tensorflow`` package only for the xplane protobuf schema (same
lazy gating as the TF serving bridge).

Used to derive the numbers in BASELINE.md §"Round 2: corrected step
timings + roofline".
"""

from __future__ import annotations

import collections
import glob
import math
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

# v5e single-chip roofs; override per-chip via the roofline() arguments
V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_TENSOR_RE = re.compile(r"(\w+)\[([\d,]*)\]")


@dataclass
class OpStat:
    name: str
    total_ms: float
    count: int
    bytes_est: int
    flops_est: int

    @property
    def per_call_ms(self) -> float:
        return self.total_ms / max(self.count, 1)

    def achieved_gbs(self) -> float:
        per = self.per_call_ms
        return (self.bytes_est / 1e9) / (per / 1e3) if per > 0 else 0.0

    def floor_ms(self, hbm_gbs: float = V5E_HBM_GBS,
                 mxu_tflops: float = V5E_BF16_TFLOPS) -> float:
        """Per-call roofline floor: max of HBM time and MXU time, capped
        at the measured time (the byte estimate is an upper bound)."""
        floor = max(self.bytes_est / (hbm_gbs * 1e9),
                    self.flops_est / (mxu_tflops * 1e12)) * 1e3
        return min(floor, self.per_call_ms)


def _tensors(name: str) -> List[Tuple[str, List[int]]]:
    out = []
    for m in _TENSOR_RE.finditer(name):
        dt, dims = m.group(1), m.group(2)
        if dt in _DTYPE_BYTES:
            out.append((dt, [int(d) for d in dims.split(",") if d]))
    return out


def _op_bytes(tensors) -> int:
    return sum(_DTYPE_BYTES[dt] * (math.prod(sh) if sh else 1)
               for dt, sh in tensors)


def _conv_flops(name: str, tensors) -> int:
    """Estimate conv FLOPs when the op looks like a convolution:
    forward/data-grad (4-d output + small 4-d kernel operand) or weight
    grad (small 4-d output + large 4-d activation operands)."""
    if not tensors:
        return 0
    _, out_shape = tensors[0]
    kernels = [s for _, s in tensors[1:]
               if len(s) == 4 and s[0] <= 7 and s[1] <= 7]
    if ("convolution" in name or "conv" in name) and len(out_shape) == 4 and kernels:
        b, h, w, _ = out_shape
        k1, k2, ci, co = kernels[0]
        return 2 * b * h * w * k1 * k2 * ci * co
    if len(out_shape) == 4 and out_shape[0] <= 7 and out_shape[1] <= 7:
        acts = [s for _, s in tensors[1:] if len(s) == 4 and s[0] > 7]
        if acts:
            k1, k2, ci, co = out_shape
            b = acts[0][0]
            spatial = min(a[1] * a[2] for a in acts)
            return 2 * b * spatial * k1 * k2 * ci * co
    return 0


def find_xplane(path: str) -> str:
    """Resolve a trace dir (as passed to ``utils.profile``) or a direct
    ``.xplane.pb`` file to the newest xplane file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {path}")
    return hits[-1]


def _load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: schema only

    xs = xplane_pb2.XSpace()
    with open(find_xplane(path), "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def parse_xplane(path: str, *, line: str = "XLA Ops",
                 device_substr: str = "TPU") -> List[OpStat]:
    """Per-op stats from a device plane of a JAX trace."""
    xs = _load_xspace(path)
    stats: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if device_substr not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for ln in plane.lines:
            if ln.name != line:
                continue
            for ev in ln.events:
                s = stats[ev_meta.get(ev.metadata_id, "?")]
                s[0] += ev.duration_ps / 1e9
                s[1] += 1
    out = []
    for name, (ms, cnt) in stats.items():
        ts = _tensors(name)
        out.append(OpStat(name=name, total_ms=ms, count=int(cnt),
                          bytes_est=_op_bytes(ts),
                          flops_est=_conv_flops(name, ts)))
    out.sort(key=lambda o: -o.total_ms)
    return out


def module_executions(path: str, device_substr: str = "TPU"):
    """(module_name, start_ms, duration_ms) for each executed XLA module,
    time-ordered — exposes inter-step device idle."""
    xs = _load_xspace(path)
    rows = []
    for plane in xs.planes:
        if device_substr not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for ln in plane.lines:
            if ln.name != "XLA Modules":
                continue
            for ev in ln.events:
                rows.append((ev_meta.get(ev.metadata_id, "?"),
                             ev.offset_ps / 1e9, ev.duration_ps / 1e9))
    rows.sort(key=lambda r: r[1])
    return rows


def roofline(ops: List[OpStat], *, hbm_gbs: float = V5E_HBM_GBS,
             mxu_tflops: float = V5E_BF16_TFLOPS, top: int = 25) -> dict:
    """Roofline summary + a printable table of the top ops.

    Control-flow wrapper ops (``while``/``conditional``) are excluded
    from the totals: their duration covers their body, whose ops appear
    as separate rows on the same timeline — counting both doubles the
    total (first seen on the tiled ``lax.map`` encrypted forward, where
    the while row alone equalled the whole program).
    """
    ops = [o for o in ops
           if not o.name.lstrip("%").startswith(("while", "conditional"))]
    total = sum(o.total_ms for o in ops)
    floor = sum(o.floor_ms(hbm_gbs, mxu_tflops) * o.count for o in ops)
    flops = sum(o.flops_est * o.count for o in ops)
    lines = [f"{'ms/call':>9} {'GB/s':>7} {'%HBMroof':>8}  op"]
    for o in ops[:top]:
        bw = o.achieved_gbs()
        lines.append(f"{o.per_call_ms*1e3:8.0f}u {bw:7.0f} "
                     f"{100 * bw / hbm_gbs:7.0f}%  {o.name[:100]}")
    return {
        "total_ms": total,
        "floor_ms": floor,
        "efficiency": floor / total if total else 0.0,
        "conv_tflops": flops / 1e12,
        "table": "\n".join(lines),
    }
