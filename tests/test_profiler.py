"""Trace-analysis utility (primia_tpu/profiler.py).

Builds a synthetic xplane proto (no TPU needed) and checks op parsing,
byte/FLOP estimation from XLA metadata names, and the roofline summary.
"""

import pytest

from primia_tpu.profiler import OpStat, parse_xplane, module_executions, roofline

tf = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")


CONV_NAME = ("%convolution.1 = bf16[8,112,112,64]{0,3,2,1} "
             "convolution(bf16[8,224,224,3]{0,3,2,1} %x, "
             "bf16[7,7,3,64]{3,2,1,0} %w)")
EW_NAME = "%fusion.9 = f32[1024]{0} fusion(f32[1024]{0} %a, f32[1024]{0} %b)"


def _write_trace(tmp_path):
    xs = tf.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    for i, name in enumerate([CONV_NAME, EW_NAME], start=1):
        m = plane.event_metadata[i]
        m.id = i
        m.name = name
    mm = plane.event_metadata[10]
    mm.id, mm.name = 10, "jit_step(123)"

    ops = plane.lines.add()
    ops.name = "XLA Ops"
    for md, off, dur in [(1, 0, 2_000_000), (2, 2_000_000, 500_000),
                         (1, 3_000_000, 2_000_000)]:
        ev = ops.events.add()
        ev.metadata_id, ev.offset_ps, ev.duration_ps = md, off, dur

    mods = plane.lines.add()
    mods.name = "XLA Modules"
    for off in (0, 5_000_000_000):  # ps: steps at 0 ms and 5 ms
        ev = mods.events.add()
        ev.metadata_id, ev.offset_ps, ev.duration_ps = 10, off, 4_000_000_000

    p = tmp_path / "t.xplane.pb"
    p.write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_parse_and_estimates(tmp_path):
    d = _write_trace(tmp_path)
    ops = parse_xplane(d)
    assert len(ops) == 2
    conv = next(o for o in ops if "convolution" in o.name)
    ew = next(o for o in ops if "fusion.9" in o.name)

    assert conv.count == 2 and abs(conv.total_ms - 0.004) < 1e-9
    # bytes: out 8*112*112*64*2 + in 8*224*224*3*2 + w 7*7*3*64*2
    assert conv.bytes_est == (8 * 112 * 112 * 64 + 8 * 224 * 224 * 3
                              + 7 * 7 * 3 * 64) * 2
    # flops: 2 * B * Ho * Wo * k*k*Cin*Cout
    assert conv.flops_est == 2 * 8 * 112 * 112 * 7 * 7 * 3 * 64
    assert ew.flops_est == 0
    assert ew.bytes_est == 3 * 1024 * 4


def test_module_gaps_and_roofline(tmp_path):
    d = _write_trace(tmp_path)
    mods = module_executions(d)
    assert [round(m[1], 3) for m in mods] == [0.0, 5.0]
    assert all(abs(m[2] - 4.0) < 1e-9 for m in mods)

    r = roofline(parse_xplane(d))
    assert 0 < r["efficiency"] <= 1.0
    assert r["total_ms"] > 0 and "op" in r["table"]
