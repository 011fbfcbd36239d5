"""Tooling subsystems: HPO study, data distribution, monitor, MNIST idx,
figure-script helpers."""

import gzip
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from primia_tpu.train.hpo import Study, Trial, TrialPruned


# ------------------------------------------------------------------- hpo

def test_hpo_optimize_finds_good_region(tmp_path):
    study = Study(str(tmp_path / "study.json"), n_startup=5, seed=0)

    def objective(trial):
        x = trial.suggest_float("x", -10, 10)
        c = trial.suggest_categorical("c", [True, False])
        return -(x - 3.0) ** 2 + (1.0 if c else 0.0)

    best = study.optimize(objective, 40)
    assert best is not None
    assert abs(best.params["x"] - 3.0) < 3.0
    # persisted and resumable
    study2 = Study(str(tmp_path / "study.json"))
    assert len(study2.trials) == 40
    assert study2.best_trial.value == best.value


def test_hpo_pruning(tmp_path):
    study = Study(str(tmp_path / "s.json"), n_startup=2, n_warmup_steps=1, seed=1)

    def objective(trial):
        base = trial.suggest_float("b", 0.0, 1.0)
        for step in range(1, 6):
            trial.report(base * step, step)
            if trial.should_prune():
                raise TrialPruned()
        return base * 5

    study.optimize(objective, 15)
    states = {t.state for t in study.trials}
    assert "complete" in states
    assert "pruned" in states  # below-median trials get cut
    # pruned trials keep their last reported value
    for t in study.trials:
        if t.state == "pruned":
            assert t.value is not None


def test_hpo_loguniform_bounds(tmp_path):
    study = Study(str(tmp_path / "s.json"), seed=2)
    for _ in range(20):
        t = study.ask()
        v = t.suggest_loguniform("lr", 1e-5, 1e-3)
        assert 1e-5 <= v <= 1e-3
        study.tell(t, 0.0)


# ------------------------------------------------------------- distribute

def test_distribute_and_stats_and_trim(tmp_path, fixture_dir):
    from primia_tpu.data.distribute import (
        class_distribution, distribute, format_distribution, trim,
    )

    dest = tmp_path / "server_simulation"
    counts = distribute(fixture_dir / "train", dest, num_workers=3)
    assert set(counts) == {"worker1", "worker2", "worker3", "validation"}
    assert sum(counts.values()) == 12  # 3 classes x 4 images
    assert counts["validation"] == 1  # 10% holdout

    no_val = distribute(fixture_dir / "train", tmp_path / "nv", num_workers=3,
                        validation_split=0)
    assert set(no_val) == {"worker1", "worker2", "worker3"}

    dist = class_distribution(dest)
    assert set(dist) == {"worker1", "worker2", "worker3", "validation"}
    assert sum(sum(d.values()) for d in dist.values()) == 12
    table = format_distribution(dist)
    assert "worker1" in table and "total" in table

    deleted = trim(dest, 1)
    dist2 = class_distribution(dest)
    assert all(v <= 1 for d in dist2.values() for v in d.values())
    assert deleted == 12 - sum(sum(d.values()) for d in dist2.values())


def test_distribute_symlinks(tmp_path, fixture_dir):
    from primia_tpu.data.distribute import distribute

    dest = tmp_path / "sim"
    distribute(fixture_dir / "train", dest, num_workers=2, symbolic=True)
    links = [p for p in dest.rglob("*.jpeg")]
    assert links and all(p.is_symlink() for p in links)


# ---------------------------------------------------------------- monitor

def test_monitor_writes_jsonl_and_html(tmp_path):
    from primia_tpu.train.monitor import Monitor

    mon = Monitor("exp1", directory=str(tmp_path))
    for e in range(1, 4):
        mon.add_scalar("train_loss", e, 1.0 / e)
        mon.add_scalar("val_mcc", e, 10.0 * e)
    lines = [json.loads(l) for l in (tmp_path / "exp1.jsonl").read_text().splitlines()]
    assert len(lines) == 6
    html = (tmp_path / "exp1.html").read_text()
    assert "<svg" in html and "Matthews coefficient" in html


def test_null_monitor_noop(tmp_path):
    from primia_tpu.train.monitor import NullMonitor

    NullMonitor().add_scalar("x", 1, 2)  # must not write anywhere


# ------------------------------------------------------------------ mnist

def _write_idx(path: Path, arr: np.ndarray):
    ndim = arr.ndim
    header = struct.pack(">I", (0x08 << 0) | ndim) if False else None
    # magic: 0x0000 08 <ndim>
    magic = struct.pack(">I", 0x00000800 | ndim)
    dims = b"".join(struct.pack(">I", d) for d in arr.shape)
    path.write_bytes(magic + dims + arr.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path):
    from primia_tpu.data.mnist import label_subset, load_mnist

    rng = np.random.default_rng(0)
    tri = rng.integers(0, 255, (20, 28, 28), dtype=np.uint8)
    trl = rng.integers(0, 10, 20, dtype=np.uint8)
    tei = rng.integers(0, 255, (8, 28, 28), dtype=np.uint8)
    tel = rng.integers(0, 10, 8, dtype=np.uint8)
    _write_idx(tmp_path / "train-images-idx3-ubyte", tri)
    _write_idx(tmp_path / "train-labels-idx1-ubyte", trl)
    _write_idx(tmp_path / "t10k-images-idx3-ubyte", tei)
    _write_idx(tmp_path / "t10k-labels-idx1-ubyte", tel)

    a, b, c, d = load_mnist(str(tmp_path))
    np.testing.assert_array_equal(a[..., 0], tri)
    np.testing.assert_array_equal(b, trl)
    assert c.shape == (8, 28, 28, 1)

    si, sl = label_subset(a, b, [0, 1, 2])
    assert set(np.unique(sl)) <= {0, 1, 2}
    assert len(si) == int(np.isin(trl, [0, 1, 2]).sum())


def test_mnist_missing_is_actionable(tmp_path):
    from primia_tpu.data.mnist import load_mnist

    with pytest.raises(FileNotFoundError, match="MNIST IDX files not found"):
        load_mnist(str(tmp_path / "nope"))


# ------------------------------------------------------- figure helpers

def test_figure_writefile_and_visualize(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "figure_scripts"))
    try:
        from sigma import visualize_file, writefile
    finally:
        sys.path.pop(0)

    f = tmp_path / "r.csv"
    writefile(str(f), {1: 0.5, 2: 0.7}, [1, 2])
    writefile(str(f), {1: 0.6, 2: 0.8}, [1, 2])
    import pandas as pd

    df = pd.read_csv(f)
    assert list(df.columns) == ["1", "2"] and len(df) == 2

    try:
        import matplotlib

        matplotlib.use("Agg")
        visualize_file(str(f))
        assert (tmp_path / "r.png").is_file()
    except ImportError:
        pass


# ------------------------------------------------------------ observability

def test_logging_engine_records_ops():
    import jax

    from primia_tpu.config import Arguments
    from primia_tpu.nn import create_model
    from primia_tpu.nn.core import PLAIN
    from primia_tpu.utils import LoggingEngine

    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pretrained=False)
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    eng = LoggingEngine(PLAIN)
    x = jax.numpy.zeros((1, 28, 28, 1), jax.numpy.float32)
    md.forward(params, state, x, E=eng, train=False)
    ops = [op for op, _ in eng.log]
    assert "conv2d" in ops and "linear" in ops
    assert "conv2d" in eng.summary()


def test_profile_host_only(capsys):
    from primia_tpu.utils import profile

    with profile(host_only=True):
        pass
    assert "[profile] wall" in capsys.readouterr().out


# --------------------------------------------------------------- find_config

def test_find_config_build_args_space():
    """The HPO objective's Arguments stay valid across trials and cover
    the reference's space (find_config.py:17-229)."""
    import argparse

    from primia_tpu.cli.find_config import build_args
    from primia_tpu.train.hpo import Study

    cmdln = argparse.Namespace(
        federated=True, unencrypted_aggregation=True, websockets=False,
        data_dir="data/server_simulation", epochs=24, batch_size=8,
        resolution=28, model="simpleconv", pretrained=False,
    )
    import tempfile

    study = Study(tempfile.mktemp(suffix=".json"), n_startup=100, seed=0)
    for _ in range(5):
        t = study.ask()
        a = build_args(t, cmdln)
        assert 1e-5 <= a.lr <= 1e-3
        assert a.end_lr <= a.lr
        assert a.epochs * a.repetitions_dataset <= 24 + 2
        assert 1 <= a.sync_every_n_batch <= 10
        study.tell(t, 0.0)


def test_find_config_pretrained_flag_togglable():
    import argparse

    from primia_tpu.cli import find_config

    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", action=argparse.BooleanOptionalAction,
                   default=True)
    assert p.parse_args([]).pretrained is True
    assert p.parse_args(["--no-pretrained"]).pretrained is False
