"""Federated simulation tests: aggregation math, heterogeneous shards,
and end-to-end federated training (secure + plain aggregation)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from primia_tpu.config import Arguments
from primia_tpu.mpc.aggregation import (
    plain_fedavg,
    secure_average_stats,
    secure_fedavg,
)


@pytest.fixture(scope="module")
def fed_dir(tmp_path_factory):
    """3 worker shards + validation folder (the data/server_simulation
    layout, reference ``data/server_simulation/*``)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("fed")
    rng = np.random.default_rng(1)
    classes = ["bacterial pneumonia", "normal", "viral pneumonia"]
    # heterogeneous shard sizes: 4/3/2 images per class per worker
    for w, n_img in zip(["worker1", "worker2", "worker3"], [4, 3, 2]):
        for ci, cls in enumerate(classes):
            d = root / w / cls
            d.mkdir(parents=True)
            for i in range(n_img):
                arr = rng.integers(0, 80, (32, 32), dtype=np.uint8) + 40 + 60 * ci
                Image.fromarray(arr, mode="L").save(d / f"{i}.jpeg")
    for ci, cls in enumerate(classes):
        d = root / "validation" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 80, (32, 32), dtype=np.uint8) + 40 + 60 * ci
            Image.fromarray(arr, mode="L").save(d / f"{i}.jpeg")
    return root


def test_plain_fedavg_weighted():
    stacked = {"w": jnp.asarray([[2.0, 4.0], [6.0, 8.0]]),
               "bn": {"count": jnp.asarray([3, 5])}}
    out = plain_fedavg(stacked, np.array([0.25, 0.75]))
    np.testing.assert_allclose(np.asarray(out["w"]), [5.0, 7.0])
    assert int(out["bn"]["count"]) == 3  # count passes through from node 0


def test_secure_fedavg_matches_plain():
    rng = np.random.default_rng(0)
    stacked = {
        "a": jnp.asarray(rng.normal(size=(3, 4, 5)).astype(np.float32)),
        "b": [jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))],
    }
    w = np.array([0.5, 0.3, 0.2])
    plain = plain_fedavg(stacked, w)
    sec = secure_fedavg(jax.random.PRNGKey(3), stacked, w)
    for p, s in zip(jax.tree.leaves(plain), jax.tree.leaves(sec)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(s), atol=1e-4)


def test_secure_fedavg_shares_deterministic_across_processes():
    """Same seed -> identical share draws in a FRESH interpreter (the
    reference's deterministic-seed contract, ``train.py:63-68``).
    Regression for per-process-salted ``hash()`` leaf keying: the leaf
    fold-in must come from a stable digest of the key path."""
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent("""
        import jax, jax.numpy as jnp, numpy as np, zlib
        jax.config.update("jax_platforms", "cpu")
        from primia_tpu.mpc import fixed
        from primia_tpu.mpc import shares as S
        from primia_tpu.mpc.aggregation import _leaf_key
        path_digests = []
        tree = {"layer": {"kernel": 0, "bias": 1}, "bn": [2, 3]}
        jax.tree_util.tree_map_with_path(
            lambda p, _: path_digests.append(_leaf_key(p)), tree)
        ring = fixed.encode(jnp.linspace(-1, 1, 8, dtype=jnp.float64))
        sh = S.share(jax.random.fold_in(jax.random.PRNGKey(7), path_digests[0]), ring)
        print(path_digests, int(zlib.crc32(np.asarray(sh.data).tobytes())))
    """)
    outs = []
    for seed in ["0", "1"]:
        env = dict(os.environ, PYTHONHASHSEED=seed)
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=300,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]


def test_secure_average_stats():
    vals = [np.array([0.2, 0.4]), np.array([0.6, 0.8]), np.array([0.1, 0.3])]
    got = np.asarray(secure_average_stats(jax.random.PRNGKey(1), vals))
    np.testing.assert_allclose(got, np.mean(vals, axis=0), atol=1e-4)


@pytest.mark.parametrize("unencrypted", [True, False])
def test_federated_end_to_end(fed_dir, tmp_path, monkeypatch, unencrypted):
    """Workload 3/6: 3 simulated nodes with heterogeneous shards, FedAvg
    every 2 batches (secure + plain), checkpoint written with per-worker
    optimizer dict."""
    monkeypatch.chdir(tmp_path)
    from primia_tpu.parallel.federated import main_federated
    from primia_tpu.train import checkpoint as ckpt

    args = Arguments(
        model="simpleconv", train_resolution=28, inference_resolution=28,
        batch_size=4, test_batch_size=6, epochs=1, lr=0.05, end_lr=0.05,
        optimizer="SGD", momentum=0.0, seed=42, test_interval=1,
        data_dir=str(fed_dir), train_federated=True,
        unencrypted_aggregation=unencrypted, sync_every_n_batch=2,
        repetitions_dataset=1, weighted_averaging=True,
        save_file=str(tmp_path / "completed.csv"),
    )
    score = main_federated(args, verbose=False, weights_dir=str(tmp_path / "w"))
    assert isinstance(score, float)
    finals = list((tmp_path / "w").glob("final_federated_*.pt"))
    assert len(finals) == 1
    state = ckpt.load_model(finals[0])
    assert set(state["optim_state_dict"].keys()) == {"worker1", "worker2", "worker3"}
    assert state["args"].train_federated


def test_federated_dp_end_to_end(fed_dir, tmp_path, monkeypatch, capsys):
    """DP x federated (parity-plus: the reference exit()s on this combo,
    train.py:310): per-node ghost-DP steps + secure aggregation, with
    per-node RDP accounting reported each epoch."""
    monkeypatch.chdir(tmp_path)
    from primia_tpu.parallel.federated import main_federated
    from primia_tpu.train import checkpoint as ckpt

    args = Arguments(
        model="simpleconv", train_resolution=28, inference_resolution=28,
        batch_size=4, test_batch_size=6, epochs=1, lr=0.05, end_lr=0.05,
        optimizer="SGD", momentum=0.0, seed=42, test_interval=1,
        data_dir=str(fed_dir), train_federated=True,
        differentially_private=True, noise_multiplier=1.3, max_grad_norm=1.0,
        unencrypted_aggregation=False, sync_every_n_batch=2,
        repetitions_dataset=1, weighted_averaging=True,
    )
    score = main_federated(args, verbose=True, weights_dir=str(tmp_path / "w"))
    out = capsys.readouterr().out
    assert isinstance(score, float)
    # per-node accounting reported (worst node + per-node epsilons)
    assert "worst node" in out and "worker3=" in out
    finals = list((tmp_path / "w").glob("final_federated_*.pt"))
    assert len(finals) == 1
    assert ckpt.load_model(finals[0])["args"].differentially_private


def test_federated_dp_groupnorm_resnet(fed_dir, tmp_path, monkeypatch):
    """The DP quality recipe's exact composition: resnet-18 with
    normalization=group (the DP-trainable variant) under per-node
    ghost-DP + secure aggregation — GN must survive the node-axis vmap
    of the ghost step."""
    monkeypatch.chdir(tmp_path)
    from primia_tpu.parallel.federated import main_federated

    args = Arguments(
        model="resnet-18", train_resolution=32, inference_resolution=32,
        batch_size=4, test_batch_size=6, epochs=1, lr=0.05, end_lr=0.05,
        optimizer="SGD", momentum=0.0, seed=42, test_interval=1,
        data_dir=str(fed_dir), train_federated=True, normalization="group",
        differentially_private=True, noise_multiplier=1.3, max_grad_norm=1.0,
        unencrypted_aggregation=False, sync_every_n_batch=2,
        repetitions_dataset=1, parameter_ema=0.9,
    )
    score = main_federated(args, verbose=False, weights_dir=str(tmp_path / "w"))
    assert isinstance(score, float)
