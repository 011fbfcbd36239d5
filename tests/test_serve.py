"""Serve layer: protocol round-trip, node RPCs over real ws + HTTP
transports, remote train_round, and share fetching."""

import json
import socket

import numpy as np
import pytest

from primia_tpu.serve.protocol import pack, unpack


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_protocol_roundtrip():
    msg = {
        "type": "x", "n": 3, "f": 1.5, "s": "hi",
        "arr": np.arange(12, dtype=np.int64).reshape(3, 4),
        "nested": {"a": np.ones(5, np.float32)},
    }
    out = unpack(pack(msg))
    assert out["type"] == "x" and out["n"] == 3
    np.testing.assert_array_equal(out["arr"], msg["arr"])
    np.testing.assert_array_equal(out["nested"]["a"], msg["nested"]["a"])


def test_protocol_compresses_large():
    big = {"arr": np.zeros(100000, np.float64)}
    frame = pack(big)
    assert frame[:1] == b"Z" and len(frame) < 100000


def test_flatten_unflatten_tree():
    from primia_tpu.serve.node import _flatten, _unflatten

    tree = {"a": [{"w": np.ones((2, 2))}, {"w": np.zeros(3)}],
            "fc": {"b": np.arange(4.0)}}
    back = _unflatten(_flatten(tree))
    assert isinstance(back["a"], list) and len(back["a"]) == 2
    np.testing.assert_array_equal(back["a"][0]["w"], tree["a"][0]["w"])
    np.testing.assert_array_equal(back["fc"]["b"], tree["fc"]["b"])


@pytest.fixture(scope="module")
def node_server(fixture_dir):
    from primia_tpu.serve.node import GridNode, NodeServer

    node = GridNode("worker1", data_directory=str(fixture_dir / "train"),
                    inference_resolution=28, channels=1)
    port = _free_port()
    server = NodeServer(node, port=port).start()
    yield node, port
    server.stop()


def test_node_hosts_training_data(node_server):
    node, _ = node_server
    assert set(node.store) == {"#traindata", "#traintargets", "#datamean", "#datastd"}
    assert node.store["#traindata"].shape == (12, 28, 28, 1)


def test_ws_roundtrip(node_server):
    from primia_tpu.serve.client import NodeClient

    node, port = node_server
    c = NodeClient("worker1", "127.0.0.1", port)
    st = c.status()
    assert st["id"] == "worker1" and "#traindata" in st["tags"]
    arr = c.get_obj("#traindata")
    np.testing.assert_array_equal(arr, node.store["#traindata"])
    c.close()


def test_http_fallback(node_server):
    from primia_tpu.serve.client import NodeClient

    node, port = node_server
    c = NodeClient("worker1", "127.0.0.1", port, http_only=True)
    arr = c.get_obj("#datamean")
    np.testing.assert_allclose(arr, node.store["#datamean"])


def test_grid_search(node_server):
    from primia_tpu.serve.client import GridNetwork, NodeClient

    node, port = node_server
    g = GridNetwork([NodeClient("worker1", "127.0.0.1", port)])
    found = g.search("#traindata")
    assert found == {"worker1": ["#traindata"]}
    assert g.search("#nope") == {}


def test_get_data_shares_reconstruct(node_server):
    from primia_tpu.serve.client import NodeClient
    from primia_tpu.mpc import fixed

    node, port = node_server
    c = NodeClient("worker1", "127.0.0.1", port)
    out = c.send({"type": "get_data_shares", "tag": "#traindata", "party": -1,
                  "seed": 3})
    shares = out["shares"]
    assert shares.shape[0] == 2 and shares.dtype == np.int64
    recon = shares[0] + shares[1]
    # node normalizes with hosted stats before sharing
    m = node.store["#datamean"].reshape(1, 1, 1, -1)
    s = node.store["#datastd"].reshape(1, 1, 1, -1)
    want = (node.store["#traindata"].astype(np.float32) / 255.0 - m) / s
    np.testing.assert_allclose(recon / 2.0 ** 16, want, atol=1e-4)
    # single-party fetch reveals nothing reconstructable
    one = c.send({"type": "get_data_shares", "tag": "#traindata", "party": 0,
                  "seed": 3})
    assert one["share"].shape == node.store["#traindata"].shape
    c.close()


def test_remote_train_round(node_server, fixture_dir):
    """Federated-over-network: a round of local training runs ON the
    node; only parameters cross the wire."""
    import jax

    from primia_tpu.config import Arguments
    from primia_tpu.nn import create_model
    from primia_tpu.serve.client import NodeClient
    from primia_tpu.serve.node import _flatten, _unflatten

    node, port = node_server
    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, batch_size=4, optimizer="SGD",
                     momentum=0.0, lr=0.01)
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    c = NodeClient("worker1", "127.0.0.1", port)
    out = c.send({
        "type": "train_round",
        "args": args.to_json(),
        "params": _flatten(jax.tree.map(np.asarray, params)),
        "model_state": _flatten(jax.tree.map(np.asarray, state)),
        "n_steps": 2, "lr": 0.01, "seed": 1, "num_classes": 3,
    })
    assert "error" not in out, out.get("error")
    assert out["n_batches"] == 3
    new_params = _unflatten(out["params"])
    # parameters actually moved
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, params)),
                        jax.tree.leaves(new_params))
    )
    assert moved
    c.close()


def test_model_hosting_and_remote_inference(node_server):
    """serve_model + run_remote_inference through the wire (plain and
    encrypted) — the reference's PrivateGridNetwork surface."""
    import jax

    from primia_tpu.config import Arguments
    from primia_tpu.nn import create_model
    from primia_tpu.serve.client import GridNetwork, NodeClient

    node, port = node_server
    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))

    client = NodeClient("worker1", "127.0.0.1", port)
    grid = GridNetwork([client])
    try:
        out = grid.serve_model(
            "worker1", name="pneumonia", params=params, model_state=state,
            args_json=args.to_json(), mean=np.array([0.5]), std=np.array([0.25]),
        )
        assert out.get("ok")
        assert client.send({"type": "list_models"})["models"] == ["pneumonia"]

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (2, 28, 28, 1), dtype=np.uint8)
        plain = grid.run_remote_inference("worker1", name="pneumonia", images=imgs)
        assert plain["logits"].shape == (2, 3)
        assert plain["predictions"].shape == (2,)

        enc = grid.run_remote_inference("worker1", name="pneumonia",
                                        images=imgs, encrypted=True)
        np.testing.assert_allclose(enc["logits"], plain["logits"], atol=0.02)

        client.send({"type": "delete_model", "name": "pneumonia"})
        assert client.send({"type": "list_models"})["models"] == []
    finally:
        client.close()


def test_sandbox_in_process():
    """create_sandbox: toy grid, searchable, MPC-ready (reference
    sy.create_sandbox, syft/sandbox.py)."""
    from primia_tpu.sandbox import create_sandbox

    sb = create_sandbox(n_per_class=2, resolution=8)
    try:
        assert set(sb.nodes) == {"alice", "bob", "charlie", "crypto_provider"}
        found = sb.grid.search("#traindata")
        assert set(found) == {"alice", "bob", "charlie"}
        assert sb.nodes["alice"].store["#traindata"].shape == (6, 8, 8, 1)
    finally:
        sb.close()


def test_data_shares_not_derivable_from_seed():
    """Security regression: a requester knowing only (tag, seed) must not
    be able to recompute the other party's share and unmask the data."""
    from primia_tpu import native
    from primia_tpu.serve.node import GridNode

    node = GridNode("data_owner")
    secret = np.linspace(-1, 1, 16, dtype=np.float32).reshape(1, 4, 4, 1)
    node.store["#inference_data"] = secret
    r1 = node.handle({"type": "get_data_shares", "party": 1, "seed": 42})

    # attacker: derive party-0's share from the public seed
    guess0, _ = native.encode_and_share(np.zeros_like(secret), 16, 42)
    rec = (guess0.view(np.uint64) + r1["share"].view(np.uint64)).view(np.int64)
    dec = np.asarray(rec, np.float64) / (1 << 16)
    assert not np.allclose(dec, secret, atol=1e-3)

    # ...while the two legitimate party fetches still reconstruct
    r0 = node.handle({"type": "get_data_shares", "party": 0, "seed": 42})
    rec = (r0["share"].view(np.uint64) + r1["share"].view(np.uint64)).view(np.int64)
    np.testing.assert_allclose(np.asarray(rec, np.float64) / (1 << 16), secret,
                               atol=2 ** -15)

    # a different node (different node secret) produces different shares
    node2 = GridNode("data_owner")
    node2.store["#inference_data"] = secret
    r0b = node2.handle({"type": "get_data_shares", "party": 0, "seed": 42})
    assert not np.array_equal(r0b["share"], r0["share"])


def test_federated_ws_end_to_end(fixture_dir, tmp_path, monkeypatch):
    """Workload 3 over REAL websocket nodes (`--websockets` mode, the
    reference's `make gridnode` + `train.py --websockets` path,
    run_websocket_server.py:27-91): 3 NodeServer processes host disjoint
    shards, main_federated_ws drives train_round RPCs concurrently,
    securely averages the nodes' normalization stats, MPC-aggregates
    parameters each round, and writes the final checkpoint."""
    import shutil

    from primia_tpu.config import Arguments
    from primia_tpu.parallel.federated import main_federated_ws
    from primia_tpu.serve.node import GridNode, NodeServer
    from primia_tpu.train import checkpoint as ckpt

    monkeypatch.chdir(tmp_path)
    # local validation set (main_federated_ws evaluates locally)
    data_dir = tmp_path / "fed"
    shutil.copytree(fixture_dir / "test", data_dir / "validation")

    servers, rows = [], {"id": [], "host": [], "port": []}
    try:
        for w in ["worker1", "worker2", "worker3", "crypto_provider"]:
            node = GridNode(
                w,
                data_directory=(str(fixture_dir / "train")
                                if w != "crypto_provider" else None),
                inference_resolution=28, channels=1)
            port = _free_port()
            servers.append(NodeServer(node, port=port).start())
            rows["id"].append(w)
            rows["host"].append("127.0.0.1")
            rows["port"].append(str(port))
        csv_path = tmp_path / "config.csv"
        csv_path.write_text("\n".join(
            ",".join([k] + rows[k]) for k in ("id", "host", "port")) + "\n")

        args = Arguments(
            model="simpleconv", train_resolution=28, inference_resolution=28,
            batch_size=4, test_batch_size=6, epochs=1, lr=0.05, end_lr=0.05,
            optimizer="SGD", momentum=0.0, seed=42, test_interval=1,
            data_dir=str(data_dir), train_federated=True, websockets=True,
            sync_every_n_batch=1, repetitions_dataset=1,
            weighted_averaging=True,
            save_file=str(tmp_path / "completed.csv"),
        )
        score = main_federated_ws(args, verbose=False,
                                  weights_dir=str(tmp_path / "w"),
                                  config_csv=str(csv_path))
        assert isinstance(score, float) and np.isfinite(score)
        finals = list((tmp_path / "w").glob("final_federated_*.pt"))
        assert len(finals) == 1
        state = ckpt.load_model(finals[0])
        assert state["args"].websockets
        # the checkpoint's val_mean_std is the securely-averaged node stats
        mean, std = state["val_mean_std"]
        assert np.all(std > 0)
    finally:
        for s in servers:
            s.stop()
