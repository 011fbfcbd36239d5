"""Round-2 serve-surface parity: JWT auth, warehouse persistence,
model-centric FL cycles, hosted-model replicas, multi-role Protocol.

Reference components:
- JWT auth + role seeding: ``Node/app/main/routes/model_centric/
  routes.py:37-90``, ``Node/app/__init__.py:62-149``
- SQLAlchemy warehouse: ``Node/app/main/core/``
- FL cycle verbs: ``routes/model_centric/routes.py:37-471``
- ``--num_replicas``: ``Node/__main__.py:44-49``
- multi-role Protocol: ``syft/execution/protocol.py:337``
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from primia_tpu.serve import auth
from primia_tpu.serve.model_centric import FLProcess
from primia_tpu.serve.node import GridNode, _flatten
from primia_tpu.serve.plan import Plan, Protocol

SECRET = b"test-secret-key"


def _hosted_model_msg(name="m", **over):
    """A tiny hostable simpleconv model message."""
    from primia_tpu.config import Arguments
    from primia_tpu.nn import create_model

    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28)
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    msg = {
        "type": "host_model", "name": name,
        "params": _flatten(jax.tree.map(np.asarray, params)),
        "model_state": _flatten(jax.tree.map(np.asarray, state)),
        "args": args.to_json(), "mean": np.array([0.5]),
        "std": np.array([0.25]),
    }
    msg.update(over)
    return msg


class TestAuth:
    def test_token_roundtrip(self):
        tok = auth.issue_token(SECRET, "alice", "owner")
        claims = auth.verify_token(SECRET, tok)
        assert claims["sub"] == "alice" and claims["role"] == "owner"

    def test_forged_token_rejected(self):
        tok = auth.issue_token(b"other-secret", "alice", "owner")
        with pytest.raises(auth.AuthError):
            auth.verify_token(SECRET, tok)

    def test_expired_token_rejected(self):
        tok = auth.issue_token(SECRET, "alice", "user", ttl_s=-1)
        with pytest.raises(auth.AuthError):
            auth.verify_token(SECRET, tok)

    def test_tampered_payload_rejected(self):
        tok = auth.issue_token(SECRET, "alice", "user")
        h, p, s = tok.split(".")
        forged = auth._b64url(
            auth._unb64url(p).replace(b'"user"', b'"owner"'))
        with pytest.raises(auth.AuthError):
            auth.verify_token(SECRET, ".".join([h, forged, s]))

    def test_role_capabilities(self):
        claims = auth.verify_token(SECRET, auth.issue_token(SECRET, "w", "user"))
        auth.require(claims, "fl_participate")  # ok
        with pytest.raises(auth.AuthError):
            auth.require(claims, "host")

    def test_node_requires_token_for_hosting(self):
        node = GridNode("auth-node", auth_secret=SECRET)
        out = node.handle({"type": "load_data", "tag": "#x",
                           "array": np.arange(3)})
        assert "error" in out and "auth" in out["error"]
        user_tok = auth.issue_token(SECRET, "worker", "user")
        out = node.handle({"type": "load_data", "tag": "#x",
                           "array": np.arange(3), "token": user_tok})
        assert "error" in out  # user role lacks host capability
        owner_tok = auth.issue_token(SECRET, "boss", "owner")
        out = node.handle({"type": "load_data", "tag": "#x",
                           "array": np.arange(3), "token": owner_tok})
        assert out.get("ok")

    def test_acl_uses_token_subject_not_client_claim(self):
        """With auth on, a client cannot impersonate an allowed user by
        setting the plain ``user`` field."""
        node = GridNode("auth-node", auth_secret=SECRET)
        owner_tok = auth.issue_token(SECRET, "boss", "owner")
        node.handle({"type": "load_data", "tag": "#secret",
                     "array": np.ones(2), "allowed_users": ["alice"],
                     "token": owner_tok})
        # unauthenticated + spoofed user field: denied
        out = node.handle({"type": "get_obj", "tag": "#secret", "user": "alice"})
        assert "error" in out
        # authenticated as eve with spoofed user field: denied
        eve_tok = auth.issue_token(SECRET, "eve", "user")
        out = node.handle({"type": "get_obj", "tag": "#secret",
                           "user": "alice", "token": eve_tok})
        assert "error" in out
        # authenticated as alice: allowed
        alice_tok = auth.issue_token(SECRET, "alice", "user")
        out = node.handle({"type": "get_obj", "tag": "#secret",
                           "token": alice_tok})
        np.testing.assert_array_equal(out["array"], np.ones(2))


class TestPersistence:
    def test_restart_preserves_hosted_state(self, tmp_path):
        """The VERDICT restart contract: host -> kill -> restart ->
        run_inference still works; objects and plans survive too."""
        store = tmp_path / "wh"
        node = GridNode("persist", storage_dir=str(store))
        assert node.handle(_hosted_model_msg("survivor")).get("ok")
        node.handle({"type": "load_data", "tag": "#mean",
                     "array": np.array([0.5])})
        plan = Plan.trace(lambda x: x * 2.0, np.ones(3, np.float32),
                          name="doubler", platforms=("cpu",))
        node.handle({"type": "host_plan", "name": "doubler",
                     "blob": plan.serialize()})
        del node  # "kill" the node

        node2 = GridNode("persist", storage_dir=str(store))
        assert "survivor" in node2.models
        imgs = np.zeros((2, 28, 28, 1), np.uint8)
        out = node2.handle({"type": "run_inference", "name": "survivor",
                            "images": imgs})
        assert out["logits"].shape == (2, 3)
        np.testing.assert_array_equal(
            node2.handle({"type": "get_obj", "tag": "#mean"})["array"],
            np.array([0.5]))
        got = node2.handle({"type": "run_plan", "name": "doubler",
                            "inputs": [np.ones(3, np.float32)]})
        np.testing.assert_allclose(got["outputs"][0], 2.0)

    def test_restart_preserves_acl(self, tmp_path):
        store = tmp_path / "wh"
        node = GridNode("persist", storage_dir=str(store))
        node.handle({"type": "load_data", "tag": "#priv",
                     "array": np.ones(2), "allowed_users": ["alice"]})
        node2 = GridNode("persist", storage_dir=str(store))
        assert "error" in node2.handle(
            {"type": "get_obj", "tag": "#priv", "user": "eve"})
        assert "array" in node2.handle(
            {"type": "get_obj", "tag": "#priv", "user": "alice"})

    def test_delete_is_persistent(self, tmp_path):
        store = tmp_path / "wh"
        node = GridNode("persist", storage_dir=str(store))
        node.handle(_hosted_model_msg("gone"))
        node.handle({"type": "delete_model", "name": "gone"})
        node2 = GridNode("persist", storage_dir=str(store))
        assert "gone" not in node2.models


class TestReplicas:
    def test_failover_and_exhaustion(self):
        node = GridNode("rep", num_replicas=2)
        node.handle(_hosted_model_msg("m"))
        imgs = np.zeros((1, 28, 28, 1), np.uint8)
        out = node.handle({"type": "run_inference", "name": "m", "images": imgs})
        assert out["replica"] == 0
        node.handle({"type": "set_replica_health", "name": "m",
                     "replica": 0, "healthy": False})
        out = node.handle({"type": "run_inference", "name": "m", "images": imgs})
        assert out["replica"] == 1  # failover
        node.handle({"type": "set_replica_health", "name": "m",
                     "replica": 1, "healthy": False})
        out = node.handle({"type": "run_inference", "name": "m", "images": imgs})
        assert "unhealthy" in out["error"]
        st = node.handle({"type": "replica_status", "name": "m"})
        assert [r["healthy"] for r in st["replicas"]] == [False, False]


class TestFLCycle:
    def _proc(self, **server_config):
        params = {"w": np.ones((2, 2), np.float32), "b": np.zeros(2, np.float32)}
        cfg = {"max_workers": 2, "min_diffs": 2, "num_cycles": 2,
               "cycle_length": 1000.0, **server_config}
        return FLProcess("p", params, server_config=cfg)

    def test_cycle_accept_reject(self):
        proc = self._proc()
        a = proc.request_cycle("w1")
        b = proc.request_cycle("w2")
        c = proc.request_cycle("w3")
        assert a["status"] == b["status"] == "accepted"
        assert c["status"] == "rejected" and "full" in c["reason"]
        # idempotent re-request returns the same key
        assert proc.request_cycle("w1")["request_key"] == a["request_key"]

    def test_report_averages_diffs_and_bumps_version(self):
        proc = self._proc()
        a = proc.request_cycle("w1")
        b = proc.request_cycle("w2")
        got = proc.get_model(a["request_key"])
        assert got["version"] == 1
        d1 = {"w": np.full((2, 2), 0.2, np.float32), "b": np.zeros(2, np.float32)}
        d2 = {"w": np.full((2, 2), 0.4, np.float32), "b": np.zeros(2, np.float32)}
        r1 = proc.report(a["request_key"], d1)
        assert r1["cycle_closed"] is False
        r2 = proc.report(b["request_key"], d2)
        assert r2["cycle_closed"] is True and proc.version == 2
        # new = old - mean(diffs) = 1 - 0.3
        np.testing.assert_allclose(proc.params["w"], 0.7, rtol=1e-6)

    def test_process_completes_after_num_cycles(self):
        proc = self._proc(min_diffs=1, num_cycles=1, max_workers=1)
        a = proc.request_cycle("w1")
        proc.report(a["request_key"], {"w": np.zeros((2, 2), np.float32),
                                       "b": np.zeros(2, np.float32)})
        assert proc.completed
        out = proc.request_cycle("w2")
        assert out["status"] == "rejected" and "completed" in out["reason"]

    def test_invalid_key_and_double_report(self):
        proc = self._proc()
        a = proc.request_cycle("w1")
        assert "error" in proc.get_model("bogus")
        d = {"w": np.zeros((2, 2), np.float32), "b": np.zeros(2, np.float32)}
        proc.report(a["request_key"], d)
        assert "error" in proc.report(a["request_key"], d)

    def test_node_verbs_with_auth_and_restart(self, tmp_path):
        """End-to-end over the node RPC surface, with JWT + warehouse:
        host -> cycle -> report -> restart -> version preserved."""
        node = GridNode("flnode", storage_dir=str(tmp_path / "wh"),
                        auth_secret=SECRET)
        owner = auth.issue_token(SECRET, "boss", "owner")
        w1 = auth.issue_token(SECRET, "w1", "user")
        w2 = auth.issue_token(SECRET, "w2", "user")
        params = {"w": np.ones(4, np.float32)}
        assert node.handle({
            "type": "fl_host_training", "name": "pneu", "params": params,
            "server_config": {"max_workers": 2, "min_diffs": 2,
                              "num_cycles": 3},
            "token": owner}).get("ok")
        # workers cannot host but can participate
        assert "error" in node.handle({
            "type": "fl_host_training", "name": "x", "params": params,
            "token": w1})
        a = node.handle({"type": "fl_cycle_request", "name": "pneu",
                         "token": w1})
        b = node.handle({"type": "fl_cycle_request", "name": "pneu",
                         "token": w2})
        assert a["status"] == b["status"] == "accepted"
        # unauthenticated cycle request is denied outright
        assert "error" in node.handle(
            {"type": "fl_cycle_request", "name": "pneu"})
        got = node.handle({"type": "fl_get_model", "name": "pneu",
                           "request_key": a["request_key"], "token": w1})
        np.testing.assert_allclose(got["params"]["w"], 1.0)
        diff = {"w": np.full(4, 0.5, np.float32)}
        node.handle({"type": "fl_report", "name": "pneu",
                     "request_key": a["request_key"], "diff": diff,
                     "token": w1})
        out = node.handle({"type": "fl_report", "name": "pneu",
                           "request_key": b["request_key"], "diff": diff,
                           "token": w2})
        assert out["model_version"] == 2
        # restart: version + updated params survive
        node2 = GridNode("flnode", storage_dir=str(tmp_path / "wh"),
                         auth_secret=SECRET)
        st = node2.handle({"type": "fl_status", "name": "pneu"})
        assert st["version"] == 2 and st["cycle"] == 2
        c = node2.handle({"type": "fl_cycle_request", "name": "pneu",
                          "token": w1})
        got = node2.handle({"type": "fl_get_model", "name": "pneu",
                            "request_key": c["request_key"], "token": w1})
        np.testing.assert_allclose(got["params"]["w"], 0.5)

    def test_cycle_expiry_closes_with_partial_diffs(self):
        clock = {"t": 0.0}
        params = {"w": np.ones(2, np.float32)}
        proc = FLProcess("p", params,
                         server_config={"max_workers": 3, "min_diffs": 2,
                                        "num_cycles": 5, "cycle_length": 10.0},
                         clock=lambda: clock["t"])
        a = proc.request_cycle("w1")
        proc.report(a["request_key"], {"w": np.full(2, 0.4, np.float32)})
        clock["t"] = 11.0  # expire the cycle with 1 of 2 diffs
        out = proc.request_cycle("w2")
        # the expired cycle closed with what it had; a fresh cycle opened
        assert proc.version == 2
        np.testing.assert_allclose(proc.params["w"], 0.6, rtol=1e-6)
        assert out["status"] == "accepted" and out["cycle"] == 2


class _LocalClient:
    """In-process stand-in for NodeClient (VirtualWorker strategy)."""

    def __init__(self, node):
        self.node = node
        self.id = node.id

    def send(self, msg):
        return self.node.handle(msg)


class TestProtocol:
    def test_multi_role_pipeline(self):
        from primia_tpu.serve.client import GridNetwork

        scale = Plan.trace(lambda x: x * 3.0, np.ones(4, np.float32),
                           name="scale", platforms=("cpu",))
        shift = Plan.trace(lambda x: x + 1.0, np.ones(4, np.float32),
                           name="shift", platforms=("cpu",))
        proto = Protocol("affine", [("scaler", scale), ("shifter", shift)])
        assert proto.roles == ["scaler", "shifter"]

        n1, n2 = GridNode("node-a"), GridNode("node-b")
        grid = GridNetwork([_LocalClient(n1), _LocalClient(n2)])
        proto.deploy(grid, {"scaler": "node-a", "shifter": "node-b"})
        out = proto.run(grid, np.full(4, 2.0, np.float32))
        np.testing.assert_allclose(out, 2.0 * 3.0 + 1.0)
        # each node hosts exactly its role's plan
        assert "scale" in n1.plans and "shift" in n2.plans

    def test_serialize_roundtrip_and_local_run(self):
        p1 = Plan.trace(lambda x: x - 2.0, np.ones(3, np.float32),
                        name="sub", platforms=("cpu",))
        proto = Protocol("solo", [("r", p1)])
        blob = proto.serialize()
        proto2 = Protocol.deserialize(blob)
        np.testing.assert_allclose(
            proto2.run_local(np.full(3, 5.0, np.float32)), 3.0)

    def test_undeployed_and_unassigned_errors(self):
        p1 = Plan.trace(lambda x: x, np.ones(2, np.float32),
                        name="id", platforms=("cpu",))
        proto = Protocol("p", [("a", p1)])
        with pytest.raises(RuntimeError):
            proto.run(None, np.ones(2, np.float32))
        from primia_tpu.serve.client import GridNetwork

        with pytest.raises(ValueError):
            proto.deploy(GridNetwork([]), {})
