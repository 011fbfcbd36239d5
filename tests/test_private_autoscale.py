"""Allowed-users object gating (PrivateTensor role) and autoscale
artifact generation.

Reference components: ``syft/.../interpreters/private.py`` and
``syft/grid/utils/autoscale/``.
"""

import numpy as np
import pytest

from primia_tpu.serve import autoscale
from primia_tpu.serve.node import GridNode


@pytest.fixture()
def node():
    n = GridNode("gate")
    n.handle({"type": "load_data", "tag": "#public", "array": np.arange(3.0)})
    n.handle({"type": "load_data", "tag": "#secret", "array": np.ones(4),
              "allowed_users": ["alice", "bob"]})
    return n


class TestAllowedUsers:
    def test_allowed_user_fetches(self, node):
        out = node.handle({"type": "get_obj", "tag": "#secret", "user": "alice"})
        np.testing.assert_array_equal(out["array"], np.ones(4))

    def test_stranger_denied_and_existence_hidden(self, node):
        out = node.handle({"type": "get_obj", "tag": "#secret", "user": "eve"})
        assert "error" in out and "array" not in out
        # same message whether the tag is private or absent
        missing = node.handle({"type": "get_obj", "tag": "#nope", "user": "eve"})
        assert out["error"].split("#")[0] == missing["error"].split("#")[0]

    def test_anonymous_denied(self, node):
        assert "error" in node.handle({"type": "get_obj", "tag": "#secret"})

    def test_public_object_open(self, node):
        out = node.handle({"type": "get_obj", "tag": "#public", "user": "eve"})
        np.testing.assert_array_equal(out["array"], np.arange(3.0))

    def test_search_and_status_hide_private(self, node):
        assert "#secret" not in node.handle({"type": "search", "query": []})["results"]
        assert "#secret" in node.handle(
            {"type": "search", "query": [], "user": "bob"})["results"]
        assert "#secret" not in node.handle({"type": "status"})["tags"]

    def test_delete_gated(self, node):
        assert "error" in node.handle(
            {"type": "delete_obj", "tag": "#secret", "user": "eve"})
        assert node.handle(
            {"type": "delete_obj", "tag": "#secret", "user": "alice"})["ok"]
        assert "#secret" not in node.store

    def test_share_stream_gated(self, node):
        out = node.handle({"type": "get_data_shares", "tag": "#secret",
                           "party": 0, "user": "eve"})
        assert "error" in out
        ok = node.handle({"type": "get_data_shares", "tag": "#secret",
                          "party": 0, "user": "bob"})
        assert "share" in ok

    def test_rehost_without_acl_clears_gate(self, node):
        node.handle({"type": "load_data", "tag": "#secret", "array": np.zeros(2)})
        out = node.handle({"type": "get_obj", "tag": "#secret", "user": "eve"})
        assert "array" in out

    def test_client_credential_attached(self, node):
        from primia_tpu.serve.client import NodeClient

        c = NodeClient("gate", "127.0.0.1", 1, user="alice")
        sent = {}
        c._http_send = lambda msg: sent.update(msg) or {"ok": True}
        c.http_only = True
        c.send({"type": "get_obj", "tag": "#secret"})
        assert sent["user"] == "alice"


class TestAutoscale:
    @pytest.fixture(scope="class")
    def spec(self):
        return autoscale.ClusterSpec(name="trial", project="hospital-fed",
                                     n_grid_nodes=3)

    def test_gcloud_plan(self, spec):
        cmds = autoscale.AutoScaler(spec).create_cluster()
        joined = "\n".join(cmds)
        assert "tpus tpu-vm create trial-mesh" in joined
        assert joined.count("instances create") == 4  # 3 nodes + provider
        assert "firewall-rules create trial-grid-rpc" in joined
        assert "v5litepod-8" in joined

    def test_teardown_mirrors_create(self, spec):
        create = autoscale.gcloud_commands(spec)
        destroy = autoscale.teardown_commands(spec)
        assert len(destroy) == len(create)
        assert all("delete" in c for c in destroy)

    def test_terraform_valid_blocks(self, spec):
        tf = autoscale.terraform_config(spec)
        assert tf.count("resource ") == 5  # tpu + 4 instances
        assert tf.count("{") == tf.count("}")
        assert 'accelerator_type = "v5litepod-8"' in tf

    def test_worker_csv_parses(self, spec, tmp_path):
        from primia_tpu.config import read_worker_config

        p = tmp_path / "config.csv"
        p.write_text(autoscale.worker_config_csv(spec))
        cfg = read_worker_config(p)
        assert set(cfg) == {"worker1", "worker2", "worker3", "crypto_provider"}
        assert cfg["worker1"]["port"] == "8777"

    def test_write_artifacts(self, spec, tmp_path):
        paths = autoscale.AutoScaler(spec).write_artifacts(tmp_path / "out")
        assert set(paths) == {"provision.sh", "teardown.sh", "main.tf", "config.csv"}
        assert paths["provision.sh"].stat().st_mode & 0o111
