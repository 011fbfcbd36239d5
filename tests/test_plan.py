"""Plan engine: trace-once execute-anywhere (reference
``syft/execution/plan.py`` -> serialized jax.export artifacts).

Covers local round-trip, remote hosting/execution over a real node
server, plan fetch for local execution, and hosted-tag inputs.
"""

import socket

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.serve.plan import Plan


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _affine(w, b, x):
    return x @ w + b


class TestPlanLocal:
    def test_trace_and_call(self):
        w = np.ones((3, 2)); b = np.zeros(2); x = np.ones((4, 3))
        plan = Plan.trace(_affine, w, b, x, name="affine")
        out = plan(w * 2, b + 1, x)
        np.testing.assert_allclose(out, x @ (w * 2) + 1)

    def test_serialize_roundtrip(self):
        plan = Plan.trace(lambda a: jnp.sin(a) * 2, np.zeros(5), name="sin2")
        back = Plan.deserialize(plan.serialize())
        assert back.name == "sin2" and back.n_inputs == 1
        x = np.linspace(0, 1, 5)
        np.testing.assert_allclose(back(x), np.sin(x) * 2, atol=1e-6)

    def test_pytree_args_and_multi_output(self):
        params = {"w": np.ones((2, 2)), "b": np.zeros(2)}

        def f(p, x):
            y = x @ p["w"] + p["b"]
            return y, jnp.sum(y)

        plan = Plan.trace(f, params, np.ones((3, 2)), name="multi")
        y, s = plan(params, np.ones((3, 2)))
        assert y.shape == (3, 2) and float(s) == pytest.approx(y.sum())

    def test_wrong_arity_rejected(self):
        plan = Plan.trace(lambda a, b: a + b, np.ones(2), np.ones(2))
        with pytest.raises(ValueError):
            plan.run_flat([np.ones(2)])

    def test_shape_contract_enforced(self):
        """The artifact encodes its calling convention — a mismatched
        shape errors instead of silently miscomputing."""
        plan = Plan.trace(lambda a: a * 2, np.ones((2, 2)))
        with pytest.raises(Exception):
            plan(np.ones((5, 5)))


@pytest.fixture(scope="module")
def plan_node():
    from primia_tpu.serve.client import GridNetwork, NodeClient
    from primia_tpu.serve.node import GridNode, NodeServer

    node = GridNode("planhost")
    node.store["#vec"] = np.arange(4.0)
    port = _free_port()
    server = NodeServer(node, port=port).start()
    client = NodeClient("planhost", "127.0.0.1", port)
    grid = GridNetwork([client])
    yield grid
    client.close()
    server.stop()


class TestPlanRemote:
    def test_host_and_run_remote(self, plan_node):
        grid = plan_node
        plan = Plan.trace(lambda x, y: x * y + 1.0, np.zeros(4), np.zeros(4),
                          name="fma")
        assert grid.serve_plan("planhost", plan)["ok"]
        out = grid.run_remote_plan("planhost", "fma", np.full(4, 3.0),
                                   np.full(4, 2.0))
        np.testing.assert_allclose(out, [7.0, 7.0, 7.0, 7.0])

    def test_run_against_hosted_tag(self, plan_node):
        """Remote data by tag: the node's array never crosses the wire."""
        grid = plan_node
        plan = Plan.trace(lambda s, v: v * s, np.zeros(()), np.zeros(4),
                          name="scale_hosted")
        grid.serve_plan("planhost", plan)
        out = grid.run_remote_plan("planhost", "scale_hosted",
                                   np.asarray(10.0), input_tags=["#vec"])
        np.testing.assert_allclose(out, [0.0, 10.0, 20.0, 30.0])

    def test_fetch_plan_local_execution(self, plan_node):
        grid = plan_node
        plan = Plan.trace(lambda a: jnp.cumsum(a), np.zeros(4), name="csum")
        grid.serve_plan("planhost", plan)
        fetched = grid.fetch_plan("planhost", "csum")
        np.testing.assert_allclose(fetched(np.ones(4)), [1, 2, 3, 4])

    def test_unknown_plan_errors(self, plan_node):
        with pytest.raises(RuntimeError):
            plan_node.run_remote_plan("planhost", "nope", np.ones(1))

    def test_list_plans(self, plan_node):
        grid = plan_node
        names = grid.clients[0].send({"type": "list_plans"})["plans"]
        assert "fma" in names
