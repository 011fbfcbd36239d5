"""Worker half of the cross-process DCN test (see
``tests/test_parallel.py::test_multihost_two_process_secure_fedavg``).

Runs as ``python tests/_dcn_worker.py <process_id> <port>`` in a clean
environment (2 forced CPU devices, no axon TPU registration): calls
``multihost.initialize``'s REAL ``jax.distributed`` branch, builds the
federated mesh across both processes (the node axis spans the process
boundary, so the secure-aggregation share sum rides the cross-process
transport — the DCN stand-in), runs one secure-FedAvg round, and
prints the result for the parent to verify. The reference's analogous
cross-machine transport is its websocket worker
(``syft/workers/websocket_client.py:30``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives need the gloo implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from primia_tpu.parallel import multihost

    assert multihost.initialize(f"127.0.0.1:{port}", num_processes=2,
                                process_id=pid) is True
    idx, count, ndev = multihost.slice_topology()
    assert idx == pid and count == 2 and ndev == 4, (idx, count, ndev)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primia_tpu.mpc.aggregation import secure_fedavg

    mesh = multihost.federated_mesh(n_nodes=2)
    assert mesh.shape["node"] == 2
    # deterministic global input: every process knows the full array and
    # contributes only its addressable node shard
    full = {"w": np.arange(24.0, dtype=np.float32).reshape(2, 4, 3) / 7.0}
    weights = np.array([0.625, 0.375])
    sh = NamedSharding(mesh, P("node"))
    stacked = jax.tree.map(
        lambda x: jax.make_array_from_callback(x.shape, sh,
                                               lambda idx: x[idx]), full)
    with mesh:
        out = jax.jit(lambda k, t: secure_fedavg(k, t, weights))(
            jax.random.PRNGKey(0), stacked)
    got = np.asarray(jax.device_get(out["w"]))
    want = np.average(full["w"], axis=0, weights=weights)
    np.testing.assert_allclose(got, want, atol=2e-3)
    print(f"DCN_OK proc={pid} max_err={np.abs(got - want).max():.2e}")


if __name__ == "__main__":
    main()
