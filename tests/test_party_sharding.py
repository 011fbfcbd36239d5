"""MPC party parallelism over a device mesh (SURVEY §2.4).

The reference runs each private op once per party via remote calls
(``additive_shared.py:63-167``); the TPU translation puts the parties on
a mesh axis: ``build_encrypted_predict(party_sharding=...)`` pins the
share trees' leading (2, ...) axis to the mesh, GSPMD propagates the
layout through the share-space forward, and every opening (sum over the
party axis) becomes an XLA all-reduce. Ring arithmetic is int64 so the
distributed reductions are exact: sharded and unsharded logits must be
bit-identical.

Runs on the 8-virtual-CPU-device mesh set up by conftest.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from primia_tpu.config import Arguments
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model


_PROTOCOLS = ["snn"] + (
    # the fss variant costs ~7 min of CPU-mesh compile; opt-in (it passed:
    # sharded == unsharded bit-exact for both protocols)
    ["fss"] if os.environ.get("PRIMIA_SLOW_TESTS") else []
)


@pytest.fixture(scope="module", params=_PROTOCOLS)
def protocol(request):
    return request.param


def _setup():
    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (4, 28, 28, 1), dtype=np.uint8)
    return args, md, params, state, imgs


def test_party_sharded_matches_single_device(protocol):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    args, md, params, state, imgs = _setup()

    plain = build_encrypted_predict(
        md, args, np.array([0.5]), np.array([0.25]), seed=1, protocol=protocol)
    ref = np.asarray(plain(params, state, imgs))

    mesh = Mesh(np.array(devs[:2]), axis_names=("party",))
    sharded = build_encrypted_predict(
        md, args, np.array([0.5]), np.array([0.25]), seed=1, protocol=protocol,
        party_sharding=NamedSharding(mesh, P("party")))
    got = np.asarray(sharded(params, state, imgs))

    np.testing.assert_array_equal(got, ref)


def test_secure_fedavg_party_sharded():
    """secure_fedavg(party_sharding=...): the FedAvg share-sum runs one
    party per device; result must equal the single-device aggregation
    bit for bit."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    from primia_tpu.mpc.aggregation import secure_fedavg

    rng = np.random.default_rng(5)
    tree = {
        "w": jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32)),
    }
    weights = np.array([0.5, 0.3, 0.2])
    key = jax.random.PRNGKey(4)

    ref = jax.jit(lambda k, t: secure_fedavg(k, t, weights))(key, tree)

    mesh = Mesh(np.array(devs[:2]), axis_names=("party",))
    sh = NamedSharding(mesh, P("party"))
    got = jax.jit(
        lambda k, t: secure_fedavg(k, t, weights, party_sharding=sh)
    )(key, tree)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_party_sharded_on_larger_mesh():
    """(party, data) mesh with the party axis pinned and the data axis
    left to the partitioner — the §2.4 simulated-party topology."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    args, md, params, state, imgs = _setup()

    plain = build_encrypted_predict(
        md, args, np.array([0.5]), np.array([0.25]), seed=1, protocol="snn")
    ref = np.asarray(plain(params, state, imgs))

    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), axis_names=("party", "data"))
    sharded = build_encrypted_predict(
        md, args, np.array([0.5]), np.array([0.25]), seed=1, protocol="snn",
        party_sharding=NamedSharding(mesh, P("party")))
    got = np.asarray(sharded(params, state, imgs))

    np.testing.assert_array_equal(got, ref)
