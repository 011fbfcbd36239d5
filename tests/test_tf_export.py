"""TF SavedModel serving bridge (nn/tf_export.py).

Role parity: the reference's Keras/TFE bridge serves a trained model
through another framework's stack (``syft/frameworks/keras/``); here the
jitted inference function is exported via jax2tf and must reproduce the
native eval-path logits exactly (same graph, same arithmetic, both
executed by XLA:CPU under the test mesh).
"""

import numpy as np
import pytest

from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.nn.tf_export import (
    export_saved_model,
    load_saved_model,
    make_serving_fn,
    tf_available,
)

pytestmark = pytest.mark.skipif(
    not tf_available(), reason="tensorflow not importable (bridge is gated)"
)


@pytest.fixture(scope="module")
def small_model():
    import jax

    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    mean, std = np.array([0.5]), np.array([0.25])
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (4, 28, 28, 1), dtype=np.uint8)
    return md, params, state, mean, std, imgs


def test_savedmodel_roundtrip_matches_native(tmp_path, small_model):
    md, params, state, mean, std, imgs = small_model
    native = np.asarray(make_serving_fn(md, params, state, mean, std)(imgs))

    path = str(tmp_path / "sm")
    export_saved_model(md, params, state, mean, std, path, batch_size=4)
    served = load_saved_model(path)(imgs)

    assert served.shape == (4, 3)
    np.testing.assert_allclose(served, native, rtol=0, atol=1e-5)


def test_dynamic_batch_export(tmp_path, small_model):
    md, params, state, mean, std, imgs = small_model
    path = str(tmp_path / "sm_dyn")
    export_saved_model(md, params, state, mean, std, path, batch_size=None)
    run = load_saved_model(path)
    for b in (1, 3):
        out = run(imgs[:b])
        assert out.shape == (b, 3)
