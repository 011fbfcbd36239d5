"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's VirtualWorker strategy (SURVEY.md §4): the same
code paths as real multi-chip execution, but simulated in one process.

This environment pre-imports jax via sitecustomize and pins the platform
to the axon TPU tunnel through ``jax.config`` (which overrides the
``JAX_PLATFORMS`` env var), so we must (a) set XLA_FLAGS before any
backend initializes and (b) force the platform through jax.config, not
the environment.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# PRIMIA_TEST_TPU=1 keeps the session's real backend (one TPU chip) —
# for the slow encrypted-model tests whose share-space convs are
# impractical on CPU (e.g. test_encrypted_vgg @ 224 px). Mesh-shaped
# tests need the 8-device CPU default and will fail on one chip.
if os.environ.get("PRIMIA_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the MPC e2e graphs take minutes to
# compile cold; cached re-runs of the suite are seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile checks (e.g. encrypted VGG-16); skipped "
        "unless PRIMIA_RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PRIMIA_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: set PRIMIA_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """A tiny 3-class image-folder dataset (the 'minimal_server_folders'
    analogue: 4 images per class, 3 classes, reference Makefile:37-38)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("xray_fixture")
    rng = np.random.default_rng(0)
    classes = ["bacterial pneumonia", "normal", "viral pneumonia"]
    for split in ["train", "test"]:
        for ci, cls in enumerate(classes):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                # class-dependent brightness so a model can actually learn
                base = 40 + 60 * ci
                arr = rng.integers(0, 80, (64, 64), dtype=np.uint8) + base
                Image.fromarray(arr, mode="L").save(d / f"img_{i}.jpeg")
    return root
