"""Parallelism layer: federated simulation over a node axis, device-mesh
sharding helpers, and DP-SGD integration."""

from primia_tpu.parallel.federated import main_federated, setup_federated  # noqa: F401
