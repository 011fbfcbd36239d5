"""Serve layer: grid node server (data hosting + local-training RPCs),
client with ws/HTTP transports, fleet launcher."""

from primia_tpu.serve.client import (  # noqa: F401
    GridNetwork,
    NodeClient,
    RemoteInferenceSession,
    clients_from_csv,
)
from primia_tpu.serve.node import GridNode, NodeServer  # noqa: F401
