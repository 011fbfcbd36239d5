"""Cluster provisioning helpers (gcloud / Terraform artifact generation).

Reference: ``syft/grid/utils/autoscale/`` — GCloud + Terraform wrappers
that spin up and tear down grid-node clusters (create/destroy cluster,
reserve instances). The TPU-native equivalent provisions **TPU VM
slices** for the compute mesh plus ordinary VMs for grid nodes, and
emits the matching worker-topology CSV this framework's federated CLI
consumes (``configs/websetting/config.csv`` format).

Everything here is artifact *generation* (dry-run by default): the
methods return the exact ``gcloud`` command lines / Terraform HCL and
can optionally execute them via subprocess when run on a workstation
with gcloud installed — mirroring the reference's two-phase
plan/apply design. No cloud SDK is required to generate, inspect, or
test the artifacts.
"""

from __future__ import annotations

import shlex
import subprocess
from pathlib import Path
from typing import Dict, List, NamedTuple


class ClusterSpec(NamedTuple):
    """What to provision (reference autoscale's cluster definition)."""

    name: str = "primia"
    project: str = "my-project"
    zone: str = "us-central2-b"
    accelerator_type: str = "v5litepod-8"  # the compute mesh
    runtime_version: str = "v2-alpha-tpuv5-lite"
    n_grid_nodes: int = 3  # hospital/data-owner nodes
    node_machine_type: str = "n2-standard-8"
    base_port: int = 8777
    with_crypto_provider: bool = True


def node_names(spec: ClusterSpec) -> List[str]:
    names = [f"{spec.name}-node-{i + 1}" for i in range(spec.n_grid_nodes)]
    if spec.with_crypto_provider:
        names.append(f"{spec.name}-crypto-provider")
    return names


def gcloud_commands(spec: ClusterSpec) -> List[str]:
    """Provisioning command lines: one TPU VM slice + one VM per grid
    node + a firewall rule for the node RPC ports."""
    cmds = [
        # the compute mesh: a TPU slice, sharded via jax.sharding.Mesh
        f"gcloud compute tpus tpu-vm create {spec.name}-mesh"
        f" --project={spec.project} --zone={spec.zone}"
        f" --accelerator-type={spec.accelerator_type}"
        f" --version={spec.runtime_version}",
    ]
    for name in node_names(spec):
        cmds.append(
            f"gcloud compute instances create {name}"
            f" --project={spec.project} --zone={spec.zone}"
            f" --machine-type={spec.node_machine_type}"
            f" --metadata=startup-script='pip install primia-tpu &&"
            f" python -m primia_tpu.serve.node --id {name}"
            f" --port {spec.base_port}'"
        )
    hi = spec.base_port + len(node_names(spec)) + 1000  # ws + HTTP fallback
    cmds.append(
        f"gcloud compute firewall-rules create {spec.name}-grid-rpc"
        f" --project={spec.project}"
        f" --allow=tcp:{spec.base_port}-{hi}"
        f" --target-tags={spec.name}-grid"
    )
    return cmds


def teardown_commands(spec: ClusterSpec) -> List[str]:
    """The destroy phase (reference autoscale's delete path)."""
    cmds = [
        f"gcloud compute tpus tpu-vm delete {spec.name}-mesh"
        f" --project={spec.project} --zone={spec.zone} --quiet"
    ]
    for name in node_names(spec):
        cmds.append(
            f"gcloud compute instances delete {name}"
            f" --project={spec.project} --zone={spec.zone} --quiet")
    cmds.append(
        f"gcloud compute firewall-rules delete {spec.name}-grid-rpc"
        f" --project={spec.project} --quiet")
    return cmds


def terraform_config(spec: ClusterSpec) -> str:
    """Equivalent Terraform HCL (the reference wraps terraform via
    python-terraform; plain HCL is toolchain-neutral)."""
    blocks = [
        f'''provider "google" {{
  project = "{spec.project}"
  zone    = "{spec.zone}"
}}

resource "google_tpu_v2_vm" "{spec.name}_mesh" {{
  name             = "{spec.name}-mesh"
  zone             = "{spec.zone}"
  accelerator_type = "{spec.accelerator_type}"
  runtime_version  = "{spec.runtime_version}"
}}'''
    ]
    for name in node_names(spec):
        rname = name.replace("-", "_")
        blocks.append(f'''resource "google_compute_instance" "{rname}" {{
  name         = "{name}"
  machine_type = "{spec.node_machine_type}"
  zone         = "{spec.zone}"
  tags         = ["{spec.name}-grid"]
  boot_disk {{
    initialize_params {{ image = "debian-cloud/debian-12" }}
  }}
  network_interface {{
    network = "default"
    access_config {{}}
  }}
  metadata_startup_script = "pip install primia-tpu && python -m primia_tpu.serve.node --id {name} --port {spec.base_port}"
}}''')
    return "\n\n".join(blocks) + "\n"


def worker_config_csv(spec: ClusterSpec, hosts: Dict[str, str] | None = None) -> str:
    """The ``configs/websetting/config.csv`` this cluster serves —
    what ``train.py --train_federated`` consumes. ``hosts`` maps node
    name -> address once provisioning assigned IPs (placeholder
    hostnames otherwise)."""
    names = node_names(spec)
    ids = [f"worker{i + 1}" for i in range(spec.n_grid_nodes)]
    if spec.with_crypto_provider:
        ids.append("crypto_provider")
    hostrow = [(hosts or {}).get(n, f"{n}.{spec.zone}.c.{spec.project}.internal")
               for n in names]
    ports = [str(spec.base_port + i) for i in range(len(names))]
    return "\n".join([
        "id," + ",".join(ids),
        "host," + ",".join(hostrow),
        "port," + ",".join(ports),
    ]) + "\n"


class AutoScaler:
    """Two-phase provision/destroy driver (reference autoscale API:
    create -> use -> destroy). ``execute=False`` (default) is plan-only."""

    def __init__(self, spec: ClusterSpec, execute: bool = False):
        self.spec = spec
        self.execute = execute

    def _run(self, cmds: List[str]) -> List[str]:
        if self.execute:
            for c in cmds:
                subprocess.run(shlex.split(c), check=True)
        return cmds

    def create_cluster(self) -> List[str]:
        return self._run(gcloud_commands(self.spec))

    def destroy_cluster(self) -> List[str]:
        return self._run(teardown_commands(self.spec))

    def write_artifacts(self, outdir) -> Dict[str, Path]:
        """provision.sh / teardown.sh / main.tf / config.csv"""
        out = Path(outdir)
        out.mkdir(parents=True, exist_ok=True)
        files = {
            "provision.sh": "#!/bin/sh\nset -e\n" + "\n".join(
                gcloud_commands(self.spec)) + "\n",
            "teardown.sh": "#!/bin/sh\n" + "\n".join(
                teardown_commands(self.spec)) + "\n",
            "main.tf": terraform_config(self.spec),
            "config.csv": worker_config_csv(self.spec),
        }
        paths = {}
        for fn, content in files.items():
            p = out / fn
            p.write_text(content)
            if fn.endswith(".sh"):
                p.chmod(0o755)
            paths[fn] = p
        return paths
