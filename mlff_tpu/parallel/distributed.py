"""Multi-host initialization and hardware provenance.

Maps two reference facilities onto TPU:
  * the SGE node -> hardware-model table used for result provenance
    (reference: src/tools/cluster_information.py:1-65, and
    platform.uname() recording at src/tools/create_data.py:154-155),
  * multi-node execution, which in the reference is just independent SGE
    array jobs (no communication); here it is a real jax.distributed mesh
    with ICI inside a slice and DCN across slices.
"""

from __future__ import annotations

import platform as platform_mod

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils.log import get_logger

log = get_logger(__name__)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (one process per host).

    No-op in single-process runs; in multi-host deployments the standard
    TPU environment variables usually make all arguments optional."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialized: process %d / %d",
            jax.process_index(), jax.process_count(),
        )


def make_host_mesh(rows_per_host: bool = True) -> Mesh:
    """2-D ('hosts', 'rows') mesh: DCN on the outer axis, ICI inside.

    The kernel-operator row sharding (parallel.mesh) extends over the
    flattened mesh; collectives along 'rows' ride ICI, the per-iteration
    all-gather of the (N, D) cotangents crosses DCN only once."""
    devices = np.asarray(jax.devices())
    n_hosts = jax.process_count()
    per_host = len(devices) // max(n_hosts, 1)
    return Mesh(devices.reshape(n_hosts, per_host), ("hosts", "rows"))


def hardware_info() -> dict:
    """Result-provenance record (replaces the reference's SGE-node -> GPU/CPU
    mapping, cluster_information.py:17-66)."""
    devs = jax.devices()
    info = {
        "platform": devs[0].platform if devs else "unknown",
        "device_kind": devs[0].device_kind if devs else "unknown",
        "n_devices": len(devs),
        "n_hosts": jax.process_count(),
        "uname": platform_mod.uname()._asdict(),
        "jax_version": jax.__version__,
    }
    return info
