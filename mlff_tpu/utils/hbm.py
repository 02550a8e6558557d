"""HBM capacity model for the axon single-chip TPU runtime.

Measured behavior of the tunnel runtime (TPU v5e, 16 GB HBM), established
by bisection probes (tools/probe_donation_leak.py and the /tmp probe
series recorded in RESULTS.md "Axon runtime memory model"):

  * A fresh process can allocate ~14 GB.
  * The FIRST device->host transfer of the process permanently splits the
    heap: after any d2h, the largest SINGLE allocatable buffer is ~8 GB.
    One-time; later transfers cost nothing further.  h2d reserves nothing.
  * The limit is PER BUFFER, not total capacity: after the first d2h,
    2 x 5 GB, 3 x 4 GB, 4 x 3 GB and 6 x 2 GB all allocate (>= 12 GB
    held simultaneously), while a single 9 GB buffer fails.  The d2h
    staging carve-out fragments the address space rather than consuming
    the memory.
  * If the first d2h happens when less than ~6 GB is free, it does NOT
    degrade — it hard-fails with RESOURCE_EXHAUSTED.  Hence
    ``preconditioners.warm_host_transfer`` must run before any large
    allocation.

Every long-lived buffer whose size we choose (the Nyström factor B at
(n, k) f64 is the big one) must therefore be budgeted against the
POST-d2h per-buffer ceiling — or stored in row blocks to use the ~12 GB
total that remains reachable in pieces.
"""

from __future__ import annotations

import os

import jax

_CEILING_ENV = "MLFF_TPU_HBM_CEILING_GB"


def post_d2h_ceiling_bytes() -> int | None:
    """Usable-HBM ceiling once the d2h staging reserve is paid, or None
    when the backend has no such reserve (CPU, native TPU runtimes).

    Override with ``MLFF_TPU_HBM_CEILING_GB`` (e.g. on a runtime whose
    reserve differs from the measured v5e tunnel value).
    """
    env = os.environ.get(_CEILING_ENV)
    if env:
        return int(float(env) * 1e9)
    try:
        from jax.extend.backend import get_backend

        backend = get_backend()
        # the tunnel runtime identifies as platform 'tpu' (sometimes 'axon'
        # depending on the jax version); the platform_version string names
        # the axon runtime in both cases
        is_axon = (backend.platform == "axon"
                   or "axon" in backend.platform_version)
    except Exception:  # pragma: no cover - uninitialized backend
        return None
    if not is_axon:
        return None
    return int(8.0e9)
