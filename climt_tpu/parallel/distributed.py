"""Multi-host initialization (jax.distributed) and mesh construction.

The reference has no distributed computing at all ("climt does not yet
support MPI", /root/reference/docs/configuration.rst:41); this is the
TPU-native multi-host layer: one JAX process per host, XLA collectives
over ICI within a slice and DCN across slices (no custom transport).

Typical multi-host entry:

    from climt_tpu.parallel import initialize_distributed, make_mesh
    initialize_distributed()            # reads TPU env on Cloud TPU, or
                                        # pass coordinator_address/rank
    mesh = make_mesh()                  # spans jax.devices() (all hosts)

after which the fused moist-GCM step runs under the mesh exactly as in
tests/test_multichip.py — grid fields sharded over (lat, lon), spectral
state replicated (small grids) or m-sharded via DistributedSHT (large).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Initialize jax.distributed for a multi-host run (idempotent).

    With no arguments, JAX auto-detects the Cloud TPU environment
    (coordinator from the TPU metadata); on other clusters pass the
    coordinator address plus this process's rank and the world size.
    Safe to call in single-process runs: a failure to detect a cluster
    degrades to single-process with a logged advisory.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count()
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except Exception as err:  # single-process fallback
        logger.info(
            'jax.distributed.initialize unavailable (%s); running '
            'single-process', err)
    return jax.process_count()


def process_info():
    """(process_id, process_count, local_devices, global_devices)."""
    import jax
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())
