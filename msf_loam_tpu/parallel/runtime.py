"""Multi-host runtime initialization.

The ``jax.distributed`` bootstrap for pod-slice deployments — the
communication-backend plank of SURVEY.md §2.9 (the reference is
single-process; this is where the TPU build goes multi-host). After
``initialize()``, ``jax.devices()`` spans the slice and every mesh built by
``parallel.mesh.make_mesh`` shards over ICI/DCN transparently.

Single-machine simulation (CI / tests): run N processes with
``MSF_COORD=localhost:PORT MSF_NUM_PROCESSES=N MSF_PROCESS_ID=i``, or use
the in-process 8-virtual-device CPU mesh (tests/conftest.py) which needs no
initialization at all.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("msf_loam_tpu")

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or MSF_*/JAX_* env vars.

    Returns True if a multi-process runtime was started; False for
    single-process operation (no-op — the common case on one host).
    """
    global _initialized
    import jax

    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("MSF_COORD")
    num_processes = num_processes or _int_env("MSF_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("MSF_PROCESS_ID")

    if not coordinator or not num_processes:
        # also honor the standard JAX cluster auto-detection (TPU pods set
        # the metadata up themselves)
        try:
            jax.distributed.initialize()
            _initialized = True
            logger.info("jax.distributed auto-initialized: %d processes",
                        jax.process_count())
            return jax.process_count() > 1
        except Exception:
            return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_processes),
                               process_id=int(process_id or 0))
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d @ %s",
                jax.process_index(), jax.process_count(), coordinator)
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
