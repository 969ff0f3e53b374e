"""Multi-host initialization helpers.

On a pod slice, call ``init_distributed()`` once per process before any jax
op; the 'frames' mesh then spans all hosts and the psum'd EM statistics ride
ICI within a slice / DCN across slices (the communication design of
SURVEY §2.5 — the reference has no distributed backend at all).
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op when single-process).

    With no arguments, uses the TPU environment's automatic configuration
    (GCE metadata / megascale env vars), which is correct on Cloud TPU pods.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # already initialized / 1-proc
        if "already" not in str(e).lower():
            raise
    return jax.process_count(), jax.process_index()


def global_frame_mesh(axis: str = "frames"):
    """1-D mesh over every device of every process."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))
