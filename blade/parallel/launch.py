"""Multi-host initialization (the reference's `accelerate launch` analogue).

On a TPU pod each host process calls :func:`maybe_initialize_distributed`
before first JAX use; single-host runs are a no-op.  Controlled by the
standard JAX coordination env vars (``COORDINATOR_ADDRESS``,
``NUM_PROCESSES``, ``PROCESS_ID``) or TPU metadata auto-detection.
"""

from __future__ import annotations

import os

__all__ = ["maybe_initialize_distributed"]

_initialized = False


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed when a multi-host env is detected."""
    global _initialized
    if _initialized:
        return True
    import jax

    explicit = os.environ.get("COORDINATOR_ADDRESS")
    auto = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not explicit and not auto:
        return False
    kwargs = {}
    if explicit:
        kwargs = dict(
            coordinator_address=explicit,
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    if verbose:
        print(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True
