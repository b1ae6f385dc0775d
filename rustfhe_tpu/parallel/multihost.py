"""Multi-host scale-out entry points.

The reference has no distributed story at all (SURVEY.md §2.6).  Here the
N-host path is standard JAX SPMD: ``jax.distributed.initialize`` forms the
global runtime, the mesh spans all hosts' devices, and the same
``sharded_gate_fn`` program runs unchanged — gate batches partitioned over
``data`` ride ICI within a slice and DCN across slices; bootstrapping keys
are replicated per-device (62 MB at default parameters).

This module cannot be exercised in a single-host environment; it is covered
by the virtual-device mesh tests (tests/test_sharding.py) for the SPMD
program itself, and kept deliberately thin so the multi-host launch is
nothing but "initialize, then call the same functions".
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime (arguments resolve from env on TPU pods)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_gate_batch_size(per_device_batch: int) -> int:
    """Global batch across every device of every host."""
    return per_device_batch * jax.device_count()


def make_global_mesh(model: int = 1):
    """Mesh over ALL hosts' devices: ('data', 'model')."""
    from .mesh import make_mesh

    return make_mesh(model=model, devices=jax.devices())
