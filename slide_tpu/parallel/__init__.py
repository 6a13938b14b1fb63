"""Scale-out layer (reference L7 `distributed.py`, re-designed for TPU
meshes, SURVEY.md §2.3/§5.8): multi-host initialization, process-local ->
global array assembly, and cross-host gathers.  None of the reference's
NCCL surface survives — in-graph collectives are XLA's, inserted by pjit."""

from slide_tpu.parallel.multihost import (
    maybe_initialize_distributed,
    world_info,
    global_batch_from_local,
    process_allgather,
)

__all__ = ["maybe_initialize_distributed", "world_info",
           "global_batch_from_local", "process_allgather"]
