from .halo import (
    apply_partitioned_banded,
    apply_partitioned_banded_batch,
    apply_partitioned_halo,
    make_banded_halo_plan,
    make_halo_plan,
    make_partitioned_epoch_fn,
    make_partitioned_eval_fn,
    make_partitioned_train_step,
)
from .mesh import best_factorization, initialize_distributed, make_mesh
from .partition import apply_partitioned, jit_partitioned_forward, pad_to_multiple
from .sharding import (
    batch_spec,
    make_parallel_train_step,
    param_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "apply_partitioned_banded",
    "apply_partitioned_banded_batch",
    "apply_partitioned_halo",
    "make_partitioned_epoch_fn",
    "make_partitioned_eval_fn",
    "make_banded_halo_plan",
    "make_halo_plan",
    "make_partitioned_train_step",
    "best_factorization",
    "initialize_distributed",
    "make_mesh",
    "apply_partitioned",
    "jit_partitioned_forward",
    "pad_to_multiple",
    "batch_spec",
    "make_parallel_train_step",
    "param_specs",
    "shard_batch",
    "shard_params",
]
