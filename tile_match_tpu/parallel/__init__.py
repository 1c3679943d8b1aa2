"""Multi-chip / multi-host scale-out: meshes, shardings, collectives.

The reference has zero distributed code (SURVEY §2.5); the parallelism model
here is batch-of-independent-envs: env states shard over a ``dp`` mesh axis
with no intra-step communication, metrics reduce with ``psum``, and the
learner's gradients all-reduce over ``dp`` while its hidden layers may shard
over a ``tp`` axis.
"""

from .sharding import (
    make_mesh,
    shard_env_batch,
    sharded_rollout,
    sharded_train_step,
)
from .distributed import initialize_distributed

__all__ = [
    "make_mesh",
    "shard_env_batch",
    "sharded_rollout",
    "sharded_train_step",
    "initialize_distributed",
]
