from twixt_for_open_spiel_tpu.parallel.mesh import (
    ENV_AXIS,
    env_sharding,
    hosts_major_order,
    make_env_mesh,
    replicated,
    shard_env_pytree,
)
from twixt_for_open_spiel_tpu.parallel.launch import initialize_distributed
from twixt_for_open_spiel_tpu.parallel.envsharding import (
    make_sharded_bit_rollout,
    make_sharded_rollout,
    sharded_batch_reset,
    sharded_bit_reset,
)
from twixt_for_open_spiel_tpu.parallel.learner_feed import (
    make_distributed_selfplay,
    make_distributed_train_step,
)

__all__ = [
    "ENV_AXIS",
    "env_sharding",
    "hosts_major_order",
    "initialize_distributed",
    "make_env_mesh",
    "replicated",
    "shard_env_pytree",
    "make_sharded_bit_rollout",
    "make_sharded_rollout",
    "sharded_batch_reset",
    "sharded_bit_reset",
    "make_distributed_selfplay",
    "make_distributed_train_step",
]
