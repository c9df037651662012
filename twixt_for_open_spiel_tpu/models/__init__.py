from twixt_for_open_spiel_tpu.models.network import (
    AZNet,
    create_net,
    init_params,
    masked_policy,
)
from twixt_for_open_spiel_tpu.models.arena import (
    arena_match,
    arena_match_asym,
)
from twixt_for_open_spiel_tpu.models.mcts import (
    batched_search,
    gumbel_search_batch,
    search_batch,
)
from twixt_for_open_spiel_tpu.models.selfplay import (
    Sample,
    loss_fn,
    make_optimizer,
    selfplay_chunk,
    train_step,
)

__all__ = [
    "AZNet",
    "create_net",
    "init_params",
    "masked_policy",
    "arena_match",
    "arena_match_asym",
    "batched_search",
    "gumbel_search_batch",
    "search_batch",
    "Sample",
    "loss_fn",
    "make_optimizer",
    "selfplay_chunk",
    "train_step",
]
