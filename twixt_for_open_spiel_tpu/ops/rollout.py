"""Batched lockstep environments: ``jit(vmap(step))`` + auto-reset + masked
random policies.

This is the framework component the reference does not have (SURVEY.md §2,
"Batched env vectorization"): thousands of games stepping in lockstep on one
chip, the unit that `parallel/` shards across a device mesh.  The reference's
random-sim driver loop (RandomSimTest, twixt_test.cc:28) becomes a
``lax.fori_loop`` over a vmapped transition with per-env RNG via
``jax.random.fold_in``.

Layout: the env batch is the TRAILING axis of every board-shaped leaf
(``[P, P, B]``; scalar fields are ``[B]``), via ``vmap(in_axes=-1,
out_axes=-1)``.  On TPU the minor-most dimension maps to the 128-wide vector
lanes: with batch minor, a [P, P, B] int8 array tiles perfectly for any
board size, whereas batch-major [B, P, P] would pad the P(=14..30)-sized
lane dimension to 128 and waste ~4-9x HBM bandwidth — measured 12.6ms/step
vs 0.9ms/step at board_size=12, batch=4096 on a v5e chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import (
    State,
    legal_mask_flat,
    reset,
)
from twixt_for_open_spiel_tpu.ops.step import step

# vmap axis spec: every State leaf batches on its trailing axis (for the
# scalar fields the result is 1-D, where axis -1 == axis 0).
BATCH_AXIS = -1


def batch_size(state: State) -> int:
    return state.current_player.shape[0]


def batch_reset(board_size: int, batch: int) -> State:
    """Batched initial state, env axis trailing on every leaf."""
    s = reset(board_size)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[..., None], x.shape + (batch,)), s
    )


def env_slice(state: State, e: int) -> State:
    """Extract env ``e`` as an unbatched State (host-side convenience)."""
    return jax.tree_util.tree_map(lambda x: x[..., e], state)


def sample_legal_action(state: State, key, board_size: int) -> jnp.ndarray:
    """Uniform random legal action for the current player (single env)."""
    p = jnp.clip(state.current_player, 0, 1)
    mask = legal_mask_flat(state, p, board_size)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def step_auto_reset(state: State, action, board_size: int):
    """step(); terminal next-states are replaced by fresh initial states.

    Returns (next_state, terminated, result) where ``terminated``/``result``
    describe the pre-reset transition (for episode accounting).
    """
    nxt = step(state, board_size, action)
    done = nxt.result != geo.RESULT_OPEN
    init = reset(board_size)
    # done is a scalar per env (this function is used under vmap), so it
    # broadcasts against every leaf shape.
    nxt_or_init = jax.tree_util.tree_map(
        lambda a, b: jnp.where(done, a, b), init, nxt
    )
    return nxt_or_init, done, nxt.result


# batched transition: env axis trailing on State, leading on keys/actions
vstep_auto_reset = jax.vmap(
    step_auto_reset, in_axes=(BATCH_AXIS, 0, None), out_axes=(BATCH_AXIS, 0, 0)
)
vsample_legal_action = jax.vmap(
    sample_legal_action, in_axes=(BATCH_AXIS, 0, None), out_axes=0
)


def _rollout_body(board_size, state, key, i):
    key_i = jax.random.fold_in(key, i)
    env_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key_i, jnp.arange(batch_size(state), dtype=jnp.uint32)
    )
    actions = vsample_legal_action(state, env_keys, board_size)
    return vstep_auto_reset(state, actions, board_size)


@functools.partial(jax.jit, static_argnums=(1, 2))
def random_rollout(key, board_size: int, num_steps: int, state: State):
    """Run ``num_steps`` lockstep random-policy env steps over the batch.

    Returns (final_state, stats) with episode/result counters — the batched
    equivalent of the reference's 100-game RandomSimTest loop, and the
    workload benchmarked by ``bench.py`` (BASELINE.json configs 2-4).
    """

    def body(i, carry):
        state, episodes, results = carry
        nxt, done, result = _rollout_body(board_size, state, key, i)
        episodes = episodes + jnp.sum(done, dtype=jnp.int32)
        # per-result histogram via one-hot accumulation (vector add, no
        # scatter): results[r] += sum(done & result == r)
        results = results + jnp.stack(
            [
                jnp.sum(done & (result == r), dtype=jnp.int32)
                for r in range(4)
            ]
        )
        return nxt, episodes, results

    episodes0 = jnp.int32(0)
    results0 = jnp.zeros((4,), jnp.int32)
    state, episodes, results = jax.lax.fori_loop(
        0, num_steps, body, (state, episodes0, results0)
    )
    return state, {"episodes": episodes, "results": results}
