"""AlphaZero-style self-play + learner loop (BASELINE.json config 5).

Everything is a fixed-shape jitted program:

  * ``selfplay_chunk``: T lockstep env steps over a [B] batch where each
    action comes from batched MCTS (models/mcts.py); emits the training
    tuple (obs, policy target, outcome) with a backward scan assigning each
    position the final result of its episode (auto-reset keeps envs dense);
  * ``train_step``: masked cross-entropy + value MSE on the chunk, optax
    adam; gradients are averaged across the data-parallel mesh by XLA's
    collectives when the batch is sharded (parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import State, legal_mask_flat
from twixt_for_open_spiel_tpu.ops.observe import observation_nchw
from twixt_for_open_spiel_tpu.ops.rollout import (
    BATCH_AXIS,
    batch_size,
    step_auto_reset,
)
from twixt_for_open_spiel_tpu.models import mcts


class Sample(NamedTuple):
    """One training chunk, time-major [T, B, ...]."""

    obs: jnp.ndarray       # f32 [T, B, 12, N, N-2]
    policy: jnp.ndarray    # f32 [T, B, A] MCTS visit distribution
    value: jnp.ndarray     # f32 [T, B] outcome from mover's perspective
    weight: jnp.ndarray    # f32 [T, B] 0 for positions of unfinished games


@functools.partial(
    jax.jit,
    static_argnames=(
        "net_apply", "board_size", "num_steps", "num_simulations"
    ),
)
def selfplay_chunk(
    params,
    state: State,
    key,
    *,
    net_apply,
    board_size: int,
    num_steps: int,
    num_simulations: int,
    temperature: float = 1.0,
):
    """Run ``num_steps`` MCTS-driven lockstep steps; returns
    (final_state, Sample).

    ``state`` uses the trailing-env-axis batch layout of ``ops/rollout.py``;
    the emitted Sample is time-major, batch-second ([T, B, ...]) as the
    learner expects.
    """
    batch = batch_size(state)

    def body(carry, i):
        state, key = carry
        key, k_search, k_act = jax.random.split(key, 3)
        search_keys = jax.random.split(k_search, batch)
        probs, root_q = mcts.batched_search(
            params,
            state,
            search_keys,
            evaluator=mcts.net_evaluator(net_apply, board_size),
            board_size=board_size,
            num_simulations=num_simulations,
        )
        obs = observation_nchw(state, board_size)
        player = jnp.clip(state.current_player, 0, 1)

        # temperature sampling over visit counts
        logits = jnp.log(jnp.maximum(probs, 1e-9)) / temperature
        legal = jax.vmap(
            lambda s, p: legal_mask_flat(s, p, board_size),
            in_axes=(BATCH_AXIS, 0),
        )(state, player)
        logits = jnp.where(legal, logits, -jnp.inf)
        act_keys = jax.random.split(k_act, batch)
        actions = jax.vmap(jax.random.categorical)(act_keys, logits)

        nxt, done, result = step_auto_reset(
            state, actions.astype(jnp.int32), board_size
        )
        out = {
            "obs": obs,
            "policy": probs,
            "player": player,
            "done": done,
            "result": result,
        }
        return (nxt, key), out

    (final_state, _), tr = jax.lax.scan(
        body, (state, key), jnp.arange(num_steps)
    )

    # Backward scan: propagate each episode's terminal outcome (red's
    # perspective) to all of its positions; positions whose episode never
    # finished inside the chunk get weight 0.
    def back(carry, t):
        z_red, known = carry
        done, result = t["done"], t["result"]
        z_here = jnp.where(
            result == geo.RESULT_RED_WIN,
            1.0,
            jnp.where(result == geo.RESULT_BLUE_WIN, -1.0, 0.0),
        )
        z_red = jnp.where(done, z_here, z_red)
        known = jnp.where(done, True, known)
        return (z_red, known), (z_red, known)

    batch_shape = tr["done"].shape[1:]
    (_, _), (z_red, known) = jax.lax.scan(
        back,
        (jnp.zeros(batch_shape), jnp.zeros(batch_shape, bool)),
        tr,
        reverse=True,
    )
    value = jnp.where(tr["player"] == 0, z_red, -z_red)
    sample = Sample(
        obs=tr["obs"],
        policy=tr["policy"],
        value=value,
        weight=known.astype(jnp.float32),
    )
    return final_state, sample


def make_optimizer(lr: float = 2e-3, weight_decay: float = 1e-4):
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(params, net_apply, sample: Sample):
    t, b = sample.obs.shape[:2]
    obs = sample.obs.reshape((t * b,) + sample.obs.shape[2:])
    logits, value = net_apply(params, obs)
    logits = logits.reshape(t, b, -1)
    value = value.reshape(t, b)

    logp = jax.nn.log_softmax(
        jnp.where(sample.policy > 0, logits, logits - 1e9), axis=-1
    )
    pol_loss = -(sample.policy * logp).sum(-1)
    val_loss = (value - sample.value) ** 2
    w = sample.weight
    denom = jnp.maximum(w.sum(), 1.0)
    loss = ((pol_loss + val_loss) * w).sum() / denom
    return loss, {
        "loss": loss,
        "policy_loss": (pol_loss * w).sum() / denom,
        "value_loss": (val_loss * w).sum() / denom,
        "train_frames": w.sum(),
    }


@functools.partial(jax.jit, static_argnames=("net_apply", "optimizer"))
def train_step(params, opt_state, sample: Sample, *, net_apply, optimizer):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        params, net_apply, sample
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
