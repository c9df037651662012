"""Batched AlphaZero MCTS under jit, with true game dynamics.

The reference is exercised by OpenSpiel's CPU ``mcts_example``
(reference README.md:38-40) — one tree, one thread, pointer-chasing.  The
TPU-native redesign keeps a *fixed-size tree as flat arrays* per environment
and vmaps the whole search over the env batch, so every network evaluation
inside the search is a full [B]-batch MXU call and every tree operation is a
gather/scatter over [B, nodes, actions] tensors:

  * selection: PUCT argmax over masked children, ``lax.while_loop`` to a
    leaf (fixed max depth);
  * expansion: one engine ``step`` (ops/step.py) creates the child state;
  * backup: ``lax.while_loop`` up the parent chain with sign-flipped values
    (two-player zero-sum).

Simulation count and tree size are static; search never reallocates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import State, legal_mask_flat
from twixt_for_open_spiel_tpu.ops.step import step
from twixt_for_open_spiel_tpu.ops.observe import observation

NO_NODE = jnp.int32(-1)


class Tree(NamedTuple):
    """Flat per-env search tree (all arrays have leading [nodes] axis)."""

    visit: jnp.ndarray        # int32 [nodes] node visit count
    value_sum: jnp.ndarray    # f32 [nodes] sum of backed-up values
    prior: jnp.ndarray        # f32 [nodes, A] child priors
    children: jnp.ndarray     # int32 [nodes, A] child node id or -1
    parent: jnp.ndarray       # int32 [nodes]
    parent_action: jnp.ndarray  # int32 [nodes]
    legal: jnp.ndarray        # bool [nodes, A] legal mask at the node
    terminal: jnp.ndarray     # bool [nodes]
    # value of a terminal node from the perspective of the player to move at
    # its PARENT (the player who took parent_action); 0 for non-terminal.
    terminal_value: jnp.ndarray  # f32 [nodes]
    state: State              # node game states, stacked on axis 0


def _puct_scores(tree: Tree, node, c_puct):
    """PUCT score for every action of ``node``."""
    kids = tree.children[node]                       # [A]
    kid_valid = kids >= 0
    safe_kids = jnp.maximum(kids, 0)
    child_visit = jnp.where(kid_valid, tree.visit[safe_kids], 0)
    child_value_sum = jnp.where(kid_valid, tree.value_sum[safe_kids], 0.0)
    # child value stored from child's-player perspective; parent wants -Q
    q = jnp.where(
        child_visit > 0, -child_value_sum / jnp.maximum(child_visit, 1), 0.0
    )
    # terminal children have exact value from parent's perspective
    q = jnp.where(
        kid_valid & tree.terminal[safe_kids],
        tree.terminal_value[safe_kids],
        q,
    )
    total = tree.visit[node]
    u = (
        c_puct
        * tree.prior[node]
        * jnp.sqrt(jnp.maximum(total, 1).astype(jnp.float32))
        / (1.0 + child_visit.astype(jnp.float32))
    )
    scores = q + u
    return jnp.where(tree.legal[node], scores, -jnp.inf)


@functools.lru_cache(maxsize=None)
def net_evaluator(net_apply, board_size: int):
    """Leaf evaluator backed by a policy/value network (AlphaZero mode).

    Evaluators map (params, state, key) -> (logits [A], value scalar), value
    from the perspective of the player to move at ``state``.

    Cached per (net_apply, board_size) so the returned closure is a stable
    jit static argument (no spurious recompiles).
    """

    def evaluate(params, state: State, key):
        del key
        obs = observation(state, board_size)[None]
        logits, value = net_apply(params, obs)
        return logits[0], value[0]

    return evaluate


@functools.lru_cache(maxsize=None)
def rollout_evaluator(board_size: int, rollout_count: int = 1):
    """Leaf evaluator backed by uniform random playouts (vanilla MCTS mode —
    the TPU equivalent of OpenSpiel's RandomRolloutEvaluator used by
    ``mcts_example --rollout_count`` in reference README.md:38-40).

    Plays ``rollout_count`` random games to termination with a bounded
    ``while_loop`` over the engine step and averages the outcomes.  Priors
    are uniform (zero logits).
    """
    from twixt_for_open_spiel_tpu.ops.rollout import sample_legal_action

    max_moves = board_size * board_size  # >= remaining game length

    def one_rollout(state: State, key):
        to_move = jnp.clip(state.current_player, 0, 1)

        def cond(carry):
            s, _, i = carry
            return (s.result == geo.RESULT_OPEN) & (i < max_moves)

        def body(carry):
            s, key, i = carry
            key, k = jax.random.split(key)
            a = sample_legal_action(s, k, board_size)
            return step(s, board_size, a), key, i + 1

        final, _, _ = jax.lax.while_loop(cond, body, (state, key, 0))
        res = final.result
        return jnp.where(
            res == geo.RESULT_RED_WIN + to_move,
            1.0,
            jnp.where(res == geo.RESULT_DRAW, 0.0, -1.0),
        )

    def evaluate(params, state: State, key):
        del params
        keys = jax.random.split(key, rollout_count)
        vals = jax.vmap(lambda k: one_rollout(state, k))(keys)
        logits = jnp.zeros((board_size * board_size,), jnp.float32)
        return logits, vals.mean()

    return evaluate


@functools.partial(
    jax.jit, static_argnames=("board_size", "num_simulations", "evaluator")
)
def search(
    params,
    state: State,
    key,
    *,
    evaluator,
    board_size: int,
    num_simulations: int,
    c_puct: float = 1.4,
    dirichlet_alpha: float = 0.3,
    dirichlet_frac: float = 0.25,
):
    """Run MCTS from a (batched) root state.

    All arguments are single-env; wrap with ``jax.vmap`` over (params=None,
    state=0, key=0) for the batched search — network evaluations then batch
    across envs automatically.

    Returns (visit_probs [A], root_value) — the policy target and value
    estimate used by self-play.
    """
    a_dim = board_size * board_size
    nodes = num_simulations + 1
    max_depth = board_size * board_size  # game length bound

    key, k_root, k_noise = jax.random.split(key, 3)
    root_player = jnp.clip(state.current_player, 0, 1)
    root_legal = legal_mask_flat(state, root_player, board_size)
    root_logits, root_value = evaluator(params, state, k_root)
    noise = jax.random.dirichlet(
        k_noise, jnp.full((a_dim,), dirichlet_alpha)
    )
    root_prior = jax.nn.softmax(
        jnp.where(root_legal, root_logits, -1e9)
    )
    root_prior = jnp.where(
        root_legal,
        (1 - dirichlet_frac) * root_prior + dirichlet_frac * noise,
        0.0,
    )
    root_prior = root_prior / jnp.maximum(root_prior.sum(), 1e-9)

    def stack_states(s):
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (nodes,) + x.shape), s
        )

    tree = Tree(
        visit=jnp.zeros((nodes,), jnp.int32).at[0].set(1),
        value_sum=jnp.zeros((nodes,), jnp.float32).at[0].set(root_value),
        prior=jnp.zeros((nodes, a_dim), jnp.float32).at[0].set(root_prior),
        children=jnp.full((nodes, a_dim), NO_NODE),
        parent=jnp.full((nodes,), NO_NODE),
        parent_action=jnp.full((nodes,), NO_NODE),
        legal=jnp.zeros((nodes, a_dim), bool).at[0].set(root_legal),
        terminal=jnp.zeros((nodes,), bool),
        terminal_value=jnp.zeros((nodes,), jnp.float32),
        state=stack_states(state),
    )

    def simulate(sim, tree: Tree):
        new_node = sim + 1  # next free slot

        # --- selection: walk down until hitting a missing child or terminal
        def sel_cond(carry):
            node, action, depth = carry
            kid = tree.children[node, action]
            return (kid >= 0) & ~tree.terminal[kid] & (depth < max_depth)

        def sel_body(carry):
            node, action, depth = carry
            nxt = tree.children[node, action]
            scores = _puct_scores(tree, nxt, c_puct)
            return nxt, jnp.argmax(scores).astype(jnp.int32), depth + 1

        a0 = jnp.argmax(_puct_scores(tree, jnp.int32(0), c_puct)).astype(
            jnp.int32
        )
        leaf_parent, action, _ = jax.lax.while_loop(
            sel_cond, sel_body, (jnp.int32(0), a0, jnp.int32(0))
        )
        existing_kid = tree.children[leaf_parent, action]
        # Re-visiting a terminal child: no expansion, just back its exact
        # value up again (standard treatment of terminal leaves).
        revisit_terminal = existing_kid >= 0

        # --- expansion: step the engine from the parent state
        parent_state = jax.tree_util.tree_map(
            lambda x: x[leaf_parent], tree.state
        )
        child_state = step(parent_state, board_size, action)
        child_terminal = child_state.result != geo.RESULT_OPEN
        # engine returns: +1 win for the mover == player at parent
        parent_player = jnp.clip(parent_state.current_player, 0, 1)
        res = child_state.result
        term_val = jnp.where(
            res == geo.RESULT_RED_WIN + parent_player,
            1.0,
            jnp.where(res == geo.RESULT_DRAW, 0.0, -1.0),
        )
        term_val = jnp.where(child_terminal, term_val, 0.0)

        child_player = jnp.clip(child_state.current_player, 0, 1)
        child_legal = legal_mask_flat(child_state, child_player, board_size)
        logits, value = evaluator(
            params, child_state, jax.random.fold_in(key, sim)
        )
        prior = jax.nn.softmax(jnp.where(child_legal, logits, -1e9))
        # leaf value from the perspective of the player to move at the child;
        # terminal: exact value is from parent's perspective => negate.
        leaf_value = jnp.where(child_terminal, -term_val, value)

        node_id = jnp.where(revisit_terminal, existing_kid, new_node)

        def write_new(tree: Tree) -> Tree:
            new_state = jax.tree_util.tree_map(
                lambda buf, s: buf.at[new_node].set(s),
                tree.state,
                child_state,
            )
            return tree._replace(
                prior=tree.prior.at[new_node].set(prior),
                children=tree.children.at[leaf_parent, action].set(new_node),
                parent=tree.parent.at[new_node].set(leaf_parent),
                parent_action=tree.parent_action.at[new_node].set(action),
                legal=tree.legal.at[new_node].set(child_legal),
                terminal=tree.terminal.at[new_node].set(child_terminal),
                terminal_value=tree.terminal_value.at[new_node].set(term_val),
                state=new_state,
            )

        tree = jax.lax.cond(
            revisit_terminal, lambda t: t, write_new, tree
        )
        backup_value = jnp.where(
            revisit_terminal, -tree.terminal_value[node_id], leaf_value
        )

        # --- backup: value alternates sign walking up
        def back_cond(carry):
            node, _, _ = carry
            return node >= 0

        def back_body(carry):
            node, value, (visit, value_sum) = carry
            visit = visit.at[node].add(1)
            value_sum = value_sum.at[node].add(value)
            return tree.parent[node], -value, (visit, value_sum)

        _, _, (visit, value_sum) = jax.lax.while_loop(
            back_cond,
            back_body,
            (node_id, backup_value, (tree.visit, tree.value_sum)),
        )
        return tree._replace(visit=visit, value_sum=value_sum)

    tree = jax.lax.fori_loop(0, num_simulations, simulate, tree)

    kids = tree.children[0]
    kid_visits = jnp.where(kids >= 0, tree.visit[jnp.maximum(kids, 0)], 0)
    kid_visits = jnp.where(root_legal, kid_visits, 0)
    visit_probs = kid_visits.astype(jnp.float32) / jnp.maximum(
        kid_visits.sum(), 1
    )
    root_q = tree.value_sum[0] / jnp.maximum(tree.visit[0], 1)
    return visit_probs, root_q


def batched_search(params, states, keys, **kw):
    """vmap of :func:`search` over the env batch.

    ``states`` uses the trailing-env-axis layout of ``ops/rollout.py``;
    ``keys`` has the leading batch axis.  Outputs are batch-leading.
    """
    return jax.vmap(
        lambda s, k: search(params, s, k, **kw), in_axes=(-1, 0)
    )(states, keys)
