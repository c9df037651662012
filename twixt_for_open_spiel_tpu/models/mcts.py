"""Batched AlphaZero MCTS on the bitboard engine: one array-of-trees search.

The reference is exercised by OpenSpiel's CPU ``mcts_example``
(reference README.md:38-40) — one tree, one thread, pointer-chasing.  The
TPU-native redesign runs ONE search program over the whole env batch
("array of trees"): every tree array carries a leading ``[B]`` axis, every
phase of every simulation is a full-batch tensor op, and the env batch never
leaves the engine's lane-major layout:

  * selection walks all B trees in lockstep (``lax.while_loop`` that ends
    when every env has reached a leaf) — each iteration is a handful of
    ``[B, A]`` gathers + one PUCT argmax, not B scalar loops;
  * expansion steps the BITBOARD engine (ops/bitboard.step_bits) once for
    the whole batch — node states are stored as packed ``BitState`` buffers
    with a leading ``[nodes]`` axis and the env batch still trailing, so the
    expansion step runs at the rollout engine's native throughput;
  * evaluation is one ``[B]``-batch network call on observations emitted
    straight from the bitplanes (ops/observe.bit_observation_nchw);
  * backup walks all B parent chains in lockstep (scatter-adds at
    ``[B]`` node indices per level).

This replaces the round-1 design (vmapped per-env search over canonical
tensor states), whose per-env scalar select/backup loops and per-node
canonical-State storage bounded self-play at ~500 moves/s; see docs/PERF.md.

Simulation count and tree size are static; search never reallocates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.bitboard import (
    BitState,
    bit_legal_mask_flat,
    from_state,
    sample_bits,
    step_bits,
    _hash_u32,
)
from twixt_for_open_spiel_tpu.ops.observe import bit_observation_nchw

NO_NODE = jnp.int32(-1)
_U32 = jnp.uint32


class Tree(NamedTuple):
    """Flat search trees for the whole env batch.

    Stats are batch-leading (``[B, nodes]`` / ``[B, nodes, A]``): tree walks
    gather/scatter along the nodes axis with per-env indices.  Node states
    are three STACKED buffers with a leading ``[nodes]`` axis over the
    engine's batch-trailing layout, so one gather (not one per BitState
    leaf) materialises a per-env node state in the layout ``step_bits``
    eats.

    Access-pattern discipline (measured on v5e, scripts/perf_mcts_ops*.py):
    every per-env dynamic read/write is a single-axis ``take_along_axis`` /
    ``put_along_axis`` (~1 us); coordinate-pair indexing like
    ``arr[arange(B), node]`` or ``.at[arange(B), node].add()`` lowers to a
    general scatter/gather HLO costing ~140-240 us FIXED per op — the whole
    round-1 slowdown (~8.6 ms/sim) was ~50 such ops per simulation.
    """

    visit: jnp.ndarray           # int32 [B, nodes]
    value_sum: jnp.ndarray       # f32 [B, nodes]
    prior: jnp.ndarray           # f32 [B, nodes, A]
    children: jnp.ndarray        # int32 [B, nodes, A] child node id or -1
    parent: jnp.ndarray          # int32 [B, nodes]
    legal: jnp.ndarray           # bool [B, nodes, A]
    terminal: jnp.ndarray        # bool [B, nodes]
    # value of a terminal node from the perspective of the player to move at
    # its PARENT (the player who took parent_action); 0 for non-terminal.
    terminal_value: jnp.ndarray  # f32 [B, nodes]
    planes: jnp.ndarray          # u32 [nodes, 16, P, B] packed bitplanes
    compid: jnp.ndarray          # i16 [nodes, N, N, B]
    scalars: jnp.ndarray         # i32 [nodes, 5, B]


def _rows(arr: jnp.ndarray, node: jnp.ndarray) -> jnp.ndarray:
    """Gather per-env node rows: [B, nodes, ...] x [B] -> [B, ...]."""
    idx = node.reshape(node.shape + (1,) * (arr.ndim - 1))
    return jnp.take_along_axis(arr, idx, axis=1)[:, 0]


def _cell(arr: jnp.ndarray, node: jnp.ndarray) -> jnp.ndarray:
    """Per-env scalar from [B, nodes] at node [B] -> [B] (TAA form)."""
    return jnp.take_along_axis(arr, node[:, None], axis=1)[:, 0]


def _cell_add(arr, node, delta):
    """arr[b, node[b]] += delta[b] without a coordinate scatter: per-env the
    node index is unique, so gather-modify-put is exact."""
    idx = node[:, None]
    cur = jnp.take_along_axis(arr, idx, axis=1)
    return jnp.put_along_axis(
        arr, idx, cur + delta[:, None], axis=1, inplace=False
    )


def _row_set_cell(arr, node, action, value):
    """arr[b, node[b], action[b]] = value[b] via row gather + row write."""
    b, _, a_dim = arr.shape
    nidx = node[:, None, None]
    row = jnp.take_along_axis(arr, nidx, axis=1)          # [B, 1, A]
    row = jnp.put_along_axis(
        row, action[:, None, None], value[:, None, None], axis=2,
        inplace=False,
    )
    return jnp.put_along_axis(
        arr, jnp.broadcast_to(nidx, (b, 1, a_dim)), row, axis=1,
        inplace=False,
    )


# --- stacked node-state buffers <-> BitState ------------------------------
# plane order: red, blue, links[0..3], blocked[0..3], legal[0..1], flags[0..3]

def _stack_planes(bs: BitState) -> jnp.ndarray:
    return jnp.stack(
        (bs.red, bs.blue) + bs.links + bs.blocked + bs.legal + bs.flags
    )


def _stack_scalars(bs: BitState) -> jnp.ndarray:
    return jnp.stack(
        [
            bs.current_player,
            bs.move_counter,
            bs.move_one,
            bs.swapped.astype(jnp.int32),
            bs.result,
        ]
    )


def _unstack_bitstate(planes, compid, scalars) -> BitState:
    return BitState(
        red=planes[0],
        blue=planes[1],
        links=tuple(planes[2 + i] for i in range(4)),
        blocked=tuple(planes[6 + i] for i in range(4)),
        legal=(planes[10], planes[11]),
        flags=tuple(planes[12 + i] for i in range(4)),
        compid=compid,
        current_player=scalars[0],
        move_counter=scalars[1],
        move_one=scalars[2],
        swapped=scalars[3].astype(bool),
        result=scalars[4],
    )


def _gather_node_state(tree: Tree, node: jnp.ndarray) -> BitState:
    """Per-env node state: three gathers over the stacked buffers."""

    def leaf(buf):
        idx = node.reshape((1,) * (buf.ndim - 1) + node.shape)
        return jnp.take_along_axis(buf, idx, axis=0)[0]

    return _unstack_bitstate(
        leaf(tree.planes), leaf(tree.compid), leaf(tree.scalars)
    )


def _set_node_state(tree: Tree, node, bs: BitState) -> Tree:
    """Write one node slot (uniform traced index): three DUS writes."""
    zeros = (0,) * 3
    return tree._replace(
        planes=jax.lax.dynamic_update_slice(
            tree.planes, _stack_planes(bs)[None], (node,) + zeros
        ),
        compid=jax.lax.dynamic_update_slice(
            tree.compid, bs.compid[None], (node,) + zeros
        ),
        scalars=jax.lax.dynamic_update_slice(
            tree.scalars, _stack_scalars(bs)[None], (node,) + (0, 0)
        ),
    )


def _puct_scores(tree: Tree, node: jnp.ndarray, c_puct) -> jnp.ndarray:
    """PUCT score of every action at each env's ``node`` ([B] -> [B, A])."""
    kids = _rows(tree.children, node)                       # [B, A]
    kid_valid = kids >= 0
    safe = jnp.maximum(kids, 0)
    child_visit = jnp.where(
        kid_valid, jnp.take_along_axis(tree.visit, safe, axis=1), 0
    )
    child_vsum = jnp.where(
        kid_valid, jnp.take_along_axis(tree.value_sum, safe, axis=1), 0.0
    )
    # child value stored from child's-player perspective; parent wants -Q
    q = jnp.where(
        child_visit > 0, -child_vsum / jnp.maximum(child_visit, 1), 0.0
    )
    # terminal children have exact value from parent's perspective
    q = jnp.where(
        kid_valid & jnp.take_along_axis(tree.terminal, safe, axis=1),
        jnp.take_along_axis(tree.terminal_value, safe, axis=1),
        q,
    )
    total = _rows(tree.visit, node)                          # [B]
    u = (
        c_puct
        * _rows(tree.prior, node)
        * jnp.sqrt(jnp.maximum(total, 1).astype(jnp.float32))[:, None]
        / (1.0 + child_visit.astype(jnp.float32))
    )
    return jnp.where(_rows(tree.legal, node), q + u, -jnp.inf)


@functools.lru_cache(maxsize=None)
def net_evaluator(net_apply, board_size: int):
    """Batched leaf evaluator backed by a policy/value network.

    Evaluators map (params, bitstate [.., B], key) -> (logits [B, A],
    value [B]), value from the perspective of the player to move.

    Cached per (net_apply, board_size) so the returned closure is a stable
    jit static argument (no spurious recompiles).
    """

    def evaluate(params, bs: BitState, key):
        del key
        obs = bit_observation_nchw(bs, board_size)
        return net_apply(params, obs)

    return evaluate


@functools.lru_cache(maxsize=None)
def rollout_evaluator(board_size: int, rollout_count: int = 1):
    """Batched leaf evaluator backed by uniform random playouts (vanilla
    MCTS mode — the TPU equivalent of OpenSpiel's RandomRolloutEvaluator
    used by ``mcts_example --rollout_count``, reference README.md:38-40).

    Plays ``rollout_count`` lockstep random games to termination on the
    bitboard engine and averages the outcomes.  Priors are uniform (zero
    logits).
    """
    n = board_size
    max_moves = n * n  # >= remaining game length (MaxGameLength = n*n-3)

    def one_rollout(bs: BitState, seed):
        to_move = jnp.clip(bs.current_player, 0, 1)
        nenv = bs.current_player.shape[-1]
        env = jnp.arange(nenv, dtype=_U32)

        def cond(carry):
            s, i = carry
            return jnp.any(s.result == geo.RESULT_OPEN) & (i < max_moves)

        def body(carry):
            s, i = carry
            open_ = s.result == geo.RESULT_OPEN
            noise = _hash_u32(
                seed + _U32(2654435761) * (i.astype(_U32) + _U32(1))
            ) + env * _U32(0x9E3779B9)
            a = sample_bits(s, n, noise)
            nxt = step_bits(s, n, a)
            # freeze finished envs (their sampled action is garbage)
            s = jax.tree_util.tree_map(
                lambda new, old: jnp.where(open_, new, old), nxt, s
            )
            return s, i + 1

        final, _ = jax.lax.while_loop(cond, body, (bs, jnp.int32(0)))
        res = final.result
        return jnp.where(
            res == geo.RESULT_RED_WIN + to_move,
            1.0,
            jnp.where(res == geo.RESULT_DRAW, 0.0, -1.0),
        )

    def evaluate(params, bs: BitState, key):
        del params
        total = jnp.zeros(bs.current_player.shape, jnp.float32)
        for r in range(rollout_count):
            seed = jax.random.bits(
                jax.random.fold_in(key, r), dtype=jnp.uint32
            )
            total = total + one_rollout(bs, seed)
        nenv = bs.current_player.shape[-1]
        logits = jnp.zeros((nenv, n * n), jnp.float32)
        return logits, total / rollout_count

    return evaluate


@functools.partial(
    jax.jit,
    static_argnames=(
        "board_size", "num_simulations", "evaluator", "return_stats"
    ),
)
def search_batch(
    params,
    bs: BitState,
    key,
    *,
    evaluator,
    board_size: int,
    num_simulations: int,
    c_puct: float = 1.4,
    dirichlet_alpha: float = 0.3,
    dirichlet_frac: float = 0.25,
    return_stats: bool = False,
):
    """Run MCTS from a batch of root BitStates (batch-trailing, 1-D batch).

    Roots must be non-terminal (self-play's auto-reset guarantees it).
    Returns (visit_probs [B, A], root_value [B]) — the policy targets and
    value estimates self-play consumes.  With ``return_stats`` (a separate
    compile) additionally returns diagnostic counters
    ``{"sel_iters", "backup_iters"}``: the lockstep selection/backup loops
    run until the DEEPEST env finishes, so total iterations — not
    simulation count — set the tree-walk cost.
    """
    a_dim = board_size * board_size
    nodes = num_simulations + 1
    batch = bs.current_player.shape[-1]
    assert bs.current_player.ndim == 1, "search_batch wants a 1-D env batch"
    key, k_root, k_noise = jax.random.split(key, 3)
    root_player = jnp.clip(bs.current_player, 0, 1)
    root_legal = jnp.moveaxis(
        bit_legal_mask_flat(bs, root_player, board_size), 0, -1
    )  # [B, A]
    root_logits, root_value = evaluator(params, bs, k_root)
    noise = jax.random.dirichlet(
        k_noise, jnp.full((a_dim,), dirichlet_alpha), shape=(batch,)
    )
    root_prior = jax.nn.softmax(
        jnp.where(root_legal, root_logits, -1e9), axis=-1
    )
    root_prior = jnp.where(
        root_legal,
        (1 - dirichlet_frac) * root_prior + dirichlet_frac * noise,
        0.0,
    )
    root_prior = root_prior / jnp.maximum(
        root_prior.sum(-1, keepdims=True), 1e-9
    )

    def alloc(x):
        return jnp.broadcast_to(x[None], (nodes,) + x.shape)

    tree = Tree(
        visit=jnp.zeros((batch, nodes), jnp.int32).at[:, 0].set(1),
        value_sum=jnp.zeros((batch, nodes), jnp.float32)
        .at[:, 0]
        .set(root_value),
        prior=jnp.zeros((batch, nodes, a_dim), jnp.float32)
        .at[:, 0]
        .set(root_prior),
        children=jnp.full((batch, nodes, a_dim), NO_NODE),
        parent=jnp.full((batch, nodes), NO_NODE),
        legal=jnp.zeros((batch, nodes, a_dim), bool).at[:, 0].set(root_legal),
        terminal=jnp.zeros((batch, nodes), bool),
        terminal_value=jnp.zeros((batch, nodes), jnp.float32),
        planes=alloc(_stack_planes(bs)),
        compid=alloc(bs.compid),
        scalars=alloc(_stack_scalars(bs)),
    )

    def simulate(sim, carry):
        tree, sel_ct, back_ct = carry
        new_node = sim + 1  # next free slot (uniform across the batch)

        # --- selection: all envs walk down in lockstep until each hits a
        # missing or terminal child ([B] node/action carried per env)
        def sel_cond(carry):
            _, _, can, _ = carry
            return jnp.any(can)

        def sel_body(carry):
            node, action, can, ct = carry
            kid = _cell(_rows(tree.children, node), action)        # [B]
            safe_kid = jnp.maximum(kid, 0)
            descend = can & (kid >= 0) & ~_cell(tree.terminal, safe_kid)
            node = jnp.where(descend, safe_kid, node)
            scores = _puct_scores(tree, node, c_puct)              # [B, A]
            action = jnp.where(
                descend, jnp.argmax(scores, -1).astype(jnp.int32), action
            )
            return node, action, descend, ct + 1

        node0 = jnp.zeros((batch,), jnp.int32)
        a0 = jnp.argmax(_puct_scores(tree, node0, c_puct), -1).astype(
            jnp.int32
        )
        leaf_parent, action, _, sel_ct = jax.lax.while_loop(
            sel_cond, sel_body,
            (node0, a0, jnp.ones((batch,), bool), sel_ct),
        )
        existing_kid = _cell(_rows(tree.children, leaf_parent), action)
        # An existing child here is necessarily terminal (selection only
        # stops on missing or terminal children): no expansion, just back
        # its exact value up again.
        revisit = existing_kid >= 0

        # --- expansion: one batched bitboard step from the parent states
        parent_state = _gather_node_state(tree, leaf_parent)
        child_state = step_bits(parent_state, board_size, action)
        child_terminal = child_state.result != geo.RESULT_OPEN
        parent_player = jnp.clip(parent_state.current_player, 0, 1)
        res = child_state.result
        term_val = jnp.where(
            res == geo.RESULT_RED_WIN + parent_player,
            1.0,
            jnp.where(res == geo.RESULT_DRAW, 0.0, -1.0),
        )
        term_val = jnp.where(child_terminal, term_val, 0.0)

        child_player = jnp.clip(child_state.current_player, 0, 1)
        child_legal = jnp.moveaxis(
            bit_legal_mask_flat(child_state, child_player, board_size), 0, -1
        )
        logits, value = evaluator(
            params, child_state, jax.random.fold_in(key, sim)
        )
        prior = jax.nn.softmax(
            jnp.where(child_legal, logits, -1e9), axis=-1
        )
        # leaf value from the perspective of the player to move at the
        # child; terminal: exact value is from parent's perspective, negate.
        backup_value = jnp.where(child_terminal, -term_val, value)

        node_id = jnp.where(revisit, existing_kid, jnp.int32(new_node))

        # Write the new node unconditionally at slot new_node (for revisit
        # envs the slot holds unlinked garbage — children[leaf_parent,
        # action] keeps pointing at the existing terminal child).
        tree = tree._replace(
            prior=tree.prior.at[:, new_node].set(prior),
            children=_row_set_cell(
                tree.children, leaf_parent, action, node_id
            ),
            parent=tree.parent.at[:, new_node].set(leaf_parent),
            legal=tree.legal.at[:, new_node].set(child_legal),
            terminal=tree.terminal.at[:, new_node].set(child_terminal),
            terminal_value=tree.terminal_value.at[:, new_node].set(term_val),
        )
        tree = _set_node_state(tree, new_node, child_state)

        # --- backup: all envs walk their parent chains in lockstep,
        # sign-flipping the value each level (two-player zero-sum)
        def back_cond(carry):
            node, _, _, _, _ = carry
            return jnp.any(node >= 0)

        def back_body(carry):
            node, val, visit, vsum, ct = carry
            active = node >= 0
            safe = jnp.maximum(node, 0)
            visit = _cell_add(visit, safe, active.astype(jnp.int32))
            vsum = _cell_add(vsum, safe, jnp.where(active, val, 0.0))
            node = jnp.where(active, _cell(tree.parent, safe), NO_NODE)
            return node, -val, visit, vsum, ct + 1

        _, _, visit, vsum, back_ct = jax.lax.while_loop(
            back_cond,
            back_body,
            (node_id, backup_value, tree.visit, tree.value_sum, back_ct),
        )
        return tree._replace(visit=visit, value_sum=vsum), sel_ct, back_ct

    tree, sel_ct, back_ct = jax.lax.fori_loop(
        0, num_simulations, simulate, (tree, jnp.int32(0), jnp.int32(0))
    )

    kids = tree.children[:, 0]                                    # [B, A]
    kid_visits = jnp.where(
        kids >= 0,
        jnp.take_along_axis(tree.visit, jnp.maximum(kids, 0), axis=1),
        0,
    )
    kid_visits = jnp.where(root_legal, kid_visits, 0)
    visit_probs = kid_visits.astype(jnp.float32) / jnp.maximum(
        kid_visits.sum(-1, keepdims=True), 1
    ).astype(jnp.float32)
    root_q = tree.value_sum[:, 0] / jnp.maximum(
        tree.visit[:, 0], 1
    ).astype(jnp.float32)
    if return_stats:
        return visit_probs, root_q, {
            "sel_iters": sel_ct, "backup_iters": back_ct
        }
    return visit_probs, root_q


def batched_search(params, states, key, **kw):
    """Search from canonical tensor states (ops/state.State, trailing env
    batch): packs to BitState and runs :func:`search_batch`.

    Convenience wrapper for hosts that live in the canonical representation
    (examples/mcts_example.py); the self-play stack stays in BitState and
    calls :func:`search_batch` directly.
    """
    return search_batch(params, from_state(states), key, **kw)
