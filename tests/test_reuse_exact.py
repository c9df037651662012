"""Exact-equivalence pin for TREE REUSE (models/mcts.search_batch_reuse).

Multi-move sequences: at every move the batched reuse search must produce
EXACTLY the naive reference's root visit counts, where the naive side
implements the same reuse rule (tests/naive_mcts.NaiveTree.reroot):
re-root on the played action keeping the surviving subtree's stats, renoise
the new root's prior with the fresh-root mix formula, fall back to a cold
root when the action has no child / the env auto-reset / the subtree
exceeds the survivor cap.

Deterministic throughout (dirichlet_frac=0, deterministic evaluators); the
played action alternates between the visit argmax (exercises reuse of the
most-visited subtree) and the lowest zero-visit legal action (exercises the
no-child cold-start path).  Games that end mid-sequence auto-reset —
exercising the ``was_done`` fallback.  A small-cap case forces the
subtree-overflow fallback.  Both backup variants run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.naive_mcts import NaiveTree
from tests.oracle import OPEN, OracleGame as Board
from tests.test_mcts_exact import (
    oracle_eval,
    table_evaluator,
    uniform_evaluator,
    _scenarios,
)
from twixt_for_open_spiel_tpu.models.mcts import (
    init_reuse_tree,
    search_batch_reuse,
)
from twixt_for_open_spiel_tpu.ops.bitboard import (
    bit_step_auto_reset,
    from_state,
)
from twixt_for_open_spiel_tpu.ops.state import reset
from twixt_for_open_spiel_tpu.ops.step import step


def _run_reuse_case(n, sims, cap, n_moves, net_kind, backup):
    a_dim = n * n
    states, boards = [], []
    for moves, _name in _scenarios(n):
        s = reset(n)
        b = Board(n)
        for a in moves:
            s = step(s, n, a)
            b.apply(a)
        assert b.result == OPEN
        states.append(s)
        boards.append(b)
    nb = len(boards)

    evaluator = (
        uniform_evaluator(a_dim)
        if net_kind == "uniform"
        else table_evaluator(a_dim)
    )
    eval_fn = oracle_eval(a_dim, net_kind)
    bs = from_state(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=-1), *states)
    )
    tree = init_reuse_tree(
        bs, board_size=n, num_simulations=sims, reuse_cap=cap, backup=backup
    )
    played = jnp.full((nb,), -1, jnp.int32)
    done = jnp.ones((nb,), bool)

    naive = [None] * nb
    fresh_needed = [True] * nb
    reuse_events = 0
    fresh_events = 0
    for move in range(n_moves):
        probs, root_q, tree = search_batch_reuse(
            None,
            bs,
            jax.random.PRNGKey(move),
            tree,
            played,
            done,
            evaluator=evaluator,
            board_size=n,
            num_simulations=sims,
            reuse_cap=cap,
            dirichlet_frac=0.0,
            backup=backup,
        )
        probs_np = np.asarray(probs)
        root_q_np = np.asarray(root_q)

        actions = np.zeros(nb, np.int64)
        for i in range(nb):
            if fresh_needed[i]:
                naive[i] = NaiveTree(
                    boards[i], eval_fn, a_dim, root_prior_mode="puct"
                )
                fresh_needed[i] = False
            for _ in range(sims):
                naive[i].simulate()
            ref_visits = naive[i].root_visits()
            total = ref_visits.sum()
            got = np.rint(probs_np[i] * total).astype(np.int64)
            np.testing.assert_array_equal(
                got, ref_visits,
                err_msg=f"move {move} env {i} (backup={backup})",
            )
            np.testing.assert_allclose(
                root_q_np[i], naive[i].root_q(), atol=1e-5,
                err_msg=f"move {move} env {i} root_q",
            )
            if move % 3 == 2:
                # lowest legal action with zero visits, if any: exercises
                # the no-child cold-start path
                zero = np.flatnonzero(
                    naive[i].root.legal & (ref_visits == 0)
                )
                actions[i] = (
                    zero[0] if zero.size else int(np.argmax(ref_visits))
                )
            else:
                actions[i] = int(np.argmax(ref_visits))

        acts = jnp.asarray(actions, jnp.int32)
        bs, done, _res = bit_step_auto_reset(bs, acts, n)
        done_np = np.asarray(done)
        for i in range(nb):
            a = int(actions[i])
            boards[i].apply(a)
            if boards[i].result != OPEN:
                assert done_np[i]
                boards[i] = Board(n)
                fresh_needed[i] = True
                fresh_events += 1
            else:
                assert not done_np[i]
                if naive[i].reroot(a, cap, frac=0.0):
                    reuse_events += 1
                else:
                    fresh_needed[i] = True
                    fresh_events += 1
        played = acts

    # the sequence must actually exercise reuse (and, when the cap is
    # tight, the fallback) or the pin proves nothing
    assert reuse_events > 0, "no move ever reused its tree"
    return reuse_events, fresh_events


@pytest.mark.parametrize("backup", ["amask", "walk"])
def test_reuse_matches_naive_reference(backup):
    reused, fresh = _run_reuse_case(
        5, sims=12, cap=13, n_moves=7, net_kind="table", backup=backup
    )
    assert reused >= 3


@pytest.mark.parametrize("backup", ["amask", "walk"])
def test_reuse_matches_naive_reference_tight_cap(backup):
    # cap smaller than the budget: the subtree-overflow fallback must fire
    # on some moves and stay exact on the rest
    reused, fresh = _run_reuse_case(
        5, sims=12, cap=6, n_moves=6, net_kind="uniform", backup=backup
    )
    assert fresh > 0


def test_reuse_first_call_matches_cold_search():
    # with no tree to reuse, search_batch_reuse must equal search_batch
    # integer-exact (same init, same walk, different slot numbering only)
    from twixt_for_open_spiel_tpu.models.mcts import search_batch

    n, sims = 5, 16
    a_dim = n * n
    states = []
    for moves, _name in _scenarios(n):
        s = reset(n)
        for a in moves:
            s = step(s, n, a)
        states.append(s)
    bs = from_state(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=-1), *states)
    )
    nb = len(states)
    evaluator = table_evaluator(a_dim)
    p1, q1 = search_batch(
        None, bs, jax.random.PRNGKey(0),
        evaluator=evaluator, board_size=n, num_simulations=sims,
        dirichlet_frac=0.0,
    )
    tree = init_reuse_tree(bs, board_size=n, num_simulations=sims)
    p2, q2, _ = search_batch_reuse(
        None, bs, jax.random.PRNGKey(0), tree,
        jnp.full((nb,), -1, jnp.int32), jnp.ones((nb,), bool),
        evaluator=evaluator, board_size=n, num_simulations=sims,
        dirichlet_frac=0.0,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
