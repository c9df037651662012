"""Exact-equivalence pin for the Gumbel sequential-halving search
(models/mcts.gumbel_search_batch), matching the bar test_mcts_exact.py
sets for the PUCT path.

A naive numpy sequential-halving driver — the shared single-tree reference
(tests/naive_mcts.py) with FORCED root actions, plus a literal numpy
transcription of the candidate/halving/final-pick bookkeeping — must agree
with the batched program on:

  * the chosen action (integer-equal, every env);
  * the improved policy (softmax(logits + sigma(completed Q)));
  * the root value.

Both sides share ``mcts._halving_schedule`` (pure Python over static
ints), and the Gumbel noise is INJECTED (``gumbel_noise=``) so the pin is
deterministic.  Scenario coverage per the round-2 verdict: ``m`` not a
power of two, budgets not divisible by phases x live, an env with fewer
legal actions than ``m`` (candidate padding), and small budgets that force
the schedule clamp.  The schedule builder itself is pinned directly,
including the round-2 failure modes (whole budget spent in phase one;
stranded simulations; a final phase with zero simulations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.naive_mcts import F, NaiveTree
from tests.oracle import OPEN, OracleGame as Board
from tests.test_mcts_exact import (
    _first_legal_moves,
    oracle_eval,
    table_evaluator,
)
from twixt_for_open_spiel_tpu.models.mcts import (
    _halving_schedule,
    gumbel_search_batch,
)
from twixt_for_open_spiel_tpu.ops.bitboard import from_state
from twixt_for_open_spiel_tpu.ops.state import reset
from twixt_for_open_spiel_tpu.ops.step import step

N = 5
A = N * N
C_VISIT = np.float32(50.0)
C_SCALE = np.float32(1.0)


# --- schedule builder pins -------------------------------------------------

def test_halving_schedule_allocations():
    # m clamps until one-visit-per-candidate-per-phase fits; equal shares,
    # remainder to later phases; final phase spends the rest.
    assert _halving_schedule(16, A, 20) == (8, [(8, 1), (4, 1), (2, 4)])
    assert _halving_schedule(64, 576, 64) == (
        32, [(32, 1), (16, 1), (8, 1), (4, 1), (2, 2)]
    )
    # the round-2 advisory case m=16, sims=20 stranded 4 sims; now 0
    m, sched = _halving_schedule(16, A, 20)
    assert sum(live * per for live, per in sched) == 20
    # Danihelka equal-share doubling when the budget divides evenly
    assert _halving_schedule(16, A, 64) == (
        16, [(16, 1), (8, 2), (4, 4), (2, 8)]
    )
    assert _halving_schedule(16, A, 2) == (2, [(2, 1)])
    # m not a power of two: live sequence floors (5 -> 2)
    assert _halving_schedule(5, A, 14) == (5, [(5, 1), (2, 4)])


@pytest.mark.parametrize("sims", [2, 3, 5, 7, 12, 16, 33, 64, 100])
@pytest.mark.parametrize("mc", [2, 5, 16, 64])
def test_halving_schedule_invariants(sims, mc):
    m, sched = _halving_schedule(mc, A, sims)
    assert 2 <= m <= max(2, min(mc, sims))
    lives = [live for live, _ in sched]
    assert lives[0] == m and lives[-1] == 2
    assert all(max(2, a // 2) == b for a, b in zip(lives, lives[1:]))
    assert all(per >= 1 for _, per in sched), "no phase may be skipped"
    spent = sum(live * per for live, per in sched)
    assert spent <= sims
    assert sims - spent <= 1, "at most the final %2 remainder strands"


def test_gumbel_requires_two_sims():
    with pytest.raises(AssertionError):
        _halving_schedule(16, A, 1)


# --- full-search pin -------------------------------------------------------

def _softmax_masked(x, legal):
    p = jax.nn.softmax(jnp.where(jnp.asarray(legal), jnp.asarray(x), -jnp.inf))
    return np.where(legal, np.asarray(p), np.float32(0.0)).astype(np.float32)


def ref_gumbel(board, gumbels, sims, max_considered):
    """Numpy transcription of gumbel_search_batch for one env."""
    eval_fn = oracle_eval(A, "table")
    tree = NaiveTree(board, eval_fn, A, root_prior_mode="plain")
    legal = tree.root.legal
    logits = np.where(legal, tree.root_logits, -np.inf).astype(np.float32)
    base = np.where(
        legal, (gumbels + logits).astype(np.float32), -np.inf
    ).astype(np.float32)

    m, schedule = _halving_schedule(max_considered, A, sims)
    order = np.argsort(-base, kind="stable")  # top_k: ties by lower index
    cand_actions = order[:m].astype(np.int64)
    cand_base = base[cand_actions]
    valid = np.isfinite(cand_base)
    cand_actions = np.where(valid, cand_actions, cand_actions[0])
    cand_base = np.where(valid, cand_base, cand_base[0]).astype(np.float32)

    def root_visits():
        v = np.zeros(A, np.int64)
        for a, kid in tree.root.kids.items():
            v[a] = kid.visit
        return v

    def sigma_scale():
        return np.float32(
            (C_VISIT + np.float32(root_visits().max())) * C_SCALE
        )

    def qhat(actions):
        out = np.zeros(len(actions), np.float32)
        for j, a in enumerate(actions):
            q = tree.child_q(int(a))
            out[j] = tree.root_value if q is None else q
        return out

    for phase_i, (live, per) in enumerate(schedule):
        live_actions = cand_actions[:live]
        for s in range(live * per):
            tree.simulate(forced_root_action=int(live_actions[s % live]))
        if phase_i + 1 < len(schedule):
            score = (
                cand_base[:live] + sigma_scale() * qhat(live_actions)
            ).astype(np.float32)
            keep = schedule[phase_i + 1][0]
            top = np.argsort(-score, kind="stable")[:keep]
            new_actions = live_actions[top]
            new_base = cand_base[:live][top]
            cand_actions = np.concatenate(
                [new_actions, np.full(m - keep, new_actions[0])]
            )
            cand_base = np.concatenate(
                [new_base, np.full(m - keep, new_base[0], np.float32)]
            ).astype(np.float32)

    live_actions = cand_actions[:2]
    sig = sigma_scale()
    final_score = (
        cand_base[:2] + sig * qhat(live_actions)
    ).astype(np.float32)
    action = int(live_actions[int(np.argmax(final_score))])

    visits = root_visits()
    q_completed = np.full(A, tree.root_value, np.float32)
    for a, kid in tree.root.kids.items():
        if kid.visit > 0:
            q_completed[a] = (
                kid.tval if kid.term else F(-kid.vsum) / F(max(kid.visit, 1))
            )
    inner = np.where(legal, tree.root_logits, np.float32(0.0)) + sig * q_completed
    improved = _softmax_masked(inner.astype(np.float32), legal)
    root_q = float(tree.root.vsum) / max(tree.root.visit, 1)
    return action, improved, root_q


def _scenarios():
    return [
        ([], "empty"),
        ([7], "one-move"),
        ([7, 7], "swapped"),
        ([6, 11, 12, 13, 16], "midgame"),
        (_first_legal_moves(5, 12), "lategame-few-legal"),
    ]


@pytest.mark.parametrize("backup", ["amask", "walk"])
@pytest.mark.parametrize(
    "sims,max_considered",
    [
        (16, 16),  # power-of-two m, even split
        (12, 8),   # budget forces the clamp (8 -> 4)
        (20, 5),   # m not a power of two (lives 5 -> 2)
        (7, 16),   # small budget, heavy clamp
    ],
)
def test_gumbel_matches_naive_reference(sims, max_considered, backup):
    states, boards = [], []
    for moves, _name in _scenarios():
        s = reset(N)
        b = Board(N)
        for a in moves:
            s = step(s, N, a)
            b.apply(a)
        assert b.result == OPEN
        states.append(s)
        boards.append(b)
    batch = len(boards)

    rng = np.random.RandomState(1234 + sims * 31 + max_considered)
    gumbels = rng.gumbel(size=(batch, A)).astype(np.float32)

    action, improved, root_q = gumbel_search_batch(
        None,
        from_state(
            jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=-1), *states
            )
        ),
        jax.random.PRNGKey(0),
        evaluator=table_evaluator(A),
        board_size=N,
        num_simulations=sims,
        max_considered=max_considered,
        gumbel_noise=jnp.asarray(gumbels),
        backup=backup,
    )
    action = np.asarray(action)
    improved = np.asarray(improved)
    root_q = np.asarray(root_q)

    for i, (moves, name) in enumerate(_scenarios()):
        ref_a, ref_improved, ref_q = ref_gumbel(
            boards[i], gumbels[i], sims, max_considered
        )
        assert int(action[i]) == ref_a, (
            f"scenario {name} (moves={moves}): action {int(action[i])} "
            f"!= ref {ref_a}"
        )
        np.testing.assert_allclose(
            improved[i], ref_improved, atol=1e-6,
            err_msg=f"scenario {name} improved policy",
        )
        np.testing.assert_allclose(
            root_q[i], ref_q, atol=1e-5, err_msg=f"scenario {name} root_q"
        )
