"""Exact-equivalence pin for the batched PUCT MCTS (models/mcts.py).

A deliberately naive single-tree numpy MCTS (tests/naive_mcts.py) —
pointer-walking node objects, stepping the independent oracle engine
(tests/oracle.py), float32 math mirroring the search's formulas — must
produce EXACTLY the same root visit counts as ``search_batch``'s
array-of-trees program, for every env of a batch of distinct scenarios.

This pins the semantics of the gather-free tensor forms (child-side PUCT
scoring, parent-chain backup walk, masked-prior edge retirement, one-hot
node state select): any future change to those access patterns that alters
the search — not just its speed — breaks integer visit counts here.

Coverage (round-3 broadening per VERDICT):
  * board 5 AND board 8;
  * a uniform evaluator AND a nontrivial fixed-logits evaluator whose value
    depends on the node's move counter (replicated bit-for-bit in numpy);
  * simulation counts that fill the tree, including a late-game scenario
    with fewer legal actions than simulations (terminal-revisit-heavy).

Determinism: dirichlet_frac=0 and deterministic evaluators remove all
randomness; scores are float32 on both sides with identical operation
order, and every tie resolves by the documented rules (unexpanded edges by
lowest action; expanded children by creation order; expanded-vs-unexpanded
ties by lower action index).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.naive_mcts import F, NaiveTree
from tests.oracle import OPEN, OracleGame as Board
from twixt_for_open_spiel_tpu.models.mcts import search_batch
from twixt_for_open_spiel_tpu.ops.bitboard import from_state
from twixt_for_open_spiel_tpu.ops.state import reset
from twixt_for_open_spiel_tpu.ops.step import step


def _make_table(a_dim):
    """Static pseudo-random logits, exactly representable both sides."""
    return (
        ((np.arange(a_dim) * 2654435761) % 97).astype(np.float32)
        / np.float32(24.0)
        - np.float32(2.0)
    )


def _np_value(move_counter):
    """Deterministic 'value net': f32((7*mc mod 11) - 5) / 7."""
    x = np.float32(np.float32(move_counter) * np.float32(7.0))
    x = np.float32(np.mod(x, np.float32(11.0)))
    return np.float32((x - np.float32(5.0)) / np.float32(7.0))


@functools.lru_cache(maxsize=None)
def table_evaluator(a_dim):
    """jit-side twin of (_make_table, _np_value): same f32 ops."""
    tbl = jnp.asarray(_make_table(a_dim))

    def evaluate(params, bs, key):
        del params, key
        b = bs.current_player.shape[-1]
        logits = jnp.broadcast_to(tbl, (b, a_dim))
        mc = bs.move_counter.astype(jnp.float32)
        value = (jnp.mod(mc * 7.0, 11.0) - 5.0) / 7.0
        return logits, value

    return evaluate


@functools.lru_cache(maxsize=None)
def uniform_evaluator(a_dim):
    def evaluate(params, bs, key):
        del params, key
        b = bs.current_player.shape[-1]
        return (
            jnp.zeros((b, a_dim), jnp.float32),
            jnp.zeros((b,), jnp.float32),
        )

    return evaluate


def oracle_eval(a_dim, kind):
    if kind == "uniform":
        zeros = np.zeros(a_dim, np.float32)

        def eval_fn(board):
            return zeros, F(0.0)

    else:
        tbl = _make_table(a_dim)

        def eval_fn(board):
            return tbl, _np_value(board.move_counter)

    return eval_fn


def _first_legal_moves(n, count):
    """Deterministic late-game prefix: always play the lowest legal action."""
    b = Board(n)
    moves = []
    for _ in range(count):
        moves.append(b.legal_actions()[0])
        b.apply(moves[-1])
        assert b.result == OPEN
    return moves


def _scenarios(n):
    """(move-list, name) pairs: distinct non-terminal roots."""
    if n == 5:
        return [
            ([], "empty"),
            ([7], "one-move"),
            ([7, 7], "swapped"),
            ([6, 11, 12, 13, 16], "midgame"),
            ([6, 11, 7, 13, 16, 17, 8], "deeper"),
            (_first_legal_moves(5, 12), "lategame"),
        ]
    return [
        ([], "empty"),
        ([21, 38, 15], "opening"),
        ([19, 19, 30], "swapped"),
        ([21, 38, 15, 11, 27, 17], "midgame"),
    ]


def _run_case(n, sims, net_kind, backup="auto"):
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

    evaluator = (
        uniform_evaluator(a_dim)
        if net_kind == "uniform"
        else table_evaluator(a_dim)
    )
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=-1), *states
    )
    probs, root_q = search_batch(
        None,
        from_state(batch),
        jax.random.PRNGKey(0),
        evaluator=evaluator,
        board_size=n,
        num_simulations=sims,
        dirichlet_frac=0.0,
        backup=backup,
    )
    probs = np.asarray(probs)
    root_q = np.asarray(root_q)

    eval_fn = oracle_eval(a_dim, net_kind)
    for i, ((moves, name), board) in enumerate(zip(_scenarios(n), boards)):
        tree = NaiveTree(board, eval_fn, a_dim, root_prior_mode="puct")
        for _ in range(sims):
            tree.simulate()
        ref_visits = tree.root_visits()
        assert ref_visits.sum() == sims
        got = np.rint(probs[i] * ref_visits.sum()).astype(np.int64)
        np.testing.assert_array_equal(
            got, ref_visits, err_msg=f"scenario {name} (moves={moves})"
        )
        np.testing.assert_allclose(
            root_q[i], tree.root_q(), atol=1e-5, err_msg=f"scenario {name}"
        )


@pytest.mark.parametrize("backup", ["amask", "walk"])
@pytest.mark.parametrize("sims", [8, 25])
def test_search_matches_naive_reference(sims, backup):
    # BOTH backup variants (loop-free ancestor-mask and parent-chain walk)
    # must be integer-exact against the same naive reference.
    _run_case(5, sims, "uniform", backup=backup)


@pytest.mark.parametrize("backup", ["amask", "walk"])
@pytest.mark.parametrize(
    "n,sims",
    [
        (5, 40),   # > remaining legal moves in the lategame scenario:
                   # terminal-revisit-heavy, tree-filling
        (8, 24),
    ],
)
def test_search_matches_naive_reference_table_net(n, sims, backup):
    _run_case(n, sims, "table", backup=backup)


def test_gather_node_state_forms_bit_identical():
    # The two _gather_node_state forms (dense one-hot select-and-reduce
    # below _DENSE_GATHER_MAX_NODES, per-element take_along_axis gather
    # above — the sims-axis mitigation) must produce identical searches:
    # force the gather form at a small tree and pin the whole search
    # output against the dense run.
    from twixt_for_open_spiel_tpu.models import mcts

    def run():
        return _run_case(5, 25, "table", backup="walk")

    run()  # dense (threshold default covers 26 nodes)
    orig = mcts._DENSE_GATHER_MAX_NODES
    try:
        mcts._DENSE_GATHER_MAX_NODES = 0  # force the gather form
        jax.clear_caches()  # the switch is a trace-time static
        run()  # _run_case asserts integer-exact vs the naive reference
    finally:
        mcts._DENSE_GATHER_MAX_NODES = orig
        jax.clear_caches()
