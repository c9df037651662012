"""Exact-equivalence pin for the batched MCTS (models/mcts.py).

A deliberately naive single-tree numpy MCTS — pointer-walking node objects,
stepping the independent oracle engine (tests/oracle.py), float32 math
mirroring the search's formulas — must produce EXACTLY the same root visit
counts as ``search_batch``'s array-of-trees program, for every env of a
batch of distinct scenarios.

This pins the semantics of the gather-free tensor forms (child-side PUCT
scoring, ancestor-mask backup, masked-prior edge retirement, one-hot node
state select): any future change to those access patterns that alters the
search — not just its speed — breaks integer visit counts here.

Determinism: dirichlet_frac=0 and a constant evaluator (uniform priors,
zero values) remove all randomness; scores are float32 on both sides with
identical operation order, and every tie resolves by the documented rules
(unexpanded edges by lowest action; expanded children by creation order;
expanded-vs-unexpanded ties by lower action index).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import DRAW, OPEN, OracleGame as Board
from twixt_for_open_spiel_tpu.models.mcts import net_evaluator, search_batch
from twixt_for_open_spiel_tpu.ops.bitboard import from_state
from twixt_for_open_spiel_tpu.ops.state import reset
from twixt_for_open_spiel_tpu.ops.step import step

N = 5
A = N * N
C_PUCT = np.float32(1.4)
F = np.float32


def _uniform_net(params, obs):
    b = obs.shape[0]
    a = obs.shape[2] * obs.shape[2]
    return jnp.zeros((b, a), jnp.float32), jnp.zeros((b,), jnp.float32)


def _prior(legal):
    """Mirror search_batch's masked softmax + renormalise in float32."""
    x = np.where(legal, F(0.0), F(-1e9)).astype(np.float32)
    e = np.exp(x - x.max(), dtype=np.float32)
    p = (e / e.sum(dtype=np.float32)).astype(np.float32)
    p = np.where(legal, p, F(0.0)).astype(np.float32)
    return (p / max(p.sum(dtype=np.float32), F(1e-9))).astype(np.float32)


class _RefNode:
    __slots__ = (
        "board", "parent", "pa", "eprior", "visit", "vsum",
        "term", "tval", "prior", "legal", "kids",
    )

    def __init__(self, board, parent, pa, eprior, term, tval):
        self.board = board
        self.parent = parent
        self.pa = pa
        self.eprior = eprior
        self.visit = 0
        self.vsum = F(0.0)
        self.term = term
        self.tval = tval
        legal = np.zeros(A, bool)
        if not term:
            for a in board.legal_actions():
                legal[a] = True
        self.legal = legal
        self.prior = _prior(legal)
        self.kids = {}  # action -> node (in creation order by insertion)


def ref_search(root_board: Board, sims: int):
    """Naive sequential MCTS with the search's exact scoring semantics."""
    nodes = [
        _RefNode(root_board, None, 0, F(0.0), False, F(0.0))
    ]
    root = nodes[0]
    root.visit = 1
    root.vsum = F(0.0)  # uniform net: root value 0

    for _ in range(sims):
        node = root
        while True:
            sq = np.sqrt(np.maximum(F(node.visit), F(1.0)), dtype=np.float32)
            # unexpanded edges: masked prior row
            expanded = np.zeros(A, bool)
            for a in node.kids:
                expanded[a] = True
            up = np.where(node.legal & ~expanded, node.prior, F(-1.0))
            sc_u = np.where(
                up >= 0, (C_PUCT * up).astype(np.float32) * sq, -np.inf
            ).astype(np.float32)
            bu_a = int(np.argmax(sc_u))
            bu_s = sc_u[bu_a]
            # expanded children, creation order; strict > keeps the earliest
            bc_s, bc_kid = -np.inf, None
            for a, kid in node.kids.items():
                q = (
                    kid.tval
                    if kid.term
                    else F(-kid.vsum) / F(max(kid.visit, 1))
                )
                u = (C_PUCT * kid.eprior).astype(np.float32) * sq / (
                    F(1.0) + F(kid.visit)
                )
                s = np.float32(q + u)
                if s > bc_s:
                    bc_s, bc_kid = s, kid
            exp_wins = bc_kid is not None and (
                bc_s > bu_s or (bc_s == bu_s and bc_kid.pa < bu_a)
            )
            if exp_wins and not bc_kid.term:
                node = bc_kid
                continue
            break

        if exp_wins:  # terminal child revisit: back its exact value again
            leaf, value = bc_kid, F(-bc_kid.tval)
        else:
            board2 = copy.deepcopy(node.board)
            parent_player = board2.current
            board2.apply(bu_a)
            term = board2.result != OPEN
            if term:
                if board2.result == 1 + parent_player:
                    tval = F(1.0)
                elif board2.result == DRAW:
                    tval = F(0.0)
                else:
                    tval = F(-1.0)
            else:
                tval = F(0.0)
            leaf = _RefNode(board2, node, bu_a, node.prior[bu_a], term, tval)
            node.kids[bu_a] = leaf
            nodes.append(leaf)
            value = F(-tval) if term else F(0.0)  # uniform net: value 0

        # backup with sign alternation, leaf anchored at +value
        v, p = value, leaf
        while p is not None:
            p.visit += 1
            p.vsum = np.float32(p.vsum + v)
            v = F(-v)
            p = p.parent

    visits = np.zeros(A, np.int64)
    for a, kid in root.kids.items():
        visits[a] = kid.visit
    root_q = float(root.vsum) / max(root.visit, 1)
    return visits, root_q


def _scenarios():
    """(move-list, name) pairs: distinct non-terminal roots on board 5."""
    return [
        ([], "empty"),
        ([7], "one-move"),
        ([7, 7], "swapped"),
        ([6, 11, 12, 13, 16], "midgame"),
        ([6, 11, 7, 13, 16, 17, 8], "deeper"),
    ]


@pytest.mark.parametrize("sims", [8, 25])
def test_search_matches_naive_reference(sims):
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

    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=-1), *states
    )
    probs, root_q = search_batch(
        None,
        from_state(batch),
        jax.random.PRNGKey(0),
        evaluator=net_evaluator(_uniform_net, N),
        board_size=N,
        num_simulations=sims,
        dirichlet_frac=0.0,
    )
    probs = np.asarray(probs)
    root_q = np.asarray(root_q)

    for i, ((moves, name), board) in enumerate(zip(_scenarios(), boards)):
        ref_visits, ref_q = ref_search(board, sims)
        # every sim visits exactly one root child -> counts = probs * sims
        got = np.rint(probs[i] * ref_visits.sum()).astype(np.int64)
        assert ref_visits.sum() == sims
        np.testing.assert_array_equal(
            got, ref_visits, err_msg=f"scenario {name} (moves={moves})"
        )
        np.testing.assert_allclose(
            root_q[i], ref_q, atol=1e-5, err_msg=f"scenario {name}"
        )
