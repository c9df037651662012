"""Naive single-tree numpy MCTS mirroring models/mcts.py semantics.

Shared reference implementation for the exactness pins
(tests/test_mcts_exact.py, tests/test_gumbel_exact.py): pointer-walking
node objects stepping the independent oracle engine (tests/oracle.py),
float32 math with the search's exact formulas and tie rules.  Generalised
over the round-2 version in two ways the pins need:

  * an arbitrary deterministic EVALUATOR ``eval_fn(board) -> (logits[A]
    float32, value float32)`` (uniform nets, fixed logit tables, ...);
  * an optional FORCED ROOT ACTION per simulation — the root-entry hook of
    ``_make_simulate`` that Gumbel sequential halving uses.

Prior computation intentionally routes through ``jax.nn.softmax`` on CPU
(same masked input, same float32 row) rather than re-deriving the
reduction order in numpy: the object under test is the array-of-trees
TREE program, not XLA's softmax.
"""

from __future__ import annotations

import copy

import numpy as np

from tests.oracle import DRAW, OPEN

F = np.float32


def node_prior(logits, legal):
    """Plain masked softmax — the search's non-root (and Gumbel-root)
    prior: ``softmax(where(legal, logits, -1e9))``."""
    import jax
    import jax.numpy as jnp

    x = jnp.where(
        jnp.asarray(legal), jnp.asarray(logits, jnp.float32), F(-1e9)
    )
    return np.asarray(jax.nn.softmax(x)).astype(np.float32)


def root_prior_puct(logits, legal):
    """search_batch's dirichlet_frac=0 root prior: masked softmax, zero
    the illegal tail, renormalise."""
    p = node_prior(logits, legal)
    p = np.where(legal, p, F(0.0)).astype(np.float32)
    return (p / max(p.sum(dtype=np.float32), F(1e-9))).astype(np.float32)


class Node:
    __slots__ = (
        "board", "parent", "pa", "eprior", "visit", "vsum",
        "term", "tval", "prior", "legal", "kids",
    )

    def __init__(self, board, parent, pa, eprior, term, tval, a_dim,
                 prior=None):
        self.board = board
        self.parent = parent
        self.pa = pa
        self.eprior = eprior
        self.visit = 0
        self.vsum = F(0.0)
        self.term = term
        self.tval = tval
        legal = np.zeros(a_dim, bool)
        if not term:
            for a in board.legal_actions():
                legal[a] = True
        self.legal = legal
        self.prior = (
            prior if prior is not None else np.zeros(a_dim, np.float32)
        )
        self.kids = {}  # action -> node (creation order by insertion)


class NaiveTree:
    """One tree; drives the oracle board with models/mcts.py's semantics."""

    def __init__(self, root_board, eval_fn, a_dim, c_puct=1.4,
                 root_prior_mode="puct"):
        self.eval_fn = eval_fn
        self.a_dim = a_dim
        self.c_puct = F(c_puct)
        root_logits, root_value = eval_fn(root_board)
        self.root_logits = np.asarray(root_logits, np.float32)
        self.root_value = F(root_value)
        root = Node(root_board, None, 0, F(0.0), False, F(0.0), a_dim)
        prior_fn = (
            root_prior_puct if root_prior_mode == "puct" else node_prior
        )
        root.prior = prior_fn(self.root_logits, root.legal)
        root.visit = 1
        root.vsum = self.root_value
        self.root = root
        self.created = [root]  # creation order (slot order in the batch)

    def best_edge(self, node):
        """(action, kid_or_None, kid_term) with the search's tie rules."""
        sq = np.sqrt(np.maximum(F(node.visit), F(1.0)), dtype=np.float32)
        expanded = np.zeros(self.a_dim, bool)
        for a in node.kids:
            expanded[a] = True
        up = np.where(node.legal & ~expanded, node.prior, F(-1.0))
        sc_u = np.where(
            up >= 0, (self.c_puct * up).astype(np.float32) * sq, -np.inf
        ).astype(np.float32)
        bu_a = int(np.argmax(sc_u))
        bu_s = sc_u[bu_a]
        bc_s, bc_kid = -np.inf, None
        for a, kid in node.kids.items():  # creation order; strict >
            q = (
                kid.tval
                if kid.term
                else F(-kid.vsum) / F(max(kid.visit, 1))
            )
            u = (self.c_puct * kid.eprior).astype(np.float32) * sq / (
                F(1.0) + F(kid.visit)
            )
            s = np.float32(q + u)
            if s > bc_s:
                bc_s, bc_kid = s, kid
        exp_wins = bc_kid is not None and (
            bc_s > bu_s or (bc_s == bu_s and bc_kid.pa < bu_a)
        )
        if exp_wins:
            return bc_kid.pa, bc_kid, bc_kid.term
        return bu_a, None, False

    def simulate(self, forced_root_action=None):
        """One simulation: selection -> expansion/revisit -> backup."""
        node = self.root
        if forced_root_action is not None:
            a_star = int(forced_root_action)
            kid_star = self.root.kids.get(a_star)
            kid_term = kid_star.term if kid_star is not None else False
        else:
            a_star, kid_star, kid_term = self.best_edge(node)
        while kid_star is not None and not kid_term:
            node = kid_star
            a_star, kid_star, kid_term = self.best_edge(node)

        if kid_star is not None:  # terminal child revisit
            leaf, value = kid_star, F(-kid_star.tval)
        else:
            board2 = copy.deepcopy(node.board)
            parent_player = board2.current
            board2.apply(a_star)
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
            leaf = Node(
                board2, node, a_star, node.prior[a_star], term, tval,
                self.a_dim,
            )
            if term:
                value = F(-tval)
            else:
                logits, v = self.eval_fn(board2)
                leaf.prior = node_prior(
                    np.asarray(logits, np.float32), leaf.legal
                )
                value = F(v)
            node.kids[a_star] = leaf
            self.created.append(leaf)

        v, p = value, leaf
        while p is not None:
            p.visit += 1
            p.vsum = np.float32(p.vsum + v)
            v = F(-v)
            p = p.parent

    def reroot(self, action, cap, noise=None, frac=0.0):
        """Re-root on the played action (models/mcts.search_batch_reuse's
        rule).  Returns True when the subtree was kept; False means the
        caller must cold-start a fresh tree (no child for the action, a
        terminal child, or more than ``cap`` surviving nodes).

        The new root's prior is re-mixed with the SAME formula a fresh
        root gets: assemble the full prior vector (unexpanded edges from
        the node's prior, expanded edges from their stored edge priors),
        mix ``(1-frac)*p + frac*noise`` over legal, renormalise (via jnp
        on CPU: the f32 ops must mirror the batched program bit-for-bit),
        and write the result back to both the prior row and the root
        children's edge priors.
        """
        import jax.numpy as jnp

        kid = self.root.kids.get(int(action))
        if kid is None or kid.term:
            return False
        subtree = set()
        stack = [kid]
        while stack:
            n = stack.pop()
            subtree.add(id(n))
            stack.extend(n.kids.values())
        if len(subtree) > cap:
            return False

        p_full = np.zeros(self.a_dim, np.float32)
        for a in range(self.a_dim):
            if a in kid.kids:
                p_full[a] = kid.kids[a].eprior
            elif kid.legal[a]:
                p_full[a] = kid.prior[a]
        if noise is None:
            noise = np.zeros(self.a_dim, np.float32)
        legal = jnp.asarray(kid.legal)
        mixed = jnp.where(
            legal,
            (F(1.0) - F(frac)) * jnp.asarray(p_full)
            + F(frac) * jnp.asarray(noise, jnp.float32),
            F(0.0),
        )
        renorm = np.asarray(
            mixed / jnp.maximum(mixed.sum(), F(1e-9))
        ).astype(np.float32)
        kid.prior = renorm
        for c in kid.kids.values():
            c.eprior = renorm[c.pa]
        kid.parent = None
        self.root = kid
        self.created = [kid] + [
            n for n in self.created if id(n) in subtree and n is not kid
        ]
        return True

    def root_visits(self):
        visits = np.zeros(self.a_dim, np.int64)
        for a, kid in self.root.kids.items():
            visits[a] = kid.visit
        return visits

    def root_q(self):
        return float(self.root.vsum) / max(self.root.visit, 1)

    def child_q(self, action):
        """Root-edge Q from the root's perspective; None if unexpanded."""
        kid = self.root.kids.get(int(action))
        if kid is None:
            return None
        if kid.term:
            return kid.tval
        return F(-kid.vsum) / F(max(kid.visit, 1))
