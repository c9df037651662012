#!/usr/bin/env python
"""Micro-benchmark the tree-op primitives of the batched MCTS search.

The round-2 rewrite (models/mcts.py) is bounded by tree machinery
(~8.6 ms/sim at B=512, nodes=65, A=144 on one v5e chip, vs ~0.27 ms/sim of
real work).  This script times each primitive access pattern the search
uses, and its dense (one-hot contraction) replacement, to decide the
redesign.  Run on the real chip:

    python scripts/perf_mcts_ops.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

B, NODES, A = 512, 65, 144
P, N = 14, 12            # BitState plane word-count / board for n=12
REPS = 200               # fori_loop iterations inside one jit


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    del out
    return dt / REPS * 1e6  # us per op


def loop(body):
    """jit a REPS-iteration fori_loop over body(i, carry)->carry."""

    @jax.jit
    def run(*args):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(i, *args, c), 0.0)

    return run


def main():
    print(f"backend={jax.default_backend()}  B={B} nodes={NODES} A={A}  "
          f"({REPS} reps inside one jit)")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    visit = jax.random.randint(k1, (B, NODES), 0, 100, jnp.int32)
    prior = jax.random.uniform(k2, (B, NODES, A), jnp.float32)
    node = jax.random.randint(k3, (B,), 0, NODES, jnp.int32)
    kids = jax.random.randint(k4, (B, A), 0, NODES, jnp.int32)
    action = jax.random.randint(k1, (B,), 0, A, jnp.int32)
    b_idx = jnp.arange(B)
    # BitState-like node buffer: 16 u32 planes + compid i16
    planes = jax.random.randint(
        k2, (NODES, 16, P, B), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    compid = jax.random.randint(k3, (NODES, N, N, B), 0, 200, jnp.int16)

    rows = []

    def rec(name, us):
        rows.append((name, us))
        print(f"  {name:<52s} {us:9.1f} us")

    # 1. element gather: child stats [B,A] from [B,nodes] at kids[B,A]
    def g_elem(i, visit, kids, acc):
        v = jnp.take_along_axis(visit, (kids + i) % NODES, axis=1)
        return acc + v.sum().astype(jnp.float32)

    rec("elem-gather   [B,A] <- [B,nodes] @ kids[B,A]",
        timeit(loop(g_elem), visit, kids))

    # 1b. dense replacement: onehot(kids) batched matmul
    def g_elem_oh(i, visit, kids, acc):
        oh = ((kids + i) % NODES)[:, :, None] == jnp.arange(NODES)[None, None]
        v = jnp.einsum(
            "ban,bn->ba", oh.astype(jnp.float32),
            visit.astype(jnp.float32),
        )
        return acc + v.sum()

    rec("elem-gather dense onehot einsum", timeit(loop(g_elem_oh), visit, kids))

    # 2. row gather: [B,A] from [B,nodes,A] at node[B]
    def g_row(i, prior, node, acc):
        idx = ((node + i) % NODES)[:, None, None]
        v = jnp.take_along_axis(prior, idx, axis=1)[:, 0]
        return acc + v.sum()

    rec("row-gather    [B,A] <- [B,nodes,A] @ node[B]",
        timeit(loop(g_row), prior, node))

    def g_row_oh(i, prior, node, acc):
        oh = ((node + i) % NODES)[:, None] == jnp.arange(NODES)[None]
        v = jnp.einsum("bn,bna->ba", oh.astype(jnp.float32), prior)
        return acc + v.sum()

    rec("row-gather dense onehot einsum", timeit(loop(g_row_oh), prior, node))

    # 3. scalar gather: [B] from [B,nodes] at node[B]
    def g_scal(i, visit, node, acc):
        v = visit[b_idx, (node + i) % NODES]
        return acc + v.sum().astype(jnp.float32)

    rec("scalar-gather [B]   <- [B,nodes] @ node[B]",
        timeit(loop(g_scal), visit, node))

    def g_scal_oh(i, visit, node, acc):
        oh = ((node + i) % NODES)[:, None] == jnp.arange(NODES)[None]
        v = jnp.sum(jnp.where(oh, visit, 0), axis=1)
        return acc + v.sum().astype(jnp.float32)

    rec("scalar-gather dense onehot where+sum",
        timeit(loop(g_scal_oh), visit, node))

    # 4. scalar gather from [B,nodes,A] at (node,action)
    def g_scal2(i, prior, node, action, acc):
        v = prior[b_idx, (node + i) % NODES, action]
        return acc + v.sum()

    rec("scalar-gather [B]   <- [B,nodes,A] @ (node,action)",
        timeit(loop(g_scal2), prior, node, action))

    # 5. scatter-add [B] into [B,nodes]
    def s_add(i, visit, node, acc):
        v = visit.at[b_idx, (node + i) % NODES].add(1)
        return acc + v[0, 0].astype(jnp.float32)

    rec("scatter-add   [B,nodes] @ node[B]", timeit(loop(s_add), visit, node))

    def s_add_oh(i, visit, node, acc):
        oh = ((node + i) % NODES)[:, None] == jnp.arange(NODES)[None]
        v = visit + oh.astype(jnp.int32)
        return acc + v[0, 0].astype(jnp.float32)

    rec("scatter-add dense onehot +", timeit(loop(s_add_oh), visit, node))

    # 6. scatter-set [B] into [B,nodes,A] at (node, action)
    def s_set(i, prior, node, action, acc):
        v = prior.at[b_idx, (node + i) % NODES, action].set(1.0)
        return acc + v[0, 0, 0]

    rec("scatter-set   [B,nodes,A] @ (node,action)",
        timeit(loop(s_set), prior, node, action))

    def s_set_oh(i, prior, node, action, acc):
        ohn = ((node + i) % NODES)[:, None] == jnp.arange(NODES)[None]
        oha = action[:, None] == jnp.arange(A)[None]
        v = jnp.where(ohn[:, :, None] & oha[:, None, :], 1.0, prior)
        return acc + v[0, 0, 0]

    rec("scatter-set dense onehot where",
        timeit(loop(s_set_oh), prior, node, action))

    # 7. node-state gather: [16,P,B] from [nodes,16,P,B] at node[B] (per-lane)
    def g_state(i, planes, node, acc):
        idx = ((node + i) % NODES).reshape(1, 1, 1, B)
        v = jnp.take_along_axis(planes, idx, axis=0)[0]
        return acc + v.sum(dtype=jnp.uint32).astype(jnp.float32)

    rec("state-gather  [16,P,B] <- [nodes,16,P,B] @ node[B]",
        timeit(loop(g_state), planes, node))

    def g_state_oh(i, planes, node, acc):
        oh = ((node + i) % NODES).reshape(NODES, 1, 1, B) == jnp.arange(
            NODES
        ).reshape(NODES, 1, 1, 1)
        # wrong compare above: build [nodes, B] then broadcast
        return acc

    def g_state_oh2(i, planes, node, acc):
        oh = (node + i) % NODES == jnp.arange(NODES)[:, None]  # [nodes,B]
        v = jnp.sum(
            jnp.where(oh[:, None, None, :], planes, jnp.uint32(0)),
            axis=0, dtype=jnp.uint32,
        )
        return acc + v.sum(dtype=jnp.uint32).astype(jnp.float32)

    rec("state-gather dense onehot where+sum",
        timeit(loop(g_state_oh2), planes, node))

    # 7c. compid gather [N,N,B] from [nodes,N,N,B]
    def g_comp(i, compid, node, acc):
        idx = ((node + i) % NODES).reshape(1, 1, 1, B)
        v = jnp.take_along_axis(compid, idx, axis=0)[0]
        return acc + v.sum(dtype=jnp.int32).astype(jnp.float32)

    rec("compid-gather [N,N,B] <- [nodes,N,N,B] @ node[B]",
        timeit(loop(g_comp), compid, node))

    # 8. state scatter at uniform dynamic index (dynamic_update_slice)
    def s_state(i, planes, acc):
        v = jax.lax.dynamic_update_slice_in_dim(
            planes, planes[:1] + jnp.uint32(i), i % NODES, axis=0
        )
        return acc + v[0, 0, 0, 0].astype(jnp.float32)

    rec("state-set     [nodes,16,P,B] @ uniform i (DUS)",
        timeit(loop(s_state), planes))

    print("\nsummary sorted by cost:")
    for name, us in sorted(rows, key=lambda r: -r[1]):
        print(f"  {us:9.1f} us  {name}")


if __name__ == "__main__":
    main()
