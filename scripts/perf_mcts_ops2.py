#!/usr/bin/env python
"""Round 2 of the MCTS primitive microbenchmarks (see perf_mcts_ops.py).

Findings from round 1 (v5e, B=512, nodes=65, A=144):
  - take_along_axis row/elem gathers with 2-D outputs: ~1 us
  - ANY coordinate-pair (arr[b_idx, node]) gather/scatter, per-lane state
    gather, or DUS on a fori-invariant buffer: 130-240 us FIXED cost
This script times the candidate fast replacements.
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
P, N = 14, 12
REPS = 200


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    del out
    return dt / REPS * 1e6


def loop(body):
    @jax.jit
    def run(*args):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(i, *args, c), 0.0)

    return run


def loop_carry(body, carry_init):
    """fori_loop that CARRIES the mutated buffer (in-place update eligible)."""

    @jax.jit
    def run(*args):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: body(i, *args, c), carry_init
        )

    return run


def main():
    print(f"backend={jax.default_backend()}  B={B} nodes={NODES} A={A}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    visit = jax.random.randint(k1, (B, NODES), 0, 100, jnp.int32)
    prior = jax.random.uniform(k2, (B, NODES, A), jnp.float32)
    node = jax.random.randint(k3, (B,), 0, NODES, jnp.int32)
    action = jax.random.randint(k1, (B,), 0, A, jnp.int32)
    # nodes-minor state buffer
    planes_nm = jax.random.randint(
        k2, (16, P, B, NODES), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    rows = []

    def rec(name, us):
        rows.append((name, us))
        print(f"  {name:<56s} {us:9.1f} us")

    # A. scalar gather via take_along_axis axis=1, idx [B,1]
    def g_taa(i, visit, node, acc):
        idx = ((node + i) % NODES)[:, None]
        v = jnp.take_along_axis(visit, idx, axis=1)[:, 0]
        return acc + v.sum().astype(jnp.float32)

    rec("scalar-gather TAA [B,1] <- [B,nodes]", timeit(loop(g_taa), visit, node))

    # B. put_along_axis scatter [B,nodes] @ node[B,1] (loop-invariant buffer)
    def s_paa(i, visit, node, acc):
        idx = ((node + i) % NODES)[:, None]
        cur = jnp.take_along_axis(visit, idx, axis=1)
        v = jnp.put_along_axis(
            visit, idx, cur + 1, axis=1, inplace=False
        )
        return acc + v[0, 0].astype(jnp.float32)

    rec("scatter-add PAA [B,nodes] @ node[B,1] (invariant)",
        timeit(loop(s_paa), visit, node))

    # B2. same but carrying the buffer (in-place eligible)
    def s_paa_c(i, node, visit_and_acc):
        visit, acc = visit_and_acc
        idx = ((node + i) % NODES)[:, None]
        cur = jnp.take_along_axis(visit, idx, axis=1)
        visit = jnp.put_along_axis(visit, idx, cur + 1, axis=1, inplace=False)
        return visit, acc + 1.0

    @jax.jit
    def run_b2(visit, node):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: s_paa_c(i, node, c), (visit, 0.0)
        )

    out = jax.block_until_ready(run_b2(visit, node))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_b2(visit, node))
    rec("scatter-add PAA [B,nodes] @ node[B,1] (carried)",
        (time.perf_counter() - t0) / REPS * 1e6)

    # C. row scatter [B,nodes,A] @ node[B,1,1] rows (carried)
    def s_row_c(i, node, carry):
        prior, acc = carry
        idx = jnp.broadcast_to(((node + i) % NODES)[:, None, None], (B, 1, A))
        row = jnp.full((B, 1, A), 0.5, jnp.float32)
        prior = jnp.put_along_axis(prior, idx, row, axis=1, inplace=False)
        return prior, acc + 1.0

    @jax.jit
    def run_c(prior, node):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: s_row_c(i, node, c), (prior, 0.0)
        )

    out = jax.block_until_ready(run_c(prior, node))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_c(prior, node))
    rec("row-scatter PAA [B,nodes,A] @ node[B,1,1] (carried)",
        (time.perf_counter() - t0) / REPS * 1e6)

    # D. element scatter into [B,nodes,A] at (node,action) via 2-step TAA:
    #    gather row, modify at action, write row back (carried)
    def s_elem2(i, node, action, carry):
        children, acc = carry
        nidx = ((node + i) % NODES)[:, None, None]
        row = jnp.take_along_axis(children, nidx, axis=1)  # [B,1,A]
        row = jnp.put_along_axis(
            row, action[:, None, None], i, axis=2, inplace=False
        )
        children = jnp.put_along_axis(
            children, jnp.broadcast_to(nidx, (B, 1, A)), row, axis=1,
            inplace=False,
        )
        return children, acc + 1.0

    @jax.jit
    def run_d(prior, node, action):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: s_elem2(i, node, action, c),
            (prior.astype(jnp.int32), 0.0),
        )

    out = jax.block_until_ready(run_d(prior, node, action))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_d(prior, node, action))
    rec("elem-scatter 2xTAA rows [B,nodes,A]@(node,action) (carried)",
        (time.perf_counter() - t0) / REPS * 1e6)

    # E. nodes-minor state gather: [16,P,B,nodes] @ node[B] -> [16,P,B]
    def g_nm(i, planes_nm, node, acc):
        idx = ((node + i) % NODES).reshape(1, 1, B, 1)
        v = jnp.take_along_axis(planes_nm, idx, axis=3)[..., 0]
        return acc + v.sum(dtype=jnp.uint32).astype(jnp.float32)

    rec("state-gather nodes-MINOR [16,P,B,nodes] @ node[B]",
        timeit(loop(g_nm), planes_nm, node))

    # F. nodes-minor state write at uniform index (carried)
    def s_nm(i, carry):
        buf, acc = carry
        val = jnp.full((16, P, B, 1), i, jnp.uint32)
        buf = jax.lax.dynamic_update_slice(
            buf, val, (0, 0, 0, i % NODES)
        )
        return buf, acc + 1.0

    @jax.jit
    def run_f(planes_nm):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: s_nm(i, c), (planes_nm, 0.0)
        )

    out = jax.block_until_ready(run_f(planes_nm))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_f(planes_nm))
    rec("state-set nodes-MINOR DUS @ uniform (carried)",
        (time.perf_counter() - t0) / REPS * 1e6)

    # G. nodes-MAJOR single stacked gather+DUS carried (upper bound check)
    planes_maj = jnp.moveaxis(planes_nm, 3, 0)  # [nodes,16,P,B]

    def s_maj(i, node, carry):
        buf, acc = carry
        idx = ((node + i) % NODES).reshape(1, 1, 1, B)
        v = jnp.take_along_axis(buf, idx, axis=0)  # [1,16,P,B]
        buf = jax.lax.dynamic_update_slice(
            buf, v + jnp.uint32(1), (i % NODES, 0, 0, 0)
        )
        return buf, acc + 1.0

    @jax.jit
    def run_g(planes_maj, node):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: s_maj(i, node, c), (planes_maj, 0.0)
        )

    out = jax.block_until_ready(run_g(planes_maj, node))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_g(planes_maj, node))
    rec("state gather+set nodes-MAJOR stacked (carried)",
        (time.perf_counter() - t0) / REPS * 1e6)

    # H. step_bits cost at B=512 (board 12)
    from twixt_for_open_spiel_tpu.ops.bitboard import bit_reset, step_bits

    bs = bit_reset(12, B)

    @jax.jit
    def run_h(bs):
        def body(i, carry):
            s = carry
            a = (i * 7 + jnp.arange(B, dtype=jnp.int32) * 13) % 100 + 13
            return step_bits(s, 12, a)

        return jax.lax.fori_loop(0, 50, body, bs)

    out = jax.block_until_ready(run_h(bs))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run_h(bs))
    rec("step_bits board12 B=512 (per step, 50 steps)",
        (time.perf_counter() - t0) / 50 * 1e6)

    print("\nsummary sorted by cost:")
    for name, us in sorted(rows, key=lambda r: -r[1]):
        print(f"  {us:9.1f} us  {name}")


if __name__ == "__main__":
    main()
