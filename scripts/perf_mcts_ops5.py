#!/usr/bin/env python
"""Round 5 MCTS microbenchmarks — corrected methodology, decisive findings.

Timing discovery (v5e behind the axon tunnel): EVERY jitted call +
readback pays a fixed ~26 ms round-trip, and total time for a
fori(trips)-loop of a trivial body is CONSTANT in `trips` (measured 26-28ms
at trips=200/1000/2x100-unrolled).  So all prior per-iteration numbers that
divided a single call's wall time by the trip count (perf_mcts_ops.py,
ops2, ops3, the first run of ops4 — and their "~1 us TAA / 130-240 us
coordinate-op" conclusions) measured the CONSTANT, not the ops.

This script times with the two-trip-count SLOPE (t(1000)-t(200))/800, which
cancels the per-call constant.  Real costs (v5e, B=512, nodes=65, A=144):

  * elementwise, reductions, DUS/row writes at uniform index, while_loop
    iteration overhead, batched small matmuls: ~1 us or less;
  * dynamic gathers price per INDEX (~10 ns): [B,1]-index forms ~5-10 us,
    [B,nodes]-index ~340 us, [B,A]-index ~750 us — the round-1/2 search
    cost was ~4 such gathers per walk iteration;
  * minor-axis (env-lane) state gather [K,16,P,B]@node[B]: 113 us; the
    masked one-hot select-and-sum form: 52 us;
  * net 64ch x 4 blocks, B=512, board 12: ~330 us/apply (bf16, MXU).

These numbers shaped models/mcts.py's loop-free-backup / child-side-scoring
search; see its module docstring.
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

B, K, A, P = 512, 65, 144, 14


def force(o):
    return np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]


def slope(make):
    """us/iter via two trip counts; cancels the fixed per-call latency."""
    f1, f2 = make(200), make(1000)
    force(f1())
    force(f2())
    t0 = time.perf_counter(); force(f1()); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); force(f2()); t2 = time.perf_counter() - t0
    return (t2 - t1) / 800 * 1e6


def main():
    print(f"backend={jax.default_backend()}  B={B} nodes={K} A={A}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    planes = jax.random.randint(
        k1, (K, 16, P, B), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    amask = jax.random.uniform(k3, (B, K, K)) > 0.5
    visit = jax.random.randint(k4, (B, K), 0, 100, jnp.int32)
    node = jax.random.randint(k1, (B,), 0, K, jnp.int32)
    follow = jax.random.randint(k2, (B, K), 0, K, jnp.int32)
    x = jnp.ones((B, K), jnp.float32)

    def rec(name, us):
        print(f"  {name:<52s} {us:9.1f} us/iter", flush=True)

    def mk_trivial(trips):
        @jax.jit
        def f():
            return jax.lax.fori_loop(
                0, trips, lambda i, c: c * 1.0000001 + 0.5, x
            ).sum()
        return f

    def mk_while(trips):
        @jax.jit
        def f():
            def cond(c):
                return c[0] < trips

            def body(c):
                return c[0] + 1, c[1] * 1.0000001 + 0.5

            return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1].sum()
        return f

    def mk_gather_bk(trips):
        @jax.jit
        def f():
            def body(i, c):
                fo = (follow + i) % K
                return c + jnp.take_along_axis(fo, fo, axis=1).sum().astype(
                    jnp.float32
                )
            return jax.lax.fori_loop(0, trips, body, 0.0)
        return f

    def mk_gather_b1(trips):
        @jax.jit
        def f():
            def body(i, c):
                idx = ((node + i) % K)[:, None, None]
                row = jnp.take_along_axis(amask, idx, axis=1)[:, 0]
                return c + row.sum(dtype=jnp.int32).astype(jnp.float32)
            return jax.lax.fori_loop(0, trips, body, 0.0)
        return f

    def mk_taa_planes(trips):
        @jax.jit
        def f():
            def body(i, acc):
                idx = ((node + i) % K).reshape(1, 1, 1, B)
                v = jnp.take_along_axis(planes, idx, axis=0)[0]
                return acc + v.sum(dtype=jnp.uint32).astype(jnp.float32)
            return jax.lax.fori_loop(0, trips, body, 0.0)
        return f

    def mk_sel_planes(trips):
        iota = jnp.arange(K, dtype=jnp.int32).reshape(K, 1, 1, 1)

        @jax.jit
        def f():
            def body(i, acc):
                oh = ((node + i) % K)[None, None, None, :] == iota
                v = jnp.where(oh, planes, jnp.uint32(0)).sum(0)
                return acc + v.sum(dtype=jnp.uint32).astype(jnp.float32)
            return jax.lax.fori_loop(0, trips, body, 0.0)
        return f

    rec("trivial eltwise [B,nodes] fori body", slope(mk_trivial))
    rec("trivial eltwise while_loop body", slope(mk_while))
    rec("row gather [B,1]-idx <- [B,K,K]", slope(mk_gather_b1))
    rec("gather [B,nodes]-idx <- [B,nodes]", slope(mk_gather_bk))
    rec("state gather TAA minor-axis [K,16,P,B]@node[B]", slope(mk_taa_planes))
    rec("state gather masked one-hot sum (same shapes)", slope(mk_sel_planes))

    # fixed per-call latency probe
    @jax.jit
    def tiny():
        return jnp.float32(1.0) + 1.0

    force(tiny())
    t0 = time.perf_counter()
    for _ in range(5):
        force(tiny())
    print(f"  per-call+readback latency: "
          f"{(time.perf_counter()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()
