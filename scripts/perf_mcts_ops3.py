#!/usr/bin/env python
"""Round 3: lax.while_loop iteration overhead vs fori_loop, and nested-loop
buffer-capture effects — the remaining suspects for the search slowdown
(TAA/PAA op costs are ~1 us per perf_mcts_ops2.py, yet the real search
still spends ~10 ms/sim).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

B, NODES, A = 512, 65, 144
P = 14
ITERS = 500


def bench(fn, *args, iters=ITERS):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    del out
    return dt / iters * 1e6


def main():
    print(f"backend={jax.default_backend()}  {ITERS} iters")
    key = jax.random.PRNGKey(0)
    visit = jax.random.randint(key, (B, NODES), 0, 100, jnp.int32)
    prior = jax.random.uniform(key, (B, NODES, A), jnp.float32)
    children = jax.random.randint(key, (B, NODES, A), -1, NODES, jnp.int32)
    planes = jax.random.randint(
        key, (NODES, 16, P, B), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    node = jax.random.randint(key, (B,), 0, NODES, jnp.int32)

    # 1. trivial body: fori vs while
    @jax.jit
    def fori_trivial(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: c + 1.0, x)

    @jax.jit
    def while_trivial(x):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            return (c[0] + 1, c[1] + 1.0)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

    print(f"  fori  trivial body              {bench(fori_trivial, 0.0):8.2f} us/iter")
    print(f"  while trivial body              {bench(while_trivial, 0.0):8.2f} us/iter")

    # 2. while with any()-over-[B] cond (the search's sel_cond shape)
    @jax.jit
    def while_anycond(x):
        def cond(c):
            i, flags, acc = c
            return jnp.any(flags)

        def body(c):
            i, flags, acc = c
            flags = flags & (i < ITERS)
            return (i + 1, flags, acc + 1.0)

        return jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.ones((B,), bool), x)
        )

    print(f"  while any([B]) cond             {bench(while_anycond, 0.0):8.2f} us/iter")

    # 3. while with the search's real read set (TAA gathers on captured bufs)
    @jax.jit
    def while_readset(visit, prior, children, node):
        def cond(c):
            i, n, acc = c
            return i < ITERS

        def body(c):
            i, n, acc = c
            row = jnp.take_along_axis(
                children, n[:, None, None], axis=1
            )[:, 0]                                   # [B, A]
            pri = jnp.take_along_axis(
                prior, n[:, None, None], axis=1
            )[:, 0]
            safe = jnp.maximum(row, 0)
            cv = jnp.take_along_axis(visit, safe, axis=1)  # [B, A]
            score = pri + cv
            nn = jnp.argmax(score, -1).astype(jnp.int32) % NODES
            return (i + 1, nn, acc + score[0, 0])

        return jax.lax.while_loop(
            cond, body, (jnp.int32(0), node, 0.0)
        )

    print(f"  while search-like reads         {bench(while_readset, visit, prior, children, node):8.2f} us/iter")

    @jax.jit
    def fori_readset(visit, prior, children, node):
        def body(i, c):
            n, acc = c
            row = jnp.take_along_axis(
                children, n[:, None, None], axis=1
            )[:, 0]
            pri = jnp.take_along_axis(
                prior, n[:, None, None], axis=1
            )[:, 0]
            safe = jnp.maximum(row, 0)
            cv = jnp.take_along_axis(visit, safe, axis=1)
            score = pri + cv
            nn = jnp.argmax(score, -1).astype(jnp.int32) % NODES
            return (nn, acc + score[0, 0])

        return jax.lax.fori_loop(0, ITERS, body, (node, 0.0))

    print(f"  fori  search-like reads         {bench(fori_readset, visit, prior, children, node):8.2f} us/iter")

    # 4. NESTED: fori(50) each containing while(10) search-like — the real
    # search structure (captured big buffers + inner while per outer iter)
    @jax.jit
    def nested(visit, prior, children, planes, node):
        def outer(i, c):
            n, acc, planes = c

            def cond(cc):
                j, nn, a = cc
                return j < 10

            def body(cc):
                j, nn, a = cc
                row = jnp.take_along_axis(
                    children, nn[:, None, None], axis=1
                )[:, 0]
                pri = jnp.take_along_axis(
                    prior, nn[:, None, None], axis=1
                )[:, 0]
                safe = jnp.maximum(row, 0)
                cv = jnp.take_along_axis(visit, safe, axis=1)
                score = pri + cv
                nn = jnp.argmax(score, -1).astype(jnp.int32) % NODES
                return (j + 1, nn, a + score[0, 0])

            _, n, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), n, acc))
            # touch the big carried buffer like expansion does
            idx = n.reshape((1,) * 3 + (B,))
            st = jnp.take_along_axis(planes, idx, axis=0)[0]
            planes = jax.lax.dynamic_update_slice(
                planes, (st + jnp.uint32(1))[None], (i % NODES, 0, 0, 0)
            )
            return (n, acc, planes)

        n, acc, planes = jax.lax.fori_loop(
            0, 50, outer, (node, 0.0, planes)
        )
        return acc + planes[0, 0, 0, 0].astype(jnp.float32)

    us = bench(nested, visit, prior, children, planes, node, iters=50 * 11)
    print(f"  nested fori(50)xwhile(10)+state {us:8.2f} us/inner-iter")


if __name__ == "__main__":
    main()
