#!/usr/bin/env python
"""Round 4 MCTS microbenchmarks: the op shapes of the loop-free search.

perf_mcts.py showed the round-2 array-of-trees search spends ~1 ms PER
lax.while_loop ITERATION (558 iterations over 64 sims = 590 ms with a free
evaluator), while every individual TAA op measures ~1 us.  The fix is a
search with NO data-dependent loops: dense per-node best-action selection +
pointer-jumping + ancestor-mask backup.  This script prices its building
blocks (all inside a fori(REPS) loop, per-iteration us):

  A. pointer-jump composition: TAA [B,nodes] <- [B,nodes] idx, axis=1
  B. parent-visit gather: same shape (clamped parent index)
  C. dense best-unexpanded: masked max+argmax over [B,nodes,A]
  D. child-side segment max: build M[b,n,c] = (parent[c]==n) and masked
     max+argmax over [B,nodes,nodes]
  E. ancestor-mask backup: row gather + DUS write + 2 elementwise updates
  F. evaluator parts at B=512: bit_observation_nchw, bit_legal_mask_flat,
     softmax, and the full net-evaluator closure inside a fori loop
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
N = 12
REPS = 200


def _force(out):
    # plain block_until_ready is unreliable under the remote-TPU tunnel
    # (docs/PERF.md) — force a host readback of a result-dependent scalar
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timeit(fn, *args, reps=REPS):
    """Per-iteration time.  NOTE: every jitted call + readback pays ~26 ms
    of tunnel round-trip latency, so a single-call timing overstates cheap
    bodies by ~26ms/reps (~130 us at reps=200).  Treat numbers here as
    upper bounds; scripts/perf_mcts_ops5-style two-trip-count slopes remove
    the constant."""
    _force(fn(*args))
    t0 = time.perf_counter()
    _force(fn(*args))
    dt = time.perf_counter() - t0
    return dt / reps * 1e6


def loop(body):
    @jax.jit
    def run(*args):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(i, *args, c), 0.0)

    return run


def main():
    print(f"backend={jax.default_backend()}  B={B} nodes={NODES} A={A}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    visit = jax.random.randint(k1, (B, NODES), 0, 100, jnp.int32)
    vsum = jax.random.uniform(k2, (B, NODES), jnp.float32)
    parent = jax.random.randint(k3, (B, NODES), -1, NODES, jnp.int32)
    prior = jax.random.uniform(k2, (B, NODES, A), jnp.float32)
    legal = jax.random.uniform(k1, (B, NODES, A)) > 0.3
    haskid = jax.random.uniform(k3, (B, NODES, A)) > 0.7
    follow = jax.random.randint(k1, (B, NODES), 0, NODES, jnp.int32)
    amask = jax.random.uniform(k2, (B, NODES, NODES)) > 0.5

    def rec(name, us):
        print(f"  {name:<56s} {us:9.1f} us", flush=True)

    # A. one pointer-jump composition (and 7 chained, the real unit)
    def jump1(i, follow, acc):
        f = (follow + i) % NODES
        f2 = jnp.take_along_axis(f, f, axis=1)
        return acc + f2.sum().astype(jnp.float32)

    rec("A1 pointer-jump TAA [B,nodes]<-[B,nodes]", timeit(loop(jump1), follow))

    def jump7(i, follow, acc):
        f = (follow + i) % NODES
        for _ in range(7):
            f = jnp.take_along_axis(f, f, axis=1)
        return acc + f.sum().astype(jnp.float32)

    rec("A2 7 chained pointer-jumps", timeit(loop(jump7), follow))

    # B. parent-visit gather [B,nodes] at clamped parent idx
    def pgather(i, visit, parent, acc):
        idx = jnp.maximum((parent + i) % NODES, 0)
        tv = jnp.take_along_axis(visit, idx, axis=1)
        return acc + tv.sum().astype(jnp.float32)

    rec("B parent-visit gather [B,nodes]<-[B,nodes]",
        timeit(loop(pgather), visit, parent))

    # C. dense best-unexpanded over [B,nodes,A] (f32 prior)
    def bu(i, prior, legal, haskid, visit, acc):
        tot = jnp.sqrt(jnp.maximum(visit + i, 1).astype(jnp.float32))
        sc = 1.4 * prior * tot[..., None]
        sc = jnp.where(legal & ~haskid, sc, -jnp.inf)
        best = sc.max(-1)
        besta = jnp.argmax(sc, -1)
        return acc + best.sum() + besta.sum().astype(jnp.float32)

    rec("C dense best-unexpanded [B,nodes,A] max+argmax",
        timeit(loop(bu), prior, legal, haskid, visit))

    # C2. same with bf16 prior
    prior_bf = prior.astype(jnp.bfloat16)

    def bu_bf(i, prior, legal, haskid, visit, acc):
        tot = jnp.sqrt(jnp.maximum(visit + i, 1).astype(jnp.float32))
        sc = 1.4 * prior.astype(jnp.float32) * tot[..., None]
        sc = jnp.where(legal & ~haskid, sc, -jnp.inf)
        best = sc.max(-1)
        besta = jnp.argmax(sc, -1)
        return acc + best.sum() + besta.sum().astype(jnp.float32)

    rec("C2 dense best-unexpanded, bf16 prior",
        timeit(loop(bu_bf), prior_bf, legal, haskid, visit))

    # D. child-side segment max: M + masked max/argmax over [B,nodes,nodes]
    def segmax(i, parent, visit, vsum, acc):
        par = (parent + i) % NODES
        s = vsum / jnp.maximum(visit, 1)  # stand-in child score [B,nodes]
        m = par[:, None, :] == jnp.arange(NODES, dtype=jnp.int32)[None, :, None]
        sc = jnp.where(m, s[:, None, :], -jnp.inf)   # [B,n,c]
        best = sc.max(-1)
        bestc = jnp.argmax(sc, -1)
        return acc + best[:, 0].sum() + bestc.sum().astype(jnp.float32)

    rec("D child-side segment max [B,nodes,nodes]",
        timeit(loop(segmax), parent, visit, vsum))

    # E. ancestor-mask backup: row gather, DUS row write, 2 updates
    @jax.jit
    def run_e(amask, visit, vsum):
        def body(i, carry):
            am, vis, vs = carry
            leaf = (jnp.arange(B, dtype=jnp.int32) + i) % NODES
            row = jnp.take_along_axis(
                am, leaf[:, None, None], axis=1
            )[:, 0]                                   # [B,nodes]
            newrow = jnp.take_along_axis(
                am, jnp.maximum(leaf - 1, 0)[:, None, None], axis=1
            )
            am = jax.lax.dynamic_update_slice(
                am, newrow, (0, (i % NODES), 0)
            )
            vis = vis + row.astype(jnp.int32)
            vs = vs + jnp.where(row, 0.5, 0.0)
            return am, vis, vs

        am, vis, vs = jax.lax.fori_loop(
            0, REPS, body, (amask, visit, vsum)
        )
        return vis.sum() + vs.sum()

    rec("E mask backup (row gather+DUS+2 updates)",
        timeit(run_e, amask, visit, vsum))

    # F. evaluator parts at B=512, board 12
    from twixt_for_open_spiel_tpu.models import create_net, init_params
    from twixt_for_open_spiel_tpu.models.mcts import net_evaluator
    from twixt_for_open_spiel_tpu.ops.bitboard import (
        bit_legal_mask_flat, bit_reset, step_bits,
    )
    from twixt_for_open_spiel_tpu.ops.observe import bit_observation_nchw

    bs = bit_reset(N, B)

    @jax.jit
    def run_obs(bs):
        def body(i, carry):
            s, acc = carry
            a = (i * 7 + jnp.arange(B, dtype=jnp.int32) * 13) % 100 + 13
            s = step_bits(s, N, a)
            obs = bit_observation_nchw(s, N)
            return s, acc + obs.sum()

        return jax.lax.fori_loop(0, 50, body, (bs, jnp.float32(0)))[1]

    rec("F1 step_bits + bit_observation_nchw (50 iters)",
        timeit(run_obs, bs, reps=50))

    @jax.jit
    def run_legal(bs):
        def body(i, carry):
            s, acc = carry
            a = (i * 7 + jnp.arange(B, dtype=jnp.int32) * 13) % 100 + 13
            s = step_bits(s, N, a)
            lm = bit_legal_mask_flat(s, jnp.clip(s.current_player, 0, 1), N)
            return s, acc + lm.sum(dtype=jnp.int32)

        return jax.lax.fori_loop(0, 50, body, (bs, jnp.int32(0)))[1]

    rec("F2 step_bits + bit_legal_mask_flat (50 iters)",
        timeit(run_legal, bs, reps=50))

    net = create_net(N, channels=64, blocks=4)
    params = init_params(net, jax.random.PRNGKey(0))
    ev = net_evaluator(net.apply, N)

    @jax.jit
    def run_ev(params, bs, key):
        def body(i, carry):
            s, acc = carry
            a = (i * 7 + jnp.arange(B, dtype=jnp.int32) * 13) % 100 + 13
            s = step_bits(s, N, a)
            logits, v = ev(params, s, key)
            lm = jnp.moveaxis(
                bit_legal_mask_flat(s, jnp.clip(s.current_player, 0, 1), N),
                0, -1,
            )
            pri = jax.nn.softmax(jnp.where(lm, logits, -1e9), axis=-1)
            return s, acc + pri.sum() + v.sum()

        return jax.lax.fori_loop(0, 50, body, (bs, jnp.float32(0)))[1]

    rec("F3 step+legal+net-eval+softmax (50 iters)",
        timeit(run_ev, params, bs, jax.random.PRNGKey(1), reps=50))


if __name__ == "__main__":
    main()
