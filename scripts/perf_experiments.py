#!/usr/bin/env python
"""One-process batch of perf experiments on the real chip.

Times several rollout variants at the headline config (board 12, batch 4096)
to locate the per-step cost: full baseline, hash-RNG board-shaped sampling,
step-only (fixed actions), and batch scaling.  Everything compiles in one
process to amortise the slow remote compiles (see memory: 3-8 min/process).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.rollout import (
    batch_reset,
    random_rollout,
    step_auto_reset,
)
from twixt_for_open_spiel_tpu.ops.state import State


import numpy as np


def _readback(out):
    # block_until_ready is unreliable under the axon tunnel: force a real
    # readback of one dependent scalar from every output leaf group.
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[-1]).ravel()[0]


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / reps, out


_U32 = jnp.uint32


def _hash_u32(x):
    x = x ^ (x >> _U32(16))
    x = x * _U32(0x7FEB352D)
    x = x ^ (x >> _U32(15))
    x = x * _U32(0x846CA68B)
    x = x ^ (x >> _U32(16))
    return x


def sample_hash_board(state: State, board_size: int, noise_base):
    """Gumbel-max over the legal mask in BOARD shape with hash RNG."""
    p = jnp.clip(state.current_player, 0, 1)
    legal = jnp.where(p == 0, state.legal[0], state.legal[1])  # [P,P,B]
    shape = legal.shape
    cell = (
        jax.lax.broadcasted_iota(_U32, shape, 0) * _U32(shape[0])
        + jax.lax.broadcasted_iota(_U32, shape, 1)
    )
    env = jax.lax.broadcasted_iota(_U32, shape, 2)
    bits = _hash_u32(cell * _U32(0x9E3779B9) + env * _U32(0x85EBCA6B) + noise_base)
    u = (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    g = -jnp.log(-jnp.log(jnp.maximum(u, 1e-7)))
    scores = jnp.where(legal, g, -jnp.inf)
    m = jnp.max(scores, axis=(0, 1))
    xs = jax.lax.broadcasted_iota(jnp.int32, shape, 0) - geo.PAD
    ys = jax.lax.broadcasted_iota(jnp.int32, shape, 1) - geo.PAD
    idx = xs * board_size + ys
    sel = legal & (scores == m[None, None])
    return jnp.min(jnp.where(sel, idx, 1 << 20), axis=(0, 1)).astype(jnp.int32)


def rollout_hash(seed, board_size, num_steps, state):
    def body(i, carry):
        state, episodes = carry
        noise = _hash_u32(_U32(seed) + _U32(2654435761) * (i.astype(_U32) + _U32(1)))
        actions = sample_hash_board(state, board_size, noise)
        nxt, done, _ = step_auto_reset(state, actions, board_size)
        return nxt, episodes + jnp.sum(done, dtype=jnp.int32)

    return jax.lax.fori_loop(0, num_steps, body, (state, jnp.int32(0)))


def rollout_steponly(board_size, num_steps, state, actions):
    """Fixed action per env per parity of step: measures step w/o sampling."""

    def body(i, carry):
        state, episodes = carry
        a = jnp.where((i % 2) == 0, actions[0], actions[1])
        nxt, done, _ = step_auto_reset(state, a, board_size)
        return nxt, episodes + jnp.sum(done, dtype=jnp.int32)

    return jax.lax.fori_loop(0, num_steps, body, (state, jnp.int32(0)))


def main():
    n, batch, steps = 12, 4096, 1000
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    state = batch_reset(n, batch)
    key = jax.random.PRNGKey(0)

    base = jax.jit(lambda k, s: random_rollout(k, n, steps, s))
    dt, out = timeit(base, key, state)
    print(f"baseline       : {batch*steps/dt:,.0f} env-steps/s  ({dt:.3f}s)")

    hashr = jax.jit(lambda s: rollout_hash(1234, n, steps, s))
    dt, out = timeit(hashr, state)
    print(f"hash-board-rng : {batch*steps/dt:,.0f} env-steps/s  ({dt:.3f}s)")

    # step-only: alternate two fixed (initially legal, non-swap) actions
    b = jnp.broadcast_to(jnp.int32(1 * n + 1), (batch,))
    c = jnp.broadcast_to(jnp.int32(2 * n + 2), (batch,))
    stepo = jax.jit(lambda s: rollout_steponly(n, steps, s, (b, c)))
    dt, out = timeit(stepo, state)
    print(f"step-only      : {batch*steps/dt:,.0f} env-steps/s  ({dt:.3f}s)")

    for big in (8192, 16384, 32768):
        st = batch_reset(n, big)
        dt, out = timeit(base, key, st)
        print(f"batch {big:6d}   : {big*steps/dt:,.0f} env-steps/s  ({dt:.3f}s)")


if __name__ == "__main__":
    main()
