#!/usr/bin/env python
"""Benchmark harness: batched random-rollout env throughput on one chip.

Headline metric (BASELINE.json:2): env-steps/s per chip at board_size=12,
batch 4096 lockstep envs (config 3), with secondary configs 2 (5x5 batch
256) and 4 (24x24 batch 8192 + observation-tensor emission for the learner
feed).

The measured path on TPU is the fused Pallas rollout over the bitboard
engine (ops/fused_bit_rollout.py): the whole multi-step env loop runs in
one kernel per env tile with state resident in VMEM, bit-identical to the
XLA bitboard path (pinned by tests/test_fused_bit.py and cross-checked on
hardware by scripts/bench_fused_bit.py), which in turn is bit-exact-
equivalent to the canonical tensor engine (tests/test_bitboard.py).
On CPU (no Mosaic) the XLA bitboard path is measured instead.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is measured throughput relative to this chip's share of the
north-star target (>= 10M env-steps/s on one 8-chip v5e host => 1.25M/chip;
the reference publishes no numbers of its own, BASELINE.json:13).

Details for each config go to stderr.
"""

import json
import os
import sys
import time

# Persistent XLA compilation cache: compiles under the remote-TPU tunnel run
# minutes; caching them makes repeat bench runs start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def bench_rollout(board_size, batch, steps, with_obs=False, tile=None):
    from twixt_for_open_spiel_tpu.ops.bitboard import (
        bit_random_rollout,
        bit_reset,
        to_state,
    )
    from twixt_for_open_spiel_tpu.ops.observe import observation_nchw

    fused = None
    if jax.default_backend() not in ("cpu",) and tile and batch % tile == 0:
        from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import (
            fused_bit_rollout,
        )

        fused = fused_bit_rollout

    state = bit_reset(board_size, batch)

    def run(seed, state):
        if fused is not None:
            final, stats = fused(seed, board_size, steps, state, tile=tile)
        else:
            final, stats = bit_random_rollout(seed, board_size, steps, state)
        if with_obs:
            obs = observation_nchw(to_state(final, board_size), board_size)
            return final, stats, obs
        return final, stats

    run_j = jax.jit(run)

    def readback(o):
        # block_until_ready is unreliable under the axon tunnel; force a
        # real device->host readback of a dependent scalar instead.
        return np.asarray(o[1]["episodes"]).ravel()[0]

    # compile + warm up
    out = run_j(0, state)
    readback(out)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = run_j(i + 1, state)
    readback(out)
    dt = time.perf_counter() - t0
    env_steps = batch * steps * reps
    rate = env_steps / dt
    stats = out[1]
    path = f"fused(tile={tile})" if fused is not None else "xla"
    print(
        f"[bench] n={board_size} batch={batch} steps={steps} obs={with_obs}"
        f" path={path} -> {rate:,.0f} env-steps/s ({dt:.2f}s, episodes/rep="
        f"{int(stats['episodes'])})",
        file=sys.stderr,
    )
    return rate


def main():
    backend = jax.default_backend()
    print(f"[bench] backend={backend} devices={jax.devices()}", file=sys.stderr)
    steps = 1000 if backend in ("tpu", "axon") else 20

    # config 2: minimal board
    bench_rollout(5, 256, steps, tile=256)
    # config 3: headline
    headline = bench_rollout(12, 4096, steps, tile=4096)
    # config 4: max board + obs emission
    bench_rollout(24, 8192, max(steps // 4, 10), with_obs=True, tile=2048)

    per_chip_target = 10e6 / 8  # north-star: 10M/s per 8-chip v5e host
    print(
        json.dumps(
            {
                "metric": "env-steps/s per chip, twixt board_size=12, "
                "batch=4096 lockstep random rollouts",
                "value": round(headline),
                "unit": "env-steps/s",
                "vs_baseline": round(headline / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
