#!/usr/bin/env python
"""Benchmark harness: batched random-rollout env throughput on one chip.

Rows (stderr), matching BASELINE.json's metric string and configs:
  * board_size=8,  batch 4096  — the driver's headline metric point
  * board_size=5,  batch 256   — config 2 (minimal board)
  * board_size=12, batch 4096  — config 3
  * board_size=24, batch 4096  — the metric string's second size
  * board_size=24, batch 8192 + PER-STEP observation emission — config 4
    (learner feed), two rows: the PACKED wire format the self-play learner
    feed consumes ([B, 12*P] u32, ~1 bit/cell, bit-exact — decoded by the
    learner with ops/observe.unpack_observation_nchw fused into its input
    transpose), and the unpacked [B, 12, n, n-2] bf16 tensor.  Both are
    forced jit outputs, so the numbers include the full per-step emit+write
    cost a learner consumer would see.

The measured path on TPU is the fused Pallas rollout over the bitboard
engine (ops/fused_bit_rollout.py): the whole multi-step env loop runs in
one kernel per env tile with state resident in VMEM, bit-identical to the
XLA bitboard path (pinned by tests/test_fused_bit.py and cross-checked on
hardware by scripts/bench_fused_bit.py), which in turn is bit-exact-
equivalent to the canonical tensor engine (tests/test_bitboard.py).  The
per-step-obs row runs the XLA bitboard path (the emission is XLA).
On CPU (no Mosaic) the XLA bitboard path is measured throughout.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is measured throughput relative to this chip's share of the
north-star target (>= 10M env-steps/s on one 8-chip v5e host => 1.25M/chip;
the reference publishes no numbers of its own, BASELINE.json:13).
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


def _readback(out):
    # block_until_ready is unreliable under the axon tunnel; force a
    # real device->host readback of a dependent scalar instead.
    return np.asarray(out[1]["episodes"]).ravel()[0]


def bench_rollout(board_size, batch, steps, tile=None, reps=3):
    """Random-rollout throughput (no obs): fused Pallas on TPU, XLA on CPU.

    ``reps`` asynchronous launches are timed against ONE device->host
    readback: the tunnel's fixed ~26 ms round-trip latency must be
    amortised over enough launches or it dominates the measurement (a
    3-launch timing under-reported the board-8 row by ~2x;
    docs/PERF.md §Measurement methodology).
    """
    from twixt_for_open_spiel_tpu.ops.bitboard import (
        bit_random_rollout,
        bit_reset,
    )

    fused = None
    if jax.default_backend() not in ("cpu",) and tile and batch % tile == 0:
        from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import (
            fused_bit_rollout,
        )

        fused = fused_bit_rollout

    state = bit_reset(board_size, batch)

    def run(seed, state):
        if fused is not None:
            return fused(seed, board_size, steps, state, tile=tile)
        return bit_random_rollout(seed, board_size, steps, state)

    run_j = jax.jit(run)

    out = run_j(0, state)  # compile + warm up
    _readback(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = run_j(i + 1, state)
    _readback(out)
    dt = time.perf_counter() - t0
    rate = batch * steps * reps / dt
    path = f"fused(tile={tile})" if fused is not None else "xla"
    print(
        f"[bench] n={board_size} batch={batch} steps={steps} obs=False"
        f" path={path} -> {rate:,.0f} env-steps/s ({dt:.2f}s, episodes/rep="
        f"{int(out[1]['episodes'])})",
        file=sys.stderr,
    )
    return rate


def bench_rollout_obs(board_size, batch, chunk, launches, packed=False):
    """Rollout throughput INCLUDING per-step obs emission (config 4).

    Each launch scans ``chunk`` steps, materialising every step's
    observation to HBM exactly as a learner consumer would read it.  The
    tensor is a jit OUTPUT, so XLA must fully materialise it (the earlier
    on-device checksum design both allowed the stacked buffer to fuse away
    AND re-read every byte it did write); only scalar stats cross the host
    boundary, keeping launches pipelined, with ONE readback amortising the
    tunnel latency.

    Two wire formats:
      * ``packed=False`` — the unpacked [chunk, B, 12, n, n-2] bf16
        tensor (round-2's row; its HBM write floor is dominated by the
        physical lane padding of the bf16 minor dims);
      * ``packed=True`` — the exact-but-compressed FULL wire (ONE
        [chunk, B, 12*P] u32 array: obs planes with the mover's legal
        plane riding in the words' free low bits, trailing dims
        coalesced so the scan's per-step writes use all 128 lanes —
        a second legal output padded onto 128 lanes cost 42.7 -> 36.1M
        in round 4, scripts/perf_obs_wire.py), which the learner
        decodes with ops/observe.unpack_observation_nchw fused into
        its input transpose (+ legal_words_from_obs for the legal
        mask); pinned bit-equal to the bf16 tensor at every size 5-24
        (tests/test_bitboard.py) and the format the self-play learner
        feed actually consumes (models/selfplay.Sample).
    """
    from twixt_for_open_spiel_tpu.ops.bitboard import (
        bit_reset,
        bit_rollout_emit_obs,
    )

    state = bit_reset(board_size, batch)

    @jax.jit
    def run(seed, state):
        state, stats, obs = bit_rollout_emit_obs(
            seed, board_size, chunk, state, packed=packed
        )
        return state, stats, obs

    state_w, out_stats, _ = run(0, state)  # compile + warm up
    _readback((None, out_stats))
    t0 = time.perf_counter()
    st = state
    for i in range(launches):
        st, stats, obs = run(i + 1, st)
        del obs  # stays on device; freed once the next launch overwrites
    _readback((None, stats))  # ONE readback: amortise the tunnel latency
    dt = time.perf_counter() - t0
    steps = chunk * launches
    rate = batch * steps / dt
    fmt = "packed-u32" if packed else "bf16"
    print(
        f"[bench] n={board_size} batch={batch} steps={steps} obs=PER-STEP"
        f" ({fmt}, forced jit output) path=xla -> {rate:,.0f} env-steps/s"
        f" ({dt:.2f}s)",
        file=sys.stderr,
    )
    return rate


def main():
    backend = jax.default_backend()
    print(f"[bench] backend={backend} devices={jax.devices()}", file=sys.stderr)
    on_tpu = backend not in ("cpu",)
    steps = 1000 if on_tpu else 20

    # reps per config: enough launches that device compute is >= ~10x the
    # fixed ~26 ms tunnel readback latency (faster configs need more).
    # config 2: minimal board
    bench_rollout(5, 256, steps, tile=256, reps=300 if on_tpu else 3)
    # the driver metric point: board_size=8, batch 4096
    headline = bench_rollout(
        8, 4096, steps, tile=4096, reps=60 if on_tpu else 3
    )
    # config 3: headline board of the perf ladder
    bench_rollout(12, 4096, steps, tile=4096, reps=60 if on_tpu else 3)
    # the metric string's second size: board_size=24, batch 4096
    bench_rollout(24, 4096, steps, tile=2048, reps=30 if on_tpu else 3)
    # config 4: max board, batch 8192, PER-STEP obs emission (learner feed).
    # Primary row: the packed wire format the learner feed consumes
    # (bit-exact, ~1 bit/cell); secondary row: the unpacked bf16 tensor.
    if on_tpu:
        bench_rollout_obs(24, 8192, chunk=16, launches=256, packed=True)
        bench_rollout_obs(24, 8192, chunk=16, launches=64)
    else:
        bench_rollout_obs(24, 64, chunk=4, launches=2, packed=True)
        bench_rollout_obs(24, 64, chunk=4, launches=2)

    per_chip_target = 10e6 / 8  # north-star: 10M/s per 8-chip v5e host
    print(
        json.dumps(
            {
                "metric": "env-steps/s per chip, twixt board_size=8, "
                "batch=4096 lockstep random rollouts",
                "value": round(headline),
                "unit": "env-steps/s",
                "vs_baseline": round(headline / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
