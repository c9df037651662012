#!/usr/bin/env python
"""Config-4 obs-emission shootout: XLA packed vs fused VMEM-block vs fused
double-buffered DMA streaming (ops/fused_bit_rollout obs_dma=True).

Round 3's fused emission (whole obs chunk VMEM-resident) measured 38.0M
env-steps/s at tile 1024 — real but below the XLA path's 42.8M, because the
VMEM pressure capped the tile (2048 failed to compile) and chunk.  The DMA
variant stages 2 steps of obs in VMEM and streams the rest to HBM
asynchronously, so tile/chunk scale freely; this script measures whether
that closes the gap to the 50.9M no-obs ceiling.

Board 24, batch 8192 (BASELINE config 4).  Each row is timed over enough
launches to amortise the ~26 ms tunnel readback (only scalar stats cross
the host boundary; the obs stream is a forced jit output that stays on
device).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

from twixt_for_open_spiel_tpu.ops.bitboard import (
    bit_reset,
    bit_rollout_emit_obs,
)
from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import fused_bit_rollout


def _readback(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[-1]).ravel()[0]


def bench(run, state, chunk, batch, launches):
    st, stats, obs = run(0, state)
    _readback(stats)
    t0 = time.perf_counter()
    for i in range(launches):
        st, stats, obs = run(i + 1, st)
        del obs
    _readback(stats)
    dt = time.perf_counter() - t0
    return batch * chunk * launches / dt


def check(n=5, batch=1024, tile=1024, chunk=20):
    """Real-chip bit-equality spot check of the fused packed obs stream
    (both VMEM and DMA arms) against the XLA emission — the interpret-mode
    pins (tests/test_fused_bit.py) compiled through Mosaic for real."""
    bs0 = bit_reset(n, batch)
    f_x, s_x, obs_words = bit_rollout_emit_obs(
        9, n, chunk, bs0, packed=True
    )
    p = obs_words.shape[-1] // 12
    ref = np.asarray(obs_words).reshape(chunk, batch, 12, p).transpose(
        0, 2, 3, 1
    )
    for dma in (False, True):
        f_k, s_k, obs_k = fused_bit_rollout(
            9, n, chunk, bs0, tile=tile, emit_obs=True, obs_dma=dma
        )
        ok_obs = bool(np.array_equal(np.asarray(obs_k), ref))
        ok_state = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(f_x),
                jax.tree_util.tree_leaves(f_k),
            )
        )
        print(f"hardware check dma={int(dma)}: obs_equal={ok_obs} "
              f"state_equal={ok_state} "
              f"episodes={int(s_k['episodes'])}", flush=True)
        assert ok_obs and ok_state


def main():
    if "--check" in sys.argv:
        check()
        return
    n, batch = 24, 8192
    launches = 40
    print(f"backend={jax.default_backend()} n={n} batch={batch}")
    state0 = bit_reset(n, batch)

    for chunk in (16,):
        @jax.jit
        def run_xla(seed, state, chunk=chunk):
            return bit_rollout_emit_obs(seed, n, chunk, state, packed=True)

        rate = bench(run_xla, state0, chunk, batch, launches)
        print(f"xla packed 13-plane  chunk={chunk:<3d}          "
              f"{rate/1e6:7.1f}M env-steps/s", flush=True)

    for tile, chunk, dma in [
        (1024, 16, False),
        (2048, 16, False),
        (1024, 16, True),
        (2048, 16, True),
        (4096, 16, True),
        (8192, 16, True),
        (2048, 64, True),
        (4096, 64, True),
    ]:
        @jax.jit
        def run_fused(seed, state, tile=tile, chunk=chunk, dma=dma):
            return fused_bit_rollout(
                seed, n, chunk, state, tile=tile, emit_obs=True,
                obs_dma=dma,
            )

        try:
            rate = bench(run_fused, state0, chunk, batch, launches)
        except Exception as e:
            print(f"fused tile={tile:<5d} chunk={chunk:<3d} dma={dma}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(f"fused tile={tile:<5d} chunk={chunk:<3d} dma={int(dma)}   "
              f"{rate/1e6:7.1f}M env-steps/s", flush=True)


if __name__ == "__main__":
    main()
