#!/usr/bin/env python
"""Compile + validate + time the fused bitboard Pallas rollout on the chip.

Compares against the XLA bitboard path at the headline config; the fused
kernel must match it BIT-FOR-BIT (same seed) on final state and stats.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

from twixt_for_open_spiel_tpu.ops.bitboard import bit_random_rollout, bit_reset
from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import fused_bit_rollout


def _readback(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[-1]).ravel()[0]


def timeit(fn, reps=3):
    out = fn()
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _readback(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    n, batch, steps = 12, 4096, 1000
    tiles = [int(t) for t in sys.argv[1:]] or [512, 1024]
    bs0 = bit_reset(n, batch)

    dt_x, out_x = timeit(lambda: bit_random_rollout(7, n, steps, bs0))
    print(f"xla : {batch*steps/dt_x/1e6:8.1f}M env-steps/s ({dt_x*1e3:.1f}ms)")

    for tile in tiles:
        try:
            dt_k, out_k = timeit(
                lambda: fused_bit_rollout(7, n, steps, bs0, tile=tile)
            )
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:500]}")
            continue
        ok = True
        for a, b in zip(
            jax.tree_util.tree_leaves(out_x[0]),
            jax.tree_util.tree_leaves(out_k[0]),
        ):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                ok = False
        sx, sk = out_x[1], out_k[1]
        print(
            f"fused tile={tile}: {batch*steps/dt_k/1e6:8.1f}M env-steps/s "
            f"({dt_k*1e3:.1f}ms)  episodes xla={int(sx['episodes'])} "
            f"fused={int(sk['episodes'])}  state_equal={ok}"
        )


if __name__ == "__main__":
    main()
