#!/usr/bin/env python
"""Repro for the Mosaic compile crash in the obs-DMA fused kernel.

docs/PERF.md noted the fused obs-DMA kernel (ops/fused_bit_rollout.py,
``emit_obs=True, obs_dma=True``) fails to compile at tile >= 4096 for the
config-4 shape (board 24: P=30, 12+legal planes) — "not chased".  Round 5
chased it; two findings:

1. A bare DMA SKELETON does NOT reproduce: a pallas_call with the same
   2-slot VMEM staging scratch, the same double-buffered async copies
   into an ANY-memory-space HBM output, the same grid and the same
   fori_loop — but a trivial loop body — compiles and runs at every
   tile up to 8192 (``--skeleton`` below).  The crash needs the real
   engine body in the loop.

2. With the REAL kernel the boundary is two-dimensional (measured on the
   chip, 2026-08-21; "CRASH" = the remote tpu_compile_helper subprocess
   exits 1 — the Mosaic pipeline dies, there is no Python-level error):

       sublanes/tile   grid=1 (batch==tile)   grid>=2
       16  (tile 2048)        OK                OK
       32  (tile 4096)        OK                CRASH
       64  (tile 8192)        CRASH             (not reachable <=8192)

   So tile 4096 is fine as long as it is the WHOLE batch, and the
   skeleton's immunity says the trigger is the engine body x wide-tile
   interaction, not the DMA pattern itself.  ``fused_bit_rollout`` now
   guards the measured crash region with a clear ValueError
   (tests/test_fused_bit.py::test_obs_dma_tile_guard).

Run on the real chip:  python scripts/repro_mosaic_dma_tile.py
(sweeps the real kernel; each config prints OK or the error head;
crashing configs take ~1 min each to fail over the tunnel).
Skeleton control:      python scripts/repro_mosaic_dma_tile.py --skeleton
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_skeleton(rows, steps, subl, lanes, grid):
    """pallas_call mirroring fused_bit_rollout's obs-DMA skeleton
    (trivial loop body — this is the NEGATIVE control: it never
    crashes, proving the DMA pattern alone is not the trigger)."""

    def kernel(out_ref, scratch, sem):
        prog = pl.program_id(0).astype(jnp.int32)

        def copy(k, slot):
            return pltpu.make_async_copy(
                scratch.at[slot],
                out_ref.at[
                    pl.ds(k * rows, rows),
                    pl.ds(prog * subl, subl),
                    slice(None),
                ],
                sem.at[slot],
            )

        def body(k, carry):
            slot = jax.lax.rem(k, 2)

            @pl.when(k >= 2)
            def _():
                copy(k - 2, slot).wait()

            for j in range(rows):
                scratch[slot, pl.ds(j, 1)] = jnp.full(
                    (1, subl, lanes), k, jnp.uint32
                ) + jnp.uint32(j)
            copy(k, slot).start()
            return carry

        carry = jax.lax.fori_loop(0, steps, body, jnp.int32(0))
        for k in range(max(0, steps - 2), steps):
            copy(k, k % 2).wait()

    out_shape = jax.ShapeDtypeStruct(
        (steps * rows, grid * subl, lanes), jnp.uint32
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, rows, subl, lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def sweep_skeleton():
    p = 30  # board 24 padded width
    rows = 12 * p
    steps = 16
    lanes = 128
    for tile in (1024, 2048, 4096, 8192):
        subl = tile // lanes
        grid = max(1, 8192 // tile)
        try:
            fn = jax.jit(build_skeleton(rows, steps, subl, lanes, grid))
            out = fn()
            out.block_until_ready()
            head = int(out[0, 0, 0])
            print(f"skeleton tile={tile:<6d} grid={grid} OK "
                  f"(out[0,0,0]={head})", flush=True)
        except Exception as e:
            msg = "".join(
                traceback.format_exception_only(type(e), e)
            ).strip()
            print(f"skeleton tile={tile:<6d} grid={grid} CRASH: "
                  f"{msg[:300]}", flush=True)


def sweep_real():
    from twixt_for_open_spiel_tpu.ops.bitboard import bit_reset
    from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import (
        fused_bit_rollout,
    )

    n = 24
    for batch, tile in [
        (2048, 2048),   # subl 16, grid 1: OK
        (8192, 2048),   # subl 16, grid 4: OK
        (4096, 4096),   # subl 32, grid 1: OK
        (8192, 4096),   # subl 32, grid 2: CRASH
        (8192, 8192),   # subl 64, grid 1: CRASH
    ]:
        state = bit_reset(n, batch)
        try:
            out = fused_bit_rollout(
                0, n, 16, state, tile=tile, emit_obs=True, obs_dma=True,
                tile_guard=False,
            )
            jax.block_until_ready(out)
            print(f"real batch={batch:<6d} tile={tile:<6d} "
                  f"grid={batch // tile} OK", flush=True)
        except Exception as e:
            msg = "".join(
                traceback.format_exception_only(type(e), e)
            ).strip()
            print(f"real batch={batch:<6d} tile={tile:<6d} "
                  f"grid={batch // tile} CRASH: {msg[:200]}", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    if "--skeleton" in sys.argv:
        sweep_skeleton()
    else:
        sweep_real()


if __name__ == "__main__":
    main()
