#!/usr/bin/env python
"""Minimal repro for the Mosaic crash at obs-DMA tiles >= 4096 (board 24).

docs/PERF.md noted the fused obs-DMA kernel (ops/fused_bit_rollout.py,
``emit_obs=True, obs_dma=True``) fails to compile at tile >= 4096 for the
config-4 shape (board 24: P=30, 12 planes) — "not chased".  This script
strips the repro to the bare pattern: a 2-slot VMEM staging scratch
double-buffer async-DMA-ing per-step blocks into an ANY-memory-space HBM
output, inside a fori_loop — no engine, no RNG, just the DMA skeleton —
and sweeps the tile to find the exact boundary.

Run on the real chip: python scripts/repro_mosaic_dma_tile.py
(each config prints OK or the compiler error's head).
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


def build(rows, steps, subl, lanes, grid):
    """pallas_call mirroring fused_bit_rollout's obs-DMA skeleton."""

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


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    p = 30  # board 24 padded width
    rows = 12 * p
    steps = 16
    lanes = 128
    for tile in (1024, 2048, 4096, 8192):
        subl = tile // lanes
        grid = max(1, 8192 // tile)
        try:
            fn = jax.jit(build(rows, steps, subl, lanes, grid))
            out = fn()
            out.block_until_ready()
            head = int(out[0, 0, 0])
            print(f"tile={tile:<6d} OK (out[0,0,0]={head})", flush=True)
        except Exception as e:
            msg = "".join(
                traceback.format_exception_only(type(e), e)
            ).strip()
            print(f"tile={tile:<6d} CRASH: {msg[:300]}", flush=True)


if __name__ == "__main__":
    main()
