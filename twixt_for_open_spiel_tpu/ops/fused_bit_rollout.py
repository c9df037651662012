"""Pallas fused multi-step rollout over the BITBOARD engine.

The whole ``num_steps`` lockstep env loop runs inside one TPU kernel per
env-batch tile with the state resident in VMEM — per launch, HBM traffic is
one read + one write of the state, where the XLA path (ops/bitboard.py
``bit_random_rollout``) re-reads and re-writes the full state from HBM every
step.

This is the second fused-rollout attempt. The first (ops/fused_rollout.py,
kept as documentation of the Mosaic workarounds) ran the *tensor* engine
in-kernel and lost to XLA: its step needs ~80 whole-board [P, P, T]
concat-shifts that Mosaic materialises as VMEM copies.  The bitboard step
shrinks every shifted operand to a [P, T] u32 bitplane (y-shifts become
elementwise bit shifts), which is exactly the shape Mosaic copies cheaply.

Exactness: the kernel reuses the *production* transition ``step_bits`` from
ops/bitboard.py unchanged (batch-polymorphic; in-kernel batch shape is
(sublanes, lanes)) and re-implements only the sampler — popcount-rank
selection written as two unrolled passes over the P bitplane rows, with a
SWAR popcount (Mosaic has no population-count primitive) and no cumsum
array (Mosaic cannot stack).  Same RNG counters, same arithmetic, same
selection rule => the kernel must produce BIT-IDENTICAL trajectories to
``bit_random_rollout`` for the same seed; tests/test_fused_bit.py asserts
final-state equality in interpreter mode and the TPU bench re-asserts it on
hardware.

Mosaic v5e constraints honoured (learned in ops/fused_rollout.py): int32/
uint32 kernel state only (bool ``swapped`` carried as int32), no reshape /
added unit dims (init state built at rank via ``board_consts(bshape=(1,1))``
iotas), selects never have boolean branches, 2-D (sublane, lane) batch
tiles.

Reference semantics: same lines as ops/bitboard.py (swap rule
twixtboard.cc:450-499, SetPegAndLinks twixtboard.cc:501-571, win/draw
twixtboard.cc:192-207, turn logic twixt.h:93-104).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.bitboard import (
    BitState,
    _hash_u32,
    _pack_bool,
    expand_planes,
    step_bits,
)
from twixt_for_open_spiel_tpu.ops.state import board_consts, padded_size

_U32 = jnp.uint32
_BIG = 1 << 20

_NUM_LEAVES = 2 + 4 + 4 + 2 + 4 + 1 + 5  # red/blue, canonical links,
# canonical blocked, legal, flags, compid, 5 scalars


def _flatten(bs: BitState):
    leaves, treedef = jax.tree_util.tree_flatten(bs)
    assert len(leaves) == _NUM_LEAVES
    return leaves, treedef


def _popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount, bit-identical to jax.lax.population_count on u32."""
    x = x - ((x >> _U32(1)) & _U32(0x55555555))
    x = (x & _U32(0x33333333)) + ((x >> _U32(2)) & _U32(0x33333333))
    x = (x + (x >> _U32(4))) & _U32(0x0F0F0F0F)
    return ((x * _U32(0x01010101)) >> _U32(24)).astype(jnp.int32)


def _select_kth_bit(w: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Position of the (k+1)-th lowest set bit (as ops/bitboard.py, with the
    SWAR popcount)."""
    pos = jnp.zeros_like(k)
    kk = k
    for width in (16, 8, 4, 2, 1):
        mask = _U32((1 << width) - 1)
        low = (w >> pos.astype(_U32)) & mask
        cnt = _popcount_u32(low)
        go_high = kk >= cnt
        kk = jnp.where(go_high, kk - cnt, kk)
        pos = jnp.where(go_high, pos + width, pos)
    return pos


def _sample_bits_unrolled(bs: BitState, board_size: int, noise):
    """popcount-rank sampling with the cumsum unrolled over bitplane rows.

    Selection-rule-identical to ops/bitboard.py ``sample_bits`` (first row
    where the running count exceeds k), with no cumsum array and no
    jnp.stack — Mosaic-safe.
    """
    p_sel = jnp.clip(bs.current_player, 0, 1)
    is_p0 = p_sel == 0
    rows = bs.legal[0].shape[0]

    cnts = []
    total = None
    for x in range(rows):
        row = jnp.where(is_p0, bs.legal[0][x], bs.legal[1][x])
        c = _popcount_u32(row)
        cnts.append((row, c))
        total = c if total is None else total + c

    bits = _hash_u32(noise)
    u = (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0
    )
    k = jnp.minimum(
        (u * total.astype(jnp.float32)).astype(jnp.int32), total - 1
    )
    k = jnp.maximum(k, 0)

    run = jnp.zeros_like(k)
    col = jnp.full_like(k, _BIG)
    word = jnp.zeros_like(cnts[0][0])
    kin = jnp.zeros_like(k)
    for x in range(rows):
        row, c = cnts[x]
        hit = (run <= k) & (run + c > k)
        col = jnp.where(hit, jnp.int32(x), col)
        word = jnp.where(hit, row, word)
        kin = jnp.where(hit, k - run, kin)
        run = run + c
    y = _select_kth_bit(word, kin)
    return (col - geo.PAD) * board_size + (y - geo.PAD)


def _bit_reset_leaves(board_size: int):
    """Initial BitState leaves at batch shape (1, 1), int32/uint32 only,
    built entirely from iotas (Mosaic: no captured constants, no reshape)."""
    n = board_size
    consts = board_consts(board_size, bshape=(1, 1))
    p = padded_size(board_size)
    zplane = jnp.zeros((p, 1, 1), _U32)
    legal = tuple(_pack_bool(consts["legal"][q]) for q in range(2))
    flags = tuple(
        _pack_bool(((consts["init_flags"] >> b) & 1) != 0) for b in range(4)
    )
    compid = consts["init_compid"][
        geo.PAD : geo.PAD + n, geo.PAD : geo.PAD + n
    ]

    def scalar(v):
        return jnp.full((1, 1), v, jnp.int32)

    return BitState(
        red=zplane,
        blue=zplane,
        links=tuple(zplane for _ in range(4)),
        blocked=tuple(zplane for _ in range(4)),
        legal=legal,
        flags=flags,
        compid=compid,
        current_player=scalar(geo.RED),
        move_counter=scalar(0),
        move_one=scalar(-1),
        swapped=scalar(0),
        result=scalar(geo.RESULT_OPEN),
    )


def _packed_obs_planes(bs: BitState):
    """The 12 packed observation planes ([P, ...] u32 each) with the
    MOVER's legal plane riding in planes 0..7's free low bits — identical
    bit-for-bit to ops/observe.bit_observation_packed_with_legal's
    lane-major stack (reference plane semantics twixt.cc:76-132; the
    stowaway legal encoding is ops/observe.pack_legal_into_lanes);
    Mosaic-safe (bitwise ops + concat-shifts only)."""
    any_link = bs.links[0]
    for plane in expand_planes(bs.links)[1:]:
        any_link = any_link | plane
    blocked_e = bs.blocked[0] | bs.blocked[1] | bs.blocked[2] | bs.blocked[3]
    planes = []
    for is_color in (bs.red, bs.blue):
        planes.append(is_color & ~any_link)
        for d in range(4):
            planes.append(is_color & bs.links[d])
        planes.append(is_color & blocked_e)
    # stowaway legal plane: _LEGAL_CHUNK_BITS-bit chunks in the low bits
    # of planes 0.._LEGAL_CHUNK_PLANES-1 — constants shared with
    # ops/observe so the two encoders cannot silently diverge (the
    # module-level asserts there guard the layout)
    from .observe import _LEGAL_CHUNK_BITS, _LEGAL_CHUNK_PLANES

    is_p0 = jnp.clip(bs.current_player, 0, 1) == 0
    legal = jnp.where(is_p0, bs.legal[0], bs.legal[1])
    chunk_mask = _U32((1 << _LEGAL_CHUNK_BITS) - 1)
    for k in range(_LEGAL_CHUNK_PLANES):
        chunk = (legal >> _U32(geo.PAD + _LEGAL_CHUNK_BITS * k)) & chunk_mask
        planes[k] = (planes[k] & ~chunk_mask) | chunk
    return planes


def _make_kernel(board_size: int, num_steps: int, subl: int, lanes: int,
                 treedef, emit_obs: bool = False, obs_dma: bool = False):
    tile = subl * lanes
    p = padded_size(board_size)

    def kernel(seed_ref, *refs):
        in_refs = refs[:_NUM_LEAVES]
        out_refs = refs[_NUM_LEAVES : 2 * _NUM_LEAVES]
        episodes_ref = refs[2 * _NUM_LEAVES]
        results_ref = refs[2 * _NUM_LEAVES + 1]
        obs_ref = refs[2 * _NUM_LEAVES + 2] if emit_obs else None
        if emit_obs and obs_dma:
            # trailing scratch args (scratch_shapes): 2-slot VMEM staging
            # buffer + per-slot DMA semaphores
            obs_scratch = refs[2 * _NUM_LEAVES + 3]
            obs_sem = refs[2 * _NUM_LEAVES + 4]

        prog = pl.program_id(0).astype(jnp.int32)
        seed = seed_ref[0, 0].astype(_U32)
        env = (
            prog.astype(_U32) * _U32(tile)
            + jax.lax.broadcasted_iota(_U32, (subl, lanes), 0) * _U32(lanes)
            + jax.lax.broadcasted_iota(_U32, (subl, lanes), 1)
        )

        state0 = jax.tree_util.tree_unflatten(
            treedef, [r[...] for r in in_refs]
        )
        init = _bit_reset_leaves(board_size)
        zero = jnp.zeros((subl, lanes), jnp.int32)

        def obs_dma_copy(k, slot):
            """Async copy of step ``k``'s staged planes to the HBM obs
            stream (rows [k*12P, (k+1)*12P), this tile's sublane range)."""
            return pltpu.make_async_copy(
                obs_scratch.at[slot],
                obs_ref.at[
                    pl.ds(k * 12 * p, 12 * p),
                    pl.ds(prog * subl, subl),
                    slice(None),
                ],
                obs_sem.at[slot],
            )

        def body(k, carry):
            bs, ep, r0, r1, r2, r3 = carry
            if emit_obs and obs_dma:
                # DOUBLE-BUFFERED obs streaming: stage this step's planes
                # in one of two VMEM slots and DMA them to HBM
                # asynchronously; only wait when the slot is needed again
                # two steps later.  VMEM holds 2 steps of obs instead of
                # the whole chunk (the round-3 VMEM-resident block capped
                # tile*num_steps and lost to the XLA path).
                slot = jax.lax.rem(k, 2)

                @pl.when(k >= 2)
                def _():
                    obs_dma_copy(k - 2, slot).wait()

                planes = _packed_obs_planes(bs)
                for j, plane in enumerate(planes):
                    obs_scratch[slot, pl.ds(j * p, p)] = plane
                obs_dma_copy(k, slot).start()
            elif emit_obs:
                # pre-move observation of every env, packed lane-major;
                # rows [k*12P, (k+1)*12P) of the obs output block
                planes = _packed_obs_planes(bs)
                for j, plane in enumerate(planes):
                    obs_ref[pl.ds(k * 12 * p + j * p, p)] = plane
            noise = _hash_u32(
                seed + _U32(2654435761) * (k.astype(_U32) + _U32(1))
            ) + env * _U32(0x9E3779B9)
            actions = _sample_bits_unrolled(bs, board_size, noise)
            nxt = step_bits(bs, board_size, actions)
            result = nxt.result
            done = result != geo.RESULT_OPEN
            nxt = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), init, nxt
            )
            d32 = jnp.where(done, 1, 0)
            ep = ep + d32
            r0 = r0 + jnp.where(done & (result == 0), 1, 0)
            r1 = r1 + jnp.where(done & (result == 1), 1, 0)
            r2 = r2 + jnp.where(done & (result == 2), 1, 0)
            r3 = r3 + jnp.where(done & (result == 3), 1, 0)
            return nxt, ep, r0, r1, r2, r3

        final, ep, r0, r1, r2, r3 = jax.lax.fori_loop(
            0, num_steps, body, (state0, zero, zero, zero, zero, zero)
        )
        if emit_obs and obs_dma:
            # drain the in-flight tail (the last min(2, num_steps) copies)
            for k in range(max(0, num_steps - 2), num_steps):
                obs_dma_copy(k, k % 2).wait()
        for r, v in zip(out_refs, jax.tree_util.tree_leaves(final)):
            r[...] = v
        episodes_ref[...] = ep
        results_ref[0] = r0
        results_ref[1] = r1
        results_ref[2] = r2
        results_ref[3] = r3

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("board_size", "num_steps", "tile", "interpret",
                     "emit_obs", "obs_dma", "tile_guard"),
)
def fused_bit_rollout(
    seed,
    board_size: int,
    num_steps: int,
    bs: BitState,
    *,
    tile: int = 1024,
    interpret: bool = False,
    emit_obs: bool = False,
    obs_dma: bool = False,
    tile_guard: bool = True,
):
    """``num_steps`` lockstep random-policy steps fully inside one Pallas
    kernel per batch tile, on the bitboard engine.

    ``bs`` uses the standard trailing 1-D batch layout ([..., B]); B must be
    divisible by ``tile`` (a multiple of 128).  Returns (final_state, stats)
    with the same interface and BIT-IDENTICAL results to
    ``bitboard.bit_random_rollout(seed, board_size, num_steps, bs)``.

    With ``emit_obs`` additionally returns the PRE-move packed FULL wire
    of every step — (final_state, stats, obs[T, 12, P, B] u32): the 12
    observation planes with the mover's legal plane in the free low bits,
    lane-major; decode observations with
    ``ops.observe.unpack_observation_lanes_nchw`` and the legal plane via
    ``ops.observe.legal_words_from_obs`` (on the plane axis).  Bit-equal
    to the XLA emission path (``bitboard.bit_rollout_emit_obs``
    ``packed=True``, batch-leading; pinned by
    tests/test_fused_bit.py).  The per-step
    planes are written straight from VMEM state, so HBM sees only the obs
    stream plus one read+write of the state per launch — the config-4
    learner feed without the XLA path's per-step state re-read/re-write.

    Two obs placements:

      * ``obs_dma=False`` — the obs output block lives in VMEM for the
        whole kernel (num_steps * 12 * P * tile * 4 bytes: caps
        num_steps * tile, e.g. 16 steps x tile 1024 at board 24 =
        23.6 MB; tile 2048 fails to compile);
      * ``obs_dma=True`` — the obs output stays in HBM and each step's
        planes are staged in a 2-slot VMEM scratch and streamed out with
        DOUBLE-BUFFERED async DMA (wait only when a slot is reused two
        steps later), so VMEM holds 2 steps of obs instead of the chunk
        and the tile/chunk ceiling is gone.  Bit-identical output
        (tests/test_fused_bit.py runs both arms).
    """
    batch = bs.current_player.shape[-1]
    assert bs.current_player.ndim == 1, "fused path expects 1-D env batch"
    assert batch % tile == 0, (batch, tile)
    grid = batch // tile
    lanes = min(128, tile)
    assert tile % lanes == 0
    subl = tile // lanes
    if (tile_guard and emit_obs and obs_dma and not interpret
            and (subl >= 64 or (subl >= 32 and grid >= 2))):
        # Measured Mosaic-crash region (scripts/repro_mosaic_dma_tile.py,
        # chip 2026-08-21): the compiler subprocess dies — no catchable
        # Python error — for 32-sublane tiles with grid >= 2 and for
        # >= 64-sublane tiles even at grid 1.  A bare DMA skeleton with
        # the same pattern compiles fine; the trigger is the engine body
        # at wide tiles.  Fail fast with the boundary instead.
        raise ValueError(
            f"obs_dma tile={tile} (sublanes={subl}) with grid={grid} is in "
            "the measured Mosaic-crash region (sublanes>=64, or "
            "sublanes>=32 with grid>=2); use tile<=2048, or tile==batch"
            "<=4096 — see scripts/repro_mosaic_dma_tile.py"
        )

    def to_kernel_dtype(x):
        if x.dtype == jnp.uint32:
            return x
        return x.astype(jnp.int32)

    leaves, treedef = _flatten(bs)
    state4 = [
        to_kernel_dtype(x).reshape(x.shape[:-1] + (batch // lanes, lanes))
        for x in leaves
    ]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    def bspec(x):
        shape = x.shape[:-2] + (subl, lanes)
        nlead = x.ndim - 2
        return pl.BlockSpec(shape, lambda i, _n=nlead: (0,) * _n + (i, 0))

    state_specs = [bspec(x) for x in state4]
    ep_spec = pl.BlockSpec((subl, lanes), lambda i: (i, 0))
    res_spec = pl.BlockSpec((4, subl, lanes), lambda i: (0, i, 0))

    out_shapes = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state4]
        + [
            jax.ShapeDtypeStruct((batch // lanes, lanes), jnp.int32),
            jax.ShapeDtypeStruct((4, batch // lanes, lanes), jnp.int32),
        ]
    )
    out_specs = state_specs + [ep_spec, res_spec]
    if emit_obs:
        p = padded_size(board_size)
        rows = num_steps * 12 * p
        out_shapes.append(
            jax.ShapeDtypeStruct((rows, batch // lanes, lanes), jnp.uint32)
        )
        if obs_dma:
            # whole obs stream stays in HBM; the kernel DMAs into its
            # tile's sublane range
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            out_specs.append(
                pl.BlockSpec((rows, subl, lanes), lambda i: (0, i, 0))
            )
    aliases = {j + 1: j for j in range(_NUM_LEAVES)}

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    if emit_obs and obs_dma:
        p = padded_size(board_size)
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((2, 12 * p, subl, lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    outs = pl.pallas_call(
        _make_kernel(board_size, num_steps, subl, lanes, treedef,
                     emit_obs=emit_obs, obs_dma=obs_dma),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0))] + state_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        **kwargs,
    )(seed_arr, *state4)

    new_leaves = [
        x.reshape(x.shape[:-2] + (batch,)).astype(ref.dtype)
        for x, ref in zip(outs[:_NUM_LEAVES], leaves)
    ]
    new_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    episodes = jnp.sum(outs[_NUM_LEAVES], dtype=jnp.int32)
    results = jnp.sum(outs[_NUM_LEAVES + 1], axis=(1, 2), dtype=jnp.int32)
    stats = {"episodes": episodes, "results": results}
    if emit_obs:
        p = padded_size(board_size)
        obs = outs[_NUM_LEAVES + 2].reshape(num_steps, 12, p, batch)
        return new_state, stats, obs
    return new_state, stats
