"""Pallas fused multi-step rollout: the whole env loop in one TPU kernel.

STATUS: correct but EXPERIMENTAL — the XLA path (ops/rollout.py) is the
production path.  The kernel is validated bit-exactly against the XLA step
(it records every sampled action; tests replay them and require identical
final state, in interpreter mode and on hardware), but on v5e it currently
loses to XLA: Mosaic materializes each of the step's ~80 concat-based board
shifts as a real VMEM copy, where XLA fuses shifted *reads* into one pass.
Making it win requires reformulating the inner step without whole-board
shifts (sub-window arithmetic), left for a later round.  Getting it to lower
at all needed several Mosaic v5e workarounds, kept as documentation:
int32-only kernel state (no 8-bit vectors / bool IO / bool-branch selects),
iota-derived constants (no captured arrays), no added unit dims (no
tpu.reshape), 2-D (sublane, lane) batch tiles (a trailing unit dim forces
T(1,128) tiling), and a raised scoped-vmem cap for the unrolled
intermediates.

The motivation stands: the XLA path re-reads and re-writes the full env
state from HBM on every lockstep step, while this kernel keeps each batch
tile's state resident in VMEM across ``num_steps`` steps — per launch, HBM
traffic is one read + one write of the state plus the recorded
actions/results, the speed-of-light schedule for this workload.

Structure:
  * grid over env-batch tiles (``tile`` lanes each, multiple of 128);
  * the kernel reuses the *exact same* batch-polymorphic transition code as
    the XLA path (``step_impl`` from ops/step.py, auto-reset from
    ops/rollout.py) with batch shape (1, tile) — the board ops are
    concat-shifts / masked reduces that Mosaic lowers directly;
  * action sampling is Gumbel-max over the legal mask in *board shape*
    (max-reduce + min-index trick, no reshape, no argmax primitive);
  * RNG is a counter-based xorshift-multiply hash (SplitMix/Murmur-style
    finalizer) keyed on (seed, program, step, cell) — portable across
    Mosaic and interpret mode, bit-identical on TPU and CPU;
  * the kernel records every sampled action and pre-reset result, so tests
    replay the recorded actions through the XLA step and require
    bit-identical final state (tests/test_fused.py).

The engine-state buffers are aliased input->output, so the launch is
in-place on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import State, reset
from twixt_for_open_spiel_tpu.ops.step import step_impl

_U32 = jnp.uint32


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SplitMix/Murmur-style avalanche over uint32 (counter-based RNG)."""
    x = x ^ (x >> _U32(16))
    x = x * _U32(0x7FEB352D)
    x = x ^ (x >> _U32(15))
    x = x * _U32(0x846CA68B)
    x = x ^ (x >> _U32(16))
    return x


def _gumbel_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    # top 24 bits -> uniform in (0, 1), then standard Gumbel; the hop via
    # int32 exists because Mosaic has no direct uint32 -> float32 cast
    u = (
        (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
        * (1.0 / 16777216.0)
    )
    u = jnp.maximum(u, 1e-7)
    return -jnp.log(-jnp.log(u))


def _sample_actions(state: State, board_size: int, noise_base):
    """Gumbel-max uniform legal action per env, in board shape.

    state leaves are [P, P, 1, T]; returns int32 [1, T] action ids.
    Ties impossible almost surely; resolved to the smallest action id like
    argmax, via the max + min-index trick (only max/min reduces needed).
    """
    p = jnp.clip(state.current_player, 0, 1)  # [1, T]
    # select on the int32 masks, THEN compare — Mosaic cannot lower selects
    # whose branches are boolean vectors
    legal = (
        jnp.where(
            (p == 0)[None, None],
            state.legal[0].astype(jnp.int32),
            state.legal[1].astype(jnp.int32),
        )
        != 0
    )  # [P, P, 1, T]
    pp = legal.shape[0]
    # per-cell / per-env counters (env id composed over all batch dims)
    cell = (
        jax.lax.broadcasted_iota(_U32, legal.shape, 0) * _U32(pp)
        + jax.lax.broadcasted_iota(_U32, legal.shape, 1)
    )
    env = jnp.zeros(legal.shape, _U32)
    for dim in range(2, legal.ndim):
        env = env * _U32(legal.shape[dim]) + jax.lax.broadcasted_iota(
            _U32, legal.shape, dim
        )
    bits = _hash_u32(
        cell * _U32(0x9E3779B9) + env * _U32(0x85EBCA6B) + noise_base
    )
    g = _gumbel_from_bits(bits)
    scores = jnp.where(legal, g, -jnp.inf)
    m = jnp.max(scores, axis=(0, 1))  # [1, T]
    # board-coordinate action index map (halo gets an out-of-range id)
    xs = jax.lax.broadcasted_iota(jnp.int32, legal.shape, 0) - geo.PAD
    ys = jax.lax.broadcasted_iota(jnp.int32, legal.shape, 1) - geo.PAD
    idx = xs * board_size + ys
    big = jnp.int32(1 << 20)
    sel = legal & (scores == m[None, None])
    action = jnp.min(jnp.where(sel, idx, big), axis=(0, 1))
    return action.astype(jnp.int32)


def _auto_reset(nxt: State, board_size: int):
    done = nxt.result != geo.RESULT_OPEN
    # int32 leaves at full rank with broadcast batch dims (1, 1): matches
    # the kernel state dtypes/ranks with no reshape (Mosaic can't reshape)
    init = reset(board_size, wide=True, bshape=(1, 1))
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(done, a, b), init, nxt
    )
    return out, nxt.result


# Engine-state dtypes inside the kernel: Mosaic v5e vectors support only
# i16/i32/f32/pred (no 8-bit arithmetic, and selects with boolean BRANCHES
# lower through unsupported i8<->i1 casts), so ALL kernel state is int32 —
# the batch-polymorphic step code is dtype-agnostic and handles the bool
# (XLA path) and int32 (kernel) mask representations alike.


_STATE_FIELDS = list(State._fields)
_NUM_LEAVES = len(_STATE_FIELDS)


def _make_kernel(board_size: int, num_steps: int):
    def kernel(seed_ref, *refs):
        in_refs = refs[:_NUM_LEAVES]
        out_refs = refs[_NUM_LEAVES : 2 * _NUM_LEAVES]
        actions_ref = refs[2 * _NUM_LEAVES]
        results_ref = refs[2 * _NUM_LEAVES + 1]

        prog = pl.program_id(0).astype(jnp.int32)
        seed = (seed_ref[0, 0] + prog * jnp.int32(0x01000193)).astype(_U32)

        state0 = State(*[r[...] for r in in_refs])

        def body(k, state):
            noise = _hash_u32(
                seed + _U32(2654435761) * (k.astype(_U32) + _U32(1))
            )
            actions = _sample_actions(state, board_size, noise)
            nxt = step_impl(state, board_size, actions)
            nxt, result = _auto_reset(nxt, board_size)
            actions_ref[pl.ds(k, 1)] = actions[None]
            results_ref[pl.ds(k, 1)] = result[None]
            return nxt

        final = jax.lax.fori_loop(0, num_steps, body, state0)
        for r, v in zip(out_refs, final):
            r[...] = v.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("board_size", "num_steps", "tile", "interpret")
)
def fused_random_rollout(
    seed,
    board_size: int,
    num_steps: int,
    state: State,
    *,
    tile: int = 256,
    interpret: bool = False,
):
    """Run ``num_steps`` lockstep random-policy steps fully inside one
    Pallas kernel per batch tile.

    ``state`` uses the standard trailing-batch layout ([..., B]); B must be
    divisible by ``tile``.  Returns (final_state, actions [K, B] int32,
    results [K, B] int32) where ``results`` holds the pre-reset result of
    every transition (RESULT_OPEN if the episode continued).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests) with identical numerics.
    """
    batch = state.current_player.shape[-1]
    assert batch % tile == 0, (batch, tile)
    grid = batch // tile

    # kernel-internal batch shape: 2-D (sublanes, lanes) so the minor two
    # dims tile as full (8, 128) vregs — a trailing unit dim would force
    # T(1,128) tiling and waste 7/8 of the sublanes.
    lanes = min(128, tile)
    assert tile % lanes == 0
    subl = tile // lanes  # sublane rows per program

    # all IO is int32 (Mosaic has no 8-bit vectors and bool IO/selects fail
    # to lower), converted here in XLA — a per-launch cost, amortised over
    # num_steps.
    state4 = jax.tree_util.tree_map(
        lambda x: x.reshape(
            x.shape[:-1] + (batch // lanes, lanes)
        ).astype(jnp.int32),
        state,
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    def bspec(x):
        shape = x.shape[:-2] + (subl, lanes)
        nlead = x.ndim - 2
        return pl.BlockSpec(shape, lambda i, _n=nlead: (0,) * _n + (i, 0))

    state_specs = [bspec(x) for x in state4]
    seq_spec = pl.BlockSpec((num_steps, subl, lanes), lambda i: (0, i, 0))

    out_shapes = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state4]
        + [
            jax.ShapeDtypeStruct(
                (num_steps, batch // lanes, lanes), jnp.int32
            ),
            jax.ShapeDtypeStruct(
                (num_steps, batch // lanes, lanes), jnp.int32
            ),
        ]
    )
    out_specs = state_specs + [seq_spec, seq_spec]

    # alias the state buffers in-place: input j+1 -> output j
    aliases = {j + 1: j for j in range(_NUM_LEAVES)}

    kwargs = {}
    if not interpret:
        # the unrolled step keeps ~dozens of whole-board intermediates live;
        # raise Mosaic's default 16M scoped-vmem cap toward the physical
        # budget of the core
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    outs = pl.pallas_call(
        _make_kernel(board_size, num_steps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0))] + state_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        **kwargs,
    )(seed_arr, *state4)

    new_state4 = State(*outs[:_NUM_LEAVES])
    new_state = State(
        *[
            x.reshape(x.shape[:-2] + (batch,)).astype(ref.dtype)
            for x, ref in zip(new_state4, state)
        ]
    )
    actions = outs[_NUM_LEAVES].reshape(num_steps, batch)
    results = outs[_NUM_LEAVES + 1].reshape(num_steps, batch)
    return new_state, actions, results


def rollout_stats(results: jnp.ndarray):
    """Episode counters from the recorded per-step results ([K, B] int32)."""
    done = results != geo.RESULT_OPEN
    episodes = jnp.sum(done, dtype=jnp.int32)
    hist = jnp.stack(
        [
            jnp.sum(done & (results == r), dtype=jnp.int32)
            for r in range(4)
        ]
    )
    return {"episodes": episodes, "results": hist}
