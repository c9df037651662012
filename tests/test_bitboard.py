"""Bitboard engine equivalence: ops/bitboard.py vs the canonical engine.

The canonical tensor engine (ops/step.py) is the oracle-tested reference;
the bitboard engine must match it bit-for-bit on every state field after
every move of randomized full games (including swap), and its sampler must
only ever produce legal actions, uniformly.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.bitboard import (
    BitState,
    bit_random_rollout,
    bit_reset,
    bit_step_auto_reset,
    from_state,
    sample_bits,
    step_bits,
    to_state,
)
from twixt_for_open_spiel_tpu.ops.rollout import batch_reset
from twixt_for_open_spiel_tpu.ops.state import legal_mask_flat, reset
from twixt_for_open_spiel_tpu.ops.step import step


def assert_states_equal(a, b, msg=""):
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"{msg} field={name}"
        )


@pytest.mark.parametrize("n", [5, 8, 12])
def test_pack_unpack_roundtrip(n):
    s = reset(n)
    assert_states_equal(to_state(from_state(s), n), s)


@pytest.mark.parametrize("n", [5, 8])
def test_random_games_match_canonical(n):
    step_j = jax.jit(step, static_argnums=1)
    bstep_j = jax.jit(step_bits, static_argnums=1)
    rng = random.Random(42 + n)
    for gi in range(4):
        s = reset(n)
        bs = from_state(s)
        swap_done = False
        while int(s.result) == geo.RESULT_OPEN:
            p = int(s.current_player)
            mask = np.asarray(legal_mask_flat(s, p, n))
            la = [int(a) for a in np.nonzero(mask)[0]]
            if int(s.move_counter) == 1 and gi == 0 and not swap_done:
                a = int(s.move_one)  # force the swap branch once
                swap_done = True
            else:
                a = rng.choice(la)
            s = step_j(s, n, a)
            bs = bstep_j(bs, n, a)
            assert_states_equal(to_state(bs, n), s, msg=f"game {gi} act {a}")


def test_batched_step_matches_canonical():
    n, b = 5, 64
    s = batch_reset(n, b)
    bs = from_state(s)
    rng = np.random.RandomState(7)
    step_j = jax.jit(step, static_argnums=1)
    bstep_j = jax.jit(step_bits, static_argnums=1)
    for i in range(12):
        actions = []
        for e in range(b):
            p = int(s.current_player[e])
            mask = np.asarray(
                legal_mask_flat(
                    jax.tree_util.tree_map(lambda x: x[..., e], s), p, n
                )
            )
            actions.append(rng.choice(np.nonzero(mask)[0]))
        acts = jnp.asarray(np.array(actions, np.int32))
        s = step_j(s, n, acts)
        bs = bstep_j(bs, n, acts)
        assert_states_equal(to_state(bs, n), s, msg=f"lockstep {i}")
        # stop before any env terminates (12 moves < min win length on 5x5
        # is not guaranteed; bail out if any env ended)
        if np.any(np.asarray(s.result) != geo.RESULT_OPEN):
            break


def test_sample_bits_legal_and_uniform():
    n, b = 5, 4096
    bs = bit_reset(n, b)
    noise = jnp.arange(b, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    acts = np.asarray(sample_bits(bs, n, noise))
    mask = np.asarray(legal_mask_flat(reset(n), 0, n))
    legal_ids = np.nonzero(mask)[0]
    assert set(acts) <= set(legal_ids.tolist())
    # roughly uniform over the 15 initial legal cells of red on 5x5
    counts = np.bincount(acts, minlength=n * n)[legal_ids]
    expected = b / len(legal_ids)
    assert counts.min() > 0.5 * expected
    assert counts.max() < 1.7 * expected


def test_bit_rollout_completes_episodes():
    n, b, steps = 5, 64, 64
    bs = bit_reset(n, b)
    final, stats = bit_random_rollout(123, n, steps, bs)
    episodes = int(stats["episodes"])
    results = np.asarray(stats["results"])
    assert episodes > 0
    assert results[geo.RESULT_OPEN] == 0
    assert results[1:].sum() == episodes
    assert not np.any(np.asarray(final.result) != geo.RESULT_OPEN)


def test_bit_rollout_states_stay_valid():
    # after a rollout, every live env's state must unpack to a state that the
    # canonical engine accepts and whose invariants hold
    n, b, steps = 5, 32, 40
    final, _ = bit_random_rollout(9, n, steps, bit_reset(n, b))
    s = to_state(final, n)
    colors = np.asarray(s.color)
    assert set(np.unique(colors)) <= {
        geo.COLOR_RED, geo.COLOR_BLUE, geo.COLOR_EMPTY, geo.COLOR_OFFBOARD
    }
    # links are symmetric: bit d at (x,y) implies bit opp(d) at neighbor
    links = np.asarray(s.links)
    for d in range(8):
        dx, dy = (int(v) for v in geo.OFFSETS[d])
        has = (links >> d) & 1
        partner = (links >> geo.opp_dir(d)) & 1
        rolled = np.roll(np.roll(partner, -dx, axis=0), -dy, axis=1)
        np.testing.assert_array_equal(has, has & rolled)


@pytest.mark.parametrize("n", [5, 8, 12])
def test_bit_observation_and_legal_mask_match_canonical(n):
    """The bit-native observation / flat legal mask (the self-play stack's
    inputs, ops/observe.bit_observation + ops/bitboard.bit_legal_mask_flat)
    must equal the canonical paths on every state of random games."""
    from twixt_for_open_spiel_tpu.ops.bitboard import bit_legal_mask_flat
    from twixt_for_open_spiel_tpu.ops.observe import (
        bit_observation,
        observation,
    )

    rng = random.Random(n)
    s = reset(n)
    for mv in range(30):
        if int(s.result) != geo.RESULT_OPEN:
            break
        p = max(0, min(1, int(s.current_player)))
        acts = np.nonzero(np.asarray(legal_mask_flat(s, p, n)))[0]
        s = step(s, n, int(rng.choice(list(acts))))
        bs = from_state(s)
        for q in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(bit_legal_mask_flat(bs, q, n)),
                np.asarray(legal_mask_flat(s, q, n)),
                err_msg=f"legal n={n} mv={mv} player={q}",
            )
        np.testing.assert_array_equal(
            np.asarray(bit_observation(bs, n)),
            np.asarray(observation(s, n)),
            err_msg=f"obs n={n} mv={mv}",
        )


@pytest.mark.parametrize("n", list(range(5, 25)))
def test_bit_observation_nchw_packed_transpose_path(n):
    """The packed observation encoding and its learner-side decode (the
    config-4 wire format: ops/observe.bit_observation_packed ->
    unpack_observation_nchw, also the fast path inside
    bit_observation_nchw) must be bit-identical to
    moveaxis(bit_observation(...)) on random mid-game batches at EVERY
    board size 5-24, in both f32 and bf16, including the [T, B, 12, P]
    leading-dims decode."""
    import jax.numpy as jnp

    from twixt_for_open_spiel_tpu.ops.observe import (
        bit_observation,
        bit_observation_nchw,
        bit_observation_packed,
        bit_observation_packed_lanes,
        unpack_observation_lanes_nchw,
        unpack_observation_nchw,
    )

    rng = random.Random(100 + n)
    states = []
    for k in range(3):
        s = reset(n)
        for _ in range(rng.randrange(1, 2 * n)):
            if int(s.result) != geo.RESULT_OPEN:
                break
            p = max(0, min(1, int(s.current_player)))
            acts = np.nonzero(np.asarray(legal_mask_flat(s, p, n)))[0]
            s = step(s, n, int(rng.choice(list(acts))))
        states.append(s)
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=-1), *states
    )
    bs = from_state(batch)
    pk = bit_observation_packed(bs, n)
    for dtype in (jnp.float32, jnp.bfloat16):
        ref = np.moveaxis(np.asarray(bit_observation(bs, n, dtype)), -1, 0)
        got = np.asarray(bit_observation_nchw(bs, n, dtype))
        np.testing.assert_array_equal(got, ref, err_msg=f"n={n} {dtype}")
        dec = np.asarray(unpack_observation_nchw(pk, n, dtype))
        np.testing.assert_array_equal(dec, ref, err_msg=f"packed n={n}")
    # leading-dims decode: [T, B, 12, P] with T=2 stacked copies
    two = jnp.stack([pk, pk])
    dec2 = np.asarray(unpack_observation_nchw(two, n, jnp.bfloat16))
    ref2 = np.asarray(bit_observation_nchw(bs, n, jnp.bfloat16))
    np.testing.assert_array_equal(dec2[0], ref2)
    np.testing.assert_array_equal(dec2[1], ref2)
    # lane-major wire format (the config-4 primary / Sample.obs layout):
    # [12, P, B] and its [T, 12, P, B] decode
    lanes = bit_observation_packed_lanes(bs, n)
    dec3 = np.asarray(unpack_observation_lanes_nchw(lanes, n, jnp.bfloat16))
    np.testing.assert_array_equal(dec3, ref2, err_msg=f"lanes n={n}")
    two_l = jnp.stack([lanes, lanes])
    dec4 = np.asarray(
        unpack_observation_lanes_nchw(two_l, n, jnp.bfloat16)
    )
    np.testing.assert_array_equal(dec4[0], ref2)
    np.testing.assert_array_equal(dec4[1], ref2)
