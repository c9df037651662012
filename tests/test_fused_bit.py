"""Fused bitboard Pallas rollout: BIT-IDENTICAL to the XLA bitboard path.

Unlike the tensor-engine kernel (test_fused.py, replay-validated), the
bitboard kernel shares the production ``step_bits`` transition and a
selection-rule-identical sampler with the same RNG counters, so for any
seed the final state and episode statistics must equal
``bit_random_rollout`` exactly.  Runs the Pallas interpreter on CPU with
numerics identical to TPU.
"""

import jax
import numpy as np
import pytest

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.bitboard import (
    bit_random_rollout,
    bit_reset,
    to_state,
)
from twixt_for_open_spiel_tpu.ops.fused_bit_rollout import (
    _popcount_u32,
    fused_bit_rollout,
)


def test_swar_popcount_matches_lax():
    import jax.numpy as jnp

    x = jax.random.bits(jax.random.PRNGKey(0), (4096,), jnp.uint32)
    want = jax.lax.population_count(x).astype(jnp.int32)
    got = _popcount_u32(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n,b,tile,steps,seed",
    [(5, 256, 128, 60, 3), (8, 256, 256, 50, 11), (12, 128, 128, 40, 7)],
)
def test_fused_bit_matches_xla_rollout(n, b, tile, steps, seed):
    bs0 = bit_reset(n, b)
    f_x, s_x = bit_random_rollout(seed, n, steps, bs0)
    f_k, s_k = fused_bit_rollout(
        seed, n, steps, bs0, tile=tile, interpret=True
    )

    assert int(s_x["episodes"]) == int(s_k["episodes"])
    np.testing.assert_array_equal(
        np.asarray(s_x["results"]), np.asarray(s_k["results"])
    )
    lx = jax.tree_util.tree_leaves(f_x)
    lk = jax.tree_util.tree_leaves(f_k)
    assert len(lx) == len(lk)
    for a, b_ in zip(lx, lk):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # episodes actually completed (the comparison exercised terminal states)
    assert int(s_x["episodes"]) > 0 or n >= 12


def test_fused_bit_multi_tile_grid():
    # grid > 1: per-tile seeds must still follow the global env-id stream
    n, b, tile, steps = 5, 512, 128, 45
    bs0 = bit_reset(n, b)
    f_x, s_x = bit_random_rollout(5, n, steps, bs0)
    f_k, s_k = fused_bit_rollout(5, n, steps, bs0, tile=tile, interpret=True)
    assert int(s_x["episodes"]) == int(s_k["episodes"]) > 0
    for a, b_ in zip(
        jax.tree_util.tree_leaves(f_x), jax.tree_util.tree_leaves(f_k)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # unpacked surfaces agree too (sanity on the conversion path)
    sx = to_state(f_x, n)
    sk = to_state(f_k, n)
    np.testing.assert_array_equal(np.asarray(sx.color), np.asarray(sk.color))
    assert np.asarray(sx.result).min() >= geo.RESULT_OPEN


def test_fused_bit_emit_obs_dma_matches_vmem():
    # The double-buffered DMA obs stream (obs_dma=True) must be
    # bit-identical to the VMEM-block emission, final states included.
    n, b, tile, steps = 5, 256, 128, 30
    bs0 = bit_reset(n, b)
    f_v, s_v, obs_v = fused_bit_rollout(
        9, n, steps, bs0, tile=tile, interpret=True, emit_obs=True
    )
    f_d, s_d, obs_d = fused_bit_rollout(
        9, n, steps, bs0, tile=tile, interpret=True, emit_obs=True,
        obs_dma=True,
    )
    assert int(s_v["episodes"]) == int(s_d["episodes"]) > 0
    np.testing.assert_array_equal(np.asarray(obs_v), np.asarray(obs_d))
    for a, b_ in zip(
        jax.tree_util.tree_leaves(f_v), jax.tree_util.tree_leaves(f_d)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_obs_dma_tile_guard():
    # The measured Mosaic-crash region (scripts/repro_mosaic_dma_tile.py:
    # obs_dma with sublanes>=64, or sublanes>=32 with grid>=2) must fail
    # fast with a clear error instead of killing the compiler subprocess.
    n = 24
    for batch, tile in [(8192, 4096), (8192, 8192)]:
        bs0 = bit_reset(n, batch)
        with pytest.raises(ValueError, match="Mosaic-crash region"):
            fused_bit_rollout(
                0, n, 4, bs0, tile=tile, emit_obs=True, obs_dma=True
            )
    # interpret mode and the supported region are NOT guarded
    bs0 = bit_reset(5, 256)
    fused_bit_rollout(
        3, 5, 4, bs0, tile=128, interpret=True, emit_obs=True, obs_dma=True
    )


def test_fused_bit_emit_obs_matches_xla_packed():
    # The fused kernel's per-step packed obs stream (emit_obs=True, the
    # config-4 fast path) must be bit-identical to the XLA emission
    # (bit_rollout_emit_obs packed=True) for the same seed, INCLUDING
    # steps where auto-reset fired mid-chunk, and the final states must
    # stay bit-equal.
    from twixt_for_open_spiel_tpu.ops.bitboard import bit_rollout_emit_obs

    n, b, tile, steps = 5, 256, 128, 30
    bs0 = bit_reset(n, b)
    f_k, s_k, obs_k = fused_bit_rollout(
        9, n, steps, bs0, tile=tile, interpret=True, emit_obs=True
    )
    f_x, s_x, obs_x = bit_rollout_emit_obs(9, n, steps, bs0, packed=True)
    assert int(s_x["episodes"]) == int(s_k["episodes"]) > 0
    p = obs_k.shape[2]
    # both paths emit the FULL wire (obs planes + stowaway legal in the
    # free low bits); XLA is batch-leading coalesced [T, B, 12*P], the
    # kernel lane-major [T, 12, P, B]
    ref = (
        np.asarray(obs_x)
        .reshape(steps, b, 12, p)
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(np.asarray(obs_k), ref)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(f_x), jax.tree_util.tree_leaves(f_k)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
