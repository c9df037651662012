"""Archived test of the superseded tensor-engine Pallas kernel.

Run manually: python -m pytest scripts/archive_test_fused_tensor.py -q
(The production fused kernel is ops/fused_bit_rollout.py; see docs/PERF.md.)

Fused Pallas rollout kernel: exact equivalence with the XLA step.

The kernel records every action it samples and every pre-reset result;
replaying those actions through the reference XLA path
(rollout.step_auto_reset) must reproduce the kernel's final state
bit-for-bit, and every recorded action must have been legal when taken.
Runs in Pallas interpreter mode on CPU with numerics identical to TPU
(counter-based in-kernel RNG).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twixt_for_open_spiel_tpu.ops import geometry as geo
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from archive_fused_tensor_rollout import (
    fused_random_rollout,
    rollout_stats,
)
from twixt_for_open_spiel_tpu.ops.rollout import (
    batch_reset,
    step_auto_reset,
)
from twixt_for_open_spiel_tpu.ops.state import legal_mask_flat


@pytest.mark.parametrize("n,b,tile,steps", [(5, 16, 8, 40), (8, 8, 8, 30)])
def test_fused_matches_xla_replay(n, b, tile, steps):
    state0 = batch_reset(n, b)
    final, actions, results = fused_random_rollout(
        7, n, steps, state0, tile=tile, interpret=True
    )
    actions = np.asarray(actions)
    results = np.asarray(results)

    # replay through the XLA path
    s = state0
    for k in range(steps):
        a = jnp.asarray(actions[k])
        # every sampled action must be legal for its env's current player
        p = jnp.clip(s.current_player, 0, 1)
        mask = np.asarray(legal_mask_flat(s, p, n))  # [A, B]
        for e in range(b):
            assert mask[actions[k, e], e], (k, e)
        s, done, result = step_auto_reset(s, a, n)
        assert np.array_equal(np.asarray(result), results[k]), k

    for name, kv, xv in zip(
        final._fields, final, s
    ):
        assert np.array_equal(np.asarray(kv), np.asarray(xv)), name


def test_fused_stats_consistent():
    n, b, tile, steps = 5, 16, 8, 60
    state0 = batch_reset(n, b)
    _, _, results = fused_random_rollout(
        3, n, steps, state0, tile=tile, interpret=True
    )
    stats = rollout_stats(results)
    hist = np.asarray(stats["results"])
    assert hist[geo.RESULT_OPEN] == 0
    assert hist.sum() == int(stats["episodes"])
    assert int(stats["episodes"]) > 0  # 5x5 games end within 60 plies


def test_fused_deterministic_and_seed_sensitive():
    n, b, tile, steps = 5, 16, 8, 20
    state0 = batch_reset(n, b)
    _, a1, _ = fused_random_rollout(11, n, steps, state0, tile=tile,
                                    interpret=True)
    _, a2, _ = fused_random_rollout(11, n, steps, state0, tile=tile,
                                    interpret=True)
    _, a3, _ = fused_random_rollout(12, n, steps, state0, tile=tile,
                                    interpret=True)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))
