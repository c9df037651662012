"""Native C host engine (native/engine.c): behavioural equality against the
independent Python oracle and the reference's hand-pinned scenarios.

Closes the cross-check triangle: the JAX engines are pinned against the
oracle (test_vs_oracle.py), and the native engine is pinned against the
oracle here — all four implementations (tensor, bitboard, oracle, C) agree
on identical trajectories.
"""

import random

import numpy as np
import pytest

from twixt_for_open_spiel_tpu.native.engine import (
    NativeEngine,
    load_engine,
    random_game,
    random_games,
)

from oracle import DRAW, OPEN, OracleGame

needs_engine = pytest.mark.skipif(
    load_engine() is None, reason="no C compiler available"
)


def oracle_snapshot(o: OracleGame):
    """Flat (color, links, blocked, flags) arrays in the C engine's layout."""
    n = o.n
    color = np.full(n * n, 3, np.int8)
    links = np.zeros(n * n, np.uint8)
    blocked = np.zeros(n * n, np.uint8)
    flags = np.zeros(n * n, np.uint8)
    for (x, y), c in o.color.items():
        color[x * n + y] = c
    for (x, y), ds in o.links.items():
        for d in ds:
            links[x * n + y] |= 1 << d
    for (x, y), ds in o.blocked.items():
        for d in ds:
            blocked[x * n + y] |= 1 << d
    for (x, y), fs in o.flags.items():
        for p, b in fs:
            flags[x * n + y] |= 1 << (p * 2 + b)
    return color, links, blocked, flags


@needs_engine
@pytest.mark.parametrize("n", [5, 8, 12, 24])
def test_random_trajectories_match_oracle(n):
    for seed in range(4):
        rng = random.Random(1000 * n + seed)
        eng = NativeEngine(n)
        ora = OracleGame(n)
        while not ora.is_terminal():
            la_o = ora.legal_actions()
            la_e = eng.legal_actions()
            assert la_o == la_e
            a = rng.choice(la_o)
            # bias toward the swap on move 2 to exercise that path (only
            # possible when move one is legal for blue, i.e. off blue's
            # forbidden border rows)
            if ora.move_counter == 1 and rng.random() < 0.5:
                swap_a = ora.move_one[0] * n + ora.move_one[1]
                if swap_a in la_o:
                    a = swap_a
            ora.apply(a)
            eng.apply(a)
            assert eng.current == ora.current
            assert eng.move_counter == ora.move_counter
            assert eng.result == ora.result
            assert eng.swapped == ora.swapped
        assert eng.is_terminal()
        assert eng.returns() == ora.returns()
        for got, want in zip(eng.snapshot(), oracle_snapshot(ora)):
            np.testing.assert_array_equal(got, want)


@needs_engine
def test_swap_scenario():
    """Reference TwixtSwapTest (twixt_test.cc:108-131): 19 then 19 on 8x8
    swaps; c5 (19) is legal again, rotated d3 (29) is not."""
    eng = NativeEngine(8)
    eng.apply(19)
    assert 19 in eng.legal_actions()  # move one stays legal for one ply
    eng.apply(19)
    assert eng.swapped
    la = eng.legal_actions()
    assert 19 in la
    assert 29 not in la


@needs_engine
def test_draw_scenario():
    """Reference TwixtDrawTest (twixt_test.cc:185-199): 5x5, .at(0)/.at(1)."""
    eng = NativeEngine(5)
    i = 0
    while not eng.is_terminal():
        la = eng.legal_actions()
        eng.apply(la[min(i % 2, len(la) - 1)])
        i += 1
    assert eng.result == DRAW
    assert eng.returns() == [0.0, 0.0]


@needs_engine
def test_win_line():
    """Reference TwixtLegalActionsTest win line: red wins with returns
    {1,-1} (twixt_test.cc:163-183)."""
    eng = NativeEngine(8)
    for a in [21, 38, 15, 11, 27, 17, 42, 45, 48]:
        eng.apply(a)
    assert eng.is_terminal()
    assert eng.returns() == [1.0, -1.0]


@needs_engine
def test_illegal_action_rejected():
    eng = NativeEngine(8)
    with pytest.raises(ValueError, match="Not a legal action: 0"):
        eng.apply(0)  # corner, never legal


@needs_engine
@pytest.mark.parametrize("n", [5, 8, 24])
def test_c_random_games_replay_through_oracle(n):
    """Games generated entirely inside C must be legal move-for-move in the
    oracle and end with the same result."""
    for seed in (7, 8):
        actions, result = random_game(n, seed)
        ora = OracleGame(n)
        for a in actions:
            assert a in ora.legal_actions()
            ora.apply(a)
        assert ora.is_terminal()
        assert ora.result == result


@needs_engine
def test_random_games_batch_counts():
    total, results = random_games(5, 3, 50)
    assert results[OPEN] == 0
    assert sum(results) == 50
    assert total >= 50  # at least one move per game


@needs_engine
@pytest.mark.parametrize("n", [5, 8, 12])
def test_c_games_batch_replay_through_bit_engine(n):
    """Soak: trajectories generated entirely inside the C host engine replay
    through the batched jitted bit engine (ops/replay.py) and must land on
    identical results AND identical final boards (color/links/blocked/flags
    on the inner board), game by game."""
    from twixt_for_open_spiel_tpu.ops import geometry as geo
    from twixt_for_open_spiel_tpu.ops.bitboard import to_state
    from twixt_for_open_spiel_tpu.ops.replay import bit_replay

    games = 64
    histories, c_results, c_snaps = [], [], []
    for seed in range(games):
        eng = NativeEngine(n)
        actions, result = random_game(n, 1000 * n + seed)
        for a in actions:
            eng.apply(a)
        assert eng.result == result
        histories.append(actions)
        c_results.append(result)
        c_snaps.append(eng.snapshot())

    t_max = max(len(h) for h in histories)
    padded = np.full((t_max, games), -1, np.int32)
    for b, h in enumerate(histories):
        padded[:, b] = np.asarray(h + [-1] * (t_max - len(h)), np.int32)

    final = bit_replay(n, padded)
    np.testing.assert_array_equal(
        np.asarray(final.result), np.asarray(c_results, np.int32)
    )
    s = to_state(final, n)
    inner = slice(geo.PAD, geo.PAD + n)
    color = np.asarray(s.color)[inner, inner]
    links = np.asarray(s.links)[inner, inner]
    blocked = np.asarray(s.blocked)[inner, inner]
    flags = np.asarray(s.flags)[inner, inner]
    for b in range(games):
        c_color, c_links, c_blocked, c_flags = (
            a.reshape(n, n) for a in c_snaps[b]
        )
        np.testing.assert_array_equal(color[..., b], c_color)
        np.testing.assert_array_equal(links[..., b], c_links)
        np.testing.assert_array_equal(blocked[..., b], c_blocked)
        np.testing.assert_array_equal(flags[..., b], c_flags)
