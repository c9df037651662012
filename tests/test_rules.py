"""Ports of the reference's rule-specific unit tests
(TwixtSwapTest / TwixtLegalActionsTest / TwixtDrawTest,
reference twixt_test.cc:108-199), driven against the raw tensor ops.
"""

import numpy as np

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import reset, legal_mask_flat
from twixt_for_open_spiel_tpu.ops.step import step, returns, is_terminal


def legal_list(state, n):
    p = int(state.current_player)
    mask = np.asarray(legal_mask_flat(state, p, n))
    return [int(a) for a in np.nonzero(mask)[0]]


def test_swap():  # reference twixt_test.cc:108-131
    n = 8
    s = reset(n)
    assert int(s.current_player) == 0
    assert 11 in legal_list(s, n)
    s = step(s, n, 19)  # player 0: xc5 [2,3]

    assert int(s.current_player) == 1
    s = step(s, n, 19)  # player 1 swaps: od3 replaces xc5

    assert bool(s.swapped)
    la = legal_list(s, n)
    assert 19 in la       # c5 empty again
    assert 29 not in la   # d3 occupied (rotated position)

    assert int(s.current_player) == 0
    s = step(s, n, 36)  # player 0: e4

    la = legal_list(s, n)
    assert 19 in la
    assert 29 not in la
    assert 36 not in la


def test_legal_actions_and_win():  # reference twixt_test.cc:133-183
    n = 8
    s = reset(n)
    assert not bool(is_terminal(s))
    assert len(legal_list(s, n)) == 48

    s = step(s, n, 21)  # xc3
    # 48 for player 1: c3 stays legal during the swap window
    assert len(legal_list(s, n)) == 48

    s = step(s, n, 38)  # oe2 (no swap)
    assert len(legal_list(s, n)) == 46

    s = step(s, n, 15)  # xb1 (red end line)
    assert len(legal_list(s, n)) == 46

    s = step(s, n, 11)  # ob5
    assert len(legal_list(s, n)) == 44

    # 11 is now illegal for player 0
    assert 11 not in legal_list(s, n)

    s = step(s, n, 27)  # xd5
    assert len(legal_list(s, n)) == 44

    s = step(s, n, 17)  # oc7
    assert len(legal_list(s, n)) == 42

    s = step(s, n, 42)  # xf6
    assert len(legal_list(s, n)) == 42

    s = step(s, n, 45)  # of3
    assert len(legal_list(s, n)) == 40

    s = step(s, n, 48)  # xg8 wins
    assert bool(is_terminal(s))
    r = np.asarray(returns(s))
    assert r[0] == 1.0 and r[1] == -1.0
    assert int(s.result) == geo.RESULT_RED_WIN
    assert int(s.current_player) == geo.TERMINAL_PLAYER_ID


def test_draw():  # reference twixt_test.cc:185-199
    n = 5
    s = reset(n)
    moves = 0
    while not bool(is_terminal(s)):
        # the ascending-order .at(0)/.at(1) pattern produces a draw on 5x5
        la = legal_list(s, n)
        s = step(s, n, la[0])
        if bool(is_terminal(s)):
            break
        la = legal_list(s, n)
        s = step(s, n, la[1])
        moves += 2
        assert moves < 100
    r = np.asarray(returns(s))
    assert r[0] == 0.0 and r[1] == 0.0
    assert int(s.result) == geo.RESULT_DRAW


def test_swap_window_closes():
    # playing a different second move forfeits the swap permanently
    n = 8
    s = reset(n)
    s = step(s, n, 19)
    s = step(s, n, 36)  # no swap
    la = legal_list(s, n)
    assert 19 not in la and 36 not in la
    assert not bool(s.swapped)


def test_red_endline_not_swappable():
    # red plays its own border; that action is never in blue's legal set
    n = 8
    s = reset(n)
    s = step(s, n, 15)  # xb1 (y = 7 -> red end border)
    assert 15 not in legal_list(s, n)
