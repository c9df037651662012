"""Randomized full-game cross-check of the tensor engine vs the independent
Python oracle — the stand-in for OpenSpiel's RandomSimTest
(reference twixt_test.cc:28; SURVEY.md §4.1).

Every step compares the observable surfaces: legal-action lists (ascending
order), current player, terminality, result, returns, and the raw board
fields (colors / links / blocked bits) that feed the observation tensor.
"""

import random

import numpy as np
import pytest

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import reset, legal_mask_flat
from twixt_for_open_spiel_tpu.ops.step import step, returns, is_terminal

from oracle import OracleGame


def core(arr, n):
    return np.asarray(arr)[geo.PAD : geo.PAD + n, geo.PAD : geo.PAD + n]


def check_match(s, g, n):
    # colors
    eng_color = core(s.color, n)
    for x in range(n):
        for y in range(n):
            assert eng_color[x, y] == g.color[(x, y)], (x, y)
    # links / blocked
    eng_links = core(s.links, n)
    eng_blocked = core(s.blocked, n)
    for (x, y), ds in g.links.items():
        want = sum(1 << d for d in ds)
        assert eng_links[x, y] == want, ("links", x, y)
    for (x, y), ds in g.blocked.items():
        want = sum(1 << d for d in ds)
        assert eng_blocked[x, y] == want, ("blocked", x, y)
    # bookkeeping
    assert bool(is_terminal(s)) == g.is_terminal()
    assert int(s.result) == g.result
    assert np.asarray(returns(s)).tolist() == g.returns()
    if not g.is_terminal():
        p = int(s.current_player)
        assert p == g.current
        mask = np.asarray(legal_mask_flat(s, p, n))
        assert [int(a) for a in np.nonzero(mask)[0]] == g.legal_actions()


@pytest.mark.parametrize("n", [5, 6, 8, 12, 17, 24])
def test_random_games_match_oracle(n):
    rng = random.Random(1234 + n)
    games = 6 if n <= 8 else (3 if n <= 12 else 1)
    for gi in range(games):
        s = reset(n)
        g = OracleGame(n)
        check_match(s, g, n)
        swap_tried = False
        while not g.is_terminal():
            la = g.legal_actions()
            # bias one game per size towards exercising the swap rule
            if g.move_counter == 1 and gi == 0 and not swap_tried:
                a = g.move_one[0] * n + g.move_one[1]
                if a not in la:
                    a = rng.choice(la)
                swap_tried = True
            else:
                a = rng.choice(la)
            g.apply(a)
            s = step(s, n, a)
            check_match(s, g, n)


def test_many_short_prefixes_size5():
    # dense coverage of early-game branching incl. swap on the minimal board
    n = 5
    rng = random.Random(99)
    for _ in range(20):
        s = reset(n)
        g = OracleGame(n)
        for _ in range(rng.randint(1, 8)):
            if g.is_terminal():
                break
            a = rng.choice(g.legal_actions())
            g.apply(a)
            s = step(s, n, a)
            check_match(s, g, n)
