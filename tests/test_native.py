"""Native C renderer: byte-equality against the Python reference renderer
on random boards of every size, plus the golden-playthrough surface."""

import random

import pytest

from twixt_for_open_spiel_tpu import native
from twixt_for_open_spiel_tpu.game.render import render_native, render_py
from twixt_for_open_spiel_tpu.ops.state import reset
from twixt_for_open_spiel_tpu.ops.step import step


needs_native = pytest.mark.skipif(
    native.load() is None, reason="no C compiler available"
)


def random_state(n, moves, seed):
    import numpy as np

    from twixt_for_open_spiel_tpu.ops.state import legal_mask_flat

    rng = random.Random(seed)
    s = reset(n)
    for _ in range(moves):
        if int(s.result) != 0:
            break
        p = int(s.current_player)
        la = np.nonzero(np.asarray(legal_mask_flat(s, p, n)))[0]
        s = step(s, n, int(rng.choice(la)))
    return s


@needs_native
@pytest.mark.parametrize("n", [5, 8, 10, 12, 24])
def test_native_matches_python(n):
    for seed in range(3):
        s = random_state(n, moves=2 * n, seed=seed)
        for ansi in (True, False):
            a = render_py(
                s.color, s.links, n, bool(s.swapped), int(s.result), ansi
            )
            b = render_native(
                s.color, s.links, n, bool(s.swapped), int(s.result), ansi
            )
            assert a == b


@needs_native
def test_native_trailers():
    s = reset(8)
    s = step(s, 8, 19)
    s = step(s, 8, 19)  # swap
    a = render_py(s.color, s.links, 8, True, 0, True)
    b = render_native(s.color, s.links, 8, True, 0, True)
    assert a == b and a.endswith("[swapped]")
    for result, tag in [(1, "[x has won]"), (2, "[o has won]"), (3, "[draw]")]:
        a = render_py(s.color, s.links, 8, False, result, True)
        b = render_native(s.color, s.links, 8, False, result, True)
        assert a == b and a.endswith(tag)
