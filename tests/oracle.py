"""A tiny, direct Python implementation of the TwixT semantics.

Used ONLY by tests as an independent oracle for randomized cross-checking of
the JAX engine (the stand-in for OpenSpiel's RandomSimTest, SURVEY.md §4.1).
Deliberately written in the most obvious imperative style, structurally
unlike both the reference C++ and the tensor engine, so that agreement
between the two implementations is meaningful.

Semantics follow reference twixtboard.cc / twixt.h exactly; see file:line
citations inline.
"""

from __future__ import annotations

from fractions import Fraction

EMPTY, OFFBOARD = 2, 3
OPEN, RED_WIN, BLUE_WIN, DRAW = 0, 1, 2, 3
TERMINAL = -4

# The 8 knight-move directions, Compass order (reference twixtcell.h:58-68).
# Written out here independently of ops/geometry so the oracle shares NO code
# with the engine under test.
OFFSETS = [
    (1, 2),    # NNE
    (2, 1),    # ENE
    (2, -1),   # ESE
    (1, -2),   # SSE
    (-1, -2),  # SSW
    (-2, -1),  # WSW
    (-2, 1),   # WNW
    (-1, 2),   # NNW
]


def opp_dir(d):
    return (d + 4) % 8


def _open_segments_cross(a, b, c, d):
    """True iff open segments ab, cd share an interior point.

    Independent algorithm from ops/geometry (which uses orientation sign
    tests): solve a + t*(b-a) = c + u*(d-c) exactly over the rationals and
    require 0 < t < 1 and 0 < u < 1.  Parallel segments never properly cross
    (knight-move segments cannot overlap without being equal).
    """
    rx, ry = b[0] - a[0], b[1] - a[1]
    sx, sy = d[0] - c[0], d[1] - c[1]
    den = rx * sy - ry * sx
    if den == 0:
        return False
    qpx, qpy = c[0] - a[0], c[1] - a[1]
    t = Fraction(qpx * sy - qpy * sx, den)
    u = Fraction(qpx * ry - qpy * rx, den)
    return 0 < t < 1 and 0 < u < 1


def _derive_crossers():
    """For each direction d: the [(ox, oy, d2)] of links crossing ((0,0), d).

    d2 is restricted to the four east-side directions so every geometric
    crossing link is listed exactly once (the oracle records links on both
    endpoints, so probing the east parametrisation always finds it).  This is
    the oracle's own derivation of the reference kLinkDescriptorTable
    blocking_links lists (twixtboard.cc:38-144); tests/test_geometry.py pins
    it against both ops/geometry.CROSSERS and the hand-transcribed reference
    table, closing the three-way cross-check.
    """
    table = []
    for d in range(8):
        a, b = (0, 0), OFFSETS[d]
        entries = []
        for ox in range(-3, 4):
            for oy in range(-3, 4):
                for d2 in range(4):
                    c = (ox, oy)
                    e = (ox + OFFSETS[d2][0], oy + OFFSETS[d2][1])
                    if _open_segments_cross(a, b, c, e):
                        entries.append((ox, oy, d2))
        assert len(entries) == 9, (d, entries)
        table.append(sorted(entries))
    return table


CROSSERS = _derive_crossers()


class OracleGame:
    """One TwixT game; actions are ints in [0, size*size)."""

    def __init__(self, size: int):
        self.n = size
        self.color = {}  # (x, y) -> color
        self.links = {}  # (x, y) -> set of dirs
        self.blocked = {}  # (x, y) -> set of dirs
        self.flags = {}  # (x, y) -> set of (player, border)
        self.legal = [set(), set()]
        for x in range(size):
            for y in range(size):
                if self._off_board(x, y):
                    self.color[(x, y)] = OFFBOARD
                    continue
                self.color[(x, y)] = EMPTY
                self.links[(x, y)] = set()
                self.blocked[(x, y)] = set()
                f = set()
                # init border flags (twixtboard.cc:222-231)
                if x == 0:
                    f.add((1, 0))
                elif x == size - 1:
                    f.add((1, 1))
                elif y == 0:
                    f.add((0, 0))
                elif y == size - 1:
                    f.add((0, 1))
                self.flags[(x, y)] = f
                a = x * size + y
                if not (x == 0 or x == size - 1):
                    self.legal[0].add(a)
                if not (y == 0 or y == size - 1):
                    self.legal[1].add(a)
        self.current = 0
        self.move_counter = 0
        self.move_one = None
        self.swapped = False
        self.result = OPEN

    def _off_board(self, x, y):
        n = self.n
        if x < 0 or x >= n or y < 0 or y >= n:
            return True
        return (x in (0, n - 1)) and (y in (0, n - 1))

    def legal_actions(self):
        if self.result != OPEN:
            return []
        return sorted(self.legal[self.current])

    def apply(self, action: int):
        assert self.result == OPEN
        assert action in self.legal[self.current], (action, self.current)
        n = self.n
        player = self.current
        pos = (action // n, action % n)

        if self.move_counter == 1:
            if pos == self.move_one:
                # swap (twixtboard.cc:460-474)
                self.swapped = True
                self.color[self.move_one] = EMPTY
                # restore initial legal sets (UndoFirstMove): nothing was
                # removed yet, so just re-add nothing; pos gets rotated.
                x, y = pos
                pos = (y, n - 1 - x)
            else:
                self.legal[0].discard(self.move_one[0] * n + self.move_one[1])
                self.legal[1].discard(self.move_one[0] * n + self.move_one[1])

        self._set_peg_and_links(player, pos)

        if self.move_counter == 0:
            self.move_one = pos
        else:
            a = pos[0] * n + pos[1]
            self.legal[0].discard(a)
            self.legal[1].discard(a)

        self.move_counter += 1

        # UpdateResult (twixtboard.cc:192-207)
        f = self.flags[pos]
        if (player, 0) in f and (player, 1) in f:
            self.result = RED_WIN if player == 0 else BLUE_WIN
        elif not self.legal[1 - player]:
            self.result = DRAW

        self.current = 1 - player if self.result == OPEN else TERMINAL

    def _set_peg_and_links(self, player, pos):
        self.color[pos] = player
        new_links = []
        for d in range(8):
            dx, dy = int(OFFSETS[d][0]), int(OFFSETS[d][1])
            tgt = (pos[0] + dx, pos[1] + dy)
            if self._off_board(*tgt) or self.color.get(tgt) != player:
                continue
            crossed = False
            for ox, oy, d2 in CROSSERS[d]:
                q = (pos[0] + int(ox), pos[1] + int(oy))
                if q in self.links and int(d2) in self.links[q]:
                    crossed = True
                    break
            if crossed:
                self.blocked[pos].add(d)
                self.blocked[tgt].add(opp_dir(d))
            else:
                self.links[pos].add(d)
                self.links[tgt].add(opp_dir(d))
                new_links.append(tgt)
        if new_links:
            # flood all four flag kinds to fixpoint over the link graph
            frontier = [pos] + new_links
            while frontier:
                p = frontier.pop()
                for d in self.links[p]:
                    dx, dy = int(OFFSETS[d][0]), int(OFFSETS[d][1])
                    q = (p[0] + dx, p[1] + dy)
                    merged = self.flags[p] | self.flags[q]
                    if merged != self.flags[q]:
                        self.flags[q] = merged
                        frontier.append(q)
                    if merged != self.flags[p]:
                        self.flags[p] = set(merged)
                        frontier.append(p)

    def returns(self):
        if self.result == RED_WIN:
            return [1.0, -1.0]
        if self.result == BLUE_WIN:
            return [-1.0, 1.0]
        return [0.0, 0.0]

    def is_terminal(self):
        return self.result != OPEN
