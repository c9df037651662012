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

from twixt_for_open_spiel_tpu.ops.geometry import (
    CROSSERS,
    OFFSETS,
    opp_dir,
)

EMPTY, OFFBOARD = 2, 3
OPEN, RED_WIN, BLUE_WIN, DRAW = 0, 1, 2, 3
TERMINAL = -4


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
