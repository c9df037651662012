"""TwixT game state as a fixed-shape JAX pytree + ``reset``.

TPU-native equivalent of the reference's ``Cell`` grid and ``Board``
construction (C3/C6 in SURVEY.md §2; reference twixtcell.h:70-109,
twixtboard.cc:168-276).  Struct-of-arrays instead of array-of-structs: each
per-cell field of the C++ ``Cell`` becomes one board-shaped tensor, so the
whole game state is a small pytree of integer arrays that vmaps over a batch
axis and shards over a device mesh.

All board arrays are padded with a ``PAD``-cell halo of off-board cells so
every knight-move / crossing-link offset used by ``step`` stays in bounds:
shifted whole-board reads replace the reference's per-cell bounds checks
(``PositionIsOffBoard``, twixtboard.cc:625-631).

``board_size`` is a static (trace-time) argument — one compiled executable
per board size, exactly like the reference compiles per-game C++.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from twixt_for_open_spiel_tpu.ops import geometry as geo


class State(NamedTuple):
    """Complete TwixT game state (single env; add leading/trailing batch axes
    via ``jax.vmap``).

    Board arrays have shape [P, P] with P = board_size + 2*PAD, indexed
    [x + PAD, y + PAD] (x = column, y = row pointing up, reference
    twixtboard.h:153-213).

    Fields (reference counterparts in parentheses):
      color          int8  [P,P]  COLOR_* per cell (Cell::color_)
      links          uint8 [P,P]  bit d set => link in compass dir d
                                  (Cell::links_; always set symmetrically on
                                  both endpoints, twixtboard.cc:532-533)
      blocked        uint8 [P,P]  bit d set => same-color neighbor in dir d
                                  could not be linked due to a crossing link
                                  (Cell::blocked_neighbors_)
      compid         int16 [P,P]  connected-component id of the cell's link
                                  component; ids are action indices of peg
                                  cells, -1 on the halo/corners.  Replaces
                                  the reference's recursive DFS
                                  (ExploreLocalGraph) with O(1)-merge
                                  batched union-find (see ops/step.py).
      flags          uint8 [P,P]  border-connectivity bits of the cell's
                                  component, bit (player*2+border)
                                  (Cell::linked_to_border_); invariant:
                                  every peg holds its component's full flag
                                  byte, empty cells their initial border
                                  flags
      legal          bool  [2,P,P] per-player legal-action masks
                                  (Board::legal_actions_, kept as masks; the
                                  ascending-action-id list order of the
                                  reference is recovered by a column-major
                                  scan of the mask)
      current_player int32 []    player to move, or TERMINAL_PLAYER_ID
      move_counter   int32 []    number of moves applied (Board::move_counter_)
      move_one       int32 []    action id of the first move (Board::move_one_)
      swapped        bool  []    swap rule invoked (Board::swapped_)
      result         int32 []    RESULT_* (Board::result_)
    """

    color: jnp.ndarray
    links: jnp.ndarray
    blocked: jnp.ndarray
    compid: jnp.ndarray
    flags: jnp.ndarray
    legal: jnp.ndarray
    current_player: jnp.ndarray
    move_counter: jnp.ndarray
    move_one: jnp.ndarray
    swapped: jnp.ndarray
    result: jnp.ndarray


def padded_size(board_size: int) -> int:
    return board_size + 2 * geo.PAD


def board_consts(board_size: int, bshape=()):
    """The per-size constant boards, built from broadcasted_iota in jnp.

    Semantically identical to :func:`geometry.board_masks` (which stays the
    numpy reference, cross-checked in tests) but expressed as traced ops so
    the same construction works inside Pallas kernels, where captured array
    constants are not allowed; under jit XLA constant-folds it all anyway.

    ``bshape`` appends trailing (broadcast) batch dims — everything is built
    directly at the target rank with broadcasted_iota, because Mosaic cannot
    reshape/stack to add unit dims.

    Returns dict with [P, P, *bshape] arrays: init_color (i32), init_compid
    (i32), init_flags (i32) and legal (bool [2, P, P, *bshape]).
    """
    import jax

    n = board_size
    p = padded_size(n)

    def grid(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    shape = (p, p) + tuple(bshape)
    xs = grid(shape, 0) - geo.PAD
    ys = grid(shape, 1) - geo.PAD
    in_bounds = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    x_edge = (xs == 0) | (xs == n - 1)
    y_edge = (ys == 0) | (ys == n - 1)
    corner = in_bounds & x_edge & y_edge
    on_board = in_bounds & ~corner

    # computed entirely in int32/bool — Mosaic v5e has no 8/16-bit vector
    # ops, so sub-32-bit intermediates must not appear inside kernels;
    # reset() narrows to the storage dtypes outside the kernel.
    flags = jnp.zeros(shape, jnp.int32)
    for cond, player, border in (
        (xs == 0, geo.BLUE, geo.BORDER_START),
        (xs == n - 1, geo.BLUE, geo.BORDER_END),
        (ys == 0, geo.RED, geo.BORDER_START),
        (ys == n - 1, geo.RED, geo.BORDER_END),
    ):
        flags = flags | jnp.where(
            on_board & cond, geo.flag_bit(player, border), 0
        )

    # the [2, ...] legal planes, built at rank (no stack: Mosaic again)
    shape2 = (2,) + shape
    q = grid(shape2, 0)
    xs2 = grid(shape2, 1) - geo.PAD
    ys2 = grid(shape2, 2) - geo.PAD
    in2 = (xs2 >= 0) & (xs2 < n) & (ys2 >= 0) & (ys2 < n)
    xe2 = (xs2 == 0) | (xs2 == n - 1)
    ye2 = (ys2 == 0) | (ys2 == n - 1)
    on2 = in2 & ~(xe2 & ye2)
    # pure bool algebra (a select with boolean branches won't lower in
    # Mosaic): plane 0 forbids the x borders, plane 1 the y borders
    legal = on2 & ~(((q == 0) & xe2) | ((q == 1) & ye2))

    return {
        "legal": legal,
        "init_color": jnp.where(
            on_board, geo.COLOR_EMPTY, geo.COLOR_OFFBOARD
        ),
        "init_compid": jnp.where(on_board, xs * n + ys, -1),
        "init_flags": flags,
    }


def reset(board_size: int, wide: bool = False, bshape=()) -> State:
    """Start-of-game state (reference Board ctor, twixtboard.cc:168-174).

    Pure function of the static board size; the expensive per-cell init loops
    of the reference (InitializeCells / InitializeNeighbors /
    InitializeBlockerMap, twixtboard.cc:209-276) collapse into trace-time
    constant-table construction.

    ``wide=True`` keeps the cell arrays and masks in int32 — the dtype
    layout used inside the Pallas fused rollout kernel, where 8/16-bit
    vectors are unsupported.  ``bshape`` appends trailing broadcast batch
    dims (built at rank; Mosaic cannot reshape to add unit dims).
    """
    consts = board_consts(board_size, bshape)
    p = padded_size(board_size)
    bshape = tuple(bshape)
    cell_dt = jnp.int32 if wide else None

    def scalar(v, dt=jnp.int32):
        return jnp.full(bshape, v, dt) if bshape else jnp.asarray(v, dt)

    return State(
        color=consts["init_color"].astype(cell_dt or jnp.int8),
        links=jnp.zeros((p, p) + bshape, dtype=cell_dt or jnp.uint8),
        blocked=jnp.zeros((p, p) + bshape, dtype=cell_dt or jnp.uint8),
        compid=consts["init_compid"].astype(cell_dt or jnp.int16),
        flags=consts["init_flags"].astype(cell_dt or jnp.uint8),
        legal=consts["legal"].astype(jnp.int32 if wide else bool),
        current_player=scalar(geo.RED),
        move_counter=scalar(0),
        move_one=scalar(-1),
        swapped=scalar(0) if wide else scalar(False, bool),
        result=scalar(geo.RESULT_OPEN),
    )


def action_to_xy(action, board_size: int):
    """Action id -> (x, y) board coords (reference twixtboard.cc:599-601)."""
    return action // board_size, action % board_size


def xy_to_action(x, y, board_size: int):
    """(x, y) -> action id (reference twixtboard.cc:603-605)."""
    return x * board_size + y


def swap_rotate_action(action, board_size: int):
    """90-degree clockwise rotation applied on swap
    (reference twixtboard.cc:470-473): (x, y) -> (y, size-1-x)."""
    x, y = action_to_xy(action, board_size)
    return xy_to_action(y, board_size - 1 - x, board_size)


def onehot_board(action, board_size: int) -> jnp.ndarray:
    """Bool [P,P,*B] mask, True exactly at each env's action cell.

    Batch-polymorphic: ``action`` may be a scalar (single env) or carry
    trailing batch dims — board ops keep the batch on the *minor* axes so
    the TPU lane dimension is the env batch (see ops/rollout.py).
    """
    import jax

    p = padded_size(board_size)
    x, y = action_to_xy(action, board_size)
    bshape = (1,) * jnp.ndim(x)
    # broadcasted_iota (not 1-D arange) so the same code lowers through
    # Mosaic inside the Pallas fused rollout kernel
    xs = jax.lax.broadcasted_iota(jnp.int32, (p, 1) + bshape, 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, p) + bshape, 1)
    return (xs == x + geo.PAD) & (ys == y + geo.PAD)


def legal_mask_flat(state: State, player, board_size: int) -> jnp.ndarray:
    """Legal mask over the ``size*size`` action space, ascending action order.

    Row-major over (x, y) == ascending action id, matching the insertion
    order of the reference's legal-action vectors (twixtboard.cc:260-275).
    Batch-polymorphic: returns [size*size] or [size*size, *B].
    """
    pad = geo.PAD
    legal = state.legal
    if jnp.ndim(player) == 0 and not isinstance(player, jnp.ndarray):
        sel = legal[int(player)]
    else:
        sel = jnp.where(jnp.asarray(player) == 0, legal[0], legal[1])
    core = sel[pad : pad + board_size, pad : pad + board_size]
    return core.reshape((board_size * board_size,) + core.shape[2:])
