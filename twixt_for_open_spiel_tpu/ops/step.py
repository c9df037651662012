"""Branch-free TwixT state transition: ``step(state, action)``.

TPU-native re-expression of the reference's hot path (SURVEY.md §3c):
``Board::ApplyAction`` / ``SetPegAndLinks`` / ``ExploreLocalGraph`` /
``UpdateResult`` (reference twixtboard.cc:457-588,192-207) plus the turn /
terminal logic of ``TwixTState::DoApplyAction`` (reference twixt.h:93-104).

Design: everything is whole-board elementwise tensor algebra over the padded
[P, P] arrays —

  * the action becomes a one-hot board mask;
  * neighbor / crossing-link probes become *static shifts* of whole boards
    (the 8+72 probe offsets are trace-time constants from geometry.CROSSERS),
    replacing the reference's BlockerMap hash probes with masked bit reads;
  * the recursive border DFS (ExploreLocalGraph) becomes masked flood-fill of
    the packed border-flag byte under ``lax.while_loop``, iterated to a fixed
    point (identical result: the reference maintains the invariant that every
    cell of a linked component carries the component's border flags);
  * the swap rule is a ``where`` select, no Python branching.

No gathers, no scatters, no data-dependent shapes: ``jit(vmap(step))``
compiles to fused VPU elementwise work, which is the TPU-native analogue of
the reference's per-cell C++ loops.

``step`` assumes ``action`` is legal for ``state.current_player`` and that the
state is non-terminal (the reference raises SpielFatalError otherwise,
twixt.h:94-97; the host-side OpenSpiel adapter performs that gate, and
``rollout.step_auto_reset`` handles terminal states for batched rollouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo
from twixt_for_open_spiel_tpu.ops.state import (
    State,
    onehot_board,
    swap_rotate_action,
)

_U8 = jnp.uint8


def _shift(arr: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[x, y] = arr[x + dx, y + dy] (static shift, wrap-around).

    Safe because every use is masked to cells whose shifted source index is
    within the PAD halo (|dx|, |dy| <= PAD), where wrap-around never occurs.
    """
    return jnp.roll(arr, shift=(-dx, -dy), axis=(0, 1))


def _link_updates(color, links, me, player_i8):
    """New link / blocked-neighbor bits created by placing a peg at ``me``.

    Vectorised SetPegAndLinks (reference twixtboard.cc:501-571): for each of
    the 8 compass directions, link iff the knight-move neighbor has the same
    color and none of the 9 geometrically crossing links is present.  Link and
    blocked bits are set symmetrically on both endpoints
    (twixtboard.cc:532-533, 550-551).  The 8 candidate links share the origin
    peg so they can never cross each other, making the direction loop
    order-independent — all probes read the pre-move ``links``.
    """
    new_links = jnp.zeros_like(links)
    new_blocked = jnp.zeros_like(links)
    for d in range(geo.NUM_DIRS):
        dx, dy = (int(v) for v in geo.OFFSETS[d])
        # Same-color knight-move neighbor (halo/corner cells are OFFBOARD, so
        # the color test subsumes the reference's PositionIsOffBoard check).
        same = me & (_shift(color, dx, dy) == player_i8)
        # Any of the 9 crossing links present?  One masked bit probe per
        # crossing link at its canonical east endpoint (links are symmetric).
        crossed = jnp.zeros_like(me)
        for ox, oy, d2 in geo.CROSSERS[d]:
            bit = (_shift(links, int(ox), int(oy)) >> _U8(int(d2))) & _U8(1)
            crossed = crossed | (bit != 0)
        linked = same & ~crossed
        blocked = same & crossed
        od = geo.opp_dir(d)
        new_links = new_links | jnp.where(linked, _U8(1 << d), _U8(0))
        new_links = new_links | jnp.where(
            _shift(linked, -dx, -dy), _U8(1 << od), _U8(0)
        )
        new_blocked = new_blocked | jnp.where(blocked, _U8(1 << d), _U8(0))
        new_blocked = new_blocked | jnp.where(
            _shift(blocked, -dx, -dy), _U8(1 << od), _U8(0)
        )
    return new_links, new_blocked


def _propagate_flags(flags, links):
    """Flood border-connectivity flags over the link graph to a fixed point.

    Replaces the recursive DFS ExploreLocalGraph (reference
    twixtboard.cc:573-588) with iterated masked label propagation: each cell
    ORs in the flag bytes of its linked neighbors.  The pre-move state is
    already at fixed point, so only the component merged by the new peg
    changes; the while_loop converges in component-diameter iterations and is
    vmap-safe (a batched while_loop runs until every lane converges).
    """

    def body(flags):
        acc = flags
        for d in range(geo.NUM_DIRS):
            dx, dy = (int(v) for v in geo.OFFSETS[d])
            has_link = (links >> _U8(d)) & _U8(1)
            acc = acc | (jnp.where(has_link != 0, _shift(flags, dx, dy), _U8(0)))
        return acc

    def cond(carry):
        flags, changed = carry
        return changed

    def step_once(carry):
        flags, _ = carry
        new = body(flags)
        return new, jnp.any(new != flags)

    # One unconditional sweep (the new peg always needs its neighbors' flags),
    # then iterate while anything changed.
    first = body(flags)
    flags, _ = jax.lax.while_loop(
        cond, step_once, (first, jnp.any(first != flags))
    )
    return flags


@functools.partial(jax.jit, static_argnums=1)
def step(state: State, board_size: int, action) -> State:
    """Apply ``action`` for ``state.current_player``; returns the next state.

    Mirrors Board::ApplyAction + TwixTState::DoApplyAction exactly
    (reference twixtboard.cc:457-499, twixt.h:93-104), including:
      * the swap rule: on move 2, replaying move one undoes it and places the
        second player's peg at the 90-degree-clockwise-rotated position
        (twixtboard.cc:460-474);
      * move one staying legal for exactly one ply (twixtboard.cc:485-489);
      * win = placed peg connected to both of the mover's borders, draw = the
        opponent to move has no legal action left (twixtboard.cc:192-207).
    """
    masks = geo.board_masks(board_size)
    player = state.current_player
    player_i8 = player.astype(jnp.int8)
    mc = state.move_counter
    action = jnp.asarray(action, dtype=jnp.int32)

    is_swap = (mc == 1) & (action == state.move_one)

    # --- swap: undo move one (reference UndoFirstMove, twixtboard.cc:450-455).
    # The single first peg has no links/blocked bits and its border flags are
    # its initial ones, so clearing its color and restoring the initial legal
    # masks is a complete undo.
    m_one = onehot_board(state.move_one, board_size)
    color = jnp.where(
        is_swap & m_one, jnp.int8(geo.COLOR_EMPTY), state.color
    )
    init_legal = jnp.stack(
        [jnp.asarray(masks["legal0"]), jnp.asarray(masks["legal1"])]
    )
    legal = jnp.where(is_swap, init_legal, state.legal)

    # Effective position: rotated on swap (twixtboard.cc:470-473).
    eff = jnp.where(
        is_swap, swap_rotate_action(action, board_size), action
    )
    me = onehot_board(eff, board_size)

    # Move 2 without swap: move one leaves both players' legal sets
    # (twixtboard.cc:475-480).
    rm_one = ((mc == 1) & ~is_swap) & m_one
    legal = legal & ~rm_one[None]

    # --- place peg, create links / blocked bits.
    color = jnp.where(me, player_i8, color)
    new_links, new_blocked = _link_updates(color, state.links, me, player_i8)
    links = state.links | new_links
    blocked = state.blocked | new_blocked

    # --- border connectivity (only needed when links were created, but the
    # fixed-point sweep is a no-op otherwise and select-free).
    flags = _propagate_flags(state.flags, links)

    # --- legal-action bookkeeping (twixtboard.cc:485-493): the first move is
    # remembered but stays legal; every later move is removed for both players.
    legal = jnp.where(mc == 0, legal, legal & ~me[None])
    move_one = jnp.where(mc == 0, eff, state.move_one)

    # --- result (UpdateResult, twixtboard.cc:192-207).
    f_at = jnp.max(jnp.where(me, flags, _U8(0)))
    shift_amt = (player * 2).astype(_U8)
    connected_start = ((f_at >> shift_amt) & _U8(1)) != 0
    connected_end = ((f_at >> (shift_amt + _U8(1))) & _U8(1)) != 0
    win = connected_start & connected_end
    opp = 1 - player
    opp_has_legal = jnp.any(
        jnp.where(opp == 0, legal[0], legal[1])
    )
    result = jnp.where(
        win,
        jnp.int32(geo.RESULT_RED_WIN) + player,
        jnp.where(
            opp_has_legal,
            jnp.int32(geo.RESULT_OPEN),
            jnp.int32(geo.RESULT_DRAW),
        ),
    )

    current_player = jnp.where(
        result == geo.RESULT_OPEN, opp, jnp.int32(geo.TERMINAL_PLAYER_ID)
    )

    return State(
        color=color,
        links=links,
        blocked=blocked,
        flags=flags,
        legal=legal,
        current_player=current_player,
        move_counter=mc + 1,
        move_one=move_one,
        swapped=state.swapped | is_swap,
        result=result,
    )


def returns(state: State) -> jnp.ndarray:
    """Terminal returns [2] (reference TwixTState::Returns, twixt.h:50-63)."""
    r = state.result
    red = jnp.where(
        r == geo.RESULT_RED_WIN,
        1.0,
        jnp.where(r == geo.RESULT_BLUE_WIN, -1.0, 0.0),
    )
    return jnp.stack([red, -red])


def is_terminal(state: State) -> jnp.ndarray:
    """Reference TwixTState::IsTerminal (twixt.h:45-48)."""
    return state.result != geo.RESULT_OPEN
