"""Checkpoint / resume (SURVEY.md §5).

Two complementary mechanisms, mirroring the reference's implicit capability:

  * **History replay** — any game state is reconstructible from its action
    sequence (the reference's ``History()`` replay, playthrough.txt:674).
    This is the canonical, version-stable restore path for game states.
  * **Pytree snapshots** — env-state pytrees and training state
    (params/opt_state) serialized with orbax (falling back to pickled
    numpy if orbax is unavailable).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import jax
import numpy as np

from twixt_for_open_spiel_tpu.game.openspiel import TwixTGame, TwixTState
from twixt_for_open_spiel_tpu.ops.state import State

try:  # orbax is in the image, but keep a std-lib fallback
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


# --- history replay (canonical game-state checkpointing)

def serialize_state(state: TwixTState) -> str:
    """Action history, one action per line (OpenSpiel's wire format)."""
    return "\n".join(str(a) for a in state.history)


def deserialize_state(game: TwixTGame, data: str) -> TwixTState:
    state = game.new_initial_state()
    for line in filter(None, data.split("\n")):
        state.apply_action(int(line))
    return state


# --- pytree snapshots

def save_pytree(path: str, tree) -> None:
    tree = jax.tree_util.tree_map(np.asarray, tree)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        with open(path, "wb") as f:
            pickle.dump(tree, f)


def load_pytree(path: str, like):
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        like_np = jax.tree_util.tree_map(np.asarray, like)
        return ckptr.restore(os.path.abspath(path), like_np)
    with open(path, "rb") as f:  # pragma: no cover
        return pickle.load(f)


# --- training checkpoints

def save_training(ckpt_dir: str, params, opt_state, iteration: int) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree(os.path.join(ckpt_dir, "params"), params)
    save_pytree(os.path.join(ckpt_dir, "opt_state"), opt_state)
    with open(os.path.join(ckpt_dir, "iteration.txt"), "w") as f:
        f.write(str(iteration))


def restore_training(
    ckpt_dir: str, params_like, opt_state_like
) -> Optional[Tuple[object, object, int]]:
    marker = os.path.join(ckpt_dir, "iteration.txt")
    if not os.path.exists(marker):
        return None
    params = load_pytree(os.path.join(ckpt_dir, "params"), params_like)
    opt_state = load_pytree(
        os.path.join(ckpt_dir, "opt_state"), opt_state_like
    )
    with open(marker) as f:
        iteration = int(f.read().strip())
    return params, opt_state, iteration
