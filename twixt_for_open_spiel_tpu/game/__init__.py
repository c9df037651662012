from twixt_for_open_spiel_tpu.game.openspiel import (
    SpielError,
    TwixTGame,
    TwixTState,
    load_game,
)
from twixt_for_open_spiel_tpu.game.render import render
from twixt_for_open_spiel_tpu.game.strings import action_to_string

__all__ = [
    "SpielError",
    "TwixTGame",
    "TwixTState",
    "load_game",
    "render",
    "action_to_string",
]
