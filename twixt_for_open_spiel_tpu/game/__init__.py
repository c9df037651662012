from twixt_for_open_spiel_tpu.game.openspiel import (
    SpielError,
    TwixTGame,
    TwixTState,
    deserialize_game_and_state,
    load_game,
    serialize_game_and_state,
)
from twixt_for_open_spiel_tpu.game.render import render
from twixt_for_open_spiel_tpu.game.strings import action_to_string

__all__ = [
    "SpielError",
    "TwixTGame",
    "TwixTState",
    "load_game",
    "serialize_game_and_state",
    "deserialize_game_and_state",
    "render",
    "action_to_string",
]
