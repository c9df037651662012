"""Ports of TwixtParameterTest and the API-surface checks
(reference twixt_test.cc:50-92, twixt.h:114-146).
"""

import pytest

from twixt_for_open_spiel_tpu.game import SpielError, load_game


def test_load_defaults():
    g = load_game("twixt")
    assert g.board_size == 8
    assert g.ansi_color_output is True
    assert g.num_distinct_actions() == 64
    assert g.observation_tensor_shape() == [12, 8, 6]
    assert g.observation_tensor_size() == 576
    assert g.max_game_length() == 61
    assert g.min_utility() == -1.0
    assert g.max_utility() == 1.0
    assert g.utility_sum() == 0.0
    assert str(g) == "twixt()"


def test_load_params_ok():
    assert load_game("twixt", {"ansi_color_output": True}).ansi_color_output
    assert load_game("twixt", {"board_size": 10}).board_size == 10
    assert load_game("twixt(board_size=10)").board_size == 10
    assert (
        load_game("twixt(board_size=5,ansi_color_output=false)").board_size
        == 5
    )


def test_board_size_too_big():
    with pytest.raises(SpielError) as e:
        load_game("twixt", {"board_size": 30})
    assert str(e.value) == "board_size out of range [5..24]: 30"


def test_board_size_too_small():
    with pytest.raises(SpielError) as e:
        load_game("twixt", {"board_size": 3})
    assert str(e.value) == "board_size out of range [5..24]: 3"


def test_unknown_parameter():
    with pytest.raises(SpielError) as e:
        load_game("twixt", {"bad_param": 3})
    assert str(e.value) == (
        "Unknown parameter 'bad_param'. "
        "Available parameters are: ansi_color_output, board_size"
    )


def test_illegal_action_message():
    g = load_game("twixt")
    s = g.new_initial_state()
    s.apply_action(21)
    s.apply_action(38)
    s.apply_action(15)
    s.apply_action(11)
    with pytest.raises(SpielError) as e:
        s.apply_action(11)
    assert str(e.value) == "Not a legal action: 11"


def test_action_to_string():
    g = load_game("twixt")
    s = g.new_initial_state()
    assert s.action_to_string(0, 19) == "xc5"
    assert s.action_to_string(1, 43) == "of5"
    assert s.action_to_string(0, 29) == "xd3"


def test_clone_independent():
    g = load_game("twixt")
    s = g.new_initial_state()
    s.apply_action(19)
    c = s.clone()
    c.apply_action(19)  # swap on the clone only
    assert not s.is_terminal()
    assert s.current_player() == 1
    assert c.current_player() == 0
    assert s.history == [19] and c.history == [19, 19]


def test_undo_action_is_noop():
    g = load_game("twixt")
    s = g.new_initial_state()
    s.apply_action(19)
    before = s.to_string()
    s.undo_action(0, 19)  # reference twixt.h:84: deliberate no-op
    assert s.to_string() == before


def test_ansi_color_output_false_renders_plain():
    g = load_game("twixt(ansi_color_output=false)")
    s = g.new_initial_state()
    out = s.to_string()
    assert "\x1b[" not in out
    assert "[swapped]" not in out
    s.apply_action(19)
    s.apply_action(19)
    assert "[swapped]" in s.to_string()
