"""Golden-playthrough parity: regenerate the reference's playthrough file
byte-for-byte from its action history (SURVEY.md §4.4; BASELINE.json:2).

Only the golden file's *sampling pattern* (which states are fully dumped) is
read from the file; every byte of content — ANSI board strings, observation
tensors, legal-action lists, rewards — is produced by this engine.
"""

import re
from pathlib import Path

import pytest

from twixt_for_open_spiel_tpu.game import load_game
from twixt_for_open_spiel_tpu.game.playthrough import generate

GOLDEN = Path(
    "/root/reference/open_spiel/integration_tests/playthroughs/"
    "playthrough.txt"
)


@pytest.fixture(scope="module")
def golden_text():
    if not GOLDEN.exists():
        pytest.skip("reference playthrough not available")
    return GOLDEN.read_text()


def parse_structure(text):
    """Extract (actions, fully-dumped state indices) from the golden file."""
    actions = [int(m) for m in re.findall(r"^action: (\d+)$", text, re.M)]
    dumped = set()
    lines = text.split("\n")
    for i, line in enumerate(lines):
        m = re.match(r"^# State (\d+)$", line)
        if m and i + 1 < len(lines) and not lines[i + 1].startswith(
            "# Apply action"
        ):
            dumped.add(int(m.group(1)))
    return actions, dumped


def test_playthrough_byte_exact(golden_text):
    actions, dumped = parse_structure(golden_text)
    assert len(actions) == 35
    game = load_game("twixt")
    ours = generate(game, actions, full_dump_states=dumped)
    if ours != golden_text:
        # pinpoint the first differing line for debuggability
        glines = golden_text.split("\n")
        olines = ours.split("\n")
        for i, (g, o) in enumerate(zip(glines, olines)):
            assert g == o, f"line {i + 1}:\n golden: {g!r}\n   ours: {o!r}"
        assert len(glines) == len(olines), (
            f"line count {len(olines)} != golden {len(glines)}"
        )
        raise AssertionError("byte mismatch not localised")


def test_final_state_is_red_win(golden_text):
    actions, _ = parse_structure(golden_text)
    game = load_game("twixt")
    s = game.new_initial_state()
    for a in actions:
        s.apply_action(a)
    assert s.is_terminal()
    assert s.returns() == [1.0, -1.0]
    assert s.current_player() == -4
