"""Serialization round-trips and example-runner smoke tests."""

import numpy as np

from twixt_for_open_spiel_tpu.game import load_game
from twixt_for_open_spiel_tpu.utils import serialization


def test_history_replay_roundtrip():
    game = load_game("twixt")
    s = game.new_initial_state()
    for a in [14, 13, 33, 6, 26]:
        s.apply_action(a)
    data = serialization.serialize_state(s)
    s2 = serialization.deserialize_state(game, data)
    assert s2.history == s.history
    assert s2.to_string() == s.to_string()
    assert np.array_equal(
        s2.observation_tensor(0), s.observation_tensor(0)
    )


def test_pytree_snapshot_roundtrip(tmp_path):
    import jax

    from twixt_for_open_spiel_tpu.models import create_net, init_params

    net = create_net(5, channels=8, blocks=1)
    params = init_params(net, jax.random.PRNGKey(0))
    path = str(tmp_path / "params")
    serialization.save_pytree(path, params)
    restored = serialization.load_pytree(path, params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_training_checkpoint_roundtrip(tmp_path):
    import jax

    from twixt_for_open_spiel_tpu.models import (
        create_net,
        init_params,
        make_optimizer,
    )

    net = create_net(5, channels=8, blocks=1)
    params = init_params(net, jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    d = str(tmp_path / "ckpt")
    assert serialization.restore_training(d, params, opt_state) is None
    serialization.save_training(d, params, opt_state, 7)
    restored = serialization.restore_training(d, params, opt_state)
    assert restored is not None
    _, _, it = restored
    assert it == 7


def test_example_runner(capsys):
    from twixt_for_open_spiel_tpu.examples import example

    example.main(["--game", "twixt(board_size=5)", "--seed", "1"])
    out = capsys.readouterr().out
    assert "Loaded game" in out
    assert "Utility for player 0" in out


def test_mcts_example_runner(capsys):
    from twixt_for_open_spiel_tpu.examples import mcts_example

    mcts_example.main(
        [
            "--game", "twixt(board_size=5)",
            "--player1", "mcts",
            "--player2", "random",
            "--max_simulations", "8",
            "--rollout_count", "1",
            "--seed", "3",
        ]
    )
    out = capsys.readouterr().out
    assert "Returns:" in out


def test_arena_example_runner(capsys):
    from twixt_for_open_spiel_tpu.examples import arena

    arena.main(
        [
            "--board_size=5",
            "--batch=4",
            "--simulations=4",
            "--channels=16",
            "--blocks=1",
            "--temp_moves=2",
            "--random_b",
        ]
    )
    out = capsys.readouterr().out
    assert "A score" in out
