"""AlphaZero-style policy/value network for TwixT observations.

The learner of the self-play stack (BASELINE.json config 5).  The reference
has no model at all (SURVEY.md §5, long-context note) — this is new,
TPU-first framework surface:

  * bfloat16 compute / float32 params, so convolutions land on the MXU;
  * NHWC layout with channel counts that are multiples of the 128-lane
    register width;
  * the 12-plane CHW observation (ops/observe.py) is transposed once at the
    input; the policy head emits ``board_size**2`` masked logits matching the
    engine's action space (corner/off-limit actions are masked by the
    caller using the state's legal mask).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from twixt_for_open_spiel_tpu.ops import geometry as geo


class ResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        return nn.relu(x + y)


class AZNet(nn.Module):
    """Policy/value net over the [12, N, N-2] observation tensor."""

    board_size: int
    channels: int = 128
    blocks: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # obs: [B, 12, N, N-2] (CHW from ops/observe.py) -> NHWC
        x = jnp.transpose(obs, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.blocks):
            x = ResBlock(self.channels, self.dtype)(x)

        # policy head: action space is board_size**2 (incl. never-legal
        # corners, reference twixt.h:122-124); caller masks illegal logits.
        p = nn.Conv(32, (1, 1), dtype=self.dtype)(x)
        p = nn.relu(nn.LayerNorm(dtype=self.dtype)(p))
        p = p.reshape((p.shape[0], -1))
        logits = nn.Dense(self.board_size * self.board_size,
                          dtype=self.dtype)(p)

        # value head.  The final layers run in f32 with a LayerNorm and a
        # ZERO-initialised output kernel (NOTE: this round-3 fix changed
        # the checkpoint parameter tree — checkpoints saved before it do
        # not restore, accepted because pre-fix checkpoints carry the
        # saturated head anyway): outcome targets are almost always
        # +-1, and without this the bf16 tanh saturates early in training
        # (|pre-activation| > 8 makes 1 - tanh^2 EXACTLY 0 in bf16), after
        # which the head is frozen at a constant +-1 forever — observed as
        # value MSE ~1.9 with zero output variance while the policy head
        # kept learning (round-3 training runs).  Zero-init starts the
        # output at tanh's maximum-gradient point and the norm bounds the
        # feature scale the kernel multiplies.
        v = nn.Conv(32, (1, 1), dtype=self.dtype)(x)
        v = nn.relu(nn.LayerNorm(dtype=self.dtype)(v))
        v = v.reshape((v.shape[0], -1))
        v = nn.relu(nn.Dense(256, dtype=self.dtype)(v))
        v = nn.LayerNorm(dtype=jnp.float32)(v.astype(jnp.float32))
        value = jnp.tanh(
            nn.Dense(
                1, dtype=jnp.float32, kernel_init=nn.initializers.zeros
            )(v)
        )[:, 0]

        return logits.astype(jnp.float32), value.astype(jnp.float32)


def create_net(board_size: int, channels: int = 128, blocks: int = 6,
               dtype=jnp.bfloat16):
    """``dtype`` sets the compute dtype (params stay f32).  bf16 is the
    production setting (MXU); f32 exists for numerical pins that need
    reduction-shape-independent results (tests/test_sharding.py)."""
    return AZNet(board_size=board_size, channels=channels, blocks=blocks,
                 dtype=dtype)


def init_params(net: AZNet, key, batch: int = 1):
    n = net.board_size
    obs = jnp.zeros((batch, geo.NUM_PLANES, n, n - 2), jnp.float32)
    return net.init(key, obs)


def masked_policy(logits: jnp.ndarray, legal_mask: jnp.ndarray):
    """Softmax over legal actions only; illegal actions get probability 0."""
    neg = jnp.asarray(-1e9, logits.dtype)
    masked = jnp.where(legal_mask, logits, neg)
    return jax.nn.softmax(masked, axis=-1)
