"""Vision and two-level-controller networks (controller reuse).

Flax counterparts of the reference vision/controller-reuse stack
(flybody/agents/network_factory_vis.py): a small conv net over the stacked
32x32 eye images (VisNet), and a TwoLevelController that splices a trained,
frozen low-level flight policy behind a trainable high-level MLP emitting a
steering command (ref_displacement + ref_root_quat) injected at the
low-level network's observation indices.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flybody_tpu.agents import networks as nets_lib


def observable_indices_in_tensor(obs_spec: dict) -> dict:
    """Index ranges of each observable in the batch_concat tensor
    (reference tasks/task_utils.py:12-25)."""
    out = {}
    idx = 0
    for name in sorted(obs_spec.keys()):
        size = int(np.prod(obs_spec[name].shape))
        out[name] = (idx, idx + size)
        idx += size
    return out


class VisNet(nn.Module):
    """Eye-image conv net (reference network_factory_vis.py:140-220).

    Separates walker/left_eye + walker/right_eye from the observation dict,
    normalizes ((x - 77) / 56), stacks them as 2 channels, runs
    2->4->8->16-channel 3x3 convs (strides 1,1,2,2, VALID) + Linear(8), and
    concatenates [task_input, vis_out, batch_concat(rest)] in that order.
    """

    vis_output_dim: int = 8
    mean: float = 77.0
    std: float = 56.0

    @nn.compact
    def __call__(self, observation: dict) -> jax.Array:
        obs = dict(observation)
        left = obs.pop('walker/left_eye').astype(jnp.float32)
        right = obs.pop('walker/right_eye').astype(jnp.float32)
        if left.shape[-1] == 3:  # RGB -> grayscale
            left = jnp.mean(left, axis=-1)
            right = jnp.mean(right, axis=-1)
        left = (left - self.mean) / self.std
        right = (right - self.mean) / self.std
        x = jnp.stack([left, right], axis=-1)  # (B, H, W, 2)
        if x.ndim == 3:
            x = x[None]
            squeeze = True
        else:
            squeeze = False
        for ch, stride in ((2, 1), (4, 1), (8, 2), (16, 2)):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding='VALID')(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.vis_output_dim)(x)
        if squeeze:
            x = x[0]

        task_input = obs.pop('walker/task_input', None)
        rest = nets_lib.batch_concat(obs, batched=not squeeze)
        parts = []
        if task_input is not None:
            parts.append(task_input)
        parts.append(x)
        parts.append(rest)
        return jnp.concatenate(parts, axis=-1)


class TwoLevelController(nn.Module):
    """Trainable high-level steering MLP driving a frozen low-level policy
    (reference network_factory_vis.py:223-292).

    The HL MLP output is initialized near the no-op steering command
    (zero displacement, identity quaternion) via a 0.01-scaled final
    initializer plus the steering ballpark offset.
    """

    ll_apply: Any  # callable(obs_flat) -> distribution (frozen LL policy)
    steering_idx: int  # position of ref_displacement in the LL input
    steering_command_dim: int = 7
    task_input_dim: int = 2
    vis_output_dim: int = 8
    hl_layer_sizes: Sequence[int] = (256, 256, 128)

    @nn.compact
    def __call__(self, x: jax.Array):
        n_repeats = self.steering_command_dim // 7
        ballpark = jnp.asarray(
            n_repeats * [0.0, 0.0, 0.0] + n_repeats * [1.0, 0.0, 0.0, 0.0],
            x.dtype)
        h = x
        # LayerNormMLP with small final init.
        init = nn.initializers.variance_scaling(0.01, 'fan_out', 'uniform')
        h = nn.Dense(self.hl_layer_sizes[0], kernel_init=init)(h)
        h = jnp.tanh(nn.LayerNorm()(h))
        for size in self.hl_layer_sizes[1:]:
            h = nn.elu(nn.Dense(size, kernel_init=init)(h))
        steering = nn.Dense(self.steering_command_dim,
                            kernel_init=init)(h) + ballpark

        offset = self.task_input_dim + self.vis_output_dim
        rest = x[..., offset:]
        ll_input = jnp.concatenate(
            [rest[..., :self.steering_idx], steering,
             rest[..., self.steering_idx:]], axis=-1)
        return self.ll_apply(ll_input)
