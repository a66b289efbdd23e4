"""Rollout and visualization helpers (counterpart of reference
flybody/utils.py and flybody/agents/utils_tf.py)."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def any_substr_in_str(substrings: Sequence[str], string: str) -> bool:
    """Checks if any of substrings is in string (reference utils.py:76)."""
    return any(s in string for s in substrings)


def rollout_and_render(env, policy, n_steps: int = 100,
                       run_until_termination: bool = False,
                       camera_ids: Sequence[int] | int = (),
                       ghost: bool = False,
                       ghost_offset: Sequence[float] = (0.0, 0.0, 0.0),
                       **render_kwargs) -> dict:
    """Rollout a dm-adapter env with `policy` and collect frames
    (reference utils.py:11-40). Frames are rendered with the on-device eye
    rasterizer when camera rendering is requested; qpos/reward traces are
    always returned.

    `ghost=True` draws the reference trajectory pose as a washed-out
    ghost fly in the tracking view (imitation tasks whose functional env
    exposes `ghost_qpos(task, step)` — the counterpart of the
    reference's add_ghost walker, tasks/base.py:141-154). `ghost_offset`
    shifts it for visibility, like the reference's ghost_offset."""
    timestep = env.reset()
    frames, qposes, rewards = [], [], []
    step = 0
    while ((step < n_steps) if not run_until_termination
           else (timestep.step_type != 2 or step == 0)):
        action = policy(timestep.observation)
        timestep = env.step(action)
        rewards.append(timestep.reward)
        state = env._state  # dm adapter internal functional state
        qposes.append(np.asarray(state.data.qpos))
        if camera_ids != ():
            from flybody_tpu.physics import kinematics as kin
            from flybody_tpu.vision import rasterizer
            fenv = env.functional_env
            fkd, _, _ = kin.fwd_position_smooth(fenv.model, state.data)
            terrain = getattr(state.task, 'terrain', None)
            ghost_fkd = None
            if ghost and hasattr(fenv, 'ghost_qpos'):
                import jax.numpy as jnp
                from flybody_tpu.physics.state import make_data
                gq = fenv.ghost_qpos(state.task, state.step_idx)
                gq = gq.at[:3].add(jnp.asarray(ghost_offset, gq.dtype))
                gdata = make_data(fenv.model).replace(qpos=gq)
                ghost_fkd, _, _ = kin.fwd_position_smooth(
                    fenv.model, gdata)
            frame = {}
            if 'eyes' in camera_ids or camera_ids is True:
                frame.update({k: np.asarray(v) for k, v in
                              rasterizer.render_eyes(
                                  fenv.model, fkd, terrain).items()})
            if 'track' in camera_ids or camera_ids is True:
                frame['track'] = np.asarray(rasterizer.render_tracking(
                    fenv.model, fkd, terrain, ghost_data=ghost_fkd,
                    **render_kwargs))
            frames.append(frame)
        step += 1
    return {'frames': frames, 'qpos': np.array(qposes),
            'rewards': np.array(rewards)}


def display_video(frames, framerate: int = 30):
    """Matplotlib HTML video helper (reference utils.py:42-74)."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    from IPython.display import HTML

    height, width = np.asarray(frames[0]).shape[:2]
    dpi = 70
    fig, ax = plt.subplots(1, 1, figsize=(width / dpi, height / dpi),
                           dpi=dpi)
    ax.set_axis_off()
    ax.set_aspect('equal')
    ax.set_position([0, 0, 1, 1])
    im = ax.imshow(frames[0], cmap='gray')

    def update(frame):
        im.set_data(frame)
        return [im]

    interval = 1000 / framerate
    anim = animation.FuncAnimation(fig=fig, func=update, frames=frames,
                                   interval=interval, blit=True,
                                   repeat=False)
    return HTML(anim.to_html5_video())


class TestPolicyWrapper:
    """Adapts a trained DMPO policy for non-batched test-time inference
    (reference agents/utils_tf.py:15-55)."""

    def __init__(self, learner, learner_state, mode: str = 'mean',
                 seed: int = 0):
        assert mode in ('mean', 'sample')
        self._learner = learner
        self._state = learner_state
        self._mode = mode
        self._rng = jax.random.PRNGKey(seed)
        from flybody_tpu.agents.networks import batch_concat
        self._concat = batch_concat

        @jax.jit
        def _call(state, obs_flat, rng):
            dist = learner.policy_dist(state, obs_flat, target=True)
            if mode == 'sample':
                return dist.sample(rng)
            return dist.mode()

        self._call = _call

    def update_state(self, learner_state):
        self._state = learner_state

    def __call__(self, observation) -> np.ndarray:
        obs_flat = self._concat(
            {k: jnp.asarray(v) for k, v in observation.items()},
            batched=False)
        self._rng, sub = jax.random.split(self._rng)
        a = self._call(self._state, obs_flat, sub)
        return np.clip(np.asarray(a), -1.0, 1.0)


def canonical2real(action, action_min, action_max, clip: bool = True):
    """Canonical [-1, 1] -> real action (reference task_utils.py:96-121)."""
    action = np.asarray(action)
    if clip:
        action = np.clip(action, -1, 1)
    return 0.5 * (action + 1) * (action_max - action_min) + action_min


def real2canonical(action, action_min, action_max, clip: bool = True):
    """Real -> canonical [-1, 1] action (reference task_utils.py:68-93)."""
    action = np.asarray(action)
    if clip:
        action = np.clip(action, action_min, action_max)
    return (action - action_min) / (0.5 * (action_max - action_min)) - 1.0


def wing_qpos_to_conventional(model_wing_qpos,
                              body_pitch_angle: float = 47.5):
    """Model wing qpos -> conventional wing kinematics
    (reference task_utils.py:28-55)."""
    q = np.array(model_wing_qpos)
    out = np.zeros_like(q)
    pitch = np.deg2rad(body_pitch_angle)
    out[..., [0, 3]] = q[..., [0, 3]]
    out[..., [1, 4]] = -q[..., [1, 4]]
    out[..., [2, 5]] = np.pi / 2 - pitch - q[..., [2, 5]]
    return out


def get_random_policy(action_spec, minimum: float = -0.2,
                      maximum: float = 0.2) -> Callable[[Any], np.ndarray]:
    """Random policy matching an action spec (reference
    task_utils.py:58-65)."""
    shape = action_spec.shape

    def random_policy(observation):
        del observation
        return np.random.uniform(minimum, maximum, shape)

    return random_policy
