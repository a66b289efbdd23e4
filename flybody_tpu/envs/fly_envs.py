"""Environment factories: the reference fly_envs API, TPU-native.

Mirrors reference flybody/fly_envs.py: `flight_imitation`, `walk_imitation`,
`walk_on_ball`, `vision_guided_flight`, `template_task`. Each factory
compiles (and caches) a static task model
via build-time surgery, loads/synthesizes reference trajectories, and
returns a dm_env-compatible wrapper; pass functional=True to get the raw
jit/vmap-able env for batched TPU training.
"""

from __future__ import annotations

import functools

import numpy as np

from flybody_tpu.envs import trajectories as traj_lib
from flybody_tpu.envs import wbpg as wbpg_lib
from flybody_tpu.envs.dm_adapter import DmFlyEnv
from flybody_tpu.envs.flight_imitation import FlightImitationEnv
from flybody_tpu.envs.vision_flight import VisionFlightEnv
from flybody_tpu.envs.walk_imitation import WalkImitationEnv
from flybody_tpu.envs.walk_on_ball import TemplateEnv, WalkOnBallEnv
from flybody_tpu.model import surgery

WALK_OBS = ['walker/' + s for s in
            ('accelerometer', 'actuator_activation', 'appendages_pos',
             'force', 'gyro', 'joints_pos', 'joints_vel', 'touch',
             'velocimeter', 'world_zaxis')]
WALK_IMITATION_OBS = WALK_OBS + ['walker/ref_displacement',
                                 'walker/ref_root_quat']
FLIGHT_OBS = ['walker/' + s for s in
              ('accelerometer', 'actuator_activation', 'gyro', 'joints_pos',
               'joints_vel', 'velocimeter', 'world_zaxis',
               'ref_displacement', 'ref_root_quat')]
BALL_OBS = WALK_OBS + ['walker/ball_qvel']
VISION_OBS = ['walker/' + s for s in
              ('accelerometer', 'actuator_activation', 'gyro', 'joints_pos',
               'joints_vel', 'velocimeter', 'world_zaxis', 'right_eye',
               'left_eye', 'task_input')]


def _with_extras(obs_list, env_kwargs):
    """Appends extra_observables names to an adapter observation list."""
    extras = env_kwargs.get('extra_observables', ())
    return list(obs_list) + [f'walker/{n}' for n in extras
                             if f'walker/{n}' not in obs_list]


@functools.lru_cache(maxsize=16)
def _walking_model(force_actuators: bool = False,
                   disable_wings: bool = True,
                   joint_filter: float = 0.01,
                   adhesion_filter: float = 0.007,
                   claw_friction: float = 1.0):
    # NOTE: disable_wings retracts/disables wing *actuators*; the wing
    # joints remain and are spring-retracted (reference base.py:367-428).
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=True, use_wings=not disable_wings,
        force_actuators=force_actuators, joint_filter=joint_filter,
        adhesion_filter=adhesion_filter, physics_timestep=2e-4,
        control_timestep=2e-3))
    fly.add_floor()
    fly.exclude_wing_leg_contacts()
    if claw_friction is not None:
        fly.set_claw_friction(claw_friction)
    model, _ = fly.compile()
    return model


@functools.lru_cache(maxsize=16)
def _flight_model(force_actuators: bool = False,
                  disable_legs: bool = True,
                  joint_filter: float = 0.0,
                  floor_contacts: bool = False):
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=not disable_legs, use_wings=True,
        force_actuators=force_actuators, joint_filter=joint_filter,
        adhesion_filter=0.007, physics_timestep=5e-5,
        control_timestep=2e-4))
    fly.add_floor()
    fly.set_wing_params(surgery.WING_PARAMS['gainprm'],
                        surgery.WING_PARAMS['stiffness'],
                        surgery.WING_PARAMS['damping'],
                        surgery.WING_PARAMS['fluidcoef'])
    fly.exclude_wing_leg_contacts()
    if not floor_contacts:
        fly.disable_floor_contacts()
    model, _ = fly.compile()
    return model


@functools.lru_cache(maxsize=4)
def _ball_model(force_actuators: bool = False,
                disable_wings: bool = True,
                claw_friction: float = 1.0):
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=True, use_wings=not disable_wings,
        force_actuators=force_actuators, joint_filter=0.01,
        adhesion_filter=0.007, physics_timestep=2e-4,
        control_timestep=2e-3))
    fly.remove_freejoint()
    fly.add_ball()
    fly.exclude_wing_leg_contacts()
    fly.exclude_thorax_children()
    if claw_friction is not None:
        fly.set_claw_friction(claw_friction)
    model, _ = fly.compile()
    return model


def flight_imitation(ref_path: str | None = None,
                     wpg_pattern_path: str | None = None,
                     force_actuators: bool = False,
                     disable_legs: bool = True,
                     traj_indices=None,
                     randomize_start_step: bool = True,
                     joint_filter: float = 0.0,
                     future_steps: int = 5,
                     terminal_com_dist: float = 2.0,
                     functional: bool = False,
                     seed: int | None = None,
                     **env_kwargs):
    """Flight tracking task (reference fly_envs.py:30-97)."""
    model = _flight_model(force_actuators, disable_legs, joint_filter)
    if wpg_pattern_path is not None:
        base_pattern = np.load(wpg_pattern_path)
    else:
        base_pattern = None
    tables = wbpg_lib.build_tables(base_pattern)
    if ref_path is not None:
        if ref_path.endswith('.ftrj'):
            from flybody_tpu.data import native_store
            store, _ = native_store.load_packed(ref_path, traj_indices)
        else:
            store = traj_lib.load_flight_hdf5(ref_path, traj_indices)
    else:
        store = traj_lib.inference_flight_store()
    env = FlightImitationEnv(model, store, tables,
                             terminal_com_dist=terminal_com_dist,
                             future_steps=future_steps,
                             randomize_start_step=randomize_start_step,
                             time_limit=0.6, **env_kwargs)
    if functional:
        return env
    return DmFlyEnv(env, _with_extras(FLIGHT_OBS, env_kwargs), seed=seed)


def walk_imitation(ref_path: str | None = None,
                   force_actuators: bool = False,
                   disable_wings: bool = True,
                   traj_indices=None,
                   terminal_com_dist: float = 0.3,
                   joint_filter: float = 0.01,
                   future_steps: int = 64,
                   functional: bool = False,
                   seed: int | None = None,
                   **env_kwargs):
    """Walking imitation task (reference fly_envs.py:100-155)."""
    model = _walking_model(force_actuators, disable_wings, joint_filter)
    if ref_path is not None:
        if ref_path.endswith('.ftrj'):
            from flybody_tpu.data import native_store
            store, ds_meta = native_store.load_packed(ref_path,
                                                      traj_indices)
            site_names = ds_meta['sites']
            joint_names = ds_meta['joints']
        else:
            store, site_names, joint_names = traj_lib.load_walking_hdf5(
                ref_path, traj_indices)
        inference = False
    else:
        store = traj_lib.inference_walking_store()
        site_names, joint_names = [], []
        inference = True
    env = WalkImitationEnv(model, store,
                           mocap_joint_names=joint_names,
                           mocap_site_names=site_names,
                           terminal_com_dist=terminal_com_dist,
                           future_steps=future_steps,
                           inference_mode=inference,
                           time_limit=10.0, **env_kwargs)
    if functional:
        return env
    return DmFlyEnv(env, _with_extras(WALK_IMITATION_OBS, env_kwargs),
                    seed=seed)


def walk_on_ball(force_actuators: bool = False,
                 disable_wings: bool = True,
                 functional: bool = False,
                 seed: int | None = None,
                 **env_kwargs):
    """Tethered fly on a floating ball (reference fly_envs.py:158-191)."""
    model = _ball_model(force_actuators, disable_wings)
    env = WalkOnBallEnv(model, time_limit=2.0, **env_kwargs)
    if functional:
        return env
    return DmFlyEnv(env, _with_extras(BALL_OBS, env_kwargs), seed=seed)


def vision_guided_flight(wpg_pattern_path: str | None = None,
                         bumps_or_trench: str = 'bumps',
                         force_actuators: bool = False,
                         disable_legs: bool = True,
                         joint_filter: float = 0.0,
                         functional: bool = False,
                         seed: int | None = None,
                         **env_kwargs):
    """Vision-guided flight over bumps/trench terrain
    (reference fly_envs.py:194-246)."""
    model = _flight_model(force_actuators, disable_legs, joint_filter,
                          floor_contacts=True)
    base_pattern = (np.load(wpg_pattern_path) if wpg_pattern_path else None)
    tables = wbpg_lib.build_tables(base_pattern)
    env = VisionFlightEnv(model, tables, bumps_or_trench=bumps_or_trench,
                          time_limit=0.4, **env_kwargs)
    if functional:
        return env
    return DmFlyEnv(env, _with_extras(VISION_OBS, env_kwargs), seed=seed)


def template_task(force_actuators: bool = False,
                  disable_wings: bool = True,
                  joint_filter: float = 0.01,
                  adhesion_filter: float = 0.007,
                  time_limit: float = 1.0,
                  action_corruptor=None,
                  control_callback=None,
                  functional: bool = False,
                  seed: int | None = None,
                  **env_kwargs):
    """No-op walking task for testing (reference fly_envs.py:249-300).

    `control_callback(model, data) -> data` is the functional analogue of
    the reference's `mjcb_control` (reference fly_envs.py:255-296): it
    runs at the start of every physics substep and may inject
    qfrc_applied / xfrc_applied."""
    model = _walking_model(force_actuators, disable_wings, joint_filter,
                           adhesion_filter)
    env = TemplateEnv(model, time_limit=time_limit,
                      action_corruptor=action_corruptor,
                      control_callback=control_callback, **env_kwargs)
    if functional:
        return env
    return DmFlyEnv(env, _with_extras(WALK_OBS, env_kwargs), seed=seed)
