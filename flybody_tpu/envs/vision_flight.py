"""Vision-guided flight over procedural terrain.

Functional counterpart of the reference VisionFlightImitationWBPG
(flybody/tasks/vision_flight.py): the fly flies over regenerated bumps or
trench terrain, sees it through two 32x32 eye cameras rendered on-device,
receives (target_height, target_speed) as a task_input observable, and is
rewarded for holding height/speed/heading/trench-center; floor contact is
fatal.

Terrain is a per-env device array regenerated at reset (the reference
rewrites the MuJoCo hfield asset per episode, hills.py:347-393). The
terrain is a real collision surface: physics/terrain.py narrowphase adds
hfield contact rows to the solver (tangent-plane formulation). Crash
termination additionally uses a direct height test of the fly's collision
geoms against the surface (the reference terminates on walker-floor
contact pairs, vision_flight.py:235-262 — both fire within one control
step of touching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flybody_tpu.envs import base as envbase
from flybody_tpu.envs import rewards as rewards_lib
from flybody_tpu.envs import wbpg as wbpg_lib
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.utils import quaternions as quat
from flybody_tpu.vision import hfield as hf
from flybody_tpu.vision import rasterizer


@struct.dataclass
class VisionTask:
    terrain: jax.Array  # (RES, RES) heights, cm
    trench: hf.TrenchSpec
    target_height: jax.Array
    target_speed: jax.Array
    wbpg: wbpg_lib.WBPGState


class VisionFlightEnv(envbase.FruitFlyEnv):
    """Vision-guided flight (reference vision_flight.py:17-271)."""

    def __init__(self, model: FlyModel, wbpg_tables: wbpg_lib.WBPGTables,
                 bumps_or_trench: str = 'bumps',
                 target_height_range=(0.5, 0.8),
                 target_speed_range=(20.0, 40.0),
                 init_pos_x_range=(-5.0, -5.0),
                 init_pos_y_range=(0.0, 0.0),
                 eye_camera_size: int = 32,
                 eye_camera_fovy: float = 150.0,
                 floor_contacts_fatal: bool = True,
                 terrain_physics: bool = True,
                 time_limit: float = 0.4,
                 **kwargs):
        super().__init__(model, num_user_actions=1,
                         control_timestep=2e-4, physics_timestep=5e-5,
                         time_limit=time_limit, **kwargs)
        self.wbpg = wbpg_tables
        self.bumps_or_trench = bumps_or_trench
        self.target_height_range = target_height_range
        self.target_speed_range = target_speed_range
        self.init_pos_x_range = init_pos_x_range
        self.init_pos_y_range = init_pos_y_range
        self.eye_size = eye_camera_size
        self.eye_fovy = eye_camera_fovy
        self.floor_contacts_fatal = floor_contacts_fatal
        self.terrain_physics = terrain_physics
        tb = self.tables
        self._wing_action_idx = np.array(tb.action_indices['wings'])
        self._user_action_idx = tb.action_indices['user'][0]
        meta = model.meta
        self._updir_site = meta.site_names.index('hover_up_dir')
        theta = np.deg2rad(47.5)  # body pitch (reference constants.py:18)
        self._target_zaxis = np.array([np.sin(theta), 0.0, np.cos(theta)])
        # Fly collision geoms for terrain-crash detection.
        self._coll_geoms = np.array(
            [g for g in range(meta.ngeom)
             if (meta.geom_contype[g] or meta.geom_conaffinity[g])
             and meta.geom_bodyid[g] != 0], dtype=np.int64)

    # ------------------------------------------------------------------ task

    def _init_task(self, rng) -> VisionTask:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        if self.bumps_or_trench == 'trench':
            terrain, trench = hf.sine_trench_terrain(r1)
        else:
            terrain, trench = hf.sine_bumps_terrain(r1)
        th = jax.random.uniform(r2, (), minval=self.target_height_range[0],
                                maxval=self.target_height_range[1])
        tspd = jax.random.uniform(r3, (), minval=self.target_speed_range[0],
                                  maxval=self.target_speed_range[1])
        wstate, _, _ = wbpg_lib.reset(self.wbpg, jax.random.uniform(r4, ()))
        return VisionTask(terrain=terrain.astype(self.model.qpos0.dtype),
                          trench=trench, target_height=th,
                          target_speed=tspd, wbpg=wstate)

    def _init_qpos_qvel_act(self, task: VisionTask, rng):
        dtype = self.model.qpos0.dtype
        model = self.model
        r1, r2 = jax.random.split(rng)
        init_x = jax.random.uniform(r1, (), dtype,
                                    self.init_pos_x_range[0],
                                    self.init_pos_x_range[1] + 1e-9)
        init_y = jax.random.uniform(r2, (), dtype,
                                    self.init_pos_y_range[0],
                                    self.init_pos_y_range[1] + 1e-9)
        hh = hf.nearest_height_at(task.terrain, init_x, init_y)
        init_z = hh + task.target_height
        qpos = model.qpos0
        qpos = qpos.at[0].set(init_x).at[1].set(init_y).at[2].set(init_z)
        # Root orientation = inverse of the hover up-dir site quat
        # (reference vision_flight.py:130-131).
        up = model.site_quat[self._updir_site]
        qpos = qpos.at[3:7].set(quat.conj_quat(up))
        # Wings at WBPG initial phase.
        angles = self.wbpg.traj[task.wbpg.freq_idx, task.wbpg.step]
        qpos = qpos.at[self.tables.wing_qpos_idx].set(angles.astype(dtype))
        qvel = jnp.zeros((model.meta.nv,), dtype)
        if len(self.tables.leg_qpos_idx):
            qpos = qpos.at[self.tables.leg_qpos_idx].set(
                model.qpos_spring[self.tables.leg_qpos_idx])
        act = jnp.zeros((model.meta.na,), dtype)
        return qpos, qvel, act

    def _terrain(self, state):
        return state.task.terrain if self.terrain_physics else None

    def _before_step(self, state, action):
        task = state.task
        dtype = action.dtype
        act_user = action[self._user_action_idx]
        ctrl_freq = self.wbpg.base_freq * (
            1.0 + self.wbpg.rel_freq_range * act_user)
        wstate, pattern = wbpg_lib.step(self.wbpg, task.wbpg, ctrl_freq)
        wing_qpos = state.data.qpos[self.tables.wing_qpos_idx]
        action = action.at[self._wing_action_idx].add(
            pattern.astype(dtype) - wing_qpos)
        return task.replace(wbpg=wstate), action

    def _observations(self, state, fkd, sensors_mean):
        obs = {}
        obs.update(self._obs_vestibular(fkd, sensors_mean))
        obs.update(self._obs_proprioception(state, fkd))
        eyes = rasterizer.render_eyes(self.model, fkd, state.task.terrain,
                                      size=self.eye_size,
                                      fovy=self.eye_fovy)
        obs['walker/right_eye'] = eyes['eye_right']
        obs['walker/left_eye'] = eyes['eye_left']
        obs['walker/task_input'] = jnp.stack(
            [state.task.target_height, state.task.target_speed])
        return obs

    def _reward_factors(self, state, fkd):
        dtype = fkd.qpos.dtype
        task = state.task
        xpos = fkd.qpos[:3]
        hh = hf.nearest_height_at(task.terrain, xpos[0], xpos[1])
        height = rewards_lib.tolerance_linear(
            (xpos[2] - hh) - task.target_height, margin=0.15)

        # World-frame root velocity.
        vel_world = state.data.qvel[:3]
        x_speed = jnp.where(
            vel_world[0] >= task.target_speed, jnp.ones((), dtype),
            rewards_lib.tolerance_linear(vel_world[0] - task.target_speed,
                                         margin=1.1 * task.target_speed))
        speed = rewards_lib.tolerance_linear(
            jnp.linalg.norm(vel_world) - task.target_speed,
            margin=1.1 * task.target_speed)

        # Egocentric side speed (velocimeter y at the thorax).
        R = fkd.xmat[self.tables.thorax_body]
        vel_local = R.T @ vel_world
        side_speed = rewards_lib.tolerance_linear(vel_local[1], margin=10.0)

        zaxis = R[2, :]
        angle = jnp.arccos(jnp.clip(
            jnp.dot(jnp.asarray(self._target_zaxis, dtype), zaxis),
            -1.0, 1.0))
        world_zaxis = rewards_lib.tolerance_linear(angle, margin=jnp.pi)

        # Center-of-trench factor.
        if self.bumps_or_trench == 'trench':
            tr = task.trench
            dist_x = jnp.abs(tr.x_coords - xpos[0]) + 1e6 * (1 - tr.valid)
            idx = jnp.argmin(dist_x)
            in_trench = tr.valid[idx] > 0
            center = tr.y_coords[idx]
            cot = jnp.where(
                in_trench,
                rewards_lib.tolerance_linear(xpos[1] - center, margin=0.15),
                jnp.ones((), dtype))
        else:
            cot = jnp.ones((), dtype)

        factors = [height, x_speed, speed, side_speed, world_zaxis, cot]
        if len(self.tables.leg_qpos_idx):
            qdiff = (fkd.qpos[self.tables.leg_qpos_idx]
                     - self.model.qpos_spring[self.tables.leg_qpos_idx])
            factors.append(jnp.prod(
                rewards_lib.tolerance_linear(qdiff, margin=4.0)))
        return jnp.stack(factors)

    def _check_termination(self, state, fkd, obs):
        task = state.task
        qacc_huge = envbase.exceeds(jnp.linalg.norm(state.data.qacc),
                                    envbase.TERMINAL_QACC)
        if not self.floor_contacts_fatal:
            return qacc_huge, jnp.zeros((), bool)
        # Terrain crash: any collision geom sphere-bound below the surface.
        gp = fkd.geom_xpos[self._coll_geoms]
        rb = self.model.geom_rbound[self._coll_geoms]
        hh = hf.height_at(task.terrain, gp[:, 0], gp[:, 1])
        crash = jnp.any(envbase.below(gp[:, 2] - 0.5 * rb, hh))
        return crash | qacc_huge, jnp.zeros((), bool)
