"""Vision stack tests: terrain generation and eye-camera rendering."""

import jax
import numpy as np
import pytest

from flybody_tpu.vision import hfield as hf


def test_sine_trench_terrain():
    terrain, spec = hf.sine_trench_terrain(jax.random.PRNGKey(0))
    terrain = np.asarray(terrain)
    assert terrain.shape == (hf.RES, hf.RES)
    assert terrain.min() >= 0.0
    assert 1.0 < terrain.max() < 6.0  # bowl elevation 4-5
    # The trench floor near the entrance is carved to ~0.
    valid = np.asarray(spec.valid) > 0
    assert valid.sum() > 20
    xs = np.asarray(spec.x_coords)[valid]
    ys = np.asarray(spec.y_coords)[valid]
    h_center = np.array([
        np.asarray(hf.height_at(terrain, x, y)) for x, y in
        zip(xs[::10], ys[::10])])
    assert (h_center < 0.4).mean() > 0.7  # carved along the centerline
    # Walls adjacent to the centerline are high.
    h_wall = np.asarray(hf.height_at(terrain, xs[len(xs) // 2],
                                     ys[len(ys) // 2] + 2.0))
    assert h_wall > 0.5


def test_sine_bumps_terrain():
    terrain, _ = hf.sine_bumps_terrain(jax.random.PRNGKey(1))
    terrain = np.asarray(terrain)
    assert np.isfinite(terrain).all()
    # Sine bumps impose x-periodic structure: column means vary.
    col_means = terrain.mean(axis=0)
    assert col_means.std() > 0.05


def test_height_lookup():
    terrain, _ = hf.sine_bumps_terrain(jax.random.PRNGKey(2))
    h = hf.height_at(terrain, 0.0, 0.0)
    hn = hf.nearest_height_at(terrain, 0.0, 0.0)
    assert abs(float(h) - float(hn)) < 0.2


@pytest.mark.parametrize('kind', ['bumps', 'trench'])
def test_vision_env_eyes(kind):
    from flybody_tpu.envs import fly_envs
    env = fly_envs.vision_guided_flight(bumps_or_trench=kind, seed=0)
    ts = env.reset()
    for eye in ('walker/right_eye', 'walker/left_eye'):
        img = ts.observation[eye]
        assert img.shape == (32, 32)
        assert img.min() >= 0.0 and img.max() <= 255.0
        assert img.std() > 5.0  # scene structure visible
    assert ts.observation['walker/task_input'].shape == (2,)
    ts = env.step(np.zeros(12))
    assert np.isfinite(ts.reward)


def test_tracking_camera_render():
    import jax
    import numpy as np
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.vision import rasterizer

    env = fly_envs.walk_on_ball(functional=True)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    fkd, _, _ = kin.fwd_position_smooth(env.model, state.data)
    img = np.asarray(rasterizer.render_tracking(env.model, fkd, size=32,
                                                distance=1.2))
    assert img.shape == (32, 32)
    assert img.min() >= 0.0 and img.max() <= 255.0
    # Scene content: sky above (background), bright geometry below.
    bg = 0.25 * 255.0
    assert abs(float(img[0].mean()) - bg) < 8.0  # top row ~ sky
    assert float(img[-8:].mean()) > bg + 30.0    # bottom: ball/floor

    # Camera pose helper: orthonormal, looks at the target.
    import jax.numpy as jnp
    pos, mat = rasterizer.tracking_camera_pose(
        jnp.zeros(3), azimuth_deg=10.0, elevation_deg=-30.0, distance=2.0)
    np.testing.assert_allclose(np.asarray(mat.T @ mat), np.eye(3),
                               atol=1e-6)
    fwd = -np.asarray(mat[:, 2])
    look = -np.asarray(pos)
    look = look / np.linalg.norm(look)
    np.testing.assert_allclose(fwd, look, atol=1e-6)


def test_ghost_fly_render():
    """Imitation ghost fly: walk env exposes ghost_qpos and the tracking
    render draws it (reference add_ghost walker, tasks/base.py:141-154)."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics.state import make_data
    from flybody_tpu.vision import rasterizer

    env = fly_envs.walk_imitation(functional=True)
    rng = jax.random.PRNGKey(0)
    task = env._init_task(rng)
    gq = env.ghost_qpos(task, 0)
    assert gq.shape == (env.model.meta.nq,)
    # Root comes from the reference trajectory.
    ref0 = env.store.qpos[task.traj_idx, 0]
    np.testing.assert_allclose(np.asarray(gq[:7]), np.asarray(ref0[:7]))

    # Render with the ghost offset to the side: pixels must differ.
    data = make_data(env.model).replace(qpos=env.model.qpos0)
    fkd, _, _ = kin.fwd_position_smooth(env.model, data)
    gdata = make_data(env.model).replace(
        qpos=gq.at[:3].set(jnp.asarray([0.15, 0.0, 0.12], gq.dtype)))
    gfkd, _, _ = kin.fwd_position_smooth(env.model, gdata)
    img_plain = np.asarray(rasterizer.render_tracking(
        env.model, fkd, size=48, floor_z=0.0))
    img_ghost = np.asarray(rasterizer.render_tracking(
        env.model, fkd, size=48, floor_z=0.0, ghost_data=gfkd))
    assert np.isfinite(img_ghost).all()
    assert (img_ghost != img_plain).any()
