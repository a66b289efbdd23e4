"""Heightfield physics contacts (physics/terrain.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.envs import fly_envs
from flybody_tpu.physics import collision, engine, terrain as terr
from flybody_tpu.physics.state import make_data
from flybody_tpu.vision import hfield as hf


def _model():
    m = fly_envs._walking_model(False, True, 0.01)
    return jax.tree.map(jnp.asarray, m)


def test_slot_tables_consistent():
    model = _model()
    meta = model.meta
    base = collision.pair_tables(meta)
    ext = collision.pair_tables(meta, terrain=True)
    ttb = terr.terrain_tables(meta)
    assert ext['nslot'] == base['nslot'] + ttb['nslot']
    assert ttb['nslot'] > 0
    # Terrain slots: world body on side 1, fly bodies on side 2.
    tail_b1 = ext['slot_body1'][base['nslot']:]
    tail_b2 = ext['slot_body2'][base['nslot']:]
    assert (tail_b1 == 0).all()
    assert (tail_b2 > 0).all()
    # Contact arrays match the extended slot count.
    terrain, _ = hf.sine_bumps_terrain(jax.random.PRNGKey(0))
    d = make_data(model).replace(qpos=model.qpos0)
    d, _, _ = __import__(
        'flybody_tpu.physics.kinematics', fromlist=['kinematics']
    ).kinematics(model, d)
    con = collision.collide(model, d, terrain=terrain.astype(jnp.float64))
    assert con.dist.shape[0] == ext['nslot']


def test_fly_rests_on_terrain():
    model = _model()
    terrain, _ = hf.sine_bumps_terrain(jax.random.PRNGKey(0))
    terrain = terrain.astype(jnp.float64)
    x0, y0 = 2.0, 1.0
    h0 = float(hf.height_at(terrain, x0, y0))
    qpos = model.qpos0.at[0].set(x0).at[1].set(y0).at[2].set(h0 + 0.2)
    d = make_data(model).replace(qpos=qpos)
    step = jax.jit(lambda d: engine.step(model, d, terrain=terrain))
    for _ in range(250):  # 50 ms: fall ~0.12 cm and settle on contacts
        d = step(d)
    z = float(d.qpos[2])
    assert z > h0 - 0.05, 'fly fell through the terrain'
    assert z < h0 + 0.2, 'fly never fell onto the terrain'

    # Without terrain the same drop keeps falling past the surface.
    d2 = make_data(model).replace(qpos=qpos)
    step2 = jax.jit(lambda d: engine.step(model, d))
    for _ in range(250):
        d2 = step2(d2)
    assert float(d2.qpos[2]) < z - 0.05


def test_tangent_plane_surface():
    terrain, _ = hf.sine_bumps_terrain(jax.random.PRNGKey(1))
    terrain = terrain.astype(jnp.float64)
    x = jnp.asarray([0.0, 1.5, -3.0])
    y = jnp.asarray([0.0, -2.0, 4.0])
    p0, n = terr._surface(terrain, x, y)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0,
                               atol=1e-12)
    assert (np.asarray(n)[:, 2] > 0).all()
    np.testing.assert_allclose(np.asarray(p0[:, 2]),
                               np.asarray(hf.height_at(terrain, x, y)),
                               atol=1e-12)
