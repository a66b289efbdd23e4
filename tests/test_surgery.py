"""Walker surgery sweep tests (reference tests/test_flywalker.py strategy:
body-part config sweep, action routing, filter/dyntype wiring)."""

import itertools

import mujoco
import numpy as np
import pytest

from flybody_tpu.envs import walker as walker_lib
from flybody_tpu.model import surgery


@pytest.mark.parametrize('use_legs,use_wings', [(True, False), (False, True),
                                                (True, True), (False, False)])
def test_body_part_configs_compile_and_step(use_legs, use_wings):
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=use_legs, use_wings=use_wings, use_mouth=False,
        use_antennae=False))
    model, m = fly.compile()
    d = mujoco.MjData(m)
    for _ in range(20):
        d.ctrl[:] = np.random.uniform(-0.2, 0.2, m.nu)
        mujoco.mj_step(m, d)
    assert np.isfinite(d.qpos).all()
    names = model.meta.actuator_names
    has_wings = any('wing' in n for n in names)
    has_legs = any('T1' in n for n in names)
    assert has_wings == use_wings
    assert has_legs == use_legs


@pytest.mark.parametrize('use_mouth,use_antennae', [(True, False),
                                                    (False, True),
                                                    (True, True)])
def test_mouth_antennae_configs(use_mouth, use_antennae):
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=True, use_wings=False, use_mouth=use_mouth,
        use_antennae=use_antennae))
    model, m = fly.compile()
    names = model.meta.actuator_names
    assert any('rostrum' in n for n in names) == use_mouth
    assert any('antenna' in n for n in names) == use_antennae


def test_filterexact_dyntype():
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=True, dyntype_filterexact=True, joint_filter=0.01,
        adhesion_filter=0.007))
    model, m = fly.compile()
    # filterexact == 3 (reference tests/test_flywalker.py:137-168).
    dyn = set(m.actuator_dyntype.tolist())
    assert dyn == {3}
    prm = set(np.round(m.actuator_dynprm[:, 0], 4).tolist())
    assert prm == {0.01, 0.007}


def test_no_filters():
    fly = surgery.build_walker(surgery.WalkerConfig(
        use_legs=True, joint_filter=0.0, adhesion_filter=0.0))
    _, m = fly.compile()
    assert set(m.actuator_dyntype.tolist()) == {0}
    assert m.na == 0


def test_action_routing_matches_ctrl(tmp_path):
    """Exact action -> ctrl scatter (reference test_flywalker.py:66-82)."""
    fly = surgery.build_walker(surgery.WalkerConfig(use_legs=True))
    model, m = fly.compile()
    tables = walker_lib.build_tables(model.meta, num_user_actions=2)
    assert tables.num_actions == m.nu + 2
    action = np.arange(tables.num_actions, dtype=float)
    ctrl = tables.scatter @ action
    # Every mj actuator receives exactly the action at its class position.
    for cls in walker_lib.ACTION_CLASS_ORDER[:-1]:
        for a_idx, c_idx in zip(tables.action_indices[cls],
                                tables.ctrl_indices[cls]):
            assert ctrl[c_idx] == action[a_idx]
    # User actions route nowhere.
    assert (tables.scatter[:, -2:] == 0).all()


def test_num_user_actions_bounds():
    fly = surgery.build_walker(surgery.WalkerConfig(use_legs=True))
    model, _ = fly.compile()
    tables = walker_lib.build_tables(model.meta, num_user_actions=3)
    lo, hi = walker_lib.action_bounds(model, tables)
    assert (lo[-3:] == -1).all() and (hi[-3:] == 1).all()


def test_flyid_template_and_multi_fly_scene():
    """Multi-fly capability (reference add_flyid_labels.py counterpart):
    the template prefixes every name, and a 2-fly scene compiles into one
    FlyModel and steps finitely with per-fly self-contact masks."""
    import jax.numpy as jnp
    import numpy as np
    from flybody_tpu.model import compile as mc
    from flybody_tpu.model import surgery
    from flybody_tpu.physics import collision, engine
    from flybody_tpu.physics.state import make_data

    xml_t, _ = surgery.flyid_template_xml()
    assert '__flyid__/thorax' in xml_t
    assert '__flyid__/claw_T1_left' in xml_t

    xml, assets = surgery.multi_fly_xml(2)
    fly, m = mc.build_fly_model(xml, assets)
    assert fly.meta.nq == 2 * 109 and fly.meta.nv == 2 * 108
    assert m.nu == 2 * 78
    assert 'fly0/thorax' in fly.meta.body_names
    assert 'fly1/thorax' in fly.meta.body_names
    out = engine.step(fly, make_data(fly), solver_iterations=2,
                      ls_iterations=2)
    assert np.isfinite(np.asarray(out.qpos)).all()
    # Self mask: intra-fly pairs only (fly0-fly1 cross pairs excluded).
    tb = collision.pair_tables(fly.meta)
    selfm = collision.self_pair_mask(fly.meta)
    root = np.array(fly.meta.body_rootid)
    cross = (root[tb['slot_body1']] != root[tb['slot_body2']]) & \
        (root[tb['slot_body1']] != 0) & (root[tb['slot_body2']] != 0)
    assert cross.sum() > 0  # inter-fly collision pairs exist
    assert not (selfm & cross).any()
