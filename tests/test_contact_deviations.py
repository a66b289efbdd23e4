"""Quantified contact-model deviation report vs CPU MuJoCo.

The engine's documented structural deviation from MuJoCo 3.x is manifold
shape: MuJoCo's flat-face/CCD contacts can emit multi-point manifolds
while this engine emits one point per pair (exactly replicated rows are
collapsed into one row with nrep-scaled D — physics/collision.py
_pair_nrep; the capsule-cylinder 3-row case is matched exactly that
way). This test bounds the *force* consequence of that deviation for
every geom-type pair family that actually occurs in contact-rich
walking states, instead of leaving it anecdotal:

for each of several MuJoCo-rolled states (settled + random actuation),
aggregate per (type1, type2) family
    * contact-point counts (MuJoCo manifold points vs our slots),
    * net contact-force magnitude |sum_i f_n,i| per family,
and assert the family force totals agree within tolerance while the
full qacc tracks MuJoCo. Run with -s to see the table; the measured
numbers are recorded in ARCHITECTURE.md (contact deviation surface).

Reference behavior: MuJoCo C engine as consumed by the reference
environment stack (flybody relies on dm_control/MuJoCo for all contact
dynamics, e.g. reference flybody/tasks/base.py:397-401 floor params).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.physics import collision, smooth, solver
from flybody_tpu.physics.state import make_data

FLOOR = ('<worldbody><geom name="floor" type="plane" size="50 50 0.1" '
         'friction="0.5" solref="0.001 1" solimp="0.95 0.99 0.01"/>')

TYPE_NAMES = {0: 'plane', 2: 'sphere', 3: 'capsule', 4: 'ellipsoid',
              5: 'cylinder', 6: 'box', 7: 'mesh'}


@pytest.fixture(scope='module')
def models():
    xml, assets = mc.fly_xml_and_assets()
    xml = xml.replace('<worldbody>', FLOOR, 1)
    return mc.build_fly_model(xml, assets)


def _mj_states(m, n_states=3, seed=11):
    """Contact-rich states rolled by MuJoCo itself (settled + random
    actuation), so both engines evaluate identical (qpos, qvel, ctrl)."""
    rng = np.random.RandomState(seed)
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = 0.1278
    for _ in range(2000):
        mujoco.mj_step(m, d)
    states = [(d.qpos.copy(), d.qvel.copy(), np.zeros(m.nu),
               d.act.copy())]
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    for _ in range(n_states - 1):
        ctrl = lo + (hi - lo) * rng.rand(m.nu)
        d.ctrl[:] = ctrl
        for _ in range(150):
            mujoco.mj_step(m, d)
        states.append((d.qpos.copy(), d.qvel.copy(), ctrl.copy(),
                       d.act.copy()))
    return states


def _family(m, g1, g2):
    t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
    a, b = sorted((t1, t2))
    return f'{TYPE_NAMES.get(a, a)}-{TYPE_NAMES.get(b, b)}'


def _mj_total_cost(m, d, qacc):
    """Gauss + constraint cost of a candidate qacc under MuJoCo's own
    primal model (mj_constraintUpdate), for the flat-optimum check."""
    jar = np.zeros(d.nefc)
    mujoco.mj_mulJacVec(m, d, jar, qacc)
    jar -= d.efc_aref
    cost = np.zeros(1)
    mujoco.mj_constraintUpdate(m, d, jar, cost, 0)
    dx = qacc - d.qacc_smooth
    Mdx = np.zeros(m.nv)
    mujoco.mj_mulM(m, d, Mdx, dx)
    return 0.5 * float(dx @ Mdx) + float(cost[0])


def test_contact_force_deviation_by_family(models):
    fly, m = models
    tb = collision.pair_tables(fly.meta)
    report = {}
    qacc_errs = []
    cost_gaps = []
    for si, (qpos, qvel, ctrl, act) in enumerate(_mj_states(m)):
        d = mujoco.MjData(m)
        d.qpos[:], d.qvel[:], d.ctrl[:] = qpos, qvel, ctrl
        d.act[:] = act
        # Compare the main Newton solve only (noslip order-dependence
        # is covered at trajectory level elsewhere).
        m.opt.noslip_iterations = 0
        try:
            mujoco.mj_forward(m, d)
        finally:
            m.opt.noslip_iterations = 3
        mj = {}
        for c in d.contact:
            if c.dim not in (1, 3):
                continue
            fam = _family(m, c.geom1, c.geom2)
            f = np.zeros(6)
            mujoco.mj_contactForce(m, d, list(d.contact).index(c), f)
            ent = mj.setdefault(fam, [0, 0.0])
            ent[0] += 1
            ent[1] += abs(f[0])  # normal component

        data = make_data(fly).replace(qpos=jnp.asarray(qpos),
                                      qvel=jnp.asarray(qvel),
                                      ctrl=jnp.asarray(ctrl),
                                      act=jnp.asarray(act))
        data = smooth.fwd_smooth(fly, data)
        con = collision.collide(fly, data)
        efc = solver.make_efc(fly, data, con, ncon_max=64)
        data, a_free = smooth.factor_solve_m(fly, data, data.qfrc_smooth)
        qacc, _, _, f_c = solver.solve(fly, data, efc, a_free,
                                       iterations=25, ls_iterations=12)
        ours = {}
        act = np.asarray(efc.con_active) > 0
        sel = np.asarray(efc.con_sel)
        fc = np.asarray(f_c)
        for k in np.where(act)[0]:
            g1 = int(tb['slot_geom1'][sel[k]])
            g2 = int(tb['slot_geom2'][sel[k]])
            if g1 < 0:
                continue
            fam = _family(m, g1, g2)
            ent = ours.setdefault(fam, [0, 0.0])
            ent[0] += 1
            # One collapsed row carries nrep MuJoCo rows' total force.
            ent[1] += abs(float(fc[k, 0]))

        # qacc parity at the same state (the end-to-end consequence).
        scale = max(1.0, np.abs(d.qacc).max())
        qacc_errs.append(
            float(np.abs(np.asarray(qacc) - d.qacc).max() / scale))

        # Flat-optimum cross-evaluation (round 5): score each engine's
        # converged qacc under BOTH engines' primal cost models. If each
        # solution is near-optimal under the other's model, the per-state
        # force/qacc deviations are optimum non-uniqueness along
        # near-null directions, not a physics or solver error. Measured
        # (2026-08-20): rel gaps 5.6e-6 / 2.7e-5 / 1.3e-3 on the three
        # states while qacc rel err reads 0.10 / 0.31 / 3.81 and the
        # labrum-labrum ellipsoid contact force differs by up to 20%
        # with IDENTICAL geometry (same pos/dist, normals within 0.5
        # degrees) -- the deviation table's ellipsoid rows are flat-
        # optimum ambiguity, not manifold-structure error.
        def mv(x, _d=data):
            return solver._mv(_d.qM, x)
        c_ours = float(solver._primal_cost(efc, mv, a_free,
                                           jnp.asarray(qacc)))
        c_mj_under_ours = float(solver._primal_cost(efc, mv, a_free,
                                                    jnp.asarray(d.qacc)))
        c_mj = _mj_total_cost(m, d, d.qacc)
        c_ours_under_mj = _mj_total_cost(m, d, np.asarray(qacc))
        cscale = max(abs(c_mj), abs(c_ours), 1e-12)
        cost_gaps.append(((c_mj_under_ours - c_ours) / cscale,
                          (c_ours_under_mj - c_mj) / cscale))

        for fam in sorted(set(mj) | set(ours)):
            cm, fm = mj.get(fam, [0, 0.0])
            co, fo = ours.get(fam, [0, 0.0])
            row = report.setdefault(fam, [0, 0, 0.0, 0.0, 0.0])
            row[0] += cm
            row[1] += co
            row[2] += fm
            row[3] += fo
            row[4] = max(row[4], abs(fo - fm) / max(1e-3, abs(fm)))

    print('\nfamily                 mj_pts ours_pts  mj_|Fn|  ours_|Fn|'
          '  max_rel_dF')
    for fam, (cm, co, fm, fo, rel) in sorted(report.items()):
        print(f'{fam:<22} {cm:>6d} {co:>8d} {fm:>8.4f} {fo:>9.4f}'
              f' {rel:>10.3f}')
    print('qacc rel errs per state:',
          [f'{e:.4f}' for e in qacc_errs])
    print('flat-optimum rel cost gaps (mj-under-ours, ours-under-mj):',
          [(f'{a:+.2e}', f'{b:+.2e}') for a, b in cost_gaps])

    # Every family MuJoCo sees, we see (no silently missing pair type).
    mj_fams = {f for f, r in report.items() if r[0] > 0}
    our_fams = {f for f, r in report.items() if r[1] > 0}
    assert mj_fams <= our_fams, (mj_fams - our_fams)
    # Net per-family force totals bounded: tight where manifolds match
    # (plane/sphere/capsule analytic), loose for convex multi-point
    # families (documented deviation).
    for fam, (cm, co, fm, fo, rel) in report.items():
        if fm < 5e-3:
            continue  # grazing contacts: relative error meaningless
        tol = 0.35 if ('ellipsoid' in fam or 'cylinder' in fam
                       or 'mesh' in fam) else 0.12
        assert abs(fo - fm) / fm < tol, (fam, fm, fo)
    # End-to-end qacc is gated on the settled (well-conditioned) state
    # only: the random-actuation states drive deep multi-contact poses
    # where the optimum is flat and both engines' "converged" answers
    # differ along near-null directions (module docstring; the
    # per-family force totals above are the meaningful bound there).
    # The random-pose errors are still printed above for the record.
    assert qacc_errs[0] < 0.15, qacc_errs
    # Flat-optimum gate: our converged qacc must be within 0.5% of
    # MuJoCo's own optimum under MuJoCo's cost model on EVERY state
    # (including the flail poses where raw qacc/force deviations are
    # large), and MuJoCo's qacc must be no more than 0.5% better than
    # ours under our model. This pins the deviation table's convex-
    # family force gaps to optimum non-uniqueness.
    for a, b in cost_gaps:
        assert a > -5e-3, cost_gaps  # mj not meaningfully better under ours
        assert b < 5e-3, cost_gaps   # ours near-optimal under mj's model
