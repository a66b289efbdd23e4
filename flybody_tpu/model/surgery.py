"""Build-time model surgery: walker configs and task variants as XML -> XML
transformations, compiled once into static FlyModel specs.

The reference edits the MJCF tree at runtime through dm_control
(flybody/fruitfly/fruitfly.py:123-386, flybody/tasks/base.py:271-429); here
every task configuration is a pure build-time transformation of the XML
text (lxml), so the TPU engine only ever sees precompiled static specs.

All functions are host-side and require mujoco only to compile the result.
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np
from lxml import etree

from flybody_tpu.model import compile as mc

# Action/body-part classes, identified by name substrings
# (reference fruitfly.py:193-202).
NAME_SUBSTR = {
    'adhesion': [],
    'head': ['head'],
    'mouth': ['rostrum', 'haustellum', 'labrum'],
    'antennae': ['antenna'],
    'wings': ['wing'],
    'abdomen': ['abdomen'],
    'legs': ['T1', 'T2', 'T3'],
    'user': [],
}

# Default flight wing params (reference tasks/constants.py:23-31).
WING_PARAMS = {
    'base_freq': 218.0,
    'gainprm': (18.0, 18.0, 18.0),
    'damping': 0.007769230,
    'stiffness': 0.01,
    'fluidcoef': (1.0, 0.5, 1.5, 1.7, 1.0),
    'rel_freq_range': 0.05,
    'num_freqs': 201,
}

SPAWN_POS = (0.0, 0.0, 0.1278)  # reference fruitfly.py:23
BODY_PITCH_ANGLE = 47.5  # deg, reference tasks/constants.py:18


def _any_substr(substrings, name):
    return any(s in name for s in substrings)


@dataclasses.dataclass(frozen=True)
class WalkerConfig:
    """Fly walker configuration (mirrors reference FruitFly._build args)."""

    use_legs: bool = True
    use_wings: bool = False
    use_mouth: bool = False
    use_antennae: bool = False
    force_actuators: bool = False
    joint_filter: float = 0.01
    adhesion_filter: float = 0.007
    dyntype_filterexact: bool = False
    body_pitch_angle: float = BODY_PITCH_ANGLE
    stroke_plane_angle: float = 0.0
    physics_timestep: float = 1e-4
    control_timestep: float = 2e-3
    num_user_actions: int = 0
    eye_camera_fovy: float = 150.0
    eye_camera_size: int = 32


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _quat_neg(q):
    return np.array([-q[0], q[1], q[2], q[3]])


def _rot_vec(v, q):
    w, x, y, z = q / np.linalg.norm(q)
    u = np.array([x, y, z])
    return (v * (w * w - u @ u) + 2 * u * (u @ v)
            + 2 * w * np.cross(u, v))


def _parse_vec(text, default):
    if text is None:
        return np.array(default, dtype=float)
    return np.array([float(x) for x in text.split()])


def _fmt(vec):
    return ' '.join(f'{float(x):.10g}' for x in np.atleast_1d(vec))


class FlyXml:
    """Editable fly model XML with compiled-base-model lookups."""

    def __init__(self, xml: str | None = None,
                 assets: dict[str, bytes] | None = None):
        if xml is None:
            xml, assets = mc.fly_xml_and_assets()
        self.assets = assets or {}
        self.root = etree.fromstring(xml.encode())
        # Compiled base model for springrefs/axes lookups.
        self._base = mc.compile_mj_model(xml, self.assets)

    # -- lookup helpers -----------------------------------------------------

    def find_all(self, tag):
        return self.root.iter(tag)

    def named(self, tag, name):
        for e in self.root.iter(tag):
            if e.get('name') == name:
                return e
        return None

    def actuator_elems(self):
        act_root = self.root.find('actuator')
        return [] if act_root is None else list(act_root)

    def remove_actuator(self, name):
        for e in self.actuator_elems():
            if e.get('name') == name:
                e.getparent().remove(e)
                return True
        return False

    def _joint_spring_axis(self, jname):
        import mujoco
        m = self._base
        j = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, jname)
        springref = float(m.qpos_spring[m.jnt_qposadr[j]])
        axis = np.array(m.jnt_axis[j])
        return springref, axis

    # -- surgery steps ------------------------------------------------------

    def set_option(self, **attrs):
        opt = self.root.find('option')
        for k, v in attrs.items():
            opt.set(k, str(v))

    def set_eye_fovy(self, fovy):
        for cam in ['eye_right', 'eye_left']:
            self.named('camera', cam).set('fovy', str(fovy))

    def retract_body_quats(self, substrings):
        """Set body quats to the springref-retracted pose
        (reference fruitfly.py:68-87, 207-214)."""
        for body in self.root.iter('body'):
            name = body.get('name', '')
            if not _any_substr(substrings, name):
                continue
            joints = body.findall('joint')
            if not joints:
                continue
            quat = np.array([1.0, 0, 0, 0])
            quats = []
            for joint in joints:
                springref, axis = self._joint_spring_axis(joint.get('name'))
                half = springref / 2
                quats.append(np.hstack([np.cos(half), np.sin(half) * axis]))
            for q in reversed(quats):
                quat = _quat_mul(q, quat)
            body_quat = _parse_vec(body.get('quat'), (1, 0, 0, 0))
            quat = _quat_mul(body_quat, quat)
            body.set('quat', _fmt(quat))

    def remove_joints_and_actuators(self, substrings, remove_joints=True):
        """Remove joints matching substrings plus same-named actuators."""
        names = []
        for joint in list(self.root.iter('joint')):
            name = joint.get('name', '')
            if _any_substr(substrings, name):
                names.append(name)
                if remove_joints:
                    joint.getparent().remove(joint)
        for name in names:
            self.remove_actuator(name)

    def remove_tendons(self, substrings):
        tendon_root = self.root.find('tendon')
        if tendon_root is None:
            return
        for t in list(tendon_root):
            name = t.get('name', '')
            if _any_substr(substrings, name):
                self.remove_actuator(name)
                tendon_root.remove(t)

    def remove_adhesion(self, substrings):
        for e in list(self.actuator_elems()):
            name = e.get('name', '')
            if 'adhere' in name and _any_substr(substrings, name):
                e.getparent().remove(e)

    def remove_sensors(self, substrings):
        sensor_root = self.root.find('sensor')
        if sensor_root is None:
            return
        for s in list(sensor_root):
            attrs = (s.get('name', ''), s.get('site', ''))
            if any(_any_substr(substrings, a) for a in attrs):
                sensor_root.remove(s)

    def set_flight_pose(self, body_pitch_angle, stroke_plane_angle):
        """Body pitch + stroke-plane re-framing (reference
        fruitfly.py:285-306)."""
        up_dir = self.named('site', 'hover_up_dir')
        q = _parse_vec(up_dir.get('quat'), (1, 0, 0, 0))
        up_angle = 2 * np.arccos(np.clip(q[0], -1, 1))
        delta = np.deg2rad(body_pitch_angle) - up_angle
        dq = np.array([np.cos(delta / 2), 0, np.sin(delta / 2), 0])
        q = _quat_mul(dq, q)
        up_dir.set('quat', _fmt(q))

        sp = np.deg2rad(stroke_plane_angle)
        sp_quat = np.array([np.cos(sp / 2), 0, np.sin(sp / 2), 0])
        for wquat, wing in [(np.array([0.0, 0, 0, 1]), 'wing_left'),
                            (np.array([0.0, -1, 0, 0]), 'wing_right')]:
            dquat = _quat_mul(_quat_neg(sp_quat), wquat)
            new_quat = _quat_mul(dquat, _quat_neg(q))
            body = self.named('body', wing)
            self._change_body_frame(body, new_quat)

    def _change_body_frame(self, body, frame_quat):
        """Re-orient a body frame while keeping children fixed in space
        (reference fruitfly.py:90-114; frame position unchanged)."""
        body_quat = _parse_vec(body.get('quat'), (1, 0, 0, 0))
        dquat = _quat_mul(_quat_neg(frame_quat), body_quat)
        body.set('quat', _fmt(frame_quat))
        for child in body:
            if child.tag in ('body', 'geom', 'site', 'camera', 'light',
                            'inertial'):
                cq = _parse_vec(child.get('quat'), (1, 0, 0, 0))
                child.set('quat', _fmt(_quat_mul(dquat, cq)))
                cp = _parse_vec(child.get('pos'), (0, 0, 0))
                pos_in_parent = _rot_vec(cp, body_quat)
                child.set('pos', _fmt(_rot_vec(pos_in_parent,
                                               _quat_neg(frame_quat))))
            elif child.tag == 'joint':
                # Joints specify pos/axis in the body frame.
                cp = _parse_vec(child.get('pos'), (0, 0, 0))
                pos_in_parent = _rot_vec(cp, body_quat)
                child.set('pos', _fmt(_rot_vec(pos_in_parent,
                                               _quat_neg(frame_quat))))
                ax = child.get('axis')
                if ax is not None:
                    axis_in_parent = _rot_vec(_parse_vec(ax, (0, 0, 1)),
                                              body_quat)
                    child.set('axis', _fmt(_rot_vec(axis_in_parent,
                                                    _quat_neg(frame_quat))))

    def to_force_actuators(self):
        """Convert position actuators to force actuators
        (reference fruitfly.py:308-327)."""
        default_root = self.root.find('default')
        for general in default_root.iter('general'):
            for attr in ('biastype', 'biasprm', 'ctrlrange'):
                if attr in general.attrib:
                    del general.attrib[attr]
        # Top-level general default ctrlrange.
        top_general = None
        for child in default_root:
            if child.tag == 'general':
                top_general = child
        if top_general is None:
            top_general = etree.SubElement(default_root, 'general')
        top_general.set('ctrlrange', '-1 1')
        for e in self.actuator_elems():
            if e.tag == 'adhesion':
                continue
            for attr in ('ctrlrange', 'biastype', 'biasprm'):
                if attr in e.attrib:
                    del e.attrib[attr]

    def set_filters(self, joint_filter, adhesion_filter, exact):
        dyntype = 'filterexact' if exact else 'filter'
        if joint_filter > 0:
            for e in self.actuator_elems():
                if e.tag != 'adhesion':
                    e.set('dyntype', dyntype)
                    e.set('dynprm', str(joint_filter))
        if adhesion_filter > 0:
            # The adhesion element does not accept dyntype; set it on the
            # parent default class (reference fruitfly.py:336-340).
            for default in self.root.iter('default'):
                if default.get('class') == 'adhesion':
                    general = default.find('general')
                    general.set('dyntype', dyntype)
                    general.set('dynprm', str(adhesion_filter))

    def set_wing_params(self, gainprm, stiffness, damping, fluidcoef):
        """Flying-task wing setup (reference tasks/base.py:313-336)."""
        for i, dclass in enumerate(['yaw', 'roll', 'pitch']):
            for default in self.root.iter('default'):
                if default.get('class') == dclass:
                    general = default.find('general')
                    prm = _parse_vec(general.get('gainprm'), (1,))
                    prm[0] = gainprm[i]
                    general.set('gainprm', _fmt(prm))
        for geom in self.root.iter('geom'):
            if 'fluid' in geom.get('name', ''):
                geom.set('fluidshape', 'ellipsoid')
                geom.set('fluidcoef', _fmt(np.array(fluidcoef)))
        for default in self.root.iter('default'):
            if default.get('class') == 'wing':
                joint = default.find('joint')
                joint.set('stiffness', str(stiffness))
                joint.set('damping', str(damping))

    def exclude_wing_leg_contacts(self):
        """(reference tasks/base.py:338-346, 403-411)."""
        contact = self.root.find('contact')
        if contact is None:
            contact = etree.SubElement(self.root, 'contact')
        for body in self.root.iter('body'):
            name = body.get('name', '')
            if _any_substr(['coxa', 'femur', 'tibia', 'tarsus', 'claw'],
                           name):
                for wing in ['wing_left', 'wing_right']:
                    etree.SubElement(contact, 'exclude', {
                        'name': f'{name}_{wing}',
                        'body1': name, 'body2': wing})

    def exclude_thorax_children(self):
        """walk_on_ball tether excludes (reference walk_on_ball.py:32-40)."""
        contact = self.root.find('contact')
        thorax = self.named('body', 'thorax')
        for child in thorax:
            if child.tag == 'body':
                etree.SubElement(contact, 'exclude', {
                    'name': f"thorax_{child.get('name')}",
                    'body1': 'thorax', 'body2': child.get('name')})

    def set_adhesion_gain(self, gain):
        for default in self.root.iter('default'):
            if default.get('class') == 'adhesion_claw':
                default.find('adhesion').set('gain', str(gain))

    def set_claw_friction(self, friction):
        for default in self.root.iter('default'):
            if default.get('class') == 'adhesion-collision':
                default.find('geom').set('friction', str(friction))

    def remove_freejoint(self):
        for tag in ('freejoint', 'joint'):
            j = self.named(tag, 'free')
            if j is not None:
                j.getparent().remove(j)
                return
        raise ValueError('no freejoint found to remove')

    def set_spawn_pos(self, pos):
        self.named('body', 'thorax').set('pos', _fmt(np.array(pos)))

    # -- arenas -------------------------------------------------------------

    def add_floor(self, friction=(0.5,), solref=(0.001, 1),
                  solimp=(0.95, 0.99, 0.01)):
        wb = self.root.find('worldbody')
        floor = etree.Element('geom', {
            'name': 'floor', 'type': 'plane', 'size': '50 50 0.1',
            'friction': _fmt(np.array(friction)),
            'solref': _fmt(np.array(solref)),
            'solimp': _fmt(np.array(solimp)),
        })
        wb.insert(0, floor)

    def add_ball(self, pos=(-0.05, 0, -0.419), radius=0.454, density=0.0025):
        """BallFloor arena (reference tasks/arenas/ball.py:14-76)."""
        wb = self.root.find('worldbody')
        ball = etree.SubElement(wb, 'body', {
            'name': 'ball', 'pos': _fmt(np.array(pos))})
        etree.SubElement(ball, 'geom', {
            'name': 'ball', 'type': 'sphere',
            'size': f'{radius} 0 0', 'density': str(density)})
        etree.SubElement(ball, 'joint', {'name': 'ball', 'type': 'ball'})

    def disable_floor_contacts(self):
        for geom in self.root.iter('geom'):
            if geom.get('name') in ('floor',):
                geom.set('contype', '0')
                geom.set('conaffinity', '0')

    # -- output -------------------------------------------------------------

    def xml(self) -> str:
        return etree.tostring(self.root, pretty_print=True).decode()

    def compile(self):
        return mc.build_fly_model(self.xml(), self.assets)


def build_walker(config: WalkerConfig, fly: FlyXml | None = None) -> FlyXml:
    """Apply the walker surgery for `config` (reference fruitfly.py:123-386,
    minus the freejoint removal: tasks re-add a root freejoint anyway, so we
    keep the original one; walk_on_ball removes it explicitly)."""
    fly = fly or FlyXml()
    fly.set_option(timestep=config.physics_timestep)
    fly.set_eye_fovy(config.eye_camera_fovy)
    fly.set_spawn_pos(SPAWN_POS)

    if not config.use_legs:
        fly.retract_body_quats(NAME_SUBSTR['legs'])
        fly.remove_tendons(NAME_SUBSTR['legs'])
        fly.remove_joints_and_actuators(NAME_SUBSTR['legs'])
        fly.remove_adhesion(NAME_SUBSTR['legs'])
        fly.remove_sensors(NAME_SUBSTR['legs'])
    if not config.use_wings:
        fly.remove_joints_and_actuators(NAME_SUBSTR['wings'],
                                        remove_joints=False)
        fly.remove_sensors(NAME_SUBSTR['wings'])
    if not config.use_mouth:
        fly.remove_joints_and_actuators(NAME_SUBSTR['mouth'],
                                        remove_joints=False)
        fly.remove_adhesion(NAME_SUBSTR['mouth'])
    if not config.use_antennae:
        fly.remove_joints_and_actuators(NAME_SUBSTR['antennae'],
                                        remove_joints=False)
    if config.use_wings:
        fly.set_flight_pose(config.body_pitch_angle,
                            config.stroke_plane_angle)
    if config.force_actuators:
        fly.to_force_actuators()
    fly.set_filters(config.joint_filter, config.adhesion_filter,
                    config.dyntype_filterexact)
    return fly


# ---------------------------------------------------------------------------
# Multi-fly scenes (counterpart of the reference's add_flyid_labels.py
# __flyid__ templating, reference build_fruitfly/add_flyid_labels.py).

# Attributes that carry cross-references to named elements, per tag.
_NAME_REF_ATTRS = ('joint', 'tendon', 'site', 'body', 'objname', 'target',
                   'body1', 'body2', 'geom1', 'geom2', 'prefix')


def _prefix_names(elem, prefix: str, skip_attrs=('class', 'childclass',
                                                 'mesh', 'material',
                                                 'hfield')):
    """Prefix every name + name-reference in `elem`'s subtree. Shared
    assets (meshes/materials) and defaults classes stay unprefixed."""
    for e in elem.iter():
        n = e.get('name')
        if n is not None:
            e.set('name', prefix + n)
        for attr in _NAME_REF_ATTRS:
            v = e.get(attr)
            if v is not None and attr not in skip_attrs:
                e.set(attr, prefix + v)


def flyid_template_xml(flyid: str = '__flyid__'):
    """Single-fly XML with every name prefixed '<flyid>/' — string-replace
    the id to stamp out per-fly copies (reference add_flyid_labels.py
    semantics). Returns (xml, assets)."""
    fly = FlyXml()
    prefix = flyid + '/'
    wb = fly.root.find('worldbody')
    _prefix_names(wb, prefix)
    for section in ('tendon', 'actuator', 'sensor', 'contact'):
        sec = fly.root.find(section)
        if sec is not None:
            _prefix_names(sec, prefix)
    return etree.tostring(fly.root, pretty_print=True).decode(), fly.assets


def multi_fly_xml(n_flies: int, spacing: float = 1.0):
    """A combined scene with `n_flies` complete flies, each with all
    elements name-prefixed 'fly<i>/' and spawned in a row along y.

    Goes beyond the reference's labeling script: the result compiles
    directly (mc.build_fly_model) into one FlyModel whose engine step
    simulates all flies, including inter-fly collision pairs. Returns
    (xml, assets)."""
    import copy

    base = FlyXml()
    wb = base.root.find('worldbody')
    # The fly subtree = the (single) top-level body under worldbody.
    fly_bodies = [e for e in wb if e.tag == 'body']
    assert len(fly_bodies) == 1, [e.get('name') for e in fly_bodies]
    proto_body = fly_bodies[0]
    proto_sections = {}
    for section in ('tendon', 'actuator', 'sensor', 'contact'):
        sec = base.root.find(section)
        if sec is not None:
            proto_sections[section] = copy.deepcopy(sec)

    # Reset the template: drop the original fly + per-fly sections.
    wb.remove(proto_body)
    for section in proto_sections:
        sec = base.root.find(section)
        if sec is not None:
            base.root.remove(sec)

    for i in range(n_flies):
        prefix = f'fly{i}/'
        body = copy.deepcopy(proto_body)
        _prefix_names(body, prefix)
        pos = _parse_vec(body.get('pos'), (0.0, 0.0, 0.0))
        body.set('pos', _fmt([pos[0], pos[1] + i * spacing, pos[2]]))
        wb.append(body)
        for section, proto in proto_sections.items():
            sec = base.root.find(section)
            if sec is None:
                sec = etree.SubElement(base.root, section)
            for child in proto:
                c = copy.deepcopy(child)
                _prefix_names(c, prefix)
                # _prefix_names prefixes only subtree element names; the
                # copied child's own refs are handled there too since
                # iter() includes the element itself.
                sec.append(c)

    return etree.tostring(base.root, pretty_print=True).decode(), base.assets
