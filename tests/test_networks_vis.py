"""Vision networks and the two-level controller-reuse policy."""

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents import networks as nets_lib
from flybody_tpu.agents import networks_vis as vis_lib


class _Spec:
    def __init__(self, shape):
        self.shape = shape


def _ll_spec():
    return {
        'walker/gyro': _Spec((3,)),
        'walker/joints_pos': _Spec((25,)),
        'walker/ref_displacement': _Spec((6, 3)),
        'walker/ref_root_quat': _Spec((6, 4)),
        'walker/velocimeter': _Spec((3,)),
    }


def _vision_spec():
    return {
        'walker/gyro': _Spec((3,)),
        'walker/joints_pos': _Spec((25,)),
        'walker/left_eye': _Spec((32, 32)),
        'walker/right_eye': _Spec((32, 32)),
        'walker/task_input': _Spec((2,)),
        'walker/velocimeter': _Spec((3,)),
    }


def _flat_dim(spec):
    return int(sum(np.prod(v.shape) for v in spec.values()))


def test_vision_policy_and_critic_shapes():
    spec = _vision_spec()
    policy, critic = vis_lib.make_vision_networks(spec, action_size=12)
    d = _flat_dim(spec)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (4, d)) * 255.0
    act = jnp.zeros((4, 12))
    pp = policy.init(jax.random.PRNGKey(1), obs)
    dist = policy.apply(pp, obs)
    assert dist.mean.shape == (4, 12)
    cp = critic.init(jax.random.PRNGKey(2), obs, act)
    z = critic.apply(cp, obs, act)
    assert z.logits.shape == (4, 51)


def test_flat_obs_adapter_roundtrip():
    spec = _vision_spec()
    layout = vis_lib.obs_layout_from_spec(spec)
    # The eye blocks recovered by the adapter must equal the originals.
    rng = np.random.RandomState(0)
    obs = {k: rng.rand(*spec[k].shape).astype(np.float32) for k in spec}
    flat = nets_lib.batch_concat(
        {k: jnp.asarray(v) for k, v in obs.items()}, batched=False)
    for name, s, e, shape in layout:
        np.testing.assert_array_equal(
            np.asarray(flat[s:e]).reshape(shape), obs[name])


def test_two_level_policy_near_noop_at_init():
    ll_spec, v_spec = _ll_spec(), _vision_spec()
    act_dim = 12
    ll_policy = nets_lib.PolicyNetwork(action_size=act_dim)
    ll_dim = _flat_dim(ll_spec)
    ll_params = ll_policy.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, ll_dim), jnp.float32))
    policy = vis_lib.make_two_level_policy(v_spec, ll_spec, ll_policy,
                                           ll_params)
    assert policy.steering_command_dim == 6 * 3 + 6 * 4
    # steering sits after gyro (3) + joints_pos (25) + left/right eye +
    # task_input removed -> rest layout: gyro, joints_pos, velocimeter.
    assert policy.steering_idx == 3 + 25

    rng = np.random.RandomState(1)
    obs = {}
    for k in v_spec:
        scale = 255.0 if 'eye' in k else 1.0
        obs[k] = jnp.asarray(
            scale * rng.rand(*v_spec[k].shape).astype(np.float32))
    flat = nets_lib.batch_concat(obs, batched=False)[None]
    params = policy.init(jax.random.PRNGKey(2), flat)
    dist = policy.apply(params, flat)

    # Reference LL output with explicit no-op steering.
    ll_obs = {k: obs[k] for k in ('walker/gyro', 'walker/joints_pos',
                                  'walker/velocimeter')}
    ll_obs['walker/ref_displacement'] = jnp.zeros((6, 3))
    ll_obs['walker/ref_root_quat'] = jnp.tile(
        jnp.asarray([1.0, 0, 0, 0]), (6, 1))
    ll_flat = nets_lib.batch_concat(ll_obs, batched=False)[None]
    ref = ll_policy.apply(ll_params, ll_flat)
    assert float(jnp.abs(dist.mean - ref.mean).max()) < 0.05

    # LL params are frozen: the trainable variables contain only the
    # VisNet adapter and the HL controller, not the LL policy MLP.
    assert set(params['params'].keys()) == {
        'FlatObsAdapter_0', 'TwoLevelController_0'}
