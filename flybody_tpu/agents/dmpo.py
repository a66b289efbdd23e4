"""DMPO learner: distributional critic + MPO policy update (JAX/optax).

Port of the reference learner semantics
(flybody/agents/learning_dmpo.py:20-359):
  * periodic target-network copies (policy/critic periods configurable),
  * N=20 action samples from the target policy at o_t,
  * categorical (51-atom) critic loss against the logsumexp-averaged target
    mixture distribution, projected onto the fixed support,
  * MPO policy loss with decoupled KL constraints and MO-MPO action
    penalization,
  * three Adam optimizers (policy/critic 1e-4, dual 1e-2) with global-norm
    clipping at 40.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from flybody_tpu.agents import mpo as mpo_lib
from flybody_tpu.agents import networks as nets_lib
from flybody_tpu.agents.distributions import (DiscreteValuedDistribution,
                                              categorical_l2_project)
from flybody_tpu.agents.replay import Transition


@dataclasses.dataclass(frozen=True)
class DMPOConfig:
    """Learner configuration (reference agent_dmpo.py:28-46,
    ray_distributed_dmpo.py:33-64)."""

    discount: float = 0.99
    batch_size: int = 256
    n_step: int = 5
    num_samples: int = 20  # MPO action samples
    policy_lr: float = 1e-4
    critic_lr: float = 1e-4
    dual_lr: float = 1e-2
    clip_grad_norm: float = 40.0
    target_policy_update_period: int = 101
    target_critic_update_period: int = 107
    epsilon: float = 0.1
    epsilon_mean: float = 0.0025
    epsilon_stddev: float = 1e-7
    epsilon_penalty: float = 0.1
    min_replay_size: int = 10_000
    max_replay_size: int = 4_000_000
    samples_per_insert: float = 15.0
    # Controller reuse: the policy's stddev comes from a frozen LL head,
    # making the stddev-KL constraint unsatisfiable (see mpo.mpo_loss
    # train_stddev docstring). run.py sets this False for two-level runs.
    train_stddev: bool = True


class DMPOState(NamedTuple):
    policy_params: Any
    critic_params: Any
    target_policy_params: Any
    target_critic_params: Any
    dual_params: mpo_lib.MPOParams
    policy_opt: Any
    critic_opt: Any
    dual_opt: Any
    steps: jax.Array


class DMPOLearner:
    """Functional DMPO learner. All methods are pure and jittable."""

    def __init__(self, obs_dim: int, action_dim: int,
                 config: DMPOConfig = DMPOConfig(),
                 action_min=None, action_max=None,
                 dtype=jnp.float32,
                 policy=None, critic=None):
        """policy/critic: optional custom flax modules with the
        PolicyNetwork/CriticNetwork call signatures (e.g. the vision
        networks from networks_vis.make_vision_networks)."""
        self.config = config
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.dtype = dtype
        self.policy = policy or nets_lib.PolicyNetwork(
            action_size=action_dim)
        self.critic = critic or nets_lib.CriticNetwork()
        self.policy_optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.policy_lr))
        self.critic_optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.critic_lr))
        self.dual_optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.dual_lr))
        if action_min is not None:
            amin = jnp.asarray(action_min, dtype)
            amax = jnp.asarray(action_max, dtype)
            self.penalization_cost = (
                lambda a: mpo_lib.penalization_cost_real_actions(
                    a, amin, amax))
        else:
            self.penalization_cost = None

    def init(self, rng) -> DMPOState:
        r1, r2 = jax.random.split(rng)
        dummy_obs = jnp.zeros((1, self.obs_dim), self.dtype)
        dummy_act = jnp.zeros((1, self.action_dim), self.dtype)
        policy_params = self.policy.init(r1, dummy_obs)
        critic_params = self.critic.init(r2, dummy_obs, dummy_act)
        dual_params = mpo_lib.init_params(self.action_dim, dtype=self.dtype)
        return DMPOState(
            policy_params=policy_params,
            critic_params=critic_params,
            target_policy_params=policy_params,
            target_critic_params=critic_params,
            dual_params=dual_params,
            policy_opt=self.policy_optimizer.init(policy_params),
            critic_opt=self.critic_optimizer.init(critic_params),
            dual_opt=self.dual_optimizer.init(dual_params),
            steps=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------ step

    def sgd_step(self, state: DMPOState, batch: Transition, rng,
                 axis_name: str | None = None):
        """One learner step (reference learning_dmpo.py:169-317).

        If `axis_name` is given, gradients are pmean'd over that mesh axis
        (data-parallel learner; replaces the reference's single-GPU learner
        + Ray variable distribution, train_dmpo_ray.py:188-194)."""
        cfg = self.config
        dtype = self.dtype

        def loss_fn(policy_params, critic_params, dual_params):
            # Target policy at o_t and sampled actions.
            target_dist = self.policy.apply(state.target_policy_params,
                                            batch.next_obs)
            actions = target_dist.sample(rng,
                                         (cfg.num_samples,))  # (N, B, D)

            # --- Distributional critic target.
            NB = cfg.num_samples * batch.next_obs.shape[0]
            flat_actions = actions.reshape(NB, -1)
            tiled_obs = jnp.tile(batch.next_obs, (cfg.num_samples, 1))
            zt = self.critic.apply(state.target_critic_params, tiled_obs,
                                   flat_actions)
            logits_t = zt.logits.reshape(cfg.num_samples, -1,
                                         zt.logits.shape[-1])
            # Uniform mixture of the N sampled critic distributions: each
            # sample must be normalized (log_softmax) BEFORE the logsumexp
            # average, as in reference learning_dmpo.py:246-247 — raw-logit
            # logsumexp would weight samples by their softmax normalizers.
            mix_logits = jax.nn.logsumexp(
                jax.nn.log_softmax(logits_t, axis=-1), axis=0) - jnp.log(
                jnp.asarray(cfg.num_samples, dtype))
            values = zt.values
            z_p = batch.reward[:, None] + batch.discount[:, None] * values
            probs_t = jax.nn.softmax(mix_logits, axis=-1)
            proj = categorical_l2_project(z_p, probs_t, values)
            proj = jax.lax.stop_gradient(proj)

            online_z = self.critic.apply(critic_params, batch.obs,
                                         batch.action)
            critic_loss = -jnp.mean(
                jnp.sum(proj * jax.nn.log_softmax(online_z.logits, -1),
                        axis=-1))

            # --- MPO policy loss at o_t.
            q_values = zt.mean().reshape(cfg.num_samples, -1)  # (N, B)
            online_dist = self.policy.apply(policy_params, batch.next_obs)
            policy_loss, stats = mpo_lib.mpo_loss(
                dual_params, online_dist, target_dist, actions, q_values,
                epsilon=cfg.epsilon, epsilon_mean=cfg.epsilon_mean,
                epsilon_stddev=cfg.epsilon_stddev,
                epsilon_penalty=cfg.epsilon_penalty,
                penalization_cost=self.penalization_cost,
                train_stddev=cfg.train_stddev)
            stats['critic_loss'] = critic_loss
            stats['policy_loss'] = policy_loss
            return critic_loss + policy_loss, stats

        grads, stats = jax.grad(
            lambda p, c, d: loss_fn(p, c, d), argnums=(0, 1, 2),
            has_aux=True)(state.policy_params, state.critic_params,
                          state.dual_params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        # Non-finite-gradient guard: one poisoned batch (inf/NaN reaching
        # the loss) must not NaN the parameters permanently — zero the
        # whole update instead and surface it as a stat. (Observed: walk
        # bench-solver runs 2026-08-19, learner stats all-nan from one
        # iteration on.)
        finite = jnp.asarray(True)
        for leaf in jax.tree.leaves(grads):
            finite = finite & jnp.isfinite(leaf).all()
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        gp, gc, gd = grads

        pu, new_popt = self.policy_optimizer.update(gp, state.policy_opt)
        cu, new_copt = self.critic_optimizer.update(gc, state.critic_opt)
        du, new_dopt = self.dual_optimizer.update(gd, state.dual_opt)
        policy_params = optax.apply_updates(state.policy_params, pu)
        critic_params = optax.apply_updates(state.critic_params, cu)
        dual_params = mpo_lib.clip_params(
            optax.apply_updates(state.dual_params, du))

        steps = state.steps + 1
        # Periodic target updates (reference learning_dmpo.py:172-181).
        tp = jax.tree.map(
            lambda new, old: jnp.where(
                steps % self.config.target_policy_update_period == 0, new,
                old), policy_params, state.target_policy_params)
        tc = jax.tree.map(
            lambda new, old: jnp.where(
                steps % self.config.target_critic_update_period == 0, new,
                old), critic_params, state.target_critic_params)

        stats['nonfinite_grad'] = 1.0 - finite.astype(dtype)
        return DMPOState(
            policy_params=policy_params, critic_params=critic_params,
            target_policy_params=tp, target_critic_params=tc,
            dual_params=dual_params, policy_opt=new_popt,
            critic_opt=new_copt, dual_opt=new_dopt, steps=steps), stats

    # ----------------------------------------------------------------- actor

    def policy_dist(self, state: DMPOState, obs_flat, target: bool = False):
        params = (state.target_policy_params if target
                  else state.policy_params)
        return self.policy.apply(params, obs_flat)

    def select_action(self, state: DMPOState, obs_flat, rng,
                      stochastic: bool = True, target: bool = True):
        """Actor action selection (behavior policy = target network, as in
        the reference actors, reference agent_dmpo.py:190-200)."""
        dist = self.policy_dist(state, obs_flat, target=target)
        if stochastic:
            return dist.sample(rng)
        return dist.mode()
