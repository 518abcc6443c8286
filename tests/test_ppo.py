"""PPO math + learning regression.

Mirrors the reference's strategy: GAE/update math unit checks
(rl/ppo/ppo.py:139,165) and the train-to-reward-threshold floor
(test/test_baseline_training.py:420-503 — reward must improve over updates)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner, compute_gae
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def test_gae_matches_reference_recursion():
    T, N = 5, 3
    rng = np.random.default_rng(0)
    r = rng.normal(size=(T, N)).astype(np.float32)
    v = rng.normal(size=(T, N)).astype(np.float32)
    d = (rng.random((T, N)) > 0.7).astype(np.float32)
    last_v = rng.normal(size=(N,)).astype(np.float32)
    gamma, tau = 0.99, 0.95

    adv, ret = compute_gae(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(d), jnp.asarray(last_v), gamma, tau
    )

    # naive reference recursion (rollout_storage.py:174-205)
    adv_ref = np.zeros((T, N), np.float32)
    gae = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        v_next = last_v if t == T - 1 else v[t + 1]
        nd = 1.0 - d[t]
        delta = r[t] + gamma * v_next * nd - v[t]
        gae = delta + gamma * tau * nd * gae
        adv_ref[t] = gae
    np.testing.assert_allclose(np.asarray(adv), adv_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), adv_ref + v, atol=1e-5)


@pytest.fixture(scope="module")
def small_learner():
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=8, seed=3, extent=8.0
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=8,
        precomputed_fields=fields,
        max_episode_steps=64,
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), has_visual=False, hidden_size=64
    )
    cfg = PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2, lr=1e-3)
    return PPOLearner(env, policy, cfg)


def test_train_step_runs_and_shapes(small_learner):
    learner = small_learner
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    ts, metrics = step(ts)
    assert float(metrics["losses/value_loss"]) >= 0
    assert np.isfinite(float(metrics["losses/learner_loss"]))
    assert int(ts.update_idx) == 1
    # params actually changed
    ts2, m2 = step(ts)
    assert int(ts2.update_idx) == 2


@pytest.mark.slow
def test_blind_pointnav_learns(small_learner):
    """Reward must improve substantially within 40 updates (reference
    learning floor: reward >= threshold @ 40 updates, test_baseline_training)."""
    learner = small_learner
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    first_rewards, last_rewards = [], []
    n_updates = 120
    for i in range(n_updates):
        ts, metrics = step(ts)
        dc = float(metrics["done_count"])
        if dc > 0:
            ep_rew = float(metrics["reward_sum"]) / dc
            if i < 15:
                first_rewards.append(ep_rew)
            if i >= n_updates - 15:
                last_rewards.append(ep_rew)
    assert last_rewards, "no episodes finished late in training"
    improvement = np.mean(last_rewards) - np.mean(first_rewards)
    assert improvement > 0.3, (np.mean(first_rewards), np.mean(last_rewards))


def test_train_step_multi_device_sharded(small_learner):
    """The SAME train step over an 8-device CPU mesh (DD-PPO path)."""
    from habitat_tpu.parallel import mesh as meshlib

    learner = small_learner
    mesh = meshlib.make_mesh(jax.devices("cpu"))
    assert mesh.shape["data"] == 8
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    n = learner.env.num_envs
    ts = ts._replace(
        params=meshlib.replicate_pytree(ts.params, mesh),
        opt_state=meshlib.replicate_pytree(ts.opt_state, mesh),
        env_state=meshlib.shard_env_pytree(ts.env_state, mesh, n),
        obs=meshlib.shard_env_pytree(ts.obs, mesh, n),
        hidden=meshlib.shard_env_pytree(ts.hidden, mesh, n),
        prev_action=meshlib.shard_env_pytree(ts.prev_action, mesh, n),
        not_done=meshlib.shard_env_pytree(ts.not_done, mesh, n),
        key=meshlib.replicate_pytree(ts.key, mesh),
        update_idx=meshlib.replicate_pytree(ts.update_idx, mesh),
        ep_return_acc=meshlib.shard_env_pytree(ts.ep_return_acc, mesh, n),
        ep_len_acc=meshlib.shard_env_pytree(ts.ep_len_acc, mesh, n),
    )
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    ts, metrics = step(ts)
    assert np.isfinite(float(metrics["losses/learner_loss"]))
    # params remain replicated and identical across devices
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_ddppo_sharded_matches_single_device(small_learner):
    """Numerical equivalence: the 8-device sharded train step produces the
    SAME parameters as the single-device step (counterpart of the reference's
    exact DDP gradient-reduction test, test/test_ddppo_reduce.py:28-100).
    Exactly testable here because the minibatch permutation derives from the
    train-state key, identically on both programs."""
    from habitat_tpu.parallel import mesh as meshlib

    learner = small_learner
    step = jax.jit(learner.train_step)

    # single-device run, 2 updates
    ts1 = jax.jit(learner.init_fn)(jax.random.PRNGKey(7))
    for _ in range(2):
        ts1, m1 = step(ts1)

    # sharded run, same seed
    mesh = meshlib.make_mesh(jax.devices("cpu"))
    ts2 = jax.jit(learner.init_fn)(jax.random.PRNGKey(7))
    n = learner.env.num_envs
    ts2 = ts2._replace(
        params=meshlib.replicate_pytree(ts2.params, mesh),
        opt_state=meshlib.replicate_pytree(ts2.opt_state, mesh),
        env_state=meshlib.shard_env_pytree(ts2.env_state, mesh, n),
        obs=meshlib.shard_env_pytree(ts2.obs, mesh, n),
        hidden=meshlib.shard_env_pytree(ts2.hidden, mesh, n),
        prev_action=meshlib.shard_env_pytree(ts2.prev_action, mesh, n),
        not_done=meshlib.shard_env_pytree(ts2.not_done, mesh, n),
        key=meshlib.replicate_pytree(ts2.key, mesh),
        update_idx=meshlib.replicate_pytree(ts2.update_idx, mesh),
        ep_return_acc=meshlib.shard_env_pytree(ts2.ep_return_acc, mesh, n),
        ep_len_acc=meshlib.shard_env_pytree(ts2.ep_len_acc, mesh, n),
    )
    for _ in range(2):
        ts2, m2 = step(ts2)

    np.testing.assert_allclose(
        float(m1["losses/learner_loss"]), float(m2["losses/learner_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    p1 = jax.tree.leaves(ts1.params)
    p2 = jax.tree.leaves(ts2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_gaussian_ppo_on_continuous_rearrange():
    """PPO with the Gaussian head on the continuous rearrange env (reference
    action_distribution_type='gaussian' for arm/base control)."""
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env
    from habitat_tpu.models.policy import make_gaussian_resnet_policy

    env = make_rearrange_env(
        num_envs=4,
        task="pick",
        with_visual=False,
        n_rooms_per_axis=1,
        n_clutter=0,
        max_episode_steps=32,
        continuous=True,
    )
    assert env.action_space.shape == (3,)
    policy = make_gaussian_resnet_policy(3, has_visual=False, hidden_size=32)
    learner = PPOLearner(
        env,
        policy,
        PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1),
        measure_keys=("success",),
        action_type="gaussian",
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    ts, m = step(ts)
    assert np.isfinite(float(m["losses/learner_loss"]))
    ts, m = step(ts)
    assert np.isfinite(float(m["losses/entropy"]))


def test_adaptive_entropy_coefficient():
    """Lagrangian-adaptive entropy (reference rl/ppo/ppo.py:87-101 +
    LagrangeInequalityCoefficient): gaussian-only gate, alpha rises via dual
    ascent when entropy is below the threshold, stays within [1e-4, 1.0]."""
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env
    from habitat_tpu.models.policy import make_gaussian_resnet_policy

    env = make_rearrange_env(
        num_envs=4, task="pick", with_visual=False, n_rooms_per_axis=1,
        n_clutter=0, max_episode_steps=32, continuous=True,
    )
    policy = make_gaussian_resnet_policy(3, has_visual=False, hidden_size=32)
    # threshold far above any achievable entropy -> alpha must rise
    learner = PPOLearner(
        env, policy,
        PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1,
                  use_adaptive_entropy_pen=True, entropy_target_factor=-100.0),
        measure_keys=("success",), action_type="gaussian",
    )
    assert learner.adaptive_ent and learner.ent_threshold == 300.0
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    a0 = float(ts.log_alpha)
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    for _ in range(3):
        ts, m = step(ts)
    assert float(ts.log_alpha) > a0
    assert float(ts.log_alpha) <= 0.0  # alpha <= 1.0 bound
    assert np.isfinite(float(m["losses/entropy_coef"]))
