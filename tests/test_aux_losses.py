"""CPC|A aux loss (reference rl/ppo/cpc_aux_loss.py coverage)."""

import numpy as np
import jax
import jax.numpy as jnp

from habitat_tpu.baselines.aux_losses import CPCA


def test_cpca_loss_finite_and_differentiable():
    T, N, H, F = 8, 4, 16, 12
    rng = jax.random.PRNGKey(0)
    mod = CPCA(num_steps=3, hidden=16, num_actions=4)
    beliefs = jax.random.normal(rng, (T, N, H))
    vis = jax.random.normal(jax.random.PRNGKey(1), (T, N, F))
    actions = jax.random.randint(jax.random.PRNGKey(2), (T, N), 0, 4)
    masks = jnp.asarray(np.random.default_rng(0).random((T, N)) > 0.2, jnp.float32)
    params = mod.init(jax.random.PRNGKey(3), beliefs, vis, actions, masks, rng)
    loss = mod.apply(params, beliefs, vis, actions, masks, rng)
    assert np.isfinite(float(loss))

    def f(p):
        return mod.apply(p, beliefs, vis, actions, masks, rng)

    g = jax.grad(f)(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert gn > 0


def test_cpca_discriminates_after_training():
    """A few SGD steps must reduce the contrastive loss on fixed data."""
    import optax

    T, N, H, F = 10, 8, 16, 16
    key = jax.random.PRNGKey(0)
    mod = CPCA(num_steps=2, hidden=16, num_actions=4, loss_scale=1.0)
    # structured data: future visual features depend on actions
    actions = jax.random.randint(key, (T, N), 0, 4)
    base = jax.random.normal(jax.random.PRNGKey(1), (N, F))
    vis = jnp.cumsum(jax.nn.one_hot(actions, F % 16 + 4, dtype=jnp.float32), axis=0)
    vis = jnp.pad(vis, ((0, 0), (0, 0), (0, F - vis.shape[-1])))
    beliefs = jnp.pad(vis, ((0, 0), (0, 0), (0, H - F)))[:, :, :H]
    masks = jnp.ones((T, N))
    params = mod.init(jax.random.PRNGKey(2), beliefs, vis, actions, masks, key)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, k):
        l, g = jax.value_and_grad(lambda pp: mod.apply(pp, beliefs, vis, actions, masks, k))(p)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    first = None
    for i in range(60):
        params, ost, l = step(params, ost, jax.random.fold_in(key, i % 4))
        if first is None:
            first = float(l)
    assert float(l) < first - 0.05, (first, float(l))


def test_cpca_wired_into_ppo():
    """PPOLearner with the CPC|A aux loss enabled (reference wires aux losses
    into the PPO update, rl/ppo/ppo.py aux loss hooks)."""
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=1, episodes_per_scene=4, seed=7
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=4,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
        precomputed_fields=fields,
        max_episode_steps=16,
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=32
    )
    learner = PPOLearner(
        env,
        policy,
        PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1),
        aux_loss=CPCA(num_steps=2, hidden=16, num_actions=len(env.actions)),
        aux_loss_coef=0.5,
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    ts, m = step(ts)
    assert "losses/cpca" in m
    assert np.isfinite(float(m["losses/cpca"]))
    ts, m2 = step(ts)
    assert np.isfinite(float(m2["losses/learner_loss"]))
