"""Model tests: RNN scan+mask equivalence vs naive loop (the reference proves
packed-seq == naive loop, test/test_rnn_state_encoder.py:94), resnet shapes,
policy act/evaluate consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.models.rnn_state_encoder import RNNStateEncoder
from habitat_tpu.models.resnet import ResNetEncoder
from habitat_tpu.models.policy import (
    ActorCritic,
    PointNavResNetNet,
    evaluate_actions_stats,
    make_pointnav_resnet_policy,
    sample_action,
)


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_rnn_seq_equals_stepwise(rnn_type):
    """seq_forward(T,N) must equal T successive single_forward calls with the
    same mid-sequence done masking (reference rnn packed-seq equivalence)."""
    T, N, D, H = 6, 3, 8, 16
    enc = RNNStateEncoder(hidden_size=H, num_layers=2, rnn_type=rnn_type)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, N, D))
    # masks: 0 where previous step was done
    masks = jnp.asarray(
        np.random.default_rng(0).random((T, N)) > 0.3, jnp.float32
    )
    h0 = enc.initial_state(N)
    params = enc.init(jax.random.PRNGKey(1), x[0], h0, masks[0])

    # stepwise
    h = h0
    outs = []
    for t in range(T):
        o, h = enc.apply(params, x[t], h, masks[t])
        outs.append(o)
    stepwise = jnp.stack(outs)

    seq_out, seq_h = enc.apply(params, x, h0, masks)
    np.testing.assert_allclose(np.asarray(seq_out), np.asarray(stepwise), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_h), np.asarray(h), atol=1e-5)


def test_rnn_mask_resets_hidden():
    N, D, H = 2, 4, 8
    enc = RNNStateEncoder(hidden_size=H, rnn_type="GRU")
    x = jnp.ones((N, D))
    h0 = enc.initial_state(N)
    params = enc.init(jax.random.PRNGKey(0), x, h0, jnp.ones((N,)))
    # step once to get nonzero hidden
    _, h1 = enc.apply(params, x, h0, jnp.ones((N,)))
    # env 0 done (mask 0) -> same output as from zero hidden
    o_masked, _ = enc.apply(params, x, h1, jnp.asarray([0.0, 1.0]))
    o_fresh, _ = enc.apply(params, x, h0, jnp.ones((N,)))
    np.testing.assert_allclose(
        np.asarray(o_masked[0]), np.asarray(o_fresh[0]), atol=1e-6
    )
    assert not np.allclose(np.asarray(o_masked[1]), np.asarray(o_fresh[1]))


@pytest.mark.parametrize("backbone", ["resnet9", "resnet18"])
def test_resnet_encoder_shapes(backbone):
    enc = ResNetEncoder(backbone=backbone, output_size=2048)
    obs = {
        "depth": jnp.zeros((2, 64, 64, 1)),
        "rgb": jnp.zeros((2, 64, 64, 3), jnp.uint8),
    }
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.ndim == 2 and out.shape[0] == 2
    assert out.shape[1] >= 1024  # ~2048 flat


def test_policy_act_and_evaluate():
    num_actions = 4
    policy = make_pointnav_resnet_policy(num_actions, backbone="resnet9")
    N = 3
    obs = {
        "depth": jnp.zeros((N, 64, 64, 1)),
        "pointgoal_with_gps_compass": jnp.ones((N, 2)),
    }
    hidden = jnp.zeros((N, 1, 2, 512))
    prev_a = jnp.zeros((N,), jnp.int32)
    masks = jnp.ones((N,))
    params = policy.init(jax.random.PRNGKey(0), obs, hidden, prev_a, masks)
    logits, values, h2 = policy.apply(params, obs, hidden, prev_a, masks)
    assert logits.shape == (N, num_actions)
    assert values.shape == (N,)
    act, logp = sample_action(logits, jax.random.PRNGKey(1))
    assert act.shape == (N,)
    # evaluate matches sampled logprob
    lp2, ent = evaluate_actions_stats(logits, act)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(logp), atol=1e-6)
    assert np.all(np.asarray(ent) > 0)


def test_policy_seq_forward_matches_act_path():
    """T×N seq forward must equal the stepwise act path (the PPO update
    recomputes logits over stored rollouts; reference seq/single equivalence)."""
    num_actions = 4
    policy = make_pointnav_resnet_policy(
        num_actions, backbone="resnet9", hidden_size=64
    )
    T, N = 5, 2
    rng = np.random.default_rng(0)
    obs_seq = {
        "depth": jnp.asarray(rng.random((T, N, 64, 64, 1)), jnp.float32),
        "pointgoal_with_gps_compass": jnp.asarray(
            rng.random((T, N, 2)), jnp.float32
        ),
    }
    masks_seq = jnp.asarray(rng.random((T, N)) > 0.25, jnp.float32)
    prev_a_seq = jnp.asarray(rng.integers(0, num_actions, (T, N)), jnp.int32)
    hidden0 = jnp.zeros((N, 1, 2, 64))
    params = policy.init(
        jax.random.PRNGKey(0),
        {k: v[0] for k, v in obs_seq.items()},
        hidden0,
        prev_a_seq[0],
        masks_seq[0],
    )
    # stepwise
    h = hidden0
    logits_steps = []
    for t in range(T):
        lg, vv, h = policy.apply(
            params, {k: v[t] for k, v in obs_seq.items()}, h, prev_a_seq[t], masks_seq[t]
        )
        logits_steps.append(lg)
    stepwise = jnp.stack(logits_steps)
    # sequence
    seq_logits, seq_values, h_seq = policy.apply(
        params, obs_seq, hidden0, prev_a_seq, masks_seq
    )
    assert seq_logits.shape == (T, N, num_actions)
    np.testing.assert_allclose(
        np.asarray(seq_logits), np.asarray(stepwise), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h), atol=2e-4, rtol=2e-3)


def test_running_mean_and_var():
    """reference running_mean_and_var.py behavior: converges to batch stats."""
    from habitat_tpu.models.running_mean_and_var import (
        init_running_stats,
        normalize,
        update_running_stats,
    )

    rng = np.random.default_rng(0)
    stats = init_running_stats(3)
    data = rng.normal(loc=[1.0, -2.0, 5.0], scale=[0.5, 2.0, 1.0], size=(50, 16, 3))
    for batch in data:
        stats = update_running_stats(stats, jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(stats.mean), [1.0, -2.0, 5.0], atol=0.2)
    np.testing.assert_allclose(
        np.asarray(jnp.sqrt(stats.var)), [0.5, 2.0, 1.0], atol=0.2
    )
    z = normalize(stats, jnp.asarray(data.reshape(-1, 3)))
    assert abs(float(jnp.mean(z))) < 0.1
    assert abs(float(jnp.std(z)) - 1.0) < 0.1


def test_imagegoal_second_encoder():
    """Image goals go through a second visual encoder (reference
    resnet_policy.py:523-539)."""
    import jax
    import jax.numpy as jnp
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    policy = make_pointnav_resnet_policy(
        4, backbone="resnet9", hidden_size=64, goal_keys=()
    )
    n = 2
    obs = {
        "rgb": jnp.zeros((n, 32, 32, 3), jnp.uint8),
        "imagegoal": jnp.zeros((n, 32, 32, 3), jnp.uint8),
    }
    hidden = initial_hidden_state(n, 64, 1, "LSTM")
    params = policy.init(
        jax.random.PRNGKey(0), obs, hidden, jnp.zeros((n,), jnp.int32), jnp.ones((n,))
    )
    assert "goal_encoder_imagegoal" in params["params"]["net"]
    logits, values, _ = policy.apply(
        params, obs, hidden, jnp.zeros((n,), jnp.int32), jnp.ones((n,))
    )
    assert logits.shape == (n, 4)
