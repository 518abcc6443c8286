"""TPU run: VLN seq2seq IL — instruction LSTM + depth vision + GPS/compass,
no goal sensor, behavior-cloned from the geodesic follower (the batched
stand-in for the reference R2R seq2seq baseline)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

import numpy as np
import jax.numpy as jnp

from habitat_tpu.baselines.il.bc_trainer import BCConfig, BCLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.tasks.vln import make_vln_env

env = make_vln_env(
    num_envs=128, num_scenes=8, episodes_per_scene=16, seed=0,
    with_pointgoal=False, max_episode_steps=200,
    visual_specs=(("HabitatSimDepthSensor", {"height": 64, "width": 64}),),
)
policy = make_pointnav_resnet_policy(
    len(env.actions), backbone="resnet9", hidden_size=192, goal_keys=()
)
learner = BCLearner(env, policy, BCConfig(num_steps=32, lr=1.5e-3))
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
m = {}
for u in range(4001):
    ts, m = step(ts)
    if u % 100 == 0:
        jax.block_until_ready(m["losses/bc_loss"])
        print(
            f"upd {u} ({time.time()-t0:.0f}s): ce {float(m['losses/bc_loss']):.3f} "
            f"match {float(m['teacher_match']):.3f} "
            f"teacher_sr {float(m['teacher_success_rate']):.3f}",
            flush=True,
        )
    if time.time() - t0 > 1100:
        break
jax.block_until_ready(m["losses/bc_loss"])

# greedy student eval on held-out seeds: instruction + depth + odometry only
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

es, obs = env.reset(seed=123)
net = policy.net
hidden = initial_hidden_state(
    env.num_envs, net.hidden_size, net.num_recurrent_layers, net.rnn_type
)
prev = jnp.zeros((env.num_envs,), jnp.int32)
nd = jnp.zeros((env.num_envs,), jnp.float32)


@jax.jit
def act(params, obs, hidden, prev, nd):
    logits, _, h = policy.apply(params, obs, hidden, prev, nd)
    return jnp.argmax(logits, -1), h


succ = 0.0
eps = 0.0
for t in range(400):
    a, hidden = act(ts.params, obs, hidden, prev, nd)
    es, obs, r, done, info = env.step_fn(es, a)
    prev, nd = a, 1.0 - done.astype(jnp.float32)
    succ += float(jnp.sum(info["success"]))
    eps += float(jnp.sum(done))
print(f"STUDENT eval: {eps:.0f} episodes, SR {succ/max(eps,1):.3f}", flush=True)
