"""Isolate the policy-model cost of the headline bench.

Times (on the real chip):
  act_fwd_256   : policy forward at rollout batch (N=256, 1 step)
  mb_fwd        : policy forward at update minibatch (T=32, Nmb=128)
  mb_fwdbwd     : value_and_grad of a scalar loss at the same minibatch
  full-update equivalent = 4 x mb_fwdbwd (2 epochs x 2 minibatches)

Compares against the measured 405ms update to locate plumbing overhead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    policy = make_pointnav_resnet_policy(4, backbone="resnet18", hidden_size=512)
    net = policy.net

    N, T, Nmb = 256, 32, 128
    key = jax.random.PRNGKey(0)

    def obs_for(b, seq=None):
        shape = (seq, b) if seq else (b,)
        return {
            "depth": jnp.zeros(shape + (128, 128, 1), jnp.float32),
            "rgb": jnp.zeros(shape + (128, 128, 3), jnp.uint8),
            "pointgoal_with_gps_compass": jnp.zeros(shape + (2,), jnp.float32),
        }

    obs1 = obs_for(N)
    hid = initial_hidden_state(N, net.hidden_size, net.num_recurrent_layers, net.rnn_type)
    pa = jnp.zeros((N,), jnp.int32)
    nd = jnp.ones((N,), jnp.float32)
    params = policy.init(key, obs1, hid, pa, nd)

    res = {}
    f_act = jax.jit(lambda p, o: policy.apply(p, o, hid, pa, nd)[1])
    res["act_fwd_256_ms"] = round(timeit(f_act, params, obs1) * 1e3, 2)

    obs_mb = obs_for(Nmb, seq=T)
    hid_mb = initial_hidden_state(Nmb, net.hidden_size, net.num_recurrent_layers, net.rnn_type)
    pa_mb = jnp.zeros((T, Nmb), jnp.int32)
    nd_mb = jnp.ones((T, Nmb), jnp.float32)

    f_mb = jax.jit(
        lambda p, o: jnp.sum(policy.apply(p, o, hid_mb, pa_mb, nd_mb)[1])
    )
    res["mb_fwd_ms"] = round(timeit(f_mb, params, obs_mb) * 1e3, 2)

    def loss(p, o):
        dist, v, _ = policy.apply(p, o, hid_mb, pa_mb, nd_mb)
        return jnp.mean(v**2) + jnp.mean(dist**2)

    f_bwd = jax.jit(lambda p, o: jax.tree.map(jnp.sum, jax.grad(loss)(p, o)))
    res["mb_fwdbwd_ms"] = round(timeit(f_bwd, params, obs_mb, iters=5) * 1e3, 2)
    res["update_equiv_ms"] = round(res["mb_fwdbwd_ms"] * 4, 1)

    # visual encoder alone at minibatch scale
    from habitat_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(backbone="resnet18", base_planes=32, ngroups=16)
    vobs = {
        "depth": jnp.zeros((T * Nmb, 128, 128, 1), jnp.float32),
        "rgb": jnp.zeros((T * Nmb, 128, 128, 3), jnp.uint8),
    }
    ep = enc.init(key, vobs)
    f_enc = jax.jit(lambda p, o: jnp.sum(enc.apply(p, o)))
    res["enc_fwd_4096_ms"] = round(timeit(f_enc, ep, vobs) * 1e3, 2)

    def eloss(p, o):
        return jnp.sum(enc.apply(p, o) ** 2)

    f_ebwd = jax.jit(lambda p, o: jax.tree.map(jnp.sum, jax.grad(eloss)(p, o)))
    res["enc_fwdbwd_4096_ms"] = round(timeit(f_ebwd, ep, vobs, iters=5) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
