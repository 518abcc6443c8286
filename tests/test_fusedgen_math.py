"""Fused-raygen feature-matrix identity: F = [d_cam, 1] @ B must equal
ray_features(o, rotate_dirs(d_cam, yaw, pitch)) for all yaw/pitch/o.
(The TPU kernel consumes B; this validates the math on CPU.)"""

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.ops.raycast import ray_features
from habitat_tpu.utils.geometry import camera_rays, rotate_dirs, view_rotation_matrix


from habitat_tpu.ops.raycast import ray_feature_matrix as _build_B


def test_view_rotation_matrix_matches_rotate_dirs():
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (50, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    yaw, pitch = 0.7, -0.3
    R = view_rotation_matrix(jnp.float32(yaw), jnp.float32(pitch))
    np.testing.assert_allclose(
        np.asarray(d @ R.T),
        np.asarray(rotate_dirs(d, yaw, pitch)),
        atol=1e-5,
    )


def test_feature_matrix_identity():
    H = W = 8
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    N = 5
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (N, 3), minval=-3, maxval=3)
    yaw = jax.random.uniform(jax.random.PRNGKey(2), (N,), minval=-3.1, maxval=3.1)
    pitch = jax.random.uniform(jax.random.PRNGKey(3), (N,), minval=-1.0, maxval=1.0)

    B = _build_B(pos, yaw, pitch)
    d_aug = jnp.concatenate([d_cam, jnp.ones((d_cam.shape[0], 1))], axis=-1)
    F_fast = jnp.einsum("rk,nkf->nrf", d_aug, B)

    dirs = jax.vmap(lambda y, p: rotate_dirs(d_cam, y, p))(yaw, pitch)
    origins = jnp.broadcast_to(pos[:, None, :], dirs.shape)
    F_ref = ray_features(origins, dirs)
    np.testing.assert_allclose(np.asarray(F_fast), np.asarray(F_ref), atol=1e-5)

    # rotated camera_rays equals base grid times R (fast-path assumption)
    full = jax.vmap(
        lambda y, p: camera_rays(y, p, jnp.deg2rad(90.0), H, W)
    )(yaw, pitch).reshape(N, -1, 3)
    np.testing.assert_allclose(np.asarray(dirs), np.asarray(full), atol=1e-5)
