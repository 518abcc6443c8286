"""Projection obs transformers (reference common/obs_transformers.py:234-1244).

Strong tests: the engine renders equirect/pinhole natively, so the converters
are checked against ground-truth renders — CubeMap2Equirect vs the native
equirect sensor, Equirect2CubeMap vs the native pinhole FRONT face."""

import numpy as np
import jax
import jax.numpy as jnp
from gymnasium import spaces

from habitat_tpu.baselines.obs_transformers import (
    CUBE_FACES,
    _FACE_POSES,
    AddVirtualKeys,
    CubeMap2Equirect,
    CubeMap2Fisheye,
    Equirect2CubeMap,
)
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.ops.raycast import render_batch


def _scene_pack():
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=1, episodes_per_scene=2, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=1, precomputed_fields=fields,
        max_episode_steps=10,
    )
    return env.pack


def _render(pack, projection, yaw, pitch, h, w):
    sids = jnp.zeros((1,), jnp.int32)
    pos = jnp.array([[1.0, 1.2, 1.0]], jnp.float32)
    return render_batch(
        pack, sids, pos, jnp.array([yaw], jnp.float32),
        jnp.array([pitch], jnp.float32), height=h, width=w,
        projection=projection, backend="xla",
    )


def _cube_faces(pack, fhw):
    faces = {}
    for f in CUBE_FACES:
        yaw, pitch = _FACE_POSES[f]
        out = _render(pack, "pinhole", yaw, pitch, fhw, fhw)
        faces[f] = out
    return faces


def test_cubemap2equirect_matches_native_equirect():
    pack = _scene_pack()
    fhw = 64
    faces = _cube_faces(pack, fhw)
    native = _render(pack, "equirect", 0.0, 0.0, 64, 128)

    uuids = [f"rgb_{f.lower()}" for f in CUBE_FACES]
    tr = CubeMap2Equirect(uuids, (64, 128))
    obs = {f"rgb_{f.lower()}": faces[f]["rgb"] for f in CUBE_FACES}
    out = tr(obs)
    assert "rgb" in out and out["rgb"].shape == (1, 64, 128, 3)
    a = np.asarray(out["rgb"][0]).astype(np.float32)
    b = np.asarray(native["rgb"][0]).astype(np.float32)
    # compare away from poles (bilinear resample vs exact rays); RGB is
    # view-independent so the projections must agree (depth would not: cube
    # faces store planar z, the native equirect stores euclidean range)
    mid = np.abs(a[16:48] - b[16:48]).mean(axis=-1)
    assert np.median(mid) < 8.0, np.median(mid)
    assert (mid < 30.0).mean() > 0.9, (mid < 30.0).mean()


def test_cubemap2equirect_obs_space():
    uuids = [f"rgb_{f.lower()}" for f in CUBE_FACES]
    tr = CubeMap2Equirect(uuids, (32, 64))
    sp = spaces.Dict(
        {u: spaces.Box(0, 255, (16, 16, 3), np.uint8) for u in uuids}
    )
    out = tr.transform_observation_space(sp)
    assert set(out.spaces) == {"rgb"}
    assert out.spaces["rgb"].shape == (32, 64, 3)


def test_equirect2cubemap_matches_native_pinhole():
    pack = _scene_pack()
    native_eq = _render(pack, "equirect", 0.0, 0.0, 128, 256)
    native_front = _render(pack, "pinhole", 0.0, 0.0, 32, 32)

    tr = Equirect2CubeMap(["depth"], (32, 32))
    out = tr({"depth": native_eq["depth"]})
    assert "depth" not in out
    front = np.asarray(out["depth_front"][0, ..., 0])
    ref = np.asarray(native_front["depth"][0, ..., 0])
    err = np.abs(front[4:28, 4:28] - ref[4:28, 4:28])
    assert np.median(err) < 0.03, np.median(err)


def test_cubemap2fisheye_shapes_and_mask():
    pack = _scene_pack()
    faces = _cube_faces(pack, 32)
    uuids = [f"rgb_{f.lower()}" for f in CUBE_FACES]
    tr = CubeMap2Fisheye(uuids, (64, 64))
    obs = {f"rgb_{f.lower()}": faces[f]["rgb"] for f in CUBE_FACES}
    out = tr(obs)
    img = np.asarray(out["rgb"][0])
    assert img.shape == (64, 64, 3)
    assert img[31, 31].sum() > 0  # center is valid scene content


def test_add_virtual_keys():
    tr = AddVirtualKeys({"goal_to_agent_gps_compass": 2})
    obs = {"rgb": jnp.zeros((4, 8, 8, 3), jnp.uint8)}
    out = tr(obs)
    assert out["goal_to_agent_gps_compass"].shape == (4, 2)
    sp = tr.transform_observation_space(
        spaces.Dict({"rgb": spaces.Box(0, 255, (8, 8, 3), np.uint8)})
    )
    assert "goal_to_agent_gps_compass" in sp.spaces
