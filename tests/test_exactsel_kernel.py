"""v11/v12 exactsel packed-stream kernel: interpret-mode correctness on CPU
(VERDICT r3 weak #7 — the stream-path kernel previously had no CPU-runnable
correctness test; the TPU agreement floor in test_render.py was the only
guard). Runs select_chunklets_exact + raycast_pallas_exactsel_t under
pltpu.force_tpu_interpret_mode against the brute-force oracle, at both
groups=1 (v11 tile-level ET) and groups=4/8 (v12 sub-tile ET)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from habitat_tpu.sims.procedural import generate_scan_apartment
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import (
    chunklet_aabbs,
    raycast_rays,
    ray_feature_matrix,
    select_chunks,
    select_chunklets_exact,
    tile_plane_normals_cam,
)
from habitat_tpu.ops.raycast_pallas import (
    group_tri_mat_pad16,
    raycast_pallas_exactsel_t,
)
from habitat_tpu.utils.geometry import camera_rays



@pytest.fixture(scope="module")
def setup():
    scene = generate_scan_apartment(
        seed=3, extent=6.0, n_rooms_per_axis=2, n_clutter=6, tess=0.35
    )
    pack = pack_scenes([scene])
    T = pack.tri_v0.shape[1]
    assert T % 32 == 0 and T // 32 > 8
    parent_c = T // pack.chunk_bounds.shape[1]

    N, H, W = 2, 32, 32
    R = H * W
    nt = 1
    rng = np.random.RandomState(7)
    pos = jnp.asarray(
        np.array([[4.0, 1.25, 4.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.zeros((N,), jnp.int32)
    d_all = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yaw).reshape(N, R, 3)
    o_all = jnp.broadcast_to(pos[:, None, :], d_all.shape)

    planes = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))
    ids0, cnt0 = select_chunks(
        pack.chunk_bounds[sids], o_all, d_all, 1024, 64, with_cnt=True
    )
    ab = chunklet_aabbs(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, c=32
    )
    # uncapped L1-only select (the deployed config; caps measured to DROP
    # true survivors — an L1 set of 138 was clipped by k_aabb=128 here)
    ids, cnt = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab,
        sids, pos, yaw, pitch, planes, ids0, cnt0,
        parent_c=parent_c, c=32, skip_exact=True,
    )

    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(R, 3)
    d_aug = jnp.concatenate([d_cam, jnp.ones((R, 1), jnp.float32)], -1)
    d_t = jnp.pad(
        d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0))
    )
    Bt = jnp.pad(
        ray_feature_matrix(pos, yaw, pitch).transpose(0, 2, 1),
        ((0, 0), (0, 6), (0, 0)),
    )
    gm32 = group_tri_mat_pad16(pack.tri_mat, 32)

    # brute-force oracle
    oracle = []
    for n in range(N):
        t_o, i_o = raycast_rays(
            pack.tri_v0[0], pack.tri_e1[0], pack.tri_e2[0],
            pack.tri_valid[0], o_all[n], d_all[n],
        )
        oracle.append((np.asarray(t_o), np.asarray(i_o)))
    return pack, gm32, sids, ids, cnt, d_t, Bt, oracle, o_all, d_all


@pytest.mark.parametrize("groups", [1, 4, 8])
def test_exactsel_kernel_matches_oracle(setup, groups):
    pack, gm32, sids, ids, cnt, d_t, Bt, oracle, o_all, d_all = setup
    with pltpu.force_tpu_interpret_mode():
        t, idx = raycast_pallas_exactsel_t(
            gm32, sids, ids, cnt, d_t, Bt,
            ray_tile=1024, tri_chunk=32, groups=groups,
        )
    t = np.asarray(t)
    idx = np.asarray(idx)
    for n in range(len(oracle)):
        t_o, i_o = oracle[n]
        hit_o = i_o >= 0
        hit_k = idx[n] >= 0
        assert (hit_o == hit_k).mean() > 0.999, (n, (hit_o != hit_k).sum())
        both = hit_o & hit_k
        # winner indices agree except possible shared-edge ties
        assert (idx[n][both] == i_o[both]).mean() > 0.995
        # interpret mode runs the G matmul in f32: t matches the oracle
        # tightly where the same winner was picked
        same = both & (idx[n] == i_o)
        assert np.abs(t[n][same] - t_o[same]).max() < 5e-2


def test_packed_exact_select_overflow_passthrough():
    """Round-5 packed-exact L2 (verts16): the k_exact cap only bypasses the
    exact test for overflow survivors — never drops them. With a tiny cap
    the survivor set must still contain every uncapped-exact survivor and
    stay within the L1 set."""
    scene = generate_scan_apartment(
        seed=3, extent=6.0, n_rooms_per_axis=2, n_clutter=6, tess=0.35
    )
    pack = pack_scenes([scene])
    T = pack.tri_v0.shape[1]
    parent_c = T // pack.chunk_bounds.shape[1]
    N, H, W = 2, 32, 32
    rng = np.random.RandomState(7)
    pos = jnp.asarray(
        np.array([[4.0, 1.25, 4.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.zeros((N,), jnp.int32)
    d_all = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yaw).reshape(N, H * W, 3)
    o_all = jnp.broadcast_to(pos[:, None, :], d_all.shape)
    planes = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))
    ids0, cnt0 = select_chunks(
        pack.chunk_bounds[sids], o_all, d_all, 1024, 64, with_cnt=True
    )
    ab = chunklet_aabbs(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, c=32
    )
    # layout contract: [v0|e1|e2|pad6|valid] (raycast.VERTS16_VALID)
    verts16 = jnp.concatenate(
        [
            pack.tri_v0,
            pack.tri_e1,
            pack.tri_e2,
            jnp.zeros(pack.tri_v0.shape[:-1] + (6,), jnp.float32),
            pack.tri_valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    common = dict(parent_c=parent_c, c=32)
    ids_l1, cnt_l1 = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
        pos, yaw, pitch, planes, ids0, cnt0, skip_exact=True, **common
    )
    ids_full, cnt_full = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
        pos, yaw, pitch, planes, ids0, cnt0, verts16=verts16,
        k_exact=4096, **common
    )
    ids_cap, cnt_cap = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
        pos, yaw, pitch, planes, ids0, cnt0, verts16=verts16,
        k_exact=8, **common
    )
    MASK = (1 << 18) - 1
    for n in range(ids_l1.shape[0]):
        for t in range(ids_l1.shape[1]):
            s_l1 = set((np.asarray(ids_l1[n, t, : cnt_l1[n, t]]) & MASK).tolist())
            s_full = set((np.asarray(ids_full[n, t, : cnt_full[n, t]]) & MASK).tolist())
            s_cap = set((np.asarray(ids_cap[n, t, : cnt_cap[n, t]]) & MASK).tolist())
            assert s_full <= s_cap <= s_l1, (n, t)
    # the exact pass must actually cull something somewhere
    assert int(jnp.sum(cnt_full)) < int(jnp.sum(cnt_l1))


def test_onehot_attrs_kernel_matches_xla():
    """Round-5 in-VMEM one-hot attr kernel == the XLA transposed one-hot
    dot, bit-exactly (both are f32 selection), including miss rows."""
    import os, sys
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from exp_onehot_attr_kernel import onehot_attrs_t

    rng = np.random.RandomState(0)
    S, A, T = 3, 11, 128
    N, R = 4, 4096
    table = jnp.asarray(rng.randn(S, A, T).astype(np.float32))
    sids = jnp.asarray(rng.randint(0, S, N).astype(np.int32))
    idx = jnp.asarray(
        rng.randint(-1, T, (N, R)).astype(np.int32)
    )  # -1 = miss
    with pltpu.force_tpu_interpret_mode():
        out = onehot_attrs_t(table, sids, idx, ray_tile=2048)
    safe = jnp.maximum(idx, 0)
    ref = jnp.swapaxes(
        jnp.asarray(np.asarray(table)[np.asarray(sids)])[
            jnp.arange(N)[:, None], :, safe
        ],
        1,
        2,
    ) * (idx >= 0)[:, None, :]
    assert out.shape == (N, A, R)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_cullmask_kernel_matches_xla_select():
    """Round-5 v16: the in-kernel exact cull must produce the SAME survivor
    sets and counts as the XLA L2 formulation (same head, same eps)."""
    scene = generate_scan_apartment(
        seed=3, extent=6.0, n_rooms_per_axis=2, n_clutter=6, tess=0.35
    )
    pack = pack_scenes([scene])
    T = pack.tri_v0.shape[1]
    parent_c = T // pack.chunk_bounds.shape[1]
    N, H, W = 2, 32, 32
    rng = np.random.RandomState(7)
    pos = jnp.asarray(
        np.array([[4.0, 1.25, 4.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.zeros((N,), jnp.int32)
    d_all = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yaw).reshape(N, H * W, 3)
    o_all = jnp.broadcast_to(pos[:, None, :], d_all.shape)
    planes = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))
    ids0, cnt0 = select_chunks(
        pack.chunk_bounds[sids], o_all, d_all, 1024, 64, with_cnt=True
    )
    ab = chunklet_aabbs(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, c=32
    )
    verts16 = jnp.concatenate(
        [
            pack.tri_v0,
            pack.tri_e1,
            pack.tri_e2,
            jnp.zeros(pack.tri_v0.shape[:-1] + (6,), jnp.float32),
            pack.tri_valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    common = dict(
        parent_c=parent_c, c=32, verts16=verts16, k_exact=128
    )
    ids_x, cnt_x = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
        pos, yaw, pitch, planes, ids0, cnt0, cull_backend="xla", **common
    )
    with pltpu.force_tpu_interpret_mode():
        ids_p, cnt_p = select_chunklets_exact(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
            pos, yaw, pitch, planes, ids0, cnt0, cull_backend="pallas",
            **common
        )
    assert np.array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    MASK = (1 << 18) - 1
    for n in range(N):
        for t in range(ids_x.shape[1]):
            sx = (np.asarray(ids_x[n, t, : cnt_x[n, t]]) & MASK).tolist()
            sp = (np.asarray(ids_p[n, t, : cnt_p[n, t]]) & MASK).tolist()
            assert sx == sp, (n, t)
    # the exact pass must actually have culled something
    ids_l1, cnt_l1 = select_chunklets_exact(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, sids,
        pos, yaw, pitch, planes, ids0, cnt0, skip_exact=True,
        parent_c=parent_c, c=32,
    )
    assert int(jnp.sum(cnt_p)) < int(jnp.sum(cnt_l1))
