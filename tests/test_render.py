"""Renderer correctness: analytic depth in a known room (SURVEY §4 strategy —
dataless kernels unit-tested against known geometry)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.sims.procedural import generate_empty_room, generate_apartment
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import render_env, render_batch


@pytest.fixture(scope="module")
def room_pack():
    return pack_scenes([generate_empty_room(extent=6.0)])


def test_depth_facing_wall(room_pack):
    # agent at (3, 0, 3) facing -z (yaw=0): wall at z=0, planar distance 3.0
    out = render_env(
        room_pack,
        jnp.int32(0),
        jnp.array([3.0, 1.25, 3.0]),
        jnp.float32(0.0),
        jnp.float32(0.0),
        height=64,
        width=64,
        hfov_deg=90.0,
        max_depth=10.0,
        normalize_depth=False,
    )
    depth = np.asarray(out["depth"])[:, :, 0]
    # center pixel: straight ahead -> 3m planar depth
    c = depth[32, 32]
    assert abs(c - 3.0) < 0.05, c
    # planar depth is constant along rows for a fronto-parallel wall
    row = depth[32, 8:-8]
    assert np.all(np.abs(row - 3.0) < 0.1), row.min()


def test_depth_yaw_quarter_turn(room_pack):
    # yaw=pi/2 faces -x: wall at x=0 is 3m away; yaw=-pi/2 faces +x -> x=6 wall 3m
    for yaw in (np.pi / 2, -np.pi / 2):
        out = render_env(
            room_pack,
            jnp.int32(0),
            jnp.array([3.0, 1.25, 3.0]),
            jnp.float32(yaw),
            jnp.float32(0.0),
            height=32,
            width=32,
            normalize_depth=False,
        )
        d = float(np.asarray(out["depth"])[16, 16, 0])
        assert abs(d - 3.0) < 0.1, (yaw, d)


def test_semantic_and_rgb(room_pack):
    out = render_env(
        room_pack,
        jnp.int32(0),
        jnp.array([3.0, 1.25, 3.0]),
        jnp.float32(0.0),
        jnp.float32(0.0),
        height=32,
        width=32,
    )
    sem = np.asarray(out["semantic"])[:, :, 0]
    # looking at a wall: center is wall (2); bottom rows hit floor (1)
    assert sem[16, 16] == 2
    assert sem[31, 16] == 1
    rgb = np.asarray(out["rgb"])
    assert rgb.dtype == np.uint8
    assert rgb.shape == (32, 32, 3)
    assert rgb.std() > 1.0  # not a constant image


def test_look_down_sees_floor(room_pack):
    out = render_env(
        room_pack,
        jnp.int32(0),
        jnp.array([3.0, 1.25, 3.0]),
        jnp.float32(0.0),
        jnp.float32(-1.2),  # look down
        height=32,
        width=32,
        normalize_depth=False,
    )
    sem = np.asarray(out["semantic"])[:, :, 0]
    assert (sem == 1).mean() > 0.8  # mostly floor


def test_normalized_depth_range(room_pack):
    out = render_env(
        room_pack,
        jnp.int32(0),
        jnp.array([3.0, 1.25, 3.0]),
        jnp.float32(0.3),
        jnp.float32(0.0),
        height=32,
        width=32,
        max_depth=10.0,
        normalize_depth=True,
    )
    d = np.asarray(out["depth"])
    assert d.min() >= 0.0 and d.max() <= 1.0


def test_render_batch_multi_scene():
    scenes = [generate_apartment(seed=s, extent=8.0) for s in range(2)]
    pack = pack_scenes(scenes)
    n = 4
    sids = jnp.array([0, 1, 0, 1], jnp.int32)
    pos = jnp.tile(jnp.array([[4.0, 1.25, 4.0]]), (n, 1))
    yaw = jnp.linspace(0, 2 * np.pi, n)
    pitch = jnp.zeros((n,))
    out = jax.jit(
        lambda s, p, y, pi: render_batch(
            pack, s, p, y, pi, height=32, width=32
        )
    )(sids, pos, yaw, pitch)
    assert out["rgb"].shape == (n, 32, 32, 3)
    assert out["depth"].shape == (n, 32, 32, 1)
    assert out["semantic"].shape == (n, 32, 32, 1)
    # envs in different scenes produce different images
    img0 = np.asarray(out["rgb"][0])
    img1 = np.asarray(out["rgb"][1])
    assert not np.array_equal(img0, img1)


def test_chunk_selection_shapes_and_coverage():
    """Culling prepass (ops/raycast.select_chunks*) — CPU-checkable parts."""
    from habitat_tpu.ops.raycast import select_chunks, select_chunks_occluded
    from habitat_tpu.utils.geometry import camera_rays

    scenes = [generate_apartment(seed=9, extent=16.0, n_rooms_per_axis=3, n_clutter=120)]
    pack = pack_scenes(scenes)
    n_chunks = pack.tri_mat.shape[3] // 128
    assert n_chunks >= 4
    N, H, W = 2, 32, 32
    yaw = jnp.asarray([0.0, 2.0])
    dirs = jax.vmap(lambda y: camera_rays(y, jnp.float32(0), jnp.deg2rad(90.0), H, W))(
        yaw
    ).reshape(N, -1, 3)
    orig = jnp.broadcast_to(jnp.array([8.0, 1.25, 8.0]), (N, H * W, 3))
    ids = select_chunks(pack.chunk_bounds[jnp.zeros(N, jnp.int32)], orig, dirs, 256, 4)
    assert ids.shape == (N, 4, 4)
    assert int(ids.max()) < n_chunks
    ids2 = select_chunks_occluded(
        pack.tri_mat,
        pack.chunk_bounds[jnp.zeros(N, jnp.int32)],
        jnp.zeros(N, jnp.int32),
        orig,
        dirs,
        256,
        4,
        lowres_stride=16,
    )
    assert ids2.shape == (N, 4, 4)
    # bounding spheres cover their triangles
    cb = np.asarray(pack.chunk_bounds[0])
    v0 = np.asarray(pack.tri_v0[0]).reshape(n_chunks, 128, 3)
    valid = np.asarray(pack.tri_valid[0]).reshape(n_chunks, 128)
    for c in range(n_chunks):
        if not valid[c].any():
            continue
        d = np.linalg.norm(v0[c][valid[c]] - cb[c, :3], axis=-1)
        assert d.max() <= cb[c, 3] + 1e-3


def test_equirect_and_fisheye_projections(room_pack):
    """Panoramic projections (reference equirect/fisheye sensors)."""
    for proj in ("equirect", "fisheye"):
        out = render_env(
            room_pack,
            jnp.int32(0),
            jnp.array([3.0, 1.25, 3.0]),
            jnp.float32(0.0),
            jnp.float32(0.0),
            height=32,
            width=64,
            normalize_depth=False,
            projection=proj,
        )
        d = np.asarray(out["depth"])[..., 0]
        assert d.shape == (32, 64)
        assert np.all(np.isfinite(d))
        if proj == "equirect":
            # in a 6m room from center: every horizontal direction hits a wall
            mid = d[16]
            assert mid.max() < 6.0 and mid.min() > 1.0
            # left/right edges both look backward (+z): equal depth (wrap)
            assert abs(mid[0] - mid[-1]) < 0.3


# -- round 2: decimation + discrete LOD bands ---------------------------------


def test_decimate_reduces_and_preserves_surface():
    import numpy as np
    from habitat_tpu.sims.procedural import decimate, generate_apartment, scanify

    base = generate_apartment(3, n_clutter=2)
    scan = scanify(base, tess=0.08, max_tris=100_000)
    lod = decimate(scan, 0.3)
    assert 0 < lod.num_triangles < scan.num_triangles / 4
    # surface stays within cell/2 in y for floor tris
    floor_full = scan.vertices[scan.semantic_ids == 1]
    floor_lod = lod.vertices[lod.semantic_ids == 1]
    if len(floor_lod) and len(floor_full):
        assert abs(float(floor_lod[..., 1].mean()) - float(floor_full[..., 1].mean())) < 0.15


def test_lod_bands_in_chunk_selection():
    import numpy as np
    import jax.numpy as jnp
    from habitat_tpu.sims.procedural import build_lod_scene, generate_apartment, scanify
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import select_chunks
    from habitat_tpu.utils.geometry import camera_rays

    base = generate_apartment(3, extent=12.0, n_clutter=2)
    scan = scanify(base, tess=0.1, max_tris=60_000)
    lod = build_lod_scene(scan, cells=(0.4,), bands=(3.0,))
    pack = pack_scenes([lod])
    cb = np.asarray(pack.chunk_bounds[0])
    assert cb.shape[-1] == 6
    # both bands present
    assert (cb[cb[:, 3] > 0, 5] < 1e8).any()  # fine chunks have finite dmax
    assert (cb[cb[:, 3] > 0, 5] > 1e8).any()  # coarse chunks unbounded

    # selection from a navigable point: near tiles pick fine chunks only
    pos = jnp.array([[6.0, 1.2, 6.0]], jnp.float32)
    dirs = camera_rays(jnp.float32(0.0), jnp.float32(-0.6), jnp.deg2rad(90.0), 32, 32)
    dirs = dirs.reshape(1, -1, 3)
    o = jnp.broadcast_to(pos[:, None, :], dirs.shape)
    ids = select_chunks(pack.chunk_bounds[jnp.zeros(1, jnp.int32)], o, dirs, 1024, 8)
    picked = np.asarray(ids).ravel()
    d_to_cam = np.linalg.norm(cb[picked, :3] - np.asarray(pos[0]), axis=-1)
    dmax = cb[picked, 5]
    dmin = cb[picked, 4]
    r = cb[picked, 3]
    ok = ((d_to_cam + r) >= dmin) & ((d_to_cam - r) <= dmax)
    assert ok.all(), "selected chunks must respect their LOD band"


def test_frustum_tile_culling_conservative():
    """select_chunks_frustum (v8 fast path): every triangle any tile ray
    actually hits must be inside a surviving chunk of that tile, the
    survivor list is ascending original chunk order, and the tail is padded
    with the last survivor (the kernel's DMA-elision contract)."""
    from habitat_tpu.ops.raycast import (
        bin_tris_tiles,
        raycast_rays,
        select_chunks_frustum,
        tile_plane_normals_cam,
    )
    from habitat_tpu.utils.geometry import camera_rays

    scenes = [generate_apartment(seed=s, extent=8.0) for s in range(2)]
    pack = pack_scenes(scenes)
    T = pack.tri_v0.shape[1]
    N, H, W = 4, 32, 32
    th = 16  # 2 tiles
    planes = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, th, W))
    rng = np.random.RandomState(3)
    pos = jnp.asarray(
        np.array([[4.0, 1.25, 4.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.asarray(rng.randint(0, 2, N).astype(np.int32))
    ids, cnt = jax.jit(
        lambda: select_chunks_frustum(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid,
            sids, pos, yaw, pitch, planes, tri_chunk=32,
        )
    )()
    ids, cnt = np.asarray(ids), np.asarray(cnt)
    K = T // 32
    assert ids.shape == (N, 2, K)
    for n in range(N):
        d = np.asarray(
            camera_rays(yaw[n], jnp.float32(0), jnp.deg2rad(90.0), H, W)
        ).reshape(-1, 3)
        s = int(sids[n])
        t, idx = raycast_rays(
            pack.tri_v0[s], pack.tri_e1[s], pack.tri_e2[s], pack.tri_valid[s],
            jnp.broadcast_to(pos[n], (H * W, 3)), jnp.asarray(d),
        )
        idx = np.asarray(idx).reshape(H, W)
        for j in range(2):
            c = cnt[n, j]
            surv = set(ids[n, j, :c].tolist())
            # ascending survivor order + duplicate tail padding
            assert list(ids[n, j, :c]) == sorted(surv)
            if c:
                assert (ids[n, j, c:] == ids[n, j, c - 1]).all()
            hit_tris = idx[j * th : (j + 1) * th].reshape(-1)
            for tri in np.unique(hit_tris[hit_tris >= 0]):
                assert tri // 32 in surv, (n, j, tri)


@pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="pallas stream kernel needs the TPU backend",
)
def test_scan_scene_culling_agreement_floor():
    """Culling exactness floor on a scan-density scene (VERDICT r2 #2):
    the deployed stream path must agree with the band-valid all-chunks
    oracle to >=0.99 within 5 mm (plane-exact depth, same LOD policy)."""
    import numpy as np
    import jax.numpy as jnp

    from habitat_tpu.sims.procedural import generate_scan_apartment
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import (
        _lod_band_ok,
        ray_feature_matrix,
        select_chunks_occluded,
    )
    from habitat_tpu.ops.raycast_pallas import (
        group_tri_mat_pad16,
        raycast_pallas_stream_t,
    )
    from habitat_tpu.utils.geometry import camera_rays

    # conftest pins the default DEVICE to cpu for the virtual mesh; this
    # test must run on the real TPU, so enter its device context explicitly
    tpu_dev = jax.devices()[0]
    ctx = jax.default_device(tpu_dev)
    ctx.__enter__()
    scene = generate_scan_apartment(0, tess=0.15, n_clutter=8)
    pack = pack_scenes([scene])
    rng = np.random.default_rng(0)
    n_val, H, W = 2, 64, 64
    pos = np.stack([scene.sample_navigable_point(rng) for _ in range(n_val)])
    pos[:, 1] = scene.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, n_val), jnp.float32)
    svids = jnp.zeros((n_val,), jnp.int32)
    d4 = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yawj).reshape(n_val, -1, 3)
    o4 = jnp.broadcast_to(posj[:, None, :], d4.shape)

    def blk(x, inv=False):
        tail = x.shape[2:]
        if inv:
            x = x.reshape((n_val, H // 32, W // 32, 32, 32) + tail)
        else:
            x = x.reshape((n_val, H // 32, 32, W // 32, 32) + tail)
        x = jnp.swapaxes(x, 2, 3)
        return x.reshape((n_val, H * W) + tail)

    C = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]
    gm = group_tri_mat_pad16(pack.tri_mat, C)
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    dcb = blk(jnp.broadcast_to(d_cam, (n_val, H * W, 3)))[0]
    d_aug = jnp.concatenate([dcb, jnp.ones((H * W, 1), jnp.float32)], -1)
    nt = (H * W) // 1024
    d_t = jnp.pad(
        d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0))
    )
    Bt = jnp.pad(
        ray_feature_matrix(posj, yawj, jnp.zeros((n_val,))).transpose(0, 2, 1),
        ((0, 0), (0, 6), (0, 0)),
    )

    def run(ids, cnt):
        t, idx = raycast_pallas_stream_t(
            gm, svids, ids, cnt, d_t, Bt, ray_tile=1024, tri_chunk=C
        )
        t, idx = blk(t, inv=True), blk(idx, inv=True)
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        nrm = pack.tri_attr[svids[:, None], safe, 0:3]
        v0g = pack.tri_v0[svids[:, None], safe]
        nd = jnp.sum(nrm * d4, axis=-1)
        num = jnp.sum(nrm * (v0g - o4), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6), idx

    NC = pack.chunk_bounds.shape[1]
    ob, db = blk(o4), blk(d4)
    cb = pack.chunk_bounds[svids]
    o_t = ob.reshape(n_val, nt, 1024, 3)[:, :, 0]
    dist_c = jnp.linalg.norm(cb[:, None, :, :3] - o_t[:, :, None, :], axis=-1)
    valid_c = (cb[..., 3] > 0)[:, None, :] & _lod_band_ok(cb, dist_c)
    score_c = jnp.where(
        valid_c, jnp.maximum(dist_c - cb[..., 3][:, None], 0.0), 1e9
    )
    neg_c, idx_c = jax.lax.top_k(-score_c, NC)
    cnt_all = jnp.sum(neg_c > -1e8, axis=-1).astype(jnp.int32)
    dmin = jnp.clip(jnp.floor(-neg_c * 1e2), 0, 8191).astype(jnp.int32)
    in_c = jnp.arange(NC, dtype=jnp.int32)[None, None, :] < cnt_all[..., None]
    ids_all = (
        (jnp.where(in_c, dmin, 0) << 18) | jnp.where(in_c, idx_c, 0)
    ).astype(jnp.int32)
    t_full, i_full = jax.jit(run)(ids_all, cnt_all)
    t_full = np.asarray(t_full)
    hit_full = np.asarray(i_full) >= 0

    ids, cnt = select_chunks_occluded(
        pack.tri_mat, cb, svids, ob, db, 1024, min(192, NC), with_cnt=True
    )
    tK, iK = jax.jit(run)(ids, cnt)
    tK = np.asarray(tK)
    hitK = np.asarray(iK) >= 0
    hitmatch = (hit_full == hitK).mean()
    both = hit_full & hitK
    agree = (np.abs(t_full[both] - tK[both]) < 5e-3).mean()
    ctx.__exit__(None, None, None)
    assert hitmatch >= 0.98, hitmatch
    assert agree >= 0.99, agree


def test_exact_chunklet_culling_conservative():
    """select_chunklets_exact (v11 scan path): every triangle any tile ray
    actually hits must be inside a selected chunklet of that tile;
    survivors ascend in original chunklet order and the tail repeats the
    last survivor (the packed kernel's duplicate-padding contract)."""
    from habitat_tpu.ops.raycast import (
        chunklet_aabbs,
        raycast_rays,
        select_chunklets_exact,
        select_chunks,
        tile_plane_normals_cam,
    )
    from habitat_tpu.utils.geometry import camera_rays

    from habitat_tpu.sims.procedural import generate_scan_apartment

    scenes = [
        generate_scan_apartment(
            seed=s, extent=6.0, n_rooms_per_axis=2, n_clutter=6, tess=0.35
        )
        for s in range(2)
    ]
    pack = pack_scenes(scenes)
    S, T = pack.tri_v0.shape[:2]
    parent_c = T // pack.chunk_bounds.shape[1]
    assert T // 32 > 8, "need a multi-chunklet scene for this test"
    N, H, W = 4, 64, 64
    nt = (H // 32) * (W // 32)
    planes = jnp.asarray(
        tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32)
    )
    rng = np.random.RandomState(5)
    pos = jnp.asarray(
        np.array([[4.0, 1.25, 4.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.asarray(rng.randint(0, 2, N).astype(np.int32))
    # rays in 32x32 block order (the blocked path's tiling)
    d_all = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yaw).reshape(N, -1, 3)

    def to_blocks(x):
        tail = x.shape[2:]
        x = x.reshape((N, H // 32, 32, W // 32, 32) + tail)
        return jnp.swapaxes(x, 2, 3).reshape((N, H * W) + tail)

    d_blk = to_blocks(d_all)
    o_blk = jnp.broadcast_to(pos[:, None, :], d_blk.shape)

    @jax.jit
    def run():
        ids0, cnt0 = select_chunks(
            pack.chunk_bounds[sids], o_blk, d_blk, 1024, 64, with_cnt=True
        )
        ab = chunklet_aabbs(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, c=32
        )
        return select_chunklets_exact(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab,
            sids, pos, yaw, pitch, planes, ids0, cnt0,
            parent_c=parent_c, c=32, k_aabb=256, k_final=256,
            skip_exact=False,  # exercise the L2 exact-plane path
        )

    packed, cnt = map(np.asarray, run())
    n_chunklets_per_parent = parent_c // 32
    kf_expect = min(256, 64 * n_chunklets_per_parent, (T // parent_c) * n_chunklets_per_parent)
    assert packed.shape == (N, nt, kf_expect)
    ids = packed & 0x3FFFF
    dmin = (packed >> 18) * 1e-2
    for n in range(N):
        s = int(sids[n])
        t, idx = raycast_rays(
            pack.tri_v0[s], pack.tri_e1[s], pack.tri_e2[s],
            pack.tri_valid[s], o_blk[n], d_blk[n],
        )
        idx = np.asarray(idx).reshape(nt, 1024)
        for j in range(nt):
            c = cnt[n, j]
            surv = ids[n, j, :c].tolist()
            assert len(surv) == len(set(surv))  # no dups
            # nearest-first: packed dmin ascends over the survivors
            assert (np.diff(dmin[n, j, :c]) >= 0).all()
            if c:
                assert (packed[n, j, c:] == packed[n, j, c - 1]).all()
            hits = idx[j]
            for tri in np.unique(hits[hits >= 0]):
                assert tri // 32 in set(surv), (n, j, tri)
