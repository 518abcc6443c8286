"""Prunable fraction from conservative per-screen-tile triangle culling.

For each (env, tile) pyramid frustum (apex = camera, 4 side planes from the
tile's outermost corner rays, padded to the pixel-grid edge), a tri survives
unless all 3 verts are outside one plane. Counts survivors per tile for
several tile shapes on bench-scene poses. Conservative: never culls a tri
any tile ray could hit.
"""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax; jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp

from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.utils.geometry import view_rotation_matrix

N, H, W = 256, 128, 128
scenes, episodes, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
env = make_nav_env(scenes, episodes, num_envs=N, precomputed_fields=fields,
                   max_episode_steps=500,
                   sensor_specs=(("HabitatSimDepthSensor", {"height": H, "width": W}),))
pack = env.pack
S, T = pack.tri_v0.shape[:2]

rng = np.random.RandomState(0)
starts = np.array([e.start_position for e in episodes])  # (E,3)
pick = rng.randint(0, len(starts), N)
pos = starts[pick] + rng.uniform(-0.3, 0.3, (N, 3)) * [1, 0, 1]
pos[:, 1] += 1.25  # approx sensor height
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
sids = np.array([pick[i] * S // len(starts) for i in range(N)], np.int32)
sids = rng.randint(0, S, N).astype(np.int32)

# camera-frame pixel grid corners (pinhole, hfov 90)
hfov = np.deg2rad(90.0)
fx = 0.5 * W / np.tan(hfov / 2)
# pixel centers at (i+0.5); tile edges at pixel-grid boundaries
def frustum_counts(th, tw):
    nty, ntx = H // th, W // tw
    # tile corner dirs in camera frame (z = -1 forward convention? check camera_rays)
    from habitat_tpu.ops.raycast import camera_rays
    d = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.float32(hfov), H, W))  # (H,W,3)
    # estimate: use outermost pixel-center dirs of each tile, pushed outward by one pixel
    R = view_rotation_matrix(jnp.asarray(yaw), jnp.zeros(N, jnp.float32))  # (N,3,3)
    R = np.asarray(R)
    counts = np.zeros((N, nty, ntx), np.int32)
    v0 = np.asarray(pack.tri_v0); e1 = np.asarray(pack.tri_e1); e2 = np.asarray(pack.tri_e2)
    valid = np.asarray(pack.tri_valid)
    verts = np.stack([v0, v0 + e1, v0 + e2], 2)  # (S,T,3,3)
    for ty in range(nty):
        for tx in range(ntx):
            c00 = d[ty*th, tx*tw]; c01 = d[ty*th, tx*tw+tw-1]
            c10 = d[ty*th+th-1, tx*tw]; c11 = d[ty*th+th-1, tx*tw+tw-1]
            # push corners outward by ~1px to cover pixel centers exactly at edges
            corners = np.stack([c00, c01, c11, c10])  # CCW-ish
            ctr = d[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw].reshape(-1,3).mean(0)
            corners = corners + (corners - ctr) * (1.0 / max(th, tw))
            # inward normals: n_i = cross(corner_i, corner_{i+1}) sign-fixed by ctr
            ns = []
            for i in range(4):
                n = np.cross(corners[i], corners[(i+1) % 4])
                if np.dot(n, ctr) < 0: n = -n
                ns.append(n)
            ns = np.stack(ns)  # (4,3) camera frame
            nw = np.einsum('nij,kj->nki', R, ns)  # (N,4,3) world
            for i in range(N):
                s = sids[i]
                rel = verts[s] - pos[i]  # (T,3,3)
                dots = np.einsum('kc,tvc->ktv', nw[i], rel)  # (4,T,3)
                out_all = (dots < 0).all(axis=2)  # (4,T)
                culled = out_all.any(axis=0) | ~valid[s]
                counts[i, ty, tx] = int((~culled).sum())
    return counts

for th, tw in [(16, 128), (8, 128), (32, 32), (16, 16), (64, 64)]:
    c = frustum_counts(th, tw)
    rays = th * tw
    # work model: sum over tiles of count*rays vs T*rays brute
    work = (c.astype(np.int64) * rays).sum()
    brute = N * (H * W) * T
    print(f"tile {th:3d}x{tw:3d}: mean {c.mean():6.1f} p50 {np.percentile(c,50):5.0f} "
          f"p90 {np.percentile(c,90):5.0f} p99 {np.percentile(c,99):5.0f} max {c.max():3d} "
          f"| ray-tri work vs brute: {work/brute:.3f}")

# chunk-granularity counts: a chunk of C consecutive tris survives if any
# member survives — measures how much the pack's tri ORDER costs vs per-tri
def chunk_counts(th, tw, C, order=None):
    nty, ntx = H // th, W // tw
    from habitat_tpu.ops.raycast import camera_rays
    d = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.float32(hfov), H, W))
    R = np.asarray(view_rotation_matrix(jnp.asarray(yaw), jnp.zeros(N, jnp.float32)))
    v0 = np.asarray(pack.tri_v0); e1 = np.asarray(pack.tri_e1); e2 = np.asarray(pack.tri_e2)
    valid = np.asarray(pack.tri_valid)
    if order is not None:
        v0 = np.take_along_axis(v0, order[..., None], 1)
        e1 = np.take_along_axis(e1, order[..., None], 1)
        e2 = np.take_along_axis(e2, order[..., None], 1)
        valid = np.take_along_axis(valid, order, 1)
    verts = np.stack([v0, v0 + e1, v0 + e2], 2)
    counts = np.zeros((N, nty, ntx), np.int32)
    for ty in range(nty):
        for tx in range(ntx):
            c00 = d[ty*th, tx*tw]; c01 = d[ty*th, tx*tw+tw-1]
            c10 = d[ty*th+th-1, tx*tw]; c11 = d[ty*th+th-1, tx*tw+tw-1]
            corners = np.stack([c00, c01, c11, c10])
            ctr = d[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw].reshape(-1,3).mean(0)
            corners = corners + (corners - ctr) * (1.0 / max(th, tw))
            ns = []
            for i in range(4):
                n = np.cross(corners[i], corners[(i+1)%4])
                if np.dot(n, ctr) < 0: n = -n
                ns.append(n)
            nw = np.einsum('nij,kj->nki', R, np.stack(ns))
            for i in range(N):
                s = sids[i]
                rel = verts[s] - pos[i]
                dots = np.einsum('kc,tvc->ktv', nw[i], rel)
                culled = (dots < 0).all(axis=2).any(axis=0) | ~valid[s]
                surv = (~culled).reshape(-1, C).any(axis=1)
                counts[i, ty, tx] = int(surv.sum())
    return counts

# morton-ish spatial order: sort tris by centroid (x then z bins)
cent = np.asarray(pack.tri_v0) + (np.asarray(pack.tri_e1) + np.asarray(pack.tri_e2)) / 3
def morton_order():
    orders = []
    for s in range(S):
        c = cent[s]
        q = np.floor((c - c.min(0)) / 0.75).astype(np.int64)
        def interleave(v):
            out = 0
            for b in range(10):
                out |= ((v >> b) & 1) << (3 * b)
            return out
        key = interleave(q[:,0]) | (interleave(q[:,1]) << 1) | (interleave(q[:,2]) << 2)
        orders.append(np.argsort(key, kind='stable'))
    return np.stack(orders)

mo = morton_order()
for C in (16, 32):
    c_raw = chunk_counts(16, 128, C)
    c_mort = chunk_counts(16, 128, C, order=mo)
    nc = T // C
    print(f"C={C:3d} (NC={nc}): pack-order mean {c_raw.mean():5.2f} p99 {np.percentile(c_raw,99):4.0f} max {c_raw.max():3d}"
          f" | morton mean {c_mort.mean():5.2f} p99 {np.percentile(c_mort,99):4.0f} max {c_mort.max():3d}"
          f" | work vs brute: pack {c_raw.mean()*C/T:.3f} morton {c_mort.mean()*C/T:.3f}")
