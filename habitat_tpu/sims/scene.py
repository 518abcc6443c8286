"""Scene representation: host-side build, device-side packed arrays.

Replaces the reference's habitat-sim scene/asset managers + Recast/Detour navmesh
(SURVEY §2.9; call sites habitat_simulator.py:299-371, 528-596) with:

- ``SceneData``: host (numpy) triangle soup + navigability grid for ONE scene.
- ``build_navgrid``: occupancy-grid "navmesh" baked from the triangle soup
  (agent-radius eroded), replacing ``recompute_navmesh``/``NavMeshSettings``.
- ``geodesic_field``: multi-source geodesic distance field over the navgrid via
  vectorized 16-neighborhood chamfer sweeps (exact 16-connected shortest path at
  convergence), replacing ``PathFinder.find_path`` / ``MultiGoalShortestPath``.
- ``ScenePack``: S scenes padded & stacked into device arrays (HBM-resident),
  indexable by per-env scene id inside jit — the TPU-native answer to the
  reference's one-scene-per-process model (vector_env.py:135).

Coordinates: y-up, units meters (habitat convention). Navgrid cells are in the
xz plane at the scene's floor height.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# 16-neighborhood offsets (dx, dz) and their metric costs (in cells).
_CHAMFER_OFFSETS: List[Tuple[int, int, float]] = (
    [(1, 0, 1.0), (-1, 0, 1.0), (0, 1, 1.0), (0, -1, 1.0)]
    + [(1, 1, np.sqrt(2.0)), (1, -1, np.sqrt(2.0)), (-1, 1, np.sqrt(2.0)), (-1, -1, np.sqrt(2.0))]
    + [
        (2, 1, np.sqrt(5.0)),
        (2, -1, np.sqrt(5.0)),
        (-2, 1, np.sqrt(5.0)),
        (-2, -1, np.sqrt(5.0)),
        (1, 2, np.sqrt(5.0)),
        (1, -2, np.sqrt(5.0)),
        (-1, 2, np.sqrt(5.0)),
        (-1, -2, np.sqrt(5.0)),
    ]
)

INF_DIST = np.float32(1e6)


@dataclasses.dataclass
class SceneData:
    """One scene on the host. Triangle soup + navgrid."""

    scene_id: str
    # triangles
    vertices: np.ndarray  # (T, 3, 3) f32 — per-triangle vertex positions
    colors: np.ndarray  # (T, 3) f32 in [0,1]
    semantic_ids: np.ndarray  # (T,) int32
    # navgrid
    nav_occ: Optional[np.ndarray] = None  # (NX, NZ) bool, True = navigable
    obst_dist: Optional[np.ndarray] = None  # (NX, NZ) f32 — meters to nearest obstacle
    nav_lo: Optional[np.ndarray] = None  # (2,) world xz of cell (0,0) CENTER
    nav_res: float = 0.1
    floor_y: float = 0.0
    # semantic object annotations: list of dicts with semantic_id/category_id/
    # category/center/size (SemanticScene equivalent)
    objects: Optional[list] = None
    # semantic region annotations: list of dicts with id/category/lo/hi —
    # the region layer of the SemanticScene hierarchy (levels > regions >
    # objects, habitat-sim SemanticScene; see sims/semantic_scene.py)
    regions: Optional[list] = None
    # discrete level-of-detail: per-triangle lod id + per-lod (dmin, dmax)
    # render distance band (meters). None = single-LOD scene.
    tri_lod: Optional[np.ndarray] = None  # (T,) int32
    lod_ranges: Optional[list] = None  # [(dmin, dmax), ...] per lod id

    @property
    def num_triangles(self) -> int:
        return int(self.vertices.shape[0])

    def bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        v = self.vertices.reshape(-1, 3)
        return v.min(axis=0), v.max(axis=0)

    # -- navgrid helpers (host) -------------------------------------------
    def world_to_cell(self, xz: np.ndarray) -> np.ndarray:
        return np.round((np.asarray(xz) - self.nav_lo) / self.nav_res).astype(np.int64)

    def cell_to_world(self, ij: np.ndarray) -> np.ndarray:
        return np.asarray(ij, dtype=np.float64) * self.nav_res + self.nav_lo

    def is_navigable(self, pos: np.ndarray) -> bool:
        i, k = self.world_to_cell(np.asarray(pos)[[0, 2]])
        nx, nz = self.nav_occ.shape
        if not (0 <= i < nx and 0 <= k < nz):
            return False
        return bool(self.nav_occ[i, k])

    def sample_navigable_point(
        self, rng: np.random.Generator, largest_island_only: bool = False
    ) -> np.ndarray:
        occ = (
            largest_island_mask(self.nav_occ) if largest_island_only else self.nav_occ
        )
        ii, kk = np.nonzero(occ)
        j = rng.integers(len(ii))
        xz = self.cell_to_world(np.array([ii[j], kk[j]]))
        return np.array([xz[0], self.floor_y, xz[1]], dtype=np.float32)


def largest_island_mask(occ: np.ndarray) -> np.ndarray:
    """Largest connected navigable component (reference
    get_largest_island_index, datasets/rearrange/navmesh_utils.py — episode
    generation samples only from the largest island so agents and goals are
    mutually reachable). 4-connected BFS labeling, pure numpy."""
    occ = np.asarray(occ, bool)
    labels = np.zeros(occ.shape, np.int32)
    cur = 0
    best_label, best_size = 0, 0
    for i, k in zip(*np.nonzero(occ)):
        if labels[i, k]:
            continue
        cur += 1
        stack = [(i, k)]
        labels[i, k] = cur
        size = 0
        while stack:
            a, b = stack.pop()
            size += 1
            for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                x, y = a + da, b + db
                if (
                    0 <= x < occ.shape[0]
                    and 0 <= y < occ.shape[1]
                    and occ[x, y]
                    and not labels[x, y]
                ):
                    labels[x, y] = cur
                    stack.append((x, y))
        if size > best_size:
            best_size, best_label = size, cur
    return labels == best_label


def rasterize_occupancy(
    scene: SceneData,
    res: float = 0.1,
    agent_radius: float = 0.1,
    agent_height: float = 1.5,
    floor_y: Optional[float] = None,
    step_clearance: float = 0.2,
    pad_cells: int = 2,
) -> None:
    """Bake the navgrid from the triangle soup (in place).

    TPU-native replacement for Recast navmesh building
    (reference habitat_simulator.py:357-371 NavMeshSettings defaults:
    agent radius 0.1, height 1.5). A cell is navigable iff (a) some triangle
    provides floor support near ``floor_y`` and (b) no obstacle triangle
    intersects the agent's body slab ``[floor+step_clearance, floor+height]``
    within ``agent_radius`` of the cell center.
    """
    lo, hi = scene.bounds()
    if floor_y is None:
        floor_y = float(lo[1])
    nav_lo = lo[[0, 2]] - pad_cells * res
    nx = int(np.ceil((hi[0] - lo[0]) / res)) + 2 * pad_cells + 1
    nz = int(np.ceil((hi[2] - lo[2]) / res)) + 2 * pad_cells + 1

    floor = np.zeros((nx, nz), dtype=bool)
    obst = np.zeros((nx, nz), dtype=bool)

    v = scene.vertices  # (T, 3, 3)
    ymin = v[:, :, 1].min(axis=1)
    ymax = v[:, :, 1].max(axis=1)
    is_floor = (ymin <= floor_y + 0.05) & (ymax <= floor_y + step_clearance)
    is_obst = ymax > floor_y + step_clearance
    # obstacle must overlap the body slab
    is_obst &= ymin < floor_y + agent_height

    def _raster_tri(mask, tri_xz):
        """Conservative rasterization of the 2D triangle (xz projection)."""
        tlo = np.floor((tri_xz.min(axis=0) - nav_lo) / res).astype(int)
        thi = np.ceil((tri_xz.max(axis=0) - nav_lo) / res).astype(int)
        tlo = np.clip(tlo, 0, [nx - 1, nz - 1])
        thi = np.clip(thi, 0, [nx - 1, nz - 1])
        if np.any(thi < tlo):
            return
        ii = np.arange(tlo[0], thi[0] + 1)
        kk = np.arange(tlo[1], thi[1] + 1)
        cx = ii[:, None] * res + nav_lo[0]
        cz = kk[None, :] * res + nav_lo[1]
        # point-in-triangle via sign of edge cross products (with tolerance of
        # half a cell so thin triangles still mark cells they pass through)
        tol = 0.75 * res
        inside = np.ones((len(ii), len(kk)), dtype=bool)
        for a in range(3):
            p0 = tri_xz[a]
            p1 = tri_xz[(a + 1) % 3]
            e = p1 - p0
            en = np.linalg.norm(e) + 1e-12
            # signed distance of cell centers to edge line (positive = left)
            d = ((cx - p0[0]) * e[1] - (cz - p0[1]) * e[0]) / en
            inside &= d <= tol
        # orientation-agnostic: also test flipped winding
        inside2 = np.ones((len(ii), len(kk)), dtype=bool)
        for a in range(3):
            p0 = tri_xz[a]
            p1 = tri_xz[(a + 1) % 3]
            e = p1 - p0
            en = np.linalg.norm(e) + 1e-12
            d = ((cx - p0[0]) * e[1] - (cz - p0[1]) * e[0]) / en
            inside2 &= d >= -tol
        mask[np.ix_(ii, kk)] |= inside | inside2

    from habitat_tpu import native as _native

    if _native.available():
        tol = 0.75 * res
        nf = _native.rasterize_triangles_native(
            v[is_floor][:, :, [0, 2]], nav_lo, res, (nx, nz), tol
        )
        no = _native.rasterize_triangles_native(
            v[is_obst][:, :, [0, 2]], nav_lo, res, (nx, nz), tol
        )
        floor |= nf
        obst |= no
    else:
        for t in np.nonzero(is_floor)[0]:
            _raster_tri(floor, v[t][:, [0, 2]])
        for t in np.nonzero(is_obst)[0]:
            _raster_tri(obst, v[t][:, [0, 2]])

    # erode navigable area by agent radius: dilate obstacles with a disk
    r_cells = int(np.ceil(agent_radius / res))
    if r_cells > 0:
        from scipy import ndimage

        yy, xx = np.mgrid[-r_cells : r_cells + 1, -r_cells : r_cells + 1]
        disk = (xx**2 + yy**2) <= r_cells**2
        obst = ndimage.binary_dilation(obst, structure=disk)
        # also keep agents away from the floor boundary (falling off the map)
        floor = ndimage.binary_erosion(floor, structure=disk)

    scene.nav_occ = floor & ~obst
    # euclidean distance (meters) to nearest non-navigable cell — powers
    # ProximitySensor (reference nav.py:456) and distance_to_closest_obstacle
    from scipy import ndimage as _ndi

    scene.obst_dist = (
        _ndi.distance_transform_edt(scene.nav_occ).astype(np.float32) * res
    )
    scene.nav_lo = nav_lo.astype(np.float32)
    scene.nav_res = float(res)
    scene.floor_y = float(floor_y)


def geodesic_field(
    nav_occ: np.ndarray, sources: np.ndarray, res: float, max_iters: Optional[int] = None
) -> np.ndarray:
    """Multi-source geodesic distance field (meters) over the navgrid.

    Vectorized Bellman–Ford with a 16-neighborhood (chamfer-16) stencil; exact
    16-connected shortest paths at convergence (<=1.3% metrication error vs the
    reference's navmesh geodesics, habitat_simulator.py:528-554).

    sources: (M, 2) int cell indices. Returns (NX, NZ) f32, INF_DIST where
    unreachable or non-navigable.

    Uses the native C++ Dijkstra (habitat_tpu/native) when built — exact and
    ~50x faster on large grids; the numpy sweep below is the fallback.
    """
    from habitat_tpu import native as _native

    out = _native.geodesic_field_native(nav_occ, np.asarray(sources), res)
    if out is not None:
        # pin sources to zero exactly like the fallback (snapped goals may sit
        # on blocked cells)
        src = np.asarray(sources).reshape(-1, 2)
        ok = (
            (src[:, 0] >= 0)
            & (src[:, 0] < out.shape[0])
            & (src[:, 1] >= 0)
            & (src[:, 1] < out.shape[1])
        )
        src = src[ok]
        out[src[:, 0], src[:, 1]] = 0.0
        return out

    nx, nz = nav_occ.shape
    d = np.full((nx, nz), INF_DIST, dtype=np.float32)
    src = np.asarray(sources).reshape(-1, 2)
    ok = (
        (src[:, 0] >= 0) & (src[:, 0] < nx) & (src[:, 1] >= 0) & (src[:, 1] < nz)
    )
    src = src[ok]
    d[src[:, 0], src[:, 1]] = 0.0
    blocked = ~nav_occ
    d[blocked & (d > 0)] = INF_DIST
    if max_iters is None:
        max_iters = 2 * (nx + nz)
    big = np.float32(INF_DIST)
    for _ in range(max_iters):
        nd = d.copy()
        for dx, dz, c in _CHAMFER_OFFSETS:
            # shifted[i,k] = d[i-dx, k-dz] (value propagated FROM that neighbor)
            shifted = np.roll(d, (dx, dz), axis=(0, 1))
            # invalidate wrapped-around borders
            if dx > 0:
                shifted[:dx, :] = big
            elif dx < 0:
                shifted[dx:, :] = big
            if dz > 0:
                shifted[:, :dz] = big
            elif dz < 0:
                shifted[:, dz:] = big
            np.minimum(nd, shifted + np.float32(c * res), out=nd)
        nd[blocked] = big
        # re-pin sources (even ones snapped onto blocked cells)
        nd[src[:, 0], src[:, 1]] = 0.0
        if np.array_equal(nd, d):
            break
        d = nd
    return d


@dataclasses.dataclass
class ScenePack:
    """S scenes packed into device arrays (a jax pytree). Padded to max sizes."""

    tri_v0: jnp.ndarray  # (S, T, 3) f32
    tri_e1: jnp.ndarray  # (S, T, 3) f32 — v1 - v0
    tri_e2: jnp.ndarray  # (S, T, 3) f32 — v2 - v0
    tri_color: jnp.ndarray  # (S, T, 3) f32
    tri_sem: jnp.ndarray  # (S, T) i32
    tri_valid: jnp.ndarray  # (S, T) bool
    tri_mat: jnp.ndarray  # (S, 10, 4, T) f32 — MXU raycast coefficient matrix
    tri_attr: jnp.ndarray  # (S, T, 8) f32 — [unit normal(3), color(3), sem, valid]
    chunk_bounds: jnp.ndarray  # (S, T//chunk, 4) f32 — bounding spheres (xyz, r)
    # of 128-triangle chunks (spatially sorted), for per-ray-tile cone culling
    nav_occ: jnp.ndarray  # (S, NX, NZ) bool
    obst_dist: jnp.ndarray  # (S, NX, NZ) f32 meters to nearest obstacle
    nav_lo: jnp.ndarray  # (S, 2) f32
    floor_y: jnp.ndarray  # (S,) f32
    # large-scene stream-render tables, precomputed at pack time for scan-
    # scale packs (None otherwise): the c=32 chunk-grouped matrix
    # (group_tri_mat_pad16 layout) and per-chunklet AABBs [ctr3, half3] —
    # recomputing these per frame measured 9.8 ms at 860k tris (round 4)
    tri_mat_g32: Optional[jnp.ndarray] = None  # (S, 16, 4T)
    chunklet_ab32: Optional[jnp.ndarray] = None  # (S, T//32, 6)
    # widened epilogue table [attr8 | v0(3) | pad5]: ONE 64-byte-row gather
    # replaces the attr + v0 pair (two small-row gathers measured 115.8 ms
    # vs 23.3 for one packed gather at 4.2M rays, round 4)
    tri_attr16: Optional[jnp.ndarray] = None  # (S, T, 16)
    # per-triangle vertex rows [v0|e1|e2|pad7] for the exact-select L2 pass
    # (round 5): gathered chunklet-major as (S*T//32, 512) 2KB rows so the
    # per-candidate gather is one wide row, not 32 small ones
    tri_verts16: Optional[jnp.ndarray] = None  # (S, T, 16)
    nav_res: float = 0.1  # static
    scene_ids: Tuple[str, ...] = ()  # static (host metadata)

    @property
    def num_scenes(self) -> int:
        return int(self.tri_v0.shape[0])

    @property
    def max_triangles(self) -> int:
        return int(self.tri_v0.shape[1])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


TRI_CHUNK = 128  # raycast kernel chunk size; chunks are the culling unit


def _morton_sort(centroids: np.ndarray) -> np.ndarray:
    """Spatially-coherent triangle order (morton code of quantized centroid)
    so 128-tri chunks have tight bounding spheres."""
    lo = centroids.min(axis=0)
    span = centroids.max(axis=0) - lo + 1e-6
    q = np.clip(((centroids - lo) / span * 1023).astype(np.uint32), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def _morton_sort_keys(centroids: np.ndarray) -> np.ndarray:
    """Morton codes themselves (for composite lexsort keys)."""
    lo = centroids.min(axis=0)
    span = centroids.max(axis=0) - lo + 1e-6
    q = np.clip(((centroids - lo) / span * 1023).astype(np.uint32), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def pack_scenes(
    scenes: List[SceneData],
    tri_pad: int = TRI_CHUNK,
    force_scan_tables: bool = False,
) -> ScenePack:
    """Pack host scenes into one padded device pytree (triangles morton-
    sorted; per-chunk bounding spheres for culling).

    force_scan_tables builds the scan-scale stream tables (chunk=256,
    tri_mat_g32/chunklet_ab32/tri_attr16) regardless of scene size — used by
    tests to exercise the scan-only render path on small CPU-sized scenes.
    """
    assert len(scenes) > 0
    tri_pad = max(tri_pad, TRI_CHUNK)
    t_max = _round_up(max(s.num_triangles for s in scenes), tri_pad)
    # culling-chunk granularity: 128 tris normally; 256 at scan scale
    # (>=256k padded tris) — halves the stream kernel's per-tile iteration
    # count, whose fixed per-chunk overhead dominates at 5k+ chunks. The
    # consumers derive C from tri_mat.shape[3] // chunk_bounds.shape[1].
    chunk = 256 if (force_scan_tables or t_max >= 262144) else TRI_CHUNK
    t_max = _round_up(t_max, chunk)
    grids = [s.nav_occ.shape for s in scenes]
    nx = max(g[0] for g in grids)
    nz = max(g[1] for g in grids)

    S = len(scenes)
    v0 = np.zeros((S, t_max, 3), np.float32)
    e1 = np.zeros((S, t_max, 3), np.float32)
    e2 = np.zeros((S, t_max, 3), np.float32)
    col = np.zeros((S, t_max, 3), np.float32)
    sem = np.zeros((S, t_max), np.int32)
    valid = np.zeros((S, t_max), bool)
    tmat = np.zeros((S, 10, 4, t_max), np.float32)
    tattr = np.zeros((S, t_max, 8), np.float32)
    occ = np.zeros((S, nx, nz), bool)
    odist = np.zeros((S, nx, nz), np.float32)
    lo = np.zeros((S, 2), np.float32)
    fy = np.zeros((S,), np.float32)

    n_chunks = t_max // chunk
    # bounding spheres + LOD render band: [cx, cy, cz, r, dmin, dmax]
    cb = np.zeros((S, n_chunks, 6), np.float32)

    for i, s in enumerate(scenes):
        n = s.num_triangles
        v = s.vertices
        if s.tri_lod is not None:
            # keep chunks LOD-pure: morton-sort WITHIN each lod group
            order = np.lexsort(
                (_morton_sort_keys(v.mean(axis=1)), s.tri_lod)
            )
            tri_lod_sorted = s.tri_lod[order]
        else:
            order = _morton_sort(v.mean(axis=1))
            tri_lod_sorted = None
        v = v[order]
        v0[i, :n] = v[:, 0]
        e1[i, :n] = v[:, 1] - v[:, 0]
        e2[i, :n] = v[:, 2] - v[:, 0]
        col[i, :n] = s.colors[order]
        sem[i, :n] = s.semantic_ids[order]
        valid[i, :n] = True
        # per-chunk bounding spheres (padding chunks: zero radius far away)
        cb[i, :, 3] = -1.0
        cb[i, :, 1] = -1e6
        cb[i, :, 5] = 1e9  # default band: always rendered
        for c in range(n_chunks):
            a, b = c * chunk, min((c + 1) * chunk, n)
            if a >= n:
                break
            pts = v[a:b].reshape(-1, 3)
            ctr = (pts.min(axis=0) + pts.max(axis=0)) / 2
            cb[i, c, :3] = ctr
            cb[i, c, 3] = float(np.linalg.norm(pts - ctr, axis=-1).max())
            if tri_lod_sorted is not None and s.lod_ranges is not None:
                lod = int(tri_lod_sorted[a])  # chunk is lod-pure
                dmin, dmax = s.lod_ranges[lod]
                cb[i, c, 4] = dmin
                cb[i, c, 5] = dmax
        from habitat_tpu.ops.raycast import build_tri_matrix

        tmat[i] = build_tri_matrix(v0[i], e1[i], e2[i], valid[i])
        nrm = np.cross(e1[i], e2[i])
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9
        tattr[i, :, 0:3] = nrm
        tattr[i, :, 3:6] = col[i]
        tattr[i, :, 6] = sem[i]
        tattr[i, :, 7] = valid[i]
        g = s.nav_occ
        occ[i, : g.shape[0], : g.shape[1]] = g
        odist[i, : g.shape[0], : g.shape[1]] = s.obst_dist
        lo[i] = s.nav_lo
        fy[i] = s.floor_y

    g32 = ab32 = attr16 = verts16 = None
    if chunk == 256:  # scan-scale pack: precompute the stream tables
        from habitat_tpu.ops.raycast import chunklet_aabbs
        from habitat_tpu.ops.raycast_pallas import group_tri_mat_pad16

        tmj = jnp.asarray(tmat)
        vj, e1j, e2j, vaj = (
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(valid),
        )
        g32 = jax.jit(lambda m: group_tri_mat_pad16(m, 32))(tmj)
        ab32 = jax.jit(
            lambda a, b, cc, d: chunklet_aabbs(a, b, cc, d, c=32)
        )(vj, e1j, e2j, vaj)
        # [attr(8) | v0(3) | n.v0 | pad(4)]: n.v0 precomputed so the v14
        # channel-major epilogue recovers plane-exact t as
        # (n.v0 - n.o)/(n.d) without touching v0 per ray (v0 stays at 8:11
        # for the older epilogues/tests that read it). The slot index is the
        # shared layout contract with the consumer (raycast.ATTR16_NV0).
        from habitat_tpu.ops.raycast import ATTR16_NV0

        taj = jnp.asarray(tattr)
        nv0 = jnp.sum(taj[..., 0:3] * vj, axis=-1, keepdims=True)
        attr16 = jnp.concatenate(
            [
                taj,
                vj,
                nv0,
                jnp.zeros((S, t_max, 4), jnp.float32),
            ],
            axis=-1,
        )
        assert attr16.shape[-1] == 16 and ATTR16_NV0 == 8 + 3
        # [v0|e1|e2|pad6|valid]: validity rides in lane VERTS16_VALID so
        # the exact-select consumer needs no second (32-byte-row) bool
        # gather per candidate — the round-5 select breakdown measured the
        # separate tri_valid gather as part of a 49 ms L2 overhead at
        # N=256 (scripts/exp_v15_breakdown.py)
        from habitat_tpu.ops.raycast import VERTS16_VALID

        verts16 = jnp.concatenate(
            [
                vj, e1j, e2j,
                jnp.zeros((S, t_max, 6), jnp.float32),
                vaj[..., None].astype(jnp.float32),
            ],
            axis=-1,
        )
        assert verts16.shape[-1] == 16 and VERTS16_VALID == 15
    return ScenePack(
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2),
        tri_color=jnp.asarray(col),
        tri_sem=jnp.asarray(sem),
        tri_valid=jnp.asarray(valid),
        tri_mat=jnp.asarray(tmat),
        tri_attr=jnp.asarray(tattr),
        chunk_bounds=jnp.asarray(cb),
        nav_occ=jnp.asarray(occ),
        obst_dist=jnp.asarray(odist),
        nav_lo=jnp.asarray(lo),
        floor_y=jnp.asarray(fy),
        tri_mat_g32=g32,
        chunklet_ab32=ab32,
        tri_attr16=attr16,
        tri_verts16=verts16,
        nav_res=scenes[0].nav_res,
        scene_ids=tuple(s.scene_id for s in scenes),
    )


import jax.tree_util as jtu


def _scenepack_flatten(sp: ScenePack):
    children = (
        sp.tri_v0,
        sp.tri_e1,
        sp.tri_e2,
        sp.tri_color,
        sp.tri_sem,
        sp.tri_valid,
        sp.tri_mat,
        sp.tri_attr,
        sp.chunk_bounds,
        sp.nav_occ,
        sp.obst_dist,
        sp.nav_lo,
        sp.floor_y,
        sp.tri_mat_g32,
        sp.chunklet_ab32,
        sp.tri_attr16,
        sp.tri_verts16,
    )
    aux = (sp.nav_res, sp.scene_ids)
    return children, aux


def _scenepack_unflatten(aux, children):
    return ScenePack(*children, nav_res=aux[0], scene_ids=aux[1])


jtu.register_pytree_node(ScenePack, _scenepack_flatten, _scenepack_unflatten)
