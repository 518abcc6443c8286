"""v14 channel-major epilogue parity (ADVICE r4 medium): the deployed
large-scene render path early-returns through the channel-major epilogue
whenever the pack carries tri_attr16 and there is no dynamic geometry —
previously no test compared its rgb/depth/semantic against the legacy
row-gather epilogue. Here both run over the SAME kernel (t, idx) on a
force_scan_tables pack under CPU interpret mode, differing only in epilogue
(tri_attr16 present vs stripped), and must agree.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from habitat_tpu.sims.procedural import generate_scan_apartment
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import ATTR16_NV0, render_batch



@pytest.fixture(scope="module")
def setup():
    scene = generate_scan_apartment(
        seed=5, extent=6.0, n_rooms_per_axis=2, n_clutter=6, tess=0.35
    )
    pack = pack_scenes([scene], force_scan_tables=True)
    assert pack.tri_attr16 is not None  # scan tables present
    assert pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1] == 256

    N, H, W = 2, 32, 32
    rng = np.random.RandomState(11)
    pos = jnp.asarray(
        np.array([[3.0, 1.25, 3.0]]) + rng.uniform(-1, 1, (N, 3)) * [1, 0, 1],
        jnp.float32,
    )
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, N).astype(np.float32))
    pitch = jnp.zeros(N)
    sids = jnp.zeros((N,), jnp.int32)
    return pack, sids, pos, yaw, pitch, (N, H, W)


def _render(pack, sids, pos, yaw, pitch, hw, cull_k):
    H, W = hw
    with pltpu.force_tpu_interpret_mode():
        return render_batch(
            pack,
            sids,
            pos,
            yaw,
            pitch,
            height=H,
            width=W,
            backend="pallas",
            cull_k=cull_k,
        )


def test_v14_epilogue_matches_legacy(setup):
    pack, sids, pos, yaw, pitch, (N, H, W) = setup
    # cull_k small enough that n_chunks(128-units) > 2*cull_k selects the
    # large-scene blocked path on this small pack
    cull_k = max(4, pack.tri_mat.shape[3] // 128 // 4)

    out_v14 = _render(pack, sids, pos, yaw, pitch, (H, W), cull_k)

    legacy_pack = dataclasses.replace(pack, tri_attr16=None)
    out_legacy = _render(legacy_pack, sids, pos, yaw, pitch, (H, W), cull_k)

    hit14 = np.asarray(out_v14["depth"][..., 0]) < 0.999
    hitlg = np.asarray(out_legacy["depth"][..., 0]) < 0.999
    assert hit14.mean() > 0.5, "camera should see geometry"
    assert (hit14 == hitlg).all(), "hit masks diverge between epilogues"

    d14 = np.asarray(out_v14["depth"], np.float64)
    dlg = np.asarray(out_legacy["depth"], np.float64)
    # both recover plane-exact t in f32; independent rounding of the two dot
    # products leaves ~1e-6-scale differences at room scale
    assert np.max(np.abs(d14 - dlg)) < 1e-4

    r14 = np.asarray(out_v14["rgb"], np.int32)
    rlg = np.asarray(out_legacy["rgb"], np.int32)
    assert np.max(np.abs(r14 - rlg)) <= 1  # u8 quantization of identical shade

    assert (
        np.asarray(out_v14["semantic"]) == np.asarray(out_legacy["semantic"])
    ).all()


def test_attr16_nv0_slot_contract(setup):
    """The layout marker (ADVICE r4 low): slot ATTR16_NV0 must hold n.v0 —
    a stale/foreign attr16 array would silently produce a plane through the
    world origin."""
    pack = setup[0]
    a16 = np.asarray(pack.tri_attr16[0])
    valid = np.asarray(pack.tri_valid[0])
    n = a16[:, 0:3]
    v0 = a16[:, 8:11]
    nv0 = np.sum(n * v0, axis=-1)
    assert np.allclose(a16[valid, ATTR16_NV0], nv0[valid], atol=1e-5)
    # valid triangles in this scene have non-degenerate plane rows
    assert np.abs(a16[valid, ATTR16_NV0]).max() > 0


def _box_dynamic(N, center, half):
    """Per-env dynamic box geometry (12 tris) like the rearrange env emits."""
    c = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32
    ) * np.asarray(half, np.float32) + np.asarray(center, np.float32)
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]],
        np.int64,
    )
    tri = c[faces]  # (12,3,3)
    v0 = np.broadcast_to(tri[:, 0], (N, 12, 3)).copy()
    e1 = np.broadcast_to(tri[:, 1] - tri[:, 0], (N, 12, 3)).copy()
    e2 = np.broadcast_to(tri[:, 2] - tri[:, 0], (N, 12, 3)).copy()
    return {
        "v0": jnp.asarray(v0),
        "e1": jnp.asarray(e1),
        "e2": jnp.asarray(e2),
        "valid": jnp.ones((N, 12), bool),
        "color": jnp.broadcast_to(
            jnp.asarray([0.9, 0.2, 0.1], jnp.float32), (N, 12, 3)
        ),
        "sem": jnp.full((N, 12), 7, jnp.int32),
    }


def test_v14_epilogue_with_dynamic_matches_legacy(setup):
    """Round 5: the dynamic-geometry pass merges inside the channel-major
    epilogue (previously dynamic dropped the whole render to the legacy
    path). Parity vs the legacy epilogue with the same dynamic boxes."""
    pack, sids, pos, yaw, pitch, (N, H, W) = setup
    cull_k = max(4, pack.tri_mat.shape[3] // 128 // 4)
    # a box floating right in front of the first camera's general area
    dyn = _box_dynamic(N, center=np.asarray(pos)[0] + [0.0, 0.2, 0.6],
                       half=[0.3, 0.3, 0.3])

    with pltpu.force_tpu_interpret_mode():
        out_v14 = render_batch(
            pack, sids, pos, yaw, pitch, height=H, width=W,
            backend="pallas", cull_k=cull_k, dynamic=dyn,
        )
        out_legacy = render_batch(
            dataclasses.replace(pack, tri_attr16=None), sids, pos, yaw,
            pitch, height=H, width=W, backend="pallas", cull_k=cull_k,
            dynamic=dyn,
        )

    sem14 = np.asarray(out_v14["semantic"])
    semlg = np.asarray(out_legacy["semantic"])
    assert (sem14 == 7).any(), "dynamic box not visible in v14 render"
    assert (sem14 == semlg).mean() > 0.995  # boundary lanes may differ by
    # one pixel where static t (plane-exact vs kernel) crosses dynamic t
    d14 = np.asarray(out_v14["depth"], np.float64)
    dlg = np.asarray(out_legacy["depth"], np.float64)
    agree = np.abs(d14 - dlg) < 1e-3
    assert agree.mean() > 0.995
    r14 = np.asarray(out_v14["rgb"], np.int32)
    rlg = np.asarray(out_legacy["rgb"], np.int32)
    assert (np.abs(r14 - rlg) <= 1).mean() > 0.995
