"""Unity/VR wire protocol (reference habitat-hitl keyframe_utils.py +
networking_process.py + remote_client_state.py) — schema conversion,
consolidation semantics, late-joiner behavior, client-state parsing."""

import numpy as np

from habitat_tpu.hitl.unity_protocol import (
    AVATAR_KEY,
    OBJECT_KEY_BASE,
    UnitySession,
    get_empty_keyframe,
    get_user_keyframe,
    parse_client_state,
    to_gfx_keyframe,
    update_consolidated_keyframe,
    wrap_keyframes,
)


def _internal_kf(step=0, agent_pos=(1.0, 0.0, 2.0), yaw=0.5, objs=()):
    return {
        "step": step,
        "id": step,
        "agent": {"position": list(agent_pos), "rotation": [yaw]},
        "objects": [
            {"id": i, "position": list(p)} for i, p in enumerate(objs)
        ],
    }


def test_to_gfx_keyframe_schema():
    kf = to_gfx_keyframe(_internal_kf(objs=[(0, 0, 0), (1, 1, 1)]), first=True)
    # first frame: creations for avatar + both objects
    keys = [c["instanceKey"] for c in kf["creations"]]
    assert AVATAR_KEY in keys and OBJECT_KEY_BASE in keys and OBJECT_KEY_BASE + 1 in keys
    for c in kf["creations"]:
        assert "filepath" in c["creation"]
    # stateUpdates carry absTransform with translation + wxyz quaternion
    su = {u["instanceKey"]: u["state"] for u in kf["stateUpdates"]}
    at = su[AVATAR_KEY]["absTransform"]
    assert at["translation"] == [1.0, 0.0, 2.0]
    q = at["rotation"]
    assert len(q) == 4
    # quaternion about +y for yaw=0.5
    np.testing.assert_allclose(q[0], np.cos(0.25), atol=1e-6)
    np.testing.assert_allclose(q[2], np.sin(0.25), atol=1e-6)
    # subsequent frames: no creations
    kf2 = to_gfx_keyframe(_internal_kf(step=1), first=False)
    assert "creations" not in kf2


def test_consolidation_merges_state_updates_by_key():
    con = get_empty_keyframe()
    a = to_gfx_keyframe(_internal_kf(agent_pos=(0, 0, 0), objs=[(5, 0, 5)]), first=True)
    b = to_gfx_keyframe(_internal_kf(step=1, agent_pos=(9, 0, 9), objs=[(6, 0, 6)]))
    update_consolidated_keyframe(con, a)
    update_consolidated_keyframe(con, b)
    # one stateUpdate per instanceKey, holding the LATEST state
    keys = [u["instanceKey"] for u in con["stateUpdates"]]
    assert sorted(keys) == sorted(set(keys))
    su = {u["instanceKey"]: u["state"] for u in con["stateUpdates"]}
    assert su[AVATAR_KEY]["absTransform"]["translation"] == [9.0, 0.0, 9.0]
    assert su[OBJECT_KEY_BASE]["absTransform"]["translation"] == [6.0, 0.0, 6.0]
    # creations accumulated once
    assert len(con["creations"]) == 2


def test_consolidation_deletion_cancels_creation():
    """create->delete leaves neither creation nor stateUpdates (the
    reference's anti-bloat rule, keyframe_utils.py:95-123)."""
    con = get_empty_keyframe()
    update_consolidated_keyframe(
        con, to_gfx_keyframe(_internal_kf(objs=[(1, 1, 1)]), first=True)
    )
    update_consolidated_keyframe(con, {"deletions": [OBJECT_KEY_BASE]})
    assert OBJECT_KEY_BASE not in [c["instanceKey"] for c in con["creations"]]
    assert OBJECT_KEY_BASE not in [u["instanceKey"] for u in con["stateUpdates"]]
    # the matched deletion is NOT re-emitted
    assert OBJECT_KEY_BASE not in con.get("deletions", [])
    # an unmatched deletion IS carried through
    update_consolidated_keyframe(con, {"deletions": [999]})
    assert 999 in con["deletions"]


def test_late_joiner_gets_consolidated_keyframe_only():
    session = UnitySession()
    kf1 = session.ingest(_internal_kf(agent_pos=(1, 0, 1), objs=[(2, 0, 2)]))
    kf2 = session.ingest(_internal_kf(step=1, agent_pos=(3, 0, 3), objs=[(4, 0, 4)]))
    # client connects "late": the first payload is the consolidated keyframe
    # ALONE — ingest already folded kf1/kf2 into it, so sending them again
    # would double-apply creations and rewind state (ADVICE round-2 high)
    payload = session.payload_for_send([kf1, kf2], message={"serverTime": 1.0})
    kfs = payload["keyframes"]
    assert len(kfs) == 1
    first = kfs[0]
    su = {u["instanceKey"]: u["state"] for u in first["stateUpdates"]}
    assert su[AVATAR_KEY]["absTransform"]["translation"] == [3.0, 0.0, 3.0]
    # exactly ONE creation per instanceKey in the consolidated keyframe
    keys = [c["instanceKey"] for c in first["creations"]]
    assert len(keys) == len(set(keys))
    # the per-user message still reaches the late joiner
    assert first["message"] == {"serverTime": 1.0}
    # subsequent sends: incrementals, no consolidated prefix
    kf3 = session.ingest(_internal_kf(step=2))
    payload2 = session.payload_for_send([kf3], message={"serverTime": 2.0})
    assert len(payload2["keyframes"]) == 1
    assert "creations" not in payload2["keyframes"][0]
    assert payload2["keyframes"][0]["message"] == {"serverTime": 2.0}


def test_message_channel_carried_through():
    """hitl_main.make_keyframe attaches kf["message"] (text HUD); Unity
    clients must receive it (ADVICE round-2 low)."""
    internal = _internal_kf()
    internal["message"] = {"texts": [["hello", [1, 1, 1, 1]]]}
    kf = to_gfx_keyframe(internal)
    assert kf["message"] == {"texts": [["hello", [1, 1, 1, 1]]]}
    # survives get_user_keyframe with no explicit message
    assert get_user_keyframe(kf, None)["message"] == kf["message"]


def test_object_rotation_normalized_like_agent():
    """Object rotations route through the same yaw/xyzw->wxyz normalization
    as the agent lane (ADVICE round-2 low)."""
    yaw = 0.8
    xyzw = [0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)]
    kf = to_gfx_keyframe(
        {
            "objects": [
                {"id": 0, "position": [1, 0, 1], "rotation": xyzw},
                {"id": 1, "position": [2, 0, 2], "rotation": [yaw]},
                {"id": 2, "position": [3, 0, 3]},
            ]
        }
    )
    rots = [
        u["state"]["absTransform"]["rotation"] for u in kf["stateUpdates"]
    ]
    np.testing.assert_allclose(rots[0], _yaw_quat_wxyz_expected(yaw), atol=1e-6)
    np.testing.assert_allclose(rots[1], _yaw_quat_wxyz_expected(yaw), atol=1e-6)
    assert rots[2] == [1.0, 0.0, 0.0, 0.0]


def test_keyframe_id_propagates_to_wire_and_consolidated():
    internal = _internal_kf()
    internal["id"] = 41
    session = UnitySession()
    kf = session.ingest(internal)
    assert kf["id"] == 41
    assert session.consolidated["id"] == 41


def test_parse_client_state():
    ack, avatar, inp = parse_client_state(
        {
            "recentServerKeyframeId": 7,
            "avatar": {
                "root": {"position": [1, 2, 3], "rotation": [1, 0, 0, 0]},
                "hands": [
                    {"position": [0, 1, 0], "rotation": [1, 0, 0, 0]},
                    {"position": [0, 1, 1], "rotation": [1, 0, 0, 0]},
                ],
            },
            "input": {"buttonDown": ["0"], "buttonUp": [], "buttonHeld": ["2"]},
        }
    )
    assert ack == 7
    assert avatar["root"]["position"] == [1, 2, 3]
    assert len(avatar["hands"]) == 2
    assert inp["buttonDown"] == ["0"] and inp["buttonHeld"] == ["2"]
    ack2, avatar2, inp2 = parse_client_state({})
    assert ack2 is None and avatar2 is None and inp2 is None


def test_wrap_and_user_keyframe():
    kf = to_gfx_keyframe(_internal_kf())
    wire = wrap_keyframes([get_user_keyframe(kf, {"sceneChanged": True})])
    assert list(wire.keys()) == ["keyframes"]
    assert wire["keyframes"][0]["message"] == {"sceneChanged": True}
    # no-message path leaves the keyframe untouched
    assert "message" not in get_user_keyframe(kf, None)


def test_xyzw_agent_quaternion_reordered_to_wxyz():
    """TpuSim agent rotation is [x,y,z,w] (tpu_sim.py:218); the Unity wire
    carries [w,x,y,z]."""
    yaw = 0.8
    kf = to_gfx_keyframe(
        {
            "agent": {
                "position": [0, 0, 0],
                "rotation": [0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)],
            }
        }
    )
    q = kf["stateUpdates"][0]["state"]["absTransform"]["rotation"]
    np.testing.assert_allclose(q, _yaw_quat_wxyz_expected(yaw), atol=1e-6)


def _yaw_quat_wxyz_expected(yaw):
    return [np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0]
