"""HITL driver loop (reference habitat-hitl/habitat_hitl/core/hitl_main.py +
_internal/lab_driver.py): glue config → env → AppState at a target SPS.

This engine is headless (no GL window): frames render through the TPU
raycaster; the loop records video and/or serves frames+keyframes to a remote
client over websockets (reference _internal/networking/networking_process.py
— same JSON keyframe wire idea, Unity/VR client compatible at the transport
level). The 30 SPS interactive target (habitat-hitl/README.md:28) is paced by
the driver.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from habitat_tpu.core.logging import logger
from habitat_tpu.hitl.app_states import (
    AppService,
    AppState,
    DebugLineRender,
    GuiInput,
    TextDrawer,
)


def make_keyframe(sim, obs: Dict[str, np.ndarray], step: int) -> Dict[str, Any]:
    """gfx-replay-style keyframe (reference keyframe wire format,
    _internal/networking/keyframe_utils.py): agent pose + OBJECT states +
    articulation joint states + grasp state, no mesh payload — enough for a
    remote client to replay a full rearrange episode."""
    dev_state = getattr(sim, "_state", None)
    if dev_state is None:
        dev_state = getattr(sim, "state", None)
    if hasattr(sim, "get_agent_state"):
        state = sim.get_agent_state()
        position, rotation = state.position, np.atleast_1d(state.rotation)
    elif dev_state is not None:
        # host Env wraps a 1-env BatchedEnv: read lane 0 of the device state
        position = np.asarray(dev_state.pos[0])
        rotation = np.atleast_1d(np.asarray(dev_state.yaw[0]))
    else:
        position, rotation = np.zeros(3), np.zeros(1)
    kf: Dict[str, Any] = {
        "step": step,
        # wire id the client echoes back as recentServerKeyframeId
        # (reference keyframe_utils.get_empty_keyframe / networking ack)
        "id": step,
        "agent": {
            "position": [float(x) for x in position],
            "rotation": [float(x) for x in rotation],
        },
    }
    if dev_state is not None:
        if hasattr(dev_state, "obj_pos"):
            kf["objects"] = [
                {"id": i, "position": [float(x) for x in p]}
                for i, p in enumerate(np.asarray(dev_state.obj_pos[0]))
            ]
        if hasattr(dev_state, "art_q"):
            kf["articulations"] = [
                float(q) for q in np.asarray(dev_state.art_q[0])
            ]
        if hasattr(dev_state, "held"):
            kf["held_object"] = int(np.asarray(dev_state.held[0]))
        if hasattr(dev_state, "joints"):
            kf["joints"] = [float(q) for q in np.asarray(dev_state.joints[0])]
        if hasattr(dev_state, "human_pos"):
            kf["humanoid"] = {
                "position": [float(x) for x in np.asarray(dev_state.human_pos[0])],
                "rotation": [float(np.asarray(dev_state.human_yaw[0]))],
            }
    return kf


def project_to_pixels(
    pts: np.ndarray,
    cam_pos: np.ndarray,
    yaw: float,
    pitch: float,
    h: int,
    w: int,
    hfov_rad: float = np.pi / 2,
):
    """World points -> (row, col) pixel coords + visibility mask under the
    renderer's pinhole model (utils/geometry.camera_rays conventions: camera
    at cam_pos, looks along -z at yaw=0, pitch about camera +x)."""
    d = np.asarray(pts, np.float64) - np.asarray(cam_pos, np.float64)
    cyw, syw = np.cos(yaw), np.sin(yaw)
    # inverse yaw (about +y), then inverse pitch (about +x)
    x = cyw * d[..., 0] - syw * d[..., 2]
    z1 = syw * d[..., 0] + cyw * d[..., 2]
    cp, sp = np.cos(pitch), np.sin(pitch)
    y = cp * d[..., 1] + sp * z1
    z = -sp * d[..., 1] + cp * z1
    vis = z < -1e-6
    zs = np.where(vis, z, -1.0)
    fx = np.tan(hfov_rad / 2.0)
    aspect = h / w
    xn = x / (-zs)
    yn = y / (-zs)
    col = (xn / fx + 1.0) * (w - 1) / 2.0
    row = (1.0 - yn / (fx * aspect)) * (h - 1) / 2.0
    return row, col, vis


def composite_lines(
    frame: np.ndarray,
    lines,
    cam_pos: np.ndarray,
    yaw: float,
    pitch: float,
    samples: int = 64,
) -> np.ndarray:
    """Rasterize accumulated DebugLineRender segments into an (H,W,3) RGB
    frame (the reference draws them via GL into the viewport; headless here,
    so they land in the recorded video/eval frames)."""
    if not lines:
        return frame
    out = np.array(frame)
    h, w = out.shape[:2]
    t = np.linspace(0.0, 1.0, samples)[:, None]
    for a, b, color in lines:
        pts = np.asarray(a)[None] * (1 - t) + np.asarray(b)[None] * t
        row, col, vis = project_to_pixels(pts, cam_pos, yaw, pitch, h, w)
        ri = np.round(row).astype(int)
        ci = np.round(col).astype(int)
        ok = vis & (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
        out[ri[ok], ci[ok]] = np.asarray(color, out.dtype)
    return out


class HitlDriver:
    """reference _internal/lab_driver.py / sim_driver.py."""

    def __init__(
        self,
        app_state: AppState,
        env=None,
        target_sps: float = 30.0,
        record_video: bool = True,
    ):
        if env is None:
            from habitat_tpu.sims.tpu_sim import TpuSim

            env = TpuSim(None)
        self._env = env
        self._sim = getattr(env, "sim", env)
        self.app_state = app_state
        self.target_sps = target_sps
        self.record_video = record_video
        self.gui_input = GuiInput()
        self._obs = None
        self.service = AppService(
            config=None,
            env=env,
            sim=self._sim,
            gui_input=self.gui_input,
            line_render=DebugLineRender(),
            text_drawer=TextDrawer(),
            get_observations=lambda: self._obs,
        )
        self.keyframes: List[Dict[str, Any]] = []
        self._step = 0

    def reset(self):
        self._obs = self._env.reset()
        self.app_state.on_environment_reset(None)

    def step(self, dt: float) -> Dict[str, Any]:
        post: Dict[str, Any] = {}
        self.app_state.sim_update(dt, post)
        if "action" in post:
            self._obs = self._env.step(post["action"])
        kf = make_keyframe(self._env, self._obs, self._step)
        # text HUD rides the keyframe message channel (reference keyframes
        # carry a message dict for the client UI)
        if self.service.text_drawer.texts:
            kf["message"] = {"texts": list(self.service.text_drawer.texts)}
        self.keyframes.append(kf)
        if self.record_video and self._obs is not None and "rgb" in self._obs:
            frame = np.asarray(self._obs["rgb"])
            lines = self.service.line_render.lines
            if lines:
                # composite debug lines through the sim camera (pos + 1.25m
                # head height, current yaw/pitch — TpuSim render model)
                sim = self._sim
                pos = np.asarray(getattr(sim, "_pos", np.zeros(3)))
                frame = composite_lines(
                    frame,
                    lines,
                    pos + np.array([0.0, 1.25, 0.0]),
                    float(getattr(sim, "_yaw", 0.0)),
                    float(getattr(sim, "_pitch", 0.0)),
                )
            self.service.video_frames.append(frame)
        self.service.line_render.clear()
        self.service.text_drawer.clear()
        self.gui_input.on_frame_end()
        self._step += 1
        return post

    def run(self, max_steps: int = 300) -> None:
        self.reset()
        frame_time = 1.0 / self.target_sps
        for _ in range(max_steps):
            t0 = time.time()
            post = self.step(frame_time)
            if post.get("application_exit", False):
                break
            elapsed = time.time() - t0
            if elapsed < frame_time:
                time.sleep(frame_time - elapsed)

    def save_video(self, output_dir: str, name: str = "hitl_session") -> None:
        if self.service.video_frames:
            from habitat_tpu.utils.visualizations.utils import images_to_video

            images_to_video(self.service.video_frames, output_dir, name, fps=int(self.target_sps))

    def export_keyframes(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"keyframes": self.keyframes}, f)


def hitl_main(config, create_app_state_lambda: Callable, max_steps: int = 300):
    """Entry point (reference hitl_main.py): builds the env from config and
    runs the driver."""
    from habitat_tpu.sims.tpu_sim import TpuSim

    app_state = create_app_state_lambda(None)
    driver = HitlDriver(app_state, env=TpuSim(None))
    driver.run(max_steps=max_steps)
    return driver


class RemoteClientState:
    """Latest state received from a remote client (reference
    _internal/networking/remote_client_state.py): head/hand poses for VR
    avatars, pointer ray, and the per-frame input event history."""

    HISTORY_LEN = 32

    def __init__(self):
        self.head_pose: Optional[Dict[str, Any]] = None
        self.hand_poses: List[Dict[str, Any]] = []
        self.pointer: Optional[Dict[str, Any]] = None
        self.connected: bool = False
        self.recent_events: List[Dict[str, Any]] = []
        # newest-server-keyframe id the client has acknowledged receiving
        # (reference get_recent_server_keyframe_id; the wire key is
        # recentServerKeyframeId) — lets the server measure client lag and
        # garbage-collect its keyframe backlog
        self.recent_server_keyframe_id: Optional[int] = None

    def update(self, msg: Dict[str, Any]) -> None:
        self.connected = True
        if "avatar" in msg:
            av = msg["avatar"]
            self.head_pose = av.get("root")
            self.hand_poses = av.get("hands", [])
        if "pointer" in msg:
            self.pointer = msg["pointer"]
        if "recentServerKeyframeId" in msg:
            self.recent_server_keyframe_id = int(msg["recentServerKeyframeId"])
        self.recent_events.append(msg)
        del self.recent_events[: -self.HISTORY_LEN]

    # history accessors (reference remote_client_state.py:128-175;
    # single-user here — the reference indexes per user)
    def get_history_length(self) -> int:
        return len(self.recent_events)

    def get_recent_client_state_by_history_index(
        self, history_index: int = 0
    ) -> Optional[Dict[str, Any]]:
        if history_index >= len(self.recent_events):
            return None
        return self.recent_events[-(1 + history_index)]

    def get_head_pose(self, history_index: int = 0) -> Optional[Dict[str, Any]]:
        cs = self.get_recent_client_state_by_history_index(history_index)
        if not cs or "avatar" not in cs:
            return None
        return cs["avatar"].get("root")


class BaselinesController:
    """Policy-driven GUI agent (reference environment/controllers/
    baselines_controller.py): runs a trained policy for one agent inside the
    HITL loop while the human drives another (or observes)."""

    def __init__(self, policy, params, num_envs: int = 1, deterministic: bool = True):
        import jax
        import jax.numpy as jnp

        from habitat_tpu.models.policy import sample_action
        from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

        self.policy = policy
        self.params = params
        self.deterministic = deterministic
        net = policy.net
        self._hidden = initial_hidden_state(
            num_envs, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        self._prev_a = jnp.zeros((num_envs,), jnp.int32)
        self._not_done = jnp.zeros((num_envs,), jnp.float32)
        self._key = jax.random.PRNGKey(0)

        def _act(params, obs, hidden, prev_a, not_done, key):
            logits, _, new_hidden = policy.apply(params, obs, hidden, prev_a, not_done)
            a, _ = sample_action(logits, key, deterministic=deterministic)
            return a, new_hidden

        self._act = jax.jit(_act)

    def act(self, obs: Dict[str, Any]):
        import jax
        import jax.numpy as jnp

        obs_b = {
            k: jnp.asarray(v)[None] if np.asarray(v).ndim < 2 or k not in ("rgb", "depth")
            else jnp.asarray(v)[None]
            for k, v in obs.items()
        }
        self._key, k = jax.random.split(self._key)
        a, self._hidden = self._act(
            self.params, obs_b, self._hidden, self._prev_a, self._not_done, k
        )
        self._prev_a = a
        self._not_done = jnp.ones_like(self._not_done)
        return int(np.asarray(a)[0])

    def on_environment_reset(self):
        import jax.numpy as jnp

        self._not_done = jnp.zeros_like(self._not_done)


# -- networking (reference _internal/networking/networking_process.py) -----


class NetworkingServer:
    """Websocket keyframe server for remote (e.g. Unity VR) clients.

    Serves JSON keyframes and receives client input events; the transport
    mirrors the reference's wire model. Requires the ``websockets`` package
    (present in this image); the server runs in a background thread.
    """

    def __init__(
        self,
        driver: HitlDriver,
        host: str = "127.0.0.1",
        port: int = 8888,
        unity: bool = False,
    ):
        self.driver = driver
        self.host = host
        self.port = port
        self.unity = unity  # speak the Unity/VR gfx-replay wire schema
        self._thread = None
        self._stop = False
        self.client_state = RemoteClientState()
        self.client_lag = 0  # keyframes sent but not yet acked
        # multi-user input routing (reference habitat_hitl.core.user_mask
        # Users/Mask: each connection owns a user index and its own input
        # lane; rearrange_v2-style apps read per-user GuiInput here while
        # single-user apps keep the merged driver.gui_input)
        self.user_inputs: Dict[int, "GuiInput"] = {}
        self.connection_records: Dict[int, Dict[str, Any]] = {}
        self._next_user = 0

    def start(self):
        import asyncio
        import threading

        import websockets

        async def handler(ws):
            from habitat_tpu.hitl.unity_protocol import (
                UnitySession,
                parse_client_state,
            )

            from habitat_tpu.hitl.unity_protocol import (
                get_empty_keyframe,
                update_consolidated_keyframe,
            )

            idx = 0
            # per-connection user lane (multi-user apps route input by it)
            from habitat_tpu.hitl.app_states import GuiInput as _GI

            user_idx = self._next_user
            self._next_user += 1
            self.user_inputs[user_idx] = _GI()
            self.connection_records[user_idx] = {"connection_id": user_idx}
            # Unity clients get the gfx-replay schema with the late-joiner
            # consolidated-first-keyframe rule; a session ingests EVERY
            # driver keyframe (including those before this connection).
            session = UnitySession() if self.unity else None
            # Per-connection flow control (reference
            # is_okay_to_send_keyframes): once the client falls more than
            # MAX_LAG keyframes behind its last recentServerKeyframeId ack,
            # incrementals are coalesced into a catch-up keyframe instead of
            # growing an unbounded send backlog.
            MAX_LAG = 20
            conn_ack = None  # latest ack from THIS client
            sent_hwm = -1  # highest keyframe id sent on this connection
            catchup = None  # coalesced keyframe accumulated while blocked
            while not self._stop:
                kfs = self.driver.keyframes[idx:]
                idx = len(self.driver.keyframes)
                if session is not None:
                    inc = [session.ingest(kf) for kf in kfs]
                    blocked = (
                        conn_ack is not None and sent_hwm - conn_ack > MAX_LAG
                    )
                    if blocked and not session.needs_consolidated_keyframe:
                        if inc:
                            if catchup is None:
                                catchup = get_empty_keyframe()
                            for kf in inc:
                                update_consolidated_keyframe(catchup, kf)
                    else:
                        if catchup is not None or len(inc) > MAX_LAG:
                            # coalesce the backlog (post-block catch-up OR an
                            # oversized per-poll burst) into one keyframe:
                            # the client needs creations + latest state, not
                            # every intermediate pose
                            ck = catchup or get_empty_keyframe()
                            for kf in inc:
                                update_consolidated_keyframe(ck, kf)
                            inc, catchup = [ck], None
                        if inc or session.needs_consolidated_keyframe:
                            payload = session.payload_for_send(inc)
                            for kf in payload["keyframes"]:
                                sent_hwm = max(sent_hwm, kf.get("id", -1))
                            await ws.send(json.dumps(payload))
                elif kfs:
                    for kf in kfs:
                        sent_hwm = max(sent_hwm, kf.get("id", -1))
                    await ws.send(json.dumps({"keyframes": kfs}))
                try:
                    msg = await asyncio.wait_for(ws.recv(), timeout=0.03)
                    data = json.loads(msg)
                    for key in data.get("keys_down", []):
                        self.driver.gui_input.press(key)
                        self.user_inputs[user_idx].press(key)
                    for key in data.get("keys_up", []):
                        self.driver.gui_input.release(key)
                        self.user_inputs[user_idx].release(key)
                    # Unity client-state schema: input buttons ride
                    # data["input"] (reference remote_client_state.py:274)
                    _, _, inp = parse_client_state(data)
                    if inp:
                        for key in inp.get("buttonDown", []):
                            self.driver.gui_input.press(key)
                            self.user_inputs[user_idx].press(key)
                        for key in inp.get("buttonUp", []):
                            self.driver.gui_input.release(key)
                            self.user_inputs[user_idx].release(key)
                    # client->server state channel (avatar poses, pointer,
                    # keyframe ack — reference remote_client_state.py)
                    self.client_state.update(data)
                    ack = self.client_state.recent_server_keyframe_id
                    if ack is not None:
                        conn_ack = ack
                        self.client_lag = len(self.driver.keyframes) - 1 - ack
                except Exception:
                    pass

        async def main():
            import websockets

            async with websockets.serve(handler, self.host, self.port):
                while not self._stop:
                    await asyncio.sleep(0.1)

        def run():
            import asyncio

            asyncio.run(main())

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        logger.info(f"HITL networking server on ws://{self.host}:{self.port}")

    def stop(self):
        self._stop = True
