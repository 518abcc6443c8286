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
    _internal/networking/keyframe_utils.py): poses + state, no mesh payload."""
    if hasattr(sim, "get_agent_state"):
        state = sim.get_agent_state()
        position, rotation = state.position, np.atleast_1d(state.rotation)
    elif getattr(sim, "_state", None) is not None:
        # host Env wraps a 1-env BatchedEnv: read lane 0 of the device state
        position = np.asarray(sim._state.pos[0])
        rotation = np.atleast_1d(np.asarray(sim._state.yaw[0]))
    else:
        position, rotation = np.zeros(3), np.zeros(1)
    kf: Dict[str, Any] = {
        "step": step,
        "agent": {
            "position": [float(x) for x in position],
            "rotation": [float(x) for x in rotation],
        },
    }
    return kf


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
        self.keyframes.append(make_keyframe(self._env, self._obs, self._step))
        if self.record_video and self._obs is not None and "rgb" in self._obs:
            self.service.video_frames.append(np.asarray(self._obs["rgb"]))
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


# -- networking (reference _internal/networking/networking_process.py) -----


class NetworkingServer:
    """Websocket keyframe server for remote (e.g. Unity VR) clients.

    Serves JSON keyframes and receives client input events; the transport
    mirrors the reference's wire model. Requires the ``websockets`` package
    (present in this image); the server runs in a background thread.
    """

    def __init__(self, driver: HitlDriver, host: str = "127.0.0.1", port: int = 8888):
        self.driver = driver
        self.host = host
        self.port = port
        self._thread = None
        self._stop = False

    def start(self):
        import asyncio
        import threading

        import websockets

        async def handler(ws):
            idx = 0
            while not self._stop:
                kfs = self.driver.keyframes[idx:]
                idx = len(self.driver.keyframes)
                if kfs:
                    await ws.send(json.dumps({"keyframes": kfs}))
                try:
                    msg = await asyncio.wait_for(ws.recv(), timeout=0.03)
                    data = json.loads(msg)
                    for key in data.get("keys_down", []):
                        self.driver.gui_input.press(key)
                    for key in data.get("keys_up", []):
                        self.driver.gui_input.release(key)
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
