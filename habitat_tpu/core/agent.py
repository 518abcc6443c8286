"""Agent ABC (reference habitat-lab/habitat/core/agent.py)."""

from __future__ import annotations

from typing import Any, Dict, Union


class Agent:
    def reset(self) -> None:
        raise NotImplementedError

    def act(self, observations) -> Union[int, str, Dict[str, Any]]:
        raise NotImplementedError
