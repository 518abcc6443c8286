"""Action/observation spaces (reference: habitat-lab/habitat/core/spaces.py:1-124).

Built on gymnasium spaces; adds the reference's EmptySpace (parameterless action),
ActionSpace (dict-of-subspace actions addressable by name or index) and ListSpace.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Sized

import gymnasium as gym
from gymnasium import Space


class EmptySpace(Space):
    """A ``None``-valued space: an action that takes no arguments."""

    def sample(self, mask=None):
        return None

    def contains(self, x):
        return x is None

    def __repr__(self):
        return "EmptySpace()"


class ActionSpace(gym.spaces.Dict):
    """Dict of named sub-action spaces; sampling picks one action by index.

    Mirrors reference ``ActionSpace`` (core/spaces.py:35-90): iteration order
    defines the integer index of each action.
    """

    def __init__(self, spaces):
        if isinstance(spaces, dict):
            spaces = OrderedDict(sorted(spaces.items()))
        if isinstance(spaces, list):
            spaces = OrderedDict(spaces)
        gym.spaces.Dict.__init__(self, spaces)

    @property
    def n(self) -> int:
        return len(self.spaces)

    def sample(self, mask=None):
        action_index = gym.spaces.Discrete(len(self.spaces)).sample()
        return {
            "action": list(self.spaces.keys())[action_index],
            "action_args": list(self.spaces.values())[action_index].sample(),
        }

    def contains(self, x):
        if not isinstance(x, dict) or "action" not in x:
            return False
        if x["action"] not in self.spaces:
            return False
        if not self.spaces[x["action"]].contains(x.get("action_args", None)):
            return False
        return True

    def __repr__(self):
        return (
            "ActionSpace("
            + ", ".join([k + ":" + str(s) for k, s in self.spaces.items()])
            + ")"
        )


class ListSpace(Space):
    """Variable-length list of elements of a given space."""

    def __init__(self, space, min_seq_length: int = 0, max_seq_length: int = 1 << 15):
        self.min_seq_length = min_seq_length
        self.max_seq_length = max_seq_length
        self.space = space
        self.length_select_space = gym.spaces.Discrete(
            max_seq_length - min_seq_length
        )
        super().__init__(shape=None, dtype=None)

    def sample(self, mask=None):
        seq_length = self.length_select_space.sample() + self.min_seq_length
        return [self.space.sample() for _ in range(seq_length)]

    def contains(self, x):
        if not isinstance(x, Sized):
            return False
        if not (self.min_seq_length <= len(x) <= self.max_seq_length):
            return False
        return all(self.space.contains(el) for el in x)

    def __repr__(self):
        return (
            f"ListSpace({self.space}, min_seq_length="
            f"{self.min_seq_length}, max_seq_length={self.max_seq_length})"
        )
