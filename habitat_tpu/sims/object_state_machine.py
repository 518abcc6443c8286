"""Discrete object states (reference habitat-lab/habitat/sims/
habitat_simulator/object_state_machine.py:1-353: extensible states like
clean/dirty, powered on/off stored in object metadata; actions flip them).

Batched redesign: each state spec is a named boolean channel over all objects
of all envs — one (N, O) array per spec in a dict pytree, updated inside jit.
Host-facing ObjectStateMachine mirrors the reference's API for single-env use.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass
class ObjectStateSpec:
    """reference ObjectStateSpec: name + accepted values + default."""

    name: str
    default_value: bool = False
    accepted_semantic_classes: tuple = ()

    def is_affordance_of(self, semantic_class: int) -> bool:
        return (
            not self.accepted_semantic_classes
            or semantic_class in self.accepted_semantic_classes
        )


class BooleanObjectState(ObjectStateSpec):
    """reference BooleanObjectState."""


def init_state_channels(
    specs: List[ObjectStateSpec], num_envs: int, num_objects: int
) -> Dict[str, jnp.ndarray]:
    """Batched state: name -> (N, O) bool."""
    return {
        s.name: jnp.full((num_envs, num_objects), s.default_value)
        for s in specs
    }


def set_state(
    channels: Dict[str, jnp.ndarray], name: str, env_mask: jnp.ndarray, obj_idx: jnp.ndarray, value: bool
) -> Dict[str, jnp.ndarray]:
    """Flip spec ``name`` for (env, object) pairs where env_mask holds."""
    ch = channels[name]
    n_idx = jnp.arange(ch.shape[0])
    updated = ch.at[n_idx, obj_idx].set(
        jnp.where(env_mask, value, ch[n_idx, obj_idx])
    )
    return {**channels, name: updated}


class ObjectStateMachine:
    """Host-facing single-env mirror of the reference class."""

    def __init__(self, specs: Optional[List[ObjectStateSpec]] = None):
        self.active_states: List[ObjectStateSpec] = list(specs or [])
        self.objects_with_states: Dict[str, Dict[str, bool]] = {}

    def register_object(self, handle: str, semantic_class: int = 0) -> None:
        self.objects_with_states[handle] = {
            s.name: s.default_value
            for s in self.active_states
            if s.is_affordance_of(semantic_class)
        }

    def set_state(self, handle: str, name: str, value: bool) -> None:
        self.objects_with_states[handle][name] = value

    def get_state(self, handle: str, name: str) -> bool:
        return self.objects_with_states[handle][name]

    def get_snapshot_dict(self) -> Dict[str, Dict[str, bool]]:
        """reference get_state_of_objs snapshot for episode metadata."""
        return {h: dict(s) for h, s in self.objects_with_states.items()}
