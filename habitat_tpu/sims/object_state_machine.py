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
    """reference ObjectStateSpec (object_state_machine.py:70): unique name,
    accepted semantic classes, default value, and an update hook."""

    name: str
    default_value: bool = False
    accepted_semantic_classes: tuple = ()

    def is_affordance_of(self, semantic_class: int) -> bool:
        return (
            not self.accepted_semantic_classes
            or semantic_class in self.accepted_semantic_classes
        )

    def update_state_context(self, sim) -> None:
        """Per-frame global context refresh hook (reference :108)."""

    def update_state(self, sim, handle: str, value, dt: float):
        """Time-driven state dynamics hook (reference :115); returns the new
        value (default: unchanged)."""
        return value

    def draw_state(self, value):
        """Visual annotation for DebugVisualizer overlays (reference :148):
        returns an RGB color for draw_object_highlight."""
        return (0, 255, 0) if value else (255, 0, 0)


class BooleanObjectState(ObjectStateSpec):
    """reference BooleanObjectState (:163): boolean-valued spec + toggle."""

    def toggle(self, machine: "ObjectStateMachine", handle: str) -> bool:
        new = not machine.get_state(handle, self.name)
        machine.set_state(handle, self.name, new)
        return new


class ObjectIsClean(BooleanObjectState):
    """reference ObjectIsClean (:223) — clean/dirty channel."""

    def __init__(self):
        super().__init__(name="is_clean", default_value=False)


class ObjectIsPoweredOn(BooleanObjectState):
    """reference ObjectIsPoweredOn (:238) — default powered off."""

    def __init__(self):
        super().__init__(name="is_powered_on", default_value=False)


def get_state_of_obj(machine: "ObjectStateMachine", handle: str, state_name: str):
    """reference get_state_of_obj (:27) — None when the object/state is
    unknown (metadata lives on the machine, not in Magnum user_attributes)."""
    return machine.objects_with_states.get(handle, {}).get(state_name)


def set_state_of_obj(
    machine: "ObjectStateMachine", handle: str, state_name: str, value
) -> None:
    """reference set_state_of_obj (:46)."""
    machine.objects_with_states.setdefault(handle, {})[state_name] = value


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

    def initialize_object_state_map(self, handles_with_classes) -> None:
        """Register every (handle, semantic_class) pair (reference :273)."""
        self.objects_with_states = {}
        for handle, sem in handles_with_classes:
            self.register_object(handle, sem)

    def update_states(self, sim=None, dt: float = 0.0) -> None:
        """Per-frame driver (reference update_states:302): refresh each
        spec's context once, then run its update hook on every registered
        object that carries the state."""
        for spec in self.active_states:
            spec.update_state_context(sim)
        for spec in self.active_states:
            for handle, states in self.objects_with_states.items():
                if spec.name in states:
                    states[spec.name] = spec.update_state(
                        sim, handle, states[spec.name], dt
                    )

    def get_snapshot_dict(self) -> Dict[str, Dict[str, bool]]:
        """reference get_snapshot_dict (:320): state -> {handle: value},
        grouped by state name for episode metadata."""
        out: Dict[str, Dict[str, bool]] = {}
        for handle, states in self.objects_with_states.items():
            for name, value in states.items():
                out.setdefault(name, {})[handle] = value
        return out
