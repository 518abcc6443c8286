"""Kinematic parent/child transform graph (reference habitat-lab/habitat/sims/
habitat_simulator/kinematic_relationship_manager.py:20 RelationshipGraph —
in kinematic mode, stacked/contained objects must follow their parents;
RearrangeSim.step applies relations each step :919-921).

Batched redesign: relations are an (N, O) int32 parent index array (-1 =
world); applying relations adds the parent's frame delta to each child —
a masked gather+add inside jit, no graph traversal (single-level parenting,
which covers grasping and resting-on relations; deep chains iterate).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp


def apply_relations(
    obj_pos: jnp.ndarray,  # (N, O, 3)
    parent: jnp.ndarray,  # (N, O) int32 — index of parent object, -1=world
    parent_delta: jnp.ndarray,  # (N, O, 3) — how much each object moved this step
    iterations: int = 2,
) -> jnp.ndarray:
    """Children follow their parents' motion (iterations handle chains).

    total_delta(obj) = own_delta + total_delta(parent); positions then move by
    the INHERITED part (callers already applied each object's own delta)."""
    safe = jnp.maximum(parent, 0)
    has_parent = (parent >= 0)[..., None]
    total = parent_delta
    for _ in range(iterations):
        inherited = jnp.take_along_axis(total, safe[..., None], axis=1)
        total = parent_delta + jnp.where(has_parent, inherited, 0.0)
    return obj_pos + (total - parent_delta)


class RelationshipGraph:
    """Host-facing mirror of the reference graph (obj -> parent with a
    relation label)."""

    def __init__(self):
        self.obj_to_parents: Dict[int, Tuple[int, str]] = {}

    def add_relation(self, child: int, parent: int, relation: str = "ontop") -> None:
        self.obj_to_parents[child] = (parent, relation)

    def remove_relation(self, child: int) -> None:
        self.obj_to_parents.pop(child, None)

    def get_parent(self, child: int) -> Optional[int]:
        entry = self.obj_to_parents.get(child)
        return entry[0] if entry else None

    def get_children(self, parent: int) -> List[int]:
        return [c for c, (p, _) in self.obj_to_parents.items() if p == parent]

    def to_parent_array(self, num_objects: int) -> np.ndarray:
        out = np.full((num_objects,), -1, np.int32)
        for c, (p, _) in self.obj_to_parents.items():
            if 0 <= c < num_objects:
                out[c] = p
        return out


class KinematicRelationshipManager:
    """reference KinematicRelationshipManager: owns the graph, recomputes
    relations from spatial predicates, applies them each step."""

    def __init__(self, num_objects: int):
        self.relationship_graph = RelationshipGraph()
        self.num_objects = num_objects

    def initialize_from_obj_state(self, centers: np.ndarray, sizes: np.ndarray) -> None:
        """Infer ontop relations from geometry (reference initialize... uses
        sim_utilities.ontop)."""
        from habitat_tpu.sims.sim_utilities import ontop

        for i in range(len(centers)):
            for j in range(len(centers)):
                if i != j and ontop(centers[i], sizes[i], centers[j], sizes[j]):
                    self.relationship_graph.add_relation(i, j, "ontop")

    def apply_relations(
        self, obj_pos: jnp.ndarray, parent_delta: jnp.ndarray
    ) -> jnp.ndarray:
        parent = jnp.asarray(
            self.relationship_graph.to_parent_array(self.num_objects)
        )[None]
        return apply_relations(obj_pos, parent, parent_delta)
