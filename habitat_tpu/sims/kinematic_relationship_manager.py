"""Kinematic parent/child transform graph (reference habitat-lab/habitat/
sims/habitat_simulator/kinematic_relationship_manager.py, 486 LoC — in
kinematic mode stacked/contained objects must follow their parents;
RearrangeSim.step applies relations each step :919-921).

Parity surface:
- RelationshipGraph       — bi-directional parent/child maps + relation
  types, root parents, human-readable forest (reference :20-155)
- KinematicRelationshipManager — transform snapshots per parent, recursive
  relation snapshots, apply_relationships_snapshot (full SE(3)-relative
  application: child_new = parent_new @ parent_prev^-1 @ child_prev),
  update_snapshots, initialize_from_dynamic_ontop (reference :157-486)
- apply_relations (batched) — the in-jit form: (N, O) parent index array,
  children follow parents' frame deltas with optional yaw rotation; a
  masked gather inside jit, no graph traversal.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


# -- batched (in-jit) form ----------------------------------------------------


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


def apply_relations_rotating(
    obj_pos: jnp.ndarray,  # (N, O, 3)
    parent: jnp.ndarray,  # (N, O) int32, -1 = world
    parent_pos_prev: jnp.ndarray,  # (N, O, 3) parent positions BEFORE the step
    parent_pos_new: jnp.ndarray,  # (N, O, 3) parent positions AFTER
    parent_dyaw: jnp.ndarray,  # (N, O) parent yaw deltas this step
) -> jnp.ndarray:
    """SE(2)-relative application: each child keeps its offset in the
    PARENT frame, so a rotating parent swings its children around it
    (reference _apply_relations_recursive:358 does the full SE(3) version
    through Magnum transforms; batched yaw form covers upright rearrange
    objects)."""
    safe = jnp.maximum(parent, 0)
    has_parent = (parent >= 0)[..., None]
    p_prev = jnp.take_along_axis(parent_pos_prev, safe[..., None], axis=1)
    p_new = jnp.take_along_axis(parent_pos_new, safe[..., None], axis=1)
    dyaw = jnp.take_along_axis(parent_dyaw, safe, axis=1)
    off = obj_pos - p_prev
    c, s = jnp.cos(dyaw)[..., None], jnp.sin(dyaw)[..., None]
    off_rot = jnp.stack(
        [
            c[..., 0] * off[..., 0] + s[..., 0] * off[..., 2],
            off[..., 1],
            -s[..., 0] * off[..., 0] + c[..., 0] * off[..., 2],
        ],
        axis=-1,
    )
    return jnp.where(has_parent, p_new + off_rot, obj_pos)


# -- host-facing graph + manager ---------------------------------------------


class RelationshipGraph:
    """Bi-directional parent/child maps with relation types (reference :20)."""

    def __init__(self):
        self.obj_to_children: Dict[int, List[int]] = {}
        self.obj_to_parents: Dict[int, int] = {}
        self.relation_types: Dict[Tuple[int, int], str] = {}

    def add_relation(self, parent: int, child: int, rel_type: str = "ontop") -> None:
        assert parent != child
        if (parent, child) not in self.relation_types:
            if child in self.obj_to_parents:
                # one parent per child — re-parent (reference warns + moves)
                self.remove_relation(self.obj_to_parents[child], child)
            self.obj_to_children.setdefault(parent, []).append(child)
            self.obj_to_parents[child] = parent
        self.relation_types[(parent, child)] = rel_type

    def remove_relation(self, parent: int, child: int) -> None:
        self.relation_types.pop((parent, child), None)
        if child in self.obj_to_parents and self.obj_to_parents[child] == parent:
            del self.obj_to_parents[child]
        if parent in self.obj_to_children:
            self.obj_to_children[parent] = [
                c for c in self.obj_to_children[parent] if c != child
            ]
            if not self.obj_to_children[parent]:
                del self.obj_to_children[parent]

    def remove_obj_relations(self, obj: int, parents_only: bool = False) -> None:
        """Detach an object (reference :82 — e.g. when grasped)."""
        if obj in self.obj_to_parents:
            self.remove_relation(self.obj_to_parents[obj], obj)
        if not parents_only:
            for c in list(self.obj_to_children.get(obj, [])):
                self.remove_relation(obj, c)

    def get_parent(self, child: int) -> Optional[int]:
        return self.obj_to_parents.get(child)

    def get_children(self, parent: int) -> List[int]:
        return list(self.obj_to_children.get(parent, []))

    def get_root_parents(self) -> List[int]:
        """Parents that are not themselves children (reference :101)."""
        return [
            p for p in self.obj_to_children if p not in self.obj_to_parents
        ]

    def get_human_readable_relationship_forest(
        self, names: Optional[Dict[int, str]] = None
    ) -> List[str]:
        """Indented forest dump (reference :114)."""
        names = names or {}
        lines: List[str] = []

        def walk(obj: int, depth: int) -> None:
            label = names.get(obj, str(obj))
            rel = ""
            if obj in self.obj_to_parents:
                rel = f" [{self.relation_types[(self.obj_to_parents[obj], obj)]}]"
            lines.append("  " * depth + f"- {label}{rel}")
            for c in self.obj_to_children.get(obj, []):
                walk(c, depth + 1)

        for root in self.get_root_parents():
            walk(root, 0)
        return lines

    def to_parent_array(self, num_objects: int) -> np.ndarray:
        out = np.full((num_objects,), -1, np.int32)
        for c, p in self.obj_to_parents.items():
            if 0 <= c < num_objects:
                out[c] = p
        return out


class KinematicRelationshipManager:
    """Owns the graph, keeps parent-transform snapshots, re-applies relative
    transforms after parents move (reference :157)."""

    def __init__(self, num_objects: int):
        self.relationship_graph = RelationshipGraph()
        self.num_objects = num_objects
        # snapshots: object -> (pos (3,), yaw) at the last update
        self.prev_snapshot: Dict[int, Tuple[np.ndarray, float]] = {}

    # -- initialization ---------------------------------------------------
    def initialize_from_obj_state(
        self, centers: np.ndarray, sizes: np.ndarray, yaws: Optional[Sequence[float]] = None
    ) -> None:
        """Infer ontop relations from geometry (reference
        initialize_from_dynamic_ontop:224 uses sim_utilities.ontop)."""
        from habitat_tpu.sims.sim_utilities import ontop

        for i in range(len(centers)):
            for j in range(len(centers)):
                if i != j and ontop(centers[i], sizes[i], centers[j], sizes[j]):
                    self.relationship_graph.add_relation(j, i, "ontop")
        self.update_snapshots(centers, yaws)

    initialize_from_dynamic_ontop = initialize_from_obj_state

    # -- snapshots (reference :293-356, :454) -----------------------------
    def update_snapshots(
        self, centers: np.ndarray, yaws: Optional[Sequence[float]] = None
    ) -> None:
        yaws = yaws if yaws is not None else [0.0] * len(centers)
        self.prev_snapshot = {
            i: (np.asarray(centers[i], np.float64).copy(), float(yaws[i]))
            for i in range(len(centers))
        }

    def get_relations_snapshot(self) -> Dict[int, Dict[int, str]]:
        """parent -> {child: rel_type} for the whole forest, depth-first
        (reference get_relations_snapshot:293)."""
        out: Dict[int, Dict[int, str]] = {}

        def walk(obj: int) -> None:
            kids = self.relationship_graph.get_children(obj)
            if kids:
                out[obj] = {
                    c: self.relationship_graph.relation_types[(obj, c)] for c in kids
                }
            for c in kids:
                walk(c)

        for root in self.relationship_graph.get_root_parents():
            walk(root)
        return out

    # -- application ------------------------------------------------------
    def apply_relationships_snapshot(
        self, centers: np.ndarray, yaws: Optional[Sequence[float]] = None
    ) -> np.ndarray:
        """Parents moved since the last snapshot -> move children so each
        keeps its parent-frame offset (rotation included), root-first so
        chains compose (reference apply_relationships_snapshot:398)."""
        yaws = yaws if yaws is not None else [0.0] * len(centers)
        out = np.array(centers, np.float64, copy=True)

        def walk(obj: int, inherited_dyaw: float) -> None:
            # a parent's rotation physically rotates its children, so the
            # subtree accumulates yaw deltas root-first (reference
            # _apply_relations_recursive:358 composes full transforms)
            p_prev, y_prev = self.prev_snapshot.get(
                obj, (out[obj], float(yaws[obj]))
            )
            dy = (float(yaws[obj]) - y_prev) + inherited_dyaw
            for c in self.relationship_graph.get_children(obj):
                off = out[c] - p_prev
                cy, sy = np.cos(dy), np.sin(dy)
                off_rot = np.array(
                    [
                        cy * off[0] + sy * off[2],
                        off[1],
                        -sy * off[0] + cy * off[2],
                    ]
                )
                out[c] = out[obj] + off_rot
                walk(c, dy)

        for root in self.relationship_graph.get_root_parents():
            walk(root, 0.0)
        return out

    def apply_relations(
        self, obj_pos: jnp.ndarray, parent_delta: jnp.ndarray
    ) -> jnp.ndarray:
        """Batched in-jit application over the current graph."""
        parent = jnp.asarray(
            self.relationship_graph.to_parent_array(self.num_objects)
        )[None]
        return apply_relations(obj_pos, parent, parent_delta)
