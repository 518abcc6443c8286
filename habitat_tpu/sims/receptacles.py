"""Receptacles: surfaces that objects can be placed on/in, with samplers.

Counterpart of the reference receptacle system (habitat-lab/habitat/datasets/
rearrange/samplers/receptacle.py: Receptacle ABC :30, AABBReceptacle :219,
TriangleMeshReceptacle :334 with area-weighted triangle sampling,
find_receptacles scene-config parsing, ReceptacleSet/ReceptacleTracker in
receptacle.py + object_sampler usage). The reference parses receptacle
metadata out of habitat-sim scene/object configs; here receptacles derive
from SceneData object annotations (procedural scenes annotate every clutter
box) or are built directly from AABBs / triangle sets. Sampling is host-side
numpy (episode generation is host work), matching where the reference runs it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

# categories whose top surface accepts placed objects (reference marks
# receptacle frames per-object in the config; our procedural vocabulary)
RECEPTACLE_CATEGORIES = ("table", "counter", "shelf", "cabinet", "bed", "sofa")


class Receptacle:
    """A named placement surface attached to a parent object
    (reference receptacle.py:30)."""

    def __init__(self, name: str, parent_object_handle: Optional[str] = None, up=(0, 1, 0)):
        self.name = name
        self.parent_object_handle = parent_object_handle
        self.up = np.asarray(up, np.float32)

    @property
    def bounds(self):  # (lo, hi) world AABB
        raise NotImplementedError

    def sample_uniform_local(self, rng: np.random.Generator) -> np.ndarray:
        raise NotImplementedError

    def sample_uniform_global(self, rng: np.random.Generator) -> np.ndarray:
        """World-space sample (reference :120 applies the parent transform;
        our receptacles are stored in world space already)."""
        return self.sample_uniform_local(rng)


class AABBReceptacle(Receptacle):
    """Axis-aligned box receptacle; samples on its TOP face
    (reference receptacle.py:219)."""

    def __init__(self, name: str, lo, hi, parent_object_handle=None):
        super().__init__(name, parent_object_handle)
        self.lo = np.asarray(lo, np.float32)
        self.hi = np.asarray(hi, np.float32)

    @property
    def bounds(self):
        return self.lo, self.hi

    @property
    def total_area(self) -> float:
        d = self.hi - self.lo
        return float(d[0] * d[2])

    def sample_uniform_local(self, rng: np.random.Generator) -> np.ndarray:
        x = rng.uniform(self.lo[0], self.hi[0])
        z = rng.uniform(self.lo[2], self.hi[2])
        return np.array([x, self.hi[1], z], np.float32)


class TriangleMeshReceptacle(Receptacle):
    """Triangle-soup receptacle with area-weighted uniform sampling
    (reference receptacle.py:334-470: cumulative-area CDF + barycentric)."""

    def __init__(self, name: str, triangles: np.ndarray, parent_object_handle=None):
        super().__init__(name, parent_object_handle)
        self.triangles = np.asarray(triangles, np.float32)  # (T, 3, 3)
        e1 = self.triangles[:, 1] - self.triangles[:, 0]
        e2 = self.triangles[:, 2] - self.triangles[:, 0]
        self.areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        total = self.areas.sum()
        assert total > 0, "degenerate receptacle mesh"
        self._cdf = np.cumsum(self.areas) / total

    @property
    def total_area(self) -> float:
        return float(self.areas.sum())

    @property
    def bounds(self):
        flat = self.triangles.reshape(-1, 3)
        return flat.min(0), flat.max(0)

    def sample_uniform_local(self, rng: np.random.Generator) -> np.ndarray:
        t = int(np.searchsorted(self._cdf, rng.uniform()))
        t = min(t, len(self.triangles) - 1)
        # uniform barycentric (sqrt trick)
        r1, r2 = rng.uniform(), rng.uniform()
        s = np.sqrt(r1)
        a, b, c = self.triangles[t]
        return (1 - s) * a + s * (1 - r2) * b + s * r2 * c


def find_receptacles(scene) -> List[Receptacle]:
    """Derive receptacles from a SceneData's annotated objects (reference
    find_receptacles parses receptacle entries out of stage/object configs;
    procedural scenes annotate center/size/category per object)."""
    out: List[Receptacle] = []
    for obj in getattr(scene, "objects", None) or ():
        if obj.get("category") not in RECEPTACLE_CATEGORIES:
            continue
        c = np.asarray(obj["center"], np.float32)
        s = np.asarray(obj["size"], np.float32)
        lo, hi = c - s / 2, c + s / 2
        # shrink the top face by a margin so samples stay on the surface
        m = 0.05
        lo[[0, 2]] += m
        hi[[0, 2]] -= m
        if (hi[[0, 2]] <= lo[[0, 2]]).any():
            continue
        out.append(
            AABBReceptacle(
                name=f"receptacle_aabb_{obj['category']}_{obj['semantic_id']}",
                lo=lo,
                hi=hi,
                parent_object_handle=str(obj["semantic_id"]),
            )
        )
    return out


@dataclasses.dataclass
class ReceptacleSet:
    """Named inclusion/exclusion filter over receptacles (reference
    ReceptacleSet — included/excluded object handles + substrings)."""

    name: str = "all"
    included_object_substrings: Sequence[str] = ("",)
    excluded_object_substrings: Sequence[str] = ()

    def filter(self, receptacles: Sequence[Receptacle]) -> List[Receptacle]:
        out = []
        for r in receptacles:
            if any(s in r.name for s in self.excluded_object_substrings):
                continue
            if any(s in r.name for s in self.included_object_substrings):
                out.append(r)
        return out


class ReceptacleTracker:
    """Tracks per-episode receptacle availability (reference
    ReceptacleTracker — consumes one-shot receptacles as they're filled)."""

    def __init__(self, max_objects_per_receptacle: Dict[str, int], recep_sets: Dict[str, ReceptacleSet]):
        self._remaining = dict(max_objects_per_receptacle)
        self.recep_sets = dict(recep_sets)

    def allocate(self, recep_name: str) -> bool:
        left = self._remaining.get(recep_name)
        if left is None:
            return True
        if left <= 0:
            return False
        self._remaining[recep_name] = left - 1
        return True


def sample_on_receptacle(
    scene,
    rng: np.random.Generator,
    recep_set: Optional[ReceptacleSet] = None,
    clearance: float = 0.05,
) -> Optional[np.ndarray]:
    """Area-weighted receptacle choice + uniform surface sample (reference
    object_sampler.py's sample() inner loop). Returns a world position just
    above the surface, or None if the scene has no receptacles."""
    receps = find_receptacles(scene)
    if recep_set is not None:
        receps = recep_set.filter(receps)
    if not receps:
        return None
    areas = np.array([r.total_area for r in receps])
    idx = int(rng.choice(len(receps), p=areas / areas.sum()))
    p = receps[idx].sample_uniform_global(rng)
    return p + np.array([0, clearance, 0], np.float32)
