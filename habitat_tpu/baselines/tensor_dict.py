"""TensorDict (reference habitat-baselines/habitat_baselines/common/
tensor_dict.py:57+): nested dict of arrays with slicing/set/map.

In JAX, pytrees subsume most of this; TensorDict is kept for API parity and
for host-side rollout inspection. Backed by numpy/jax arrays transparently.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import numpy as np


class TensorDict(dict):
    @classmethod
    def from_tree(cls, tree: Dict[str, Any]) -> "TensorDict":
        out = cls()
        for k, v in tree.items():
            out[k] = cls.from_tree(v) if isinstance(v, dict) else v
        return out

    def slice_keys(self, *keys) -> "TensorDict":
        out = TensorDict()
        for k in keys:
            out[k] = self[k]
        return out

    def __getitem__(self, index):
        if isinstance(index, str):
            return dict.__getitem__(self, index)
        return TensorDict(
            {
                k: (v[index] if not isinstance(v, TensorDict) else v[index])
                for k, v in self.items()
            }
        )

    def set(self, index, value: Union["TensorDict", Dict], strict: bool = True) -> None:
        if isinstance(index, str):
            dict.__setitem__(self, index, value)
            return
        for k, v in value.items():
            if k not in self:
                if strict:
                    raise KeyError(k)
                continue
            dst = dict.__getitem__(self, k)
            if isinstance(dst, TensorDict):
                dst.set(index, v, strict=strict)
            else:
                try:
                    dst[index] = v  # numpy in-place
                except TypeError:
                    # jax arrays are immutable: functional update
                    dict.__setitem__(self, k, dst.at[index].set(v))

    def __setitem__(self, index, value):
        if isinstance(index, str):
            dict.__setitem__(self, index, value)
        else:
            self.set(index, value)

    def map(self, func: Callable) -> "TensorDict":
        return TensorDict(
            {
                k: (v.map(func) if isinstance(v, TensorDict) else func(v))
                for k, v in self.items()
            }
        )

    def map_in_place(self, func: Callable) -> "TensorDict":
        for k, v in self.items():
            if isinstance(v, TensorDict):
                v.map_in_place(func)
            else:
                dict.__setitem__(self, k, func(v))
        return self

    def numpy(self) -> "TensorDict":
        return self.map(np.asarray)
