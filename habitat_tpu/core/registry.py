"""Global component registry.

TPU-native counterpart of the reference's decorator registry
(habitat-lab/habitat/core/registry.py:43): string-named component maps that let
YAML ``type:`` fields resolve to classes/functions.  We keep the same
registration kinds (task / simulator / sensor / measure / task_action /
dataset / env) and add the habitat-baselines kinds (trainer / policy /
obs_transformer / storage / updater / auxiliary loss) that the reference keeps
in a second registry
(habitat-baselines/habitat_baselines/common/baseline_registry.py:28).

Unlike the reference, registered sensors/measures/actions here are *functional*
components: classes whose instances expose pure functions suitable for
jit/vmap.  The implementation is also different in idiom: one flat mapping of
``kind -> {name: component}`` and a pair-generating factory — each public
``register_X``/``get_X`` pair is stamped out from the kind string below.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    """Process-global name→component tables (instantiate freely; state is
    shared at class level, so every ``Registry()`` sees the same mapping)."""

    _tables: Dict[str, Dict[str, Any]] = {}

    # (public suffix, internal kind) — the public API is register_<suffix>
    # and get_<suffix>, matching the reference surface names.
    _KINDS = (
        # habitat-lab kinds (reference core/registry.py:72-196)
        ("task", "task"),
        ("simulator", "sim"),
        ("sensor", "sensor"),
        ("measure", "measure"),
        ("task_action", "task_action"),
        ("dataset", "dataset"),
        ("env", "env"),
        ("action_space_configuration", "asc"),
        # habitat-baselines kinds (reference baseline_registry.py:28-193)
        ("trainer", "trainer"),
        ("policy", "policy"),
        ("obs_transformer", "obs_transformer"),
        ("storage", "storage"),
        ("updater", "updater"),
        ("auxiliary_loss", "aux_loss"),
        ("agent_access_mgr", "agent_access_mgr"),
        ("episode_generator", "episode_generator"),
    )

    @classmethod
    def table(cls, kind: str) -> Dict[str, Any]:
        return cls._tables.setdefault(kind, {})

    @classmethod
    def add(cls, kind: str, component: Any, name: Optional[str] = None) -> Any:
        """Insert ``component`` into the ``kind`` table under ``name``
        (defaults to the component's class name) and return it unchanged,
        so it doubles as a decorator body."""
        cls.table(kind)[name or component.__name__] = component
        return component

    @classmethod
    def lookup(cls, kind: str, name: str) -> Any:
        tbl = cls.table(kind)
        try:
            return tbl[name]
        except KeyError:
            raise KeyError(
                f"No {kind} registered under name {name!r}. "
                f"Available: {sorted(tbl)}"
            ) from None

    @classmethod
    def names(cls, kind: str):
        return sorted(cls.table(kind))

    # `mapping` kept as a property-style alias for introspection parity.
    @property
    def mapping(self) -> Dict[str, Dict[str, Any]]:
        return self._tables


def _registrar(kind: str) -> Callable:
    """Build a ``register_<suffix>`` usable both as ``@registry.register_x``
    and ``@registry.register_x(name="...")``."""

    def register(component: Any = None, *, name: Optional[str] = None):
        if component is None:
            return lambda c: Registry.add(kind, c, name)
        return Registry.add(kind, component, name)

    return register


def _getter(kind: str) -> Callable:
    def get(name: str) -> Any:
        return Registry.lookup(kind, name)

    return get


for _suffix, _kind in Registry._KINDS:
    setattr(Registry, f"register_{_suffix}", staticmethod(_registrar(_kind)))
    setattr(Registry, f"get_{_suffix}", staticmethod(_getter(_kind)))

registry = Registry()

# Alias matching habitat-baselines' import surface.
baseline_registry = registry
