"""habitat_tpu: a TPU-native embodied-AI framework (habitat-lab capabilities,
re-architected for JAX/XLA/Pallas — see SURVEY.md for the reference map)."""

__version__ = "0.1.0"

from habitat_tpu.core.logging import logger
from habitat_tpu.core.registry import registry

__all__ = ["registry", "logger", "__version__"]
