"""TPU compiler options for the hot train-step jits.

Raising the scoped-VMEM ceiling lets XLA's conv emitter pick larger tiles
than the 16 MiB default allows (v5e has 128 MiB physical VMEM). Sweep on the
headline bench (ms/update at N=256, resnet18+LSTM512, see PROGRESS.md):
16 MiB 593.8 | 24 586.6 | 32 582.8 | 40 580.1 | 48 581.1 | 64 585.9 |
128 653.2 — 40 MiB is the optimum, +2.4% end-to-end.

Local XLA_FLAGS cannot carry TPU flags on this image (the CPU-side flag
parser rejects them; compilation happens in the remote compile service), so
the options ride each jit's ``compiler_options``. CPU/other backends get
none — unknown options are a hard error there.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

SCOPED_VMEM_KIB = 40960


def _on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def tpu_compiler_options() -> Optional[Dict[str, str]]:
    """Options for jax.jit(compiler_options=...) on TPU; None elsewhere."""
    if not _on_tpu():
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}
