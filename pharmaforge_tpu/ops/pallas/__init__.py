"""TPU Pallas kernels on the sampling hot path.

One live kernel: `knn_select` — the per-step pf nearest-neighbor selection
(see knn_select.py for why the earlier fused prot-prot message kernel was
removed after the XLA path out-evolved it).
"""

import os

from pharmaforge_tpu.ops.pallas.knn_select import pallas_supported


def edge_kernel_enabled() -> bool:
    """Route dynamic-edge construction through the fused Pallas kernel?

    On by default on TPU backends; `PHARMAFORGE_PALLAS=0` disables (the
    plain-XLA path is numerically identical and runs everywhere).
    """
    if os.environ.get("PHARMAFORGE_PALLAS", "1") == "0":
        return False
    return pallas_supported()
