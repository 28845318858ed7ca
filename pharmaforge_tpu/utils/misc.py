"""Small host-side utilities (reference utils/unorganized_utils.py).

The graph bookkeeping helpers from the reference (get_batch_idxs,
get_edges_per_batch, copy_graph, ...) have no equivalent here by design:
dense mask batching makes them unnecessary (see data/batch.py). What remains
is the genuinely host-side surface: type maps and file writers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from pharmaforge_tpu.constants import TYPE_IDX_TO_ELEM


def set_matmul_precision(precision: str = "float32") -> None:
    """Set the global matmul precision policy.

    Some XLA builds lower default-precision float32 matmuls to bfloat16 on
    the MXU. 'float32' forces full-precision accumulation (reference-parity
    training); 'bfloat16' opts into the fast path for throughput runs.
    """
    import jax
    jax.config.update("jax_default_matmul_precision", precision)


def setup_jax(matmul_precision: str = None) -> None:
    """Common CLI jax setup.

    * persistent compilation cache (dir overridable via
      PHARMAFORGE_JAX_CACHE) — single-core hosts otherwise pay minutes of
      recompilation on every invocation;
    * honor JAX_PLATFORMS through jax.config: on hosts whose site hook
      re-selects a TPU plugin after import, the env var alone does not
      stick, which silently breaks CPU-only runs;
    * optional matmul precision policy.
    """
    import os

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PHARMAFORGE_JAX_CACHE", "/tmp/pharmaforge_jax_cache"))
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if matmul_precision:
        set_matmul_precision(matmul_precision)


def get_prot_atom_ph_type_maps(dataset_config: dict):
    """Element/type name -> index maps (reference
    utils/unorganized_utils.py:97-106). `other` maps one past the known
    elements and is dropped downstream."""
    prot_elements = dataset_config["prot_elements"]
    prot_element_map: Dict[str, int] = {
        element: idx for idx, element in enumerate(prot_elements)}
    prot_element_map["other"] = len(prot_elements)

    ph_types = dataset_config["ph_type_map"]
    ph_type_map: Dict[str, int] = {
        element: idx for idx, element in enumerate(ph_types)}
    return prot_element_map, ph_type_map


def write_pharmacophore_file(coords_list: Sequence[np.ndarray],
                             atom_types_list: Sequence[Sequence[int]],
                             pharm_type_map: list,
                             filename: Optional[str] = None):
    """Multi-frame xyz-style pharmacophore writer (reference
    utils/unorganized_utils.py:111-128)."""
    out = ""
    for coords, atom_types in zip(coords_list, atom_types_list):
        assert len(coords) == len(atom_types)
        elems = [TYPE_IDX_TO_ELEM[int(i)] for i in atom_types]
        out += f"{len(coords)}\n"
        for i in range(len(coords)):
            out += (f"{elems[i]} {coords[i, 0]:.3f} "
                    f"{coords[i, 1]:.3f} {coords[i, 2]:.3f}\n")

    if filename is None:
        return out
    Path(filename).write_text(out)
    return None
