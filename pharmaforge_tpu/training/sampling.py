"""Host-level batched sampling orchestration.

Replaces the reference's `PharmacophoreDiff.sample`
(pharmacodiff.py:516-578) and the per-pocket batching loops in test.py /
generate_pharmacophores.py: pockets are tiled into dense batches
(`data.batch.tile_pocket`), chunked by `max_batch_size`, padded to a fixed
chunk size (so the jitted reverse-diffusion program compiles once per
pocket-size bucket), and the device output is split back into
`SampledPharmacophore` objects carrying their pocket's receptor
pharmacophore sites for the validity metric.
"""

from __future__ import annotations

from math import ceil
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
from pharmaforge_tpu.constants import PH_IDX_TO_TYPE
from pharmaforge_tpu.data.batch import DEFAULT_MAX_PHARM, tile_pocket
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion


def probe_pp_k_out(model: PharmacophoreDiffusion, prot_x_g, prot_mask_g,
                   probe_jit=None) -> int:
    """Static `pp_k_out` for the middle-conv pocket-copy correction path
    (models/conv.py `pp_correction`): the pp graph's max out-degree over
    the pocket-group representatives, rounded up to a multiple of 8 so jit
    recompiles only happen across coarse degree buckets. Returns 0 (path
    off) when the correction can't engage: no fused-kernel backend, <4
    convs, no knn pf, a dynamic message norm, or PHARMAFORGE_PP_CORR=0."""
    import os
    if os.environ.get("PHARMAFORGE_PP_CORR", "1") == "0":
        return 0
    cfg = model.config
    if cfg.n_convs < 4 or not cfg.pf_k or cfg.pf_k <= 0:
        return 0
    from pharmaforge_tpu.models.conv import message_norm_is_dynamic
    if message_norm_is_dynamic(cfg.message_norm):
        return 0
    from pharmaforge_tpu.ops.pallas import edge_kernel_enabled
    if not (edge_kernel_enabled()
            or os.environ.get("PHARMAFORGE_PP_CORR") == "force"):
        return 0
    if probe_jit is None:
        from pharmaforge_tpu.models.edges import (build_pp_edge,
                                                  max_pp_out_degree)
        cut = float(model.cutoffs["pp"])
        k_max = int(cfg.pp_k_max)
        probe_jit = _PROBE_CACHE.get((cut, k_max))
        if probe_jit is None:
            def probe_jit(px, pm, _c=cut, _k=k_max):
                _, ed = build_pp_edge(px, pm, _c, _k)
                return max_pp_out_degree(ed)
            probe_jit = _PROBE_CACHE[(cut, k_max)] = jax.jit(probe_jit)
    deg = int(probe_jit(np.asarray(prot_x_g), np.asarray(prot_mask_g)))
    return max(8, -(-deg // 8) * 8)


_PROBE_CACHE: Dict[tuple, callable] = {}


class PocketSampler:

    def __init__(self, model: PharmacophoreDiffusion, params,
                 pharm_type_map: Optional[List[str]] = None,
                 prot_bucket_multiple: int = 64,
                 fixed_prot_slots: Optional[int] = None,
                 mesh=None):
        """`fixed_prot_slots` pads every pocket to one protein slot count so
        the reverse-diffusion chain compiles exactly once across pockets of
        different sizes (multi-pocket evaluation sweeps).

        `mesh` (a 1-D jax.sharding.Mesh) shards stacked multi-pocket sweeps
        over its 'data' axis — each chip runs the reverse chains of its
        pocket slice, scaling evaluation/serving throughput linearly over
        ICI with no change in numerics. Params are replicated onto the mesh
        here; single-pocket calls run replicated as before."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from pharmaforge_tpu.parallel.mesh import replicate
            params = replicate(params, mesh)
        self.params = params
        self.pharm_type_map = pharm_type_map or PH_IDX_TO_TYPE
        self.prot_bucket_multiple = prot_bucket_multiple
        self.fixed_prot_slots = fixed_prot_slots
        self._jitted: Dict[bool, callable] = {}
        self._kout_probe = None

    def _sampler(self, visualize: bool):
        if visualize not in self._jitted:
            def fn(params, batch, key, init_com, group, k_out=0):
                # every chunk is ONE pocket tiled over the whole batch
                # (tile_pocket below), so the chain dedups the per-copy
                # prot-prot work across the full batch
                return self.model.sample_given_receptor(
                    params, batch, key, init_pharm_com=init_com,
                    visualize_trajectory=visualize, pocket_group_size=group,
                    pp_k_out=k_out)
            self._jitted[visualize] = jax.jit(fn, static_argnums=(4, 5))
        return self._jitted[visualize]

    def _pp_k_out(self, batch, group: int) -> int:
        """`probe_pp_k_out` over this batch's pocket-group representatives
        — one tiny jitted call, host-synced once per chunk, amortized over
        the T-step chain. Mesh-sharded sweeps keep the plain path for now
        (the correction's G<->B cross-gathers are untested under pjit)."""
        if group <= 1 or self.mesh is not None:
            return 0
        k = probe_pp_k_out(self.model, np.asarray(batch.prot_x)[::group],
                           np.asarray(batch.prot_mask)[::group],
                           probe_jit=self._kout_probe)
        return k

    def sample_pocket(self,
                      pocket: dict,
                      pharm_sizes: Sequence[int],
                      key: jax.Array,
                      max_batch_size: int = 32,
                      init_pharm_com: Optional[np.ndarray] = None,
                      visualize_trajectory: bool = False
                      ) -> List[SampledPharmacophore]:
        """Sample len(pharm_sizes) pharmacophores for one pocket.

        `pocket` is a dataset sample dict (prot_x, prot_h, optional
        prot_ph_x/prot_ph_h). Mirrors the batching loop of test.py:159-183.
        """
        n_total = len(pharm_sizes)
        n_chunks = ceil(n_total / max_batch_size)
        # NB: sizes are sliced PER CHUNK below — the reference instead
        # reuses the first batch_size entries of pharm_sizes for every
        # chunk (generate_pharmacophores.py:329-333, test.py:164-168), a
        # bug that only shows when samples_per_pocket > max_batch_size;
        # fixed rather than reproduced (SURVEY.md "known quirks").
        sampler = self._sampler(visualize_trajectory)

        prot_ph_pos = pocket.get("prot_ph_x")
        prot_ph_types = None
        if prot_ph_pos is not None and len(prot_ph_pos):
            idxs = np.asarray(pocket["prot_ph_h"]).argmax(axis=1)
            prot_ph_types = [PH_IDX_TO_TYPE[int(i)] for i in idxs]

        results: List[SampledPharmacophore] = []
        k_out = None
        for c in range(n_chunks):
            chunk_sizes = list(pharm_sizes[c * max_batch_size:
                                           (c + 1) * max_batch_size])
            n_real = len(chunk_sizes)
            # pad the chunk to a fixed batch size so every chunk reuses the
            # same compiled program
            pad_sizes = chunk_sizes + [3] * (max_batch_size - n_real) \
                if n_chunks > 1 else chunk_sizes
            batch = tile_pocket(
                pocket["prot_x"], pocket["prot_h"], pad_sizes,
                n_pharm_feats=self.model.config.pharm_nf,
                max_pharm=max(DEFAULT_MAX_PHARM, max(pad_sizes)),
                max_prot=self.fixed_prot_slots,
                prot_bucket_multiple=self.prot_bucket_multiple)

            if init_pharm_com is not None:
                com = np.broadcast_to(
                    np.asarray(init_pharm_com, np.float32).reshape(1, 3),
                    (batch.batch_size, 3)).copy()
            else:
                pm = batch.prot_mask[..., None]
                com = ((batch.prot_x * pm).sum(1)
                       / np.maximum(pm.sum(1), 1)).astype(np.float32)

            key, sub = jax.random.split(key)
            group = batch.batch_size
            if k_out is None:
                # same pocket every chunk: one out-degree probe suffices
                k_out = self._pp_k_out(batch, group)
            if self.mesh is not None:
                n_dev = int(np.prod(self.mesh.devices.shape))
                if batch.batch_size % n_dev == 0 and n_dev > 1:
                    # shard the sample copies over the mesh; each chip
                    # dedups the prot-prot work for its own slice (group =
                    # rows per chip), so the chain partitions with no
                    # collectives inside the scan. Numerically identical —
                    # the dedup is exact at any group size.
                    from pharmaforge_tpu.parallel.mesh import shard_batch
                    batch = shard_batch(batch, self.mesh)
                    com = jax.device_put(
                        com, jax.sharding.NamedSharding(
                            self.mesh, jax.sharding.PartitionSpec("data")))
                    group = batch.batch_size // n_dev
            out = sampler(self.params, batch, sub, com, group, k_out)
            out = {k: np.asarray(v) for k, v in out.items()}
            # keep only real rows
            out = {k: (v[:, :n_real] if k.startswith("traj") else v[:n_real])
                   for k, v in out.items()}
            results.extend(SampledPharmacophore.from_batch(
                out, self.pharm_type_map,
                with_trajectory=visualize_trajectory,
                prot_ph_pos=prot_ph_pos, prot_ph_types=prot_ph_types))
        return results

    def sample(self,
               pockets: List[dict],
               n_pharms: List[Sequence[int]],
               key: jax.Array,
               max_batch_size: int = 32,
               init_pharm_com: Optional[np.ndarray] = None,
               visualize_trajectory: bool = False
               ) -> List[List[SampledPharmacophore]]:
        """Multi-receptor sampling (reference pharmacodiff.py:516-578):
        per-pocket lists of sampled pharmacophores.

        When every pocket requests the same number of samples, all pockets
        pad to one protein slot count (`fixed_prot_slots`), and each
        pocket's samples fit one chunk, the whole sweep runs as ONE stacked
        device call (B = n_pockets * samples_each, `pocket_group_size` =
        samples_each) — per-step device ops are tiny at single-pocket batch
        sizes, so stacking pockets amortizes their fixed cost.
        """
        same_count = len({len(s) for s in n_pharms}) == 1
        if (same_count and self.fixed_prot_slots and len(pockets) > 1
                and len(n_pharms[0]) <= max_batch_size
                and not visualize_trajectory):
            return self.sample_stacked(pockets, n_pharms, key,
                                       init_pharm_com=init_pharm_com)
        per_pocket = []
        for i, (pocket, sizes) in enumerate(zip(pockets, n_pharms)):
            com_i = None
            if init_pharm_com is not None:
                com_i = np.asarray(init_pharm_com)[i]
            key, sub = jax.random.split(key)
            per_pocket.append(self.sample_pocket(
                pocket, sizes, sub, max_batch_size=max_batch_size,
                init_pharm_com=com_i,
                visualize_trajectory=visualize_trajectory))
        return per_pocket

    def sample_stacked(self,
                       pockets: List[dict],
                       n_pharms: List[Sequence[int]],
                       key: jax.Array,
                       init_pharm_com: Optional[np.ndarray] = None
                       ) -> List[List[SampledPharmacophore]]:
        """All pockets x samples in one stacked device batch.

        Rows are grouped pocket-major (pocket i occupies rows
        [i*c, (i+1)*c)), so the chain dedups the prot-prot work per pocket
        group. Numerics are identical to the per-pocket path (same padded
        shapes, same per-group dedup)."""
        c = len(n_pharms[0])
        f_max = max(DEFAULT_MAX_PHARM,
                    max(max(s) for s in n_pharms))
        tiles = [tile_pocket(p["prot_x"], p["prot_h"], sizes,
                             n_pharm_feats=self.model.config.pharm_nf,
                             max_pharm=f_max,
                             max_prot=self.fixed_prot_slots,
                             prot_bucket_multiple=self.prot_bucket_multiple)
                 for p, sizes in zip(pockets, n_pharms)]
        batch = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *tiles)

        if init_pharm_com is not None:
            coms = np.asarray(init_pharm_com, np.float32).reshape(-1, 3)
        else:
            pm = batch.prot_mask[::c][..., None]
            coms = ((batch.prot_x[::c] * pm).sum(1)
                    / np.maximum(pm.sum(1), 1)).astype(np.float32)
        com = np.repeat(coms, c, axis=0)

        if self.mesh is not None:
            n_dev = int(np.prod(self.mesh.devices.shape))
            if len(pockets) % n_dev == 0:
                # whole pocket groups per chip: the batch axis shards
                # cleanly through the group-dedup reshapes, XLA partitions
                # the chain with zero collectives inside the scan
                from pharmaforge_tpu.parallel.mesh import shard_batch
                batch = shard_batch(batch, self.mesh)
                com = jax.device_put(
                    com, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec("data")))

        sampler = self._sampler(False)
        k_out = self._pp_k_out(batch, c)
        out = sampler(self.params, batch, key, com, c, k_out)
        out = {k: np.asarray(v) for k, v in out.items()}

        per_pocket = []
        for i, pocket in enumerate(pockets):
            prot_ph_pos = pocket.get("prot_ph_x")
            prot_ph_types = None
            if prot_ph_pos is not None and len(prot_ph_pos):
                idxs = np.asarray(pocket["prot_ph_h"]).argmax(axis=1)
                prot_ph_types = [PH_IDX_TO_TYPE[int(j)] for j in idxs]
            sub = {k: v[i * c:(i + 1) * c] for k, v in out.items()}
            per_pocket.append(SampledPharmacophore.from_batch(
                sub, self.pharm_type_map, with_trajectory=False,
                prot_ph_pos=prot_ph_pos, prot_ph_types=prot_ph_types))
        return per_pocket
