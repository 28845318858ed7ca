"""Orbax checkpointing with the reference run-dir contract.

Run directory layout (reference train.py:113-130):

    <output_dir>/<name>_<run_id>/
        config.yaml          # merged config incl. resume.run_id
        checkpoints/
            last/...         # most recent state (resume target)
            top/<step>/...   # best-k by monitored metric

`save_last` + `save_top_k` + `monitor` come from the `checkpointing` config
section (configs/dev.yml:37-42). State includes params, optimizer state,
step/epoch counters, the current LR and the plateau-scheduler state, so
`--resume <run_dir|ckpt>` restores training exactly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class RunCheckpointer:

    def __init__(self, run_dir: Path, save_last: bool = True,
                 save_top_k: int = 3, monitor: str = "val total loss",
                 every_n_epochs: int = 1, mode: str = "min", **_unused):
        self.run_dir = Path(run_dir)
        self.ckpt_dir = self.run_dir / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.save_last = save_last
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.every_n_epochs = every_n_epochs
        self.mode = mode
        # under jax.distributed the trainer enforces rank discipline itself
        # (rank 0 saves host-numpy state; every rank restores host-side), so
        # orbax must treat each process as standalone — its default
        # cross-process barriers deadlock against ranks that never enter
        # save (observed: 5-min shutdown-barrier timeout in the 2-process
        # trainer smoke test)
        if jax.process_count() > 1:
            me = jax.process_index()
            mp = ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"local-ckpt-{me}")
            self._ckptr = ocp.StandardCheckpointer(
                multiprocessing_options=mp)
        else:
            self._ckptr = ocp.StandardCheckpointer()
        self._top: list[tuple[float, int]] = []  # (metric, step)
        self._load_top_index()

    # ------------------------------------------------------------- helpers

    def _top_index_file(self) -> Path:
        return self.ckpt_dir / "top_index.json"

    def _load_top_index(self):
        f = self._top_index_file()
        if f.exists():
            self._top = [tuple(x) for x in json.loads(f.read_text())]

    def _save_top_index(self):
        self._top_index_file().write_text(json.dumps(self._top))

    def _write(self, path: Path, state: dict, meta: dict):
        # each top-level item (params / opt_state / ...) is its own orbax
        # tree so inference can restore params without an optimizer template
        path = path.absolute()
        if path.exists():
            import shutil
            shutil.rmtree(path)
        for k, v in state.items():
            self._ckptr.save(path / k, v)
        self._ckptr.wait_until_finished()
        (path / "meta.json").write_text(json.dumps(meta))

    # ------------------------------------------------------------------ api

    def save(self, state: dict, meta: dict, metric: Optional[float] = None):
        """Save `last` and update the top-k set.

        Rank discipline is enforced HERE, not only in the Trainer: under
        jax.distributed each process holds a standalone checkpointer (the
        ctor's per-process multiprocessing options), so nothing else stops
        a non-zero rank from concurrently writing/deleting the same run
        directory if some future caller (save-on-exit hooks, scripts using
        RunCheckpointer directly) forgets the Trainer's early return.
        """
        if jax.process_count() > 1 and jax.process_index() != 0:
            raise RuntimeError(
                f"RunCheckpointer.save called on process "
                f"{jax.process_index()}: only process 0 may write the run "
                f"directory (concurrent writers corrupt last/ and top-k)")
        step = int(meta.get("step", 0))
        if self.save_last:
            self._write(self.ckpt_dir / "last", state, meta)
        if metric is not None and self.save_top_k > 0:
            self._top.append((float(metric), step))
            reverse = self.mode == "max"
            self._top.sort(key=lambda x: x[0], reverse=reverse)
            keep = self._top[:self.save_top_k]
            drop = self._top[self.save_top_k:]
            if any(s == step for _, s in keep):
                self._write(self.ckpt_dir / "top" / str(step), state, meta)
            for _, s in drop:
                d = self.ckpt_dir / "top" / str(s)
                if d.exists():
                    import shutil
                    shutil.rmtree(d)
            self._top = keep
            self._save_top_index()

    def restore(self, template: dict, which: str = "last") -> tuple[dict, dict]:
        """Restore (state, meta) for the items named in `template`.

        `which` may be 'last', 'best', or a checkpoint path ('last.ckpt'
        reference-style aliases resolve to the 'last' directory).
        """
        if which == "last":
            path = self.ckpt_dir / "last"
        elif which == "best":
            if not self._top:
                raise FileNotFoundError("no top-k checkpoints recorded")
            path = self.ckpt_dir / "top" / str(self._top[0][1])
        else:
            path = Path(which)
            if path.name == "last.ckpt":  # reference-style path alias
                path = path.parent / "last"
        state = {k: self._ckptr.restore((path / k).absolute(), v)
                 for k, v in template.items()}
        meta = json.loads((path / "meta.json").read_text())
        return state, meta


def abstract_like(tree):
    """Shape/dtype skeleton for orbax restore."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree)
