"""Experiment logging: wandb when available/enabled, JSONL always.

Parity with the reference's WandbLogger usage (train.py:86-124,
pharmacodiff.py:295-296): same metric names, step+epoch cadence, run-id
generation and persistence for resume. On machines without wandb (or with
`wandb.mode: disabled`) metrics still land in `<run_dir>/metrics.jsonl`.
"""

from __future__ import annotations

import json
import secrets
import string
import time
from pathlib import Path
from typing import Dict, Optional


def generate_run_id(length: int = 8) -> str:
    alphabet = string.ascii_lowercase + string.digits
    return "".join(secrets.choice(alphabet) for _ in range(length))


class MetricsLogger:

    def __init__(self, run_dir: Path, wandb_config: Optional[dict] = None,
                 full_config: Optional[dict] = None):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.run_dir / "metrics.jsonl", "a")
        self._wandb = None

        wandb_config = dict(wandb_config or {})
        mode = wandb_config.pop("mode", "disabled")
        if mode != "disabled":
            try:
                import wandb  # type: ignore
                self._wandb = wandb.init(
                    project=wandb_config.get("project"),
                    group=wandb_config.get("group"),
                    name=wandb_config.get("name"),
                    id=wandb_config.get("id"),
                    resume=wandb_config.get("resume"),
                    dir=str(wandb_config.get("save_dir", self.run_dir)),
                    mode=mode,
                    config=full_config,
                )
            except Exception as e:  # wandb absent or offline failure
                print(f"wandb unavailable ({e}); logging to metrics.jsonl only")

    def log(self, metrics: Dict[str, float], step: int):
        record = {"step": step, "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
