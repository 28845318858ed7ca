"""Optimizer and LR scheduling.

Parity with the reference training setup (pharmacodiff.py:254-263):
Adam with L2 weight decay applied to the gradient *before* the moment
updates (torch.optim.Adam's `weight_decay` semantics, not decoupled AdamW)
plus a ReduceLROnPlateau schedule monitoring 'val total loss'.

The learning rate enters the jitted update as a dynamic scalar (no
recompilation when the plateau scheduler fires); the plateau logic itself is
a tiny host-side state machine identical to torch's.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def make_optimizer(base_lr: float, weight_decay: float = 0.0,
                   clip_value: Optional[float] = None) -> optax.GradientTransformation:
    """Adam with torch-style L2 regularization and an injectable LR.

    Use with `optax.apply_updates`; the current learning rate is passed per
    step through `optax.inject_hyperparams`.
    """
    chain = []
    if clip_value is not None:
        chain.append(optax.clip(clip_value))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))

    def make(learning_rate):
        return optax.chain(*chain, optax.scale(-learning_rate))

    return optax.inject_hyperparams(make)(learning_rate=base_lr)


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau with
    the reference's config surface (configs/dev.yml:30-35)."""

    factor: float = 0.1
    patience: int = 20
    min_lr: float = 0.0
    mode: str = "min"
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    verbose: bool = False

    best: float = None  # type: ignore[assignment]
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return current < self.best * (1 - self.threshold)
            return current < self.best - self.threshold
        if self.threshold_mode == "rel":
            return current > self.best * (1 + self.threshold)
        return current > self.best + self.threshold

    def step(self, metric: float, lr: float) -> float:
        """Record a monitored value; return the (possibly reduced) LR."""
        if self.is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            new_lr = max(lr * self.factor, self.min_lr)
            if self.verbose and new_lr < lr:
                print(f"ReduceLROnPlateau: reducing lr {lr:.3g} -> {new_lr:.3g}")
            lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, state: dict) -> None:
        self.best = state.get("best")
        self.num_bad_epochs = state.get("num_bad_epochs", 0)
        self.cooldown_counter = state.get("cooldown_counter", 0)
