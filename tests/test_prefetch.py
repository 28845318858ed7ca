"""Host prefetching + validation limiting (VERDICT r1 #10)."""

import numpy as np
import pytest

from pharmaforge_tpu.data.prefetch import prefetch
from tests.conftest import make_complex_batch


def test_prefetch_preserves_order_and_items():
    assert list(prefetch(range(57), depth=3)) == list(range(57))


def test_prefetch_relays_producer_exception():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_runs_ahead_of_consumer():
    import threading
    started = threading.Event()
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield i
        started.set()

    it = prefetch(gen(), depth=8)
    first = next(it)
    started.wait(timeout=5)
    # the producer finished all items while the consumer took only one
    assert first == 0 and produced == list(range(5))
    assert list(it) == [1, 2, 3, 4]


class _FakeLoader(list):
    pass


class _FakeDataModule:
    def __init__(self, batches):
        self._batches = batches

    def val_dataloader(self, seed=0):
        return _FakeLoader(self._batches)


def _make_trainer(tmp_path, limit):
    from pharmaforge_tpu.training.trainer import Trainer
    config = {
        "training": {
            "batch_size": 2,
            "trainer_args": {"max_epochs": 1, "limit_val_batches": limit},
            "evaluation": {},
        },
        "lr_scheduler": {"base_lr": 1e-3},
        "dataset": {},
    }
    return Trainer(config, tmp_path / "run", n_devices=1)


@pytest.mark.parametrize("limit,expected", [(1.0, 5), (0.5, 2), (0.2, 1),
                                            (3, 3), (0.0, 0)])
def test_limit_val_batches(tmp_path, limit, expected):
    rng = np.random.default_rng(0)
    batches = [make_complex_batch(rng, b=2, p=24, p_valid=(20, 16))
               for _ in range(5)]
    trainer = _make_trainer(tmp_path, limit)

    seen = []

    def eval_step(params, batch, key):
        seen.append(batch)
        return {"val total loss": np.float32(1.0)}

    out = trainer.validate(None, _FakeDataModule(batches), eval_step,
                           key=__import__("jax").random.key(0))
    assert len(seen) == expected
    if expected:
        assert out["val total loss"] == pytest.approx(1.0)
