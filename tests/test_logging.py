import json

from pharmaforge_tpu.training.logging import MetricsLogger, generate_run_id


def test_generate_run_id():
    ids = {generate_run_id() for _ in range(20)}
    assert len(ids) == 20
    assert all(len(i) == 8 and i.isalnum() for i in ids)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(tmp_path, {"mode": "disabled"})
    logger.log({"train total loss": 1.5, "lr": 1e-3}, step=1)
    logger.log({"val total loss": 1.2}, step=2)
    logger.finish()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1
    assert rec["train total loss"] == 1.5
    assert "time" in rec


def test_metrics_logger_wandb_missing_is_fine(tmp_path):
    # wandb is not installed here: online mode must fall back to JSONL
    logger = MetricsLogger(tmp_path, {"mode": "online", "project": "x"})
    logger.log({"a": 1.0}, step=1)
    logger.finish()
    assert (tmp_path / "metrics.jsonl").exists()
