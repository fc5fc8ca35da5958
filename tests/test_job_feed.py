"""C2 parity: external job-feed intake (reference integration
tests/integration_tests/test_basics.py:86-104 analogue — specs arrive on a
durable feed, the node consumes and runs them; redelivery is absorbed)."""

from __future__ import annotations

import json
import os

from fossa_spark.engine import Engine, JobStatus
from fossa_spark.job_feed import JobFeed
from tests.test_engine import HelloModel


def _write_specs(spec_dir: str, fname: str, lines: list[dict | str]) -> None:
    os.makedirs(spec_dir, exist_ok=True)
    path = os.path.join(spec_dir, fname)
    with open(path + ".tmp", "w") as f:
        for line in lines:
            f.write((line if isinstance(line, str) else json.dumps(line)) + "\n")
    os.rename(path + ".tmp", path)  # atomic publish, as a real drop-zone would


def test_job_feed_intake_runs_and_absorbs_redelivery(spark, tmp_path):
    engine = Engine(spark, max_concurrent_tasks=4)
    engine.register_model(HelloModel)
    spec_dir = str(tmp_path / "specs")
    feed = JobFeed(engine, spec_dir, str(tmp_path / "ckpt"))

    _write_specs(
        spec_dir,
        "batch1.jsonl",
        [
            {"model_class": "HelloModel", "task_id": "t1"},
            "{not json",  # poison line: dropped, must not wedge the feed
            {"method": "go"},  # no model_class: dropped
            {"model_class": "NotRegistered", "task_id": "t_bad"},  # 412 analogue
        ],
    )
    feed.drain_available()
    assert engine.wait("t1").status is JobStatus.COMPLETE
    assert engine.task_summary("t1")["results"] == "hello_world"
    assert engine.task_summary("t_bad")["status"] == JobStatus.UNKNOWN.value

    # at-least-once redelivery of t1 (new file, same task_id) is absorbed;
    # a genuinely new spec in the same batch still runs
    _write_specs(
        spec_dir,
        "batch2.jsonl",
        [
            {"model_class": "HelloModel", "task_id": "t1"},
            {"model_class": "HelloModel", "task_id": "t2"},
        ],
    )
    feed.drain_available()
    assert engine.wait("t2").status is JobStatus.COMPLETE
    ran = [t for t in engine.node_summary()["previous_tasks"]]
    assert ran.count("t1") == 1  # not resubmitted

    # checkpoint is the delivery ledger: a fresh drain with no new files
    # submits nothing (previous_tasks unchanged)
    before = engine.node_summary()["previous_tasks"]
    feed.drain_available()
    assert engine.node_summary()["previous_tasks"] == before
