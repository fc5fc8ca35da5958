"""Tier-2 behavioral tests — mirrors of the reference's integration suite
(SURVEY.md §5): job lifecycle, failure propagation with origin link, retry
semantics (SecondTimeLucky), admission control, partitioned fan-out, and the
connector layer.
"""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from fossa_spark.connect import AccessMode, Connect, EngineUrl, MultiConnect, connector_resolver
from fossa_spark.engine import CapacityExceeded, Engine, InvalidTaskSpec, Job, JobStatus
from fossa_spark.model import (
    LocalThreadStrategy,
    Model,
    PartitionedModel,
    PartitionOption,
    SubTaskFailed,
)


class HelloModel(Model):
    def build(self):
        return "hello_world"


class FailingModel(Model):
    def build(self):
        raise ValueError("deliberate failure")


class SquaresModel(PartitionedModel):
    """Arbitrary-Python subtasks fanned out via parallelize().map()."""

    def partition_plea(self):
        return PartitionOption(minimum=1, maximum=8, optimal=4)

    def partition_slice(self, n):
        return [("square", {"x": i}) for i in range(8)]

    def square(self, x: int) -> int:
        return x * x

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.completed = []

    def partition_subtask_complete(self, method_name, kwargs, return_value):
        self.completed.append((method_name, kwargs["x"], return_value))


class SecondTimeLucky(PartitionedModel):
    """Reference retry-semantics fixture (examples/example_etl.py:50-79):
    each subtask fails on first attempt, succeeds on retry, using a file
    marker as the idempotency flag."""

    strategy_cls = LocalThreadStrategy
    marker_dir: str = ""

    def partition_slice(self, n):
        return [("attempt", {"sub_id": s}) for s in ("a", "b", "c")]

    def attempt(self, sub_id: str) -> str:
        marker = os.path.join(type(self).marker_dir, f"{sub_id}.marker")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("tried")
            raise RuntimeError(f"first attempt for {sub_id} fails")
        return f"{sub_id}-ok"


class AlwaysFails(PartitionedModel):
    strategy_cls = LocalThreadStrategy
    def partition_slice(self, n):
        return [("boom", {"sub_id": "x"})]
    def boom(self, sub_id: str):
        raise RuntimeError("permanent failure")


class SlowModel(Model):
    def build(self):
        time.sleep(0.6)
        return "slow_done"


@pytest.fixture
def engine(spark):
    eng = Engine(spark, max_concurrent_tasks=2)
    yield eng
    eng.shutdown(wait=False)


def test_job_lifecycle_complete(engine):
    engine.register_model(HelloModel)
    tid = engine.submit(Job(model_class="HelloModel"))
    res = engine.wait(tid)
    assert res.status is JobStatus.COMPLETE
    summary = engine.task_summary(tid)
    assert summary["status"] == "complete"
    assert summary["results"] == "hello_world"
    assert engine.task_summary("nope")["status"] == "unknown"


def test_job_failure_captured(engine):
    engine.register_model(FailingModel)
    tid = engine.submit(Job(model_class="FailingModel"))
    res = engine.wait(tid)
    assert res.status is JobStatus.FAILED
    assert "ValueError" in res.error
    assert any("deliberate failure" in line for line in res.traceback)


def test_previous_tasks_ordered_by_completion(engine):
    """previous_tasks lists finished jobs by completion time, not submission
    order (reference views order by when work ended)."""
    engine.register_model(SlowModel)
    engine.register_model(HelloModel)
    slow = engine.submit(Job(model_class="SlowModel"))
    fast = engine.submit(Job(model_class="HelloModel"))
    engine.wait(slow), engine.wait(fast)
    prev = engine.node_summary()["previous_tasks"]
    assert prev.index(fast) < prev.index(slow), prev


def test_allowlist_rejects_unknown_and_duplicates(engine):
    engine.register_model(HelloModel)
    with pytest.raises(InvalidTaskSpec):
        engine.register_model(HelloModel)
    with pytest.raises(InvalidTaskSpec):
        engine.submit(Job(model_class="NotRegistered"))


def test_admission_control(engine):
    engine.register_model(SlowModel)
    t1 = engine.submit(Job(model_class="SlowModel"))
    t2 = engine.submit(Job(model_class="SlowModel"))
    with pytest.raises(CapacityExceeded):
        engine.submit(Job(model_class="SlowModel"), block_if_full=False)
    engine.wait(t1), engine.wait(t2)
    assert engine.has_processing_capacity()


def test_partitioned_fanout_spark(spark):
    m = SquaresModel(spark=spark)
    results = m.go()
    assert sorted(results) == [i * i for i in range(8)]
    assert len(m.completed) == 8


def test_retry_second_time_lucky(spark):
    with tempfile.TemporaryDirectory() as d:
        SecondTimeLucky.marker_dir = d
        m = SecondTimeLucky(spark=spark)
        results = m.go()
        assert sorted(results) == ["a-ok", "b-ok", "c-ok"]


def test_failure_propagates_with_origin(spark, engine):
    engine.register_model(AlwaysFails)
    tid = engine.submit(Job(model_class="AlwaysFails"))
    res = engine.wait(tid)
    assert res.status is JobStatus.FAILED
    assert res.failure_origin is not None and "boom" in res.failure_origin
    assert engine.task_summary(tid)["failure_origin_task_id"] == res.failure_origin


def test_subtask_failure_raises_after_retries(spark):
    m = AlwaysFails(spark=spark)
    with pytest.raises(SubTaskFailed):
        m.go()


def test_engine_url_parse_and_resolver():
    with connector_resolver.context(output="/tmp/out", run_id="r1"):
        assert connector_resolver.resolve("csv://{output}/{run_id}.csv") == "csv:///tmp/out/r1.csv"
        url = EngineUrl.parse(connector_resolver.resolve("parquet://{output}/data"))
        assert url.scheme == "parquet" and url.path == "/tmp/out/data"
    with pytest.raises(KeyError):
        connector_resolver.resolve("csv://{undefined}/x.csv")
    with pytest.raises(ValueError):
        EngineUrl.parse("ftp://host/x")


def test_connect_roundtrip_csv(spark):
    with tempfile.TemporaryDirectory() as d:
        with connector_resolver.context(out=d):
            sink = Connect(engine_url="csv://{out}/result", access=AccessMode.WRITE,
                           schema="name string, n bigint")
            df = spark.createDataFrame([("hello_world", 1), ("again", 2)], "name string, n bigint")
            sink.write(df)
            assert sink.datasource_exists
            back = sink.read(spark)
            assert sorted((r.name, r.n) for r in back.collect()) == [
                ("again", 2), ("hello_world", 1)]


def test_connect_roundtrip_ndjson(spark):
    """ndjson:// is json-lines: one JSON object per line on disk."""
    with tempfile.TemporaryDirectory() as d:
        with connector_resolver.context(out=d):
            sink = Connect(engine_url="ndjson://{out}/result", access=AccessMode.WRITE,
                           schema="name string, n bigint")
            sink.write(spark.createDataFrame([("a", 1), ("b", 2)], "name string, n bigint"))
            back = sink.read(spark)
            assert sorted((r.name, r.n) for r in back.collect()) == [("a", 1), ("b", 2)]
            # wire format really is one object per line
            import glob
            import json as _json

            lines = []
            for p in glob.glob(f"{d}/result/part-*"):
                with open(p, encoding="utf-8") as fh:
                    lines += [ln for ln in fh.read().splitlines() if ln]
            assert sorted(_json.loads(ln)["name"] for ln in lines) == ["a", "b"]


def test_connect_roundtrip_tsv(spark):
    with tempfile.TemporaryDirectory() as d:
        with connector_resolver.context(out=d):
            sink = Connect(engine_url="tsv://{out}/result", access=AccessMode.WRITE,
                           schema="name string, n bigint")
            sink.write(spark.createDataFrame([("x\ty?", 1), ("b", 2)], "name string, n bigint"))
            back = sink.read(spark)
            assert sorted((r.name, r.n) for r in back.collect()) == [("b", 2), ("x\ty?", 1)]


def test_connect_roundtrip_sqlite(spark):
    """sqlite:// passthrough — driver-side, control-plane-sized data; table
    name in the URL fragment."""
    with tempfile.TemporaryDirectory() as d:
        url = f"sqlite://{d}/ctrl.db#specs"
        sink = Connect(engine_url=url, access=AccessMode.READWRITE,
                       schema="name string, n bigint")
        sink.write(spark.createDataFrame([("a", 1), ("b", 2)], "name string, n bigint"))
        back = sink.read(spark)
        assert sorted((r.name, r.n) for r in back.collect()) == [("a", 1), ("b", 2)]
        # overwrite replaces, append accumulates
        sink.write(spark.createDataFrame([("c", 3)], "name string, n bigint"))
        assert sink.read(spark).count() == 1
        sink.write(spark.createDataFrame([("d", 4)], "name string, n bigint"),
                   mode="append")
        assert sink.read(spark).count() == 2
        with pytest.raises(ValueError, match="invalid sqlite table"):
            Connect(engine_url=f"sqlite://{d}/ctrl.db#bad;drop").read(spark)


def test_sqlite_sink_row_ceiling(spark, monkeypatch):
    """The sqlite:// sink is driver-side (toPandas) — above the hard row
    ceiling it must refuse loudly instead of OOMing the driver (VERDICT
    r5 item 7).  Ceiling monkeypatched low so the test stays fast."""
    monkeypatch.setattr(Connect, "SQLITE_MAX_ROWS", 10)
    with tempfile.TemporaryDirectory() as d:
        sink = Connect(engine_url=f"sqlite://{d}/big.db#t",
                       access=AccessMode.WRITE)
        big = spark.range(11).selectExpr("id AS n")
        with pytest.raises(ValueError, match="capped at 10 rows"):
            sink.write(big)
        # at the ceiling exactly: allowed
        sink.write(spark.range(10).selectExpr("id AS n"))


def test_connect_read_only_guard(spark):
    src = Connect(engine_url="parquet:///root/testdata/sf0.001/region.parquet")
    assert src.read(spark).count() == 5
    with pytest.raises(PermissionError):
        src.write(src.read(spark))


def test_multi_connect_templated_outputs(spark):
    with tempfile.TemporaryDirectory() as d:
        with connector_resolver.context(out=d):
            multi = MultiConnect(template="parquet://{out}/{subtask_id}_results")
            for sid in ("a", "b"):
                c = multi.new_dataset(subtask_id=sid)
                c.write(spark.range(3).withColumn("sid", F.lit(sid)))
            assert len(multi.datasets) == 2
            total = spark.read.parquet(f"{d}/*_results").count()
            assert total == 6


class StaggeredModel(PartitionedModel):
    """Reference rate-limiting fixture analogue (StaggeredEtl,
    reference examples/example_etl.py:129-162 + test_basics.py:252-336):
    N sleeping subtasks; more workers → proportionally less wall-clock."""

    strategy_cls = LocalThreadStrategy
    workers: int = 2

    def partition_plea(self):
        return PartitionOption(minimum=1, maximum=self.workers,
                               optimal=self.workers)

    def partition_slice(self, n):
        return [("nap", {"i": i}) for i in range(12)]

    def nap(self, i: int) -> float:
        time.sleep(0.2)
        return 0.2


def test_worker_speedup(spark):
    """12 × 0.2s subtasks: 12 workers must beat 2 workers by ≥ 2×
    (the reference asserts ≥ 6× for 12-vs-2 over RabbitMQ; thread-pool
    scheduling overhead is lower so the conservative bound is safe)."""
    def run(workers: int) -> float:
        m = StaggeredModel(spark=spark)
        m.workers = workers
        t0 = time.monotonic()
        results = m.go()
        assert len(results) == 12
        return time.monotonic() - t0

    slow = run(2)    # ceil(12/2) * 0.2 = 1.2s minimum
    fast = run(12)   # one wave: ~0.2s
    assert slow / fast >= 2.0, f"speedup {slow / fast:.2f} (slow={slow:.2f}s fast={fast:.2f}s)"


class SparkSideAgg(PartitionedModel):
    """PartitionedModel fanned out via Spark executors (TaskParallelStrategy),
    submitted through the Engine like any job."""

    def partition_slice(self, n):
        return [("crunch", {"base": b}) for b in range(6)]

    def crunch(self, base: int) -> int:
        return sum(i * i for i in range(base * 1000, (base + 1) * 1000))


def test_engine_runs_spark_fanout_model(spark):
    eng = Engine(spark, max_concurrent_tasks=2)
    eng.register_model(SparkSideAgg)
    tid = eng.submit(Job(model_class="SparkSideAgg"))
    res = eng.wait(tid)
    assert res.status is JobStatus.COMPLETE
    expected = [sum(i * i for i in range(b * 1000, (b + 1) * 1000)) for b in range(6)]
    assert sorted(res.value) == sorted(expected)
    eng.shutdown(wait=False)


class GreedyModel(PartitionedModel):
    """Pleads for 128 workers; records what the clamp actually granted."""

    strategy_cls = LocalThreadStrategy
    granted: int | None = None

    def partition_plea(self):
        return PartitionOption(minimum=1, maximum=128, optimal=128)

    def partition_slice(self, n):
        type(self).granted = n
        return [("noop", {"i": i}) for i in range(2)]

    def noop(self, i):
        return i


def test_engine_capacity_clamps_fanout(spark):
    """Reference parity (process.py:185-195, rabbit_mq/process.py:44): the
    node's capacity reaches the fan-out clamp — a model pleading optimal=128
    gets the engine's max_concurrent_tasks instead."""
    engine = Engine(spark, max_concurrent_tasks=3)
    engine.register_model(GreedyModel)
    GreedyModel.granted = None
    tid = engine.submit(Job(model_class="GreedyModel"))
    assert engine.wait(tid).status is JobStatus.COMPLETE
    assert GreedyModel.granted == 3

    # outside an Engine, the model's own plea governs (no runtime clamp)
    GreedyModel.granted = None
    GreedyModel(spark=spark).go()
    assert GreedyModel.granted == 128


class TwinSubtasks(PartitionedModel):
    """Two IDENTICAL subtasks whose first call each fails: per-instance
    retry budgets (keyed by slice index) must let both succeed — content-
    hash keying would let the second one's first failure exhaust the
    shared budget and raise SubTaskFailed."""

    strategy_cls = LocalThreadStrategy
    _calls = 0
    _lock = __import__("threading").Lock()

    def partition_slice(self, n):
        return [("work", {}), ("work", {})]

    def work(self):
        cls = type(self)
        with cls._lock:
            cls._calls += 1
            call = cls._calls
        if call <= 2:  # round one: both instances fail
            raise RuntimeError(f"transient failure #{call}")
        return "ok"


def test_identical_subtasks_get_independent_retry_budgets(spark):
    TwinSubtasks._calls = 0
    assert TwinSubtasks(spark=spark).go() == ["ok", "ok"]
    assert TwinSubtasks._calls == 4  # 2 failures + 2 retried successes


def test_thread_strategy_tolerates_empty_subtask_list(spark):
    out = list(LocalThreadStrategy().run(HelloModel(spark=spark), [], None))
    assert out == []


def test_process_strategy_runs_and_isolates_hard_crash(spark):
    """LocalProcessStrategy gives reference-parity process isolation: a
    subtask that kills its worker outright (segfault stand-in: os._exit)
    fails THAT subtask after retries — the driver survives, and healthy
    subtasks in other processes still return values."""
    import pytest

    from fossa_spark.model import LocalProcessStrategy, SubTaskFailed

    class ProcModel(PartitionedModel):
        strategy_cls = LocalProcessStrategy

        def partition_slice(self, n):
            return [("square", {"x": 3}), ("square", {"x": 4})]

        def square(self, x):
            return x * x

    assert sorted(ProcModel(spark=spark).go()) == [9, 16]

    class CrashModel(PartitionedModel):
        strategy_cls = LocalProcessStrategy

        def partition_slice(self, n):
            return [("die", {})]

        def die(self):
            import os

            os._exit(42)  # hard kill: no exception, no cleanup

    with pytest.raises(SubTaskFailed, match="BrokenProcessPool"):
        CrashModel(spark=spark).go()


def test_under_yielding_strategy_fails_loudly(spark):
    """A strategy that yields fewer results than subtasks must raise, not
    silently drop the trailing subtasks (no result, no retry)."""
    import pytest

    from fossa_spark.model import SubTaskFailed

    class Truncating(LocalThreadStrategy):
        def run(self, model, subtasks, workers):
            results = list(super().run(model, subtasks, workers))
            yield from results[:-1]  # drop the last result

    class TwoTask(PartitionedModel):
        strategy_cls = Truncating

        def partition_slice(self, n):
            return [("greet", {}), ("greet", {})]

        def greet(self):
            return "hi"

    with pytest.raises(SubTaskFailed, match="yielded 1 results for 2"):
        TwoTask(spark=spark).go()
