"""Engine: job registry, admission control, submit/status API.

Control-plane parity with the reference governor (SURVEY.md §2a), with
Spark's scheduler doing the actual work the governor hand-rolled:

| Reference (file:line)                                   | Here |
|---------------------------------------------------------|------|
| Governor.set_accepted_class, allowlist checks           | Engine.register_model / submit validation |
|   (lib/fossa/control/governor.py:323-347,371-373)       |      |
| capacity = max_concurrent - running (governor.py:229)   | Engine._capacity + bounded executor pool |
| process-per-task isolation (governor.py:242-285)        | per-job thread + Spark job group (cancelable) |
| TaskMessage/ResultsMessage (control/message.py)         | Job dataclass + JobResult in the registry |
| status running/complete/failed/unknown                  | JobStatus enum, same strings |
|   (lib/fossa/views/controller.py:32-37)                 |      |
| failure propagation w/ origin link (process.py:113-141) | JobResult.failure_origin + traceback list |
| node_summary/task_summary API (views/api.py:75-103)     | Engine.node_summary()/task_summary() |
| graceful shutdown, SIGTERM ETLs (governor.py:421-451)   | Engine.shutdown() → cancelJobGroup + pool drain |
"""

from __future__ import annotations

import threading
import time
import traceback
import uuid
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import SparkSession

from fossa_spark.connect import connector_resolver
from fossa_spark.model import Model, SubTaskFailed


class JobStatus(str, Enum):
    RUNNING = "running"
    COMPLETE = "complete"
    FAILED = "failed"
    UNKNOWN = "unknown"


@dataclass
class Job:
    """Job spec (the reference's TaskMessage, lib/fossa/control/message.py:10-19)."""

    model_class: str
    method: str = "go"
    method_kwargs: dict[str, Any] = field(default_factory=dict)
    model_construction_kwargs: dict[str, Any] = field(default_factory=dict)
    resolver_context: dict[str, str] = field(default_factory=dict)
    partition_initialise_kwargs: dict[str, Any] = field(default_factory=dict)
    task_id: str | None = None


@dataclass
class JobResult:
    task_id: str
    status: JobStatus
    started: float
    finished: float | None = None
    value: Any = None
    error: str | None = None
    traceback: list[str] | None = None
    failure_origin: str | None = None  # subtask identity, if a subtask failed


class InvalidTaskSpec(ValueError):
    pass


class CapacityExceeded(RuntimeError):
    pass


class Engine:
    """Submit/track/cancel Model runs on a SparkSession."""

    def __init__(self, spark: SparkSession, max_concurrent_tasks: int | None = None,
                 cpu_task_ratio: float = 1.0):
        """``max_concurrent_tasks`` defaults to cpu_count × cpu_task_ratio —
        the reference's CPU-derived capacity (RuntimeKnowledge.cpu_task_ratio,
        reference lib/fossa/app.py:81-83)."""
        import os

        self.spark = spark
        if max_concurrent_tasks is None:
            max_concurrent_tasks = max(1, int((os.cpu_count() or 4) * cpu_task_ratio))
        self.max_concurrent_tasks = max_concurrent_tasks
        self._accepted: dict[str, type[Model]] = {}
        self._jobs: dict[str, JobResult] = {}
        self._futures: dict[str, Future] = {}
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_concurrent_tasks)

    # -- registry (allowlist semantics: governor.py:323-347)
    def register_model(self, model_cls: type[Model]) -> None:
        name = model_cls.__name__
        if name in self._accepted:
            raise InvalidTaskSpec(f"duplicate accepted class: {name}")
        self._accepted[name] = model_cls

    # -- capacity (governor.py:123-130,229)
    def _running(self) -> int:
        return sum(1 for r in self._jobs.values() if r.status is JobStatus.RUNNING)

    @property
    def capacity(self) -> int:
        with self._lock:
            return self.max_concurrent_tasks - self._running()

    def has_processing_capacity(self) -> bool:
        return self.capacity > 0

    # -- submit (api.py:28-72 + governor.py:349-403)
    def submit(self, job: Job, block_if_full: bool = False,
               timeout: float = 1.0) -> str:
        if job.model_class not in self._accepted:
            raise InvalidTaskSpec(f"class not in accepted list: {job.model_class}")
        deadline = time.monotonic() + timeout
        task_id = job.task_id or uuid.uuid4().hex[:8]
        while True:
            # capacity check and RUNNING insert must be one atomic step —
            # concurrent submits (ThreadingHTTPServer) would otherwise both
            # pass the check before either registers
            with self._lock:
                if self.max_concurrent_tasks - self._running() > 0:
                    self._jobs[task_id] = JobResult(task_id, JobStatus.RUNNING, time.time())
                    break
            if not block_if_full or time.monotonic() > deadline:
                raise CapacityExceeded(
                    f"no processing capacity ({self.max_concurrent_tasks} running)"
                )
            time.sleep(0.02)
        fut = self._pool.submit(self._run, task_id, job)
        self._futures[task_id] = fut
        return task_id

    def _run(self, task_id: str, job: Job) -> None:
        cls = self._accepted[job.model_class]
        rec = self._jobs[task_id]
        # per-job Spark job group → cancellable, visible in the UI
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", task_id)
        try:
            with connector_resolver.context(**job.resolver_context):
                model = cls(spark=self.spark, **job.model_construction_kwargs)
                # node capacity reaches the fan-out clamp (reference
                # process.py:185-195); on_start() runs after so a model
                # may still override for its environment
                model.runtime_max_workers = self.max_concurrent_tasks
                model.on_start()  # lifecycle hook (reference process.py:45-55)
                # per-task partition init (reference process.py:91-92); also
                # recorded on the model so fan-out strategies ship the same
                # kwargs to executor-side subtask runs
                model.partition_initialise_kwargs = dict(job.partition_initialise_kwargs)
                if job.partition_initialise_kwargs and hasattr(model, "partition_initialise"):
                    model.partition_initialise(**job.partition_initialise_kwargs)
                value = getattr(model, job.method)(**job.method_kwargs)
            rec.value = value
            rec.status = JobStatus.COMPLETE
        except SubTaskFailed as e:
            rec.status = JobStatus.FAILED
            rec.error = f"{type(e).__name__}: {e}"
            rec.traceback = traceback.format_exc().splitlines()
            rec.failure_origin = f"{e.method}({e.kwargs})"
        except Exception as e:  # noqa: BLE001 - job errors are data
            rec.status = JobStatus.FAILED
            rec.error = f"{type(e).__name__}: {e}"
            rec.traceback = traceback.format_exc().splitlines()
        finally:
            rec.finished = time.time()
            self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    # -- observe (views/controller.py:5-80, views/api.py:75-103)
    def task_summary(self, task_id: str) -> dict[str, Any]:
        rec = self._jobs.get(task_id)
        if rec is None:
            return {"task_id": task_id, "status": JobStatus.UNKNOWN.value}
        return {
            "task_id": rec.task_id,
            "status": rec.status.value,
            "started": rec.started,
            "finished": rec.finished,
            "results": rec.value if rec.status is JobStatus.COMPLETE else None,
            "error": rec.error,
            "failure_origin_task_id": rec.failure_origin,
        }

    def node_summary(self) -> dict[str, Any]:
        with self._lock:
            running = [t for t, r in self._jobs.items() if r.status is JobStatus.RUNNING]
            # ordered by completion time (reference orders previous_tasks by
            # when they finished, not when they were submitted)
            done = [
                t
                for t, r in sorted(
                    self._jobs.items(), key=lambda kv: kv[1].finished or 0.0
                )
                if r.status is not JobStatus.RUNNING
            ]
        return {
            "max_concurrent_tasks": self.max_concurrent_tasks,
            "available_processing_capacity": self.capacity,
            "running_tasks": running,
            "previous_tasks": done[-20:],
            "accepted_classes": sorted(self._accepted),
        }

    def wait(self, task_id: str, timeout: float | None = None) -> JobResult:
        fut = self._futures.get(task_id)
        if fut is not None:
            fut.result(timeout=timeout)
        return self._jobs[task_id]

    # -- shutdown / kill (governor.py:421-451)
    def cancel(self, task_id: str) -> None:
        self.spark.sparkContext.cancelJobGroup(task_id)

    def shutdown(self, wait: bool = True) -> None:
        with self._lock:
            running = [t for t, r in self._jobs.items() if r.status is JobStatus.RUNNING]
        for task_id in running:
            self.cancel(task_id)
        self._pool.shutdown(wait=wait, cancel_futures=True)
