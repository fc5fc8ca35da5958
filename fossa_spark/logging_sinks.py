"""Concrete external log sinks for Model.attach_logger.

The reference ships a pluggable logger contract plus one remote
implementation (reference lib/fossa/tools/logging.py:19-74 and
lib/fossa/tools/logging_cloudwatch.py:9-91). Parity notes:

- Sinks are PICKLE-SAFE: only config survives ``__getstate__``; live
  handles/clients are rebuilt lazily on first write after unpickling —
  exactly the reference's CloudwatchLogs ``__getstate__``/``__setstate__``
  shape, and the property that lets a sink ride along when a model class is
  cloudpickled to Spark executors (TaskParallelStrategy ships code by
  value).
- Delivery failure must never fail the job: ``write`` returns False on
  error instead of raising (the reference returns the HTTP-status check).
- Remote sinks buffer and send in batches — one put per line at 100 TB-job
  log volume would throttle immediately (CloudWatch's put_log_events is a
  batch API for the same reason).
"""

from __future__ import annotations

import json
import threading
import time
from typing import Any


class AbstractExternalLogger:
    """Sink contract: ``write(msg, level)``. Instances are callable so they
    plug straight into ``Model.attach_logger`` (which fans out
    ``sink(msg, level)``)."""

    def write(self, msg: str, level: str = "INFO") -> bool:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, msg: str, level: str = "INFO") -> bool:
        return self.write(msg, level)

    def flush(self) -> None:
        return None

    def close(self) -> None:
        self.flush()


def _structured(msg: str, level: str) -> dict[str, Any]:
    return {"timestamp_ms": int(time.time() * 1000), "log_level": level, "message": msg}


class BufferedFileLogger(AbstractExternalLogger):
    """JSON-lines sidecar log file, buffered.

    Lazy handle + config-only pickling: an unpickled copy (e.g. inside an
    executor-side subtask) reopens the file in append mode on first write.
    """

    def __init__(self, path: str, flush_every: int = 16):
        self.path = path
        self.flush_every = max(1, flush_every)
        self._fh = None
        self._buffer: list[str] = []
        self._lock = threading.Lock()

    def __getstate__(self) -> dict[str, Any]:
        return {"path": self.path, "flush_every": self.flush_every}

    def __setstate__(self, state: dict[str, Any]) -> None:
        self.__init__(state["path"], state["flush_every"])

    def write(self, msg: str, level: str = "INFO") -> bool:
        line = json.dumps(_structured(msg, level))
        try:
            with self._lock:
                self._buffer.append(line)
                if len(self._buffer) >= self.flush_every:
                    self._flush_locked()
            return True
        except OSError:
            return False

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buffer:
            return
        if self._fh is None:
            self._fh = open(self.path, "a", encoding="utf-8")
        self._fh.write("\n".join(self._buffer) + "\n")
        self._fh.flush()
        self._buffer.clear()

    def close(self) -> None:
        self.flush()
        with self._lock:
            if self._fh is not None:
                self._fh.close()
                self._fh = None


class BufferedHttpLogger(AbstractExternalLogger):
    """POST batches of structured log events to an HTTP endpoint (stdlib
    urllib — no extra dependency). The wire shape mirrors the reference's
    CloudWatch batch: ``{"logEvents": [{"timestamp": ms, "message": json}]}``.
    """

    # On delivery failure the batch is retained for the next flush attempt
    # (matching BufferedFileLogger's durability); the buffer is capped so a
    # persistent outage degrades to dropping the OLDEST events, not OOM.
    MAX_BUFFERED = 4096

    def __init__(self, url: str, flush_every: int = 16, timeout: float = 2.0):
        self.url = url
        self.flush_every = max(1, flush_every)
        self.timeout = timeout
        self._buffer: list[dict[str, Any]] = []
        self._lock = threading.Lock()

    def __getstate__(self) -> dict[str, Any]:
        return {"url": self.url, "flush_every": self.flush_every,
                "timeout": self.timeout}

    def __setstate__(self, state: dict[str, Any]) -> None:
        self.__init__(state["url"], state["flush_every"], state["timeout"])

    def write(self, msg: str, level: str = "INFO") -> bool:
        ev = _structured(msg, level)
        with self._lock:
            self._buffer.append(
                {"timestamp": ev["timestamp_ms"],
                 "message": json.dumps({"log_level": level, "message": msg})}
            )
            if len(self._buffer) >= self.flush_every:
                return self._flush_locked()
        return True

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> bool:
        if not self._buffer:
            return True
        import urllib.error
        import urllib.request

        body = json.dumps({"logEvents": self._buffer}).encode()
        req = urllib.request.Request(
            self.url, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                ok = 200 <= resp.status < 300
        except (urllib.error.URLError, OSError):
            ok = False  # log delivery must never fail the job
        if ok:
            self._buffer.clear()
        elif len(self._buffer) > self.MAX_BUFFERED:
            del self._buffer[: -self.MAX_BUFFERED]
        return ok


class CloudwatchLogsLogger(AbstractExternalLogger):
    """AWS CloudWatch Logs sink — reference logging_cloudwatch.py:9-91
    re-expressed. Requires boto3 (not bundled); the import is deferred to
    first write so the class is importable without it."""

    def __init__(self, group_name: str, stream_name: str, region_name: str):
        self.group_name = group_name
        self.stream_name = stream_name
        self.region_name = region_name
        self._client = None  # lazy; never pickled

    def __getstate__(self) -> dict[str, Any]:
        return {"group_name": self.group_name, "stream_name": self.stream_name,
                "region_name": self.region_name}

    def __setstate__(self, state: dict[str, Any]) -> None:
        self.__init__(**state)

    @property
    def client(self):
        if self._client is None:
            import boto3  # deferred: optional dependency

            self._client = boto3.client("logs", region_name=self.region_name)
        return self._client

    def write(self, msg: str, level: str = "INFO") -> bool:
        ev = _structured(msg, level)
        try:
            response = self.client.put_log_events(
                logGroupName=self.group_name,
                logStreamName=self.stream_name,
                logEvents=[{"timestamp": ev["timestamp_ms"],
                            "message": json.dumps({"log_level": level,
                                                   "message": msg})}],
            )
        except ImportError:
            raise  # missing boto3 is a config error, not a delivery failure
        except Exception:
            # network/throttle/auth errors: delivery failure must never fail
            # the job (same contract as the other sinks)
            return False
        return response.get("ResponseMetadata", {}).get("HTTPStatusCode") == 200
