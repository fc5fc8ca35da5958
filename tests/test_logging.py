"""Concrete external log sinks (reference logging_cloudwatch.py:9-91
analogue): sidecar propagation through Model.log, batch buffering, and the
pickle-safety that lets a sink ride along to executor-side subtasks."""

from __future__ import annotations

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fossa_spark.logging_sinks import BufferedFileLogger, BufferedHttpLogger
from fossa_spark.model import Model


class ChattyModel(Model):
    def build(self):
        self.log("starting", "INFO")
        self.log("trouble", "WARNING")
        return "done"


def test_file_sink_via_model_log(tmp_path):
    path = str(tmp_path / "sidecar.jsonl")
    sink = BufferedFileLogger(path, flush_every=1)
    m = ChattyModel()
    m.attach_logger(sink)
    m.go()
    sink.close()
    lines = [json.loads(x) for x in open(path)]
    assert [(d["log_level"], d["message"]) for d in lines] == [
        ("INFO", "starting"),
        ("WARNING", "trouble"),
    ]


def test_file_sink_buffers_and_flushes(tmp_path):
    path = str(tmp_path / "buf.jsonl")
    sink = BufferedFileLogger(path, flush_every=2)
    assert sink.write("one")
    assert not (tmp_path / "buf.jsonl").exists()  # buffered, not yet written
    assert sink.write("two")  # hits flush_every
    assert len(open(path).readlines()) == 2
    sink.write("three")
    sink.flush()
    assert len(open(path).readlines()) == 3


def test_sinks_are_pickle_safe(tmp_path):
    path = str(tmp_path / "p.jsonl")
    sink = BufferedFileLogger(path, flush_every=1)
    sink.write("before pickle")
    clone = pickle.loads(pickle.dumps(sink))  # only config crosses
    assert clone.path == path and clone.flush_every == 1
    clone.write("after pickle")  # lazy handle reopens on first write
    clone.close()
    sink.close()
    msgs = [json.loads(x)["message"] for x in open(path)]
    assert set(msgs) == {"before pickle", "after pickle"}

    http_sink = BufferedHttpLogger("http://127.0.0.1:1/logs", flush_every=8)
    h2 = pickle.loads(pickle.dumps(http_sink))
    assert (h2.url, h2.flush_every, h2.timeout) == (
        http_sink.url, http_sink.flush_every, http_sink.timeout)


def test_http_sink_batches_and_survives_outage(tmp_path):
    received: list[dict] = []

    class Capture(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            return

    server = ThreadingHTTPServer(("127.0.0.1", 0), Capture)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/logs"
        sink = BufferedHttpLogger(url, flush_every=2)
        sink.write("a")
        assert received == []  # buffered
        assert sink.write("b")  # batch of 2 posted
        assert len(received) == 1 and len(received[0]["logEvents"]) == 2
        payload = json.loads(received[0]["logEvents"][0]["message"])
        assert payload == {"log_level": "INFO", "message": "a"}
    finally:
        server.shutdown()
        server.server_close()

    # unreachable endpoint: write/flush report failure, never raise — and the
    # batch is RETAINED for the next attempt (durability parity with the
    # file sink), capped so a long outage can't grow the buffer unboundedly
    dead = BufferedHttpLogger("http://127.0.0.1:1/logs", flush_every=1)
    assert dead.write("lost") is False
    assert len(dead._buffer) == 1  # kept, not dropped
    dead.flush()
    assert len(dead._buffer) == 1
    dead.MAX_BUFFERED = 3
    for i in range(6):
        dead.write(f"m{i}")
    assert len(dead._buffer) == 3  # oldest evicted at the cap
