"""HTTP ops surface + worker heartbeat — parity with the reference's
``web`` entry point and status artifact (SURVEY.md §2.A12/I5).

Reference behavior being re-expressed:

* ``/`` , ``/health`` , ``/healthz`` → 200 ``OK`` (ref ``main.py:42-49``)
* ``/worker-status`` → reads ``worker_status.json``, classifies the worker
  ``up`` / ``stale`` (heartbeat older than 120 s) / ``not_started`` /
  ``error`` (ref ``main.py:51-70``)
* ``/sync?table=…&op=…&id=…&token=…`` → token-gated (``SYNC_TOKEN`` env;
  403 on mismatch) trigger of a full or per-record sync
  (ref ``main.py:72-113``)
* the worker writes ``worker_status.json`` ``{"last_heartbeat": ts}``
  every ~30 s (ref ``worker_sync.py:62-79``)

Spark-first differences (deliberate, documented):

* The reference forks ``python sync_oltp_to_olap.py`` per ``/sync`` hit; a
  Spark engine keeps ONE session warm and runs the sync in-process — a
  subprocess per request would pay session startup (~10 s) per event.  The
  response still carries ``returncode`` plus trailing log lines so the
  reference's callers can parse either.
* The worker heartbeat is a ``StreamingQueryListener`` hooked to the CDC
  query's progress events, plus a wall-clock fallback tick — liveness
  derives from the engine's own progress stream, with the same artifact
  shape (a superset: ``last_heartbeat`` plus batch progress fields).
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable
from urllib.parse import parse_qs, urlparse

LOG = logging.getLogger("ops_http")

STALE_AFTER_SECONDS = 120  # ref main.py:61
HEARTBEAT_INTERVAL_SECONDS = 30  # ref worker_sync.py:73


# ---------------------------------------------------------------------------
# Worker status artifact (ref worker_sync.py:62-68)
# ---------------------------------------------------------------------------


def write_worker_status(status_file: str, extra: dict | None = None) -> None:
    """Write the heartbeat artifact: ``{"last_heartbeat": <epoch int>}``
    plus optional progress fields.  Write-then-rename so a concurrent
    ``/worker-status`` read never sees a torn file."""
    payload = {"last_heartbeat": int(time.time())}
    if extra:
        payload.update(extra)
    tmp = f"{status_file}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)
    os.replace(tmp, status_file)


def classify_worker_status(
    status_file: str, stale_after: int = STALE_AFTER_SECONDS
) -> dict:
    """The /worker-status document (ref main.py:52-65): heartbeat age →
    ``up`` | ``stale`` | ``not_started`` | ``error``."""
    status: dict = {"worker": "unknown", "last_heartbeat": None, "age_seconds": None}
    try:
        with open(status_file, encoding="utf-8") as fh:
            data = json.load(fh)
        last = float(data.get("last_heartbeat", 0))
        status["last_heartbeat"] = last
        status["age_seconds"] = int(time.time() - last) if last else None
        status["worker"] = "up" if last and (time.time() - last) < stale_after else "stale"
    except FileNotFoundError:
        status["worker"] = "not_started"
    except Exception:  # torn/corrupt file → error, like the reference
        status["worker"] = "error"
    return status


class HeartbeatListener:
    """StreamingQueryListener writing the status artifact on every CDC
    query lifecycle/progress event (the Spark-native heartbeat source).

    Implemented against the public ``pyspark.sql.streaming.listener``
    surface; registered with ``spark.streams.addListener``.
    """

    def __new__(cls, status_file: str):
        from pyspark.sql.streaming.listener import StreamingQueryListener

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                write_worker_status(status_file, {"event": "started"})

            def onQueryProgress(self, event):
                p = event.progress
                write_worker_status(
                    status_file,
                    {
                        "event": "progress",
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                    },
                )

            def onQueryIdle(self, event):
                write_worker_status(status_file, {"event": "idle"})

            def onQueryTerminated(self, event):
                write_worker_status(status_file, {"event": "terminated"})

        return _Listener()


def start_heartbeat_ticker(
    status_file: str, interval: int = HEARTBEAT_INTERVAL_SECONDS
) -> threading.Event:
    """Wall-clock fallback heartbeat (ref worker_sync.py:74-79): covers
    gaps when the streaming query emits no progress events (long idle
    trigger intervals).  Returns a stop Event; the thread is a daemon."""
    stop = threading.Event()

    def _tick():
        while not stop.is_set():
            write_worker_status(status_file, {"event": "tick"})
            stop.wait(interval)

    threading.Thread(target=_tick, name="heartbeat-ticker", daemon=True).start()
    return stop


# ---------------------------------------------------------------------------
# HTTP handler (ref main.py:41-117)
# ---------------------------------------------------------------------------

SyncRunner = Callable[[str | None, str | None, int | None], dict]


def make_handler(status_file: str, sync_runner: SyncRunner | None):
    """Build the request-handler class closed over config.

    ``sync_runner(table, op, record_id) -> dict`` executes the sync and
    returns a JSON-serializable result; ``None`` disables ``/sync`` (503).
    """

    class OpsHandler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
            if self.path in ("/", "/health", "/healthz"):
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.end_headers()
                self.wfile.write(b"OK")
                return

            if self.path == "/worker-status":
                self._json(200, classify_worker_status(status_file))
                return

            if self.path.startswith("/sync"):
                qs = parse_qs(urlparse(self.path).query)
                token_env = os.getenv("SYNC_TOKEN")
                if token_env and qs.get("token", [None])[0] != token_env:
                    self._json(403, {"error": "forbidden"})
                    return
                if sync_runner is None:
                    self._json(503, {"error": "sync disabled (no engine attached)"})
                    return
                table = qs.get("table", [None])[0]
                op = qs.get("op", [None])[0]
                raw_id = qs.get("id", [None])[0]
                try:
                    record_id = int(raw_id) if raw_id is not None else None
                except ValueError:
                    record_id = None  # tolerant id parse, ref worker_sync.py:99-102
                try:
                    result = sync_runner(table, op, record_id)
                    self._json(200, result)
                except Exception as e:  # surface as the reference does
                    self._json(500, {"error": str(e)})
                return

            self.send_response(404)
            self.end_headers()

        def log_message(self, fmt, *args):  # route to logging, not stderr
            LOG.info("%s %s", self.address_string(), fmt % args)

    return OpsHandler


def start_ops_server(
    host: str,
    port: int,
    status_file: str,
    sync_runner: SyncRunner | None = None,
) -> ThreadingHTTPServer:
    """Start the ops HTTP server on a daemon thread and return it
    (``.server_address`` carries the bound port when ``port=0``).
    Callers own shutdown via ``server.shutdown()``."""
    server = ThreadingHTTPServer((host, port), make_handler(status_file, sync_runner))
    threading.Thread(target=server.serve_forever, name="ops-http", daemon=True).start()
    LOG.info("ops server listening on %s:%d", *server.server_address[:2])
    return server
