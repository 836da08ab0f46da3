"""End-to-end exercise of the batched-HTTP LLM adapter against a REAL
HTTP server (localhost, stdlib http.server) — proving the seam the
deterministic stand-in otherwise covers: request batching, the
one-completion-per-prompt length contract, 5xx retry with backoff, and
4xx fail-fast. The endpoint implements the same md5-keyed labeling as
``det_respond``, so the Spark output must be IDENTICAL whether the
stage runs in-process or over the wire (reference behavior:
fever_multi_agent.py:235-247 makes per-claim OpenAI HTTP calls; here
the calls are batched per Arrow chunk)."""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.operators.llm import (
    LABELS,
    det_respond,
    http_respond_fn,
    llm_map_stage,
)
from vector_db_setup_spark.sources.registry import load_table


class _Model(BaseHTTPRequestHandler):
    """Deterministic 'model' endpoint: md5-keyed label per prompt.

    Class-level counters/flags are reset per server instance via
    _make_server; handler instances are per-request.
    """

    requests_seen: list[int] = []
    fail_next: int = 0  # serve this many 500s before succeeding
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802  (http.server API)
        body = self.rfile.read(int(self.headers["Content-Length"]))
        prompts = json.loads(body)["prompts"]
        with type(self).lock:
            type(self).requests_seen.append(len(prompts))
            if type(self).fail_next > 0:
                type(self).fail_next -= 1
                self.send_response(503)
                self.end_headers()
                return
        comps = [
            LABELS[int(hashlib.md5(p.encode()).hexdigest()[0], 16) % 3]
            for p in prompts
        ]
        out = json.dumps({"completions": comps}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def model_server():
    _Model.requests_seen = []
    _Model.fail_next = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Model)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/complete"
    srv.shutdown()
    srv.server_close()


def test_http_stage_matches_deterministic_standin(spark, model_server):
    d = load_table(spark, SF_SMOKE, "documents").limit(20)
    tmpl = "Claim: {text}\nVerdict?"
    over_wire = llm_map_stage(
        d,
        tmpl,
        input_cols=["text"],
        output_col="verdict",
        respond_fn=http_respond_fn(model_server, batch_size=8),
    )
    in_process = llm_map_stage(
        d, tmpl, input_cols=["text"], output_col="verdict"
    )
    got = {r["doc_id"]: r["verdict"] for r in over_wire.collect()}
    want = {r["doc_id"]: r["verdict"] for r in in_process.collect()}
    assert got == want and len(got) == 20
    # batching contract: every request carried <= batch_size prompts and
    # the total prompt count across requests is exactly the row count
    assert all(n <= 8 for n in _Model.requests_seen)
    assert sum(_Model.requests_seen) == 20


def test_http_adapter_retries_transient_5xx(model_server):
    _Model.fail_next = 2  # first two requests 503, then healthy
    respond = http_respond_fn(
        model_server, batch_size=4, max_retries=3, backoff=0.01
    )
    prompts = pd.Series([f"p{i}" for i in range(4)])
    out = respond(prompts)
    assert list(out) == list(det_respond(prompts))
    # 2 failed attempts + 1 success, single batch
    assert len(_Model.requests_seen) == 3


def test_http_adapter_exhausted_retries_raise(model_server):
    _Model.fail_next = 10
    respond = http_respond_fn(
        model_server, batch_size=4, max_retries=2, backoff=0.01
    )
    with pytest.raises(Exception):
        respond(pd.Series(["p"]))
    assert len(_Model.requests_seen) == 3  # initial + 2 retries, then raise


def test_http_adapter_4xx_fails_fast():
    class _Reject(BaseHTTPRequestHandler):
        hits = 0

        def do_POST(self):  # noqa: N802
            type(self).hits += 1
            self.rfile.read(int(self.headers["Content-Length"]))
            self.send_response(400)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Reject)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        respond = http_respond_fn(
            f"http://127.0.0.1:{srv.server_address[1]}/", max_retries=3
        )
        with pytest.raises(Exception):
            respond(pd.Series(["p"]))
        assert _Reject.hits == 1  # no retry on a caller error
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_adapter_length_contract(model_server):
    class _Short(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers["Content-Length"]))
            out = json.dumps({"completions": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Short)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        respond = http_respond_fn(f"http://127.0.0.1:{srv.server_address[1]}/")
        with pytest.raises(ValueError, match="0 completions for 1"):
            respond(pd.Series(["p"]))
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_adapter_retries_429_rate_limit(model_server):
    """429 (endpoint shedding load under executor fan-out) must retry
    with backoff, not kill the task."""
    class _Once:
        left = 2

    orig = _Model.do_POST

    def flaky(self):
        with _Model.lock:
            if _Once.left > 0:
                _Once.left -= 1
                _Model.requests_seen.append(-1)
                self.rfile.read(int(self.headers["Content-Length"]))
                self.send_response(429)
                self.end_headers()
                return
        orig(self)

    _Model.do_POST = flaky
    try:
        respond = http_respond_fn(
            model_server, batch_size=4, max_retries=3, backoff=0.01
        )
        prompts = pd.Series(["p0", "p1"])
        assert list(respond(prompts)) == list(det_respond(prompts))
    finally:
        _Model.do_POST = orig
