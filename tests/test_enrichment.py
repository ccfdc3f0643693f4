"""HTTP enrichment against a REAL local server (reference test pattern:
testutils/HttpServerUtils.scala:10-34) with injected failures: retry with
backoff, partial-failure rows, the 1000-row batching rule, and auth headers."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F, types as T

from clin_variant_etl_spark.enrichment import enrich_http


class _Service:
    """In-memory annotation service; per-instance failure injection."""

    def __init__(self, fail_first_per_body=0, always_fail=False):
        self.fail_first_per_body = fail_first_per_body
        self.always_fail = always_fail
        self.lock = threading.Lock()
        self.requests = []  # (body, auth) log
        self.body_counts = {}

    def handler(self):
        svc = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"])).decode()
                with svc.lock:
                    svc.requests.append((body, self.headers.get("Authorization")))
                    n = svc.body_counts.get(body, 0) + 1
                    svc.body_counts[body] = n
                if svc.always_fail or n <= svc.fail_first_per_body:
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(b"boom")
                    return
                keys = json.loads(body)["keys"]
                out = [{"key": k, "score": len(k) * 10} for k in keys]
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload)

        return H


@pytest.fixture()
def http_service():
    def start(**kw):
        svc = _Service(**kw)
        server = ThreadingHTTPServer(("127.0.0.1", 0), svc.handler())
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_port}/annotate"
        return svc, server, url

    servers = []

    def factory(**kw):
        svc, server, url = start(**kw)
        servers.append(server)
        return svc, url

    yield factory
    for s in servers:
        s.shutdown()


def _keys_df(spark, n=5):
    return spark.createDataFrame([(f"k{i}",) for i in range(n)], "locus string")


def test_happy_path_and_batching_rule(spark, http_service):
    svc, url = http_service()
    out = enrich_http(
        _keys_df(spark, 5), "locus", url, token="tok-123", rows_per_batch=2
    ).collect()
    assert len(out) == 5
    assert all(r["status"] == "ok" and r["attempts"] == 1 for r in out)
    parsed = {r["key"]: json.loads(r["response_json"]) for r in out}
    assert parsed["k3"]["score"] == 20
    # count-derived batching: ceil-ish count/rows_per_batch + 1 partitions,
    # each non-empty partition = exactly one POST, all carrying the token
    assert 1 <= len(svc.requests) <= 4
    assert sum(len(json.loads(b)["keys"]) for b, _ in svc.requests) == 5
    assert all(auth == "Bearer tok-123" for _, auth in svc.requests)


def test_retry_then_success(spark, http_service):
    svc, url = http_service(fail_first_per_body=2)
    out = enrich_http(
        _keys_df(spark, 4), "locus", url, rows_per_batch=2, backoff_s=0.01
    ).collect()
    assert all(r["status"] == "ok" for r in out)
    assert all(r["attempts"] == 3 for r in out)  # 2 failures + 1 success


def test_partial_failure_rows(spark, http_service):
    svc, url = http_service(always_fail=True)
    out = enrich_http(
        _keys_df(spark, 3), "locus", url, rows_per_batch=10, max_retries=2,
        backoff_s=0.01,
    ).collect()
    assert len(out) == 3
    assert all(r["status"] == "error" and r["response_json"] is None for r in out)
    assert all(r["attempts"] == 2 for r in out)
    assert all("HTTPError" in r["error"] for r in out)


def test_fail_fast_raises(spark, http_service):
    svc, url = http_service(always_fail=True)
    with pytest.raises(Exception):
        enrich_http(
            _keys_df(spark, 2), "locus", url, max_retries=1, fail_fast=True,
            backoff_s=0.01,
        ).collect()


def test_downstream_from_json_parse(spark, http_service):
    """The reference shape: response parsed JVM-side with from_json."""
    svc, url = http_service()
    schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("score", T.LongType())]
    )
    out = (
        enrich_http(_keys_df(spark, 3), "locus", url, rows_per_batch=10)
        .select("key", F.from_json("response_json", schema).alias("e"))
        .select("key", "e.score")
        .collect()
    )
    assert sorted((r["key"], r["score"]) for r in out) == [
        ("k0", 20), ("k1", 20), ("k2", 20),
    ]
