"""External-service (HTTP) enrichment over count-derived partitions.

Mirrors the reference's Varsome client contract
(etl/varsome/Varsome.scala:81-97, VarsomeUtils.scala:9-16):

- **batching rule**: repartition to ``count/rows_per_batch + 1`` partitions
  so each service call carries ≤ rows_per_batch keys (the reference's 1000
  loci per POST) — one count job, only on frames headed to the boundary;
- **per-partition call**: all keys of a partition go out as ONE authed POST
  (``Authorization: Bearer <token>``), the JSON body comes back as a string
  column to be parsed JVM-side with ``from_json`` (the reference's
  ``from_json(col("response"), varsomeSchema)`` shape);
- **delta detection**: callers anti-join already-enriched keys before
  calling (reference: ``leftanti`` on the previous Varsome extract) — see
  ``queries/relational.py`` J3; this module does not re-implement it.

Hardening beyond the reference (round-3 task): bounded retry with
exponential backoff per batch, and **partial-failure rows** — a batch whose
retries are exhausted emits its rows with ``status='error'`` + the error
text instead of failing the whole Spark stage, so one bad service window
doesn't kill a 10^5-partition enrichment job; failed keys are re-driven by
the same anti-join delta rule on the next run.  ``fail_fast=True`` restores
abort-on-error semantics.

Everything network-facing is stdlib ``urllib`` inside a by-value-pickled
closure: executors need neither this repo on ``sys.path`` nor extra
packages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

ENRICH_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("response_json", T.StringType(), True),
        T.StructField("status", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("error", T.StringType(), True),
    ]
)


def enrich_http(
    df: DataFrame,
    key_col: str,
    url: str,
    token: str = "",
    rows_per_batch: int = 1000,
    max_retries: int = 3,
    backoff_s: float = 0.2,
    timeout_s: float = 10.0,
    fail_fast: bool = False,
) -> DataFrame:
    """keys → one POST per ≤rows_per_batch-key partition → per-key rows.

    The service contract: ``POST url`` with ``{"keys": [...]}``, response is
    a JSON array of per-key objects each carrying a ``"key"`` field; rows
    come back as (key, response_json, status, attempts, error).  Parse
    ``response_json`` with ``from_json`` + your entity schema downstream.
    """
    from .queries.multimodal import repartition_for_external_batches

    keys = df.select(F.col(key_col).cast("string").alias("key"))
    keys = repartition_for_external_batches(keys, rows_per_batch=rows_per_batch)

    def call_service(batches):
        import json as _json
        import time as _time
        import urllib.error as _ue
        import urllib.request as _ur

        import pandas as _pd

        for pdf in batches:
            batch_keys = pdf["key"].tolist()
            if not batch_keys:
                continue
            body = _json.dumps({"keys": batch_keys}).encode()
            req = _ur.Request(
                url,
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {token}",
                },
                method="POST",
            )
            attempts, err, entities = 0, None, None
            while attempts < max_retries:
                attempts += 1
                try:
                    with _ur.urlopen(req, timeout=timeout_s) as resp:
                        entities = _json.loads(resp.read().decode())
                    err = None
                    break
                except (_ue.URLError, _ue.HTTPError, OSError, ValueError) as e:
                    err = f"{type(e).__name__}: {e}"
                    if attempts < max_retries:
                        _time.sleep(backoff_s * (2 ** (attempts - 1)))
            if entities is None:
                if fail_fast:
                    raise RuntimeError(
                        f"enrichment failed after {attempts} attempts: {err}"
                    )
                yield _pd.DataFrame(
                    {
                        "key": batch_keys,
                        "response_json": [None] * len(batch_keys),
                        "status": ["error"] * len(batch_keys),
                        "attempts": [attempts] * len(batch_keys),
                        "error": [err] * len(batch_keys),
                    }
                )
                continue
            by_key = {str(e.get("key")): _json.dumps(e) for e in entities}
            yield _pd.DataFrame(
                {
                    "key": batch_keys,
                    "response_json": [by_key.get(k) for k in batch_keys],
                    "status": [
                        "ok" if k in by_key else "missing" for k in batch_keys
                    ],
                    "attempts": [attempts] * len(batch_keys),
                    "error": [None] * len(batch_keys),
                }
            )

    return keys.mapInPandas(call_service, schema=ENRICH_SCHEMA)
