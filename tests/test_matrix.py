"""F6 merge-combination matrix — explicit case table, one assertion per case.

Mirrors the reference's combinatorial frequency spec
(src/test/scala/bio/ferlab/clin/etl/enriched/VariantsSpec.scala:121-170):
enumerate op patterns × duplicate × late × cross-epoch placement with
hand-written expected final rows.

Event tuple: (lsn, op, doc_id, tokens, epoch).  Expected: doc_id -> tokens
(None = absent from final state).
"""

import pytest
from pyspark.sql import functions as F

from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA

# (name, events, expected_tokens_or_None)
CASES = [
    ("insert_only", [(1, "I", [1]), ], [1]),
    ("insert_update", [(1, "I", [1]), (2, "U", [1, 2])], [1, 2]),
    ("insert_update_update", [(1, "I", [1]), (2, "U", [2]), (3, "U", [3])], [3]),
    ("insert_delete", [(1, "I", [1]), (2, "D", None)], None),
    ("insert_update_delete", [(1, "I", [1]), (2, "U", [2]), (3, "D", None)], None),
    ("delete_then_reinsert", [(1, "I", [1]), (2, "D", None), (3, "I", [3])], [3]),
    ("update_on_absent_key_upserts", [(5, "U", [5])], [5]),
    ("delete_on_absent_key", [(5, "D", None)], None),
    ("late_update_after_delete_stays_dead", [(1, "I", [1]), (5, "D", None), (3, "U", [3])], None),
    ("late_update_after_newer_update_loses", [(1, "I", [1]), (5, "U", [5]), (3, "U", [3])], [5]),
    ("duplicate_insert_same_lsn", [(1, "I", [1]), (1, "I", [1])], [1]),
    ("duplicate_delete_same_lsn", [(1, "I", [1]), (2, "D", None), (2, "D", None)], None),
    ("delete_before_insert_delivery_order", [(2, "D", None), (1, "I", [1])], None),
    ("reinsert_then_late_older_update", [(1, "I", [1]), (2, "D", None), (5, "I", [5]), (4, "U", [4])], [5]),
]

# which epoch each event (by index within the case) lands in, per scenario
PLACEMENTS = {
    "all_one_epoch": lambda i: 0,
    "one_event_per_epoch": lambda i: i,
    "reverse_epochs": lambda i: 10 - i,  # later-lsn events delivered in earlier epochs
}


@pytest.mark.parametrize("apply_mode", ["cow", "mor"])
@pytest.mark.parametrize("placement", sorted(PLACEMENTS))
def test_matrix(spark, tmp_path, placement, apply_mode):
    place = PLACEMENTS[placement]
    # unique doc per (case); lsns offset per case so the global order is per-key only
    events = []  # (epoch, lsn, op, doc_id, tokens)
    expected = {}
    for ci, (name, evs, want) in enumerate(CASES):
        doc = f"{name}"
        base = ci * 100
        for i, (lsn, op, toks) in enumerate(evs):
            events.append((place(i), base + lsn, op, doc, toks))
        expected[doc] = want

    create_cdc_table(str(tmp_path / "docs"), BASE_DOCS_SCHEMA, n_buckets=4)
    pipe = CdcPipeline(spark, str(tmp_path / "docs"), apply_mode=apply_mode)
    for k, epoch in enumerate(sorted({e[0] for e in events})):
        rows = [
            (lsn, op, doc, toks, len(toks) if toks else None, "web" if toks else None)
            for (ep, lsn, op, doc, toks) in events
            if ep == epoch
        ]
        df = spark.createDataFrame(
            rows, "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
        )
        pipe.apply_epoch(df, k)

    got = {r["doc_id"]: r["tokens"] for r in pipe.read_state().collect()}
    for name, _evs, want in CASES:
        if want is None:
            assert name not in got, f"case {name} [{placement}]: expected absent, got {got.get(name)}"
        else:
            assert got.get(name) == want, f"case {name} [{placement}]: got {got.get(name)}, want {want}"
    # non-duplication invariant over the whole matrix
    dups = pipe.read_state().groupBy("doc_id").count().where(F.col("count") > 1).count()
    assert dups == 0
