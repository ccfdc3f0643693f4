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


# ---------------------------------------------------------------------------
# Schema evolution INSIDE an array-of-struct column, mid-stream (the
# reference's RenameServiceRequestColumns shape,
# etl/script/RenameServiceRequestColumns.scala:40-78): an epoch adds a field
# to the array's element struct; pre-evolution rows must read back with NULL
# in the new nested field (a plain struct cast would fail on field count).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("apply_mode", ["cow", "mor"])
def test_nested_array_struct_evolution_mid_stream(spark, tmp_path, apply_mode):
    from pyspark.sql import types as T

    spans_v1 = T.ArrayType(
        T.StructType(
            [T.StructField("start", T.IntegerType()), T.StructField("end", T.IntegerType())]
        )
    )
    payload_v1 = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("spans", spans_v1, True),
        ]
    )
    ev_v1 = T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("spans", spans_v1, True),
        ]
    )
    spans_v2 = T.ArrayType(
        T.StructType(
            [
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
                T.StructField("label", T.StringType()),
            ]
        )
    )
    ev_v2 = T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("spans", spans_v2, True),
        ]
    )

    create_cdc_table(str(tmp_path / "docs"), payload_v1, n_buckets=4)
    pipe = CdcPipeline(spark, str(tmp_path / "docs"), apply_mode=apply_mode)

    # epoch 0: v1 payloads (no label anywhere); doc_null has a NULL array
    e0 = spark.createDataFrame(
        [
            (1, "I", "a", [(0, 5), (7, 9)]),
            (2, "I", "b", [(1, 2)]),
            (3, "I", "doc_null", None),
        ],
        ev_v1,
    )
    pipe.apply_epoch(e0, 0)

    # epoch 1: element struct grows a `label` field mid-stream
    e1 = spark.createDataFrame(
        [
            (4, "U", "b", [(1, 2, "greeting"), (3, 4, None)]),
            (5, "I", "c", [(9, 12, "body")]),
        ],
        ev_v2,
    )
    res = pipe.apply_epoch(e1, 1)
    assert res.evolved_schema

    state = pipe.read_state()
    spans_t = state.schema["spans"].dataType
    assert spans_t.elementType.fieldNames() == ["start", "end", "label"]
    got = {r["doc_id"]: r["spans"] for r in state.collect()}
    # pre-evolution rows: label reads as NULL, start/end intact, NULL array stays NULL
    assert [(s["start"], s["end"], s["label"]) for s in got["a"]] == [
        (0, 5, None),
        (7, 9, None),
    ]
    assert got["doc_null"] is None
    # post-evolution rows carry the new nested field (incl. a NULL label)
    assert [(s["start"], s["end"], s["label"]) for s in got["b"]] == [
        (1, 2, "greeting"),
        (3, 4, None),
    ]
    assert [(s["start"], s["end"], s["label"]) for s in got["c"]] == [(9, 12, "body")]
