"""Mock at-least-once, out-of-order change-log source (Python Data Source API).

Pins the ``StreamingCdc`` contract that stream.py's docstring claims — "on a
real cluster only the ``readStream`` source line changes" — with a REAL
non-file source implementing offset semantics the way a Kafka/binlog
connector does (Spark DataSourceStreamReader: initialOffset / latestOffset /
partitions / read / commit):

- **at-least-once**: every batch's partition planning re-delivers the last
  ``overlap`` sequence numbers BEFORE the batch's start offset — duplicates
  appear both inside a run and immediately after a checkpoint restart, like
  a consumer that rewinds to the last committed offset;
- **out-of-order**: LSNs are emitted through a within-block permutation and
  each partition shuffles its delivery order, so arrival order carries no
  information (the engine must resolve by LSN, not order);
- **deterministic**: every event is a pure function of its sequence number,
  so redelivered events are byte-identical (the engine's redelivery
  contract) and the test can replay the exact oracle without touching the
  source.

The reference tails files grouped into batch ids (SURVEY.md §2.J); this is
the axis-A equivalent of its Kafka-shaped upstream.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

EVENT_SCHEMA_DDL = (
    "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
)

# fixed permutation of 0..15: lsn = block*16 + _PERM16[seq%16] keeps the lsn
# space bijective for ANY total while scrambling local order
_PERM16 = (9, 2, 14, 7, 0, 11, 4, 13, 6, 1, 15, 8, 3, 12, 5, 10)


def event_for_seq(seq: int, n_docs: int = 200) -> tuple:
    """Pure event generator: (lsn, op, doc_id, tokens, n_tok, source)."""
    lsn = (seq // 16) * 16 + _PERM16[seq % 16]
    doc = f"doc_{(lsn * 2654435761) % n_docs:06d}"
    h = (lsn * 1103515245 + 12345) % 100
    op = "D" if h < 10 else ("I" if h < 40 else "U")
    if op == "D":
        return (lsn, op, doc, None, None, None)
    toks = [(lsn + j) % 50021 for j in range(1 + lsn % 7)]
    return (lsn, op, doc, toks, len(toks), ("web", "books", "cc")[lsn % 3])


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, n_docs: int):
        self.start, self.end, self.n_docs = start, end, n_docs


class MockBinlogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("total", 1000))
        self.overlap = int(options.get("overlap", 0))
        self.n_docs = int(options.get("n_docs", 200))
        self.n_parts = int(options.get("parts", 4))

    def initialOffset(self):
        return {"seq": 0}

    def latestOffset(self):
        # the log's current high-water; a restarted run configured with a
        # larger ``total`` continues from the CHECKPOINTED offset, not 0
        return {"seq": self.total}

    def partitions(self, start, end):
        s, e = int(start["seq"]), int(end["seq"])
        # at-least-once: rewind the batch start by the redelivery window
        # (crosses the checkpoint boundary on restart, like a consumer
        # resuming at the last committed — not last delivered — offset)
        s = max(0, s - self.overlap)
        if e <= s:
            return []
        step = max(1, -(-(e - s) // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, e), self.n_docs)
            for lo in range(s, e, step)
        ]

    def read(self, part):
        seqs = list(range(part.start, part.end))
        # scramble delivery order within the partition (out-of-order source)
        seqs.sort(key=lambda q: (q * 40503) % 65536)
        for q in seqs:
            yield event_for_seq(q, part.n_docs)

    def commit(self, end):
        pass


class MockBinlogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mock_binlog"

    def schema(self):
        return EVENT_SCHEMA_DDL

    def streamReader(self, schema):
        return MockBinlogStreamReader(self.options)


def register(spark) -> None:
    """Register the source as ``mock_binlog``.

    The class lives in an importable module, which cloudpickle serializes by
    reference — Python workers would then need this repo on their
    PYTHONPATH.  Registering the module pickle-by-value ships the code with
    the plan instead (same posture as the repo's factory-local pandas UDFs),
    so the source works on workers that never installed the package.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(MockBinlogDataSource)
