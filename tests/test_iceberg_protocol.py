"""IcebergMergeSink protocol simulation (X7 production path).

No Iceberg (or Delta) runtime jar ships in this image — probed
round 5: `find / -name '*iceberg*'` and the pyspark jars dir are both
empty of catalog runtimes, recorded in TESTDATA.md — so the MERGE path
cannot run end-to-end here. These tests drive the sink's three-step
protocol (streaming/sink.py IcebergMergeSink) against recording fakes
instead, pinning the exact properties the real catalog run relies on:

1. ledger lookup first — a committed batch is a FULL no-op (replay);
2. MERGE before ledger append — a crash between them re-runs the MERGE,
   which is idempotent (matched rows update to identical values), and
   the ledger append remains the single commit point;
3. the MERGE statement targets the sink key exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from pdf_watermark_removal_otsu_inpaint_spark.streaming.sink import (
    IcebergMergeSink)


class _FakeBatchDF:
    """Just enough DataFrame surface for IcebergMergeSink.__call__."""

    def __init__(self, spark, n_rows: int = 7):
        self._spark = spark
        self._n = n_rows
        self.calls: list = []
        self.schema = StructType([
            StructField("doc_id", StringType()),
            StructField("seq_no", LongType()),
            StructField("wm_token", IntegerType()),
        ])

    @property
    def sparkSession(self):
        return self._spark

    def dropDuplicates(self, keys):
        self.calls.append(("dropDuplicates", tuple(keys)))
        return self

    def cache(self):
        self.calls.append(("cache",))
        return self

    def unpersist(self):
        self.calls.append(("unpersist",))
        return self

    def createOrReplaceTempView(self, name):
        self.calls.append(("view", name))

    def count(self):
        return self._n


class _LedgerTable:
    """Fake ledger: .where(col).limit(1).count() driven by a committed set.
    The Column filter itself is opaque; the fake keys off the batch id the
    test marked committed (exactly what the real lookup resolves to)."""

    def __init__(self, hit: bool):
        self._hit = hit

    def where(self, _cond):
        return self

    def limit(self, _n):
        return self

    def count(self):
        return 1 if self._hit else 0


class _FakeSpark:
    def __init__(self, committed: set[int] | None = None,
                 fail_on_ledger_insert: bool = False):
        self.committed = committed or set()
        self.sql_log: list[str] = []
        self.fail_on_ledger_insert = fail_on_ledger_insert
        self._probe_batch: int | None = None

    def expect_batch(self, batch_id: int):
        self._probe_batch = batch_id

    def table(self, name):
        if not name.endswith("_commits"):
            raise AssertionError(f"unexpected table lookup {name}")
        return _LedgerTable(self._probe_batch in self.committed)

    def sql(self, q: str):
        self.sql_log.append(q)
        if q.startswith("INSERT INTO") and self.fail_on_ledger_insert:
            self.fail_on_ledger_insert = False   # fail once, then recover
            raise RuntimeError("injected crash between MERGE and ledger")
        if q.startswith("INSERT INTO"):
            self.committed.add(self._probe_batch)
        return None


def test_merge_sql_targets_sink_key():
    sink = IcebergMergeSink("cat.db.repaired", key_cols=("doc_id", "seq_no"))
    sql = sink.merge_sql("_u")
    assert "MERGE INTO cat.db.repaired t USING _u u" in sql
    assert "t.doc_id = u.doc_id AND t.seq_no = u.seq_no" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_fresh_batch_runs_merge_then_ledger(spark):
    fake = _FakeSpark()
    fake.expect_batch(3)
    sink = IcebergMergeSink("tbl")
    df = _FakeBatchDF(fake, n_rows=7)
    sink(df, 3)
    kinds = [q.split()[0] for q in fake.sql_log]
    # CREATEs (idempotent), then MERGE, then the ledger INSERT — in order
    assert kinds.count("MERGE") == 1 and kinds.count("INSERT") == 1
    assert kinds.index("MERGE") < kinds.index("INSERT")
    insert = [q for q in fake.sql_log if q.startswith("INSERT")][0]
    assert "(3, 7)" in insert        # (batch_id, rows upserted)
    assert ("dropDuplicates", ("doc_id", "seq_no")) in df.calls
    assert ("unpersist",) in df.calls   # cache released even on success


def test_replayed_committed_batch_is_full_noop(spark):
    fake = _FakeSpark(committed={5})
    fake.expect_batch(5)
    sink = IcebergMergeSink("tbl")
    df = _FakeBatchDF(fake)
    sink(df, 5)
    assert fake.sql_log == []        # no MERGE, no ledger append, no DDL
    assert df.calls == []            # the batch plan is never touched


def test_crash_between_merge_and_ledger_replays_safely(spark):
    """Step-2/3 boundary: the ledger append IS the commit point. A crash
    after MERGE but before the append leaves the batch uncommitted, so the
    foreachBatch replay re-runs the (idempotent) MERGE and then lands the
    ledger row exactly once."""
    fake = _FakeSpark(fail_on_ledger_insert=True)
    fake.expect_batch(9)
    sink = IcebergMergeSink("tbl")
    with pytest.raises(RuntimeError, match="injected crash"):
        sink(_FakeBatchDF(fake), 9)
    assert 9 not in fake.committed   # commit point not reached
    # replay: MERGE runs AGAIN (safe: matched rows update to identical
    # values), then the ledger append commits
    sink(_FakeBatchDF(fake), 9)
    merges = [q for q in fake.sql_log if q.startswith("MERGE")]
    inserts = [q for q in fake.sql_log if q.startswith("INSERT")]
    assert len(merges) == 2 and len(inserts) == 2  # 1 failed + 1 committed
    assert 9 in fake.committed
    # a THIRD delivery is now a no-op
    n_sql = len(fake.sql_log)
    sink(_FakeBatchDF(fake), 9)
    assert len(fake.sql_log) == n_sql
