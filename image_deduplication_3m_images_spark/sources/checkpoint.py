"""Stage checkpointing + per-partition lineage, with idempotent resume.

Reference analog: ``ProgressTracker`` JSON checkpoint + processed-set resume
(``/root/reference/pipeline.py:106-173,464-471``) and the gzip-pickle feature
cache as the stage-1 materialization (``modules/feature_cache.py``).

Production target is Iceberg (snapshot ids give exactly-once semantics); this
module speaks a minimal catalog interface with two backends:

  * ``IcebergCatalog``  — used when an Iceberg catalog is configured on the
    session (``spark.sql.catalog.<name>`` set and the runtime jar present).
  * ``ParquetCatalog``  — local/dev backend with the same semantics:
    a table commit = atomic directory rename (write to ``_tmp_<table>`` then
    rename), a snapshot id = the content fingerprint of the commit.

Lineage rows (north rule: "per-partition lineage — partition id, input
snapshot, signature config hash, pair counts"):

    stage STRING, partition_id INT, rows BIGINT,
    input_snapshot STRING, config_hash STRING, extra STRING
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_TABLE = "_lineage"
_LINEAGE_SCHEMA = (
    "stage string, partition_id int, rows long, input_snapshot string,"
    " config_hash string, extra string"
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def make_catalog(spark: SparkSession, warehouse: str, catalog_name: str = "local"):
    """Backend selection: IcebergCatalog when the runtime jar is on the
    classpath AND a Spark SQL catalog named ``catalog_name`` is configured;
    ParquetCatalog (same interface, same semantics) otherwise."""
    configured = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    if configured and iceberg_available(spark):
        return IcebergCatalog(spark, warehouse, catalog_name=catalog_name)
    return ParquetCatalog(spark, warehouse)


class ParquetCatalog:
    """Directory-per-table parquet warehouse with atomic commit + lineage."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _heal(self, table: str) -> None:
        # recover the crash window of write(): if the process died between
        # "rename final -> _old_" and "rename tmp -> final", the committed
        # data survives in the _old_ sibling — restore it (newest wins)
        final = self._path(table)
        if os.path.isdir(final):
            return
        import glob

        olds = sorted(glob.glob(final + "_old_*"), key=os.path.getmtime)
        if olds:
            os.rename(olds[-1], final)

    def exists(self, table: str) -> bool:
        # a table is visible if the overwrite/append marker exists OR any
        # committed append batch dir does: an append's commit point is the
        # batch-dir rename itself (see append), so a crash between that
        # rename and the marker touch must not hide committed data — a later
        # successful append would otherwise retroactively expose the orphan
        # batch as surprise rows (ADVICE r4 item 1)
        self._heal(table)
        p = self._path(table)
        if not os.path.isdir(p):
            return False
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return True
        return any(e.startswith("batch_") for e in os.listdir(p))

    # -- table io ----------------------------------------------------------
    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> str:
        """Atomic overwrite: write to a tmp dir, then a two-RENAME swap (the
        old table is renamed aside, the tmp renamed in, the old dir deleted
        last).  A plain rmtree-then-rename would have a crash window where
        the committed table is deleted and not yet replaced; here every
        transition is an atomic rename, and a crash between the two renames
        leaves the old data in an ``_old_`` sibling that ``_heal`` restores
        on the next access.  Returns snapshot id.  ``mode="append"``
        delegates to :meth:`append` (this parameter used to be silently
        ignored — a destructive surprise for append callers)."""
        if mode == "append":
            self.append(df, table)
            return self.snapshot_id(table)
        if mode != "overwrite":
            raise ValueError(f"unsupported write mode: {mode!r}")
        final = self._path(table)
        tmp = final + "_tmp_" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        old = final + "_old_" + uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.rename(final, old)
        try:
            os.rename(tmp, final)
        except BaseException:
            if os.path.isdir(old):
                os.rename(old, final)
            raise
        if os.path.isdir(old):
            shutil.rmtree(old)
        # GC siblings leaked by CRASHED earlier writes (a crash after the
        # commit rename but before the rmtree above leaves an _old_ dir;
        # a crash mid-write leaves a _tmp_ dir).  Once this commit stands,
        # any survivor is stale — and a stale _old_ left in place would be
        # RESURRECTED by _heal if the table is later drop()ped.  Append
        # tmp dirs (``_tmp_append_*``) get an AGE guard instead of the
        # blanket sweep: a fresh one may be a CONCURRENT append's in-flight
        # batch (ADVICE r5 — the old glob deleted it mid-write), while an
        # hour-old one is crashed-append debris that nothing else collects.
        import glob
        import time

        append_prefix = final + "_tmp_append_"
        stales = glob.glob(final + "_old_*")
        for d in glob.glob(final + "_tmp_*"):
            if not d.startswith(append_prefix):
                stales.append(d)
                continue
            try:
                if time.time() - os.path.getmtime(d) > 3600:
                    stales.append(d)
            except OSError:
                pass  # raced with the append's commit rename: leave it
        for stale in stales:
            shutil.rmtree(stale, ignore_errors=True)
        return self.snapshot_id(table)

    def append(self, df: DataFrame, table: str) -> None:
        """Atomic append: the batch's files are written to a SIBLING tmp dir
        and enter the table through ONE directory rename — the rename IS the
        commit point (exists() treats any ``batch_*`` subdir as commitment,
        so a crash right after the rename cannot hide committed data).  A
        crash mid-write leaves only an invisible tmp dir.  Note the marker
        gap this closes but does not remove: appends are still at-least-once
        under replay, so streaming consumers keep dropDuplicates-on-read as
        the idempotency layer (ADVICE r4 item 1)."""
        final = self._path(table)
        tmp = final + "_tmp_append_" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(final, exist_ok=True)
        os.rename(tmp, os.path.join(final, "batch_" + uuid.uuid4().hex[:8]))
        # marker kept for overwrite-path compat; exists() no longer needs it
        # for appended tables
        open(os.path.join(final, "_SUCCESS"), "a").close()

    def row_count(self, table: str) -> int:
        """Committed row count straight from parquet FOOTERS, driver-side —
        no Spark job, no data scan (Iceberg equivalent: manifest record
        counts).  Used for byte-guard decisions (broadcast-or-shuffle) that
        previously cost a full count() job per stage."""
        import pyarrow.parquet as pq

        p = self._path(table)
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total

    def read(self, table: str) -> DataFrame:
        # appended tables hold one committed subdir per batch
        self._heal(table)
        return self.spark.read.option("recursiveFileLookup", "true").parquet(
            self._path(table)
        )

    def drop(self, table: str) -> None:
        # remove crash-leftover siblings too: a surviving _old_ dir would
        # be renamed back by _heal on the next exists()/read(), silently
        # resurrecting the dropped table
        import glob

        p = self._path(table)
        for d in [p] + glob.glob(p + "_old_*") + glob.glob(p + "_tmp_*"):
            if os.path.isdir(d):
                shutil.rmtree(d)

    def snapshot_id(self, table: str) -> str:
        """Content fingerprint of the committed table dir (file names+sizes) —
        the ParquetCatalog stand-in for an Iceberg snapshot id."""
        p = self._path(table)
        entries = []
        for root, _dirs, files in os.walk(p):
            for f in sorted(files):
                if f.startswith("_") or f.startswith("."):
                    continue
                fp = os.path.join(root, f)
                entries.append((os.path.relpath(fp, p), os.path.getsize(fp)))
        import hashlib

        return hashlib.sha256(json.dumps(sorted(entries)).encode()).hexdigest()[:16]

    # -- lineage -----------------------------------------------------------
    def _append_rows_local(self, rows: list[tuple], table: str) -> None:
        """Append small driver-side row lists (lineage/events) WITHOUT a
        Spark job: one pyarrow parquet file committed through the same
        batch-dir rename as :meth:`append`.  Round-6 optimization — every
        pipeline stage used to pay a createDataFrame + distributed-write
        job to record a handful of lineage rows; this backend is local-fs
        by construction (the Iceberg backend handles real clusters), so a
        driver write is both legal and ~one job cheaper per stage.  The
        arrow schema matches Spark's (`int` -> int32, `long` -> int64) so
        mixed readers see one consistent table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                ("stage", pa.string()),
                ("partition_id", pa.int32()),
                ("rows", pa.int64()),
                ("input_snapshot", pa.string()),
                ("config_hash", pa.string()),
                ("extra", pa.string()),
            ]
        )
        cols = list(zip(*rows))
        tbl = pa.table(
            {f.name: list(c) for f, c in zip(schema, cols)}, schema=schema
        )
        final = self._path(table)
        tmp = final + "_tmp_append_" + uuid.uuid4().hex[:8]
        os.makedirs(tmp)
        pq.write_table(tbl, os.path.join(tmp, "part-00000.parquet"))
        os.makedirs(final, exist_ok=True)
        os.rename(tmp, os.path.join(final, "batch_" + uuid.uuid4().hex[:8]))
        open(os.path.join(final, "_SUCCESS"), "a").close()

    def log_lineage(
        self,
        df: DataFrame,
        stage: str,
        config_hash: str,
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> None:
        """One lineage row per spark partition of the stage output: the
        per-partition row counts make silent truncation/skew visible."""
        per_part = (
            df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows",
                F.lit(input_snapshot).alias("input_snapshot"),
                F.lit(config_hash).alias("config_hash"),
                F.lit(json.dumps(extra or {}, sort_keys=True)).alias("extra"),
            )
        )
        self.append(per_part, LINEAGE_TABLE)

    def log_lineage_for_table(
        self,
        table: str,
        stage: str,
        config_hash: str,
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> None:
        """Per-partition lineage from parquet FOOTERS of a committed table —
        one row per data file, row counts read driver-side from metadata (no
        Spark job, no data scan; Iceberg equivalent: manifest entries)."""
        import pyarrow.parquet as pq

        p = self._path(table)
        rows = []
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        # record WHICH table contents this lineage row describes: the
        # resume gate (stage_complete) matches it against the table's
        # current snapshot, so a historical row from an earlier config
        # can never vouch for data written under a different one
        extra = dict(extra or {})
        extra["output_snapshot"] = self.snapshot_id(table)
        extra_json = json.dumps(extra, sort_keys=True)
        for idx, f in enumerate(files):
            n = pq.ParquetFile(f).metadata.num_rows
            rows.append((stage, idx, n, input_snapshot, config_hash, extra_json))
        if not rows:
            rows = [(stage, -1, 0, input_snapshot, config_hash, extra_json)]
        # rows were assembled driver-side from footers — commit them the
        # same way, without a Spark job (see _append_rows_local)
        self._append_rows_local(rows, LINEAGE_TABLE)

    def log_event(
        self, stage: str, config_hash: str, extra: dict | None = None
    ) -> None:
        """Single lineage row for audits/counters not tied to a table write."""
        self._append_rows_local(
            [(stage, -1, 0, "", config_hash, json.dumps(extra or {}, sort_keys=True))],
            LINEAGE_TABLE,
        )

    def lineage(self) -> DataFrame:
        return self.read(LINEAGE_TABLE)

    def stage_complete(self, stage: str, config_hash: str) -> bool:
        """Resume gate: stage output exists AND the lineage row describing
        the table's CURRENT contents carries the same config hash.  Hash
        alone is not enough: lineage is append-only, so after a config
        flip A->B->A the old A row still exists while the table holds B
        data — rows written by ``log_lineage_for_table`` therefore carry
        ``output_snapshot`` in their extra JSON and must match the table's
        current snapshot; legacy rows without one are accepted on hash
        alone (pre-existing warehouses)."""
        if not self.exists(stage) or not self.exists(LINEAGE_TABLE):
            return False
        snap = self.snapshot_id(stage)
        n = (
            self.lineage()
            .where(
                (F.col("stage") == stage) & (F.col("config_hash") == config_hash)
            )
            .where(
                F.coalesce(
                    F.get_json_object("extra", "$.output_snapshot"), F.lit(snap)
                )
                == snap
            )
            .limit(1)
            .count()
        )
        return n > 0


class IcebergCatalog:
    """Iceberg-backed catalog: the production checkpoint layer (north rule:
    every stage checkpoints to Iceberg with per-partition lineage).

    Same interface and semantics as ParquetCatalog, with the real thing
    underneath: a table commit is an Iceberg snapshot (atomic, exactly-once
    by the catalog's own commit protocol), ``snapshot_id`` is the table's
    current Iceberg snapshot id, and per-partition lineage row counts come
    from the ``.files`` metadata table (manifest entries — no data scan).

    Requires the iceberg-spark-runtime jar and a configured SQL catalog
    (``spark.sql.catalog.<name>``); raises at construction otherwise, so
    ``make_catalog`` can fall back to ParquetCatalog cleanly.  Tables live
    in a namespace derived from the warehouse path so concurrent warehouses
    never collide.
    """

    def __init__(self, spark: SparkSession, warehouse: str, catalog_name: str = "local"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime jar not on the classpath; "
                "use make_catalog() for automatic fallback"
            )
        self.spark = spark
        self.warehouse = warehouse
        import hashlib

        ns = "wh_" + hashlib.sha256(os.path.abspath(warehouse).encode()).hexdigest()[:12]
        self.ns = f"{catalog_name}.{ns}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")

    # -- identifiers --------------------------------------------------------
    def _tbl(self, table: str) -> str:
        return f"{self.ns}.`{table}`"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(table))

    # -- table io ------------------------------------------------------------
    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> str:
        """Atomic overwrite = Iceberg REPLACE TABLE commit; returns the new
        snapshot id.  ``mode="append"`` delegates to :meth:`append` (the
        parameter used to be silently ignored)."""
        if mode == "append":
            self.append(df, table)
            return self.snapshot_id(table)
        if mode != "overwrite":
            raise ValueError(f"unsupported write mode: {mode!r}")
        df.writeTo(self._tbl(table)).using("iceberg").createOrReplace()
        return self.snapshot_id(table)

    def append(self, df: DataFrame, table: str) -> None:
        if self.exists(table):
            df.writeTo(self._tbl(table)).append()
        else:
            df.writeTo(self._tbl(table)).using("iceberg").create()

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._tbl(table))

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._tbl(table)}")

    def snapshot_id(self, table: str) -> str:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(rows[0][0]) if rows else ""

    def row_count(self, table: str) -> int:
        """Row count from the ``.files`` manifest metadata — no data scan."""
        rows = self.spark.sql(
            f"SELECT COALESCE(SUM(record_count), 0) AS n FROM {self._tbl(table)}.files"
        ).collect()
        return int(rows[0]["n"])

    # -- lineage ------------------------------------------------------------
    def log_lineage(
        self,
        df: DataFrame,
        stage: str,
        config_hash: str,
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> None:
        per_part = (
            df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows",
                F.lit(input_snapshot).alias("input_snapshot"),
                F.lit(config_hash).alias("config_hash"),
                F.lit(json.dumps(extra or {}, sort_keys=True)).alias("extra"),
            )
        )
        self.append(per_part, LINEAGE_TABLE)

    def log_lineage_for_table(
        self,
        table: str,
        stage: str,
        config_hash: str,
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> None:
        """Per-data-file lineage from the Iceberg ``.files`` metadata table —
        manifest record counts, no data scan (the real version of the
        ParquetCatalog's footer read)."""
        files = self.spark.sql(
            f"SELECT record_count FROM {self._tbl(table)}.files ORDER BY file_path"
        ).collect()
        # output snapshot goes in extra (as in ParquetCatalog) — NOT into
        # input_snapshot, which names the data a stage READ, not wrote;
        # the backends previously diverged here (empty string vs own
        # snapshot), mislabeling output as input on this one
        extra = dict(extra or {})
        extra["output_snapshot"] = self.snapshot_id(table)
        extra_json = json.dumps(extra, sort_keys=True)
        rows = [
            (stage, idx, int(r["record_count"]), input_snapshot, config_hash,
             extra_json)
            for idx, r in enumerate(files)
        ] or [(stage, -1, 0, input_snapshot, config_hash, extra_json)]
        self.append(self.spark.createDataFrame(rows, _LINEAGE_SCHEMA), LINEAGE_TABLE)

    def log_event(
        self, stage: str, config_hash: str, extra: dict | None = None
    ) -> None:
        row = self.spark.createDataFrame(
            [(stage, -1, 0, "", config_hash, json.dumps(extra or {}, sort_keys=True))],
            _LINEAGE_SCHEMA,
        )
        self.append(row, LINEAGE_TABLE)

    def lineage(self) -> DataFrame:
        return self.read(LINEAGE_TABLE)

    def stage_complete(self, stage: str, config_hash: str) -> bool:
        # snapshot-qualified like ParquetCatalog.stage_complete: the row
        # must describe the table's CURRENT snapshot (see that docstring)
        if not self.exists(stage) or not self.exists(LINEAGE_TABLE):
            return False
        snap = self.snapshot_id(stage)
        n = (
            self.lineage()
            .where(
                (F.col("stage") == stage) & (F.col("config_hash") == config_hash)
            )
            .where(
                F.coalesce(
                    F.get_json_object("extra", "$.output_snapshot"), F.lit(snap)
                )
                == snap
            )
            .limit(1)
            .count()
        )
        return n > 0
