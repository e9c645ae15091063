"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row count,
column names, and order-insensitive value hash.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from image_deduplication_3m_images_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # The pair-query oracles emit FULL within-bucket O(n^2) pairs, while the
    # engine substitutes salted/star edges above bucket_star_cap — parity on
    # those queries is only meaningful when no fixture bucket exceeds the
    # cap.  Fail loudly here instead of letting a fixture change silently
    # turn hash mismatches into a head-scratcher.
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.operators.lsh import hot_bucket_stats
    from image_deduplication_3m_images_spark.plans.queries import _sig

    cfg = DedupConfig()
    prof = hot_bucket_stats(_sig(spark, sf_dir), cfg, id_col="doc_id").collect()[0]
    if prof["max_bucket"] > cfg.bucket_star_cap:
        sys.exit(
            f"FIXTURE INVALID FOR PARITY: max band bucket {prof['max_bucket']} "
            f"> bucket_star_cap {cfg.bucket_star_cap}; the engine would take "
            "the star/salt tiers while the DuckDB oracle models full "
            "within-bucket pairs. Shrink the fixture or raise the cap."
        )

    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    failures = []
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in omap:
            print(f"{name:24s} rows-only: spark={len(srows)} (no oracle)")
            continue
        try:
            res = con.execute(omap[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = table_hash(scols, [[r[c] for c in scols] for r in srows])
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:24s} {status}  rows {len(srows)}/{len(drows)}"
            f" cols={'=' if ok_cols else f'{scols} vs {dcols}'}"
            f" hash={'=' if ok_hash else f'{sh} vs {dh}'}"
        )
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all parity checks passed")


if __name__ == "__main__":
    main()
