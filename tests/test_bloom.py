from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.operators.bloom import (
    _positions,
    bloom_params,
    build_bloom,
    incremental_new,
    might_contain_col,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_no_false_negatives(spark):
    """Every inserted key must probe positive — the correctness invariant
    the whole router rests on."""
    keys = [f"doc-{i}-{i * 7919}" for i in range(5000)]
    seen = _keys_df(spark, keys)
    bitmap, m_bits, k = build_bloom(seen, "k", fpp=0.01)
    probe = might_contain_col(spark, bitmap, m_bits, k)
    flagged = seen.select(
        probe(F.xxhash64("k"), F.xxhash64("k", F.lit(0x9E3779B9))).alias("hit")
    )
    assert flagged.where(~F.col("hit")).count() == 0


def test_false_positive_rate_in_range(spark):
    """Disjoint probe keys must mostly miss: FP rate well under 5x target."""
    seen = _keys_df(spark, [f"seen-{i}" for i in range(5000)])
    other = _keys_df(spark, [f"other-{i}" for i in range(5000)])
    bitmap, m_bits, k = build_bloom(seen, "k", fpp=0.01)
    probe = might_contain_col(spark, bitmap, m_bits, k)
    fp = (
        other.select(
            probe(F.xxhash64("k"), F.xxhash64("k", F.lit(0x9E3779B9))).alias("hit")
        )
        .where("hit")
        .count()
    )
    assert fp / 5000 < 0.05, fp


def test_positions_distinct_under_pow2(spark):
    """h2 forced odd: the k probe slots of one key never all collapse."""
    h1 = np.array([-1, 0, 2**63 - 1, 12345], dtype=np.int64)
    h2 = np.zeros(4, dtype=np.int64)  # worst case: even (zero) second hash
    pos = _positions(h1, h2, 1 << 16, 8)
    for col in pos.T:
        assert len(set(col.tolist())) > 1


def test_bloom_params_monotonic():
    m1, _ = bloom_params(1000, 0.01)
    m2, _ = bloom_params(100000, 0.01)
    assert m2 > m1
    assert m1 & (m1 - 1) == 0 and m2 & (m2 - 1) == 0


def test_incremental_new_equals_plain_antijoin(spark):
    """The bloom router must be row-for-row identical to the exact
    anti-join, including duplicate keys inside `new` (kept, like anti-join)
    and duplicate keys inside `seen` (harmless)."""
    seen = _keys_df(spark, [f"k{i}" for i in range(0, 400)] + ["k7", "k7"])
    new = spark.createDataFrame(
        [(i, f"k{i}") for i in range(300, 700)] + [(9001, "k9001"), (9002, "k9001")],
        "id long, k string",
    )
    got = incremental_new(new, seen, "k").orderBy("id").collect()
    want = new.join(seen.select("k"), "k", "left_anti").orderBy("id").collect()
    assert sorted((r["id"], r["k"]) for r in got) == sorted(
        (r["id"], r["k"]) for r in want
    )
    # and duplicates within `new` survive (anti-join semantics, not distinct)
    assert sum(1 for r in got if r["k"] == "k9001") == 2


def test_incremental_new_empty_seen(spark):
    seen = _keys_df(spark, []).where("1=0")
    new = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    got = incremental_new(new, seen, "k")
    assert got.count() == 2
