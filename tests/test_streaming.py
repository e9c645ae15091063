"""Structured Streaming tests: incremental signature ingestion resumes
exactly-once across restarts (reference analog: progress-file resume,
/root/reference/pipeline.py:162-173) and windowed event-time aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.sources.pages_fixture import (
    generate_pages,
    pages_dataframe,
)
from image_deduplication_3m_images_spark.streaming.incremental import (
    stream_signatures,
    windowed_event_counts,
)


def test_stream_signatures_incremental(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    fx = generate_pages(n_rows=120, seed=11)
    n_total = fx.n_rows  # fixture has a planted-structure floor (may exceed 120)
    pages = pages_dataframe(spark, fx)
    first, second = pages.where("url < 'https://site0025'"), pages.where(
        "url >= 'https://site0025'"
    )
    n1, n2 = first.count(), second.count()
    assert n1 > 0 and n2 > 0 and n1 + n2 == n_total

    first.write.mode("append").parquet(indir)
    q = stream_signatures(spark, indir, outdir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(outdir)
    assert got1.count() == n1

    # restart with more files: only NEW files are processed (offset checkpoint)
    second.write.mode("append").parquet(indir)
    q2 = stream_signatures(spark, indir, outdir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(outdir)
    assert got2.count() == n_total
    assert got2.select("url").distinct().count() == n_total
    # signatures identical to the batch stage for the same rows: the stream
    # runs build_signatures verbatim, so it emits the packed signature schema
    # (minhash_bin + JVM-derived band_keys) plus the batch id.
    assert set(got2.columns) >= {
        "url", "text", "text_sha256", "minhash_bin", "band_keys",
        "simhash", "quality", "batch_id",
    }
    # byte-level parity with the batch stage for an overlapping row sample
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.plans.dedupe import build_signatures

    batch = build_signatures(pages, DedupConfig()).select(
        "url", "minhash_bin", "simhash"
    )
    stream_sample = got2.select("url", "minhash_bin", "simhash")
    assert stream_sample.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_sample).count() == 0


def test_windowed_event_counts_static_equivalence(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    agg = windowed_event_counts(events, window="10 minutes", watermark="1 minute")
    rows = agg.collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()  # static run: no late-drop
    # deterministic window boundaries
    for r in rows:
        assert r["window_start"].minute % 10 == 0


def test_stream_dedup_exactly_once_across_restarts(spark, tmp_path):
    """Stateful streaming dedup: each distinct text emitted once across
    micro-batches AND restarts (state store in the checkpoint)."""
    from image_deduplication_3m_images_spark.streaming.incremental import (
        stream_dedup,
    )

    indir, outdir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(indir)
    fx = generate_pages(n_rows=150, seed=7)
    pages = pages_dataframe(spark, fx).cache()
    n_distinct = pages.select("text").distinct().count()
    assert n_distinct < fx.n_rows  # fixture plants exact duplicates

    pages.write.mode("append").parquet(indir)
    q = stream_dedup(spark, indir, outdir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(outdir)
    assert got1.count() == n_distinct
    assert got1.select("text_sha256").distinct().count() == n_distinct

    # restart with the SAME rows re-appended as new files: state store must
    # suppress every one of them (exactly-once across restarts)
    pages.write.mode("append").parquet(indir)
    q2 = stream_dedup(spark, indir, outdir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(outdir)
    assert got2.count() == n_distinct


def test_sessionize_stream_matches_batch_across_restarts(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted across
    TWO micro-batch runs (restart in between) must equal the batch
    sessionization of the full data minus each user's final open session."""
    from image_deduplication_3m_images_spark.plans.queries import q_user_sessions
    from image_deduplication_3m_images_spark.streaming.incremental import (
        sessionize_stream,
    )

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    cutoff = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5)"
    ).collect()[0][0]

    indir, outdir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(indir)
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    first = events.where(mic <= cutoff)
    second = events.where(mic > cutoff)
    assert first.count() > 0 and second.count() > 0

    first.coalesce(1).write.mode("append").parquet(indir)
    q = sessionize_stream(spark, indir, outdir, ckpt)
    q.awaitTermination(120)
    second.coalesce(1).write.mode("append").parquet(indir)
    q2 = sessionize_stream(spark, indir, outdir, ckpt)
    q2.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["value_cents"])
        for r in spark.read.parquet(outdir).collect()
    }
    batch = q_user_sessions(spark, sf)
    w_last = Window.partitionBy("user_id").orderBy(F.col("session_idx").desc())
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["value_cents"])
        for r in batch.withColumn("rn", F.row_number().over(w_last))
        .where("rn > 1")  # drop each user's final (still-open) session
        .collect()
    }
    assert got == expected

def test_sessionize_stream_drops_cross_batch_late_events(spark, tmp_path):
    """A batch-2 event with ts OLDER than the user's state frontier must be
    dropped (watermark-style), not silently move the frontier backwards and
    corrupt session boundaries (ADVICE r2)."""
    import datetime as dt

    from image_deduplication_3m_images_spark.streaming.incremental import (
        sessionize_stream,
    )

    def ev(eid, minute, value):
        return (
            eid,
            dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute),
            1,
            "click",
            value,
            "{}",
        )

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    indir, outdir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    os.makedirs(indir)
    # batch 1: frontier ends at minute 5
    spark.createDataFrame([ev(1, 0, 1.0), ev(2, 5, 2.0)], schema) \
        .coalesce(1).write.mode("append").parquet(indir)
    q = sessionize_stream(spark, indir, outdir, ckpt)
    q.awaitTermination(120)
    # batch 2: minute 2 is LATE (< frontier 5) -> dropped; minute 60 closes
    # [0,5]; minute 120 closes [60,60]
    spark.createDataFrame(
        [ev(3, 2, 100.0), ev(4, 60, 4.0), ev(5, 120, 8.0)], schema
    ).coalesce(1).write.mode("append").parquet(indir)
    q2 = sessionize_stream(spark, indir, outdir, ckpt)
    q2.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
         r["session_end"].minute + 60 * r["session_end"].hour,
         r["n_events"], r["value_cents"])
        for r in spark.read.parquet(outdir).collect()
    )
    # late 100.0-value event appears nowhere; boundaries as if it never came
    assert got == [(1, 0, 5, 2, 300), (1, 60, 60, 1, 400)]

def test_stream_neardup_merges_later_duplicate_into_existing_cluster(
    spark, tmp_path
):
    """VERDICT r2 item 5: the incremental LSH->verify->CC loop.  Batch 1
    ingests most of a planted-cluster corpus; batch 2 (a stream RESTART,
    exercising the checkpoint) delivers held-out members of existing
    near-dup clusters — they must land in the clusters their mates already
    occupy, and the final partition must equal the batch pipeline's."""
    from image_deduplication_3m_images_spark.streaming.incremental import (
        stream_neardup,
    )
    from image_deduplication_3m_images_spark.plans.dedupe import run_dedupe

    fx = generate_pages(n_rows=150, seed=11)
    truth = {t["url"]: t["expected_cluster_id"] for t in fx.truth}
    # hold out ONE member of each of two multi-member planted clusters
    multi = {}
    for url, c in truth.items():
        if c.startswith(("near_", "exact_")):
            multi.setdefault(c, []).append(url)
    held_clusters = [c for c, urls in sorted(multi.items()) if len(urls) >= 3][:2]
    held = {multi[c][-1] for c in held_clusters}
    assert len(held) == 2

    pages = pages_dataframe(spark, fx)
    indir = str(tmp_path / "in")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    held_list = list(held)
    pages.where(~F.col("url").isin(held_list)).coalesce(1) \
        .write.mode("append").parquet(indir)
    q = stream_neardup(spark, indir, wh, ckpt)
    q.awaitTermination(300)
    pages.where(F.col("url").isin(held_list)).coalesce(1) \
        .write.mode("append").parquet(indir)
    q2 = stream_neardup(spark, indir, wh, ckpt)
    q2.awaitTermination(300)

    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        read_clusters,
    )

    got = {
        r["url"]: r["cluster_id"]
        for r in read_clusters(ParquetCatalog(spark, wh)).collect()
    }
    assert len(got) == len(fx.rows)
    # each held-out doc joined the cluster its mates already formed
    for c in held_clusters:
        mates = [u for u in multi[c] if u not in held]
        held_member = [u for u in multi[c] if u in held][0]
        assert got[held_member] == got[mates[0]], (c, held_member)

    # full equivalence: same cluster partition as the batch pipeline
    batch_report = run_dedupe(spark, pages, str(tmp_path / "wh_batch"))
    batch = {
        r["url"]: r["cluster_id"]
        for r in batch_report.select("url", "cluster_id").collect()
    }

    def partition(assign):
        groups = {}
        for u, c in assign.items():
            groups.setdefault(c, set()).add(u)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    assert partition(got) == partition(batch)

def test_ingest_neardup_batch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a COMPLETED batch id must not
    duplicate signatures/bands/edges or change clusters."""
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        ingest_neardup_batch,
        read_clusters,
    )

    fx = generate_pages(n_rows=60, seed=21)
    pages = pages_dataframe(spark, fx)
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cfg = DedupConfig()
    ingest_neardup_batch(spark, pages, 0, cat, cfg)
    n_sig = cat.read("signatures").count()
    n_edges = cat.read("edges").count()
    n_delta = cat.read("clusters_delta").count()
    clusters1 = sorted(
        (r["url"], r["cluster_id"]) for r in read_clusters(cat).collect()
    )
    # replay the same batch id -> complete no-op
    ingest_neardup_batch(spark, pages, 0, cat, cfg)
    assert cat.read("signatures").count() == n_sig
    assert cat.read("edges").count() == n_edges
    assert cat.read("clusters_delta").count() == n_delta
    clusters2 = sorted(
        (r["url"], r["cluster_id"]) for r in read_clusters(cat).collect()
    )
    assert clusters1 == clusters2

def test_ingest_neardup_delta_proportional_to_touched_cluster(spark, tmp_path):
    """VERDICT r3 item 2's done-criterion: when batch K touches ONE existing
    cluster, the rows written that batch are proportional to that cluster
    (its members + the batch docs), NOT the corpus — and the merged view
    still equals the batch pipeline's partition."""
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        compact_clusters,
        ingest_neardup_batch,
        read_clusters,
    )

    fx = generate_pages(n_rows=150, seed=11)
    truth = {t["url"]: t["expected_cluster_id"] for t in fx.truth}
    multi = {}
    for url, c in truth.items():
        if c.startswith(("near_", "exact_")):
            multi.setdefault(c, []).append(url)
    target = next(c for c, urls in sorted(multi.items()) if len(urls) >= 3)
    held = sorted(multi[target])[-1]  # hold out one member of ONE cluster

    pages = pages_dataframe(spark, fx)
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cfg = DedupConfig()
    ingest_neardup_batch(spark, pages.where(F.col("url") != held), 0, cat, cfg)
    n_corpus = cat.read("clusters_delta").count()

    ingest_neardup_batch(spark, pages.where(F.col("url") == held), 1, cat, cfg)
    delta1 = cat.read("clusters_delta").where("batch_id = 1")
    n_delta1 = delta1.count()
    # batch 1 may touch at most: the held doc + members of its (single)
    # target cluster — never the corpus
    assert n_delta1 <= len(multi[target]) + 1, delta1.collect()
    assert n_delta1 < n_corpus / 10

    got = {r["url"]: r["cluster_id"] for r in read_clusters(cat).collect()}
    assert len(got) == len(fx.rows)
    mates = [u for u in multi[target] if u != held]
    assert got[held] == got[mates[0]]

    # compaction folds the delta into the base without changing the view
    compact_clusters(cat)
    assert not cat.exists("clusters_delta")
    after = {r["url"]: r["cluster_id"] for r in read_clusters(cat).collect()}
    assert after == got


def test_read_clusters_plan_has_no_corpus_exchange(spark, tmp_path):
    """VERDICT r4 item 3's done-criterion: the merge-on-read resolution must
    shuffle ONLY the delta — the corpus-sized base is scanned (anti-join
    against the broadcast delta id set) but never enters an Exchange.  The
    only shuffle exchange allowed in the plan is the delta-sized window."""
    import io
    from contextlib import redirect_stdout

    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        read_clusters,
    )

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(f"u{i}", f"u{i}") for i in range(500)], ["url", "cluster_id"]
    )
    cat.write(base, "clusters")
    delta = spark.createDataFrame(
        [("u1", "u0", 0), ("u2", "u0", 1)], ["url", "cluster_id", "batch_id"]
    )
    cat.append(delta, "clusters_delta")

    merged = read_clusters(cat)
    buf = io.StringIO()
    with redirect_stdout(buf):
        merged.explain("formatted")
    plan = buf.getvalue()
    # base side joins via broadcast ANTI-join (no exchange on the base); the
    # only shuffle exchanges are the delta-sized window hashpartitionings
    # (the window appears twice: once for the delta id set inside the
    # broadcast subtree, once for the delta winners in the union branch)
    assert "BroadcastExchange" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:3000]
    n_shuffle_exchanges = plan.count(") Exchange")
    assert n_shuffle_exchanges <= 2, plan[:3000]
    # and the merge itself is correct: delta rows win, base fills the rest
    got = {r["url"]: r["cluster_id"] for r in merged.collect()}
    assert len(got) == 500
    assert got["u1"] == "u0" and got["u2"] == "u0" and got["u3"] == "u3"


def test_ingest_auto_compaction_bounds_delta(spark, tmp_path):
    """VERDICT r4 item 5: an unattended stream must keep the delta bounded
    by the policy — with an aggressive policy every batch folds the delta
    into the base, the merged view stays equal to a batch run, and the
    compaction is lineage-logged (never silent)."""
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.plans.dedupe import run_dedupe
    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        ingest_neardup_batch,
        read_clusters,
    )

    fx = generate_pages(n_rows=120, seed=31)
    pages = pages_dataframe(spark, fx)
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cfg = DedupConfig()

    # 4 micro-batches, compaction policy: fold whenever delta >= 1 row and
    # >= 10% of base
    splits = pages.withColumn("_b", F.abs(F.hash("url")) % 4)
    for b in range(4):
        ingest_neardup_batch(
            spark,
            splits.where(F.col("_b") == b).drop("_b"),
            b,
            cat,
            cfg,
            compact_frac=0.1,
            compact_min_rows=1,
        )
        # the policy bound holds after every batch: either the delta was
        # folded away, or what remains is under 10% of the base
        d = cat.row_count("clusters_delta") if cat.exists("clusters_delta") else 0
        base = cat.row_count("clusters") if cat.exists("clusters") else 0
        assert d == 0 or d < 0.1 * base, (b, d, base)

    got = {r["url"]: r["cluster_id"] for r in read_clusters(cat).collect()}
    assert len(got) == len(fx.rows)

    # compaction events are lineage-logged
    events = (
        cat.lineage().where(F.col("stage") == "clusters_compaction").count()
    )
    assert events >= 1

    # merged view == batch pipeline partition
    batch_report = run_dedupe(spark, pages, str(tmp_path / "wh_batch"))
    batch = {
        r["url"]: r["cluster_id"]
        for r in batch_report.select("url", "cluster_id").collect()
    }

    def partition(assign):
        groups = {}
        for u, c in assign.items():
            groups.setdefault(c, set()).add(u)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    assert partition(got) == partition(batch)


def test_within_batch_duplicate_url_winner_is_deterministic(spark, tmp_path):
    """One url delivered twice in a micro-batch with DIFFERENT html: the
    signed row must be the same (min content hash) no matter the delivery
    order — dropDuplicates' arbitrary winner would let a crash-replay sign
    different html than the crashed attempt whose edges already committed."""
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
    from image_deduplication_3m_images_spark.streaming.incremental import (
        ingest_neardup_batch,
    )

    pages = pages_dataframe(spark, generate_pages(n_rows=20, seed=47))
    first_url = pages.select("url").orderBy("url").limit(1).collect()[0]["url"]
    mutated = (
        pages.where(F.col("url") == first_url)
        .withColumn(
            "html",
            F.encode(
                F.lit("<html><body><p>mutated alternate delivery</p></body></html>"),
                "utf-8",
            ),
        )
        .withColumn("text", F.lit("mutated alternate delivery"))
    )
    cfg = DedupConfig()
    texts = {}
    for name, batch in (
        ("orig_first", pages.unionByName(mutated)),
        ("mutated_first", mutated.unionByName(pages)),
    ):
        cat = ParquetCatalog(spark, str(tmp_path / name))
        ingest_neardup_batch(spark, batch, 0, cat, cfg)
        sigs = cat.read("signatures").where(F.col("url") == first_url).collect()
        assert len(sigs) == 1  # exactly one signed row for the url
        texts[name] = sigs[0]["text"]
    assert texts["orig_first"] == texts["mutated_first"]
