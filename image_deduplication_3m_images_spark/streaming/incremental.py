"""Structured Streaming extensions.

The reference has no true streaming (SURVEY.md §2.7): its nearest analogs are
the resume-from-progress-file loop (``/root/reference/pipeline.py:162-173``)
and bounded producer/consumer queues (pipelining, not streaming).  These are
the idiomatic Spark extensions for the same intents:

* ``stream_signatures`` — incremental ingestion: new page files appearing in a
  directory are signed and appended to the signatures table via
  ``foreachBatch`` running the SAME batch stage function (one code path for
  batch and streaming — the lambda-architecture killer).
* ``windowed_event_counts`` — event-time windowed aggregation with a
  watermark for late data (the canonical streaming operator set), exposed for
  the ``events`` testdata table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.config import DedupConfig
from image_deduplication_3m_images_spark.plans.dedupe import build_signatures


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    trigger_available_now: bool = True,
):
    """Continuously sign new page files landing in ``input_dir``.

    Source offsets live in the streaming checkpoint, but ``foreachBatch``
    itself is AT-LEAST-ONCE: a crash after the sink write commits but
    before the epoch is recorded replays the batch.  The sink is therefore
    made IDEMPOTENT — each batch dynamically overwrites its OWN
    ``batch_id=N`` partition, so a replay rewrites the same files instead
    of appending a second copy.  (A plain ``mode("append")`` here would
    silently double-count a replayed batch: this output is raw parquet
    with no dropDuplicates-on-read healing layer, unlike the catalog
    tables.)  Returns the started StreamingQuery; callers
    ``awaitTermination()``.
    """
    cfg = cfg or DedupConfig()
    pages_schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(pages_schema).parquet(input_dir)

    def _sign_batch(batch_df: DataFrame, batch_id: int) -> None:
        import glob
        import os

        # migration guard: an output dir written by the OLD flat-append sink
        # holds root-level part files; Spark cannot mix flat and partitioned
        # layouts under one root ("Conflicting directory structures").  Fail
        # with instructions instead of letting the reader throw that.
        if glob.glob(os.path.join(output_dir, "*.parquet")):
            raise RuntimeError(
                f"{output_dir} contains flat (pre-idempotent-sink) signature "
                "files; the sink now writes batch_id=N partitions and the two "
                "layouts cannot share a directory — move the old files into a "
                "batch_id=<old> subdir or point the stream at a fresh output "
                "dir"
            )
        (
            build_signatures(batch_df, cfg)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(_sign_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Streaming exact dedup: emit each distinct text exactly once across
    ALL micro-batches and restarts.

    Spark-native statefulness: ``dropDuplicates`` on a streaming frame keeps
    the seen-key set in the state store, which lives in the streaming
    checkpoint — so a restart resumes the dedup set instead of re-emitting
    (the reference's processed-set resume, ``/root/reference/pipeline.py:162-173``,
    re-expressed as managed streaming state instead of a hand-rolled JSON
    file).  Key = sha256(text): 64 bytes of state per distinct doc, not the
    text itself — the state store stays small at corpus scale.
    """
    pages_schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(input_dir)
        .withColumn("text_sha256", F.sha2(F.col("text").cast("binary"), 256))
        .dropDuplicates(["text_sha256"])
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp_ntz, session_end timestamp_ntz,"
    " n_events int, value_cents long"
)
_SESSION_STATE_SCHEMA = "last_us long, start_us long, n_events int, value_cents long"


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    trigger_available_now: bool = True,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    gap-based per-user sessionization.  Emits a session row when a user's
    next event arrives more than ``gap_minutes`` after their previous one;
    the open session (last_ts, start, counts) lives in the state store, so
    sessions CLOSE CORRECTLY ACROSS micro-batches and restarts.

    Semantics contract: identical to the batch query
    ``plans.queries.q_user_sessions`` (window lag + running sum), except the
    stream only emits CLOSED sessions — each user's final, still-open
    session stays in state (the test asserts exactly this equivalence).
    State is 4 scalars per user, independent of event volume.

    Late data: WITHIN a micro-batch events may arrive in any order (sorted
    here before processing), but an event whose ts is OLDER than the user's
    state frontier (``last_us``, the newest event already processed in a
    prior batch) is DROPPED — it may belong to a session that already
    closed and was emitted, so retroactively applying it would corrupt
    session boundaries.  This is the same contract a watermark gives a
    windowed agg: batch-equivalence holds exactly for input that is
    per-user ordered ACROSS micro-batches (the file-source default when
    files land in event order).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    events_schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    stream = spark.readStream.schema(events_schema).parquet(input_dir)

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        user_id = int(key[0])
        ev = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        us = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # HALF_UP on the same double Spark's round() sees (values positive)
        cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype("int64")
        if state.exists:
            last_us, start_us, n, tot = state.get
        else:
            last_us = start_us = None
            n, tot = 0, 0
        if last_us is not None:
            # cross-batch late arrivals: older than the state frontier ->
            # drop (see docstring); np.searchsorted on the sorted array
            # finds the cut without a python loop
            cut = int(np.searchsorted(us, last_us, side="left"))
            if cut:
                us, cents = us[cut:], cents[cut:]
        closed = []
        for u, c in zip(us.tolist(), cents.tolist()):
            if last_us is not None and u - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, tot))
                start_us, n, tot = u, 0, 0
            if start_us is None:
                start_us = u
            last_us = u
            n += 1
            tot += c
        state.update((last_us, start_us, n, tot))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "value_cents",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    sessions = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_URL_BLOOM = "_url_bloom"


def _load_url_bloom(cat) -> dict | None:
    """Driver-side fetch of the persisted url-bloom artifact (one row, MBs
    — an index structure, not data; same class as the 1-row profile aggs)."""
    if not cat.exists(_URL_BLOOM):
        return None
    r = cat.read(_URL_BLOOM).collect()[0]
    return {
        "bitmap": bytes(r["bitmap"]),
        "m_bits": int(r["m_bits"]),
        "k": int(r["k"]),
        "n_inserted": int(r["n_inserted"]),
        "n_capacity": int(r["n_capacity"]),
    }


def _store_url_bloom(
    spark, cat, bitmap: bytes, m_bits: int, k: int, n_inserted: int, n_capacity: int
) -> None:
    df = spark.createDataFrame(
        [(bytearray(bitmap), m_bits, k, n_inserted, n_capacity)],
        "bitmap binary, m_bits long, k long, n_inserted long, n_capacity long",
    )
    cat.write(df, _URL_BLOOM)  # atomic overwrite (tmp dir + rename)


def _update_url_bloom(
    spark,
    cat,
    new_ids: DataFrame,
    n_new: int,
    state: dict | None,
    has_old: bool,
    cfg,
    expected: int,
    fpp: float,
    max_bytes: int,
) -> None:
    """Fold this batch's urls into the persisted bloom BEFORE the batch's
    signature append commits, so the bloom is always a SUPERSET of ingested
    urls (a crash between the bloom write and the signature append only
    turns the replayed batch's rows into bloom hits, which the exact
    anti-join then passes — false positives cost a scan, false negatives
    would silently break first-write-wins, so the ordering rules them out).

    Capacity policy: the artifact is sized for ``expected`` keys; when
    inserts cross capacity it is REBUILT at the next power-of-two capacity
    from the committed corpus (one column-pruned scan, O(log corpus) times
    over a warehouse's lifetime) — unless that would exceed ``max_bytes``,
    in which case the existing bitmap is kept (a saturated bloom degrades
    fpp, never correctness) and the crossing is logged once to lineage.
    A first creation already over ``max_bytes`` stores a DISABLED sentinel
    (m_bits=0) so the decision — like the crossing — is made and logged
    exactly once, not re-evaluated every micro-batch.

    The ``n_inserted`` counter is replay-stable: against an existing bloom,
    this batch's contribution is counted as its bloom-MISSES (ids the
    bitmap has never seen), so a crash-replayed batch — whose urls were
    inserted by the crashed attempt — adds ~0, not a second full count.
    The fpp-fraction of genuinely-new ids probe positive and go uncounted,
    so the counter runs ~fpp low; the 2x capacity headroom at (re)build
    absorbs that bias.
    """
    from image_deduplication_3m_images_spark.operators.bloom import (
        _hash_exprs,
        bloom_params,
        build_bloom,
        might_contain_col,
    )
    from image_deduplication_3m_images_spark.plans.dedupe import ID

    def _corpus_ids():
        # no dropDuplicates: bloom insertion is idempotent, so the rebuild
        # scan stays map-only (no corpus shuffle)
        if has_old:
            return cat.read("signatures").select(ID).unionByName(new_ids.select(ID))
        return new_ids.select(ID)

    if state is None:
        # first creation (or self-heal of a pre-bloom warehouse): seed from
        # everything committed so far plus this batch
        n_committed = cat.row_count("signatures") if has_old else 0
        n_total = n_committed + n_new
        capacity = max(expected, 2 * n_total)
        m_bits, k = bloom_params(capacity, fpp)
        if m_bits // 8 > max_bytes:
            cat.log_event(
                "url_bloom_disabled",
                cfg.config_hash(),
                extra={"needed_bytes": m_bits // 8, "max_bytes": max_bytes},
            )
            # persist the decision: m_bits=0 sentinel keeps later batches
            # from re-sizing and re-logging this every trigger; n_capacity
            # records the max_bytes that drove it, so the sentinel gate is
            # constant-time until the budget is actually raised
            _store_url_bloom(spark, cat, b"", 0, 0, n_total, max_bytes)
            return
        bitmap, m_bits, k = build_bloom(_corpus_ids(), ID, params=(m_bits, k))
        _store_url_bloom(spark, cat, bitmap, m_bits, k, n_total, capacity)
        return

    if state["m_bits"] == 0:
        # disabled sentinel — but ``max_bytes`` may have been RAISED since
        # the decision (ADVICE r5: the sentinel was permanent, leaving the
        # routing off forever).  The sentinel's ``n_capacity`` field records
        # the max_bytes that drove the disable (0 for pre-fix sentinels), so
        # the common path — same budget as last time — stays a constant-time
        # return; only a CHANGED budget pays the re-sizing (and at most once
        # per change: a still-too-small budget is re-recorded below).
        if max_bytes <= state["n_capacity"]:
            return
        n_committed = cat.row_count("signatures") if has_old else 0
        n_total = n_committed + n_new
        capacity = max(expected, 2 * n_total)
        m_bits, k = bloom_params(capacity, fpp)
        if m_bits // 8 > max_bytes:
            # still too big: refresh the recorded budget so the next batch
            # with this max_bytes returns at the constant-time gate above
            _store_url_bloom(spark, cat, b"", 0, 0, state["n_inserted"], max_bytes)
            return
        bitmap, m_bits, k = build_bloom(_corpus_ids(), ID, params=(m_bits, k))
        _store_url_bloom(spark, cat, bitmap, m_bits, k, n_total, capacity)
        cat.log_event(
            "url_bloom_reenabled",
            cfg.config_hash(),
            extra={"m_bits": m_bits, "max_bytes": max_bytes},
        )
        return

    # replay-stable contribution (docstring): count this batch's bloom-MISSES
    h1, h2 = _hash_exprs(ID)
    probe = might_contain_col(spark, state["bitmap"], state["m_bits"], state["k"])
    n_new = new_ids.where(~probe(h1, h2)).count()
    n_ins = state["n_inserted"] + n_new
    if n_ins > state["n_capacity"]:
        cap2 = state["n_capacity"]
        while cap2 < n_ins:
            cap2 *= 2
        m2, k2 = bloom_params(cap2, fpp)
        if m2 // 8 <= max_bytes:
            bitmap2, m2, k2 = build_bloom(_corpus_ids(), ID, params=(m2, k2))
            _store_url_bloom(spark, cat, bitmap2, m2, k2, n_ins, cap2)
            cat.log_event(
                "url_bloom_rebuilt",
                cfg.config_hash(),
                extra={"n_inserted": n_ins, "n_capacity": cap2, "m_bits": m2},
            )
            return
        if state["n_inserted"] <= state["n_capacity"]:  # log the crossing once
            cat.log_event(
                "url_bloom_saturated",
                cfg.config_hash(),
                extra={"n_inserted": n_ins, "n_capacity": state["n_capacity"]},
            )
    batch_bits, _, _ = build_bloom(
        new_ids.select(ID), ID, params=(state["m_bits"], state["k"])
    )
    import numpy as np

    merged = (
        np.frombuffer(state["bitmap"], dtype=np.uint8)
        | np.frombuffer(batch_bits, dtype=np.uint8)
    ).tobytes()
    _store_url_bloom(
        spark, cat, merged, state["m_bits"], state["k"], n_ins, state["n_capacity"]
    )


def ingest_neardup_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    cat,
    cfg,
    compact_frac: float = 0.5,
    compact_min_rows: int = 50_000,
    url_bloom: bool = True,
    url_bloom_expected: int = 1_000_000,
    url_bloom_fpp: float = 0.01,
    url_bloom_max_bytes: int = 256 << 20,
) -> None:
    """One incremental near-dup step over the checkpoint catalog (the
    ``foreachBatch`` body of :func:`stream_neardup`; exposed separately so
    batch tests and backfills can drive it directly).

    ``compact_frac`` / ``compact_min_rows``: the ``clusters_delta``
    auto-compaction policy — fold the delta into the base when the delta
    exceeds BOTH bounds (see the policy block at the end).

    Work per batch is proportional to (new docs x matched buckets) plus CC
    over the accumulated EDGE set — never to the corpus size:

    0. route the re-crawl guard through the persisted ``_url_bloom``
       (``url_bloom=True``): a batch with no might-seen urls skips the
       per-batch corpus id scan entirely; might-seen rows keep the exact
       anti-join, so routing never changes results (superset invariant in
       ``_update_url_bloom``),
    1. sign the new pages (same ``build_signatures`` as the batch pipeline —
       one code path),
    2. band them and join against the checkpointed ``bands`` table; the new
       side is tiny, so it broadcasts and the corpus bands scan map-side
       (no corpus shuffle).  Every emitted pair touches >= 1 new doc, so no
       pair is ever re-verified across batches,
    3. verify with the same evidence exprs (signatures semi-filtered by the
       broadcast pair set when the byte guard allows),
    4. append new signatures/bands/edges, then maintain clusters
       INCREMENTALLY: contract new edges onto the stored cluster labels,
       run CC on the contracted (batch-sized) graph only, and append the
       delta — members of label-changed clusters plus this batch's docs —
       to ``clusters_delta`` (merge-on-read; ``read_clusters`` resolves
       precedence delta-side, so the per-batch READ is also delta-bounded:
       the base is scanned map-side, never shuffled).  A duplicate arriving
       in a later batch lands in its existing cluster (reference analog:
       the resume loop re-running dedup over new blobs,
       ``/root/reference/pipeline.py:464-471``), and per-batch write bytes
       are proportional to the touched clusters, never the corpus.

    Exactly-once: ``foreachBatch`` is at-least-once, so each completed batch
    id is recorded in ``_batches`` and a replay of a completed batch is a
    no-op.  A crash mid-batch may leave partial appends; the replay then
    re-appends, and ``dropDuplicates`` on read (signatures/bands by natural
    key, edges by pair) makes that harmless.
    """
    from pyspark.sql import functions as F

    from image_deduplication_3m_images_spark.operators.cluster import (
        connected_components,
    )
    from image_deduplication_3m_images_spark.operators.lsh import explode_bands
    from image_deduplication_3m_images_spark.operators.verify import verify_pairs
    from image_deduplication_3m_images_spark.plans.dedupe import ID, build_signatures

    if cat.exists("_batches"):
        done = {r["batch_id"] for r in cat.read("_batches").collect()}
        if batch_id in done:
            return

    has_old = cat.exists("signatures")
    bloom_state = _load_url_bloom(cat) if url_bloom else None
    if has_old:
        # Re-crawl guard: a url delivered again in a LATER batch is ALREADY
        # ingested — signing it again would give the catalog two signature
        # rows for one id (duplicated verify joins; stale edges never
        # invalidated -> nondeterministic clusters).  Map-side two-step: the
        # corpus id column is scanned ONCE against the broadcast batch ids
        # (no corpus shuffle), and the resulting batch-sized `existing` set
        # broadcast-anti-joins the batch.  Rows from EARLIER batches only:
        # a crash-replay of THIS batch id re-delivers rows whose partial
        # appends carry the same batch_id — those must be re-processed (the
        # dropDuplicates read heals the double-append), not filtered out
        # (filtering them would silently lose the batch's edges/clusters).
        #
        # BLOOM ROUTING: even column-pruned, that corpus id scan is O(corpus
        # bytes) PER MICRO-BATCH (~40 TB at 10^12 urls).  The persisted
        # ``_url_bloom`` — a superset of every ingested url by construction
        # (see ``_update_url_bloom``: bloom commit precedes signature
        # commit) — probes the BATCH map-side first; only might-seen ids
        # (true re-crawls + fpp) keep the corpus scan, and a batch with no
        # hits skips it entirely.  Routing is exact: bloom hits still pass
        # through the same anti-join, misses are definitely-new.
        batch_ids = batch_df.select(ID).distinct()
        n_maybe = None
        if bloom_state is not None and bloom_state["m_bits"] > 0:
            from image_deduplication_3m_images_spark.operators.bloom import (
                _H2_SALT,
                might_contain_col,
            )

            probe = might_contain_col(
                spark, bloom_state["bitmap"], bloom_state["m_bits"], bloom_state["k"]
            )
            # lazy checkpoint materialized by the count — ONE job for
            # truncate+materialize+count instead of two (same fusion as
            # the CC loop's probe); batch-sized, consumed by count + join
            batch_ids = batch_ids.where(
                probe(F.xxhash64(F.col(ID)), F.xxhash64(F.col(ID), F.lit(_H2_SALT)))
            ).localCheckpoint(eager=False)
            n_maybe = batch_ids.count()
        if n_maybe != 0:
            existing = (
                cat.read("signatures")
                .where(F.col("batch_id") < F.lit(batch_id))
                .select(ID)
                .join(F.broadcast(batch_ids), ID, "leftsemi")
            )
            batch_df = batch_df.join(F.broadcast(existing), ID, "left_anti")
    # WITHIN-batch re-delivery: one url twice in a micro-batch would emit two
    # signature rows with the SAME batch_id (nondeterministic winner under
    # dropDuplicates-on-read if the html differs) — keep one row per url
    # before signing, chosen DETERMINISTICALLY (min content hash), because a
    # crash-replay re-runs this pick: dropDuplicates keeps an arbitrary row,
    # so a replay could sign different html than the crashed attempt whose
    # partial edge appends are already committed — exactly the stale-edge
    # nondeterminism the guard exists to rule out.  POLICY (here and for the
    # cross-batch guard above): re-crawled content is FIRST-WRITE-WINS — a
    # url's signatures, edges and cluster membership reflect the first html
    # ingested for it; re-crawls with changed content are dropped, not
    # re-clustered (ADVICE r4 item 2).
    from pyspark.sql import Window

    w_dedup = Window.partitionBy(ID).orderBy(
        F.xxhash64(F.col("html")).asc_nulls_first(),
        F.xxhash64(F.col("text")).asc_nulls_first(),
    )
    batch_df = (
        batch_df.withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    sig_new = (
        build_signatures(batch_df, cfg)
        .withColumn("batch_id", F.lit(batch_id))
        # lazy: the count below materializes the checkpoint in the same
        # job (used 4x below; batch-sized, not corpus-sized)
        .localCheckpoint(eager=False)
    )
    n_new = sig_new.count()
    if url_bloom:
        # committed BEFORE any table append — bloom must stay a superset of
        # ingested urls under any crash point (docstring of _update_url_bloom)
        _update_url_bloom(
            spark,
            cat,
            sig_new.select(ID),
            n_new,
            bloom_state,
            has_old,
            cfg,
            url_bloom_expected,
            url_bloom_fpp,
            url_bloom_max_bytes,
        )
    bands_new = explode_bands(sig_new.select(ID, "band_keys"), cfg, id_col=ID)

    if has_old:
        sig_all = cat.read("signatures").dropDuplicates([ID]).unionByName(sig_new)
        bands_all = (
            cat.read("bands")
            .select(ID, "band_id", "band_key")
            .dropDuplicates([ID, "band_id"])
            .unionByName(bands_new)
        )
    else:
        sig_all, bands_all = sig_new, bands_new

    # Broadcast the NEW side only when it fits cluster-wide (same two-level
    # byte guard as the batch pipeline: object size AND size x executors —
    # a broadcast is fetched+held PER EXECUTOR).  A normal micro-batch is
    # tiny and broadcasts (corpus bands scan map-side, no shuffle); a huge
    # backfill batch (availableNow over a pre-existing directory delivers
    # the WHOLE backlog as one batch) falls back to a plain shuffle join,
    # which is the right plan at that size rather than an >8 GB broadcast.
    from image_deduplication_3m_images_spark.session import executor_count

    n_exec = executor_count(spark)
    bands_rows = n_new * cfg.bands
    bands_bytes = bands_rows * 64  # id + band_id + band_key longs + row overhead
    small_bands = (
        bands_bytes < 256 * 1024 * 1024 and bands_bytes * n_exec < 1 << 30
    )
    new_side = bands_new.select("band_id", "band_key", F.col(ID).alias("id_n"))
    pairs = (
        (F.broadcast(new_side) if small_bands else new_side)
        .join(
            bands_all.select("band_id", "band_key", F.col(ID).alias("id_o")),
            ["band_id", "band_key"],
        )
        .where(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        # consumed twice (byte-guard stats agg + edge append): checkpoint so
        # the band join runs once per batch, mirroring sig_new's treatment
        .localCheckpoint(eager=True)
    )

    # same byte guard as the batch pipeline: broadcast the pair set (so the
    # corpus-wide signatures never shuffle) unless a pathological band
    # explosion makes it large
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("id_a") + F.length("id_b")).alias("avg_id_bytes"),
    ).collect()[0]
    est_bytes = (stats["n"] or 0) * ((stats["avg_id_bytes"] or 0.0) + 16)
    # two-level like the batch guard: object size AND cluster-wide cost
    small_pairs = est_bytes < 256 * 1024 * 1024 and est_bytes * n_exec < 1 << 30
    verified = verify_pairs(
        F.broadcast(pairs) if small_pairs else pairs,
        sig_all,
        cfg,
        id_col=ID,
        texts_df=sig_all.select(ID, "text"),
        prefilter_broadcast=small_pairs,
    )
    new_edges = (
        verified.where(F.col("verified"))
        .select("id_a", "id_b")
        # consumed by the edge append AND the cluster contraction below;
        # batch-sized
        .localCheckpoint(eager=True)
    )

    cat.append(sig_new, "signatures")
    cat.append(bands_new.withColumn("batch_id", F.lit(batch_id)), "bands")
    cat.append(new_edges.withColumn("batch_id", F.lit(batch_id)), "edges")

    # --- INCREMENTAL cluster maintenance (VERDICT r3 item 2) --------------
    # Bytes written per batch are proportional to the TOUCHED clusters, not
    # the corpus: new edges are CONTRACTED onto the stored cluster labels
    # (label(x) = stored cluster id, or x itself for unseen ids), CC runs on
    # the contracted batch-sized graph only, and the delta — members of
    # clusters whose label changed, plus this batch's docs — is APPENDED to
    # ``clusters_delta`` (merge-on-read; ``read_clusters`` resolves latest-
    # per-id, ``compact_clusters`` folds the delta into the base).  The
    # label-min invariant (cluster id = min member url) is preserved
    # inductively: old labels are the min of their members, so min-of-labels
    # = min-of-members for every merged component.  The stored clusters
    # table is SCANNED map-side (broadcast batch-sized sets) but never
    # shuffled and never rewritten.
    maybe_bcast = F.broadcast if small_pairs else (lambda df: df)
    new_ids = sig_new.select(F.col(ID).alias("id"))
    has_clusters = cat.exists("clusters") or cat.exists("clusters_delta")
    if has_clusters:
        current = read_clusters(cat, id_col=ID).withColumnRenamed(ID, "id")
        nodes = (
            new_edges.select(F.col("id_a").alias("id"))
            .unionByName(new_edges.select(F.col("id_b").alias("id")))
            .dropDuplicates(["id"])
        )
        known = current.join(maybe_bcast(nodes), "id")  # map-side corpus scan
        lmap = (
            nodes.join(known.select("id", "cluster_id"), "id", "left")
            .select("id", F.coalesce("cluster_id", F.col("id")).alias("lab"))
            .localCheckpoint(eager=True)  # batch-sized, consumed 3x
        )
        contracted = (
            new_edges.join(
                maybe_bcast(lmap.select(F.col("id").alias("id_a"),
                                        F.col("lab").alias("lab_a"))), "id_a")
            .join(
                maybe_bcast(lmap.select(F.col("id").alias("id_b"),
                                        F.col("lab").alias("lab_b"))), "id_b")
            .where(F.col("lab_a") != F.col("lab_b"))
            .select(F.col("lab_a").alias("id_a"), F.col("lab_b").alias("id_b"))
        )
        assignments = connected_components(contracted)
        changed = (
            assignments.where(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias("old_label"),
                    F.col("cluster_id").alias("new_label"))
            .localCheckpoint(eager=True)  # batch-sized, consumed 2x
        )
        # members of clusters whose label changed — one more map-side scan
        # of the stored clusters; output is proportional to touched clusters
        upd_existing = current.join(
            maybe_bcast(changed), current["cluster_id"] == F.col("old_label")
        ).select("id", F.col("new_label").alias("cluster_id"))
        new_rows = (
            new_ids.join(maybe_bcast(lmap), "id", "left")
            .select("id", F.coalesce("lab", F.col("id")).alias("lab0"))
            .join(maybe_bcast(changed), F.col("lab0") == F.col("old_label"), "left")
            .select("id", F.coalesce("new_label", F.col("lab0")).alias("cluster_id"))
        )
        delta = upd_existing.unionByName(new_rows)
    else:
        # first batch: everything is new — CC over the batch edges, docs
        # without an edge become their own singleton cluster
        assignments = connected_components(new_edges)
        delta = new_ids.join(assignments, "id", "left").select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        )
    cat.append(
        delta.select(F.col("id").alias(ID), "cluster_id")
        .withColumn("batch_id", F.lit(batch_id)),
        "clusters_delta",
    )
    # auto-compaction policy (VERDICT r4 item 5): an unattended stream must
    # not let the delta grow without bound (every read pays the delta
    # window + base anti-join).  Fold delta into base when delta rows exceed
    # a fraction of the base (footer counts, driver-side, no jobs); the
    # trigger and sizes go to lineage so compaction is never silent.
    delta_rows = cat.row_count("clusters_delta")
    base_rows = cat.row_count("clusters") if cat.exists("clusters") else 0
    if delta_rows >= compact_min_rows and delta_rows >= compact_frac * base_rows:
        compact_clusters(cat, id_col=ID)
        cat.log_event(
            "clusters_compaction",
            cfg.config_hash(),
            extra={
                "batch_id": int(batch_id),
                "delta_rows": int(delta_rows),
                "base_rows_before": int(base_rows),
            },
        )
    cat.append(
        spark.createDataFrame([(int(batch_id),)], "batch_id long"), "_batches"
    )


def read_clusters(cat, id_col: str = "url") -> DataFrame:
    """Current cluster assignment = MERGE-ON-READ over base + delta, with
    precedence resolved DELTA-SIDE ONLY (VERDICT r4 item 3): the latest
    (max batch_id) row per id within ``clusters_delta`` wins via a
    delta-sized window, then the corpus-sized base contributes only ids the
    delta doesn't carry (left_anti against the delta id set, broadcast when
    small).  The base is SCANNED but never shuffled — per-micro-batch read
    cost is O(delta), not an O(corpus) window shuffle.  The ParquetCatalog
    model of an Iceberg MOR table."""
    from pyspark.sql import Window

    has_base = cat.exists("clusters")
    has_delta = cat.exists("clusters_delta")
    if not has_base and not has_delta:
        raise ValueError("catalog has no clusters/clusters_delta table")
    base = cat.read("clusters").select(id_col, "cluster_id") if has_base else None
    if not has_delta:
        return base

    w = Window.partitionBy(id_col).orderBy(
        F.col("batch_id").desc(), F.col("cluster_id").asc()
    )
    delta_latest = (
        cat.read("clusters_delta")
        .select(id_col, "cluster_id", "batch_id")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "cluster_id")
    )
    if base is None:
        return delta_latest
    delta_ids = delta_latest.select(id_col)
    # footer-count byte guard (driver-side, no job): broadcast the delta id
    # set so the base anti-join stays a map-side scan; a compaction-overdue
    # delta falls back to a shuffle anti-join instead of OOMing the broadcast
    if cat.row_count("clusters_delta") * 64 < 256 * 1024 * 1024:
        delta_ids = F.broadcast(delta_ids)
    return base.join(delta_ids, id_col, "left_anti").unionByName(delta_latest)


def compact_clusters(cat, id_col: str = "url") -> None:
    """Fold ``clusters_delta`` into the base ``clusters`` table: ONE
    corpus-sized write, run as an explicit maintenance job when the delta
    has grown (the Iceberg analog: snapshot compaction after MERGE
    commits).  ``write`` materializes to a tmp dir before swapping, so
    reading the old base while writing the new one is safe."""
    if not cat.exists("clusters_delta"):
        return
    cat.write(read_clusters(cat, id_col=id_col), "clusters")
    cat.drop("clusters_delta")


def stream_neardup(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    trigger_available_now: bool = True,
    compact_frac: float = 0.5,
    compact_min_rows: int = 50_000,
):
    """Incremental streaming near-dup: the full LSH -> verify -> CC loop as
    a ``foreachBatch`` stream over the checkpoint catalog (SURVEY §2.7's
    idiomatic extension; VERDICT r2 item 5).  New page files landing in
    ``input_dir`` are signed, banded against everything already ingested,
    verified, and merged into the ``clusters`` table in ``warehouse``.
    Returns the started StreamingQuery.
    """
    from image_deduplication_3m_images_spark.sources.checkpoint import make_catalog

    cfg = cfg or DedupConfig()
    cat = make_catalog(spark, warehouse)
    pages_schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(pages_schema).parquet(input_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_neardup_batch(
            spark, batch_df, batch_id, cat, cfg,
            compact_frac=compact_frac, compact_min_rows=compact_min_rows,
        )

    writer = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark.

    Works on both a static DataFrame and a stream (same plan); on a stream
    the watermark bounds state and drops events later than ``watermark``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
