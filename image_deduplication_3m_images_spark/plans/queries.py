"""Driver-facing query catalog: each function takes (spark, sf_dir) and
returns a DataFrame over the driver's parquet testdata, with column names
matching the DuckDB oracle SQL in ``oracles.py`` exactly.

These are the SURVEY.md §2 operators exercised one by one on the
``documents`` / ``embeddings`` tables (doc ids instead of urls; the pipeline
itself is id-type agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.config import DedupConfig
from image_deduplication_3m_images_spark.functions.signatures import with_signatures
from image_deduplication_3m_images_spark.functions.text import (
    fp64_expr,
    lang_scores_expr,
    langid_expr,
    n_tokens_bpe_expr,
    n_tokens_ws_expr,
    sha256_expr,
    with_quality,
)
from image_deduplication_3m_images_spark.operators.best import (
    group_avg_similarity,
    group_stats,
    pick_best,
)
from image_deduplication_3m_images_spark.operators.cluster import (
    attach_singletons,
    connected_components,
)
from image_deduplication_3m_images_spark.operators.dedup import (
    boilerplate_ngrams,
    exact_duplicates,
    ngram_jaccard_pairs,
    repetition_stats,
    simhash_block_pairs,
)
from image_deduplication_3m_images_spark.operators.lsh import (
    candidate_pairs,
    explode_bands,
    hot_bucket_stats,
)
from image_deduplication_3m_images_spark.operators.similarity import (
    brute_force_topk,
    signlsh_neardup_pairs,
    signlsh_topk,
)
from image_deduplication_3m_images_spark.operators.verify import verify_pairs

CFG = DedupConfig()


# Corpus tables: every consumer runs per-row kernels over them (Arrow
# signature/bucket UDFs, tokenization + n-gram expression chains, regex
# scans, mapInPandas fingerprints) — the tables where a single-task scan
# serializes real compute, so they spread at ~256 rows/task.  The
# relational tables (lineitem, orders, events, ...) feed pure columnar
# aggregates/joins whose first shuffle repartitions anyway; pre-spreading
# them at sf0.1 was measured pure overhead (event_windows 0.38 s ->
# 1.3 s).  They are NOT exempt forever, though: a single-row-group file
# above ~2M rows serializes even cheap columnar aggregation for seconds,
# so past that threshold they spread too (~1M rows/task — JVM agg
# throughput is ~100-1000x a Python kernel's, hence the coarser target).
_SPREAD_TABLES = {"documents", "embeddings"}
_RELATIONAL_SPREAD_ROWS = 2_000_000


def load(
    spark: SparkSession, sf_dir: str, table: str, spread: bool | None = None
) -> DataFrame:
    """Read a testdata table, spreading degenerate file layouts.

    The driver's testdata ships each table as ONE parquet file with ONE row
    group, so the scan plans a single task no matter how small
    ``spark.sql.files.maxPartitionBytes`` is (row groups are the split
    granularity) — and every per-row kernel downstream (Arrow signature
    UDFs, n-gram explodes, array_intersect) runs on 1 of N cores.  This is
    the guide's input-skew case (§2.5: "one huge unsplittable file ...
    repartition immediately after the read").  The repartition is
    SCALE-ADAPTIVE, not a local[32] constant: it fires only for corpus
    tables (see ``_SPREAD_TABLES``) whose scan plans fewer partitions than
    the cluster's parallelism — i.e. the input is smaller than parallelism
    x maxPartitionBytes, so the exchange moves at most ~1 GB — and a
    production-size input that already yields thousands of scan tasks
    passes through untouched.  The target partition count derives from the
    row count (~256 rows/task floor 8, capped at the parallelism): enough
    tasks that heavy kernels use the cluster, few enough that per-task
    overhead doesn't dominate tiny inputs (32 was measured slower than
    8-16 at sf0.1 for exactly that reason).  Decision memoized per
    (session, table) — immutable testdata, one planning probe per table.
    ``SPARK_GRAFT_SPREAD`` forces a specific partition count (experiments).
    ``spread`` overrides the kernel-table classification for a call site
    (True = treat as kernel table, False = relational thresholds).
    """
    import os

    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    kernel_table = table in _SPREAD_TABLES if spread is None else spread
    par = spark.sparkContext.defaultParallelism
    forced = int(os.environ.get("SPARK_GRAFT_SPREAD", "0"))

    def _probe() -> int:
        """Target partition count, 0 = leave the scan alone."""
        if df.rdd.getNumPartitions() >= par:
            return 0  # real input: scan already parallel, pay nothing
        if forced and kernel_table:
            return forced
        # footer row counts are a driver-side metadata read — no Spark job
        try:
            rows = _table_rows(spark, sf_dir, table)
        except Exception:
            return par if kernel_table else 0
        if kernel_table:
            if rows < 50 * par:
                return 0  # not worth an exchange below ~50 rows/core
            return min(par, max(8, rows // 256))
        # relational table: only a multi-million-row single-task scan is
        # worth an exchange (cheap per-row work; see _RELATIONAL_SPREAD_ROWS)
        if rows <= _RELATIONAL_SPREAD_ROWS:
            return 0
        return min(par, max(8, rows // 1_000_000))

    target = _memo(spark, ("scan_parts", sf_dir, table, kernel_table), _probe)
    return df.repartition(target) if target else df


def _docs_full(spark, sf_dir) -> DataFrame:
    """Documents frame, memoized + cached per (session, sf_dir): ~30
    catalog queries scan the corpus table, and each previously paid its own
    parquet scan + spread exchange — two sequential AQE stage-jobs of pure
    fixed driver/scheduler cost per query at bench scale.  Same rationale
    and lifetime as ``_emb`` (the cache dies with the session; a fresh
    bench invocation recomputes from parquet).  The cache holds the spread
    partitioning, so consumers read an already-parallel InMemoryTableScan
    with no exchange, and the columnar cache batches still serve column
    pruning and filter evaluation per consumer.  DataFrame.cache() is
    MEMORY_AND_DISK: a corpus bigger than memory spills instead of
    failing, and a 100 TB deployment reads its checkpointed/bucketed
    warehouse tables instead of re-scanning raw input per query — this
    memo is the session-local stand-in for exactly that."""
    return _memo(
        spark, ("docs", sf_dir), lambda: load(spark, sf_dir, "documents").cache()
    )


def _docs(spark, sf_dir) -> DataFrame:
    return _docs_full(spark, sf_dir).select("doc_id", "text")


def _table_rows(spark, sf_dir: str, table: str) -> int:
    """Committed row count from parquet FOOTERS, driver-side — no Spark
    job (same trick as the checkpoint catalog's ``row_count``).  Used as
    the size hint for statistics-driven plan choices (bloom sizing,
    contamination form picking); memoized per (session, table)."""

    def _count() -> int:
        import glob
        import os

        import pyarrow.parquet as pq

        path = f"{sf_dir}/{table}.parquet"
        files = (
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            if os.path.isdir(path)
            else [path]
        )
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    return _memo(spark, ("rows", sf_dir, table), _count)


def _emb(spark, sf_dir) -> DataFrame:
    """Embeddings frame, memoized + cached per (session, sf_dir): four
    catalog queries (both top-k forms, near-dup pairs, semantic clusters)
    scan it — several of them more than once per plan (self-join sides,
    vector join-backs) — and each scan would otherwise re-read + re-spread
    the parquet.  ~0.5 MB cached at sf0.1; same lifetime as ``_sig``."""
    return _memo(
        spark,
        ("emb", sf_dir),
        lambda: load(spark, sf_dir, "embeddings").cache(),
    )


def _sig(spark, sf_dir) -> DataFrame:
    """Signatures frame, memoized + cached per (session, sf_dir): several
    catalog queries consume it through MULTI-BRANCH plans (tier splits,
    joins of a frame with itself), and an unmaterialized UDF plan would
    re-run the Arrow signature kernel once PER BRANCH (measured 4x in
    simhash_pairs).  The pipeline's equivalent materialization is the
    checkpointed signatures table; here (immutable testdata, bounded size)
    a cached DataFrame plays that role.  The cache is session-bound via
    _memo, so it dies with the session (no cross-session leak).

    ``band_keys`` is precomputed INTO the cache (round 6): three consumers
    (lsh_bands, the candidate stage, its profile job) each re-derived the
    16 md5 band keys per row from the cached minhash; materializing the
    array once makes every explode_bands call a plain posexplode — the
    same once-not-per-consumer rationale as the pipeline's checkpointed
    band_keys column (identical formula, byte-equality test-pinned)."""
    from image_deduplication_3m_images_spark.operators.lsh import band_key_expr

    def build():
        sig = with_signatures(_docs(spark, sf_dir), CFG)
        keys = F.array(
            *[
                band_key_expr(F.col("minhash"), b, CFG.rows_per_band)
                for b in range(CFG.bands)
            ]
        )
        return sig.withColumn("band_keys", keys).cache()

    return _memo(spark, ("sig", sf_dir), build)


# Memoized per (live session, sf_dir): catalog queries share expensive
# stages over immutable testdata, but a cached DataFrame is bound to ITS
# SparkSession — after spark.stop()/restart in one process the old handles
# are dead.  Keyed by applicationId; on a new app the whole memo is dropped
# (the old session's cached blocks died with its executors, so there is
# nothing left to unpersist).
_MEMO: dict[tuple, object] = {}
_MEMO_APP: list[str] = []


def _memo(spark, key: tuple, build):
    app = spark.sparkContext.applicationId
    if _MEMO_APP != [app]:
        _MEMO.clear()
        _MEMO_APP[:] = [app]
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]


def _cands(spark, sf_dir, sig=None) -> DataFrame:
    """Candidate pairs with the stats-driven fast path: compute the bucket
    profile once (the pipeline logs it to lineage anyway) and pass it as
    max_bucket_hint so skew-free inputs skip the 3-tier plan entirely.
    Memoized + cached per (session, sf_dir) like ``_sig``: four catalog
    queries (candidate_pairs, verified_pairs, containment_pairs,
    ngram_jaccard) consume the same pair stage over immutable testdata, and
    without the memo each re-ran the band explode + bucket shuffle from
    scratch (the pipeline's equivalent materialization is the checkpointed
    candidate_pairs table)."""
    sig = sig if sig is not None else _sig(spark, sf_dir)

    def build():
        hint = hot_bucket_stats(sig, CFG, id_col="doc_id").collect()[0]["max_bucket"]
        return candidate_pairs(
            sig, CFG, id_col="doc_id", max_bucket_hint=hint
        ).cache()

    return _memo(spark, ("cands", sf_dir), build)


# --- S1/S8 scans + G6 agg ---------------------------------------------------

def q_lang_stats(spark, sf_dir):
    """Scan + aggregation (S1 analog); reads the session documents cache,
    and column pruning reaches the cache scan (plan-tested: the
    InMemoryTableScan outputs only the 3 needed columns; parquet-footer
    pruning itself is covered by test_partition_pruning_reaches_scan on a
    direct read) — no row filter in this query by design."""
    docs = _docs_full(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("lang")
    )


# --- M-operators: per-doc functions ------------------------------------------

def q_signature_digest(spark, sf_dir):
    sig = _sig(spark, sf_dir)
    return sig.select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.array_min("minhash").alias("sig_min"),
        F.aggregate(
            "minhash", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sig_sum"),
        F.element_at("minhash", 1).alias("sig_first"),
        F.element_at("minhash", CFG.num_perm).alias("sig_last"),
        F.col("simhash"),
    )


def q_token_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        n_tokens_ws_expr(F.col("text")).cast("int").alias("n_tokens_ws"),
        n_tokens_bpe_expr(F.col("text")).cast("int").alias("n_tokens_bpe"),
    )


def q_quality(spark, sf_dir):
    docs = with_quality(_docs(spark, sf_dir), "text")
    return docs.select("doc_id", F.round(F.col("quality"), 6).alias("quality"))


def q_langid(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    scores = lang_scores_expr(F.col("text"))
    return docs.select(
        "doc_id",
        langid_expr(F.col("text")).alias("lang_pred"),
        *[scores[lang].cast("int").alias(f"score_{lang}") for lang in ("en", "de", "fr", "es")],
    )


def q_fingerprint(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        sha256_expr(F.col("text")).alias("text_sha256"),
        fp64_expr(F.col("text")).alias("fp64"),
    )


# --- dedup operators ----------------------------------------------------------

def q_repetition_stats(spark, sf_dir):
    """Gopher repetition signals per document (dup-token / top-bigram fracs)."""
    return repetition_stats(_docs(spark, sf_dir), "doc_id")


def q_boilerplate_ngrams(spark, sf_dir):
    """C4-style cross-document boilerplate 5-grams (>= 3 distinct docs)."""
    return boilerplate_ngrams(_docs(spark, sf_dir), "doc_id", n=5, min_docs=3)


def q_exact_dedup(spark, sf_dir):
    """spread=False AND not via the shared documents cache: the per-row
    work here is ONE JVM sha256 (trivial next to an exchange) and the very
    next operator is the window shuffle on the hash, which redistributes
    anyway — pre-spreading the scan was measured pure overhead
    (+0.2-0.4 s), and reading the session cache instead was measured worse
    too (+0.5 s: this is the FIRST documents consumer in the bench, so it
    would pay the cache materialization that the later, kernel-heavy
    consumers amortize; the plain 1-task scan is cheaper than scan +
    exchange + cache write for a query whose first operator shuffles
    regardless).  The >2M-row relational guard still applies."""
    docs = load(spark, sf_dir, "documents", spread=False).select("doc_id", "text")
    return exact_duplicates(docs, "doc_id").select(
        "doc_id",
        "text_sha256",
        "cluster_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "is_best",
    )


def q_lsh_bands(spark, sf_dir):
    return explode_bands(_sig(spark, sf_dir), CFG, id_col="doc_id").select(
        "doc_id", F.col("band_id").cast("int").alias("band_id"), "band_key"
    )


def q_candidate_pairs(spark, sf_dir):
    return _cands(spark, sf_dir).select(
        "id_a", "id_b", F.col("n_bands").cast("long").alias("n_bands")
    )


def _verified(spark, sf_dir) -> DataFrame:
    """Memoized verified-pairs stage (cached DataFrame): shared by
    verified_pairs / dup_clusters / group_avg_sim over immutable testdata."""

    def build():
        sig = _sig(spark, sf_dir)
        pairs = _cands(spark, sf_dir, sig)
        return verify_pairs(
            pairs, sig, CFG, id_col="doc_id", texts_df=_docs(spark, sf_dir)
        ).cache()

    return _memo(spark, ("verified", sf_dir), build)


def q_verified_pairs(spark, sf_dir):
    out = _verified(spark, sf_dir)
    return out.select(
        "id_a",
        "id_b",
        F.col("sig_matches").cast("int").alias("sig_matches"),
        F.col("hamming").cast("int").alias("hamming"),
        "containment",
        "verified",
    )


def q_containment_pairs(spark, sf_dir):
    """Same verdicts via the Arrow mapInPandas containment kernel (J7 UDF
    path) — the oracle checks it against SQL ``contains``."""
    sig = _sig(spark, sf_dir)
    pairs = _cands(spark, sf_dir, sig).select("id_a", "id_b")
    out = verify_pairs(
        pairs.select("id_a", "id_b"),
        sig,
        CFG,
        id_col="doc_id",
        texts_df=_docs(spark, sf_dir),
        use_arrow_containment=True,
    )
    return out.select("id_a", "id_b", "containment")


def q_dup_clusters(spark, sf_dir):
    """Clusters are memoized per (session, sf_dir) (cached DataFrame):
    best_pick, group_stats and group_avg_sim all consume the same cluster
    stage, and the testdata is immutable — without the memo each of them
    re-runs signatures + candidates + verification + CC from scratch."""

    def build():
        verified = _verified(spark, sf_dir)
        edges = verified.where(F.col("verified")).select("id_a", "id_b")
        assignments = connected_components(edges)
        return attach_singletons(
            assignments, _docs(spark, sf_dir).select("doc_id"), "doc_id"
        ).select("doc_id", "cluster_id").cache()

    return _memo(spark, ("clusters", sf_dir), build)


def q_best_pick(spark, sf_dir):
    clusters = q_dup_clusters(spark, sf_dir)
    quality = q_quality(spark, sf_dir)
    return pick_best(clusters, quality, "doc_id").select(
        "doc_id",
        "cluster_id",
        "quality",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "is_best",
    )


def q_group_stats(spark, sf_dir):
    return group_stats(q_dup_clusters(spark, sf_dir).withColumnRenamed("doc_id", "url"))


def q_group_avg_sim(spark, sf_dir):
    """G5: per-cluster average pairwise MinHash similarity (sig_matches /
    num_perm — exact dyadic rationals, so the avg is float-order-stable)."""
    verified = _verified(spark, sf_dir)
    scored = verified.where(F.col("verified")).select(
        "id_a",
        "id_b",
        (F.col("sig_matches") / F.lit(float(CFG.num_perm))).alias("similarity"),
    )
    clusters = q_dup_clusters(spark, sf_dir)
    return group_avg_similarity(clusters, scored, id_col="doc_id")


def q_test_path_flags(spark, sf_dir):
    """M11: test-artifact path predicate over deterministically synthesized
    paths (documents has no path column; the planting rule is mirrored in
    the oracle SQL)."""
    from image_deduplication_3m_images_spark.functions.text import (
        is_test_path_expr,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "source")
    path = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("/tmp/doc_"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit("TEMP_"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string")
            )
        )
    )
    return docs.select(
        "doc_id",
        path.alias("path"),
        is_test_path_expr(path).alias("is_test"),
    )


def q_url_dedup(spark, sf_dir):
    """Canonical-URL dedup — the exact-dup pass every web corpus runs FIRST
    (before any content hashing): normalize raw URLs to a canonical identity
    and keep the best document per canonical URL (longest, then lowest id).

    documents has no url column, so raw URLs are synthesized with a
    deterministic planting rule (scheme / www-prefix / case / tracking-query
    / trailing-slash noise keyed off doc_id) mirrored verbatim in the oracle
    SQL — the operator under test is ``canonical_url_expr`` + the windowed
    keep-best, both pure codegen (no UDF, one exchange at 100 TB).
    """
    from image_deduplication_3m_images_spark.functions.text import (
        canonical_url_expr,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "n_chars")
    d = F.col("doc_id")
    raw = F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 6 == 0, F.lit("WWW.Example.COM"))
        .when(d % 6 == 3, F.lit("www.example.com"))
        .otherwise(F.lit("example.com")),
        F.lit("/articles/"),
        (d % 41).cast("string"),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("?utm_source=feed&ref="), d.cast("string")),
        )
        .when(d % 5 == 0, F.lit("/"))
        .otherwise(F.lit("")),
    )
    urls = docs.select(
        "doc_id",
        "n_chars",
        raw.alias("raw_url"),
        canonical_url_expr(raw).alias("canon_url"),
    )
    w = Window.partitionBy("canon_url").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return urls.select(
        "doc_id",
        "raw_url",
        "canon_url",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def q_pii_stats(spark, sf_dir):
    """PII detection + redaction — scrub-before-training hygiene.  Synthetic
    PII (emails / NANP phones / IPv4s) is planted deterministically (rule
    mirrored in the oracle), then counted with codegen ``regexp_count`` and
    redacted with ordered ``regexp_replace``; the redacted text is proven
    equal to the oracle's byte-for-byte via sha256, without shipping the
    corpus through the compare."""
    from image_deduplication_3m_images_spark.functions.text import (
        pii_counts_exprs,
        redact_pii_expr,
        sha256_expr,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            d % 11 == 0,
            F.concat(
                F.lit(" Contact: user"), d.cast("string"),
                F.lit("@Example.COM for details."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0,
            F.concat(
                F.lit(" Call +1-555-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" now."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 17 == 0,
            F.concat(F.lit(" Logged from 10.0."), (d % 256).cast("string"), F.lit(".7.")),
        ).otherwise(F.lit("")),
    )
    counts = pii_counts_exprs(planted)
    return docs.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        sha256_expr(redact_pii_expr(planted)).alias("redacted_sha256"),
    )


def q_doc_packing(spark, sf_dir):
    """Sequence packing ("concat and chop") — every doc's global token
    offset and pack id at a 512-token budget, computed with the two-phase
    distributed prefix sum in ``operators/packing.py`` (no single-partition
    window; the oracle uses the naive global cumsum, which is exactly what
    the distributed form must equal)."""
    from image_deduplication_3m_images_spark.operators.packing import (
        pack_documents,
    )

    # spread=False and NOT via the shared documents cache: one token-count
    # expression per row, then the packing operator's own bucket shuffle
    # redistributes — same rationale as q_exact_dedup, and the cached
    # 19-partition read was measured +0.3 s vs the 1-task scan here (the
    # prefix-sum phases pay per-input-partition task overhead)
    docs = load(spark, sf_dir, "documents", spread=False).select(
        "doc_id", n_tokens_ws_expr(F.col("text")).alias("n_tokens")
    )
    # small bucket size so the sf0.01 gate exercises MULTIPLE buckets (the
    # phase-2 offsets path), not just the single-bucket degenerate case
    return pack_documents(docs, budget=512, bucket_rows=100)


def q_stratified_sample(spark, sf_dir):
    """Language-rebalancing sample — per-language keep rates applied with a
    deterministic md5 hash bucket instead of ``rand()`` (partition-dependent,
    engine-specific), so the sample is reproducible, resumable, and
    oracle-checkable.  The standard corpus-rebalance pass before training:
    downsample the dominant language, keep more of the rare ones."""
    from image_deduplication_3m_images_spark.functions.text import (
        hash_bucket_expr,
    )

    rates = {"en": 100, "de": 500, "fr": 500, "es": 500, "zh": 250}
    docs = _docs_full(spark, sf_dir).select("doc_id", "lang")
    bucket = hash_bucket_expr(F.col("doc_id"))
    rate = F.lit(0)
    for lang, permille in rates.items():
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    return docs.select(
        "doc_id", "lang", bucket.cast("int").alias("sample_bucket")
    ).where(F.col("sample_bucket") < rate)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: docs with ``doc_id % 50 == 0`` play the
    held-out eval set (planting rule mirrored in the oracle); every OTHER
    doc is checked for 5-gram overlap with it.  The documents table plants
    exact/near duplicates, so contamination genuinely fires across the
    split.  Corpus text is never shuffled; the operator picks array-
    intersect vs broadcast-hash-join at a measured eval-size crossover —
    the 100 TB shape."""
    from image_deduplication_3m_images_spark.operators.decontaminate import (
        contamination_flags,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    eval_df = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    # driver-side form-picking estimate replaces the count job: ~64
    # distinct grams per ~300-char eval doc (generous); both forms are
    # exact, so an estimate can only affect speed (see contamination_flags)
    n_est = (_table_rows(spark, sf_dir, "documents") // 50) * 64
    return contamination_flags(corpus, eval_df, n=5, n_eval_grams=n_est)


def q_length_quantiles(spark, sf_dir):
    """Per-language corpus length profile: exact p50/p90/p99 of n_chars.
    ``percentile`` (exact, linear interpolation — same definition as the
    oracle's ``quantile_cont``) runs as a partial-merge aggregate: one
    shuffle of per-partition sketches, never a per-group sort of the corpus.
    The per-language length CDF is what sets a training pipeline's document
    truncation and packing thresholds."""
    docs = _docs_full(spark, sf_dir).select("lang", "n_chars")
    pct = F.expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(pct[0], 4).alias("p50_chars"),
            F.round(pct[1], 4).alias("p90_chars"),
            F.round(pct[2], 4).alias("p99_chars"),
        )
    )


def q_simhash_pairs(spark, sf_dir):
    """Stats-driven fast path like ``_cands``: one profile job (memoized —
    the pipeline logs the same statistic to lineage) proves the chunk
    buckets are skew-free, and the operator then plans ONE shuffle instead
    of the stats-join + three-branch tier union."""
    from image_deduplication_3m_images_spark.operators.dedup import (
        hamming_bucket_stats,
    )

    sig = _sig(spark, sf_dir)
    hint = _memo(
        spark,
        ("simhash_hint", sf_dir),
        lambda: hamming_bucket_stats(sig, "simhash", radius=CFG.hamming_max)
        .collect()[0]["max_bucket"],
    )
    return simhash_block_pairs(
        sig, CFG, id_col="doc_id", max_bucket_hint=hint
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_ngram_jaccard(spark, sf_dir):
    sig = _sig(spark, sf_dir)
    # prefilter opt-in: the LSH pair set at any tested SF is measured tiny
    # relative to the corpus (the pipeline's byte guard makes the same call)
    pairs = _cands(spark, sf_dir, sig).select("id_a", "id_b")
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), pairs, id_col="doc_id", prefilter_broadcast=True
    ).select(
        "id_a",
        "id_b",
        F.col("n_intersect").cast("int").alias("n_intersect"),
        F.col("n_union").cast("int").alias("n_union"),
        F.round("jaccard", 6).alias("jaccard"),
    )


# --- similarity search ---------------------------------------------------------

def q_embedding_topk(spark, sf_dir):
    # corpus side from the session cache; the QUERY side stays a direct
    # load so the vec_id filter pushes into its parquet scan (the 100 TB
    # shape, plan-tested) — the broadcast small side is where pushdown
    # pays, the corpus side streams from cache
    emb = _emb(spark, sf_dir)
    queries = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine"
    )


def q_embedding_topk_lsh(spark, sf_dir):
    """Approximate ANN: multi-table sign-LSH (8 tables x 5 bits, Hamming-1
    multiprobe) sized for ~0.98 recall at this fixture's neighbor similarity
    (cosine ~0.32; near-dup workloads retune to fewer, wider tables).  Fully
    oracle-checked: the bucket id is a dot product against LITERAL
    hyperplanes, so the DuckDB oracle evaluates the identical expression
    (oracles.py emits the same float literals)."""
    emb = _emb(spark, sf_dir)
    queries = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    return signlsh_topk(
        emb,
        queries,
        k=5,
        n_planes=5,
        n_tables=8,
        multiprobe=True,
    ).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine"
    )


def _neardup(spark, sf_dir) -> DataFrame:
    """Sign-LSH near-dup pair frame, memoized + cached per (session,
    sf_dir) — ``embedding_neardup`` returns it and ``semantic_clusters``
    contracts the same pair set into components (VERDICT r5 "what's wrong"
    #4: the two queries re-ran the 8-table self-join + cosine kernel each).
    Same rationale and lifetime as ``_sig``."""
    return _memo(
        spark,
        ("neardup", sf_dir),
        lambda: signlsh_neardup_pairs(
            _emb(spark, sf_dir),
            threshold=0.4,
            n_planes=4,
            n_tables=8,
            cache_buckets=True,
        ).cache(),
    )


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs over the whole corpus: multi-table
    sign-LSH self-join (8 tables x 4 bits), exact cosine filter at the
    fixture-calibrated threshold 0.4 (the synthetic embeddings' top pair
    similarity is ~0.51; a production near-dup corpus retunes the threshold
    up and the bits/tables with it).  Oracle evaluates the identical
    literal-hyperplane buckets, so the match is exact."""
    return _neardup(spark, sf_dir)


def q_quality_funnel(spark, sf_dir):
    """Filter-funnel observability: a C4/Gopher-style rule chain evaluated
    in ONE corpus scan + ONE partial-merge aggregate, reporting per rule the
    docs failing it alone and the docs surviving the chain so far — the
    attrition report every training-data pipeline publishes next to its
    filters.  Ratio comparisons are 6-dp-rounded on BOTH engines so the
    booleans cannot flip on float ulps.  The per-rule rows are reshaped
    from the single agg row with ``stack`` — no collect, no second scan."""
    from image_deduplication_3m_images_spark.functions.text import (
        quality_expr,
        tokens_expr,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    toks = tokens_expr(F.col("text"))
    n_tok = F.size(toks)
    mean_len = F.round(
        F.when(
            n_tok > 0,
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / n_tok,
        ).otherwise(F.lit(0.0)),
        6,
    )
    alpha_ratio = F.round(
        F.when(
            F.length("text") > 0,
            F.length(F.regexp_replace(F.col("text"), "[^a-z0-9]", "")).cast(
                "double"
            )
            / F.length("text"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    diversity = F.round(
        F.when(
            n_tok > 0,
            F.size(F.array_distinct(toks)).cast("double") / n_tok,
        ).otherwise(F.lit(0.0)),
        6,
    )
    rules = [
        ("min_tokens", n_tok >= 10),
        ("mean_word_len", (mean_len >= 2.0) & (mean_len <= 12.0)),
        ("alpha_ratio", alpha_ratio >= 0.5),
        ("lexical_diversity", diversity >= 0.3),
        ("quality_score", F.round(quality_expr(F.col("text")), 6) >= 40.0),
    ]
    aggs = []
    cum = F.lit(True)
    for i, (_, pred) in enumerate(rules):
        aggs.append(F.sum((~pred).cast("long")).alias(f"f{i}"))
        cum = cum & pred
        aggs.append(F.sum(cum.cast("long")).alias(f"c{i}"))
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', f{i}, c{i}" for i, (name, _) in enumerate(rules)
    )
    return one.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_fail, n_pass_cum)"
        )
    )


def q_semantic_clusters(spark, sf_dir):
    """Semantic dedup end-to-end: embedding near-dup pairs (the
    ``embedding_neardup`` stage) contracted into clusters with the SAME
    connected-components operator the text pipeline uses — cluster id =
    min vec_id, singletons kept (SemDeDup-style grouping; one operator,
    two modalities).  The oracle re-derives the pairs from literal
    hyperplanes and closes them with a recursive CTE."""
    emb = _emb(spark, sf_dir)
    pairs = _neardup(spark, sf_dir)
    assignments = connected_components(pairs.select("id_a", "id_b"))
    return attach_singletons(
        assignments, emb.select("vec_id"), "vec_id"
    ).select("vec_id", "cluster_id")


def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (batch form): per user, events closer than
    30 minutes belong to one session.  One window pass (lag + running sum
    over the same partitioning — a single shuffle on user_id) + one groupBy
    that reuses the partitioning.  Money-safe: value summed in cents.
    The streaming twin is streaming.incremental.sessionize_stream
    (applyInPandasWithState); this batch form is its DuckDB-checkable
    semantics contract."""
    gap_us = 30 * 60 * 1_000_000
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC so the cast is the
    # identity, and the gap difference is TZ-invariant regardless
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    new_s = (
        F.lag(mic).over(w).isNull() | ((mic - F.lag(mic).over(w)) > gap_us)
    ).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = events.withColumn("s", F.sum(new_s).over(run))
    return sessions.groupBy("user_id", F.col("s").cast("int").alias("session_idx")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
    )


def q_brand_revenue(spark, sf_dir):
    """TPC-H Q9-style mixed-join shape: big-table join (lineitem x filtered
    part) + broadcast dims (supplier->nation->region), grouped rollup.  The
    p_size filter is pushed to the part scan.  The part side carries NO
    explicit broadcast hint: *relative* smallness vs lineitem does not bound
    *absolute* bytes (at sf10k the filtered part is tens of GB), so the
    join strategy is left to Catalyst/AQE's byte-based size guard — at
    small SF the parquet stats make it a broadcast join for free, at large
    SF it degrades safely to a shuffle join.  Same for the supplier-sized
    snr chain (supplier is SF x 10k rows — multi-GB at sf10k); only
    nation/region (25/5 rows, bounded by geography) keep explicit hints.
    Money is summed in integer cents so the oracle comparison has no
    float-order drift."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") < 15)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    snr = (
        supp.join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == region["r_regionkey"],
        )
        .select("s_suppkey", "n_name", "r_name")
    )
    joined = li.join(
        part.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).join(snr, li["l_suppkey"] == F.col("s_suppkey"))
    return joined.groupBy("r_name", "n_name", "p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("long")
        ).alias("revenue_cents"),
        F.sum("l_quantity").alias("sum_qty"),
    )


def q_no_f_customers(spark, sf_dir):
    """F5 set op as a physical anti-join: customers with no FINALIZED
    ('F') order.  The status filter is pushed into the orders scan; the
    anti-join shuffles only (key) columns — at scale the orders side is
    projected to its join key before the exchange (column pruning)."""
    cust = load(spark, sf_dir, "customer")
    f_orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return cust.join(
        f_orders, cust["c_custkey"] == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


# --- multimodal (binary media columns, mapInPandas kernels) ------------------

def _media(spark, sf_dir) -> DataFrame:
    from image_deduplication_3m_images_spark.functions.multimodal import (
        media_from_documents,
    )

    return media_from_documents(_docs(spark, sf_dir))


def q_image_features(spark, sf_dir):
    """Image decode + feature extraction over binary payloads (mapInPandas,
    Arrow-batched).  The decode is the documented deterministic md5 fake in
    this codec-less container, which is exactly what makes it DuckDB-
    oracle-checkable: every output is a pure function of md5(payload)."""
    from image_deduplication_3m_images_spark.functions.multimodal import (
        image_features,
    )

    # same session memo key as q_media_dedup: a bench session running both
    # queries decodes the immutable media frame ONCE, not once per query
    feats = _memo(
        spark,
        ("media_feats", sf_dir),
        lambda: image_features(_media(spark, sf_dir)).cache(),
    )
    return feats.select("media_id", "width", "height", "n_bytes", "phash64")


def q_media_dedup(spark, sf_dir):
    """Perceptual-hash near-dup candidates at Hamming radius 3 via the same
    pigeonhole chunk blocking as simhash_pairs (never all-pairs).  The
    features frame is memoized+cached: the tier-split plan consumes it
    through multiple branches, and an unmaterialized mapInPandas plan would
    re-run the decode kernel once per branch (same rationale as _sig)."""
    from image_deduplication_3m_images_spark.functions.multimodal import (
        image_features,
        media_dedup_candidates,
    )

    from image_deduplication_3m_images_spark.operators.dedup import (
        hamming_bucket_stats,
    )

    feats = _memo(
        spark,
        ("media_feats", sf_dir),
        lambda: image_features(_media(spark, sf_dir)).cache(),
    )
    # stats-driven fast path, same shape as q_simhash_pairs
    hint = _memo(
        spark,
        ("media_hint", sf_dir),
        lambda: hamming_bucket_stats(feats, "phash64", radius=3)
        .collect()[0]["max_bucket"],
    )
    return media_dedup_candidates(feats, radius=3, max_bucket_hint=hint).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_frame_samples(spark, sf_dir):
    """Video frame sampling plumbing (stub frame count = payload KiB); the
    sampled index list is emitted as CSV so the oracle compare is string-
    stable across list representations."""
    from image_deduplication_3m_images_spark.functions.multimodal import (
        sample_frames,
    )

    frames = sample_frames(_media(spark, sf_dir), every_k=10, max_frames=32)
    return frames.select(
        "media_id",
        "n_frames",
        F.size("sampled_frames").alias("n_sampled"),
        F.concat_ws(",", F.col("sampled_frames").cast("array<string>")).alias(
            "sampled_csv"
        ),
    )


# --- event-time windowed aggregation (streaming-shaped, batch-verified) ------

def q_event_windows(spark, sf_dir):
    """Tumbling 10-minute event windows (same plan Structured Streaming runs;
    see streaming/incremental.py).  total_cents keeps the money sum integer-
    exact so the oracle comparison has no float-order drift."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("total_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("total_cents").cast("long").alias("total_cents"),
        )
    )


# --- general relational: aggregation + broadcast multi-join -------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregation; money sums carried as integer cents so
    double summation order cannot drift vs the oracle."""
    li = load(spark, sf_dir, "lineitem")
    cents = lambda c: F.sum(F.round(F.col(c) * 100, 0).cast("long")).cast("long")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            cents("l_quantity").alias("sum_qty_cents"),
            cents("l_extendedprice").alias("sum_price_cents"),
            cents("l_discount").alias("sum_disc_cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_nations(spark, sf_dir):
    """Revenue per nation: fact table joins two small dims — both explicitly
    broadcast (the plan a 100 TB fact scan needs)."""
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name").asc())
        .limit(10)
    )


def q_incremental_new_docs(spark, sf_dir):
    """Cross-snapshot incremental dedup through the Bloom router
    (``operators/bloom.py``): SEEN = content fingerprints already in the
    corpus (docs with ``doc_id % 7 != 0`` model the prior snapshot), NEW =
    today's crawl batch (``doc_id % 3 == 0``); emit the new docs whose
    content was never seen.  The Spark plan exercises the full operator —
    bloom build over seen, map-side probe of new, exact anti-join for the
    might-contain residue — while the oracle is the plain ANTI JOIN the
    bloom must be indistinguishable from (false positives may only add
    shuffle bytes, never change rows)."""
    from image_deduplication_3m_images_spark.operators.bloom import incremental_new

    docs = _docs_full(spark, sf_dir).select(
        "doc_id", sha256_expr(F.col("text")).alias("text_sha256")
    )
    seen = docs.where(F.col("doc_id") % 7 != 0).select("text_sha256")
    new = docs.where(F.col("doc_id") % 3 == 0)
    # footer row count as the bloom-sizing hint (an upper bound of the
    # seen side) — skips build_bloom's sizing count scan (the operator's
    # documented 100 TB contract: callers supply n_seen)
    n_seen = _table_rows(spark, sf_dir, "documents")
    return incremental_new(new, seen, "text_sha256", n_seen=n_seen).select(
        "doc_id", "text_sha256"
    )


def _synth_urls(docs):
    """Deterministic raw URLs over a pool of 12 registered domains (the
    mod-6 and mod-4 rules share parity, so 12 of the 24 combos occur) with
    subdomain / tld variety, keyed off doc_id (documents has no url column;
    the oracle derives the registered domain straight from the doc_id rule,
    so the Spark-side url build + regex extraction is independently
    checked)."""
    d = F.col("doc_id")
    raw = F.concat(
        F.lit("https://"),
        F.when(d % 5 == 0, F.lit("blog."))
        .when(d % 5 == 1, F.lit("www."))
        .otherwise(F.lit("")),
        F.lit("site"),
        (d % 6).cast("string"),
        F.when(d % 4 == 0, F.lit(".com"))
        .when(d % 4 == 1, F.lit(".org"))
        .when(d % 4 == 2, F.lit(".net"))
        .otherwise(F.lit(".io")),
        F.lit("/p/"),
        d.cast("string"),
    )
    return docs.withColumn("url", raw)


def q_domain_stats(spark, sf_dir):
    """Per-registered-domain corpus profile — the first report every web
    pipeline pulls before setting per-domain policies (caps, blocklists).
    ``url_domain_expr`` is pure codegen, so at 100 TB this is one map-side-
    combined hash aggregate over the scan; no UDF, no second shuffle."""
    from image_deduplication_3m_images_spark.functions.text import url_domain_expr

    docs = _synth_urls(
        _docs_full(spark, sf_dir).select("doc_id", "lang", "n_chars")
    )
    return docs.groupBy(url_domain_expr(F.col("url")).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def q_domain_capped(spark, sf_dir):
    """Per-domain document cap (RefinedWeb/C4-style anti-spam measure):
    keep at most K=5 docs per registered domain, preferring longer then
    lower-id docs.  One shuffle (the window partition by domain).

    Scale note: a single pathological domain makes one window partition
    huge; the production variant pre-prunes with a broadcast per-domain
    K-th-length threshold (percentile_approx) so the window only sorts
    survivors — semantics here stay exact for the oracle."""
    from image_deduplication_3m_images_spark.functions.text import url_domain_expr

    docs = _synth_urls(_docs_full(spark, sf_dir).select("doc_id", "n_chars"))
    d = docs.select(
        "doc_id", "n_chars", url_domain_expr(F.col("url")).alias("domain")
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return d.select(
        "doc_id",
        "domain",
        F.row_number().over(w).alias("domain_rank"),
        (F.row_number().over(w) <= 5).alias("is_kept"),
    )


def q_domain_topk(spark, sf_dir):
    """The production form of the per-domain cap: EXACT top-5 docs per
    registered domain via the two-level salted tournament
    (``operators/topk.py``) — per-task sort buffers stay bounded even when
    one spam domain owns billions of pages, unlike ``q_domain_capped``'s
    single corpus-wide window.  The oracle is the plain QUALIFY window the
    tournament must be indistinguishable from."""
    from image_deduplication_3m_images_spark.functions.text import url_domain_expr
    from image_deduplication_3m_images_spark.operators.topk import top_k_per_group

    docs = _synth_urls(_docs_full(spark, sf_dir).select("doc_id", "n_chars"))
    d = docs.select(
        "doc_id", "n_chars", url_domain_expr(F.col("url")).alias("domain")
    )
    return top_k_per_group(
        d,
        ["domain"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=5,
        rank_col="domain_rank",
    ).select("doc_id", "domain", F.col("domain_rank").cast("int").alias("domain_rank"))


def q_substring_pairs(spark, sf_dir):
    """Pairs of docs sharing a verbatim >=40-char substring — suffix-array-
    style training-data dedup (Lee et al. 2022) done Spark-first with
    winnowed rolling-hash fingerprints + exact verification
    (``operators/substring.py``).  The oracle is the brute-force all-grams
    self-join the winnowing theorem makes this equal to."""
    from image_deduplication_3m_images_spark.operators.substring import (
        shared_substring_pairs,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    return shared_substring_pairs(docs, min_len=40)


def q_dup_span_stats(spark, sf_dir):
    """Span-level duplication profile (Lee et al. 2022 "deduplicating
    training data" semantics): per doc, how many merged character spans are
    verbatim-shared (>=40 chars) with some LOWER-id doc, and how many
    characters they cover — the numbers a span-removal pass would delete.
    Exact: the oracle recomputes it from the brute-force all-grams join."""
    from image_deduplication_3m_images_spark.operators.substring import (
        duplicated_spans,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    spans = duplicated_spans(docs, min_len=40)
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("dup_chars"),
    )


def q_span_cleaned_digest(spark, sf_dir):
    """The deduplicated corpus itself: every doc with its duplicated spans
    cut out (``remove_duplicated_spans``), digested to sha256 + length so
    the oracle can verify the reconstruction byte-for-byte against its own
    string_agg-of-kept-segments rebuild."""
    from image_deduplication_3m_images_spark.operators.substring import (
        remove_duplicated_spans,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    cleaned = remove_duplicated_spans(docs, min_len=40)
    return cleaned.select(
        "doc_id",
        F.sha2(F.col("clean_text"), 256).alias("clean_sha256"),
        F.length("clean_text").cast("long").alias("n_chars_clean"),
    )


def q_substring_clusters(spark, sf_dir):
    """Operator composition: connected components over the EXACT shared-
    substring pair set — "docs connected by verbatim >=40-char overlap" is
    the grouping a plagiarism/mirror-detection pass wants, and it exercises
    the same O(log d) CC engine the flagship pipeline uses on a second,
    independently-oracled edge set (recursive-CTE transitive closure)."""
    from image_deduplication_3m_images_spark.operators.cluster import (
        connected_components,
    )
    from image_deduplication_3m_images_spark.operators.substring import (
        shared_substring_pairs,
    )

    from image_deduplication_3m_images_spark.operators.cluster import (
        attach_singletons,
    )

    docs = _docs_full(spark, sf_dir).select("doc_id", "text")
    pairs = shared_substring_pairs(docs, min_len=40)
    return attach_singletons(
        connected_components(pairs), docs.select("doc_id"), "doc_id"
    )


ALL_QUERIES = {
    "event_windows": q_event_windows,
    "pricing_summary": q_pricing_summary,
    "top_nations": q_top_nations,
    "lang_stats": q_lang_stats,
    "signature_digest": q_signature_digest,
    "token_stats": q_token_stats,
    "quality": q_quality,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "exact_dedup": q_exact_dedup,
    "repetition_stats": q_repetition_stats,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "lsh_bands": q_lsh_bands,
    "candidate_pairs": q_candidate_pairs,
    "verified_pairs": q_verified_pairs,
    "containment_pairs": q_containment_pairs,
    "dup_clusters": q_dup_clusters,
    "best_pick": q_best_pick,
    "group_stats": q_group_stats,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "embedding_neardup": q_embedding_neardup,
    "image_features": q_image_features,
    "media_dedup": q_media_dedup,
    "frame_samples": q_frame_samples,
    "group_avg_sim": q_group_avg_sim,
    "brand_revenue": q_brand_revenue,
    "no_f_customers": q_no_f_customers,
    "user_sessions": q_user_sessions,
    "test_path_flags": q_test_path_flags,
    "url_dedup": q_url_dedup,
    "pii_stats": q_pii_stats,
    "length_quantiles": q_length_quantiles,
    "doc_packing": q_doc_packing,
    "stratified_sample": q_stratified_sample,
    "contamination": q_contamination,
    "semantic_clusters": q_semantic_clusters,
    "quality_funnel": q_quality_funnel,
    "incremental_new_docs": q_incremental_new_docs,
    "domain_stats": q_domain_stats,
    "domain_capped": q_domain_capped,
    "domain_topk": q_domain_topk,
    "substring_pairs": q_substring_pairs,
    "dup_span_stats": q_dup_span_stats,
    "span_cleaned_digest": q_span_cleaned_digest,
    "substring_clusters": q_substring_clusters,
}
