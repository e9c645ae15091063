"""URL-bloom routing of the streaming re-crawl guard
(`streaming/incremental.py:_update_url_bloom` + the guard in
`ingest_neardup_batch`): must be invisible in results, must skip the
per-batch corpus id scan when the batch has no might-seen rows, and must
rebuild itself when inserts cross capacity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.config import DedupConfig
from image_deduplication_3m_images_spark.sources.checkpoint import ParquetCatalog
from image_deduplication_3m_images_spark.sources.pages_fixture import (
    generate_pages,
    pages_dataframe,
)
from image_deduplication_3m_images_spark.streaming.incremental import (
    _load_url_bloom,
    ingest_neardup_batch,
    read_clusters,
)


class _CountingCatalog:
    """Catalog proxy that counts read() calls per table — lets a test pin
    how many times a batch touches the corpus-sized signatures table."""

    def __init__(self, inner):
        self._inner = inner
        self.reads: dict[str, int] = {}

    def read(self, table):
        self.reads[table] = self.reads.get(table, 0) + 1
        return self._inner.read(table)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _split_batches(pages, n_batches=3):
    b = F.abs(F.xxhash64("url")) % n_batches
    return [pages.where(b == i) for i in range(n_batches)]


def _clusters(spark, cat):
    return sorted((r["url"], r["cluster_id"]) for r in read_clusters(cat).collect())


def test_bloom_guard_equivalent_to_plain_guard(spark, tmp_path):
    """With re-crawled urls (same url re-delivered in later batches, html
    mutated so a wrong re-sign WOULD change results), bloom-on and bloom-off
    warehouses must end in identical clusters and one signature row per url
    — the router may only move rows between the skip path and the exact
    anti-join, never change the outcome."""
    fx = generate_pages(n_rows=120, seed=31)
    pages = pages_dataframe(spark, fx)
    batches = _split_batches(pages)
    # re-deliver batch 0's urls inside batch 2 with DIFFERENT html/text: the
    # first-write-wins guard must drop them on both paths
    recrawl = batches[0].withColumn(
        "text", F.concat(F.lit("recrawled different content "), F.col("text"))
    )
    batches[2] = batches[2].unionByName(recrawl)

    cfg = DedupConfig()
    cat_on = ParquetCatalog(spark, str(tmp_path / "wh_on"))
    cat_off = ParquetCatalog(spark, str(tmp_path / "wh_off"))
    for i, b in enumerate(batches):
        ingest_neardup_batch(spark, b, i, cat_on, cfg, url_bloom=True)
        ingest_neardup_batch(spark, b, i, cat_off, cfg, url_bloom=False)

    assert _clusters(spark, cat_on) == _clusters(spark, cat_off)
    n_urls = pages.select("url").distinct().count()
    sigs = cat_on.read("signatures")
    assert sigs.select("url").distinct().count() == n_urls
    assert sigs.count() == n_urls  # the guard dropped every re-crawl pre-sign
    # and the artifact exists + covers every ingested url (superset invariant)
    state = _load_url_bloom(cat_on)
    assert state is not None and state["n_inserted"] >= n_urls


def test_bloom_skips_corpus_scan_when_batch_is_all_new(spark, tmp_path):
    """A later batch with zero re-crawls must not read the signatures table
    for the guard when the bloom routes it away — reads of the corpus table
    drop by exactly one vs the bloom-off path."""
    fx = generate_pages(n_rows=100, seed=33)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()

    def run(url_bloom):
        cat = _CountingCatalog(
            ParquetCatalog(spark, str(tmp_path / f"wh_{url_bloom}"))
        )
        ingest_neardup_batch(spark, b0, 0, cat, cfg, url_bloom=url_bloom)
        cat.reads.clear()
        ingest_neardup_batch(spark, b1, 1, cat, cfg, url_bloom=url_bloom)
        return cat.reads.get("signatures", 0)

    with_bloom, without = run(True), run(False)
    assert with_bloom == without - 1, (with_bloom, without)


def test_bloom_rebuilds_when_capacity_crossed(spark, tmp_path):
    """Crossing the sized capacity must trigger a rebuild at a larger
    power-of-two capacity (logged to lineage), and results stay equal to the
    bloom-off run."""
    fx = generate_pages(n_rows=90, seed=35)
    pages = pages_dataframe(spark, fx)
    batches = _split_batches(pages)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cat_off = ParquetCatalog(spark, str(tmp_path / "wh_off"))
    for i, b in enumerate(batches):
        # expected=8 forces capacity crossings on a ~30-row batch
        ingest_neardup_batch(
            spark, b, i, cat, cfg, url_bloom=True, url_bloom_expected=8
        )
        ingest_neardup_batch(spark, b, i, cat_off, cfg, url_bloom=False)

    state = _load_url_bloom(cat)
    n_urls = pages.select("url").distinct().count()
    assert state["n_capacity"] >= n_urls
    assert state["n_inserted"] == n_urls
    events = cat.read("_lineage").where(F.col("stage") == "url_bloom_rebuilt")
    assert events.count() >= 1
    assert _clusters(spark, cat) == _clusters(spark, cat_off)


def test_bloom_crash_between_bloom_commit_and_append_loses_nothing(spark, tmp_path):
    """The ordering claim in _update_url_bloom's docstring: if the process
    dies AFTER the bloom commit but BEFORE any table append, the replayed
    batch's rows are bloom HITS routed to the exact anti-join — which
    passes them (they are not in signatures) — so nothing is silently
    dropped and the final state equals the crash-free run."""
    from image_deduplication_3m_images_spark.streaming.incremental import (
        _update_url_bloom,
    )

    fx = generate_pages(n_rows=100, seed=39)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    ingest_neardup_batch(spark, b0, 0, cat, cfg)
    # simulate the crash window: bloom absorbs batch 1's urls, then "die"
    # before any append / batch marker
    state = _load_url_bloom(cat)
    ids = b1.select("url")
    _update_url_bloom(
        spark, cat, ids, ids.count(), state, True, cfg, 1_000_000, 0.01, 256 << 20
    )
    n_sig_before = cat.read("signatures").count()
    # replay: every batch-1 url now probes maybe-seen, yet must be ingested
    ingest_neardup_batch(spark, b1, 1, cat, cfg)
    assert cat.read("signatures").count() == n_sig_before + b1.count()
    # and the end state equals a crash-free bloom-off run
    cat_ref = ParquetCatalog(spark, str(tmp_path / "wh_ref"))
    ingest_neardup_batch(spark, b0, 0, cat_ref, cfg, url_bloom=False)
    ingest_neardup_batch(spark, b1, 1, cat_ref, cfg, url_bloom=False)
    assert _clusters(spark, cat) == _clusters(spark, cat_ref)


def test_bloom_self_heals_on_pre_bloom_warehouse(spark, tmp_path):
    """A warehouse created with url_bloom=False (or by older code) gains a
    bloom on the first bloom-enabled batch, seeded from the committed corpus
    — a later re-crawl of PRE-bloom urls must still be filtered."""
    fx = generate_pages(n_rows=80, seed=37)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    ingest_neardup_batch(spark, b0, 0, cat, cfg, url_bloom=False)
    assert _load_url_bloom(cat) is None
    ingest_neardup_batch(spark, b1, 1, cat, cfg, url_bloom=True)
    state = _load_url_bloom(cat)
    assert state is not None
    assert state["n_inserted"] == pages.select("url").distinct().count()
    # batch 2 re-delivers PRE-bloom urls (batch 0's): all must be dropped
    ingest_neardup_batch(spark, b0, 2, cat, cfg, url_bloom=True)
    sigs = cat.read("signatures")
    assert sigs.count() == sigs.select("url").distinct().count()
    assert sigs.where(F.col("batch_id") == 2).count() == 0


def test_bloom_disabled_sentinel_decided_once(spark, tmp_path):
    """A first creation over max_bytes must persist a disabled sentinel:
    the decision is logged to lineage exactly ONCE, later batches neither
    re-size nor re-log, and results stay equal to the bloom-off run."""
    fx = generate_pages(n_rows=60, seed=41)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cat_off = ParquetCatalog(spark, str(tmp_path / "wh_off"))
    for i, b in enumerate((b0, b1)):
        ingest_neardup_batch(
            spark, b, i, cat, cfg, url_bloom=True, url_bloom_max_bytes=1
        )
        ingest_neardup_batch(spark, b, i, cat_off, cfg, url_bloom=False)
    state = _load_url_bloom(cat)
    assert state is not None and state["m_bits"] == 0  # persisted sentinel
    events = cat.read("_lineage").where(F.col("stage") == "url_bloom_disabled")
    assert events.count() == 1  # decided once, not once per micro-batch
    assert _clusters(spark, cat) == _clusters(spark, cat_off)


def test_bloom_counter_stable_under_crash_replay(spark, tmp_path):
    """n_inserted counts a batch's bloom-MISSES, so a crash-replayed batch
    (urls already absorbed by the crashed attempt's bloom commit) adds
    exactly 0 — the counter can run ~fpp low, but never double-counts."""
    from image_deduplication_3m_images_spark.streaming.incremental import (
        _update_url_bloom,
    )

    fx = generate_pages(n_rows=100, seed=43)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    ingest_neardup_batch(spark, b0, 0, cat, cfg)
    # crash window: bloom absorbs batch 1, then "die" pre-append
    state = _load_url_bloom(cat)
    ids = b1.select("url")
    _update_url_bloom(
        spark, cat, ids, ids.count(), state, True, cfg, 1_000_000, 0.01, 256 << 20
    )
    n_after_crash = _load_url_bloom(cat)["n_inserted"]
    ingest_neardup_batch(spark, b1, 1, cat, cfg)  # the replay
    n_final = _load_url_bloom(cat)["n_inserted"]
    assert n_final == n_after_crash  # replayed urls contribute zero
    assert n_final <= pages.select("url").distinct().count()  # never over


def test_bloom_sentinel_reenables_when_budget_raised(spark, tmp_path):
    """The disabled sentinel must not be permanent (ADVICE r5): a later
    batch arriving with a RAISED max_bytes re-sizes against the committed
    corpus and re-enables the bloom (logged once); the sentinel gate stays
    constant-time for batches with the unchanged budget."""
    fx = generate_pages(n_rows=60, seed=43)
    pages = pages_dataframe(spark, fx)
    b0, b1 = _split_batches(pages, 2)
    cfg = DedupConfig()
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    ingest_neardup_batch(
        spark, b0, 0, cat, cfg, url_bloom=True, url_bloom_max_bytes=1
    )
    state = _load_url_bloom(cat)
    assert state["m_bits"] == 0 and state["n_capacity"] == 1  # budget recorded
    ingest_neardup_batch(
        spark, b1, 1, cat, cfg, url_bloom=True, url_bloom_max_bytes=10_000_000
    )
    state = _load_url_bloom(cat)
    assert state["m_bits"] > 0  # rebuilt and re-enabled
    ev = cat.read("_lineage").where(F.col("stage") == "url_bloom_reenabled")
    assert ev.count() == 1
