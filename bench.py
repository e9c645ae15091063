"""Benchmark harness — prints ONE JSON line with per-query wall times.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  * the full near-dup pipeline on `documents` (signatures -> LSH -> verify ->
    connected components -> best pick),
  * the stand-alone dedup/similarity/text operators,
  * a synthetic `pages` pipeline run (north-rule input shape, with planted
    clusters + skew bomb) measuring end-to-end docs/sec.

Usage: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _run(df) -> int:
    """Force full materialization without driver collect (noop sink)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages_n = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.plans import queries as Q
    from image_deduplication_3m_images_spark.plans.dedupe import run_dedupe
    from image_deduplication_3m_images_spark.session import get_spark
    from image_deduplication_3m_images_spark.sources.pages_fixture import (
        generate_pages,
        pages_dataframe,
    )

    from image_deduplication_3m_images_spark.session import warm_python_workers

    # box-speed constant for cross-window comparability (this VM's effective
    # speed drifts 1.5-2.5x between windows): walls below are comparable
    # across rounds after dividing by this run's calibration
    from image_deduplication_3m_images_spark.calibration import calibration_const

    calibration = calibration_const()

    spark = get_spark(cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # pay the one-time Python-worker bring-up outside the measured window
    warm_python_workers(spark, cores)

    timings: dict[str, float] = {}

    headline = [
        "event_windows",
        "pricing_summary",
        "top_nations",
        "exact_dedup",
        "repetition_stats",
        "boilerplate_ngrams",
        "signature_digest",
        "candidate_pairs",
        "verified_pairs",
        "dup_clusters",
        "best_pick",
        "simhash_pairs",
        "ngram_jaccard",
        "embedding_topk",
        "embedding_topk_lsh",
        "embedding_neardup",
        "token_stats",
        "quality",
        "langid",
        "fingerprint",
        "lang_stats",
        "brand_revenue",
        "no_f_customers",
        "user_sessions",
        "group_avg_sim",
        "test_path_flags",
        "url_dedup",
        "pii_stats",
        "length_quantiles",
        "doc_packing",
        "stratified_sample",
        "contamination",
        "semantic_clusters",
        "quality_funnel",
        "incremental_new_docs",
        "substring_pairs",
        "image_features",
        "media_dedup",
        "frame_samples",
    ]
    for name in headline:
        fn = Q.ALL_QUERIES[name]
        t0 = time.time()
        _run(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # full pages pipeline (checkpointed stages) on synthetic north-rule input
    import tempfile

    fixture = generate_pages(n_rows=pages_n, seed=42)
    pages = pages_dataframe(spark, fixture).repartition(max(cores, 8)).cache()
    pages.count()
    with tempfile.TemporaryDirectory() as wh:
        t0 = time.time()
        report = run_dedupe(spark, pages, wh, DedupConfig(), resume=False)
        _run(report)
        wall = time.time() - t0
    timings["pages_pipeline_e2e"] = round(wall, 3)
    timings["pages_docs_per_sec"] = round(pages_n / wall, 1)

    total = round(sum(v for k, v in timings.items() if k != "pages_docs_per_sec"), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": cores,
                "pages_rows": pages_n,
                "calibration": calibration,
                # catalog size grows round-over-round as operators are
                # added; compare totals across rounds per-query, not by the
                # raw sum.  NOTE: `value` also folds in pages_pipeline_e2e
                # (kept for cross-round consistency — every prior round's
                # total included it), so value/n_queries is NOT a pure
                # per-headline-query average; use the per-query timings.
                "n_queries": len(headline),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
