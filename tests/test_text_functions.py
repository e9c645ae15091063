"""Text-function unit tests: extraction byte-parity (expr vs UDF vs oracle),
quality/langid/token-count determinism (FIXTURES.md §4-5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.functions.text import (
    extract_text,
    extract_text_udf,
    langid_expr,
    n_tokens_bpe_expr,
    n_tokens_ws_expr,
    quality_expr,
)
from image_deduplication_3m_images_spark.sources.pages_fixture import (
    generate_pages,
    pages_dataframe,
    render_html,
)


def test_extract_expr_equals_udf_equals_oracle(spark):
    fx = generate_pages(n_rows=120, seed=7)
    pages = pages_dataframe(spark, fx)
    out = pages.select(
        "url",
        "text",
        extract_text(F.col("html")).alias("expr_text"),
        extract_text_udf(F.col("html")).alias("udf_text"),
    )
    bad = out.where(
        (F.col("expr_text") != F.col("text")) | (F.col("udf_text") != F.col("text"))
    ).count()
    assert bad == 0


def test_extract_edge_cases(spark):
    rows = [
        ("no-title", b"<html><body><p>only body</p></body></html>", "only body"),
        ("no-para", render_html("just title", "").replace(b"<p></p>", b""), "just title"),
        ("empty", b"<html></html>", ""),
        ("two-paras", b"<html><head><title>t</title></head><body><p>a</p><p>b</p></body></html>", "t\na\nb"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h, _ in rows], ["url", "html"]
    ).select("url", extract_text(F.col("html")).alias("text"))
    got = {r["url"]: r["text"] for r in df.collect()}
    for u, _, expect in rows:
        assert got[u] == expect, (u, got[u], expect)


def test_quality_and_tokens_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", ""), ("c", "x " * 200)], ["id", "text"]
    ).select(
        "id",
        quality_expr(F.col("text")).alias("q"),
        n_tokens_ws_expr(F.col("text")).alias("ws"),
        n_tokens_bpe_expr(F.col("text")).alias("bpe"),
        langid_expr(F.col("text")).alias("lang"),
    )
    got = {r["id"]: r for r in df.collect()}
    assert got["b"]["q"] == 0.0 and got["b"]["ws"] == 0
    assert got["a"]["ws"] == 4
    assert got["a"]["lang"] == "en"  # contains 'the'
    assert got["c"]["lang"] == "und"
    # quality bounded
    for r in got.values():
        assert 0.0 <= r["q"] <= 100.0
