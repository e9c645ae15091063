"""Property-based tests (hypothesis) for the pure-expression operators.

The reference has no property testing (SURVEY.md §5); these go beyond it on
the operators whose contracts are algebraic: the distributed prefix-sum
must equal the sequential one for ANY input and ANY bucketing, and URL
canonicalization must be idempotent and mirror its Python reference
implementation.  Each example batches its rows into ONE Spark job so the
suite stays fast.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.functions.text import (
    canonical_url_expr,
)
from image_deduplication_3m_images_spark.operators.decontaminate import (
    word_ngrams_expr,
)
from image_deduplication_3m_images_spark.operators.packing import (
    pack_documents,
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 500)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    bucket_rows=st.sampled_from([1, 7, 100, 10**9]),
    budget=st.integers(1, 1000),
)
def test_packing_equals_sequential_cumsum(spark, rows, bucket_rows, budget):
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(4)
    got = {
        r["doc_id"]: (r["offset"], r["pack_id"])
        for r in pack_documents(
            df, budget=budget, bucket_rows=bucket_rows
        ).collect()
    }
    run = 0
    for doc_id, n_tokens in sorted(rows):
        assert got[doc_id] == (run, run // budget), (doc_id, bucket_rows)
        run += n_tokens
    assert len(got) == len(rows)


def _canon_py(u: str) -> str:
    u = u.lower()
    u = re.sub(r"^(https?://)+", "", u)
    u = re.sub(r"^(www\.)+", "", u)
    u = re.sub(r"[?#].*$", "", u, flags=re.S)
    return re.sub(r"/+$", "", u)


_url_st = st.builds(
    lambda scheme, www, host, path, tail: scheme + www + host + path + tail,
    scheme=st.sampled_from(["", "http://", "https://", "HTTPS://", "http://http://"]),
    www=st.sampled_from(["", "www.", "WWW.", "www.www."]),
    host=st.from_regex(r"[A-Za-z0-9-]{1,10}(\.[A-Za-z0-9-]{1,8}){1,3}", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}/{0,3}", fullmatch=True),
    tail=st.sampled_from(["", "?a=1&b=2", "#frag", "?UTM=x#y", "?", "#"]),
)


@_settings
@given(urls=st.lists(_url_st, min_size=1, max_size=50))
def test_canonical_url_matches_python_and_is_idempotent(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["raw"])
    rows = df.select(
        "raw",
        canonical_url_expr(F.col("raw")).alias("c1"),
        canonical_url_expr(canonical_url_expr(F.col("raw"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == _canon_py(r["raw"]), r["raw"]
        assert r["c2"] == r["c1"], r["raw"]  # idempotent


@_settings
@given(
    texts=st.lists(
        st.text(alphabet=" abcdef", min_size=0, max_size=80), min_size=1, max_size=40
    ),
    n=st.integers(2, 6),
)
def test_word_ngrams_match_python(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select("t", word_ngrams_expr(F.col("t"), n).alias("g")).collect()
    for r in rows:
        toks = [w for w in r["t"].split(" ") if w]
        expect = list(dict.fromkeys(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ))
        assert r["g"] == expect, (r["t"], n)


def test_pages_distributed_bytes_are_pinned(spark):
    """The scaling fixture's claim 'fixtures <= 10M rows regenerate
    byte-identically' (sources/pages_fixture.py seed-namespace note) is
    load-bearing: banked BENCH evidence references inputs by construction,
    not by stored bytes.  Pin a content digest of the 2000-row fixture so
    any seed/vocab/render change fails loudly here instead of silently
    detaching the banked numbers from reproducible inputs."""
    from pyspark.sql import functions as F

    from image_deduplication_3m_images_spark.sources.pages_fixture import (
        pages_distributed,
    )

    df = pages_distributed(spark, 2000, seed=42, partitions=8)
    row = (
        df.select(
            F.sha2(F.concat_ws("\x1f", "url", "text", "lang"), 256).alias("h")
        )
        .agg(
            F.sha2(
                F.concat_ws("", F.sort_array(F.collect_list("h"))), 256
            ).alias("digest")
        )
        .collect()[0]
    )
    assert (
        row["digest"]
        == "1956a9d634038c32347811bb6fbd76bf670e3c22fa5f3c1b810eb1997cbf8ed9"
    )
