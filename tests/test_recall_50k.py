"""Recall gate at a size where LSH statistics bite (VERDICT r3 item 7).

The 300-row fixture e2e asserts dup-pair recall >= 0.99; at that size a
lucky MinHash draw could hide a systematic recall hole.  This test runs the
full pipeline over the 50k-row distributed fixture (same planted structure
the scaling bench uses: 1% skew-bomb 404 cluster, 4% exact-dup groups of 4,
10% near-dup groups of 5 with ~1.5% token edits) and asserts pair recall
>= 0.99 over ~140k expected duplicate pairs — enough pairs that the LSH
S-curve, the band-bucket skew tiers, and the containment rescue all operate
in their statistical regime.
"""

from __future__ import annotations

import itertools

import pytest

from image_deduplication_3m_images_spark.config import DedupConfig
from image_deduplication_3m_images_spark.plans.dedupe import run_dedupe
from image_deduplication_3m_images_spark.sources.pages_fixture import (
    pages_distributed,
)

N = 50_000


def expected_cluster(i: int, n: int = N) -> str | None:
    """Planted group of doc id ``i`` — mirrors pages_distributed's layout."""
    lo_exact = int(n * 0.01)
    lo_near = int(n * 0.05)
    lo_uniq = int(n * 0.15)
    if i < lo_exact:
        return "skew_404"
    if i < lo_near:
        return f"exact_{(i - lo_exact) // 4}"
    if i < lo_uniq:
        return f"near_{(i - lo_near) // 5}"
    return None


@pytest.mark.slow
def test_dup_pair_recall_at_50k(spark, tmp_path):
    pages = pages_distributed(spark, N, seed=42, partitions=32)
    report = run_dedupe(spark, pages, str(tmp_path / "wh"), DedupConfig())
    got = {
        int(r["url"][-9:]): r["cluster_id"]
        for r in report.select("url", "cluster_id").collect()
    }
    assert len(got) == N  # row preservation at scale

    groups: dict[str, list[int]] = {}
    for i in range(int(N * 0.15)):
        c = expected_cluster(i)
        if c:
            groups.setdefault(c, []).append(i)

    n_expected = 0
    n_hit = 0
    for members in groups.values():
        for a, b in itertools.combinations(members, 2):
            n_expected += 1
            if got[a] == got[b]:
                n_hit += 1
    assert n_expected > 100_000  # the statistical regime this gate is for
    recall = n_hit / n_expected
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 at {N} rows"
