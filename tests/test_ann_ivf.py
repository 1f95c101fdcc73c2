"""The production IVF path (k-means quantizer, operators/ann.py) is
verified by RECALL against the exact brute-force top-k (the l8 declared
query) — k-means ids aren't cross-engine reproducible, so this is the
honest check: the index must actually find most true neighbors, and
probing more buckets must not lose any."""

from __future__ import annotations

from zg_etl_spark import plans
from zg_etl_spark.sources.tables import load_table

QUERY_IDS = [0, 1, 2, 3, 4]
TOP_K = 5


def _exact_topk(spark, sf_dir):
    rows = plans.all_queries()["l8_ann_bruteforce"](spark, sf_dir).collect()
    exact = {}
    for r in rows:
        if r.rank <= TOP_K:
            exact.setdefault(r.q_id, set()).add(r.cand_id)
    return exact


def _recall(found_rows, exact):
    found = {}
    for r in found_rows:
        found.setdefault(r.q_id, set()).add(r.cand_id)
    hits = sum(len(found.get(q, set()) & e) for q, e in exact.items())
    total = sum(len(e) for e in exact.values())
    return hits / total


def test_ivf_recall_and_monotonicity(spark, sf_dir):
    from zg_etl_spark.operators.ann import build_ivf_index, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assignment = build_ivf_index(emb, k=4, seed=42)
    assert centroids.count() == 4
    assert assignment.count() == emb.count()

    exact = _exact_topk(spark, sf_dir)
    recalls = {
        nprobe: _recall(
            ivf_search(
                emb, centroids, assignment, QUERY_IDS, TOP_K, nprobe=nprobe
            ).collect(),
            exact,
        )
        for nprobe in (1, 2, 4)
    }
    # probing every bucket IS brute force — recall must be exact
    assert recalls[4] == 1.0, recalls
    # the synthetic embeddings are UNSTRUCTURED random vectors, where the
    # theoretical IVF recall floor is ~nprobe/k (neighbors scatter evenly
    # across buckets); a clustered real corpus does far better. Assert
    # the floor with slack, and that more probes never lose neighbors.
    assert recalls[1] >= 0.15, recalls
    assert recalls[2] >= 0.35, recalls
    assert recalls[1] <= recalls[2] <= recalls[4], recalls


def test_ivf_candidates_are_bucket_pruned(spark, sf_dir):
    """nprobe=1 must score ~1/k of the corpus per query, not all of it —
    the pruning that makes IVF the 100 TB path."""
    from zg_etl_spark.operators.ann import build_ivf_index, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    centroids, assignment = build_ivf_index(emb, k=4, seed=42)
    probed = ivf_search(emb, centroids, assignment, QUERY_IDS, top_k=10**9, nprobe=1)
    per_q = {r.q_id: r.n for r in probed.groupBy("q_id").count()
             .withColumnRenamed("count", "n").collect()}
    for q_id, cnt in per_q.items():
        assert cnt < 0.8 * n, (q_id, cnt, n)


def test_pq_adc_recall_beats_random(spark, sf_dir):
    """l37's PQ index must be INFORMATIVE: the ADC shortlist's exact
    re-rank recovers well over half of the true cosine top-10 (measured
    0.72 at sf0.01 with the seed-sample codebook), where a random
    50-of-N shortlist would land ~0.1. Guards against the quantizer
    degenerating (e.g. every vector mapping to one code, which would
    keep the oracle green — both engines would agree on garbage — while
    the index carries no signal)."""
    from zg_etl_spark import plans

    qs = plans.all_queries()
    brute = {(r.q_id, r.cand_id)
             for r in qs["l8_ann_bruteforce"](spark, sf_dir).collect()}
    pq = {(r.q_id, r.cand_id)
          for r in qs["l37_pq_ann"](spark, sf_dir).collect()}
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.5, f"PQ recall@10 collapsed: {recall:.2f}"
