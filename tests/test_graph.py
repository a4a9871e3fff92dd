"""Connected components (functions/graph.py) and the transitive
dedup-cluster closure built on it (functions/dedup.py dedup_clusters)."""

import random

from pyspark.sql import functions as F

from hbase_spark.functions.dedup import dedup_clusters, minhash_dedup
from hbase_spark.functions.graph import connected_components


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(mem) for mem in comp.values() for n in mem}


def _cc_dict(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [(0, 0)], ["src", "dst"])
    if not edges:
        e = e.filter("src < 0")
    nd = (
        spark.createDataFrame([(n,) for n in nodes], ["src"])
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=nd)
    return {r.node: r.component for r in out.collect()}


def test_cc_matches_union_find_on_random_graphs(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        nodes = list(range(40))
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(45)
        ]
        got = _cc_dict(spark, edges, nodes=nodes)
        want = _union_find(nodes, [(u, v) for u, v in edges if u != v])
        assert got == want


def test_cc_long_chain_converges(spark):
    # a path graph is the worst case for one-hop min-id: closure must
    # propagate the root across 63 hops via the log-round star steps
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_cc_isolated_nodes_and_self_loops(spark):
    got = _cc_dict(spark, [(5, 5), (1, 2)], nodes=[1, 2, 5, 9])
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_cc_empty_edges(spark):
    got = _cc_dict(spark, [], nodes=[3, 4])
    assert got == {3: 3, 4: 4}


def _chain_docs(spark, n=6, base_tokens=22):
    """Doc i = base text + i extra tokens: shingle sets nest, so
    jaccard(i, j) = (base + i) / (base + j) — adjacent revisions are
    near-dups at 0.9 but the chain's endpoints are not."""
    base = " ".join(f"w{k}" for k in range(base_tokens))
    rows = [
        (i, base + "".join(f" extra{j}" for j in range(i))) for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_clusters_closes_revision_chains(spark):
    docs = _chain_docs(spark)
    out = dedup_clusters(
        docs, threshold=0.9, num_hashes=64, bands=16
    ).orderBy("doc_id")
    rows = out.collect()
    # transitive closure: every revision lands in doc 0's cluster even
    # though jaccard(0, 5) = 20/25 < 0.9; only the representative keeps
    assert [r.cluster for r in rows] == [0] * 6
    assert [r.keep for r in rows] == [True] + [False] * 5


def test_dedup_clusters_vs_one_hop_on_v_component(spark):
    """Two originals each near-duping a common third, but not each
    other: the pair graph is 10-15, 12-15.  minhash_dedup's one-hop
    rule (drop the larger of each pair) keeps BOTH 10 and 12; the
    transitive closure puts all three in one cluster with one
    representative — the over-keep dedup_clusters exists to fix."""
    base = " ".join(f"w{k}" for k in range(22))
    docs = spark.createDataFrame(
        [
            (10, base),
            (12, base + " extra0 extra1 extra2 extra3"),
            (15, base + " extra0 extra1"),
        ],
        ["doc_id", "text"],
    )
    one_hop = minhash_dedup(docs, threshold=0.9, num_hashes=64, bands=16)
    assert {r.doc_id for r in one_hop.collect()} == {10, 12}
    out = dedup_clusters(docs, threshold=0.9, num_hashes=64, bands=16)
    rows = {(r.doc_id, r.cluster, r.keep) for r in out.collect()}
    assert rows == {(10, 10, True), (12, 10, False), (15, 10, False)}


def test_dedup_clusters_singletons_and_custom_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta"),
         (7, "iota kappa lambda mu")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(7, 2)], ["a", "b"])
    out = dedup_clusters(docs, pairs=pairs).orderBy("doc_id")
    rows = out.collect()
    assert {(r.doc_id, r.cluster, r.keep) for r in rows} == {
        (1, 1, True), (2, 2, True), (7, 2, False),
    }


def test_cc_non_integral_ids_fail_loudly(spark):
    """A NULL or non-castable node id must fail the job in-plan — a
    silent NULL would collapse every edge and return an empty closure
    (review finding)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    e = spark.createDataFrame([(1, None), (2, 3)], "src long, dst long")
    with pytest.raises(Exception, match="non-integral node id|CAST|NULL"):
        connected_components(e).collect()
    docs = spark.createDataFrame(
        [("warc-a", "t"), ("warc-b", "t")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([("warc-a", "warc-b")], ["a", "b"])
    from hbase_spark.functions.dedup import dedup_clusters

    with pytest.raises(Exception):
        dedup_clusters(docs, pairs=pairs).collect()


def test_dedup_clusters_keep_by_quality(spark):
    """keep_by: the cluster representative is the highest-scoring
    member (ties to the smaller id), not the minimum id — the
    keep-the-best-copy rule; singletons always keep."""
    from pyspark.sql import functions as F

    from hbase_spark.functions.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(1, "a", 0.2), (2, "b", 0.9), (3, "c", 0.9), (9, "solo", 0.1)],
        "doc_id long, text string, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = {
        r["doc_id"]: r
        for r in dedup_clusters(
            docs, pairs=pairs, keep_by="quality"
        ).collect()
    }
    # cluster {1,2,3}: 2 and 3 tie on quality -> smaller id 2 wins
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
    assert all(out[i]["cluster"] == 1 for i in (1, 2, 3))
    assert out[9]["keep"] and out[9]["cluster"] == 9

    # default (no keep_by) still keeps the minimum id
    base = {
        r["doc_id"]: r["keep"]
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    assert [base[i] for i in (1, 2, 3, 9)] == [True, False, False, True]
