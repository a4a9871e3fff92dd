"""Similarity search over an embedding column (array<float>).

Two tiers (SURVEY.md §7.2 phase 6 / task brief):

- **Brute-force cosine top-k** — the exact baseline.  The dot product
  is a JVM-side ``aggregate``/``zip_with`` against a broadcast literal
  query vector: one narrow scan + a top-k (TakeOrdered), no shuffle of
  the vectors themselves.
- **LSH-bucketed ANN** (random hyperplanes) — the scale path: each
  vector gets a ``planes``-bit signature; queries probe only matching
  (or near-matching) buckets.  At 100 TB the bucket join touches a
  ~2^-planes fraction of the corpus per probe.
- **IVF-style variant** — coarse k-means-ish assignment to the nearest
  of ``nlist`` seeded centroid vectors (deterministically sampled from
  the corpus), probe the ``nprobe`` nearest lists.

Deterministic throughout: hyperplanes/centroids derive from a seed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Expression-level dot product.

    NOTE: higher-order functions evaluate interpreted (outside
    whole-stage codegen) — fine for probe-sized subsets and for exact
    oracle parity, but the bulk path over a whole corpus should use
    ``pandas_scores`` (Arrow-batched numpy matmul, ~10-100x faster).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pandas_scores(query: list[float], vec_col: str = "embedding"):
    """Vectorized cosine scorer: a Scalar Pandas UDF computing
    cosine(vec, query) per Arrow batch with one numpy matmul — the
    100 TB bulk path (per-batch C-speed, no per-element interpretation).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query, dtype="float64")
    qn = float(np.linalg.norm(qv)) or 1.0

    # no Python type hints: `from __future__ import annotations` turns
    # them into strings pandas_udf can't resolve; returnType suffices
    def _score_fn(vecs):
        m = np.asarray(vecs.tolist(), dtype="float64")
        num = m @ qv
        den = np.linalg.norm(m, axis=1) * qn
        den[den == 0.0] = 1.0
        return pd.Series(num / den)

    _score = pandas_udf(_score_fn, "double")

    return _score(vec_col)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _vec_lit(vec: list[float]) -> Column:
    # one parsed SQL array literal, not len(vec) py4j F.lit calls
    # (repr round-trips each double exactly).  Non-finite values would
    # render as 'infD'/'nanD', which do not PARSE — reject them with a
    # clear error instead of a parser failure (the old F.lit path
    # produced valid NaN/Infinity literals, but a NaN query vector is
    # a caller bug in every consumer here: cosine/ADC scores would be
    # NaN-poisoned).
    vals = [float(v) for v in vec]
    if any(v != v or v in (float("inf"), float("-inf")) for v in vals):
        raise ValueError("query/codebook vector contains NaN or Infinity")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def cosine_topk(
    vecs: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    Plan shape: scan -> project score -> TakeOrderedAndProject (no full
    sort; each partition keeps k, driver merges k·partitions rows).
    ``impl='pandas'`` switches the scorer to the Arrow-batched numpy
    path (same scores to float ulps; preferred for full-corpus scans).
    """
    if impl == "pandas":
        score = pandas_scores(query, vec_col)
    else:
        q = _vec_lit(query)
        qn = math.sqrt(sum(float(v) ** 2 for v in query)) or 1.0
        score = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        vecs.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    vecs: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shards: int = 1,
) -> DataFrame:
    """Exact top-``k`` by cosine for a BATCH of query vectors — the
    retrieval-evaluation shape (rank every eval query against the
    corpus in one job) that per-query ``cosine_topk`` loops would turn
    into ¦queries¦ driver round-trips.  Output:
    (query_id, id, rank, score), rank tie-broken by ascending id.

    Scale shape: the query batch rides as a broadcast frame with its
    norms precomputed, so scoring is one map-side cross join against
    the corpus scan — corpus vectors never shuffle; only the
    (query_id, id, score) triples enter the ranking exchange.  A
    single-stage rank puts each query's whole score column in ONE
    partition; pass ``shards > 1`` for the two-stage form (per-shard
    top-k, then top-k of the shards * k survivors) — identical
    results, the same trade documented on ``bm25_topk``.
    """
    from pyspark.sql import Window

    spark = vecs.sparkSession
    qrows = [
        (int(qid), [float(x) for x in qv],
         math.sqrt(sum(float(x) ** 2 for x in qv)) or 1.0)
        for qid, qv in queries
    ]
    q = spark.createDataFrame(
        qrows, "query_id long, _qv array<double>, _qn double"
    )
    # q must stay a LocalTableScan (no coalesce/repartition): the
    # broadcast below then builds driver-side with zero Spark jobs;
    # wrapping it in ANY physical node forces a job to collect the
    # broadcast (measured x5.4 on this arm when round 10 tried it)
    # zero-norm guard: a 0/0 score is NaN, and NaN sorts ABOVE every
    # real number in a descending order — an all-zero embedding (a
    # failed upstream write) would falsely take rank 1 for every
    # query.  Guarding the denominator to 1 scores such vectors 0,
    # matching pandas_scores' den==0 rule.
    den = F.col("_cn") * F.col("_qn")
    scored = (
        vecs.select(
            F.col(id_col), F.col(vec_col).alias("_v"),
            norm(F.col(vec_col)).alias("_cn"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            id_col,
            (dot(F.col("_v"), F.col("_qv"))
             / F.when(den == 0.0, F.lit(1.0)).otherwise(den)).alias("score"),
        )
    )
    order = (F.col("score").desc(), F.col(id_col).asc())
    if shards > 1:
        ws = Window.partitionBy(
            "query_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
        ).orderBy(*order)
        scored = (
            scored.withColumn("_sr", F.row_number().over(ws))
            .filter(F.col("_sr") <= k)
            .drop("_sr")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )


# ------------------------------------------------------ hyperplane LSH

def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG; no numpy
    needed at plan-build time, and stable across sessions)."""
    state = seed & 0x7FFFFFFF
    out = []
    for _ in range(planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x40000000 - 1.0)  # ~U(-1, 1)
        out.append(row)
    return out


def hyperplane_sig(vec: Column, *, dim: int, planes: int = 16, seed: int = 42) -> Column:
    """planes-bit LSH signature: bit b = sign(vec · plane_b)."""
    hp = _hyperplanes(dim, planes, seed)
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(hp):
        d = dot(vec, _vec_lit(plane))
        sig = sig.bitwiseOR(
            F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sig


def ann_index(
    vecs: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Attach the LSH signature column (write this out bucketed/
    partitioned by ``sig`` as the persisted index)."""
    return vecs.withColumn(
        "sig", hyperplane_sig(F.col(vec_col), dim=dim, planes=planes, seed=seed)
    )


def ann_topk(
    indexed: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: probe buckets whose signature is within
    ``max_hamming`` bits of the query's, re-rank exactly by cosine.
    With a bucketed layout the probe is a partition-pruned scan."""
    hp = _hyperplanes(len(query), planes, seed)
    qsig = 0
    for b, plane in enumerate(hp):
        if sum(x * y for x, y in zip(query, plane)) > 0:
            qsig |= 1 << b
    probe = F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    q = _vec_lit(query)
    qn = math.sqrt(sum(float(v) ** 2 for v in query)) or 1.0
    score = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        indexed.filter(probe)
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------------------ IVF-style

def ivf_centroids(
    vecs: DataFrame, *, vec_col: str = "embedding", id_col: str = "vec_id",
    nlist: int = 16, n: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Coarse centroids: deterministic hash-spread corpus sample — a
    k-means refinement can replace this without changing the probe
    path.  Only ~nlist rows ever reach the driver (a full-corpus
    collect would be the classic non-distributed mistake).  Pass ``n``
    when the caller already counted the corpus to skip the count job."""
    if n is None:
        n = vecs.count()
    step = max(n // nlist, 1)
    picked = (
        vecs.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(step)) == 0)
        .orderBy(id_col)
        .limit(nlist)
        .collect()
    )
    if len(picked) < nlist:  # unlucky hash spread: pad with first ids
        pad = (
            vecs.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(nlist)
            .collect()
        )
        seen = {r[id_col] for r in picked}
        picked += [r for r in pad if r[id_col] not in seen][: nlist - len(picked)]
    return [(i, list(r[vec_col])) for i, r in enumerate(picked)]


def kmeans_refine(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of coarse centroids (the k-means step the
    ivf_centroids docstring promises): per iteration, one Arrow-batched
    nearest-centroid assignment (cosine argmax, the same matmul the
    probe path uses) and one elementwise mean per cluster computed as
    a (list_id, position, value) hash-agg — map-side combinable, and
    only nlist x dim averaged rows ever reach the driver (bounded by
    the model size, not the corpus).  Empty clusters keep their
    previous centroid (the standard Lloyd dead-cluster rule), so the
    centroid count is stable.  Deterministic: seeded input centroids
    and argmax tie-breaks give the same model on every run.

    Improves IVF probe recall and SemDeDup cluster tightness over the
    raw hash-spread sample; pass the result as ``centroids=`` to
    ``ivf_assign`` / ``semantic_dedup``.
    """
    from hbase_spark.functions.dedup import _assign_clusters_arrow

    cur = [(i, list(map(float, c))) for i, c in centroids]
    base = vecs.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    dim = len(cur[0][1])
    for _ in range(int(iters)):
        assigned = _assign_clusters_arrow(base, cur)
        means = (
            assigned.select("list_id", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("list_id", "_p")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        by_list: dict[int, list[float]] = {}
        for r in means:
            by_list.setdefault(r["list_id"], [0.0] * dim)[r["_p"]] = r["_m"]
        cur = [
            (i, by_list.get(i, prev)) for i, prev in cur
        ]
    return cur


def ivf_assign(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (adds ``list_id``).
    Persist partitioned by list_id for probe-time partition pruning."""
    scored = F.array(
        *[
            F.struct(
                cosine(F.col(vec_col), _vec_lit(c)).alias("score"),
                F.lit(i).alias("list_id"),
            )
            for i, c in centroids
        ]
    )
    return vecs.withColumn("list_id", F.array_max(scored)["list_id"])


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest lists, exact cosine re-rank inside."""
    def cos(c):
        num = sum(x * y for x, y in zip(query, c))
        dn = math.sqrt(sum(x * x for x in c)) * math.sqrt(sum(x * x for x in query))
        return num / dn if dn else 0.0

    probe_ids = [i for i, _ in sorted(centroids, key=lambda ic: -cos(ic[1]))[:nprobe]]
    q = _vec_lit(query)
    qn = math.sqrt(sum(float(v) ** 2 for v in query)) or 1.0
    score = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        assigned.filter(F.col("list_id").isin(probe_ids))
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_vecs: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    sibling of text.contamination's 5-gram overlap: a corpus item is
    contaminated when its nearest EVAL-SET embedding sits at or above
    ``threshold`` cosine (near-duplicates of test items that n-gram
    overlap misses: paraphrases, translations, reformattings).

    Output: the corpus with ``max_eval_cos`` (NULL when the eval set
    is empty) and a ``contaminated`` flag — filter on it or keep it as
    an audit column.

    Scale shape: eval sets are benchmark-sized (thousands), so the
    eval frame is broadcast and every (corpus, eval) cosine is exact,
    computed map-side inside codegen (aggregate/zip_with) — no
    shuffle of the corpus, one hash-agg per corpus id for the max.
    For eval sets too large to broadcast, pre-bucket with ann_index
    and reuse this over each probe bucket.
    """
    # Hoist both norms out of the pair loop: higher-order functions
    # evaluate interpreted, so computing norm(corpus vec) per EVAL row
    # (and norm(eval vec) per CORPUS row) triples the per-pair work.
    # Each side's norm is computed once per row before the cross join;
    # the per-pair dot keeps its summation order, so the cosine values
    # are bit-identical to the naive form.
    ev = eval_vecs.select(
        F.col(vec_col).alias("_ev"), norm(F.col(vec_col)).alias("_en")
    )
    scored = (
        corpus.select(id_col, vec_col)
        .withColumn("_cn", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(ev))
        .select(
            id_col,
            (dot(F.col(vec_col), F.col("_ev"))
             / (F.col("_cn") * F.col("_en"))).alias("_c"),
        )
        .groupBy(id_col)
        .agg(F.max("_c").alias("max_eval_cos"))
    )
    return corpus.join(scored, id_col, "left").withColumn(
        "contaminated",
        F.coalesce(
            F.col("max_eval_cos") >= F.lit(float(threshold)), F.lit(False)
        ),
    )


# -------------------------------------------------- product quantization

def pq_train(
    vecs: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 8,
    sample: int = 4096,
    iters: int = 8,
) -> list:
    """Product-quantizer codebooks (Jégou, Douze & Schmid 2011,
    "Product quantization for nearest neighbor search"): split the
    L2-normalized vector into ``m`` subspaces and learn a ``2^nbits``-
    entry k-means codebook per subspace.  Returns a list of ``m``
    (ksub x dsub) nested float lists.

    Why this is the 100 TB ANN path: a float32 vector costs 4*dim
    bytes; its PQ code costs ``m`` bytes (m=8, nbits=8 -> 8 bytes for
    a 64-dim vector, a 32x reduction), and query scoring never touches
    the original vectors — one ``ksub x m`` distance table per query
    plus a table lookup per code byte (``pq_topk``).

    Training runs on a deterministic hash-spread sample of at most
    ``sample`` rows collected to the driver (the standard practice —
    quantizer quality needs a representative sample, not the corpus)
    and plain Lloyd iterations per subspace with strided init — the
    same determinism discipline as the two-level assignment's
    super-centroids: identical corpus -> identical codebooks.  Driver
    cost is bounded by ``sample * dim`` floats, never the corpus.
    """
    import numpy as np

    n = vecs.count()
    step = max(n // sample, 1)
    rows = (
        vecs.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(step)) == 0)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub, ksub = d // m, 1 << nbits
    books = []
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        init = np.unique(
            np.linspace(0, len(sub) - 1, ksub).round().astype("int64")
        )
        C = sub[init].copy()
        for _ in range(int(iters)):
            # expanded-form distances (||c||^2 - 2<x,c>; ||x||^2 is
            # argmin-invariant): one (sample x ksub) matrix per iter
            # instead of a (sample x ksub x dsub) tensor
            d2 = (C ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ C.T)
            a = d2.argmin(axis=1)
            for ci in range(len(C)):
                mask = a == ci
                if mask.any():
                    C[ci] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def pq_encode(
    vecs: DataFrame,
    codebooks: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, code) — each vector L2-normalized and encoded to its
    nearest codebook entry per subspace, as ``array<smallint>`` of
    length m (values 0..ksub-1; parquet bit-packs small ints, and a
    production sink can pack to ``binary`` for the literal m bytes).
    One numpy argmin per subspace per Arrow batch; the codebook ships
    as a Spark broadcast.  ``extra_cols`` (e.g. an IVF ``list_id``)
    pass through untouched."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    bc = vecs.sparkSession.sparkContext.broadcast(
        [np.asarray(b, dtype="float64") for b in codebooks]
    )
    in_schema = vecs.select(id_col, *extra_cols, vec_col).schema
    schema = T.StructType(
        [in_schema[id_col]]
        + [in_schema[c] for c in extra_cols]
        + [T.StructField("code", T.ArrayType(T.ShortType()), False)]
    )

    def _enc(batches):
        books = bc.value
        dsub = books[0].shape[1]
        for pdf in batches:
            if len(pdf):
                V = np.asarray(pdf[vec_col].to_list(), dtype="float64")
                V = V / np.maximum(
                    np.linalg.norm(V, axis=1, keepdims=True), 1e-12
                )
                codes = np.empty((len(V), len(books)), dtype="int16")
                for j, C in enumerate(books):
                    sub = V[:, j * dsub:(j + 1) * dsub]
                    # ||x-c||^2 = ||x||^2 - 2<x,c> + ||c||^2; argmin
                    # needs only the last two terms
                    d2 = (C ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ C.T)
                    codes[:, j] = d2.argmin(axis=1)
                out = pdf[[id_col, *extra_cols]].copy()
                out["code"] = list(codes)
            else:
                out = pdf[[id_col, *extra_cols]].copy()
                out["code"] = pd.Series([], dtype="object")
            yield out

    return vecs.select(id_col, *extra_cols, vec_col).mapInPandas(_enc, schema)


def pq_adc_score(codebooks: list, query: list, code_col: str = "code") -> Column:
    """Asymmetric-distance (ADC) cosine score as a PURE Catalyst
    expression: the query builds one inner-product table per subspace
    driver-side (ksub floats each), and the per-row score is m literal
    table lookups — ``sum_j table_j[code_j]`` — inside whole-stage
    codegen.  No vector is read and no Python runs at query time.
    Scores approximate ``cosine(query, vec)`` (both sides normalized;
    IP-ADC over L2-normalized vectors is the standard cosine form)."""
    import numpy as np

    q = np.asarray(list(query), dtype="float64")
    if not np.all(np.isfinite(q)):
        raise ValueError("query vector contains NaN or Infinity")
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    if not all(np.all(np.isfinite(b)) for b in books):
        raise ValueError("codebook contains NaN or Infinity")
    dsub = books[0].shape[1]
    # One SQL expression for the whole ADC sum (r10): building the m
    # lookup tables as F.lit(list) Columns cost ~1.5s of py4j
    # round-trips per query construction (m x ksub element
    # conversions); a single expr string parses once in the JVM.
    # repr() round-trips doubles exactly, so the parsed literals are
    # bit-identical to the numpy values.
    terms = []
    for j, C in enumerate(books):
        table = (C @ q[j * dsub:(j + 1) * dsub]).tolist()
        arr = ",".join(f"{x!r}D" for x in table)
        code_ident = "`" + code_col.replace("`", "``") + "`"
        terms.append(
            f"element_at(array({arr}),"
            f" cast(element_at({code_ident}, {j + 1}) as int) + 1)"
        )
    return F.expr(" + ".join(terms))


def pq_topk(
    codes: DataFrame,
    codebooks: list,
    query: list,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    code_col: str = "code",
    rerank: int = 0,
    vecs: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ top-k by ADC score over the codes frame (TakeOrdered — no
    shuffle), optionally exact-reranked: with ``rerank=R`` and the
    original ``vecs`` frame, the top R ADC candidates join back to
    their real vectors (an R-row broadcast semi-join against the
    corpus) and the final top-k is exact cosine — the standard
    two-stage PQ search shape.  At 100 TB the ADC pass reads only the
    m-byte codes; the refine pass fetches R real vectors, not the
    corpus."""
    adc = (
        codes.select(F.col(id_col), pq_adc_score(codebooks, query, code_col).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(max(k, rerank))
    )
    if not rerank:
        return adc.limit(k)
    if vecs is None:
        raise ValueError("rerank > 0 requires the original vecs frame")
    q = _vec_lit([float(x) for x in query])
    qn = math.sqrt(sum(float(v) ** 2 for v in query)) or 1.0
    exact = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        vecs.join(F.broadcast(adc.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), exact.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def ivfpq_topk(
    coded: DataFrame,
    centroids: list,
    codebooks: list,
    query: list,
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "code",
    rerank: int = 0,
    vecs: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: probe the ``nprobe`` nearest coarse lists (partition
    pruning when ``coded`` is persisted partitioned by ``list_id``),
    ADC-score only their codes, optional exact rerank — the FAISS
    IVFPQ composition, Spark-first.  ``coded`` is ``pq_encode(...,
    extra_cols=('list_id',))`` over an ``ivf_assign``-ed corpus."""
    def cos(c):
        num = sum(x * y for x, y in zip(query, c))
        dn = (
            math.sqrt(sum(x * x for x in c))
            * math.sqrt(sum(x * x for x in query))
        )
        return num / dn if dn else 0.0

    probe_ids = [
        i for i, _ in sorted(centroids, key=lambda ic: -cos(ic[1]))[:nprobe]
    ]
    return pq_topk(
        coded.filter(F.col("list_id").isin(probe_ids)),
        codebooks,
        query,
        k,
        id_col=id_col,
        code_col=code_col,
        rerank=rerank,
        vecs=vecs,
        vec_col=vec_col,
    )
