"""Vector-serving analytics beyond raw ANN retrieval (SURVEY.md §2
D33-D35): attribute-filtered search, embedding-drift monitoring, and
maximal-marginal-relevance diversification — the pieces a production
vector stack layers AROUND its index. Filtered search is the
metadata-predicate case every real retrieval system hits (FAISS/
Vespa/Milvus all ship it); drift is the embedding-freshness monitor
that decides when to re-embed; MMR (Carbonell & Goldstein, SIGIR'98)
is the standard re-rank that trades relevance for diversity on the
retrieved shortlist.

Scale shape shared by all three: the corpus-sized work stays in the
existing one-scan / partial-aggregate operators (brute-force GEMM
scan, posexplode centroid aggregation); everything added here runs on
shortlist- or centroid-sized relations (k² per query, labels × dims),
so the re-rank and the monitors are free at 100 TB relative to
retrieval itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.similarity import (
    ZERO_NORM_COS,
    knn_brute_force,
    unit_rows,
)
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table


# ---------------------------------------------------------------- D33
@register(
    "ann_filtered",
    oracle="""
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4)
                   AS cos_sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                       DESC,
                       c.vec_id
               ) AS rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        JOIN documents d ON d.doc_id = c.vec_id
        WHERE q.vec_id < 5 AND d.lang = 'en' AND d.n_chars >= 400
    ) WHERE rank <= 8
    """,
)
def ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D33 — attribute-filtered exact top-k: cosine top-8 restricted
    to candidates whose DOCUMENT metadata passes a predicate
    (lang = 'en' AND n_chars ≥ 400) — the filtered-search case every
    production vector DB serves, done PRE-filter (filter first, then
    rank) so recall under the predicate is exact by construction,
    unlike post-filtering a fixed-k unfiltered result. The predicate
    runs as a semi-join of the embedding corpus against the pruned
    documents scan (both sides shuffle on the id key once; the text
    column is never read — ReadSchema carries only doc_id/lang/
    n_chars), then the surviving corpus flows through the one-scan
    GEMM brute-force operator (D1). At 100 TB the filter makes the
    scan CHEAPER than unfiltered ANN, and the same shape serves any
    predicate the documents table can express."""
    e = table(spark, sf_dir, "embeddings")
    keep = (
        table(spark, sf_dir, "documents")
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 400))
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = e.join(keep, "vec_id", "semi")
    return knn_brute_force(
        corpus=corpus, queries=e.where(F.col("vec_id") < 5), k=8
    )


# ---------------------------------------------------------------- D34
@register(
    "centroid_drift",
    oracle="""
    WITH c AS (
        SELECT label, vec_id % 2 AS side, i AS dim,
               round(avg(CAST(embedding[i+1] AS DOUBLE)), 6) + 0 AS cv,
               count(*) AS n
        FROM embeddings, UNNEST(range(64)) AS t(i)
        GROUP BY label, side, i
    ),
    j AS (
        SELECT a.label,
               sum(a.cv * b.cv) AS ab,
               sum(a.cv * a.cv) AS aa,
               sum(b.cv * b.cv) AS bb,
               any_value(a.n) AS n_a,
               any_value(b.n) AS n_b
        FROM c a
        JOIN c b ON a.label = b.label AND a.dim = b.dim
                AND a.side = 0 AND b.side = 1
        GROUP BY a.label
    )
    SELECT label,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(ab / sqrt(aa * bb), 6) AS centroid_cos,
           round(1 - ab / sqrt(aa * bb), 6) AS drift
    FROM j
    ORDER BY label
    """,
)
def centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D34 — embedding drift per label between two ingest batches
    (vec_id parity stands in for batch membership): cosine between the
    batch centroids, the cheap monitor that tells a vector stack when
    an upstream encoder change or data shift has moved the space and
    the index needs re-training (the D27/D30 dials price recall; this
    prices WHEN to re-run them). The corpus-sized work is exactly the
    D2 `label_centroids` shape — posexplode to (label, side, dim) with
    map-side-combinable partial sums, so the shuffle carries
    labels × 2 × 64 aggregate rows at ANY corpus size; the cosine is
    then a 64-row-per-label join on the tiny centroid relation.
    Centroids are rounded to 6 dp on both engines BEFORE the dot
    products (the sum order inside avg differs, rounding absorbs the
    ulps), so both engines fold identical doubles."""
    e = table(spark, sf_dir, "embeddings")
    c = (
        e.select(
            "label",
            (F.col("vec_id") % 2).alias("side"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .groupBy("label", "side", "dim")
        .agg(
            (F.round(F.avg(F.col("v").cast("double")), 6) + F.lit(0.0)).alias(
                "cv"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = c.where(F.col("side") == 0).select(
        "label", "dim", F.col("cv").alias("cva"), F.col("n").alias("na")
    )
    b = c.where(F.col("side") == 1).select(
        "label", "dim", F.col("cv").alias("cvb"), F.col("n").alias("nb")
    )
    j = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("cva") * F.col("cvb")).alias("ab"),
            F.sum(F.col("cva") * F.col("cva")).alias("aa"),
            F.sum(F.col("cvb") * F.col("cvb")).alias("bb"),
            F.any_value("na").alias("n_a"),
            F.any_value("nb").alias("n_b"),
        )
    )
    # try_divide: an all-zero batch centroid (failed-encoder ingest —
    # exactly the case this monitor exists to catch) has no direction;
    # drift is NULL on both engines, not an ANSI crash
    cos = F.try_divide(
        F.col("ab"), F.sqrt(F.col("aa") * F.col("bb"))
    )
    return j.select(
        "label",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(cos, 6).alias("centroid_cos"),
        F.round(1 - cos, 6).alias("drift"),
    ).orderBy("label")


# ---------------------------------------------------------------- D35
_MMR_QUERIES = 3  # probe vectors: vec_id < 3
_MMR_SHORTLIST = 8  # retrieval depth fed to the re-ranker
_MMR_PICKS = 4  # diversified result size
_MMR_LAMBDA = 0.7  # relevance weight; (1-λ) penalizes redundancy


def _mmr_oracle() -> str:
    """Unrolled greedy-MMR CTE chain (the _ivf_lloyd_sql discipline:
    a fixed iteration count becomes a generated SQL chain). Pick 1 is
    pure relevance; each later pick maximizes
    λ·rel − (1−λ)·max_sim_to_selected over the not-yet-picked
    shortlist, ties broken by candidate id."""
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    parts = [
        f"""
    WITH short AS (
        SELECT query_id, cid, rel FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cid,
                   round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                       AS rel,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                           q.embedding::DOUBLE[],
                           c.embedding::DOUBLE[]), 6) DESC,
                           c.vec_id
                   ) AS rank
            FROM embeddings q
            JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < {_MMR_QUERIES}
        ) WHERE rank <= {_MMR_SHORTLIST}
    ),
    pairs AS (
        SELECT s1.query_id, s1.cid AS a, s2.cid AS b,
               round(list_cosine_similarity(
                   v1.embedding::DOUBLE[], v2.embedding::DOUBLE[]), 6)
                   AS sim
        FROM short s1
        JOIN short s2 ON s2.query_id = s1.query_id AND s2.cid <> s1.cid
        JOIN embeddings v1 ON v1.vec_id = s1.cid
        JOIN embeddings v2 ON v2.vec_id = s2.cid
    ),
    sel1 AS (
        SELECT query_id, cid, rel, 1 AS pick, rel AS score FROM (
            SELECT query_id, cid, rel,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, cid) AS rn
            FROM short
        ) WHERE rn = 1
    ),
    selset1 AS (SELECT query_id, cid FROM sel1)"""
    ]
    for t in range(2, _MMR_PICKS + 1):
        parts.append(
            f""",
    cand{t} AS (
        SELECT s.query_id, s.cid, s.rel,
               round({lam} * s.rel - {mu} * max(p.sim), 6) AS score
        FROM short s
        JOIN pairs p ON p.query_id = s.query_id AND p.a = s.cid
        JOIN selset{t - 1} sd
            ON sd.query_id = p.query_id AND sd.cid = p.b
        WHERE NOT EXISTS (
            SELECT 1 FROM selset{t - 1} x
            WHERE x.query_id = s.query_id AND x.cid = s.cid)
        GROUP BY s.query_id, s.cid, s.rel
    ),
    sel{t} AS (
        SELECT query_id, cid, rel, {t} AS pick, score FROM (
            SELECT query_id, cid, rel, score,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, cid) AS rn
            FROM cand{t}
        ) WHERE rn = 1
    ),
    selset{t} AS (SELECT query_id, cid FROM selset{t - 1}
                  UNION ALL SELECT query_id, cid FROM sel{t})"""
        )
    union = "\n        UNION ALL ".join(
        f"SELECT * FROM sel{t}" for t in range(1, _MMR_PICKS + 1)
    )
    parts.append(
        f"""
    SELECT query_id, CAST(pick AS INT) AS pick, cid AS neighbor_id,
           rel AS relevance, score
    FROM ({union})
    ORDER BY query_id, pick"""
    )
    return "".join(parts)


@register("mmr_diversify", oracle=_mmr_oracle())
def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D35 — maximal-marginal-relevance re-ranking (Carbonell &
    Goldstein, SIGIR'98): retrieve a top-8 shortlist per probe with
    the exact GEMM scan (D1), then greedily pick 4 results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked — the
    standard diversity re-rank between the index and the user.

    Shape (the E31/DTW lesson applied): the greedy recursion runs in
    ONE Arrow batch — each query's shortlist packs into a single row
    (collect_list over ≤ k candidates), and one mapInPandas computes
    every query's k×k sims + 4 greedy picks vectorized. A first cut
    unrolled the 4 picks as DataFrame anti-join/window steps: correct,
    but ~20 tiny broadcast jobs of pure scheduling overhead (4.4-5.9 s
    at sf0.1 for 192 candidate rows). Per-query greedy state is k
    vectors — embarrassingly parallel, no cross-query traffic — so the
    batched-Arrow form is both the fast local shape and the right
    100 TB shape (one shuffle of shortlist rows, then map-only).
    Similarities are quantized to the 1e-6 grid with the same
    shortest-repr HALF_UP rule as the JVM round before every greedy
    comparison, so the selection recursion is exact against the
    oracle's unrolled CTE chain, not approximate."""
    e = table(spark, sf_dir, "embeddings")
    shortlist = knn_brute_force(
        corpus=e,
        queries=e.where(F.col("vec_id") < _MMR_QUERIES),
        k=_MMR_SHORTLIST,
    ).select("query_id", F.col("neighbor_id").alias("cid"))
    qv = e.where(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cv = e.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    # candidate vectors attach by broadcasting the ≤ q·k-row shortlist
    # against the corpus scan — the corpus is never shuffled
    enriched = cv.join(
        F.broadcast(shortlist.join(F.broadcast(qv), "query_id")), "cid"
    )
    packed = enriched.groupBy("query_id").agg(
        F.any_value("qvec").alias("qvec"),
        F.collect_list(F.struct("cid", "cvec")).alias("cands"),
    )

    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    picks = _MMR_PICKS

    def greedy(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        grid = Decimal("0.000001")

        def r6(x: float) -> float:
            # shortest-repr HALF_UP — the JVM F.round(x, 6) rule
            return float(
                Decimal(repr(float(x))).quantize(grid, ROUND_HALF_UP)
            )

        for pdf in batches:
            rows: dict[str, list] = {
                "query_id": [], "pick": [], "neighbor_id": [],
                "relevance": [], "score": [],
            }
            for _, row in pdf.iterrows():
                q = np.asarray(row["qvec"], dtype=np.float64)
                ids = np.array([c["cid"] for c in row["cands"]])
                X = np.array(
                    [c["cvec"] for c in row["cands"]], dtype=np.float64
                )
                # zero-norm guard (ADVICE r7): cos involving a dead
                # embedding is -1.0 (the DuckDB list_cosine sentinel,
                # ranks last), never NaN (Spark ranks NaN first)
                Qn, qz = unit_rows(q.reshape(1, -1))
                qn = Qn[0]
                Xn, xz = unit_rows(X)
                rel_raw = Xn @ qn
                rel_raw[xz] = ZERO_NORM_COS
                if qz[0]:
                    rel_raw[:] = ZERO_NORM_COS
                rel = [r6(v) for v in rel_raw]
                S = Xn @ Xn.T
                S[xz, :] = ZERO_NORM_COS
                S[:, xz] = ZERO_NORM_COS
                n = len(ids)
                picked: list[int] = []
                for pick in range(1, min(picks, n) + 1):
                    if pick == 1:
                        best = min(
                            range(n), key=lambda i: (-rel[i], ids[i])
                        )
                        score = rel[best]
                    else:
                        best, score = None, None
                        for i in range(n):
                            if i in picked:
                                continue
                            pen = max(r6(S[i, p]) for p in picked)
                            sc = r6(lam * rel[i] - mu * pen)
                            if best is None or (-sc, ids[i]) < (
                                -score, ids[best]
                            ):
                                best, score = i, sc
                    picked.append(best)
                    rows["query_id"].append(row["query_id"])
                    rows["pick"].append(pick)
                    rows["neighbor_id"].append(ids[best])
                    rows["relevance"].append(rel[best])
                    rows["score"].append(score)
            yield pd.DataFrame(rows)

    return packed.mapInPandas(
        greedy,
        schema=(
            "query_id long, pick int, neighbor_id long, "
            "relevance double, score double"
        ),
    ).orderBy("query_id", "pick")


# ---------------------------------------------------------------- D36
_RRF_K = 60  # the standard RRF constant (Cormack et al., SIGIR'09)
_RRF_DEPTH = 20  # per-ranker depth fed to the fusion
_RRF_TOPK = 10  # fused results returned


def _rrf_oracle() -> str:
    from spotify_podcasts_airflow_batch_spark.plans.text3 import (
        _bm25_oracle,
    )

    return f"""
    WITH bm AS ({_bm25_oracle()}),
    lex AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM bm
        QUALIFY lex_rank <= {_RRF_DEPTH}
    ),
    vecr AS (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                   ORDER BY round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                       DESC, c.vec_id
               ) AS vec_rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = 0
        QUALIFY vec_rank <= {_RRF_DEPTH}
    ),
    fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               coalesce(l.lex_rank, 0) AS lex_rank,
               coalesce(v.vec_rank, 0) AS vec_rank,
               coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                   + coalesce(1.0 / ({_RRF_K} + v.vec_rank), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN vecr v ON v.doc_id = l.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(lex_rank AS INT) AS lex_rank,
           CAST(vec_rank AS INT) AS vec_rank,
           round(rrf, 6) AS rrf_score,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
               AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_RRF_TOPK}
    """


@register("hybrid_rrf_fusion", oracle=_rrf_oracle())
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D36 — hybrid retrieval via reciprocal-rank fusion (Cormack et
    al., SIGIR'09; the default hybrid mode in every current search
    stack): the C33 BM25 keyword ranking and a vector cosine ranking
    are fused by score = Σ 1/(60 + rank), docs appearing in either
    top-20 list, top-10 fused returned. Ranks — not raw scores — make
    the fusion scale-free, so no score normalization crosses the two
    modalities. Shape: each ranker's corpus-sized work is its existing
    operator (posting-list BM25 aggregate; D1 GEMM scan); the global
    top-20 cutoffs are TakeOrderedAndProject (distributed heap top-k,
    no single-task window over the corpus), and re-ranking + fusion
    run on ≤ 2·depth rows. Absent-in-one-list ranks surface as 0, not
    NULL — nullable ints decay to float64/NaN asymmetrically in the
    two engines' pandas bridges. 1/(60+rank) is identical rational
    arithmetic on both engines, so fused ordering is deterministic
    with the doc_id tie-break."""
    from spotify_podcasts_airflow_batch_spark.plans.text3 import bm25_search

    bm = bm25_search(spark, sf_dir)
    lex_top = bm.orderBy(F.col("bm25").desc(), "doc_id").limit(_RRF_DEPTH)
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )
    e = table(spark, sf_dir, "embeddings")
    vec = knn_brute_force(
        corpus=e, queries=e.where(F.col("vec_id") == 0), k=_RRF_DEPTH
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = (
        lex.join(vec, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")),
                    F.lit(0.0),
                )
            ).alias("rrf"),
        )
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_TOPK)
    w_f = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return top.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("vec_rank").cast("int").alias("vec_rank"),
        F.round("rrf", 6).alias("rrf_score"),
        F.row_number().over(w_f).cast("int").alias("fused_rank"),
    )
