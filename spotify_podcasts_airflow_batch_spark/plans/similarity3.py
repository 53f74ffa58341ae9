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

from spotify_podcasts_airflow_batch_spark.functions.vectors import cosine
from spotify_podcasts_airflow_batch_spark.operators.similarity import (
    knn_brute_force,
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
    cos = F.col("ab") / F.sqrt(F.col("aa") * F.col("bb"))
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
    standard diversity re-rank between the index and the user. The
    greedy loop is a FIXED pick count unrolled as four DataFrame
    steps (argmax via per-query row_number windows, set-membership
    via broadcast anti-joins), mirrored exactly by an unrolled CTE
    chain in the oracle. Corpus-sized cost is retrieval only; the
    re-rank touches shortlist²-per-query rows (≤ q·k² = 192 here), so
    at 100 TB MMR adds nothing to the scan and everything here is a
    broadcast join on driver-bounded relations. All similarities are
    rounded to 6 dp before scoring, so both engines run identical
    IEEE arithmetic through the greedy recursion — equality is exact,
    not approximate."""
    e = table(spark, sf_dir, "embeddings")
    shortlist = knn_brute_force(
        corpus=e,
        queries=e.where(F.col("vec_id") < _MMR_QUERIES),
        k=_MMR_SHORTLIST,
    ).select("query_id", F.col("neighbor_id").alias("cid"))
    # Re-derive relevance at the re-ranker's 6-dp working precision
    # (knn_brute_force reports 4 dp) on the ≤ q·k-row shortlist.
    qv = e.where(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cv = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    short = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "cid")
        .select(
            "query_id",
            "cid",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("rel"),
            "cvec",
        )
    )
    s1 = short.alias("s1")
    s2 = short.alias("s2")
    pairs = (
        s1.join(
            s2,
            (F.col("s1.query_id") == F.col("s2.query_id"))
            & (F.col("s1.cid") != F.col("s2.cid")),
        )
        .select(
            F.col("s1.query_id").alias("query_id"),
            F.col("s1.cid").alias("a"),
            F.col("s2.cid").alias("b"),
            F.round(cosine(F.col("s1.cvec"), F.col("s2.cvec")), 6).alias(
                "sim"
            ),
        )
    )
    short = short.drop("cvec")
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("cid")
    )
    sel = (
        short.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "cid",
            "rel",
            F.lit(1).alias("pick"),
            F.col("rel").alias("score"),
        )
    )
    picked = sel.select("query_id", "cid")
    out = [sel]
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    for t in range(2, _MMR_PICKS + 1):
        cand = (
            short.join(picked, ["query_id", "cid"], "anti")
            .join(
                pairs.join(
                    picked.select(
                        "query_id", F.col("cid").alias("b")
                    ),
                    ["query_id", "b"],
                ).select("query_id", F.col("a").alias("cid"), "sim"),
                ["query_id", "cid"],
            )
            .groupBy("query_id", "cid", "rel")
            .agg(
                F.round(
                    F.lit(lam) * F.col("rel") - F.lit(mu) * F.max("sim"), 6
                ).alias("score")
            )
        )
        wt = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("cid")
        )
        sel = (
            cand.withColumn("rn", F.row_number().over(wt))
            .where(F.col("rn") == 1)
            .select("query_id", "cid", "rel", F.lit(t).alias("pick"), "score")
        )
        picked = picked.unionByName(sel.select("query_id", "cid"))
        out.append(sel)
    result = out[0]
    for s in out[1:]:
        result = result.unionByName(s)
    return result.select(
        "query_id",
        F.col("pick").cast("int").alias("pick"),
        F.col("cid").alias("neighbor_id"),
        F.col("rel").alias("relevance"),
        "score",
    ).orderBy("query_id", "pick")
