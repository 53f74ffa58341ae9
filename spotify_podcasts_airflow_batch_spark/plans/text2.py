"""Text analysis, part 2 (LLM-training-data pipeline signals): BPE-ish
regex token counting, winnowing (rolling-hash) fingerprints, corpus
vocabulary / document frequency, and intra-document repetition — the
Gopher/C4-style quality measures a 100 TB text pipeline filters on.

All built-in column functions (regexp_extract_all + higher-order array
ops) — no Python in the hot path; every formula is mirrored by its
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.functions.hashing import (
    MERSENNE_31,
    md5_hash31,
)
from spotify_podcasts_airflow_batch_spark.functions.text import tokens
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table

_TOKS = r"string_split_regex(trim(text), '\s+')"

# GPT-2-style pre-tokenizer, simplified to the character classes the
# corpus contains: letter runs, digit runs, single other glyphs.
_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(b)                AS n_bpe_tokens,
           len(list_distinct(b)) AS n_distinct_bpe,
           len({_TOKS})          AS n_ws_tokens,
           round(length(text) / greatest(len(b), 1), 4) AS chars_per_token
    FROM (
        SELECT doc_id, text,
               regexp_extract_all(text, '{_BPE_PATTERN}') AS b
        FROM documents
    ) t
    """,
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 — BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (letter runs / digit runs / single punctuation) versus the
    whitespace count, plus chars-per-token (the compression-ratio
    signal used to spot boilerplate/garbage). One codegen projection,
    no shuffle."""
    d = table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "text",
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0)).alias(
            "__bpe"
        ),
        tokens(F.col("text")).alias("__toks"),
    )
    nb = F.size("__bpe")
    return staged.select(
        "doc_id",
        nb.alias("n_bpe_tokens"),
        F.size(F.array_distinct("__bpe")).alias("n_distinct_bpe"),
        F.size("__toks").alias("n_ws_tokens"),
        F.round(F.length("text") / F.greatest(nb, F.lit(1)), 4).alias(
            "chars_per_token"
        ),
    )


_WINNOW_K = 3  # tokens per gram
_WINNOW_W = 4  # grams per winnowing window


@register(
    "winnow_fingerprint",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS w FROM documents
    ), grams AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(w) - {_WINNOW_K - 1}, 0) + 1),
                              i -> array_to_string(w[i:i + {_WINNOW_K - 1}], ' ')) AS g
        FROM toks
    ), hashes AS (
        SELECT doc_id,
               list_transform(g, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                                      & {MERSENNE_31}) AS hs
        FROM grams
    ), wins AS (
        SELECT doc_id,
               list_distinct(
                   list_transform(range(0, greatest(len(hs) - {_WINNOW_W}, 0) + 1),
                                  j -> list_aggregate(hs[j + 1:j + {_WINNOW_W}],
                                                      'min'))) AS fps
        FROM hashes
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM wins
    """,
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    MOSS): hash every k-token gram, slide a w-gram window, keep each
    window's minimum, emit the distinct set. The classic 'rolling' hash
    is an imperative micro-optimization; declaratively each gram hashes
    independently (same fingerprint set) so the whole thing stays in
    one codegen projection + explode — no shuffle until a consumer
    groups by fingerprint. Guarantees a match for any shared run of
    k+w-1 tokens, the property substring-dedup at corpus scale needs."""
    d = table(spark, sf_dir, "documents", fan_out=True)
    toks = d.select("doc_id", tokens(F.col("text")).alias("__toks"))
    n = F.size("__toks")
    grams = toks.select(
        "doc_id",
        F.when(
            n >= _WINNOW_K,
            F.transform(
                F.sequence(F.lit(0), n - _WINNOW_K),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("__toks"), i + 1, _WINNOW_K)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__grams"),
    )
    hashes = grams.select(
        "doc_id",
        F.transform(F.col("__grams"), lambda g: md5_hash31(g)).alias("__hs"),
    )
    m = F.size("__hs")
    wins = hashes.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(m - _WINNOW_W, F.lit(0))),
                lambda j: F.array_min(F.slice(F.col("__hs"), j + 1, _WINNOW_W)),
            )
        ).alias("__fps"),
    )
    return (
        wins.select("doc_id", F.explode_outer("__fps").alias("fingerprint"))
        .where(F.col("fingerprint").isNotNull())
    )


@register(
    "token_doc_freq",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    )
    SELECT token, count(*) AS doc_freq,
           round(ln(n_docs / count(*)), 4) AS idf
    FROM t, n
    GROUP BY token, n_docs
    HAVING count(*) >= 10
    """,
)
def token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — corpus vocabulary with document frequency + IDF (tokens in
    ≥10 docs). Distinct-per-doc explode then count: the shuffle key is
    the token, so hot tokens spread across reducers only as far as
    map-side partial counts allow — at 100 TB the partial aggregation
    reduces each (map task, token) to one long before the shuffle. The
    corpus size joins in as a 1-row broadcast, never a driver round
    trip."""
    d = table(spark, sf_dir, "documents")
    n_docs = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .where(F.col("doc_freq") >= 10)
        .join(n_docs)
        .select(
            "token",
            "doc_freq",
            F.round(F.log(F.col("n_docs") / F.col("doc_freq")), 4).alias("idf"),
        )
    )


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), c AS (
        SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(1 - count(*) / sum(cnt), 4) AS rep_ratio,
           round(max(cnt) / sum(cnt), 4)     AS top_ratio
    FROM c
    GROUP BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — intra-document repetition (Gopher-style quality signal):
    duplicate-token ratio and most-frequent-token share. Two hash
    aggregations keyed by (doc, token) then doc — both map-side
    combinable, so the shuffled volume is bounded by per-doc vocabulary,
    not token count."""
    d = table(spark, sf_dir, "documents", fan_out=True)
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(1 - F.count(F.lit(1)) / F.sum("cnt"), 4).alias("rep_ratio"),
        F.round(F.max("cnt") / F.sum("cnt"), 4).alias("top_ratio"),
    )


@register(
    "doc_chunk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS w FROM documents
    ), idx AS (
        SELECT doc_id, w, unnest(range((len(w) - 1) // 48 + 1)) AS i
        FROM toks WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT)                          AS chunk_idx,
           len(w[i * 48 + 1 : i * 48 + 64])           AS n_tokens,
           md5(array_to_string(w[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_hash
    FROM idx
    """,
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29 — context-window chunking: split each document into
    overlapping 64-token windows with stride 48 (the embed/index unit
    of a RAG or training pipeline; C18 packs whole docs, this SPLITS
    long ones). Entirely JVM-side: tokenization once, a sequence of
    chunk starts exploded, per-chunk slice + hash — no Python, no
    shuffle at all (pure per-row expansion; Expand/Generate fuses into
    the scan stage). Output carries the chunk hash, not the text, so
    the result stays narrow at 100 TB."""
    W, S = 64, 48
    docs = table(spark, sf_dir, "documents", fan_out=True)
    # blank docs tokenize to []: guard BEFORE the sequence — Spark's
    # sequence(0, -1) would take its implicit -1 step and emit [0, -1],
    # and DuckDB's range((0-1)//48+1) truncates toward zero to [0];
    # with the guard both engines agree on zero chunks.
    staged = (
        docs.select("doc_id", tokens(F.col("text")).alias("w"))
        .where(F.size("w") > 0)
        .withColumn(
            "i",
            F.explode(F.sequence(F.lit(0), F.floor((F.size("w") - 1) / S))),
        )
    )
    chunk = F.slice(F.col("w"), F.col("i") * S + 1, W)
    return staged.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# ---------------------------------------------------------------- C50
_BP_PREFIX_K = 5  # tokens in the boilerplate prefix key


@register(
    "boilerplate_prefix",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    p AS (
        SELECT doc_id, source,
               array_to_string(w[1:{_BP_PREFIX_K}], ' ') AS prefix
        FROM t WHERE len(w) >= {_BP_PREFIX_K}
    ),
    g AS (
        SELECT source, prefix,
               count(*) AS n_docs,
               min(doc_id) AS example_doc
        FROM p GROUP BY 1, 2
    ),
    tot AS (SELECT source, count(*) AS n_source_docs FROM p GROUP BY source)
    SELECT g.source, g.prefix, g.n_docs, g.example_doc,
           CAST(floor(10000.0 * g.n_docs / tot.n_source_docs) AS BIGINT)
               AS share_bp
    FROM g JOIN tot USING (source)
    WHERE g.n_docs >= 2
    """,
)
def boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50 — boilerplate detection by shared document prefix: within
    each source, documents opening with the identical first-5-token
    prefix (headers, templates, nav chrome — the stuff C4's whole-doc
    fingerprint misses because the bodies differ). The pretraining
    cleanup this feeds: prefixes above a share threshold get stripped
    corpus-wide.

    One tokenize + prefix projection, one map-side-combined rollup
    keyed by (source, prefix) — shuffle volume is |distinct prefixes|,
    not corpus tokens. share_bp is a single integer-ratio division,
    floor'd to basis points — engine-exact."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", tokens(F.col("text")).alias("__toks"))
    p = toks.where(F.size("__toks") >= _BP_PREFIX_K).select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice("__toks", 1, _BP_PREFIX_K)).alias("prefix"),
    )
    g = p.groupBy("source", "prefix").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("example_doc"),
    )
    tot = p.groupBy("source").agg(F.count(F.lit(1)).alias("n_source_docs"))
    return (
        g.join(tot, "source")
        .where(F.col("n_docs") >= 2)
        .select(
            "source",
            "prefix",
            "n_docs",
            "example_doc",
            F.floor(
                10000.0 * F.col("n_docs") / F.col("n_source_docs")
            ).alias("share_bp"),
        )
    )


# ---------------------------------------------------------------- C51
@register(
    "dedup_rate_by_source",
    oracle="""
    WITH g AS (
        SELECT source, md5(lower(trim(text))) AS fp, count(*) AS n
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           count(*) AS n_unique,
           CAST(sum(n) - count(*) AS BIGINT) AS n_dup_docs,
           CAST(floor(10000.0 * (sum(n) - count(*)) / sum(n)) AS BIGINT)
               AS dup_frac_bp
    FROM g GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C51 — duplication rate per source: the corpus-health rollup of
    C4's exact dedup (which source is feeding us copies?). Drives the
    ingest decision a crawl pipeline makes weekly: a source whose
    dup_frac spikes gets throttled or re-crawled.

    Two nested map-side-combinable aggregates over one scan: the
    (source, fingerprint) rollup collapses duplicates before the
    shuffle, then the per-source stats are |sources| rows. Integer
    counts; the one float op is a single floor'd division —
    engine-exact at any scale."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy(
        "source", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    ).agg(F.count(F.lit(1)).alias("n"))
    return g.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_dup_docs"),
        F.floor(
            10000.0
            * (F.sum("n") - F.count(F.lit(1)))
            / F.sum("n")
        ).alias("dup_frac_bp"),
    )


# ---------------------------------------------------------------- C53
@register(
    "tokenizer_fertility",
    oracle=f"""
    WITH per AS (
        SELECT lang, source,
               len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS nb,
               len({_TOKS})                                    AS nw,
               length(text)                                    AS nc
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT)                    AS n_docs,
           CAST(sum(nb) AS BIGINT)                     AS total_bpe_tokens,
           CAST(sum(nw) AS BIGINT)                     AS total_ws_tokens,
           CAST(sum(nb) * 10000 // greatest(sum(nw), 1)
                AS BIGINT)                             AS fertility_bp,
           CAST(sum(nc) * 100 // greatest(sum(nb), 1)
                AS BIGINT)                             AS chars_per_100_bpe
    FROM per GROUP BY lang, source
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C53 — tokenizer fertility by (lang, source): BPE-ish tokens per
    whitespace word (basis points) and chars per 100 BPE tokens. THE
    number compared when choosing a tokenizer for a multilingual
    corpus — high fertility on a language means its text costs more
    sequence length per word, skewing both training cost estimates and
    the token-budget mixture (C42/C19 consume exactly these ratios).

    One codegen projection (regexp token counts, no arrays survive the
    map side) into a (lang, source)-keyed partial aggregate — the
    shuffle carries |langs|x|sources| rows of integer counters. Ratios
    are exact integer div on the summed counters: no float division,
    no cross-engine rounding surface, any SF."""
    d = table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        "source",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0))
        ).alias("nb"),
        F.size(tokens(F.col("text"))).alias("nw"),
        F.length("text").alias("nc"),
    )
    return per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("total_bpe_tokens"),
        F.sum("nw").alias("total_ws_tokens"),
        F.expr("sum(nb) * 10000 div greatest(sum(nw), 1)").alias(
            "fertility_bp"
        ),
        F.expr("sum(nc) * 100 div greatest(sum(nb), 1)").alias(
            "chars_per_100_bpe"
        ),
    )


# ---------------------------------------------------------------- C60
_ENC_NON_ASCII = r"[^\x00-\x7F]"
_ENC_CONTROL = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
_ENC_MOJIBAKE = r"(Ã.|â€.|Â.|�)"

_ENC_ORACLE = rf"""
    WITH per_doc AS (
        SELECT source,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(
                   text, '{_ENC_NON_ASCII}', '', 'g')) AS non_ascii,
               length(text) - length(regexp_replace(
                   text, '{_ENC_CONTROL}', '', 'g')) AS ctrl,
               CASE WHEN regexp_matches(text, '{_ENC_MOJIBAKE}')
                    THEN 1 ELSE 0 END AS mojibake
        FROM documents WHERE length(text) > 0
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(non_ascii) * 10000 // sum(n_chars) AS BIGINT)
               AS non_ascii_per_10k,
           CAST(sum(ctrl) * 10000 // sum(n_chars) AS BIGINT)
               AS control_per_10k,
           CAST(sum(mojibake) AS BIGINT) AS mojibake_docs
    FROM per_doc GROUP BY source
"""


@register("encoding_quality_screen", oracle=_ENC_ORACLE)
def encoding_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C60 — encoding-QA screen per source: non-ASCII and control-
    character rates per 10k characters plus mojibake-infected doc
    counts (UTF-8-decoded-as-Latin-1 digraphs 'Ã·' / 'â€¦' / 'Â·' and
    U+FFFD replacement chars) — the crawl-hygiene pass CCNet-style
    pipelines run before language ID, since a mis-decoded shard poisons
    every downstream text statistic. Non-ASCII rate doubles as a
    language profile (CJK/accented sources sit far above en).

    Character-class counts come from length-after-strip (one
    regexp_replace per class, JVM-side, whole-stage codegen); rates
    are exact integer divisions (count·10⁴ div chars) so the oracle
    compares strict. One map-side-combinable rollup — no shuffle
    beyond the |sources|-row aggregate at any scale."""
    d = table(spark, sf_dir, "documents").where(F.length("text") > 0)

    def strip_count(pattern: str):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pattern, "")
        )

    per = d.select(
        "source",
        F.length("text").alias("n_chars"),
        strip_count(_ENC_NON_ASCII).alias("non_ascii"),
        strip_count(_ENC_CONTROL).alias("ctrl"),
        F.when(
            F.col("text").rlike(_ENC_MOJIBAKE), 1
        ).otherwise(0).alias("mojibake"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(non_ascii) * 10000 div sum(n_chars)").alias(
            "non_ascii_per_10k"
        ),
        F.expr("sum(ctrl) * 10000 div sum(n_chars)").alias(
            "control_per_10k"
        ),
        F.sum("mojibake").alias("mojibake_docs"),
    )
