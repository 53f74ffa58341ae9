"""Property tests for the dedup operators on planted duplicates —
the recall the oracle can't check (C6b LSH pair generation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest where nobody ever goes at night"
    )
    near = base.replace("quick", "fast")  # 1-word edit → high jaccard
    other = (
        "completely different content about spark query engines and "
        "distributed columnar storage with vectorized execution plans"
    )
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, near),          # near dup of 1
        (4, other),
        (5, "tiny doc"),    # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark):
    groups = exact_dedup_groups(_docs(spark), "doc_id", "text").collect()
    by_rep = {r.rep_id: r.n_dupes for r in groups}
    assert by_rep[1] == 2  # docs 1,2 collapse
    assert by_rep[3] == 1 and by_rep[4] == 1


def test_minhash_lsh_finds_planted_near_dup(spark):
    sig = minhash_signatures(_docs(spark), "doc_id", "text")
    # identical docs → identical signatures
    rows = {r.doc_id: [r[f"h{i}"] for i in range(16)] for r in sig.collect()}
    assert rows[1] == rows[2]
    assert 5 not in rows  # no shingles → no signature
    pairs = lsh_candidate_pairs(sig, "doc_id").collect()
    found = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert found[(1, 2)] == 1.0           # exact dup: all bands collide
    assert (1, 3) in found or (2, 3) in found  # near dup caught by ≥1 band
    assert all(p != (1, 4) and p != (2, 4) for p in found)


def test_jaccard_pairs_threshold(spark):
    docs = _docs(spark).withColumn("blk", F.lit("x"))
    pairs = jaccard_pairs(
        docs, "doc_id", "text", block_cols=["blk"], shingle_k=2, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert found[(1, 2)] == 1.0
    assert 0.5 <= found[(1, 3)] < 1.0
    assert not any(4 in p for p in found)


def test_simhash_hamming_locality(spark):
    sh = {r.doc_id: r.simhash for r in simhash(_docs(spark), "doc_id", "text").collect()}
    assert sh[1] == sh[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[3]) < hamming(sh[1], sh[4])


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_capped_lsh_equals_uncapped_on_bounded_buckets(spark):
    """cap >= the largest bucket evicts nothing → identical pairs."""
    sig = minhash_signatures(_docs(spark), "doc_id", "text")
    uncapped = lsh_candidate_pairs(sig, "doc_id")
    capped = lsh_candidate_pairs(sig, "doc_id", max_bucket=1 << 20)
    assert _rows(uncapped) == _rows(capped)


def test_capped_lsh_bounds_hot_bucket_pairs(spark):
    """50 identical docs collapse into one bucket per band (the
    boilerplate pathology): uncapped volume is C(50,2)=1225 pairs,
    the cap=8 plan must emit exactly C(8,2)=28 — quadratic blowup
    contained to C(cap,2) in every band."""
    boiler = "all work and no play makes jack a dull boy " * 4
    rows = [(i, boiler) for i in range(50)] + [
        (100, "some genuinely unique document text that stands alone here")
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = minhash_signatures(docs, "doc_id", "text")
    uncapped = lsh_candidate_pairs(sig, "doc_id").count()
    capped = lsh_candidate_pairs(sig, "doc_id", max_bucket=8).count()
    assert uncapped == 50 * 49 // 2
    # per-bucket selection hashes (band_id, band_hash, id), so each of
    # the 4 bands keeps a DIFFERENT 8-member subset — per-task pair
    # volume is C(8,2) per bucket, the distinct union at most 4×C(8,2)
    assert 8 * 7 // 2 <= capped <= 4 * (8 * 7 // 2)
