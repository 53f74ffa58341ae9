"""C60 — encoding-quality screen: the synthetic corpus is pure ASCII
(every rate is zero there, verified by the oracle suite), so the
counting logic is exercised here on a constructed relation with
planted mojibake, control characters, and non-ASCII text — strict
against the same DuckDB oracle."""

from __future__ import annotations

import duckdb

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries


def test_encoding_screen_counts_planted_artifacts(spark, tmp_path):
    rows = [
        # clean ASCII doc
        (1, "the quick brown fox jumps over the lazy dog", "en", "clean", 44),
        # mojibake: UTF-8 é decoded as Latin-1 -> 'Ã©', plus 'â€™'
        (2, "cafÃ© reÃ©sumÃ© itâ€™s broken", "en", "moji", 30),
        # replacement character
        (3, "lost � bytes � here", "en", "moji", 20),
        # control characters
        (4, "bell\x07 and null-ish\x01 controls", "en", "ctrl", 29),
        # genuine non-ASCII (accents + CJK) — NOT mojibake
        (5, "héllo wörld 你好世界 café", "fr", "intl", 22),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)

    q = all_queries()["encoding_quality_screen"]
    got = {
        r.source: (r.n_docs, r.non_ascii_per_10k, r.control_per_10k,
                   r.mojibake_docs)
        for r in q.spark_fn(spark, str(tmp_path)).collect()
    }
    # the clean source has zero everything
    assert got["clean"] == (1, 0, 0, 0)
    # both mojibake docs are flagged; 'Ã'/'â'/'Â'/'�' are themselves
    # non-ASCII so the rate is positive too
    assert got["moji"][0] == 2 and got["moji"][3] == 2
    assert got["moji"][1] > 0
    # control chars counted, doc not mojibake-flagged
    assert got["ctrl"][2] > 0 and got["ctrl"][3] == 0
    # genuine international text: high non-ASCII, no mojibake flag
    assert got["intl"][1] > 1000 and got["intl"][3] == 0

    # strict cross-engine: DuckDB oracle on the same parquet
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    srows = sorted(
        tuple(str(x) for x in r)
        for r in q.spark_fn(spark, str(tmp_path)).collect()
    )
    orows = sorted(
        tuple(str(x) for x in r) for r in con.execute(q.oracle).fetchall()
    )
    assert srows == orows
