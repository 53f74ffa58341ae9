"""PII scrub semantics on adversarial literal rows.

The catalog entry (C22 ``pii_scrub``) runs the scrub over the synthetic
corpus, which contains no PII — the oracle there checks the no-op path
and cross-engine regex compatibility. THIS file pins the actual
match/replace behavior: each family matches what it should, misses what
it shouldn't, counts are measured pre-replacement, and Spark agrees
with DuckDB's RE2 on every case.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.functions.text import (
    PII_PATTERNS,
    pii_counts,
    pii_scrub,
)

CASES = [
    # (text, expected_scrubbed, n_email, n_ip, n_phone)
    ("mail me at bob@example.com now", "mail me at <EMAIL> now", 1, 0, 0),
    ("x First.Last+tag@sub.domain.co.uk y", "x <EMAIL> y", 1, 0, 0),
    ("server at 10.0.255.3 died", "server at <IP> died", 0, 1, 0),
    ("call 555-867-5309 today", "call <PHONE> today", 0, 0, 1),
    ("call 555.867.5309 or 555 867 5309", "call <PHONE> or <PHONE>", 0, 0, 2),
    (
        "a@b.io and 1.2.3.4 and 123-456-7890",
        "<EMAIL> and <IP> and <PHONE>",
        1,
        1,
        1,
    ),
    # non-matches: bare words, partial forms, digit runs
    ("not an email: a@b, nor @host.com alone", "not an email: a@b, nor @host.com alone", 0, 0, 0),
    ("version 1.2.3 is out", "version 1.2.3 is out", 0, 0, 0),
    ("big number 1234567890", "big number 1234567890", 0, 0, 0),
    ("", "", 0, 0, 0),
    # dotted quad inside a sentence boundary; phone-shaped dotted string
    # is an IP candidate only with 4 groups — 3 groups + 4 digits is a
    # phone
    ("ping 192.168.1.100.", "ping <IP>.", 0, 1, 0),
    ("fax 123.456.7890 ok", "fax <PHONE> ok", 0, 0, 1),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    counts = pii_counts(F.col("text"))
    out = df.select(
        "id",
        pii_scrub(F.col("text")).alias("clean"),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
    ).collect()
    return {r["id"]: r for r in out}


def test_scrub_and_counts(scrubbed):
    for i, (text, want, n_email, n_ip, n_phone) in enumerate(CASES):
        row = scrubbed[i]
        assert row["clean"] == want, f"case {i}: {text!r}"
        assert row["n_email"] == n_email, f"case {i}: {text!r}"
        assert row["n_ip"] == n_ip, f"case {i}: {text!r}"
        assert row["n_phone"] == n_phone, f"case {i}: {text!r}"


def test_duckdb_re2_agrees(scrubbed):
    """The same patterns under DuckDB's RE2 produce the same scrub —
    the cross-engine compatibility the C22 oracle relies on, exercised
    on text that actually matches."""
    con = duckdb.connect()
    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    for i, (text, want, *_counts) in enumerate(CASES):
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS text)", [text]
        ).fetchone()[0]
        assert got == want, f"case {i}: {text!r}"
        for (kind, pat, _), n_want in zip(PII_PATTERNS, _counts):
            n_got = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()[0]
            assert n_got == n_want, f"case {i} {kind}: {text!r}"
