"""SURVEY.md §2 ↔ registry consistency: every backticked `query key`
in the §2 inventory tables must be a registered query, and every
registered query must appear in §2 — the coverage checklist can never
drift from the code.
"""

from __future__ import annotations

import os
import re

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries

SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")

# §2 table rows look like: | C21 | `dup_segments` | ... |
ROW = re.compile(r"^\|\s*[A-G]\d+[a-z]?\s*\|\s*`([a-z0-9_]+)`\s*\|", re.M)

# rows that are deliberately test-only (no catalog entry)
TEST_ONLY = {"streaming runtime"}


def _survey_keys() -> set[str]:
    with open(SURVEY) as f:
        text = f.read()
    sec2 = text.split("## §2")[1].split("## §3")[0]
    return set(ROW.findall(sec2))


def test_every_survey_key_is_registered():
    missing = _survey_keys() - set(all_queries())
    assert not missing, f"SURVEY §2 keys with no registry entry: {missing}"


def test_every_registered_query_is_in_survey():
    undocumented = set(all_queries()) - _survey_keys()
    assert not undocumented, (
        f"registered queries missing from SURVEY §2: {undocumented}"
    )


def test_survey_codes_are_unique():
    """§2 row codes (A1..F9, keyed or not) must be unique — the F6/F7
    runtime-stub rows once shadowed the media_dedup/media_chunk_plan
    codes (VERDICT r8 item 5)."""
    with open(SURVEY) as f:
        text = f.read()
    sec2 = text.split("## §2")[1].split("## §3")[0]
    codes = re.findall(r"^\|\s*([A-G]\d+[a-z]?)\s*\|", sec2, re.M)
    dupes = {c for c in codes if codes.count(c) > 1}
    assert not dupes, f"duplicate SURVEY §2 codes: {sorted(dupes)}"


def test_prose_catalog_counts_match_registry():
    """Narrative sentences like "widened the catalog to 257" drifted
    from the table once (VERDICT r6 item 5). The catalog only grows,
    so the LARGEST "catalog to/of N" claim is the current one — pin it
    to the real registry size (smaller claims are historical prose)."""
    with open(SURVEY) as f:
        text = f.read()
    n = len(all_queries())
    claims = [int(c) for c in re.findall(r"catalog (?:to|of|at) (\d+)", text)]
    assert claims, "SURVEY prose never states the catalog size"
    assert max(claims) == n, (
        f"SURVEY prose's latest catalog claim is {max(claims)}, "
        f"registry has {n}"
    )
