"""Empty-input robustness: every catalog query must run on 0-row tables.

At 100 TB, empty inputs are routine — a partition-pruned date range, a
filter that matches nothing, a new tenant with no history. A plan that
works only when rows exist hides a driver-side contraction that crashes
on the degenerate case (np.stack([]) is 1-D, .first() is None, ...).
This sweep runs the FULL registry against a directory of 0-row parquet
files with the production schemas; any query that raises fails the test.
Row counts are not asserted — a 0-row input can legitimately produce
rows (e.g. dq_expectations emits one row per check) — only that the
plan compiles and executes.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        schema = pq.read_schema(f)
        pq.write_table(
            schema.empty_table().cast(schema),
            os.path.join(out, os.path.basename(f)),
        )
    return str(out)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    from spotify_podcasts_airflow_batch_spark.plans.registry import (
        all_queries,
    )

    failures = []
    for name, q in all_queries().items():
        try:
            q.spark_fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: "
                            f"{str(ex).splitlines()[0][:160]}")
        finally:
            spark.catalog.clearCache()
    assert not failures, "queries crashed on empty input:\n" + "\n".join(
        failures
    )


def test_kappa_matches_oracle_on_empty_corpus(spark, empty_sf_dir):
    """rater_agreement_kappa divides by n: on a 0-row documents slice
    plain double division is NaN on Spark but NULL on DuckDB (ADVICE
    r7) — the try_divide form must make the one emitted row NULL-equal
    across engines, not just not-crash."""
    import duckdb

    from spotify_podcasts_airflow_batch_spark.plans.registry import (
        all_queries,
    )
    from tests.test_queries_oracle import _spark_pdf, canon_pdf

    q = all_queries()["rater_agreement_kappa"]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(empty_sf_dir, "*.parquet")):
        t = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    sdf = _spark_pdf(q.spark_fn(spark, empty_sf_dir))
    odf = con.execute(q.oracle).df()
    assert canon_pdf(sdf, "rater_agreement_kappa") == canon_pdf(
        odf, "rater_agreement_kappa"
    )
