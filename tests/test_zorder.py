"""G — z-order clustered layout: per-file bounding boxes are tight in
BOTH cluster dimensions, unlike a lexicographic sort which only skips
on its leading column."""

from __future__ import annotations

import glob

import duckdb

from spotify_podcasts_airflow_batch_spark.sinks.writers import (
    write_sorted_layout,
    write_zorder_layout,
)
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def _file_boxes(path: str, cols: tuple[str, str]):
    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        row = duckdb.sql(
            f"SELECT min({cols[0]}), max({cols[0]}), min({cols[1]}), max({cols[1]}) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        boxes.append(row)
    return boxes


def _mean_frac(boxes, lo_idx, hi_idx, span):
    return sum((b[hi_idx] - b[lo_idx]) / span for b in boxes) / len(boxes)


def test_zorder_boxes_tight_in_both_dims(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    lo_u, hi_u, lo_v, hi_v = ev.selectExpr(
        "min(user_id)", "max(user_id)", "min(value)", "max(value)"
    ).collect()[0]
    span_u, span_v = (hi_u - lo_u) or 1, (hi_v - lo_v) or 1.0

    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lex")
    write_zorder_layout(ev, zpath, ["user_id", "value"], files=8, bits=6)
    write_sorted_layout(ev, lpath, ["user_id", "value"], files=8)

    zboxes = _file_boxes(zpath, ("user_id", "value"))
    lboxes = _file_boxes(lpath, ("user_id", "value"))
    assert len(zboxes) == 8 and len(lboxes) == 8

    # lexicographic: leading column tight, second column spans most of
    # the domain (not quite 1.0 — the value distribution is skewed, so
    # per-file maxima wander)
    assert _mean_frac(lboxes, 0, 1, span_u) < 0.5
    assert _mean_frac(lboxes, 2, 3, span_v) > 0.6
    # z-order: BOTH dimensions bounded
    assert _mean_frac(zboxes, 0, 1, span_u) < 0.8
    assert _mean_frac(zboxes, 2, 3, span_v) < 0.8
    # and the second dimension skips far better than lexicographic
    assert _mean_frac(zboxes, 2, 3, span_v) < 0.9 * _mean_frac(
        lboxes, 2, 3, span_v
    )

    # no rows lost
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{zpath}/*.parquet')").fetchone()[0]
    assert n == ev.count()
