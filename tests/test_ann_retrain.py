"""ANN retrain + blue/green cutover (plans/similarity4.py, SURVEY §2
D44/D44b): retrain-on-live ≡ a fresh build of the live corpus,
pointer-swap atomicity (reader sees old or new, never a mix), the old
version kept for rollback, and the degenerate corners of the new verb
(all-tombstoned base, corpus smaller than the codebook k)."""

from __future__ import annotations

import json
import os
import threading

import pyspark.sql.functions as F

from spotify_podcasts_airflow_batch_spark.plans.similarity4 import (
    _INC_TOMB_MOD,
    _INC_WAVES,
    _load_artifacts,
    ann_staleness_recall,
    build_base_store,
    incremental_live_index,
    ivfpq_incremental_store,
    ivfpq_retrained_recall,
    ivfpq_retrained_served,
    ivfpq_retrained_store,
    read_current_pointer,
    retrain_store,
    tombstone_ids,
    write_current_pointer,
)
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def _emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _live(spark, sf_dir):
    return _emb(spark, sf_dir).where(
        ~(
            (F.col("vec_id") % _INC_WAVES == 0)
            & (F.col("vec_id") % _INC_TOMB_MOD == 0)
        )
    )


def _content(spark, root):
    return {
        (r.vec_id, tuple(r.codes), r.cell_id)
        for r in incremental_live_index(spark, root).collect()
    }


def test_retrained_store_equals_fresh_live_build(spark, sf_dir, tmp_path):
    """The cutover store must be bit-identical to training a brand-new
    store on the live corpus — same artifacts, same encoded rows."""
    cur = ivfpq_retrained_store(spark, sf_dir)
    ref = str(tmp_path / "fresh_live")
    build_base_store(spark, sf_dir, _live(spark, sf_dir), ref)
    with open(os.path.join(cur, "artifacts.json")) as fh:
        got_art = json.load(fh)
    with open(os.path.join(ref, "artifacts.json")) as fh:
        want_art = json.load(fh)
    assert got_art == want_art
    assert _content(spark, cur) == _content(spark, ref)
    # and the retrained artifacts differ from the frozen day-0 ones
    # (the staleness the retrain exists to pay down)
    base_cents, base_cells = _load_artifacts(
        ivfpq_incremental_store(spark, sf_dir)
    )
    assert (got_art["cents"], got_art["cells"]) != (base_cents, base_cells)


def test_cutover_keeps_blue_for_rollback(spark, sf_dir):
    """After the green cutover the blue (incremental) store is intact,
    and rollback is ONE pointer write."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity4 import (
        _store_is_valid,
    )

    cur = ivfpq_retrained_store(spark, sf_dir)
    vroot = os.path.dirname(cur)
    assert os.path.basename(cur) == "v001"
    blue = ivfpq_incremental_store(spark, sf_dir)
    assert _store_is_valid(blue)
    try:
        write_current_pointer(vroot, blue)
        assert read_current_pointer(vroot) == blue
        assert ivfpq_retrained_store(spark, sf_dir) == blue
    finally:
        write_current_pointer(vroot, cur)
    assert ivfpq_retrained_store(spark, sf_dir) == cur


def test_pointer_swap_atomic_under_concurrent_reads(tmp_path):
    """A reader racing 500 swaps sees only complete pointers — old or
    new, never a torn value — and no temp file survives."""
    vroot = str(tmp_path / "vroot")
    a, b = "/stores/blue", "/stores/green"
    write_current_pointer(vroot, a)
    seen: set = set()
    errs: list = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            p = read_current_pointer(vroot)
            seen.add(p)
            if p not in (a, b):
                errs.append(p)

    t = threading.Thread(target=reader)
    t.start()
    for i in range(500):
        write_current_pointer(vroot, b if i % 2 == 0 else a)
    stop.set()
    t.join()
    assert not errs
    assert seen <= {a, b} and seen
    assert not os.path.exists(os.path.join(vroot, ".CURRENT.tmp"))


def test_retrain_all_tombstoned_base(spark, sf_dir, tmp_path):
    """Retraining a store whose rows are ALL tombstoned yields a valid
    empty store (artifacts recorded, nothing encoded) — not a crash."""
    root = str(tmp_path / "dead_store")
    base = _emb(spark, sf_dir).where(F.col("vec_id") % _INC_WAVES == 0)
    build_base_store(spark, sf_dir, base, root)
    tombstone_ids(spark, root, base.select("vec_id"))
    out = str(tmp_path / "dead_retrained")
    retrain_store(spark, sf_dir, root, out)
    cents, cells = _load_artifacts(out)
    assert not cells  # nothing alive to train on
    assert not os.path.isdir(os.path.join(out, "segments"))


def test_retrain_corpus_smaller_than_codebook_k(spark, sf_dir, tmp_path):
    """Retrain on a live corpus smaller than the PQ seed count (16)
    must still produce a servable store over every live row."""
    root = str(tmp_path / "tiny_store")
    base = _emb(spark, sf_dir).where(F.col("vec_id") < 5)
    build_base_store(spark, sf_dir, base, root)
    out = str(tmp_path / "tiny_retrained")
    retrain_store(spark, sf_dir, root, out)
    cents, cells = _load_artifacts(out)
    assert cents and cents[0] and cells
    got = incremental_live_index(spark, out)
    assert {r.vec_id for r in got.collect()} == {0, 1, 2, 3, 4}


def test_retrain_uplift_vs_staleness_dial(spark, sf_dir):
    """D44b against D40: retraining on the live corpus must not LOSE
    recall versus serving appends on the frozen day-0 artifacts (the
    uplift the retrain pays for)."""
    stale = {
        r.query_id: r.recall_bp
        for r in ann_staleness_recall(spark, sf_dir).collect()
    }
    fresh = {
        r.query_id: r.recall_bp
        for r in ivfpq_retrained_recall(spark, sf_dir).collect()
    }
    assert set(fresh) == set(stale) and fresh
    assert sum(fresh.values()) >= sum(stale.values())


def test_retrained_serve_prunes_partitions(spark, sf_dir):
    """The retrained store keeps the 100 TB serving property: scans
    prune to probed cells via dynamic partition pruning."""
    spark.catalog.clearCache()
    plan = (
        ivfpq_retrained_served(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()
    assert "CartesianProduct" not in plan


def test_gc_versions_keeps_current_and_rollback_depth(tmp_path):
    """GC prunes old versions but never the CURRENT target (even when
    it is the oldest) and keeps `keep` versions of rollback depth."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity4 import (
        gc_versions,
        write_current_pointer,
    )

    vroot = str(tmp_path / "vroot")
    os.makedirs(vroot)
    for i in range(1, 5):
        os.makedirs(os.path.join(vroot, f"v00{i}"))
        with open(os.path.join(vroot, f"v00{i}", "artifacts.json"), "w") as fh:
            fh.write("{}")
    write_current_pointer(vroot, os.path.join(vroot, "v004"))
    removed = gc_versions(vroot, keep=2)
    assert sorted(os.path.basename(p) for p in removed) == ["v001", "v002"]
    assert sorted(
        d for d in os.listdir(vroot) if d.startswith("v")
    ) == ["v003", "v004"]
    # pointer at the OLDEST version: it survives any keep depth
    write_current_pointer(vroot, os.path.join(vroot, "v003"))
    removed = gc_versions(vroot, keep=1)
    assert [os.path.basename(p) for p in removed] == ["v004"]
    assert os.path.isdir(os.path.join(vroot, "v003"))
