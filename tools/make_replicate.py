"""Build an N× replicate of a testdata scale-factor directory.

The cheapest scale test this sandbox offers (VERDICT r6 item 8): copy
each fact table N times with id-column offsets so keys stay unique,
then run the driver-strict oracle suite against the replicate:

    python tools/make_replicate.py --sf /root/testdata/sf0.01 \
        --out /tmp/sf0.01_x10 --times 10
    SPARK_GRAFT_TEST_SF_DIR=/tmp/sf0.01_x10 \
        python -m pytest tests/test_queries_oracle.py -q

Offsets only the surrogate id columns (event_id / doc_id / vec_id) —
foreign-key tables (TPC-H) and natural keys (user_id) replicate
verbatim, which is the interesting case: per-user volumes grow N×,
duplicate groups grow N×, and any operator whose state scales with
group size (not key count) gets stressed. This reproduced four real
bugs in rounds 3-7 (float-order, half-boundary rounding, cogroup
column-dedup, one-sided cogroup key).
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id column to offset per table; everything else replicates verbatim
OFFSET_COLS = {
    "events.parquet": "event_id",
    "documents.parquet": "doc_id",
    "embeddings.parquet": "vec_id",
}
OFFSET_STEP = 10_000_000


def build(sf_dir: str, out_dir: str, times: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # ONE shared step across every offset table (ADVICE r7): the step
    # clears the max id over ALL of them, not each table's own — a
    # per-table step on an already-replicated source could give
    # documents and embeddings different strides, silently breaking
    # the doc_id = vec_id correspondence the doc/vec joins
    # (ann_filtered, hybrid_rrf_fusion, ...) rely on.
    max_id = 0
    for fname, col in OFFSET_COLS.items():
        src = os.path.join(sf_dir, fname)
        if os.path.exists(src):
            t_max = pc.max(pq.read_table(src, columns=[col])[col]).as_py()
            max_id = max(max_id, t_max or 0)
    step = OFFSET_STEP
    while step <= max_id:
        step *= 10
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, fname)
        dst = os.path.join(out_dir, fname)
        col = OFFSET_COLS.get(fname)
        if col is None:
            shutil.copy(src, dst)
            continue
        t = pq.read_table(src)
        idx = t.schema.get_field_index(col)
        parts = [
            t.set_column(idx, col, pc.add(t[col], i * step))
            for i in range(times)
        ]
        out = pa.concat_tables(parts)
        assert len(pc.unique(out[col])) == t.num_rows * times, (
            f"{fname}: id collision after offsetting (step={step})"
        )
        pq.write_table(out, dst)
        print(f"{fname}: {t.num_rows} -> {t.num_rows * times} rows "
              f"(step {step})")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--times", type=int, default=10)
    args = p.parse_args()
    build(args.sf, args.out, args.times)


if __name__ == "__main__":
    main()
