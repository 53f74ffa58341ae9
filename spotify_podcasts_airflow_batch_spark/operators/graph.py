"""Connected components over a pair list — the step that turns
near-duplicate PAIRS (MinHash/LSH, embedding-cosine) into canonical
duplicate GROUPS, so a dedup pipeline can keep one representative per
component rather than dropping both ends of every pair independently.

Iterative min-label propagation on DataFrames: each round every node
takes the minimum label among itself and its neighbors; a fixpoint is
a components labeling. Rounds needed = graph diameter — near-dup
graphs are overwhelmingly tiny cliques (diameter 1-2), so this
converges in 2-3 rounds. For adversarially long chains at 100 TB you
would switch to the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — same
DataFrame machinery, logarithmic rounds. ``localCheckpoint`` truncates
the lineage each round so the plan doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the minimum node id
    of its component. Returns (node, component)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.select(
                F.col("u").alias("v"), F.col("label").alias("nbr_label")
            ),
            "v",
        )
        prop = nbr_labels.groupBy("u").agg(F.min("nbr_label").alias("min_nbr"))
        stepped = labels.join(prop, "u", "left").select(
            "u",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("min_nbr", "label")).alias("label"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = (
            stepped.where(F.col("label") < F.col("old_label")).limit(1).count()
        )
        labels = stepped.select("u", "label")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
