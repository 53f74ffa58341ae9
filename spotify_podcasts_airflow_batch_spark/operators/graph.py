"""Connected components over a pair list — the step that turns
near-duplicate PAIRS (MinHash/LSH, embedding-cosine) into canonical
duplicate GROUPS, so a dedup pipeline can keep one representative per
component rather than dropping both ends of every pair independently.

Each round does two DataFrame steps:

- **hook**: every node takes the minimum label among itself and its
  neighbors (one join + one map-side-combinable min aggregate);
- **compress** (pointer jumping): every node then follows its label's
  label — ``label[u] ← label[label[u]]`` (one more join).

Hook alone needs diameter-many rounds (a 10k-node chain → 10k rounds);
compression collapses pointer chains exponentially, giving
O(log diameter) rounds — the same doubling idea as
Shiloach-Vishkin / large-star-small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Labels only ever
decrease and never drop below the component minimum, so the fixpoint
(detected by a changed-row check) is exactly min-node-id-per-component.
``localCheckpoint`` truncates lineage each round so the plan does not
grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


LOCAL_CC_MAX_EDGES = 5_000_000


def _local_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: solve exactly in ONE executor task.

    A near-dup edge list in the low millions fits trivially in a
    single task's memory; classic union-find there beats ~15 Spark
    rounds of fixed job overhead by an order of magnitude. (This is
    executor-side ``mapInPandas`` over a coalesced partition — the
    driver never sees the edges.)"""
    from typing import Iterator

    import pandas as pd

    def uf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["src"], pdf["dst"]):
                a, b = int(a), int(b)
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min: the smaller id becomes the root,
                    # so roots ARE the component minima
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "component": [find(n) for n in nodes]}
        )

    return edges.coalesce(1).mapInPandas(uf, schema="node long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = LOCAL_CC_MAX_EDGES,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the minimum node id
    of its component. Returns (node, component).

    Algorithm selection by edge count: at or below
    ``local_threshold`` edges the exact single-task union-find runs
    (near-dup graphs after LSH blocking are almost always this small);
    above it, the distributed hook+compress iteration. ``max_iter``
    bounds rounds; with pointer compression 25 rounds cover any graph
    up to ~2^25 in effective chain length."""
    e2 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e2 = e2.localCheckpoint(eager=True)
    if e2.count() <= local_threshold:
        return _local_union_find(e2)
    sym = e2.select(F.col("src").alias("u"), F.col("dst").alias("v")).union(
        e2.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        # hook: min over own + neighbors' labels
        nbr = sym.join(
            labels.select(F.col("u").alias("v"), F.col("label").alias("nl")),
            "v",
        )
        prop = nbr.groupBy("u").agg(F.min("nl").alias("mn"))
        hooked = labels.join(prop, "u", "left").select(
            "u",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("mn", "label")).alias("label"),
        )
        # compress: label[u] <- label[label[u]]  (labels are node ids,
        # so the lookup is a self-join on the label table)
        lookup = hooked.select(
            F.col("u").alias("lu"), F.col("label").alias("ll")
        )
        compressed = (
            hooked.join(lookup, hooked["label"] == lookup["lu"], "left")
            .select(
                "u",
                "old_label",
                F.least(F.col("label"), F.coalesce("ll", "label")).alias(
                    "label"
                ),
            )
        )
        # lazy checkpoint: the convergence count below is the action
        # that materializes it — one job per round, not two
        compressed = compressed.localCheckpoint(eager=False)
        changed = (
            compressed.where(F.col("label") < F.col("old_label"))
            .limit(1)
            .count()
        )
        labels = compressed.select("u", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("node"), F.col("label").alias("component")
    )
