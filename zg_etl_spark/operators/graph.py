"""Distributed connected-components labeling — the shared primitive
under p54's contested-subgraph grouping and l16's duplicate-group
resolution. Spark has no built-in connected components; this is the
standard min-label-propagation formulation with pointer doubling so
deep chain components (crawl-boilerplate duplicate chains, cascaded
click claims) converge in O(log diameter) rounds instead of
O(diameter).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def label_components(sym: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Connected components over a symmetric numeric edge list
    (columns a, b) → (nd, lab) with lab = the component's minimum node
    id. Min-label propagation alone needs ~diameter rounds — a chained
    component (session→key→click→key→…, or l16-style duplicate chains)
    can be hundreds deep — so each round ALSO shortcuts through the
    current labels (lab ← label-of-label, classic pointer doubling),
    making convergence O(log diameter): 40 rounds covers any graph that
    fits in storage. Convergence is detected by the monotone sum of
    labels going stable."""
    labels = (sym.select(F.col("a").alias("nd")).distinct()
              .withColumn("lab", F.col("nd")).localCheckpoint(True))
    prev = labels.agg(F.sum("lab")).first()[0]
    for _ in range(max_rounds):
        prop = (sym.join(labels, sym.a == labels.nd)
                .select(F.col("b").alias("nd"), "lab"))
        merged = (labels.unionByName(prop).groupBy("nd")
                  .agg(F.min("lab").alias("lab")))
        # pointer doubling: follow one more hop through the labels table
        hop = merged.select(F.col("nd").alias("lab"),
                            F.col("lab").alias("lab2"))
        labels = (merged.join(hop, "lab", "left")
                  .select("nd", F.least("lab", "lab2").alias("lab"))
                  .localCheckpoint(True))
        cur = labels.agg(F.sum("lab")).first()[0]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("component labeling did not converge")
    return labels
