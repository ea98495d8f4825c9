"""Distributed connected components over an edge list — the clustering
primitive behind ``plans.dedup.dedup_clusters`` and any pair-to-group
rollup (near-dup canonicalization, entity resolution, session stitching).

Algorithm: star contraction — root-level hooking + pointer-doubling
compression (the Shiloach-Vishkin / large-star-small-star family). Per
outer round:

- **hook (at the roots)**: for every edge (u, v), the ROOTS of u's and v's
  label trees adopt ``min(lbl(u), lbl(v)``) — two equi-joins to look up
  endpoint labels, a min-aggregate per root, and a left-join applying the
  update. Hooking roots (not endpoints) is what makes rounds logarithmic:
  a whole star adopts its neighbor star's smaller root in one round, so
  components contract like a doubling chain, not a crawling frontier.
  (A naive endpoint hook — node <- min(neighbors' labels) — degrades to
  O(diameter) rounds: once labels form long constant runs, each round
  moves the smaller label ONE position along the run. Measured: a
  400-node chain had not converged after 60 naive rounds, vs 10 rounds
  for root hooking.)
- **flatten**: pointer-double the label forest (``lbl <- lbl(lbl)``)
  until flat — log(depth) self-joins. The hook is NOT materialized on
  its own: it is composed un-barriered under the round's first
  double-jump, so each round writes exactly one label table (identical
  hook/jump sub-plans inside the composite are deduplicated by Spark's
  ReusedExchange, so the fan-out costs scans, not shuffles).
- **materialization barrier**: every step round-trips the label relation
  through parquet. This both truncates lineage AND keeps per-round cost
  CONSTANT: repeated ``localCheckpoint``/``checkpoint`` chains measurably
  degrade ~7x per round past ~8 iterations in local mode (block-manager
  re-read path), while the parquet round-trip stayed flat for 60+ rounds.
  On a cluster the barrier directory belongs on shared storage — which is
  exactly how production iterative jobs (GraphFrames CC, MLlib) persist
  interround state anyway.
- **convergence** via ONE aggregate job per barrier: a self-join of the
  label table computes both the label mass SUM(lbl) and a flatness
  defect (count of nodes whose label's label is smaller). Labels only
  ever decrease, so an unchanged mass across a full round is exactly the
  global fixpoint, and defect == 0 is exactly "the forest is flat" — no
  confirming extra jump is needed, and the driver only ever sees two
  scalars per step. Typical round cost: 1 barrier write + 1 stats job
  (the r1/r2 shape was 4-6 jobs/round: separate hook barrier, hook sum,
  and a confirming flatten iteration).

All joins are hash-partitioned equi-joins on node/label ids — AQE handles
skew (a giant component's root is a hot key; AQE splits it).
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_rounds: int = 50,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Label every node of the undirected graph ``pairs`` with its
    component's minimum node id.

    Returns (node, lbl) for every node appearing in at least one edge.
    ``max_rounds`` bounds the outer (hook) rounds, which grow with
    log(component size) — 50 covers any graph that fits on hardware; the
    function raises rather than silently returning partial components.
    ``checkpoint_dir``: where inter-round label tables live (default: a
    driver-local temp dir, correct for local mode; pass shared storage on
    a cluster).
    """
    spark = pairs.sparkSession
    tmp = checkpoint_dir or tempfile.mkdtemp(prefix="cc_labels_")
    own_tmp = checkpoint_dir is None
    step = 0

    def barrier(df: DataFrame) -> DataFrame:
        nonlocal step
        step += 1
        path = os.path.join(tmp, f"step_{step}")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def stats(df: DataFrame) -> tuple[int, int]:
        """One job: (label mass, flatness defect) of a barriered label
        table. Every label value is itself a node in the table (labels
        are always copied from existing node ids), so the self-join on
        lbl == node is lossless and the defect — how many nodes' labels
        could still be compressed by a jump — is exact."""
        row = (
            df.alias("m")
            .join(df.alias("p"), F.col("m.lbl") == F.col("p.node"))
            .agg(
                F.sum(F.col("m.lbl")).alias("mass"),
                F.count(F.when(F.col("p.lbl") < F.col("m.lbl"), 1)).alias(
                    "defect"
                ),
            )
            .collect()[0]
        )
        return row["mass"], row["defect"]

    p = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        p.union(p.select(F.col("b"), F.col("a")))
        .toDF("u", "v")
        .persist()
    )
    # seed with min(self, direct neighbors) — one aggregation, no join;
    # equivalent to (and cheaper than) running the first naive round
    labels = barrier(
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mn"))
        .select("node", F.least("node", "mn").alias("lbl"))
    )

    def _jump(df: DataFrame) -> DataFrame:
        return (
            df.alias("m")
            .join(df.alias("p"), F.col("m.lbl") == F.col("p.node"))
            .select(
                F.col("m.node").alias("node"),
                F.least(F.col("m.lbl"), F.col("p.lbl")).alias("lbl"),
            )
        )

    def finish(result: DataFrame) -> DataFrame:
        if own_tmp:
            # the returned DataFrame must outlive the temp dir: re-anchor it
            # off the parquet files before they are deleted (localCheckpoint
            # stores MEMORY_AND_DISK — eviction cannot trigger a recompute
            # from the deleted path; one call has none of the repeated-
            # checkpoint degradation the barrier avoids)
            result = result.localCheckpoint()
        return result

    try:
        prev_mass, defect = stats(labels)
        for rnd in range(1, max_rounds + 1):
            # look up both endpoint labels, then hook each ROOT to the min
            # of the two: (root_of_u <- lbl(v)) and (root_of_v <- lbl(u)).
            # The hook is a lazy plan — it materializes only underneath
            # the round's first double-jump, one write for hook+flatten.
            lu = (
                edges.alias("e")
                .join(labels.alias("x"), F.col("e.u") == F.col("x.node"))
                .select(F.col("e.v").alias("v"), F.col("x.lbl").alias("la"))
            )
            luv = (
                lu.alias("l")
                .join(labels.alias("y"), F.col("l.v") == F.col("y.node"))
                .select(F.col("l.la").alias("la"), F.col("y.lbl").alias("lb"))
            )
            cand = luv.select(
                F.col("la").alias("node"), F.col("lb").alias("lbl")
            ).union(
                luv.select(F.col("lb").alias("node"), F.col("la").alias("lbl"))
            )
            upd = cand.groupBy("node").agg(F.min("lbl").alias("u_lbl"))
            hooked = labels.join(upd, "node", "left").select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("u_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            labels = barrier(_jump(_jump(hooked)))
            mass, defect = stats(labels)
            while defect > 0:
                labels = barrier(_jump(_jump(labels)))
                mass, defect = stats(labels)
            if mass == prev_mass:
                _LOG.info(
                    "connected_components converged: %d hook rounds, "
                    "%d barrier writes",
                    rnd,
                    step,
                )
                return finish(labels)
            prev_mass = mass
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} hook rounds"
        )
    finally:
        edges.unpersist()
        if own_tmp:
            shutil.rmtree(tmp, ignore_errors=True)
