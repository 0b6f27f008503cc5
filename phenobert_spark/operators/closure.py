"""Distributed transitive closure (SURVEY.md §2.3 J6).

The ontology closure itself is driver-side BFS (17k nodes — broadcast
territory, SURVEY.md §4 item 3). This operator is the distributed form
for graphs that do NOT fit on the driver: iterative self-join to
fixpoint with early termination, the standard semi-naive evaluation.

Scale notes: each iteration is one shuffle on the join key; frontier
shrinks monotonically (only NEW pairs join the next round), and
`localCheckpoint` truncates the lineage so the plan does not grow
exponentially with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame, max_iters: int = 30, checkpoint_every: int = 4
) -> DataFrame:
    """edges(child, parent) -> closure(node, anc): all (node, ancestor)
    pairs reachable through one or more parent hops."""
    closure = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("anc")
    ).distinct()
    frontier = closure
    up = edges.select(
        F.col("child").alias("_c"), F.col("parent").alias("_p")
    )
    for i in range(max_iters):
        # extend the frontier one hop: (node -> anc) + (anc -> anc')
        stepped = (
            frontier.join(up, frontier.anc == up._c)
            .select("node", F.col("_p").alias("anc"))
            .distinct()
        )
        new = stepped.join(closure, on=["node", "anc"], how="left_anti")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        closure = closure.unionByName(new).distinct()
        frontier = new
    return closure
