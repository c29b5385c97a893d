"""Pointer-doubling iteration over functional graphs (SURVEY.md §4.2 item 3).

The reference's downstream traversals are per-cell recursion along the D8
flow-direction pointer (``determine_basin_id`` terrain_tools.f90:1272-1293,
``determine_channel_depth`` :1704-1725). Distributed, each is "resolve every
node of a functional graph to the first DONE ancestor": pointer doubling
halves the unresolved path length every self-join, so O(log(longest path))
shuffle rounds instead of O(path).

State schema: (id long, done boolean, ptr long, label <any>). DONE rows carry
their final label; PENDING rows point at ``ptr``. Every ptr must reference an
existing id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve(state: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Iterate until no PENDING rows remain; returns (id, label).

    Each round: join pending rows to their target's state — if the target is
    DONE adopt its label, else jump to the target's ptr (doubling). Each
    round is materialized with an eager localCheckpoint (the round's one
    job), so the convergence test is a cheap count over cached blocks, never
    a lineage recompute; at cluster scale this maps to an Iceberg snapshot
    per round (the checkpoint-resume story in plans/checkpointing.py).
    """
    state = state.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # count() fully materializes the previous round's lazy checkpoint and
        # answers convergence in the same job — one job per round total
        if state.filter(~F.col("done")).count() == 0:
            break
        target = state.select(
            F.col("id").alias("t_id"),
            F.col("done").alias("t_done"),
            F.col("ptr").alias("t_ptr"),
            F.col("label").alias("t_label"),
        )
        resolved = (
            state.filter(~F.col("done"))
            .join(target, F.col("ptr") == F.col("t_id"), "left")
            .select(
                "id",
                F.coalesce(F.col("t_done"), F.lit(True)).alias("done"),
                F.coalesce(F.col("t_ptr"), F.col("ptr")).alias("ptr"),
                F.when(F.coalesce(F.col("t_done"), F.lit(True)), F.col("t_label")).alias("label"),
            )
        )
        state = state.filter(F.col("done")).unionByName(resolved) \
                     .localCheckpoint(eager=False)
    return state.select("id", "label")
