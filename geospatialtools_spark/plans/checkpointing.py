"""Checkpoint-resumable stage pipeline (north_rule requirement).

Every pipeline stage is a pure function (input tables -> output table). A
stage COMMIT atomically writes the output as parquet plus a manifest
(stage name, config fingerprint, row count, wall ms, lineage rows). On
restart, a stage whose manifest matches its fingerprint is SKIPPED and its
committed output is read back — so a killed job resumes at the last
committed stage with bit-identical results (stages are deterministic by
construction: fixed seeds, explicit tie-breaks).

This emulates the Iceberg snapshot-per-stage design from SURVEY.md §3.1 with
plain parquet + manifest files (the sandbox has no Iceberg runtime jar; in
production each commit is an Iceberg snapshot and resume reads
``snapshot-id``). Atomicity: parquet dir is written to ``<stage>.tmp`` and
renamed, manifest written last — a kill at any point leaves either no commit
or a complete one.

The per-partition lineage table (stage, partition_id, rows, wall_ms) is
appended under ``<root>/_lineage`` at every commit (plans/lineage.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import lineage_records


class StageRunner:
    def __init__(self, spark: SparkSession, root: str, run_config: dict | None = None):
        self.spark = spark
        self.root = root
        self.config_fp = json.dumps(run_config or {}, sort_keys=True)
        os.makedirs(root, exist_ok=True)
        self.metrics: list[dict] = []

    def _paths(self, stage: str) -> tuple[str, str, str]:
        d = os.path.join(self.root, stage)
        return d, d + ".tmp", os.path.join(self.root, f"{stage}.manifest.json")

    def is_committed(self, stage: str) -> bool:
        d, _, mf = self._paths(stage)
        if not (os.path.exists(mf) and os.path.exists(d)):
            return False
        with open(mf) as f:
            m = json.load(f)
        return m.get("config_fp") == self.config_fp

    def run_stage(self, stage: str, fn: Callable[[], DataFrame],
                  force: bool = False) -> DataFrame:
        """Execute (or resume) one stage; returns the committed DataFrame."""
        d, tmp, mf = self._paths(stage)
        if not force and self.is_committed(stage):
            self.metrics.append({"stage": stage, "resumed": True})
            return self.spark.read.parquet(d)

        t0 = time.time()
        out = fn()
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        lin_dir = os.path.join(self.root, "_lineage")
        out.write.mode("overwrite").parquet(tmp)
        committed = self.spark.read.parquet(tmp)
        n_rows = committed.count()
        # lineage over the COMMITTED data: measuring the unmaterialized plan
        # would re-execute the whole stage a second time
        lin_pdf = lineage_records(committed, stage).toPandas()
        wall_ms = int((time.time() - t0) * 1000)

        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)
        self.spark.createDataFrame(lin_pdf).withColumn(
            "committed_stage", F.lit(stage)).write.mode("append").parquet(lin_dir)
        with open(mf + ".tmp", "w") as f:
            json.dump({"stage": stage, "config_fp": self.config_fp,
                       "rows": n_rows, "wall_ms": wall_ms,
                       "partitions": len(lin_pdf)}, f)
        os.replace(mf + ".tmp", mf)
        self.metrics.append({"stage": stage, "resumed": False,
                             "rows": n_rows, "wall_ms": wall_ms})
        # a stage's iterative operators leave dead localCheckpoint blocks;
        # the next stage reads the committed parquet, so free them now
        # rather than letting them degrade the rest of the run
        from ..session import release_blocks
        release_blocks(self.spark)
        return self.spark.read.parquet(d)
