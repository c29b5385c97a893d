"""Cluster entrypoint for the training-data curation chain (north_rule
deployment shape — the curation twin of scripts/run_pipeline.py):

    python -m zipfile -c geospatialtools_spark.zip geospatialtools_spark
    spark-submit --driver-memory 8g \
        --py-files geospatialtools_spark.zip scripts/run_curation.py \
        --ckpt /path/checkpoints [--docs 1000000] [--mixture]

Runs the full resumable curation pipeline (exact dedup -> MinHash-LSH
near-dup group resolution -> quality -> PII scrub [-> domain mixture]
-> split -> shard) on the deterministic planted-cluster corpus
(``fixtures.planted_docs`` — stand-in for a real document table; swap
``make_inputs`` for ``spark.read.parquet`` in production). Safe to kill
and re-run: committed stages resume from their parquet+manifest
snapshots, so a crashed 100 TB run never recomputes a finished stage.

Because the corpus plants its duplicate clusters, the output row counts
are checkable ground truth, printed next to the expectation: every 20-doc
block loses exactly 1 doc to exact dedup (m+1 — a bit-identical copy, so
this count must match EXACTLY) and 2 more to near-dup group resolution
(m and m+10; the keepers are m+2, the longest text, and m+11). The
near-dup pairs sit at jaccard ~0.91 where MinHash-LSH banding recall is
~99% by construction (measured 99.2% at 10M docs, BENCH_DEDUP.json), so
the script reports the achieved recall and gates `ground_truth_ok` on
exact-dedup equality plus recall >= 0.98 — an exact-equality gate would
misread the probabilistic contract as a bug.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def make_inputs(spark, n: int):
    from geospatialtools_spark.fixtures import planted_docs
    return planted_docs(spark, n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--mixture", action="store_true",
                    help="resample the curated corpus to 60/30/10 "
                         "web/wiki/code over the source column")
    args = ap.parse_args()
    if args.docs % 20:
        ap.error("--docs must be a multiple of 20 (the planted block size) "
                 "so the ground-truth row counts are exact")

    import os

    from pyspark.sql import SparkSession

    from geospatialtools_spark.pipeline import (CurationConfig,
                                                run_curation_pipeline)
    cores = os.cpu_count() or 8
    spark = (SparkSession.builder.appName("geospatialtools-curation")
             # at cluster scale: ~2-3x total executor cores; AQE coalesces
             .config("spark.sql.shuffle.partitions", str(2 * cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.cleaner.periodicGC.interval", "1min")
             .getOrCreate())
    cfg = CurationConfig(
        mixture_targets=({"web": 0.6, "wiki": 0.3, "code": 0.1}
                         if args.mixture else None))
    docs = make_inputs(spark, args.docs)
    t0 = time.time()
    out = run_curation_pipeline(spark, docs, cfg, args.ckpt)
    # the funnel IS the per-stage count report (one aggregate per stage,
    # incl. the raw-input baseline) — don't scan every output twice
    from geospatialtools_spark.pipeline import curation_funnel
    funnel = curation_funnel(out, weight_col=cfg.weight_col, input_df=docs)
    rows = {r["stage"]: r["rows"] for r in funnel}
    wall = round(time.time() - t0, 2)  # includes the funnel scans
    # planted ground truth, checked by IDENTITY, not by count (a count
    # check would score false-positive drops of regular docs as "recall"):
    # exact dedup drops exactly the m+1 copies; near-dup group resolution
    # drops the m / m+10 non-keepers (jaccard ~0.91 pairs, ~99% LSH
    # recall) and must keep every keeper (m+2, m+11) and regular doc.
    from pyspark.sql import functions as F
    expect = {"dedup": args.docs // 20 * 19, "near_dedup": args.docs // 20 * 17}
    mod = F.col("doc_id") % 20
    chk = out["near_dedup"].agg(
        F.sum((mod == 1).cast("long")).alias("exact_dup_leaks"),
        F.sum(mod.isin(0, 10).cast("long")).alias("near_dup_survivors"),
        F.sum((~mod.isin(0, 1, 10)).cast("long")).alias("keepers_and_regulars"),
    ).first()
    planted_drops = args.docs // 20 * 2            # m and m+10 per block
    recall = 1.0 - chk["near_dup_survivors"] / planted_drops
    false_drops = expect["near_dedup"] - int(chk["keepers_and_regulars"])
    print(json.dumps({
        "stages": out["_metrics"], "rows": rows, "funnel": funnel,
        "wall_s": wall,
        "docs": args.docs,
        "expected": expect,
        "near_dup_recall": round(recall, 4),
        "exact_dup_leaks": int(chk["exact_dup_leaks"]),
        "false_positive_drops": false_drops,
        "ground_truth_ok": (rows["dedup"] == expect["dedup"]
                            and chk["exact_dup_leaks"] == 0
                            and false_drops == 0
                            and recall >= 0.98),
    }, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
