"""Solo-stage fill harness: ingest + Planchon fill as TWO resumable
StageRunner stages, for large-grid spot timings where a full-pipeline run
doesn't fit one sitting.

    spark-submit --driver-memory 48g --master local[32] \
        --py-files geospatialtools_spark.zip scripts/run_fill_solo.py \
        --ckpt /tmp/ckpt_fill --nx 4096 --tile 512

Safe to kill and re-run: the ingest stage (fixture DEM -> parquet cell
table) commits once and every later leg resumes it; fill commits when it
completes. Note the fill stage itself is one commit — a leg must fit the
whole fill (at 8192^2/1024 on this box that is >10 min; use a session with
no per-command timeout, or a bigger tile)."""
from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--res", type=float, default=30.0)
    args = ap.parse_args()

    import numpy as np

    from geospatialtools_spark import fixtures
    from geospatialtools_spark.grid import cells_df
    from geospatialtools_spark.plans.checkpointing import StageRunner
    from geospatialtools_spark.session import get_spark

    spark = get_spark("fill-solo")
    n, tile = args.nx, args.tile
    r = StageRunner(spark, args.ckpt, {"job": "fill_solo", "n": n, "tile": tile})
    meta = fixtures.dem_meta(n, n, tile)

    def ingest():
        m, dem, mask = fixtures.make_dem(n, n, tile=tile)
        return cells_df(spark, m, dem=dem.astype(np.float64),
                        mask=mask.astype(np.float64))

    cells = r.run_stage("ingest", ingest)

    def fill():
        from geospatialtools_spark.operators.terrain import planchon_fill
        return planchon_fill(cells, meta, args.res)

    t0 = time.time()
    out = r.run_stage("fill", fill)
    print(json.dumps({"grid": n, "tile": tile,
                      "stage_metrics": r.metrics,
                      "leg_wall_s": round(time.time() - t0, 1),
                      "rows": out.count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
