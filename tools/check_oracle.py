"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
at the given sf dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...] [--json OUT.json]

``--json`` persists the run in the driver's CORRECTNESS_rNN.json shape
(rows_match/schema_match/hash_match/spark_rows/oracle_rows/err per entry,
plus rows_only for non-SQL-expressible entries) — committed per round as
CORRECTNESS_FULL_rNN.json so the entries past the driver's 50-entry
recording window have a durable artifact too (round-4 ADVICE item).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            df[c] = col.map(lambda v: "null" if pd.isna(v) else repr(float(v)))
        else:
            df[c] = col.map(lambda v: "null" if pd.isna(v) else str(v))
    rows = ["|".join(r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [SF_DIR] [QUERY...] --json OUT.json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    record: dict[str, dict] = {}

    from geospatialtools_spark.session import get_spark
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark: {type(ex).__name__}: {str(ex)[:300]}"}
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows [{t1-t0:.1f}s]")
            record[name] = {"rows_only": True, "spark_rows": len(sdf),
                            "err": None}
            if len(sdf) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {str(ex)[:300]}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(sdf),
                            "oracle_rows": None,
                            "err": f"duckdb: {type(ex).__name__}: {str(ex)[:300]}"}
            n_fail += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        record[name] = {"rows_match": sn == on, "schema_match": sc == oc,
                        "hash_match": sh == oh, "spark_rows": sn,
                        "oracle_rows": on, "err": None}
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: spark={sn} oracle={on} rows, "
              f"hash {'==' if sh == oh else sh + '!=' + oh} [{t1-t0:.1f}s]")
        if not ok:
            if sc != oc:
                print(f"  cols spark={sc} oracle={oc}")
            elif sn == on and sn > 0:
                sd = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                od = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                neq = (sd.astype(str) != od.astype(str)).any(axis=1)
                print("  first diffs (spark vs oracle):")
                print(pd.concat([sd[neq].head(3), od[neq].head(3)], axis=1).to_string()[:1500])
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": record}, f, indent=2)
        print(f"wrote {json_out} ({len(record)} entries)")


if __name__ == "__main__":
    main()
