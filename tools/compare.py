#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL over the same parquet tables and
compare (columns sorted by name, rows sorted, exact value equality).

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        return v  # exact float compare — that's the point
    if hasattr(v, "isoformat"):  # datetime/date; normalize tz-naive micros
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def sortkey(row):
    return tuple((x is None, str(x), repr(x)) for x in row)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({pq!r})").fetch_arrow_table()
        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            results[name] = f"SCHEMA_MISMATCH: spark={scols} oracle={ocols}"
            continue
        srows = [tuple(canon(r[c]) for c in scols) for r in sdf.to_pylist()]
        orows = [tuple(canon(r[c]) for c in ocols) for r in odf.to_pylist()]
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT_MISMATCH: spark={len(srows)} oracle={len(orows)}"
            continue
        srows.sort(key=sortkey)
        orows.sort(key=sortkey)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            results[name] = (f"VALUE_MISMATCH: {len(bad)}/{len(srows)} rows; "
                             f"first at sorted row {i}:\n  spark : {a}\n  oracle: {b}\n"
                             f"  cols  : {scols}")
        else:
            results[name] = f"OK ({len(srows)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        mark = "PASS" if v.startswith("OK") else "FAIL"
        print(f"[{mark}] {name}: {v}")
    print(f"\n{npass}/{len(results)} queries match")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
