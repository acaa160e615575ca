#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query
output (written by graft.Verify to OUT_DIR/<name>/), run the matching oracle
SQL from OUT_DIR/oracle_sql.json in DuckDB over the same sf tables and
compare values exactly (columns sorted by name, rows sorted)."""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    gcols, wcols = sorted(map(str.lower, got.columns)), sorted(map(str.lower, want.columns))
    if gcols != wcols:
        print(f"FAIL {name}: cols {gcols} vs {wcols}"); fail += 1; continue
    got.columns, want.columns = [c.lower() for c in got.columns], [c.lower() for c in want.columns]
    got, want = got[gcols], want[wcols]
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fail += 1; continue
    # Driver-parity checks: the driver lexsorts rows (crashes on unhashable
    # cells, e.g. ndarray columns) and hashes typed values (int64 138014 !=
    # float64 138014.0). Replicate both so a mismatch can't pass locally.
    try:
        got = got.sort_values(by=gcols).reset_index(drop=True)
        want = want.sort_values(by=wcols).reset_index(drop=True)
    except Exception as e:
        print(f"FAIL {name}: driver-style sort crashed: {e}"); fail += 1; continue
    # Compare dtype KIND (int vs float vs object...), not width: the driver
    # hashes value reprs, so int32 1 == int64 1 but int64 1 != float64 1.0
    # (the q1_agg HUGEINT failure mode).
    norm = lambda k: "i" if k in "iu" else k
    dbad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gcols
            if norm(got[c].dtype.kind) != norm(want[c].dtype.kind)]
    if dbad:
        print(f"FAIL {name}: dtype-kind mismatch {dbad}"); fail += 1; continue
    bad = None
    for c in gcols:
        gv, wv = list(got[c]), list(want[c])
        for i, (g, w) in enumerate(zip(gv, wv)):
            gn = g is None or (isinstance(g, float) and math.isnan(g))
            wn = w is None or (isinstance(w, float) and math.isnan(w))
            if gn and wn:
                continue
            if gn != wn or (isinstance(g, float) or isinstance(w, float)):
                if gn != wn or float(g) != float(w):
                    bad = (c, i, g, w); break
            elif str(g) != str(w):
                bad = (c, i, g, w); break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(got)} rows)"); ok += 1

missing = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if "/" in d
           and not d.endswith(".json") and d.split("/")[-1] not in oracle]
print(f"\n{ok} ok, {fail} fail; rows-only (no oracle): {sorted(missing)}")
sys.exit(1 if fail else 0)
