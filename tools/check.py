#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json against the sf tables, and
compares after sorting columns by name and rows by value.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in idx))
    out.sort()
    return [c for c in sorted(cols)], out, [str(types[i]) for i in idx]


def selftest():
    """Prove the type compare catches what repr() cannot: an uncast DuckDB
    sum() (HUGEINT) vs the BIGINT Spark writes to parquet. Exits 0 iff the
    divergence is detected."""
    con = duckdb.connect()
    got = con.sql("SELECT CAST(6 AS BIGINT) AS sum_k")          # Spark side
    exp = con.sql("SELECT sum(x) AS sum_k FROM (VALUES (1),(2),(3)) t(x)")
    _, grows, gtypes = canon(got.fetchall(), list(got.columns), got.types)
    _, erows, etypes = canon(exp.fetchall(), list(exp.columns), exp.types)
    assert grows == erows, "selftest broken: values should repr()-match"
    assert gtypes != etypes, "selftest FAILED: HUGEINT vs BIGINT not detected"
    print(f"selftest OK: values match ({grows}) but types differ "
          f"({gtypes} != {etypes}) -> would FAIL")
    sys.exit(0)


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            # Mirror the Spark loader's array<float> contract (Tables.load
            # narrows a float64 regeneration at the scan): narrow the oracle
            # side too, or a float64 regen would have DuckDB computing the
            # vector family on doubles while Spark computes on floats.
            # No-op on the current float32 generation.
            con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(CAST(embedding AS FLOAT[]) AS embedding) "
                    f"FROM '{sfdir}/{t}.parquet'")
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    # A query that throws before writing leaves NO output dir — r7 lost 19
    # of 100 queries this way and the compare shrank silently. Verify dumps
    # the selected-query manifest; anything absent fails loudly by name.
    missing = []
    manifest = f"{outdir}/query_names.json"
    if os.path.exists(manifest):
        expected = json.load(open(manifest))
        missing = sorted(set(expected) - set(names))
    n_pass = n_fail = n_rowsonly = 0
    for name in missing:
        print(f"FAIL {name}: MISSING (no output dir — query threw in Verify)")
        n_fail += 1
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols, grows = list(got.columns), got.fetchall()
        if name not in oracle:
            ok = len(grows) > 0
            print(f"{'rows' if ok else 'FAIL'} {name}: rows-only ({len(grows)} rows)")
            n_rowsonly += ok; n_fail += (not ok); continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = list(exp.columns), exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}"); n_fail += 1; continue
        gc, gr, gt = canon(grows, gcols, got.types)
        ec, er, et = canon(erows, ecols, exp.types)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if gt != et:
            diffs = [f"{c}: {a} != {b}" for c, a, b in zip(gc, gt, et) if a != b]
            print(f"FAIL {name}: types {diffs}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: {sum(1 for a,b in zip(gr,er) if a!=b)} mismatched rows; first: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail, "
          f"missing: {missing} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
