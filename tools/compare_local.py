#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
executes each oracle SQL in DuckDB over the same sf dir and compares
row count, schema (sorted column names), and values (rows sorted).

With --artifact PATH it additionally writes a per-query record in the
driver's CORRECTNESS_r{N}.json schema ({rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}) — the local record that
survives when the driver's own artifact comes back empty (r16/r18/r19).

Usage: python3 tools/compare_local.py [--artifact PATH] <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def main():
    argv = sys.argv[1:]
    artifact = None
    if argv and argv[0] == "--artifact":
        artifact = argv[1]
        argv = argv[2:]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    records = {}

    def record(name, rows_m, schema_m, hash_m, srows, orows, err):
        records[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": srows,
                         "oracle_rows": orows, "err": err}

    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, None, None, "no spark output")
            n_fail += 1
            continue
        try:
            spark = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = sorted(spark.columns)
            srows = spark.fetchall()
            duck = con.sql(sql)
            dcols = sorted(duck.columns)
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            record(name, False, False, False, None, None,
                   f"exec error: {str(e)[:300]}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            record(name, len(srows) == len(drows), False, False,
                   len(srows), len(drows),
                   f"columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
        # Oracle output-TYPE parity (the rounds-8/9 red-row class): the
        # driver hashes typed values, so a value-equal HUGEINT vs BIGINT
        # still fails its gate. Compare DuckDB-side types column by
        # column between the spark parquet read and the oracle query.
        stypes = {c: str(t) for c, t in zip(spark.columns, spark.types)}
        dtypes = {c: str(t) for c, t in zip(duck.columns, duck.types)}
        tbad = [(c, stypes[c], dtypes[c]) for c in scols
                if stypes[c] != dtypes[c]]
        if tbad:
            msg = ("oracle/spark type mismatch: "
                   + ", ".join(f"{c} spark={a} duck={b}" for c, a, b in tbad))
            print(f"FAIL {name}: {msg}")
            record(name, len(srows) == len(drows), True, False,
                   len(srows), len(drows), msg)
            n_fail += 1
            continue
        # reorder values to sorted-column order, then sort rows
        sidx = [spark.columns.index(c) for c in scols]
        didx = [duck.columns.index(c) for c in dcols]
        sdata = sorted(([norm(r[i]) for i in sidx] for r in srows), key=key)
        ddata = sorted(([norm(r[i]) for i in didx] for r in drows), key=key)
        if len(sdata) != len(ddata):
            print(f"FAIL {name}: rows spark={len(sdata)} duck={len(ddata)}")
            record(name, False, True, False, len(sdata), len(ddata),
                   f"rows spark={len(sdata)} duck={len(ddata)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sdata, ddata)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i} (cols {scols}):")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            record(name, True, True, False, len(sdata), len(ddata),
                   f"first diff at sorted row {i}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdata)} rows")
            record(name, True, True, True, len(sdata), len(ddata), None)
            n_pass += 1
    if artifact:
        with open(artifact, "w") as f:
            json.dump(records, f, indent=2, sort_keys=True)
        print(f"== artifact: {artifact} ({len(records)} queries) ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
