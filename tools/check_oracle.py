#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from <out_dir>/oracle_sql.json in DuckDB against the
sf_dir parquet tables, and compares: column names (sorted), row counts, and
values (rows sorted by all columns). Not part of the Scala library —
dev-only tooling using the driver-side python stack.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        # Scalar-output lint: the driver compare sorts/factorizes pandas
        # columns and crashes on array/struct/map cells ("unhashable type:
        # numpy.ndarray") before recording anything — reject nested output
        # types here so the failure is visible pre-flight (round-6 q50).
        import pyarrow.parquet as pq
        import pyarrow as pa
        schema = pq.read_schema(files[0])
        nested = [f.name for f in schema
                  if pa.types.is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: non-scalar output columns {nested} "
                  f"(driver compare cannot hash arrays/structs/maps)")
            fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}"); fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); fail += 1; continue
        # Driver-faithful dtype gate: the driver hashes stringified values, so a
        # float64 oracle column (e.g. DuckDB SUM -> HUGEINT -> float64) against an
        # int64 spark column renders "46.0" vs "46" and flunks hash_match even
        # when values are numerically equal. Refuse float-vs-int coercion here so
        # the local pre-flight fails exactly where the driver would (round-5
        # q42/q43 failure mode: un-cast SUM in the oracle SQL).
        kind_clash = [c for c in got.columns
                      if {got[c].dtype.kind, exp[c].dtype.kind} == {"f", "i"}
                      or {got[c].dtype.kind, exp[c].dtype.kind} == {"f", "u"}]
        if kind_clash:
            print(f"FAIL {name}: float-vs-int dtype clash on {kind_clash} "
                  f"(cast the oracle SUM/derived column to BIGINT)"); fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(got)} rows)"); ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); fail += 1
    # queries without an oracle: rows + schema check against the declared
    # manifest (no_oracle_by_design.json) — only the value hash is waived.
    # A query absent from BOTH oracle_sql.json and the manifest is an
    # unregistered gap, not "by design": fail it.
    import os, pyarrow.parquet as _pq
    try:
        by_design = json.load(open(f"{out_dir}/no_oracle_by_design.json"))
    except FileNotFoundError:
        by_design = {}
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            if name not in by_design:
                print(f"FAIL {name}: no oracle and not declared rows-only-by-design")
                fail += 1; continue
            decl = by_design[name]
            got_schema = [(f.name, str(f.type)) for f in _pq.read_schema(files[0])] if files else []
            want = [(c["name"], {"bigint": "int64", "boolean": "bool",
                                 "double": "double", "string": "string"}.get(c["type"], c["type"]))
                    for c in decl["columns"]]
            schema_ok = got_schema == want
            ok_all = n > 0 and schema_ok
            tag = "OK" if ok_all else f"FAIL({'empty' if n == 0 else f'schema {got_schema} != {want}'})"
            print(f"ROWS_ONLY_BY_DESIGN {name}: {n} rows, schema "
                  f"{'OK' if schema_ok else 'MISMATCH'} {tag} — {decl['reason']}")
            if not ok_all: fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
