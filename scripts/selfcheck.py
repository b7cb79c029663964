#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
views over <sfDir>/*.parquet, and compares rows / schema / values with
columns sorted by name. NOT part of the shipped library.
"""
import json, sys, glob, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 9)
    if isinstance(val, np.ndarray):
        # duckdb fetchdf returns LIST columns as ndarrays; without this
        # the tuple comparison raises "truth value of an array ..."
        return tuple(canon(v) for v in val.tolist())
    if isinstance(val, (np.floating,)):
        return canon(float(val))
    if isinstance(val, (np.integer,)):
        return int(val)
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    return val


def load_optional(path):
    try:
        return json.load(open(path))
    except FileNotFoundError:
        return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # graft.Verify writes a per-query failure manifest and the full query
    # roster; a missing or failed query must become a red row here, never
    # a silent shrink (round-13 regression class).
    failures = load_optional(f"{out_dir}/failures.json") or {}
    manifest = load_optional(f"{out_dir}/manifest.json")
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is one file per table; Spark-written fixtures
        # (graft.StressScale) are parquet DIRECTORIES — glob those
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except duckdb.Error:
            # synthetic dirs (scripts/synthgen.py) carry only the tables
            # their query subset reads; a query touching a missing view
            # still fails loudly below
            pass
    results = {}
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/q_*"))
    if manifest is not None:
        for missing in sorted(set(manifest) - set(names)):
            results[missing] = {"err": "query absent from verify output "
                                       "(no parquet dir written)"}
        # a q_* dir NOT in the manifest is stale output from an earlier
        # (e.g. --only subset) Verify run into a reused out_dir — flag
        # it red rather than compare it as if it were this run's
        stale = sorted(set(names) - set(manifest))
        names = [n for n in names if n not in stale]
        for s in stale:
            results[s] = {"err": "stale q_* dir not in verify manifest "
                                 "(reused out_dir?)"}
    for name in names:
        if name in failures:
            results[name] = {"err": f"spark query failed: {failures[name]}"}
            continue
        entry = {}
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            results[name] = {"err": f"spark result unreadable: {e}"}
            continue
        if name not in oracles:
            entry["rows"] = len(got)
            entry["status"] = "rows_only"
            results[name] = entry
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = {"err": f"oracle failed: {e}"}
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        entry["rows_match"] = len(g) == len(e)
        entry["schema_match"] = list(g.columns) == list(e.columns)
        if not entry["schema_match"]:
            entry["got_cols"] = list(g.columns)
            entry["exp_cols"] = list(e.columns)
        ok = entry["rows_match"] and entry["schema_match"]
        if ok:
            gr = [tuple(canon(v) for v in r) for r in g.itertuples(False)]
            er = [tuple(canon(v) for v in r) for r in e.itertuples(False)]
            entry["hash_match"] = gr == er
            if not entry["hash_match"]:
                # row-order-insensitive fallback diagnosis
                entry["set_match"] = sorted(map(repr, gr)) == sorted(
                    map(repr, er))
                for i, (a, b) in enumerate(zip(gr, er)):
                    if a != b:
                        entry["first_diff"] = {"row": i, "got": repr(a)[:300],
                                               "exp": repr(b)[:300]}
                        break
        else:
            entry["hash_match"] = False
            entry["got_rows"] = len(g)
            entry["exp_rows"] = len(e)
        entry["status"] = "ok" if entry.get("hash_match") else "FAIL"
        results[name] = entry
    n_ok = sum(1 for r in results.values() if r.get("status") == "ok")
    n_ro = sum(1 for r in results.values() if r.get("status") == "rows_only")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_ok} ok / {n_ro} rows-only / "
          f"{len(results) - n_ok - n_ro} failing of {len(results)}")
    if manifest is not None and set(manifest) - set(results):
        # absent-from-output already made err rows above; this is the
        # can't-happen belt-and-braces (no assert: stripped under -O,
        # and the err-row path exits 1 with a readable red row instead)
        print(f"LOST QUERIES: {sorted(set(manifest) - set(results))}")
        sys.exit(1)
    if len(results) != n_ok + n_ro:
        sys.exit(1)


if __name__ == "__main__":
    main()
