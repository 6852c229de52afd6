"""Local replica of the driver's correctness gate.

Runs every declared query through Spark AND its DuckDB oracle at a
given sf dir, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified tuple).
Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def canonical_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        # Array-likes first: `v != v` on a multi-element numpy array
        # raises "truth value of an array is ambiguous", so the NaN
        # check must not see them.
        if isinstance(v, (list, tuple)):
            return repr(list(v))
        if hasattr(v, "tolist"):  # numpy arrays / scalars
            return repr(v.tolist())
        if v is None or v != v:  # NaN/None
            return "∅"
        if isinstance(v, float):
            return repr(round(v, 9))
        return repr(v)

    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from scrappy_spark.session import get_spark
    from scrappy_spark.schema import FIXTURE_TABLES

    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows spark={len(sdf)} duck={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
        try:
            if not problems and canonical_hash(sdf) != canonical_hash(odf):
                problems.append("value hash mismatch")
                # show a diff sample (best-effort: sort_values dies on
                # list cells, which the contract lint forbids anyway)
                try:
                    s = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
                    o = odf.reindex(sorted(odf.columns), axis=1).sort_values(list(sorted(odf.columns))).reset_index(drop=True)
                    for i in range(min(len(s), len(o))):
                        if not s.iloc[i].equals(o.iloc[i]):
                            problems.append(f"first diff row {i}:\n  spark={s.iloc[i].to_dict()}\n  duck ={o.iloc[i].to_dict()}")
                            break
                except Exception:
                    pass
        except Exception as e:
            problems.append(f"hash error: {e}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
