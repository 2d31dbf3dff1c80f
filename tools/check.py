#!/usr/bin/env python
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares: columns sorted by name, rows sorted by all columns,
exact value equality (with a float-tolerance second pass to distinguish
"near miss" from "wrong").
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def cells_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return cells_equal(a, b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.read_parquet(res_dir))
            duck_df = norm(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        # The driver's hash gate is dtype-sensitive: DuckDB HUGEINT (e.g. an
        # uncast SUM-derived column) lands in pandas as float64 while Spark
        # writes int64 — equal values, mismatched hash. Mirror that here.
        dtype_bad = [
            c
            for c in spark_df.columns
            if spark_df[c].dtype != duck_df[c].dtype
            and spark_df[c].dtype.kind in "iuf"
            and duck_df[c].dtype.kind in "iuf"
        ]
        if dtype_bad:
            details = ", ".join(
                f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}" for c in dtype_bad
            )
            print(f"FAIL {name}: dtype mismatch ({details}) — driver hash gate would flag")
            n_fail += 1
            continue
        exact = True
        close = True
        first_diff = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                a, b = spark_df[c].iloc[i], duck_df[c].iloc[i]
                if not cells_equal(a, b):
                    exact = False
                    if not cells_close(a, b):
                        close = False
                        if first_diff is None:
                            first_diff = (i, c, a, b)
        if exact:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        elif close:
            print(f"NEAR {name}: values within 1e-9 but not exact — will hash-mismatch!")
            n_fail += 1
        else:
            i, c, a, b = first_diff
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
