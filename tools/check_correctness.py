"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row
count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from druid_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _isnull(v):
    if v is None:
        return True
    try:
        return bool(v != v)  # NaN/NaT; raises/False for arrays & values
    except Exception:
        return False


def canon(v):
    if v is None:
        return "NULL"
    if hasattr(v, "tolist") and not isinstance(v, (bytes, bytearray)):
        v = v.tolist()  # numpy array (duckdb LIST via pandas) / numpy scalar
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Integral floats render as ints: pandas NULL-coerces a BIGINT
        # column containing NULLs to float64, so oracle 100.0 must equal
        # spark 100 (the driver sees the same coercion on BOTH sides via
        # toPandas, so this is parity, not laxity — genuine type drift
        # is flagged separately by dtype_drift).
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        # queries round explicitly; repr of equal doubles is equal
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def dtype_drift(sdf, duck_df, ducktypes=None):
    """Driver-hash risk lint: the driver hashes pandas frames, where
    DuckDB HUGEINT/DECIMAL aggregates surface as float64 ('5.0') while
    Spark BIGINT gives int64 ('5') — rows+values pass stringly but the
    hash differs. Flag any column that is integer-kind on one side and
    float-kind on the other. (CAST the aggregate to BIGINT/DOUBLE in
    both query and oracle to fix.)

    ducktypes: {column -> declared DuckDB type string} from
    `DESCRIBE <query>` — distinguishes a float64 that exists only
    because pandas NULL-coerced an integral column (suppress) from a
    genuinely float-declared nullable column (still compare)."""
    from pyspark.sql import types as T
    INT_T = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    FLT_T = (T.FloatType, T.DoubleType)
    skind = {}
    for f in sdf.schema.fields:
        skind[f.name] = ("i" if isinstance(f.dataType, INT_T)
                         else "f" if isinstance(f.dataType, FLT_T) else "?")
    bad = []
    for c in duck_df.columns:
        k = duck_df[c].dtype.kind  # 'i','u','f','b','M','O',...
        okind = "i" if k in "iu" else "f" if k == "f" else "?"
        if okind == "f" and duck_df[c].isna().any():
            dt = (ducktypes or {}).get(c, "").upper()
            if not dt or not any(t in dt for t in
                                 ("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
                # integral declared type (or unknown): float64 is pure
                # NULL-coercion, both sides coerce identically via
                # toPandas — no hash risk
                continue
            # declared float type with NULLs: genuine float — compare
        sk = skind.get(c, "?")
        if {sk, okind} == {"i", "f"}:
            bad.append(f"{c}: spark={'int' if sk=='i' else 'float'} "
                       f"oracle={'int' if okind=='i' else 'float'}")
    return bad


def main():
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if vanilla:
        # Simulate the driver: a bare session with NONE of our factory
        # confs — __spark_entry__ must harden it itself (round-1 bug).
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[16]")
                 .appName("correctness-vanilla")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "8g")
                 .getOrCreate())
    else:
        spark = get_spark("correctness", cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_df = res.df()
            ocols = list(duck_df.columns)
            orows = list(duck_df.itertuples(index=False, name=None))
            orows = [[None if _isnull(v) else v for v in r]
                     for r in orows]  # NaN/NaT -> NULL (pandas null-coercion)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        try:
            tdesc = {r[0]: str(r[1]) for r in con.execute(
                "DESCRIBE " + oracles[name]).fetchall()}
        except Exception:
            tdesc = {}
        drift = dtype_drift(sdf, duck_df, tdesc)
        if drift:
            problems.append("dtype drift (driver hash risk): " + "; ".join(drift))
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sset = rowset(scols, [[r[c] for c in scols] for r in srows])
            oset = rowset(ocols, orows)
            if sset != oset:
                diff_s = [r for r in sset if r not in set(oset)][:3]
                diff_o = [r for r in oset if r not in set(sset)][:3]
                problems.append(f"values; spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
