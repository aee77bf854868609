#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s tables, and compares
after sorting rows and sorting columns by name. Reports schema/row/value
mismatches per query. Exact compare (no float tolerance) — matches the
worst-case interpretation of the driver's hash compare.

CHECK_MODE=hash keeps the whole compare inside DuckDB (count + two
order-independent row digests over varchar-canonicalized rows, the same
canonicalization applied to BOTH relations) — no Python row
materialization, which at sf10 turns a ~4 min/query compare into seconds.
Same strength as the sorted-row compare up to md5 collisions.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os, re, tempfile
    # Bound DuckDB instead of letting the box's OOM killer do it: big-sf
    # oracle replays (list-heavy CTEs) spill to disk past the limit.
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    # The spill dir must die with the process: DuckDB does not always
    # reap temp storage from heavy replays, and leaked spill from ONE
    # passing sf100 check (~60 GB for q97) filled the volume and crashed
    # the NEXT run's verify with ENOSPC.
    import atexit, shutil
    spill = tempfile.mkdtemp(prefix='duckck')
    atexit.register(shutil.rmtree, spill, True)
    con.execute(f"SET temp_directory='{spill}'")
    # Big-sf replays die on UNTRACKED allocations (32 threads × in-flight
    # list vectors), not the tracked cap: q20 at sf100 threw bad_alloc at
    # DUCKDB_MEM=80GB on a 128 GB box. Fewer threads = fewer concurrent
    # operator states; insertion order is irrelevant to an order-
    # independent digest compare and costs memory to preserve.
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver data = one file; GenScale output = a Spark directory
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if re.search(only, k)}
    hash_mode = os.environ.get("CHECK_MODE", "rows") == "hash"

    def digest(rel, cols):
        # Multiset row digest computed in-engine: every column varchar-cast
        # (NULL → \x01 sentinel; concat_ws would silently drop NULLs) and
        # md5'd per row; sum of 60-bit prefixes (HUGEINT accumulator, no
        # overflow below ~2^67 rows) + bit_xor of another 60-bit slice.
        row = "md5(concat_ws(chr(31), " + ", ".join(
            f'COALESCE(CAST("{c}" AS VARCHAR), chr(1))' for c in cols) + "))"
        return con.sql(
            f"SELECT count(*), sum(CAST(('0x' || substr({row}, 1, 15)) AS BIGINT)), "
            f"bit_xor(CAST(('0x' || substr({row}, 18, 15)) AS BIGINT)) FROM rel"
        ).fetchone()

    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            if hash_mode:
                duck_rel = con.sql(sql)
                duck_cols = sorted(duck_rel.columns)
                if spark_cols != duck_cols:
                    print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
                    fails += 1
                    continue
                dtypes = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
                stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
                tdiff = {c: (stypes[c], dtypes[c]) for c in spark_cols if stypes[c] != dtypes[c]}
                rel = spark_rel
                s_digest = digest(rel, spark_cols)
                rel = duck_rel
                d_digest = digest(rel, duck_cols)
                if s_digest != d_digest:
                    print(f"FAIL {name}: digest spark={s_digest} duck={d_digest} typediff={tdiff}")
                    fails += 1
                else:
                    note = f" [typediff={tdiff}]" if tdiff else ""
                    print(f"OK   {name}: {s_digest[0]} rows (hash){note}", flush=True)
                continue
            spark_rows = sorted(
                tuple(canon(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(spark_cols)} FROM spark_rel"
                ).fetchall()
            )
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            dtypes = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
            stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
            duck_rows = sorted(
                tuple(canon(v) for v in row)
                for row in con.sql(f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()
            )
            if spark_cols != duck_cols:
                print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
                fails += 1
                continue
            tdiff = {c: (stypes[c], dtypes[c]) for c in spark_cols if stypes[c] != dtypes[c]}
            if spark_rows != duck_rows:
                n = len(spark_rows)
                m = len(duck_rows)
                diff = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b][:3]
                only_s = [r for r in spark_rows[:5000] if r not in set(duck_rows)][:2]
                print(f"FAIL {name}: rows spark={n} duck={m} typediff={tdiff}")
                for a, b in diff:
                    print(f"   spark={a}\n   duck ={b}")
                if not diff and only_s:
                    print(f"   spark-only={only_s}")
                fails += 1
            else:
                note = f" [typediff={tdiff}]" if tdiff else ""
                print(f"OK   {name}: {len(spark_rows)} rows{note}")
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            fails += 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
