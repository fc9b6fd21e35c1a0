#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on oracle_sql.json (written by graft.Verify) against the same
parquet tables, and compares each query's Spark parquet output to the oracle
result: row count, column names (sorted), and a hash over the sorted values.

Both result sets are materialized through DuckDB's pandas conversion
(`.df()`), mirroring the driver's compare path. This is load-bearing: DuckDB
returns an uncast `sum(BIGINT)` as HUGEINT, which pandas converts to float64
(`23882` -> `23882.0`), while the Spark side stays int64. The cell normalizer
below deliberately keeps the int-vs-float distinction (no `23882.0` ->
`"23882"` collapse, no Decimal->int collapse) so that an oracle whose
projection would type-diverge on the driver fails HERE first. Regression
anchor: `SELECT sum(n) FROM ...` (uncast) vs a Spark bigint column MUST fail;
`sum(n)::bigint` must pass. The r4 x_len_hist / x_source_stats driver reds
were exactly this artifact slipping through the previous value-normalizing
compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import duckdb
import glob
import hashlib
import json
import math
import os
import sys
from decimal import Decimal

import numpy as np
import pandas as pd


def norm(v):
    """Canonical cell repr that preserves pandas dtype distinctions."""
    if v is None or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # a NULL in a float64 pandas column is NaN on both sides, so
            # NaN must normalize to NULL. KNOWN NARROWING: a genuine Spark
            # NaN vs an oracle NULL in a double column is indistinguishable
            # after the pandas conversion — the driver's compare has the
            # same blind spot, and matching the driver is this gate's job.
            # Queries avoid emitting NaN (0/0-style ratios are guarded).
            return "\0NULL"
        return repr(f)  # integral floats keep their ".0" — intentional
    if isinstance(v, Decimal):
        return str(v)  # no float()/int() collapse — scale is part of identity
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def frame_rows(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.to_numpy(dtype=object)]
    return rows, cols


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    n_pass = n_fail = n_rowsonly = 0
    result_dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for rd in result_dirs:
        name = os.path.basename(rd)
        rdf = con.execute(
            f"SELECT * FROM read_parquet('{rd}/*.parquet')").df()
        rrows, rcols = frame_rows(rdf)
        if name not in oracles:
            n_rowsonly += 1
            status = "ROWS-ONLY" if rrows else "ROWS-ONLY-EMPTY"
            print(f"{status:>16} {name}: {len(rrows)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
            orows, ocols = frame_rows(odf)
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE-ERR':>16} {name}: {e}")
            continue
        problems = []
        if sorted(rcols) != sorted(ocols):
            problems.append(f"cols {sorted(rcols)} != {sorted(ocols)}")
        if len(rrows) != len(orows):
            problems.append(f"rows {len(rrows)} != {len(orows)}")
        if not problems and table_hash(rrows, rcols) != table_hash(orows, ocols):
            problems.append("value hash mismatch")
            order_r = sorted(range(len(rcols)), key=lambda i: rcols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sr = sorted("\x01".join(norm(r[i]) for i in order_r) for r in rrows)
            so = sorted("\x01".join(norm(r[i]) for i in order_o) for r in orows)
            for a, b in zip(sr, so):
                if a != b:
                    problems.append(
                        f"first diff:\n  spark:  {a[:300]!r}\n  oracle: {b[:300]!r}")
                    break
        if problems:
            n_fail += 1
            print(f"{'FAIL':>16} {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"{'PASS':>16} {name}: {len(rrows)} rows")
    missing = set(oracles) - {os.path.basename(d) for d in result_dirs}
    for name in sorted(missing):
        n_fail += 1
        print(f"{'NO-RESULT':>16} {name}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
