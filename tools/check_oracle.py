#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
Reads <outdir>/oracle_sql.json, registers the sf tables as DuckDB views,
runs each oracle SQL, and compares against <outdir>/<name>/ parquet
(columns sorted by name; exact for non-floats, per-cell report for floats).
"""
import json, sys, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(row))
    return out


def canon_df(df):
    """Rows of a pandas frame as plain-Python tuples (numpy → native), so
    one .df() materialization serves both the dtype check and the value
    compare — expensive oracles must execute exactly once."""
    import numpy as np
    out = []
    for row in df.itertuples(index=False, name=None):
        cells = []
        for c in row:
            if isinstance(c, np.ndarray):
                cells.append([x.item() if isinstance(x, np.generic) else x
                              for x in c.tolist()])
            elif isinstance(c, np.generic):
                cells.append(c.item())
            else:
                cells.append(c)
        out.append(tuple(cells))
    return out


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cmp_cell(x, y) for x, y in zip(a, b))
    return a == b


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            orc = con.sql(sql)
            ocols = sorted(orc.columns)
            odf = con.sql(f"SELECT {', '.join(ocols)} FROM orc").df()
            odata = canon_df(odf)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got_rel = con.sql(
            f"SELECT * FROM read_parquet({files!r})")
        gcols = sorted(got_rel.columns)
        gdf = con.sql(f"SELECT {', '.join(gcols)} FROM got_rel").df()
        gdata = canon_df(gdf)
        if ocols != gcols:
            print(f"FAIL {name}: columns oracle={ocols} spark={gcols}")
            n_fail += 1
            continue
        # the driver's hash compare is pandas-dtype-sensitive (an int64
        # column vs a float64 column hash-mismatches even when values
        # agree) — mirror that here so dtype drift fails locally first
        odt = [str(t) for t in odf.dtypes]
        gdt = [str(t) for t in gdf.dtypes]
        if odt != gdt:
            print(f"FAIL {name}: dtypes oracle={odt} spark={gdt} cols={gcols}")
            n_fail += 1
            continue
        if len(odata) != len(gdata):
            print(f"FAIL {name}: rows oracle={len(odata)} spark={len(gdata)}")
            n_fail += 1
            continue
        bad = None
        for i, (orow, grow) in enumerate(zip(odata, gdata)):
            if not all(cmp_cell(a, b) for a, b in zip(orow, grow)):
                bad = (i, orow, grow)
                break
        if bad:
            i, orow, grow = bad
            print(f"FAIL {name}: row {i} cols={gcols}\n  oracle={orow}\n  spark ={grow}")
            n_fail += 1
        else:
            # exact-hash style double check (order + repr sensitive)
            exact = sum(1 for orow, grow in zip(odata, gdata) if orow == grow)
            tag = "" if exact == len(odata) else f"  (exact {exact}/{len(odata)}, rest within fp tolerance)"
            print(f"PASS {name}: {len(odata)} rows{tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
