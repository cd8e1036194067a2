#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf
tables, and compare (columns sorted by name, rows sorted, values
hashed). Dev tool only — not part of the Scala library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


class NonScalarValue(Exception):
    """A dumped/oracle cell holds a collection. The DRIVER's pandas
    canonicalizer cannot sort such columns (unhashable numpy.ndarray)
    — so the mimic must fail here too, not str() its way past it
    (that divergence is exactly how r9's q_bpe_segment shipped red)."""


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
                raise NonScalarValue(
                    f"column {cols[i]!r} holds {type(v).__name__} — "
                    "dump contract is scalar-only (use array_join/to_json)")
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x1f".join(vals))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        # dtype parity: a DuckDB HUGEINT (int128, e.g. uncast count_if /
        # list_sum) str()-compares equal to Spark's int64 but would trip
        # a schema/dtype-aware driver compare — surface it here
        got_types = {d[0]: d[1] for d in got.description}
        exp_types = {d[0]: d[1] for d in exp.description}
        dt = {c: (got_types[c], exp_types[c]) for c in got_types
              if got_types[c] != exp_types[c]}
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            fail += 1
            continue
        try:
            g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        except NonScalarValue as ns:
            print(f"FAIL {name}: {ns}")
            fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: ")
            print(f"   spark: {diffs[0][0][:200]}")
            print(f"  duckdb: {diffs[0][1][:200]}")
            fail += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
