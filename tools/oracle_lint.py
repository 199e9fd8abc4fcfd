#!/usr/bin/env python3
"""Oracle-artifact lint: the SparkEntry.scala oracle checklist, mechanized.

Two DuckDB representation hazards have produced driver hash mismatches with
every VALUE equal (rounds 6-7), and are guarded by convention in every
oracle (see SparkEntry.scala's scaladoc). This lint checks the conventions
SEMANTICALLY rather than by regex, so no syntactic variant slips through:

  1. HUGEINT reaching output: DuckDB widens sum(BIGINT) to int128, which
     hashes differently from Spark's int64. Detected from DESCRIBE of the
     oracle itself -- any output column typed HUGEINT/INT128 is flagged,
     however it was produced. Fix: CAST(... AS BIGINT).
  2. Signed zero reaching output: DuckDB round() preserves -0.0, Spark
     normalizes to +0.0, and the hash sees different double bits. Detected
     at the VALUE level -- every FLOAT/DOUBLE output column is scanned for
     a -0.0 bit pattern. Fix: append `+ 0.0` to the rounded expression.

Usage:
  python3 tools/oracle_lint.py <sfDir> <verifyOutDir>   # lint the suite
  python3 tools/oracle_lint.py --selftest               # prove it goes red

<verifyOutDir> is a graft.Verify output directory (only oracle_sql.json is
read). Exit 0 = clean, 1 = violations. Value-level detection runs at the
lint SF; run at the largest local SF for the widest value coverage.
"""
import sys, json, os
import duckdb


def lint(con, oracle):
    """Return [(name, violation)] over {name: sql}."""
    out = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            out.append((name, f"oracle does not parse: {e}"))
            continue
        hazard_cols = [c for c, t, *_ in desc
                       if t.upper() in ("HUGEINT", "INT128", "UHUGEINT")]
        for c in hazard_cols:
            out.append((name, f'column "{c}" is HUGEINT — an un-CAST integer '
                              f"sum reaches the output (CAST ... AS BIGINT)"))
        float_cols = [c for c, t, *_ in desc
                      if t.upper() in ("FLOAT", "DOUBLE", "REAL")]
        if not float_cols:
            continue
        probes = ", ".join(
            f'max(CASE WHEN "{c}" = 0 AND signbit("{c}") THEN 1 ELSE 0 END)'
            for c in float_cols)
        try:
            hits = con.sql(f"SELECT {probes} FROM ({sql})").fetchone()
        except Exception as e:
            out.append((name, f"signed-zero probe failed: {e}"))
            continue
        for c, hit in zip(float_cols, hits or []):
            if hit == 1:
                out.append((name, f'column "{c}" carries -0.0 — a round() of '
                                  f"a signable expression lacks the + 0.0 guard"))
    return out


def selftest():
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1::BIGINT, -1e-9), "
                "(2::BIGINT, 0.5)) v(k, x)")
    seeded = {
        "bad_hugeint": "SELECT sum(k) AS s FROM t",            # HUGEINT out
        "bad_negzero": "SELECT k, round(x, 6) AS r FROM t",    # -0.0 out
        "good": "SELECT CAST(sum(k) AS BIGINT) AS s, "
                "round(min(x), 6) + 0.0 AS r FROM t",
    }
    flags = lint(con, seeded)
    names = {n for n, _ in flags}
    assert "bad_hugeint" in names, "lint missed the seeded HUGEINT"
    assert "bad_negzero" in names, "lint missed the seeded -0.0"
    assert "good" not in names, "lint false-positived on the guarded oracle"
    print("selftest: red on both seeded violations, green on the guarded one")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    flags = lint(con, oracle)
    for name, why in flags:
        print(f"LINT {name}: {why}")
    print(f"{len(flags)} violations across {len(oracle)} oracles")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
