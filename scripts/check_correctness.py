#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Dev-loop tooling only (NOT part of the shipped Scala library): after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, this script runs each
oracle_sql.json entry in DuckDB over the same parquet tables and compares
row count, column names, and a canonical value hash — approximating
CORRECTNESS_r{N}.json so mismatches surface before the round gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
           [--live-only] [--json <artifact.json>]

--live-only skips frozen `VALUES`-literal oracles (those pin outputs of
deterministic fixture kernels AT THE GENERATION SF and are wrong at any
other scale) and re-runs only the LIVE DuckDB SQL — the mode that
re-verifies the registry at sf0.1 to catch SF-dependent divergence
(overflow, tie-break density, approx-agg drift) the sf0.01 gate can't
see. --json writes the per-query verdicts as a committed artifact
(CORRECTNESS_SF01.json).
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# --- dtype-class gate (round 10) ---------------------------------------
# The driver's checker fetches the oracle result as a dataframe; DuckDB
# types outside the plain classes below degrade in that fetch (HUGEINT /
# DECIMAL -> float64), so "42" hashes as "42.0" and the query goes red
# even when every value matches (round 9's x55). fetchall() — what THIS
# script hashes with — returns Python ints for HUGEINT, so the local gate
# used to be blind to the class. DESCRIBE both sides and compare type
# classes instead of trusting the fetch.

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLOAT_TYPES = {"FLOAT", "DOUBLE"}


def type_class(t):
    t = t.upper()
    if t in _INT_TYPES:
        return "int"
    if t in _FLOAT_TYPES:
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "BAD"  # degrades to float64/object in a dataframe fetch
    return "other"  # VARCHAR/DATE/TIMESTAMP/...: string-stable


def dtype_problems(con, name, sql, out_dir):
    """Compare DuckDB-described type classes of oracle vs spark output."""
    probs = []
    ora = {r[0]: r[1] for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
    spk = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE (SELECT * FROM '{out_dir}/{name}/*.parquet')").fetchall()}
    for col, t in sorted(ora.items()):
        tc = type_class(t)
        if tc == "BAD":
            probs.append(f"oracle col {col} is {t} (degrades in df fetch; "
                         "CAST it — see graft determinism conventions)")
        elif col in spk and tc != type_class(spk[col]):
            probs.append(f"col {col} class mismatch: oracle {t} vs "
                         f"spark {spk[col]}")
    for col, t in sorted(spk.items()):
        if type_class(t) == "BAD":
            probs.append(f"spark col {col} is {t}")
    return probs


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr, type-stable
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(cols, rows):
    # Hash canonicalized rows order-insensitively: every query guarantees a
    # total ORDER BY for the semantic compare, but the *physical* fetch order
    # of a multi-file parquet glob is an engine implementation detail
    # (DuckDB glob ordering / parallel scan), not part of correctness.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, live_only=False, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if live_only:
        skipped = sorted(k for k, v in oracle.items() if "FROM (VALUES" in v)
        oracle = {k: v for k, v in oracle.items() if "FROM (VALUES" not in v}
        print(f"live-only: {len(oracle)} live oracles, "
              f"{len(skipped)} frozen VALUES oracles skipped (SF-pinned)")
    verdicts = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            verdicts[name] = {"pass": False,
                              "problems": [f"spark output unreadable: {e}"]}
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            verdicts[name] = {"pass": False,
                              "problems": [f"oracle sql error: {e}"]}
            n_fail += 1
            continue
        problems = []
        try:
            problems.extend(dtype_problems(con, name, sql, out_dir))
        except Exception as e:
            problems.append(f"dtype describe failed: {e}")
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols {got_cols} != {exp_cols}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows {len(got_rows)} != {len(exp_rows)}")
        if not problems:
            hg = table_hash(got_cols, got_rows)
            he = table_hash(exp_cols, exp_rows)
            if hg != he:
                problems.append("value hash mismatch")
                for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
                    go = [g[j] for j in sorted(range(len(got_cols)), key=lambda k: got_cols[k])]
                    eo = [e[j] for j in sorted(range(len(exp_cols)), key=lambda k: exp_cols[k])]
                    if [canon(x) for x in go] != [canon(x) for x in eo]:
                        problems.append(f"first diff row {i}: spark={go} oracle={eo}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            verdicts[name] = {"pass": False, "problems": problems}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            verdicts[name] = {"pass": True, "rows": len(got_rows)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        art = {"sf_dir": sf_dir, "mode": "live-only" if live_only else "all",
               "n_pass": n_pass, "n_fail": n_fail, "queries": verdicts}
        with open(json_out, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True, default=str)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(
        description="DuckDB oracle gate over a graft.Verify output dir")
    p.add_argument("sf_dir", help="testdata SF dir the Verify run read")
    p.add_argument("out_dir", help="graft.Verify output dir")
    p.add_argument("--live-only", action="store_true",
                   help="skip VALUES-frozen oracles (SF-pinned)")
    p.add_argument("--json", dest="json_out", metavar="PATH",
                   help="also write the verdicts as a JSON artifact")
    a = p.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, live_only=a.live_only,
                  json_out=a.json_out))
