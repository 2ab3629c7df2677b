#!/usr/bin/env python3
"""Dev tool (driver-style, NOT part of the library): compare DuckDB oracle
result column types against the Spark parquet dump for every query.

The driver's correctness hash is computed over pandas values, so a DuckDB
type that maps to a different pandas dtype than Spark's parquet type
(HUGEINT from SUM(int), DECIMAL, ...) hash-mismatches even when the values
are identical — the r10 q_dedup_bloom failure mode. Run after `Verify`:

    sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_out"
    python3 tools/oracle_typecheck.py /root/testdata/sf0.001 /tmp/verify_out

INTEGER-vs-BIGINT differences are reported but benign (both hash as ints);
anything involving HUGEINT / DECIMAL / FLOAT-vs-DOUBLE is a real hazard.
"""
import duckdb, json, glob, os, sys

BENIGN = {frozenset({"INTEGER", "BIGINT"}), frozenset({"SMALLINT", "BIGINT"}),
          frozenset({"SMALLINT", "INTEGER"}), frozenset({"TINYINT", "INTEGER"}),
          frozenset({"TINYINT", "BIGINT"})}

def main(sf, out):
    con = duckdb.connect()
    for t in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    hazards, benign = [], []
    for qname, sql in sorted(oracles.items()):
        pq = glob.glob(f"{out}/{qname}/*.parquet")
        if not pq:
            print(f"{qname}: NO SPARK OUTPUT", file=sys.stderr)
            continue
        spark_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{pq[0]}')").fetchall()}
        oracle_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({sql})").fetchall()}
        if set(spark_t) != set(oracle_t):
            hazards.append((qname, "COLUMN SETS DIFFER", spark_t, oracle_t))
            continue
        for c in spark_t:
            if spark_t[c] != oracle_t[c]:
                row = (qname, c, spark_t[c], oracle_t[c])
                if frozenset({spark_t[c], oracle_t[c]}) in BENIGN:
                    benign.append(row)
                else:
                    hazards.append(row)
    for b in benign:
        print("benign:", *b)
    for h in hazards:
        print("HAZARD:", *h)
    print(f"checked {len(oracles)} queries: {len(hazards)} hazards, "
          f"{len(benign)} benign int-width diffs")
    return 1 if hazards else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
