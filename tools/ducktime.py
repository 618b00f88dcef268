"""Time the DuckDB side of the oracle query set: median of 3 warm runs
per query (1 warm + 3 timed), same views as tools/selfcheck.py. Used to
re-measure the BASELINE.md DuckDB column on the current host so the
graft/DuckDB ratios stay same-host comparisons when hardware drifts.

  python3 tools/ducktime.py /root/testdata/sf0.1 /tmp/verify_out [q1,q2]
"""
import duckdb, json, glob, os, sys, time

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
con.sql("SET threads TO 32")
for f in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet', '')
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
times = {}
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    try:
        con.sql(sql).fetchall()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.sql(sql).fetchall()
            ts.append(time.time() - t0)
        ts.sort()
        times[name] = ts[1]
        print(f"{name} {ts[1]:.3f}")
    except Exception as e:
        print(f"{name} ERROR {e}")
print(json.dumps(times))
