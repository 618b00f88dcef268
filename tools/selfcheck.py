import duckdb, json, glob, os, sys
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for f in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet','')
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
for name, sql in sorted(oracles.items()):
    # a filtered Verify run (3rd arg) dumps only the named queries
    if not glob.glob(f'{outdir}/{name}/*.parquet'):
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    exp = con.sql(sql).df()
    # driver-style: sort columns by name, then compare value multisets
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns): status.append(f"COLS {list(got.columns)} vs {list(exp.columns)}")
    if len(got) != len(exp): status.append(f"ROWS {len(got)} vs {len(exp)}")
    if not status and len(got) > 0:
        gs = got.astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().reset_index(drop=True)
        es = exp.astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().reset_index(drop=True)
        n_mismatch = (gs != es).sum()
        if n_mismatch: 
            status.append(f"VALUES {n_mismatch}/{len(gs)} rows differ")
            idx = (gs != es).idxmax()
            status.append(f"  first diff: got={gs[idx]!r} exp={es[idx]!r}")
    print(name, "OK" if not status else "MISMATCH: " + "; ".join(status))
