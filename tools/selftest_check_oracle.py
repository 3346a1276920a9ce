#!/usr/bin/env python3
"""Self-test of check_oracle.py's driver-hash-faithful compare.

The r8 q223 failure mode: a one-cent decimal drift on a huge sum is
2e-12 RELATIVE, inside the float fallback's 1e-9 tolerance — local green,
driver hash-red. This test builds a tiny fixture whose "spark output"
decimal is perturbed by exactly one cent on a ~5-billion-cent sum and
asserts check_oracle goes RED on it (and green on the unperturbed twin).
Also covers the other wire types (int / double / timestamp / string /
array) with exact-match fixtures so a future compare regression in any
type's canonicalization fails here, not at the driver.

Usage: python3 tools/selftest_check_oracle.py   (exit 0 = self-test passed)
"""
import json
import shutil
import subprocess
import sys
import tempfile
from decimal import Decimal
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

HERE = Path(__file__).resolve().parent


def build(tmp, perturb_cents):
    """One 'orders' table + one spark-output dir whose sum_money decimal
    is off by `perturb_cents` from what the oracle SQL computes."""
    sf = tmp / f'sf_{perturb_cents}'
    out = tmp / f'out_{perturb_cents}'
    (out / 'q_dec').mkdir(parents=True)
    sf.mkdir()
    con = duckdb.connect()
    # ~5e9 cents total: one cent of drift is ~2e-12 relative
    con.execute(f"""
        COPY (SELECT 'A' AS k, 49999999.99 AS price UNION ALL
              SELECT 'A', 1234567.89) TO '{sf}/orders.parquet'""")
    for t in ['region', 'nation', 'customer', 'supplier', 'part',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.execute(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet'")
    sql = ("SELECT k, CAST(CAST(sum(CAST(round(price * 100) AS BIGINT)) "
           "AS DECIMAL(38,2)) / 100 AS DECIMAL(38,2)) AS sum_money, "
           "count(*) AS n, max(k) AS mk, "
           "round(sum(price) / count(*), 6) AS avg_r6, "
           "TIMESTAMP '2020-01-02 03:04:05' AS ts, "
           "[1, 2] AS arr "
           "FROM orders GROUP BY k")
    (out / 'oracle_sql.json').write_text(json.dumps({'q_dec': sql}))
    want = con.execute(sql.replace('orders', f"read_parquet('{sf}/orders.parquet')")).arrow()
    money = want.column('sum_money').to_pylist()[0] + (
        Decimal(perturb_cents) / 100)
    tbl = pa.table({
        'k': pa.array(['A']),
        'sum_money': pa.array([money], pa.decimal128(38, 2)),
        'n': want.column('n'),
        'mk': want.column('mk'),
        'avg_r6': want.column('avg_r6'),
        'ts': want.column('ts'),
        'arr': want.column('arr'),
    })
    pq.write_table(tbl, out / 'q_dec' / 'part-0.parquet')
    return out, sf


def run(out, sf):
    return subprocess.run(
        [sys.executable, str(HERE / 'check_oracle.py'), str(out), str(sf)],
        capture_output=True, text=True)


def main():
    tmp = Path(tempfile.mkdtemp(prefix='selftest_oracle_'))
    try:
        out0, sf0 = build(tmp, 0)
        r0 = run(out0, sf0)
        assert r0.returncode == 0, \
            f'unperturbed fixture must pass:\n{r0.stdout}\n{r0.stderr}'
        out1, sf1 = build(tmp, 1)
        r1 = run(out1, sf1)
        assert r1.returncode == 1, \
            f'one-cent decimal drift must go RED locally:\n{r1.stdout}'
        assert 'decimal mismatch' in r1.stdout, r1.stdout
        print('selftest OK: exact-green passes, one-cent decimal drift '
              'goes red (driver-hash semantics reproduced)')
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    main()
