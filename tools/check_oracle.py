#!/usr/bin/env python3
"""Local self-check of SparkEntry oracles, mirroring the driver's t2 tier.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, and
compares row counts, column names, and values (sorted columns-by-name,
sorted rows; exact for non-floats, 1e-9 rel for floats). Exit 1 on any
mismatch so this can gate commits.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pa_ds


def norm_dtype(t):
    """Normalize arrow types to what the value-hash actually distinguishes.

    Timezone annotation and string width are representation details the
    driver's compare tolerates; int64 vs decimal128(38,0) (DuckDB HUGEINT
    sums) is NOT — that class must fail here, like it fails at the driver.
    """
    s = str(t)
    if s.startswith('timestamp'):
        return 'timestamp'
    if s in ('string', 'large_string'):
        return 'string'
    # float32 vs float64 stays DISTINCT: the driver's typed hash compare is
    # bit-exact, and float-vs-double tolerance there is unconfirmed — the
    # r1 hash-green evidence only covers integer widths
    if s.startswith('halffloat'):
        return 'double'
    # plain integer widths hash identically at the driver (r1 evidence:
    # spark int32 vs duckdb int64 queries were hash-green); decimal128
    # (DuckDB HUGEINT sums) does NOT — keep it distinct
    if s in ('int8', 'int16', 'int32', 'int64', 'uint8', 'uint16',
             'uint32', 'uint64'):
        return 'int'
    if s.startswith(('list<', 'large_list<')):
        # the inner FIELD NAME is an arrow representation detail (spark
        # writes 'element', duckdb 'l'); the element TYPE stays strict
        import pyarrow as pa
        elem = norm_dtype(t.value_type)
        return f'list<{elem}>'
    return s


def dtype_mismatch(spark_dir, duck_arrow):
    spark_schema = pa_ds.dataset(spark_dir, format='parquet').schema
    duck_types = {f.name: norm_dtype(f.type) for f in duck_arrow.schema}
    spark_types = {f.name: norm_dtype(f.type) for f in spark_schema
                   if f.name in duck_types}
    diffs = [f'{c}: spark={spark_types[c]} oracle={duck_types[c]}'
             for c in sorted(duck_types)
             if c in spark_types and spark_types[c] != duck_types[c]]
    return '; '.join(diffs) if diffs else None


def norm(v):
    if isinstance(v, float):
        return ('f', v)
    return ('o', str(v))


def rows_key(r):
    return [str(x) for x in r]


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f'row count {len(spark_rows)} vs {len(duck_rows)}'
    # sort by non-float columns first: float ulp differences between the
    # engines must not change row pairing
    def sort_key(r):
        nonf = [str(x) for x in r if not isinstance(x, float)]
        return (nonf, [str(x) for x in r])
    srt_s = sorted(spark_rows, key=sort_key)
    srt_d = sorted(duck_rows, key=sort_key)
    # exact string compare first; the float-tolerant fallback applies ONLY
    # when neither side is a Decimal — the driver's typed hash is bit-exact
    # on decimal128, so a one-cent drift on a billion-dollar sum (2e-12
    # relative) must go red HERE, not only at the driver (the r8 q223
    # failure mode: local tolerant-green, driver hash-red)
    from decimal import Decimal
    for raw_s, raw_d in zip(srt_s, srt_d):
        for va, vb in zip(raw_s, raw_d):
            a, b = str(va), str(vb)
            if a == b:
                continue
            if isinstance(va, Decimal) or isinstance(vb, Decimal):
                return (f'decimal mismatch (exact compare, driver-hash '
                        f'semantics): {a!r} vs {b!r} (cols {cols})')
            try:
                fa, fb = float(a), float(b)
                if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                    continue
            except ValueError:
                pass
            return f'value mismatch: {a!r} vs {b!r} (cols {cols})'
    return None


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / 'oracle_sql.json').read_text())
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    import time
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        pdir = out_dir / name
        if not pdir.is_dir():
            failures.append((name, 'no spark output dir'))
            continue
        try:
            # both sides through arrow->pandas: fetch_df() renders date32 as
            # datetime64 Timestamps while .arrow().to_pandas() yields
            # datetime.date — a representation-only mismatch the driver's
            # typed compare never sees
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')").arrow().to_pandas()
            duck_arrow = con.execute(sql).arrow()
            duck_df = duck_arrow.to_pandas()
        except Exception as e:
            failures.append((name, f'exec error: {e}'))
            continue
        scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
        if scols != dcols:
            failures.append((name, f'columns {scols} vs {dcols}'))
            continue
        # dtype gate: the driver hashes typed arrow values, so a BIGINT vs
        # HUGEINT-sum mismatch fails there even when the printed values match
        dt_err = dtype_mismatch(str(pdir), duck_arrow)
        if dt_err:
            failures.append((name, f'dtype mismatch: {dt_err}'))
            continue
        err = compare(name, spark_df[scols].values.tolist(),
                      duck_df[dcols].values.tolist(), scols)
        if err:
            failures.append((name, err))
        else:
            print(f'OK   {name}: {len(spark_df)} rows ({time.time() - t0:.1f}s)',
                  flush=True)
        # DRIVER-PATH PROBE (informational, never a failure): a driver
        # that fetches the ORACLE side via DuckDB .df() gets DECIMAL
        # rendered as float64 ('1234.5'), while the SPARK side read
        # through arrow->to_pandas yields decimal.Decimal('1234.50') —
        # identical VALUES, divergent str() renderings, so a str-based
        # row hash goes red with rows+schema matching (the r8/r9 q223
        # signature). Surface that drift per entry/column so a red
        # decimal-wire entry (q223b) is documented, not mysterious.
        dec_cols = [f.name for f in duck_arrow.schema
                    if str(f.type).startswith('decimal')]
        if dec_cols:
            duck_native = con.execute(sql).df()
            for c in dec_cols:
                s_r = [str(v) for v in spark_df[c].tolist()]
                d_r = [str(v) for v in duck_native[c].tolist()]
                if sorted(s_r) != sorted(d_r):
                    print(f'PROBE {name}.{c}: str-rendering drift on the '
                          f'.df() driver path (spark-arrow {s_r[:2]}... vs '
                          f'duckdb-.df() {d_r[:2]}...) — identical values '
                          f'would hash-mismatch on a str-based compare',
                          flush=True)
    for name, err in failures:
        print(f'FAIL {name}: {err}')
    rows_only = [k for k in
                 (set(p.name for p in out_dir.iterdir() if p.is_dir()) - set(oracle))
                 ]
    for name in sorted(rows_only):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir / name}/*.parquet')").fetchone()[0]
        print(f'{"OK  " if n > 0 else "FAIL"} {name}: rows-only check, {n} rows')
        if n == 0:
            failures.append((name, 'zero rows'))
    print(f'\n{len(oracle) + len(rows_only) - len(failures)}/{len(oracle) + len(rows_only)} passed')
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
