"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01, run the matching ``oracle_sql()``
in DuckDB on the same parquet, compare row count + sorted column names +
an order-insensitive multiset of normalized values + per-column Arrow
TYPES (the driver's value hash is type-sensitive: an uncast DuckDB
integer SUM is HUGEINT/decimal128 while Spark emits int64, which
hash-mismatches even though str()-normalized values agree — round 1
shipped 4 such failures because this script only compared str() values).

Usage: python tools/check_contract.py [only_query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def canon_type(t):
    """Collapse Arrow type spellings that the driver's compare treats as
    equal while keeping decimal-ness distinct — DuckDB HUGEINT surfaces
    as decimal128(38,0) and MUST NOT equal int64.

    Calibrated against CORRECTNESS_r01.json: queries whose rank column
    was Spark int32 vs oracle int64 HASH-MATCHED in the driver, while
    int64-vs-HUGEINT ones failed — so integer widths collapse to one
    class, int-vs-decimal does not."""
    import pyarrow.types as pt

    if pt.is_dictionary(t):
        return canon_type(t.value_type)
    if pt.is_integer(t):
        return "int"
    if pt.is_string(t) or pt.is_large_string(t) or str(t) == "string_view":
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t) or str(t) == "binary_view":
        return "binary"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def type_problems(s_tbl, o_tbl):
    s_types = {f.name.lower(): canon_type(f.type) for f in s_tbl.schema}
    o_types = {f.name.lower(): canon_type(f.type) for f in o_tbl.schema}
    out = []
    for c in sorted(set(s_types) & set(o_types)):
        if s_types[c] != o_types[c]:
            out.append(f"type[{c}]: spark={s_types[c]} oracle={o_types[c]}")
    return out


def main():
    only = set(sys.argv[1:])
    import __spark_entry__ as entrymod
    from mvtspark.session import get_spark

    spark = get_spark("contract-check", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # flush dead py4j object references from the previous query BEFORE
        # timing: their lazy collection mid-query issues one detach RPC per
        # object and can stall the driver for tens of seconds
        import gc

        gc.collect()
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            s_tbl = sdf.toArrow()  # single execution; rows derived below
            srows = [
                tuple(d[c] for c in scols) for d in s_tbl.to_pylist()
            ]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            o_tbl = rel.fetch_arrow_table()
            orows = [
                tuple(d[c] for c in ocols) for d in o_tbl.to_pylist()
            ]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        problems.extend(type_problems(s_tbl, o_tbl))
        if not problems:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
                diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
                problems.append(f"values: spark-only={diff_a} oracle-only={diff_b}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, p in failures:
            print(f"  {n}: {p[:300]}")
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
