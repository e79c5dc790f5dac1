"""One-shot audit: run the FULL registry against a corpus whose money
and measure columns are stored as parquet DECIMAL instead of DOUBLE.

Storing money as DECIMAL(12,2) is the most common alternate writer
choice in a real lake. The engine's contract types every numeric
measure as DOUBLE (TESTDATA.md), so the read boundary normalizes:
``read_table`` casts DECIMAL physical columns to DOUBLE at the scan
(one columnar cast, pushdown-transparent), and the oracle's
``duck_connection`` applies the identical cast in its view
definitions -- both engines then compute on identical doubles, and the
whole registry is invariant to the writer's numeric physical type.

What the first run (round 8) looked like WITHOUT the normalization:
decimal types propagated through arithmetic into final projections
(raw-DecimalType output, rejected by the harness and hash-divergent in
the driver's value-store), and decimal-vs-double summation split in
the last ulp. With it: 205/205.

The --keys variant additionally stores every BIGINT surrogate/join key
as DECIMAL(18,0) (the classic NUMBER(18) warehouse export). The read
boundary casts scale-0 decimals to BIGINT -- a DOUBLE cast would
silently corrupt keys above 2**53 and every join on them (round-9 fix);
``duck_connection`` mirrors the same rule.

Usage: python -m tools.decimal_money_sweep [--keys] [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES

#: double columns a space/exactness-conscious writer would store as
#: DECIMAL; scales vary on purpose (prices 2, rates 4, readings 6)
MONEY_COLUMNS: dict[str, dict[str, tuple[int, int]]] = {
    "lineitem": {
        "l_extendedprice": (12, 2),
        "l_quantity": (12, 2),
        "l_discount": (8, 4),
        "l_tax": (8, 4),
    },
    "orders": {"o_totalprice": (12, 2)},
    "customer": {"c_acctbal": (12, 2)},
    "supplier": {"s_acctbal": (12, 2)},
    "part": {"p_retailprice": (12, 2)},
    "events": {"value": (18, 6)},
}


#: BIGINT surrogate/join keys a warehouse-bred writer would store as
#: DECIMAL(18,0) (the classic Oracle/Teradata NUMBER(18) export). The
#: read boundary must cast these to BIGINT, not DOUBLE: above 2**53 a
#: double silently corrupts the key and every join on it (round-9 fix,
#: sources/readers.py).
KEY_COLUMNS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build_fixture(
    d: str, src: str = "/root/testdata/sf0.01", with_keys: bool = False
) -> None:
    for t in TABLES:
        spec = dict(MONEY_COLUMNS.get(t, {}))
        if with_keys:
            spec.update({c: (18, 0) for c in KEY_COLUMNS.get(t, ())})
        if not spec:
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
            continue
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        for f, col in zip(tab.schema, tab.columns):
            if f.name in spec:
                p, s = spec[f.name]
                newt = pa.decimal128(p, s)
                if s == 0 and pa.types.is_integer(f.type):
                    # Arrow's int64->decimal cast checks the TYPE's digit
                    # range (19 > 18) rather than the values; parse via
                    # string so in-range keys cast per-value.
                    col = col.cast(pa.string()).cast(newt)
                else:
                    col = col.cast(newt)
                f = pa.field(f.name, newt)
            fields.append(f)
            arrays.append(col)
        pq.write_table(
            pa.table(arrays, schema=pa.schema(fields)), f"{d}/{t}.parquet"
        )


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    with_keys = "--keys" in argv
    argv = [a for a in argv if a != "--keys"]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="deckeys_" if with_keys else "decmoney_")
    build_fixture(d, src=src, with_keys=with_keys)
    spark = build_session("decimal-money-sweep")
    con = duck_connection(d)
    failed = 0
    for name in names:
        try:
            problems = compare_query(spark, con, name, d)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        status = "PASS" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    print(f"{len(names) - failed}/{len(names)} passed  (fixture: {d})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
