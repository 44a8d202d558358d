"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet directory, then compares row count + (name-sorted)
columns + values order-insensitively. Used by tests and by
``python -m ziggurat_spark.oracle`` for a full sweep.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from ziggurat_spark.tables import TABLES


@dataclass
class OracleResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    duck_rows: int = -1


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s) or s.dtype == object:
            s = s.astype(str) if s.dtype == object else s.astype("boolean")
        if s.dtype == object or pd.api.types.is_string_dtype(s):
            # unify null spellings (None/NaT/nan) across engines
            s = s.where(~df[c].isna(), "<NULL>")
        out[c] = s
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        return bool(a == b)
    except (TypeError, ValueError):
        return str(a) == str(b)


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> OracleResult:
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        return OracleResult(
            name, False, f"row count {len(spdf)} != {len(oracle_pdf)}",
            len(spdf), len(oracle_pdf),
        )
    s_cols = sorted(c.lower() for c in spdf.columns)
    d_cols = sorted(c.lower() for c in oracle_pdf.columns)
    if s_cols != d_cols:
        return OracleResult(
            name, False, f"columns {s_cols} != {d_cols}", len(spdf), len(oracle_pdf)
        )
    spdf.columns = [c.lower() for c in spdf.columns]
    oracle_pdf.columns = [c.lower() for c in oracle_pdf.columns]
    a = _normalize(spdf)
    b = _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return OracleResult(
                    name,
                    False,
                    f"value mismatch col={col} sorted-row={i}: spark={x!r} duck={y!r}",
                    len(spdf),
                    len(oracle_pdf),
                )
    return OracleResult(name, True, "ok", len(spdf), len(oracle_pdf))


def check_query(spark, con, name: str, sf_dir: str) -> OracleResult:
    from ziggurat_spark.queries import all_queries

    spec = all_queries()[name]
    sdf = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        return OracleResult(name, n >= 0, f"rows-only check: {n} rows", n, -1)
    opdf = con.execute(spec.oracle).df()
    return compare(name, sdf, opdf)


def run_all(sf_dir: str, names: list[str] | None = None) -> list[OracleResult]:
    from ziggurat_spark.queries import all_queries
    from ziggurat_spark.session import get_session

    spark = get_session(app_name="oracle_sweep")
    con = duck_connection(sf_dir)
    results = []
    for name in names or sorted(all_queries()):
        try:
            results.append(check_query(spark, con, name, sf_dir))
        except Exception as exc:  # noqa: BLE001 — sweep must report all
            results.append(OracleResult(name, False, f"EXCEPTION: {exc}"))
    return results


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    res = run_all(sf, names=sys.argv[2:] or None)
    width = max(len(r.name) for r in res)
    fails = 0
    for r in res:
        mark = "PASS" if r.ok else "FAIL"
        fails += not r.ok
        print(f"{mark}  {r.name:<{width}}  {r.detail[:160]}")
    print(f"\n{len(res) - fails}/{len(res)} passed at {sf}")
    sys.exit(1 if fails else 0)
