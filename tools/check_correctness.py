"""Local correctness harness mirroring the driver's t2 gate:
run every REGISTRY query on Spark and its DuckDB oracle twin,
compare row count, sorted column names, and the exact multiset of
values (floats compared bit-exact, with near-miss diagnostics).

Beyond Python-value equality, this also replays the driver's
pandas-typed canonicalization (the r2 lesson: DuckDB HUGEINT sums
materialize as float64 through fetchdf while Spark gives int64 —
equal Python values, different typed hash): both sides are pulled
through pandas and compared on dtype *kind* per column, and any
unhashable cell (list/dict/ndarray — the driver's multiset hash
chokes on those) is a failure.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from chiv_spark.queries import REGISTRY
from chiv_spark.session import get_spark
from chiv_spark.sources.catalog import TABLES


def norm(v: object) -> object:
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


# ---------------------------------------------------------------------------
# Sweep-scale value-check compaction (r14 verdict task 7).
#
# join_fuzzy_levenshtein emits 11M rows at sf0.1; its naive oracle plus
# the full row-multiset compare made it the sweep's largest single row
# (~220s, ~8% of the sf0.1 wall). For the queries below, at scale
# factors >= the threshold BOTH sides are collapsed to per-block
# aggregates — row count, dist-sum, and a sum over the shared md5-60bit
# per-row hash (mod 2^30 so an 11M-row sum stays far inside BIGINT) —
# before the compare. Equally binding: any row-level difference moves
# its block's count, dist-sum, or hash-sum w.h.p.; and the FULL row-set
# compare still runs at sf0.01 (below the threshold), so the row
# semantics themselves stay pinned every sweep.

_COMPACT_MIN_SF = 0.1
_H_MOD = 1 << 30


def _fuzzy_compact_spark(sdf):
    from pyspark.sql import functions as F

    from chiv_spark.functions.hashing import hash64

    # coalesce every field on BOTH sides: concat_ws silently skips
    # NULLs while DuckDB's || nulls the whole hash (and SUM ignores
    # it) — without the sentinel a future nullable column would make
    # the two sides diverge asymmetrically instead of failing loudly
    # (r15 advice, check_correctness.py:112)
    def _nn(c):
        return F.coalesce(c, F.lit("<null>"))

    row_h = F.pmod(
        hash64(
            F.concat_ws(
                "|",
                F.lit("fzck:"),
                _nn(F.col("key_a").cast("string")),
                _nn(F.col("key_b").cast("string")),
                _nn(F.col("name_a")),
                _nn(F.col("name_b")),
                _nn(F.col("dist").cast("string")),
            )
        ),
        F.lit(_H_MOD),
    )
    return sdf.groupBy(
        F.element_at(F.split(F.col("name_a"), " "), -1).alias("block")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("dist").cast("long").alias("dist_sum"),
        F.sum(row_h).cast("long").alias("h_sum"),
    )


def _fuzzy_compact_oracle(oracle: str) -> str:
    # COALESCE each field to the same '<null>' sentinel the Spark
    # side uses, so both hashes treat NULLs identically (see
    # _fuzzy_compact_spark)
    row_h = (
        "((('0x' || substring(md5('fzck:' || '|' "
        "|| COALESCE(key_a::VARCHAR, '<null>') || '|' "
        "|| COALESCE(key_b::VARCHAR, '<null>') || '|' "
        "|| COALESCE(name_a, '<null>') || '|' "
        "|| COALESCE(name_b, '<null>') || '|' "
        f"|| COALESCE(dist::VARCHAR, '<null>')), 1, 15))::BIGINT) % {_H_MOD})"
    )
    return f"""
    SELECT string_split(name_a, ' ')[-1] AS block,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(dist) AS BIGINT) AS dist_sum,
           CAST(SUM({row_h}) AS BIGINT) AS h_sum
    FROM ({oracle}) GROUP BY 1
    """


#: query name -> (spark-side compactor, oracle-side wrapper)
SWEEP_COMPACT = {
    "join_fuzzy_levenshtein": (_fuzzy_compact_spark, _fuzzy_compact_oracle),
}


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base[2:]) if base.startswith("sf") else 0.0
    except ValueError:
        return 0.0


def typed_shape_problems(sdf, con, oracle: str, frames=None) -> list[str]:
    """Replay the driver's pandas-typed view of both sides: per-column
    dtype-kind comparison (int-vs-float is a hash mismatch even when
    values are equal) plus an unhashable-cell scan.

    This deliberately re-executes both sides through toPandas/fetchdf
    rather than reusing the value pass's collect()/fetchall() rows:
    the two collection paths represent NULLs differently (None vs
    NaN/NaT) and type scalars differently (Python vs numpy/pandas),
    and the driver's typed hash sees the *pandas* view — deriving it
    from the Python-object rows would test a different encoding than
    the one being replayed. The ~2x harness cost is accepted — except
    for SWEEP_COMPACT queries, which pass ``frames`` (their value pass
    already went through pandas, so re-executing the heavy oracle a
    second time would buy nothing)."""
    import numpy as np

    problems: list[str] = []
    if frames is not None:
        spdf, odf = frames
    else:
        spdf = sdf.toPandas()
        odf = con.execute(oracle).fetchdf()
    if sorted(spdf.columns) != sorted(odf.columns):
        return problems  # column mismatch already reported by the value pass
    for c in sorted(spdf.columns):
        sk, ok = spdf[c].dtype.kind, odf[c].dtype.kind
        # collapse pandas kinds to the classes the driver's hash cares about
        klass = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts", "m": "td"}

        def _klass(series, kind):
            if kind != "O":
                return klass.get(kind, "obj")
            # Spark DATE columns arrive as object dtype holding
            # datetime.date cells; the driver hashes them equal to the
            # oracle's datetime64 (r2/r3 driver gates confirm) — so
            # classify object columns by their first non-null cell
            nonnull = series.dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], (dt.date, dt.datetime)):
                return "ts"
            return "obj"

        skl, okl = _klass(spdf[c], sk), _klass(odf[c], ok)
        if skl != okl:
            # pandas promotes a NULL-bearing int column to float: only
            # that specific direction is benign, and only when the
            # float-kind side actually has NaNs. Any other kind
            # mismatch (or an int/float split without nulls to explain
            # it) is a genuine typed-hash divergence.
            float_side = spdf[c] if skl == "float" else (odf[c] if okl == "float" else None)
            promotion = (
                {skl, okl} == {"int", "float"}
                and float_side is not None
                and len(float_side) > 0
                and bool(float_side.isna().any())
            )
            if not promotion:
                problems.append(
                    f"dtype kind differs on {c!r}: spark={spdf[c].dtype} oracle={odf[c].dtype}"
                    " (driver typed-hash would mismatch)"
                )
        for side, frame in (("spark", spdf), ("oracle", odf)):
            if len(frame) and frame[c].dtype.kind == "O":
                # scan the first non-null cell plus a bounded sample —
                # a column whose first cell is None/str can still hide
                # lists/ndarrays further down
                nonnull = frame[c].dropna()
                probe = list(nonnull.iloc[:20]) + ([nonnull.iloc[-1]] if len(nonnull) else [])
                for v in probe:
                    if isinstance(v, (list, dict, set, np.ndarray)):
                        problems.append(
                            f"unhashable {type(v).__name__} cells in {side} column {c!r}"
                            " (driver canonicalizer crashes on these)"
                        )
                        break
    return problems


def run(sf_dir: str, names: list[str]) -> int:
    spark = get_spark("correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        compact = (
            SWEEP_COMPACT.get(name)
            if _sf_of(sf_dir) >= _COMPACT_MIN_SF and spec.oracle is not None
            else None
        )
        oracle_sql = spec.oracle
        tag = ""
        frames = None
        try:
            sdf = spec.fn(spark, sf_dir)
            if compact:
                sdf = compact[0](sdf)
                oracle_sql = compact[1](spec.oracle)
                tag = " (per-block compacted value check)"
                # one execution per side: the value rows AND the
                # typed-shape frames both come from this pandas pull
                # (re-running the heavy oracle twice is the cost this
                # compaction exists to remove)
                spdf_c = sdf.toPandas()
                scols = list(spdf_c.columns)
                srows = [
                    tuple(norm(v) for v in row)
                    for row in spdf_c.itertuples(index=False, name=None)
                ]
            else:
                scols = sdf.columns
                srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only (no oracle), {len(srows)} rows  [{time.time()-t0:.1f}s]")
            if not srows and name != "dedup_exact":
                print(f"WARN {name}: zero rows from rows-only query")
            continue
        try:
            if compact:
                odf_c = con.execute(oracle_sql).fetchdf()
                ocols = list(odf_c.columns)
                orows = [
                    tuple(norm(v) for v in row)
                    for row in odf_c.itertuples(index=False, name=None)
                ]
                frames = (spdf_c, odf_c)
            else:
                res = con.execute(oracle_sql)
                ocols = [d[0] for d in res.description]
                orows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"row count: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            order = [scols.index(c) for c in sorted(scols)]
            oorder = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted((tuple(r[i] for i in order) for r in srows), key=repr)
            oset = sorted((tuple(r[i] for i in oorder) for r in orows), key=repr)
            if sset != oset:
                mism = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                problems.append(f"values differ; first mismatches: {mism}")
            else:
                problems.extend(
                    typed_shape_problems(sdf, con, oracle_sql, frames=frames)
                )
        if problems:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(
                f"PASS {name}: {len(srows)} rows, {len(scols)} cols"
                f"{tag}  [{time.time()-t0:.1f}s]"
            )
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(REGISTRY)
    sys.exit(1 if run(sf, names) else 0)
