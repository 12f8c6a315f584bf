"""Archiver: the reference's extract→format→load pipeline on Spark.

Reference lifecycle (/root/reference/chiv.go:87-143): resolve options
(per-call overrides a copy of constructor defaults), build
``SELECT <cols> FROM <table>``, then pipeline a row-cursor producer
into a streaming S3 multipart consumer coupled by an ``io.Pipe``.

Spark restatement (SURVEY.md §3.1): option resolution is ours; the
query is a DataFrame (``spark.table(...).select(...)`` — Catalyst owns
pushdown); the pipe is ``toLocalIterator`` (upstream stages execute
distributed + prefetched while the driver streams encoded bytes into
the storage writer), keeping memory O(one partition) regardless of row
count — the same bounded-memory guarantee the reference gets from its
pipe (README.md:130-134).

Two sink modes:
- ``distributed=False`` (default, reference parity): exactly one
  object ``bucket/key``, byte-stable encoder output.
- ``distributed=True`` (the 100 TB path): ``df.write`` emits a
  directory of part files in parallel — CSV/JSON(NDJSON)/parquet via
  Spark-native writers, YAML via a per-partition encoder. No driver
  bottleneck; use this at scale.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chiv_spark.core.errors import ArchiveError, UploadError, _UploadGuard
from chiv_spark.core.options import ArchiveOptions
from chiv_spark.core.storage import storage_for
from chiv_spark.formats import FORMATS
from chiv_spark.formats.base import Formatter, FormatterFunc


def _csv_partition_encoder(dtypes: list[T.DataType], null: str | None):
    """Executor-side CSV row encoding for the single-object fast path:
    one UTF-8 chunk per ~10k rows, rows in partition order. Per-column
    encoders are specialized from the schema — numeric/bool/date/
    timestamp renderings can never contain a quotable character
    (comma, quote, CR/LF, leading Go-space, or the literal ``\\.``),
    so only string-ish columns pay the quote scan. Output is
    byte-identical to CsvFormatter's per-row path (golden-file tests
    pin this)."""

    def enc(rows):
        from chiv_spark.formats.csv_format import _quote_field
        from chiv_spark.formats.encode import go_float_str, rfc3339, to_csv_str

        nul = "" if null is None else _quote_field(null)

        def col_fn(dt: T.DataType):
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                return lambda v: nul if v is None else str(v)
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return lambda v: nul if v is None else go_float_str(v)
            if isinstance(dt, T.DecimalType):
                return lambda v: nul if v is None else str(v)
            if isinstance(dt, T.BooleanType):
                return lambda v: nul if v is None else ("true" if v else "false")
            if isinstance(dt, T.TimestampType):
                return lambda v: nul if v is None else rfc3339(v)
            if isinstance(dt, T.DateType):
                return lambda v: nul if v is None else v.isoformat()
            return lambda v: nul if v is None else _quote_field(to_csv_str(v))

        fns = [col_fn(dt) for dt in dtypes]
        buf: list[str] = []
        for row in rows:
            buf.append(",".join(f(v) for f, v in zip(fns, row)))
            if len(buf) >= 10000:
                yield ("\n".join(buf) + "\n").encode("utf-8")
                buf = []
        if buf:
            yield ("\n".join(buf) + "\n").encode("utf-8")

    return enc


# marker prefix for per-row encode failures inside executor closures:
# the driver sees them as opaque Py4J errors, so the fast-path loop
# greps for this to re-raise with the reference's "formatting row"
# stage instead of "scanning rows" (chiv.go:189-198 distinguishes the
# two; tests/test_errors.py pins the stage names)
_ROW_ERR = "chiv-format-row"


def _json_partition_encoder(columns: list[str], placeholders: list[object], null: str | None):
    """Executor-side JSON row encoding for the single-object fast
    path: each chunk is up to ~10k comma-joined compact objects (keys
    sorted, same json_escape/json_value renderings as JsonFormatter);
    the driver writes ``[``/``]`` framing and a single ``,`` between
    consecutive chunks, so the bytes match the per-row path exactly
    (golden-file tests pin this)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def enc(rows):
        from chiv_spark.core.archiver import _ROW_ERR, _substitute
        from chiv_spark.formats.encode import json_escape, json_value

        names = [json_escape(columns[i]) for i in order]
        buf: list[str] = []
        for row in rows:
            try:
                rec = row if null is None else _substitute(row, placeholders, null)
                buf.append(
                    "{" + ",".join(
                        f"{names[k]}:{json_value(rec[i])}" for k, i in enumerate(order)
                    ) + "}"
                )
            except Exception as e:  # noqa: BLE001 — marked for stage re-wrap
                raise RuntimeError(f"{_ROW_ERR}: {e}") from e
            if len(buf) >= 10000:
                yield ",".join(buf).encode("utf-8")
                buf = []
        if buf:
            yield ",".join(buf).encode("utf-8")

    return enc


def _yaml_partition_encoder(columns: list[str], placeholders: list[object], null: str | None):
    """Executor-side YAML row encoding: one ``- key: value`` block map
    per row via the same _yaml_scalar renderings as YamlFormatter;
    rows are self-delimiting so the driver concatenates chunks with no
    framing."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def enc(rows):
        from chiv_spark.core.archiver import _ROW_ERR, _substitute
        from chiv_spark.formats.yaml_format import _yaml_scalar

        buf: list[str] = []
        for row in rows:
            try:
                rec = row if null is None else _substitute(row, placeholders, null)
                buf.append(
                    "".join(
                        f"{'- ' if k == 0 else '  '}{columns[i]}: {_yaml_scalar(rec[i])}\n"
                        for k, i in enumerate(order)
                    )
                )
            except Exception as e:  # noqa: BLE001 — marked for stage re-wrap
                raise RuntimeError(f"{_ROW_ERR}: {e}") from e
            if len(buf) >= 10000:
                yield "".join(buf).encode("utf-8")
                buf = []
        if buf:
            yield "".join(buf).encode("utf-8")

    return enc


def _resolve_format(fmt: object) -> FormatterFunc:
    if callable(fmt):
        return fmt  # custom FormatterFunc — the WithFormat extension point
    try:
        return FORMATS[str(fmt)]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; built-ins: {sorted(FORMATS)}") from None


def _parse_placeholder(placeholder: str, dtype: T.DataType) -> object:
    """Re-type the NULL placeholder per column type.

    The reference substitutes the placeholder into the raw byte record
    *before* the format-time ``parse()`` (/root/reference/chiv.go:175-181,
    chiv_formatters.go:244-276), so for typed sinks the placeholder
    must parse as the column's type (bool/int/float) or the encode
    fails; string columns keep it verbatim.
    """
    if isinstance(dtype, T.BooleanType):
        low = placeholder.lower()
        if low in ("1", "t", "true"):
            return True
        if low in ("0", "f", "false"):
            return False
        raise ValueError(f"null placeholder {placeholder!r} is not parseable as boolean")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        try:
            return int(placeholder)
        except ValueError:
            raise ValueError(f"null placeholder {placeholder!r} is not parseable as integer") from None
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        try:
            return float(placeholder)
        except ValueError:
            raise ValueError(f"null placeholder {placeholder!r} is not parseable as float") from None
    return placeholder


class _BadPlaceholder:
    """Deferred placeholder parse failure: the reference substitutes
    the placeholder into NULL cells only and parses at format time
    (chiv.go:175-181), so an int column whose placeholder is not an
    int errors only if that column actually contains a NULL."""

    def __init__(self, err: ValueError):
        self.err = err


def _try_parse_placeholder(placeholder: str, dtype: T.DataType) -> object:
    try:
        return _parse_placeholder(placeholder, dtype)
    except ValueError as e:
        return _BadPlaceholder(e)


def _substitute(row, placeholders: list[object], null: str | None) -> list[object]:
    """Replace NULL cells with their typed placeholder, raising the
    deferred parse error only when a NULL actually hits the column."""
    out = []
    for i, v in enumerate(row):
        if v is None and null is not None:
            p = placeholders[i]
            if isinstance(p, _BadPlaceholder):
                raise p.err
            out.append(p)
        else:
            out.append(v)
    return out


class Archiver:
    """Reusable session archiver (reference ``NewArchiver``,
    /root/reference/chiv.go:67-79): holds a SparkSession plus default
    options; per-call overrides never mutate the instance."""

    def __init__(self, spark: SparkSession, **defaults: object):
        self.spark = spark
        self.defaults = ArchiveOptions().merged(**defaults)

    # -- public surface (Archive / ArchiveRows analogs) ----------------

    @contextlib.contextmanager
    def _job_group(self, job_group: object):
        """Tag this thread's jobs with a cancellable group for the
        duration of one archive, then clear the thread-local
        properties — without the clear, every later job on this thread
        would stay tagged (and cancellable) as this archive."""
        if job_group is None:
            yield
            return
        sc = self.spark.sparkContext
        sc.setJobGroup(str(job_group), "chiv archive", True)
        try:
            yield
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            sc.setLocalProperty("spark.job.interruptOnCancel", None)

    def archive(self, table: str, bucket: str, **overrides: object) -> str:
        """Archive a named table (temp view / catalog table) —
        the reference's ``Archive(db, s3, table, bucket)``."""
        job_group = overrides.pop("job_group", None)
        distributed = bool(overrides.pop("distributed", False))
        opts = self.defaults.merged(**overrides)
        with self._job_group(job_group):
            try:
                df = self.spark.table(table)
                if opts.columns:
                    df = df.select(*opts.columns)  # projection pushdown is Catalyst's
            except ArchiveError:
                raise
            except Exception as e:  # noqa: BLE001
                # reference: "chiv: querying '%s': %w" (chiv.go:95)
                raise ArchiveError(f"querying '{table}'", e) from e
            return self._archive_df(df, table, bucket, opts, distributed)

    def archive_query(self, sql: str, bucket: str, **overrides: object) -> str:
        """Archive an arbitrary SQL result — the caller-supplied-cursor
        path (reference ``ArchiveRows``, chiv.go:45-52) where the
        'cursor' is any query our engine can run."""
        return self.archive_df(self.spark.sql(sql), bucket, **overrides)

    def archive_df(self, df: DataFrame, bucket: str, **overrides: object) -> str:
        """Archive any DataFrame. Key defaults to the literal
        ``table`` (+extension), matching chiv.go:224-226.

        ``job_group=`` tags the archive's Spark jobs so :meth:`cancel`
        can abort them — the ArchiveWithContext cancellation analog
        (reference chiv.go:166-169, ctx check per row)."""
        job_group = overrides.pop("job_group", None)
        distributed = bool(overrides.pop("distributed", False))
        opts = self.defaults.merged(**overrides)
        with self._job_group(job_group):
            if opts.columns:
                df = df.select(*opts.columns)
            return self._archive_df(df, "", bucket, opts, distributed)

    def cancel(self, job_group: str) -> None:
        """Cancel a running archive by its job group (cooperative
        cancellation — the ``ArchiveWithContext`` ctx analog;
        SURVEY.md §2.1-S3)."""
        self.spark.sparkContext.cancelJobGroup(str(job_group))

    # -- internals ------------------------------------------------------

    def _archive_df(
        self,
        df: DataFrame,
        table: str,
        bucket: str,
        opts: ArchiveOptions,
        distributed: bool,
    ) -> str:
        if distributed and callable(opts.format):
            # the single-object sink honors custom FormatterFunc; the
            # distributed sink writes per-partition part files with
            # built-in formatters only — silently falling back to CSV
            # would discard the caller's formatter
            raise ValueError(
                "distributed sink does not support callable formatters; "
                "pass format='csv'|'json'|'yaml' or use the single-object sink"
            )
        fmt_func = _resolve_format(opts.format)
        extension = opts.extension
        if extension is None:
            extension = getattr(fmt_func, "extension", None) or getattr(
                fmt_func(_NullSink(), df.columns), "extension", None
            )
        key = opts.key or _default_key(table, extension)
        if distributed:
            self._write_distributed(df, bucket, key, opts)
        else:
            self._stream_single_object(df, bucket, key, fmt_func, opts)
        return key

    def _stream_single_object(
        self,
        df: DataFrame,
        bucket: str,
        key: str,
        fmt_func: FormatterFunc,
        opts: ArchiveOptions,
    ) -> None:
        storage = storage_for(bucket, self.spark)
        schema = df.schema
        null = opts.null
        # Typed sinks (JSON/YAML) re-parse the placeholder per column
        # type — the reference substitutes raw bytes *before* its
        # format-time parse() (chiv.go:175-181), so e.g. a float column
        # with an unparseable placeholder errors there too. Untyped
        # sinks (CSV, custom) take the placeholder string verbatim
        # (golden postgres_with_null.csv).
        typed_sink = bool(getattr(fmt_func, "typed", False))
        placeholders: list[object] = [None] * len(schema)
        if null is not None:
            if typed_sink:
                placeholders = [_try_parse_placeholder(null, f.dataType) for f in schema.fields]
            else:
                placeholders = [null] * len(schema)
        # stage-chained error wrapping mirrors the reference's errorf
        # sites (chiv.go:145-198, unit-asserted at chiv_test.go:61-148)
        try:
            writer_cm = storage.writer(bucket, key)
            sink_raw = writer_cm.__enter__()
        except Exception as e:  # noqa: BLE001
            raise UploadError(e) from e
        # On any failure no object may remain at bucket/key: the
        # reference cancels the errgroup context, which aborts the S3
        # multipart upload so nothing appears (chiv.go:126-143). A
        # truncated object surviving here could be mistaken for a
        # complete archive.
        failure: BaseException | None = None
        try:
            sink = _UploadGuard(sink_raw)
            formatter: Formatter = fmt_func(sink, df.columns)
            _staged(formatter.open, "downloading: opening formatter")
            # Built-in-format fast paths: rows are stateless encodings,
            # so formatting runs ON THE EXECUTORS (mapPartitions → byte
            # chunks) and the driver only concatenates chunks in
            # partition order, inserting the format's inter-chunk
            # separator (JSON's ``,``) — same bytes as the per-row
            # formatter, ~#cores× the throughput. Driver memory stays
            # one chunk (toLocalIterator). The open()/close() framing
            # (CSV header, JSON brackets) still runs on the driver via
            # the formatter itself.
            if fmt_func is FORMATS.get("csv"):
                fast = ("", _csv_partition_encoder([f.dataType for f in schema.fields], null))
            elif fmt_func is FORMATS.get("json"):
                fast = (",", _json_partition_encoder(df.columns, placeholders, null))
            elif fmt_func is FORMATS.get("yaml"):
                fast = ("", _yaml_partition_encoder(df.columns, placeholders, null))
            else:
                fast = None
            if fast is not None:
                sep, encoder = fast
                # The encoder closure imports chiv_spark ON the
                # workers, whose import path does not include the repo
                # root unless the driver happened to run from it — ship
                # the package first (same guard the distributed sinks
                # have; without it any driver launched from another cwd
                # dies here with ModuleNotFoundError).
                from chiv_spark.pyship import ensure_shipped

                ensure_shipped(df.sparkSession)
                # A LIMIT (or coalesce) upstream collapses the plan to
                # ONE partition, so the Python row encode — the hot
                # loop of this path — runs on a single core while the
                # rest idle (measured: 100k lineitem rows to YAML,
                # ~2.4 s of encode on one core). When the input is
                # single-partitioned and the size estimate clears
                # ``spark.chiv.archive.spreadBytes`` (default 8 MiB),
                # range-repartition on a sequential row id: global
                # order (and therefore the output bytes) is preserved
                # — range partitions of a totally ordered unique key
                # concatenate back in order — while the encode fans
                # out. The fan-out is deliberately SMALL
                # (``spark.chiv.archive.spreadParts``, default 2 since
                # r18): toLocalIterator schedules one job per
                # partition, and the r18 same-session sweep at BOTH
                # core counts (100k lineitem rows, best-of-5) measured
                # yaml off/2/4/8 = 5.2/3.6/4.6/7.5 s at 32 cores and
                # 3.7/2.6/2.8/3.0 at 8 — two partitions give the
                # driver sink one prefetched chunk to overlap with,
                # and anything wider just queues jobs. Small inputs
                # (the byte-parity goldens) stay on the untouched
                # one-partition path; real corpus-scale inputs arrive
                # multi-partitioned and never enter this branch.
                from chiv_spark.core.sizing import relation_size_est

                src = df
                # memoized input-file-size signal (r18): replaces the
                # per-call optimizedPlan().stats() optimizer run
                est = relation_size_est(df)
                if est >= 1 << 62:
                    # unknown size: keep the untouched one-partition
                    # path (the pre-spread behavior for odd inputs)
                    est = 0
                gate = int(
                    df.sparkSession.conf.get(
                        "spark.chiv.archive.spreadBytes", str(8 << 20)
                    )
                )
                if est > gate and df.rdd.getNumPartitions() == 1:
                    n = int(
                        df.sparkSession.conf.get("spark.chiv.archive.spreadParts", "2")
                    )
                    # collision-free helper name: withColumn over an
                    # existing user column would silently REPLACE it
                    # and drop() would then erase the user's data from
                    # the archived output (r17 advice)
                    rid = "__rid"
                    while rid in df.columns:
                        rid = "_" + rid
                    src = (
                        df.withColumn(rid, F.monotonically_increasing_id())
                        .repartitionByRange(n, rid)
                        .sortWithinPartitions(rid)
                        .drop(rid)
                    )
                chunks = iter(
                    src.rdd.mapPartitions(encoder).toLocalIterator(prefetchPartitions=True)
                )
                sep_bytes = sep.encode("utf-8")
                first = True
                while True:
                    try:
                        chunk = next(chunks, _END)
                    except ArchiveError:
                        raise
                    except Exception as e:  # noqa: BLE001
                        # executor-side per-row failures carry the
                        # _ROW_ERR marker: surface them with the
                        # reference's formatting stage, not scanning
                        if _ROW_ERR in str(e):
                            raise ArchiveError("downloading: formatting row", e) from e
                        raise ArchiveError("downloading: scanning rows", e) from e
                    if chunk is _END:
                        break
                    if sep_bytes and not first:
                        sink.write(sep_bytes)
                    sink.write(chunk)
                    first = False
            else:
                # toLocalIterator: upstream computes distributed; the
                # driver holds at most one partition — the io.Pipe
                # analog. Row iteration failures (incl. job
                # cancellation) wrap as the reference's scanning stage
                # (chiv.go:189-191). The loop avoids per-row closures
                # (this is the driver-bound hot path): exceptions are
                # stage-wrapped in-place instead.
                rows = iter(df.toLocalIterator(prefetchPartitions=True))
                format_row = formatter.format_row
                while True:
                    try:
                        row = next(rows, _END)
                    except ArchiveError:
                        raise
                    except Exception as e:  # noqa: BLE001
                        raise ArchiveError("downloading: scanning rows", e) from e
                    if row is _END:
                        break
                    try:
                        format_row(row if null is None else _substitute(row, placeholders, null))
                    except ArchiveError:
                        raise  # UploadError from the sink guard keeps its stage
                    except Exception as e:  # noqa: BLE001
                        raise ArchiveError("downloading: formatting row", e) from e
            _staged(formatter.close, "downloading: closing formatter")
        except BaseException as e:
            failure = e
            raise
        finally:
            close_exc: BaseException | None = None
            try:
                if failure is not None:
                    # give the storage the real exception: backends with
                    # transactional uploads (S3 multipart) abort instead
                    # of finalizing — the reference's errgroup-ctx path
                    writer_cm.__exit__(type(failure), failure, failure.__traceback__)
                else:
                    writer_cm.__exit__(None, None, None)
            except BaseException as e:  # noqa: BLE001
                close_exc = e
            if failure is not None or close_exc is not None:
                try:
                    storage.delete(bucket, key)
                except Exception:  # noqa: BLE001, S110
                    pass  # best-effort cleanup; the primary error wins
            if close_exc is not None:
                if failure is None:
                    raise UploadError(close_exc) from close_exc
                # the in-flight ArchiveError keeps propagating; record
                # the close failure instead of masking the original
                failure.add_note(f"additionally, closing the upload failed: {close_exc!r}")

    def _write_distributed(self, df: DataFrame, bucket: str, key: str, opts: ArchiveOptions) -> None:
        """Scale path: parallel part files under ``bucket/key/``."""
        fmt = opts.format if isinstance(opts.format, str) else None
        if bucket.startswith("s3://"):
            # direct S3 API: each partition uploads its own part object
            # from the executors (no Hadoop connector, no driver relay)
            from chiv_spark.core.s3dist import write_distributed_s3

            write_distributed_s3(df, bucket, key, fmt or "csv", opts.null)
            return
        path = f"{bucket.rstrip('/')}/{key}"
        if fmt == "csv":
            w = df.write.mode("overwrite").option("header", True)
            if opts.null is not None:
                w = w.option("nullValue", opts.null).option("emptyValue", "")
            w.csv(path)
        elif fmt == "json":
            # NDJSON at scale (documented divergence from the reference's
            # single-array framing, which cannot be produced in parallel)
            out = df
            if opts.null is not None:
                out = out.select(
                    *[F.coalesce(F.col(c).cast("string"), F.lit(opts.null)).alias(c) for c in df.columns]
                )
            out.write.mode("overwrite").json(path)
        elif fmt == "yaml":
            _write_yaml_parts(df, path, opts.null)
        else:
            df.write.mode("overwrite").parquet(path)


def _default_key(table: str, extension: str | None) -> str:
    table = table or "table"  # ArchiveRows default key (chiv.go:224-226)
    return f"{table}.{extension}" if extension else table


def _write_yaml_parts(df: DataFrame, path: str, null: str | None) -> None:
    """YAML has no Spark-native writer: encode per partition with the
    same YamlFormatter (open/format/close per partition — the
    reference's Formatter lifecycle mapped onto partitions,
    SURVEY.md §2.10), emitted as a text file per part."""
    from chiv_spark.formats.yaml_format import YamlFormatter
    from chiv_spark.pyship import ensure_shipped

    # the partition closure references YamlFormatter by module path:
    # ship the package so workers can import it from any driver cwd
    ensure_shipped(df.sparkSession)

    columns = df.columns
    schema = df.schema
    placeholders: list[object] = [None] * len(columns)
    if null is not None:
        placeholders = [_try_parse_placeholder(null, f.dataType) for f in schema.fields]

    def encode_partition(rows):
        import io

        from chiv_spark.core.archiver import _substitute

        buf = io.BytesIO()
        f = YamlFormatter(buf, columns)
        f.open()
        for row in rows:
            f.format_row(_substitute(row, placeholders, null))
        f.close()
        text = buf.getvalue().decode("utf-8")
        if text:
            yield (text,)

    df.rdd.mapPartitions(encode_partition).toDF(["value"]).write.mode("overwrite").text(path)


_END = object()  # iterator-exhausted sentinel for the scanning stage


def _staged(fn, stage: str):
    """Run one pipeline stage, wrapping non-upload failures with the
    stage-chained message (upload errors keep their own stage)."""
    try:
        return fn()
    except ArchiveError:
        raise
    except Exception as e:  # noqa: BLE001
        raise ArchiveError(stage, e) from e


class _NullSink:
    def write(self, data: bytes) -> None:
        pass


# -- module-level conveniences (reference package-level funcs, chiv.go:27-52)


def archive(spark: SparkSession, table: str, bucket: str, **options: object) -> str:
    return Archiver(spark).archive(table, bucket, **options)


def archive_df(df: DataFrame, bucket: str, **options: object) -> str:
    return Archiver(df.sparkSession).archive_df(df, bucket, **options)
