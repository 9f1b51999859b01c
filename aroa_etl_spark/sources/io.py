"""Readers and writers (SURVEY §2.1 S1-S6).

The reference stages everything through files (CSV with ``,`` or ``|``
separators, Excel dictionaries, pickles between containers) and pulls
from MSSQL with manual 1M-row fetch batching. Spark disposition:

- CSV: ``read_csv`` below — all-string by default (the pipeline is
  stringly-typed by design, SURVEY §1.2), explicit separator, header.
- Pickle handoffs (S3): dropped — Parquet is the interchange format
  (``write_parquet``/``read_parquet``); columnar, splittable, typed.
- MSSQL (S4): ``read_jdbc`` — partitioned JDBC reads replace the
  manual fetchmany loop; predicates push down through Catalyst.
- Cloud storage (S5): ``spark.read``/``write`` already accept
  ``gs://``/``s3a://`` URIs when the connector jars are deployed — no
  manual blob code; every function here passes paths through verbatim.
- Excel (S2): not a Spark-native format and the connector jar is not
  shipped here; ``read_excel_via_pandas`` converts small dimension
  sheets driver-side when pandas+openpyxl exist (standardization
  dictionaries are dimension-table sized by definition), else raises
  with guidance.

Scale notes: CSV reads are splittable when uncompressed (multiline off);
``read_csv`` keeps multiline off. Writers default to snappy parquet;
``partition_by`` exposes hive partitioning for downstream pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def all_string_schema(columns: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    header: bool = True,
    schema: T.StructType | list[str] | None = None,
    all_string: bool = True,
) -> DataFrame:
    """CSV scan (S1): ``,`` and ``|`` separated stage files.

    ``all_string=True`` (default) disables inference — every column
    arrives as StringType exactly as the reference's ``dtype=str``
    readers do. Pass a schema (or column list) to skip the header
    sampling job entirely."""
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("multiLine", False)
    )
    if isinstance(schema, list):
        schema = all_string_schema(schema)
    if schema is not None:
        reader = reader.schema(schema)
    elif not all_string:
        reader = reader.option("inferSchema", True)
    # all_string with no schema: header-only sampling, strings throughout
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, *, sep: str = ",", mode: str = "overwrite") -> None:
    """CSV sink (S6)."""
    df.write.mode(mode).option("header", True).option("sep", sep).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink — replaces the reference's pickle handoffs (S3).
    ``partition_by`` enables partition pruning for downstream readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    query_or_table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan (S4) — replaces the reference's manual
    ``cursor.fetchmany(1_000_000)`` batch loop (update-persdata.py:24-35):
    with a numeric ``partition_column`` + bounds, Spark issues
    ``num_partitions`` parallel range queries; Catalyst pushes WHERE
    predicates and column pruning into the remote SQL.

    ``query_or_table``: a table name, or a SELECT which is wrapped as a
    derived table. Requires the JDBC driver jar on the classpath (not
    shipped in this container — the function builds the plan; executing
    it without a driver raises the standard Spark error)."""
    reader = spark.read.format("jdbc").option("url", url)
    if query_or_table.strip().lower().startswith("select"):
        reader = reader.option("query", query_or_table)
    else:
        reader = reader.option("dbtable", query_or_table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_excel_via_pandas(
    spark: SparkSession, path: str, *, sheet_name: int | str = 0
) -> DataFrame:
    """Excel scan (S2) for dimension-sized sheets (standardization
    dictionaries, partner lists — column_processing.py:1231-1232):
    driver-side pandas read, broadcast-sized by assumption. For big
    Excel data, convert to CSV/Parquet upstream instead."""
    import pandas as pd  # noqa: PLC0415

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str)
    except ImportError:
        # no openpyxl on the driver: the vendored stdlib reader covers
        # the single-sheet all-string contract (sources/xlsx.py)
        from aroa_etl_spark.sources.xlsx import read_xlsx  # noqa: PLC0415

        rows = read_xlsx(path)
        if not rows:
            raise ValueError(f"{path}: empty sheet (no header row)") from None
        pdf = pd.DataFrame(rows[1:], columns=rows[0], dtype=str)
    return spark.createDataFrame(pdf.fillna(""))


def write_excel_via_pandas(
    df: DataFrame,
    path: str,
    *,
    sheet_name: str = "Sheet1",
    max_rows: int = 1_048_576,
) -> None:
    """Excel sink (S6 twin of :func:`read_excel_via_pandas`) for
    report-sized outputs — the reference hands matching results to
    researchers as xlsx (run-matching.py:96-100, postprocessing
    notebook). Driver-side by design: xlsx is a human-review format,
    not a data-exchange format; anything near ``max_rows`` (the xlsx
    hard limit) belongs in parquet/CSV sinks instead, and this raises
    rather than silently truncating."""
    try:
        import pandas as pd  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise ImportError("writing Excel needs pandas on the driver") from e

    # the header occupies sheet row 1, so at most max_rows - 1 DATA rows fit
    limited = df.limit(max_rows).toPandas()
    if len(limited) > max_rows - 1:
        raise ValueError(
            f"refusing to write more than {max_rows - 1} data rows "
            f"(+1 header row = the {max_rows}-row xlsx sheet limit); "
            "use parquet/CSV sinks for data-scale outputs"
        )
    try:
        limited.to_excel(path, sheet_name=sheet_name, index=False)
    except ImportError:
        # no xlsx engine installed: the vendored stdlib writer emits the
        # same single-sheet all-string workbook (sources/xlsx.py)
        from aroa_etl_spark.sources.xlsx import write_xlsx  # noqa: PLC0415

        write_xlsx(
            [list(limited.columns)]
            + [["" if pd.isna(v) else str(v) for v in row]
               for row in limited.itertuples(index=False)],
            path,
            sheet_name=sheet_name,
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: co-locates rows by hash of
    ``bucket_by`` at WRITE time, so downstream joins/aggregations on
    those keys skip the shuffle entirely (both sides bucketed with the
    same count → zero-Exchange sort-merge join). The 100 TB pattern for
    fact-to-fact joins that repeat across jobs.

    Bucketing requires ``saveAsTable`` (metastore-tracked layout);
    plain ``.parquet(path)`` cannot carry bucket metadata."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """JSON-lines source — the de-facto interchange format for training
    corpora. Pass ``schema`` in production: schema inference costs a
    full extra pass over 100 TB; with it, reading is a single streaming
    scan with column pruning into the JSON parser."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, UTF-8)."""
    df.write.mode(mode).json(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    spec: list[tuple[str, int]],
    *,
    trim: bool = True,
) -> DataFrame:
    """Fixed-width text source (mainframe/COBOL stage files — the
    archive-export dialect next to the reference's CSV stage files).

    ``spec`` is an ordered list of ``(column, width)``; each line is
    sliced with ``substring`` at precomputed offsets — pure column
    expressions over ``spark.read.text``, so the scan is splittable
    (newline-delimited), fully parallel, and whole-stage-codegen'd.
    All columns arrive as StringType (the pipeline's stringly-typed
    convention, SURVEY §1.2); ``trim=True`` strips the pad spaces.
    Lines shorter than an offset yield '' (substring past end), never
    an error — malformed-row policy is the caller's filter."""
    lines = spark.read.text(path)
    cols = []
    start = 1  # substring() is 1-indexed
    for name, width in spec:
        c = F.substring(F.col("value"), start, width)
        cols.append((F.rtrim(c) if trim else c).alias(name))
        start += width
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame,
    path: str,
    spec: list[tuple[str, int]],
    *,
    mode: str = "overwrite",
) -> None:
    """Fixed-width text sink: each column right-padded with spaces to
    its field width and concatenated — one ``concat`` of ``rpad`` s,
    JVM-side, one output file per task. NULLs write as all-spaces
    (indistinguishable from '' on read, as in the classic format), and
    ``rpad`` truncates overlong values — classic fixed-width semantics;
    size the widths from the domain."""
    padded = [
        F.rpad(F.coalesce(F.col(name).cast("string"), F.lit("")), width, " ")
        for name, width in spec
    ]
    df.select(F.concat(*padded).alias("value")).write.mode(mode).text(path)


def align_and_union(dfs, widen: bool = True):
    """Union frames with DRIFTED schemas — the multi-batch ingestion
    reality (a column added in March, an int that became a bigint in
    June): missing columns fill with NULL, and when ``widen`` is on,
    columns whose types differ across inputs are cast to the widest
    compatible numeric type (byte<short<int<long<float<double; any
    numeric mixed with decimal -> double) or, as the last resort, to
    string — loudly deterministic rather than silently failing the
    union. Column order follows first appearance across inputs.

    Narrow per-input projections + unionByName: no shuffle, no data
    movement beyond the union itself.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dfs = list(dfs)
    if not dfs:
        raise ValueError("align_and_union: no inputs")
    order: list[str] = []
    types: dict[str, list] = {}
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = []
            types[f.name].append(f.dataType)

    _rank = {
        T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3,
        T.FloatType(): 4, T.DoubleType(): 5,
    }

    def widest(ts):
        uniq = []
        for t in ts:
            if t not in uniq:
                uniq.append(t)
        if len(uniq) == 1:
            return uniq[0]
        if not widen:
            raise ValueError(f"type drift without widen=True: {uniq}")
        if all(t in _rank or isinstance(t, T.DecimalType) for t in uniq):
            if any(isinstance(t, T.DecimalType) for t in uniq):
                return T.DoubleType()
            return max(uniq, key=lambda t: _rank[t])
        return T.StringType()

    target = {c: widest(ts) for c, ts in types.items()}
    aligned = []
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for c in order:
            if c in have:
                col = F.col(c)
                if have[c] != target[c]:
                    col = col.cast(target[c])
                cols.append(col.alias(c))
            else:
                cols.append(F.lit(None).cast(target[c]).alias(c))
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    rows_per_file: int = 1_000_000,
) -> DataFrame:
    """Small-files compaction — the table-hygiene pass every long-lived
    100 TB lake needs: streaming sinks, incremental upserts, and
    over-parallel writers leave directories of KB-scale parquet files
    whose per-file open/footer cost dominates scans long before data
    volume does.

    Reads ``src_dir``, targets ``ceil(rows / rows_per_file)`` output
    files (an exact count, so the result layout is deterministic and
    re-runs are idempotent), round-robin repartitions to exactly that
    many write tasks, and rewrites to ``dst_dir``.  Returns a 1-row
    manifest (n_files_before, n_files_after, rows) — the action that
    runs the write.  Row-count targeting (not byte targeting) keeps the
    file count engine-replayable; production callers tune
    ``rows_per_file`` from the table's observed bytes/row.  Scale: one
    full-data round-robin shuffle — the unavoidable price of changing
    file layout — and nothing else; no window, no driver loop."""
    import os

    # mode("overwrite") deletes dst BEFORE the lazy scan of src runs —
    # a same-dir call, dst inside src, OR src inside dst (overwriting a
    # parent recursively deletes the nested source) destroys the data
    src_real = os.path.realpath(src_dir)
    dst_real = os.path.realpath(dst_dir)
    if (
        dst_real == src_real
        or dst_real.startswith(src_real + os.sep)
        or src_real.startswith(dst_real + os.sep)
    ):
        raise ValueError(
            f"compact_parquet_dir: dst_dir {dst_dir!r} and src_dir "
            f"{src_dir!r} overlap (equal or nested either way); overwrite "
            "would delete the source before it is read"
        )
    df = spark.read.parquet(src_dir)
    # file counts from the scan's file index (metadata only) — a
    # distinct() over input_file_name() would re-scan the data twice
    # just to count files (review finding)
    n_before = len(df.inputFiles())
    n_rows = df.count()
    n_out = max(1, -(-n_rows // rows_per_file))
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    n_after = len(spark.read.parquet(dst_dir).inputFiles())
    return spark.createDataFrame(
        [(n_before, n_after, n_rows)],
        "n_files_before bigint, n_files_after bigint, rows bigint",
    )
