"""File/data loaders (S1-S10 of SURVEY §2.1).

The reference's FileDataLoader reads sas7bdat/xpt/rda/xls/xlsx/csv/parquet
into pandas with metadata-only and head-100 test modes, a df.query filter,
and a column-name sanitize regex (data_loaders/file_data_loader.py:30-121),
then writes rows as Source-Data-Row nodes (:124-214).  Spark-first version:

- parquet/csv/json/orc go straight through ``spark.read`` (distributed,
  pushdown-capable);
- .rda/.rds are read by a pure-Python R-serialization parser
  (sources/rdata.py) — no pyreadr needed;
- remaining pandas-only formats (sas7bdat, xpt, xlsx) are gated behind
  import-tries and arrive via ``spark.createDataFrame(pandas_df)`` — they
  are driver-local by nature (single file, no splittable codec);
- ``load_folder`` is a glob scan, not a python loop (:255-275);
- SAS/Unix date conversions (:338-379) are pure column expressions.

Provenance columns ``_domain_ / _filename_ / _folder_`` are injected like
the reference (:194-196).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COLCHARSBL = r"[^A-Za-z0-9_]+"  # column-name sanitize (file_data_loader.py:30)

_SPARK_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".orc": "orc",
}
_PANDAS_FORMATS = {".sas7bdat", ".xpt", ".xls", ".xlsx", ".rda", ".rds"}


def sanitize_columns(df: DataFrame, pattern: str = COLCHARSBL) -> DataFrame:
    """Column-name sanitize regex (file_data_loader.py:88)."""
    mapping = {c: re.sub(pattern, "_", c) for c in df.columns}
    return df.withColumnsRenamed({k: v for k, v in mapping.items() if k != v})


def read_file(
    spark: SparkSession,
    folder: str,
    filename: str,
    query: str | None = None,
    metadataonly: bool = False,
    test_run: bool = False,
    colcharsbl: str = COLCHARSBL,
    **reader_options,
) -> DataFrame:
    """S1: format-dispatched read with the reference's modes.

    ``query`` is a SQL boolean expression pushed into the scan (the
    pandas ``df.query`` analog, file_data_loader.py:118-119);
    ``metadataonly`` returns a 0-row frame carrying only the schema
    (:96-99); ``test_run`` limits to 100 rows (:111-112).
    """
    path = os.path.join(folder, filename)
    ext = os.path.splitext(filename)[1].lower()

    if ext in _SPARK_FORMATS:
        fmt = _SPARK_FORMATS[ext]
        reader = spark.read
        if fmt == "csv":
            reader_options.setdefault("header", True)
            reader_options.setdefault("inferSchema", True)
        df = reader.format(fmt).options(**reader_options).load(path)
    elif ext in _PANDAS_FORMATS:
        df = _read_via_pandas(
            spark, path, ext, sheet_name=reader_options.get("sheet_name", 0)
        )
    else:
        raise ValueError(f"unsupported extension {ext!r}")

    df = sanitize_columns(df, colcharsbl)
    if query:
        df = df.filter(query)
    if metadataonly:
        return df.limit(0)
    if test_run:
        return df.limit(100)
    return df


def _read_via_pandas(
    spark: SparkSession, path: str, ext: str, sheet_name: str | int = 0
) -> DataFrame:
    """Driver-local exotic formats — pure-Python readers where the format
    is public (.rda/.rds via sources/rdata.py, .xlsx via sources/xlsx.py),
    import-gated pandas elsewhere (no new deps installed)."""
    import pandas as pd

    if ext in (".sas7bdat", ".xpt"):
        try:
            pdf = pd.read_sas(path)
        except ImportError as ex:  # pragma: no cover
            raise NotImplementedError(f"SAS reader unavailable: {ex}") from ex
    elif ext == ".xlsx":
        # pure-Python ECMA-376 reader (sources/xlsx.py) — live-tested, no
        # openpyxl; sheet selection like the reference's
        # load_file(..., sheet_name) (file_data_loader.py:83-88)
        from tab2neo_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(path, sheet_name=sheet_name)
    elif ext == ".xls":
        # legacy binary BIFF container — pandas/xlrd only, import-gated
        try:
            pdf = pd.read_excel(path, sheet_name=sheet_name)
        except ImportError as ex:  # pragma: no cover
            raise NotImplementedError(f"Excel reader unavailable: {ex}") from ex
    elif ext in (".rda", ".rds"):
        # pure-Python R serialization reader (sources/rdata.py) — the
        # reference (file_data_loader.py:77-80) uses pyreadr and takes the
        # FIRST object in the workspace; same semantics here
        from tab2neo_spark.sources.rdata import read_r

        objs = read_r(path)
        if not objs:
            raise ValueError(f"no R objects in {path}")
        pdf = next(iter(objs.values()))
        if not isinstance(pdf, pd.DataFrame):
            raise ValueError(f"first R object in {path} is not a data.frame")
    else:  # pragma: no cover
        raise AssertionError(ext)
    # pandas' SAS readers return CHAR columns as bytes; the reference's
    # pyreadstat yields strings — decode (latin-1 is the SAS default) and
    # strip the fixed-width padding
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(
            lambda v: isinstance(v, bytes), na_action="ignore"
        ).any():
            pdf[c] = pdf[c].map(
                lambda v: v.decode("latin-1").rstrip() if isinstance(v, bytes) else v
            )
    # NaN -> '' normalization for string cols (file_data_loader.py:115-116)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].fillna("")
    return spark.createDataFrame(pdf)


def load_file(
    spark: SparkSession,
    folder: str,
    filename: str,
    domain: str | None = None,
    **kw,
) -> DataFrame:
    """S2: read + provenance columns (file_data_loader.py:194-196). A
    string ``sheet_name`` joins the default domain like the reference's
    per-tab loads (``TEST.FIRST`` — test_load_xlsx.py:14-16)."""
    df = read_file(spark, folder, filename, **kw)
    if domain is None:
        domain = os.path.splitext(filename)[0]
        if isinstance(kw.get("sheet_name"), str):
            domain = f"{domain}.{kw['sheet_name']}"
    domain = domain.upper()
    return (
        df.withColumn("_domain_", F.lit(domain))
        .withColumn("_filename_", F.lit(filename))
        .withColumn("_folder_", F.lit(folder))
    )


def load_folder(
    spark: SparkSession,
    folder: str,
    only_files: list[str] | None = None,
    ext: str = ".parquet",
    **kw,
) -> dict[str, DataFrame]:
    """S4: load a directory; one DataFrame per file (file_data_loader.py:255-275)."""
    names = only_files or sorted(
        f for f in os.listdir(folder) if f.endswith(ext)
    )
    return {os.path.splitext(n)[0]: load_file(spark, folder, n, **kw) for n in names}


def load_file_distinct_values_for_columns(
    spark: SparkSession, folder: str, filename: str, column_list: list[str], **kw
) -> DataFrame:
    """S6 (file_data_loader.py:314-336)."""
    return read_file(spark, folder, filename, **kw).select(*column_list).distinct()


# -- S7: SAS/Unix datetime conversions ---------------------------------------

SAS_EPOCH = "1960-01-01"
DATETIME_COL_RE = r"^.*DTM$"
DATE_COL_RE = r"^.*DT$"


def convert_datetime_columns(
    df: DataFrame,
    date_format: str = "sas",
    datetime_col_regex: str = DATETIME_COL_RE,
    date_col_regex: str = DATE_COL_RE,
) -> DataFrame:
    """S7: integer date/datetime columns -> real date/timestamp types by
    column-name convention (file_data_loader.py:338-379). Pure column
    expressions; the reference loops rows in pandas.

    sas: days/seconds since 1960-01-01; unix: seconds since 1970-01-01.
    """
    dt_re = re.compile(datetime_col_regex)
    d_re = re.compile(date_col_regex)
    out = df
    for c, dtype in df.dtypes:
        if dtype not in ("int", "bigint", "double", "float"):
            continue
        if dt_re.match(c):
            if date_format == "sas":
                expr = F.timestamp_seconds(
                    F.unix_timestamp(F.lit(SAS_EPOCH).cast("date").cast("timestamp"))
                    + F.col(c).cast("long")
                )
            else:
                expr = F.timestamp_seconds(F.col(c).cast("long"))
            out = out.withColumn(c, expr)
        elif d_re.match(c):
            if date_format == "sas":
                expr = F.date_add(F.lit(SAS_EPOCH).cast("date"), F.col(c).cast("int"))
            else:
                expr = F.date_add(F.lit("1970-01-01").cast("date"), F.col(c).cast("int"))
            out = out.withColumn(c, expr)
    return out


def azure_blob_path(container: str, account: str, path: str) -> str:
    """S8: ABFS URL for an Azure Data Lake Gen2 / Blob path."""
    return f"abfss://{container}@{account}.dfs.core.windows.net/{path.lstrip('/')}"


def read_azure_file(
    spark: SparkSession,
    container: str,
    account: str,
    folder: str,
    filename: str,
    **kw,
) -> DataFrame:
    """S8 (azure_data_loader.py:51-76): the reference downloads each blob
    to a DRIVER temp dir and re-reads it locally — a single-node
    bottleneck. The Spark-first version hands the ``abfss://`` URL to the
    same :func:`read_file` dispatch so every executor reads its own split
    through the hadoop-azure ABFS connector (credentials via
    ``spark.conf fs.azure.account.key.<account>...``; the connector jar
    ships with real deployments, not this sandbox — calls here fail at
    ``spark.read`` with a clear missing-filesystem error)."""
    return read_file(
        spark, azure_blob_path(container, account, folder), filename, **kw
    )


def read_jdbc(spark: SparkSession, url: str, dbtable: str, **options) -> DataFrame:
    """S9/S10: relational pulls go straight through spark JDBC (the
    reference routes them through a Hive cursor or Neo4j apoc.load.jdbc —
    data_loaders/hive_data_loader.py:28-40, sql_server_data_loader.py:20-30).
    Requires the JDBC driver jar on the classpath at deploy time."""
    return spark.read.format("jdbc").options(url=url, dbtable=dbtable, **options).load()
