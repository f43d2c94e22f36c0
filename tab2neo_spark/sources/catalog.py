"""Source-data catalog: folder/table/column metadata + provenance deletes.

The reference mirrors every load into metadata nodes ``Source Data Folder
-[:HAS_TABLE]-> Source Data Table -[:HAS_COLUMN]-> Source Data Column``
(S3, data_loaders/file_data_loader.py:227-252) and offers provenance
deletion with conditional folder GC (S5, :277-311).  Here the catalog is a
small parquet table of column-level records — queryable with plain Spark,
joinable against the model's mapping layer.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_SCHEMA = (
    "folder string, filename string, domain string, column string, "
    "dtype string, loaded_at double"
)


class SourceCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    @property
    def path(self) -> str:
        return f"{self.root}/catalog_columns"

    def _exists(self) -> bool:
        return os.path.isdir(self.path)

    def register(self, df: DataFrame, folder: str, filename: str, domain: str) -> None:
        """S3: one catalog row per column of the loaded table."""
        now = time.time()
        rows = [
            (folder, filename, domain, c, t, now) for c, t in df.dtypes
        ]
        self.spark.createDataFrame(rows, CATALOG_SCHEMA).write.mode("append").parquet(
            self.path
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], CATALOG_SCHEMA)
        return self.spark.read.parquet(self.path)

    def tables(self, folder: str | None = None) -> DataFrame:
        t = self.read().select("folder", "filename", "domain").distinct()
        return t.filter(F.col("folder") == folder) if folder else t

    def columns(self, domain: str) -> list[str]:
        return [
            r["column"]
            for r in self.read().filter(F.col("domain") == domain)
            .select("column").distinct().collect()
        ]

    def delete_file_data(self, folder: str, domain: str) -> None:
        """S5: drop one table's provenance records (file_data_loader.py:
        288-311); empty folders disappear with their last table (the
        reference's conditional folder GC falls out for free — folders
        exist only as values here)."""
        if not self._exists():
            return
        kept = self.read().filter(
            ~((F.col("folder") == folder) & (F.col("domain") == domain))
        )
        tmp = self.path + "__tmp"
        kept.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self.path)
        os.replace(tmp, self.path)

    def delete_source_data(self) -> None:
        """S5: drop the whole provenance stratum (file_data_loader.py:277-286)."""
        if self._exists():
            import shutil

            shutil.rmtree(self.path)
