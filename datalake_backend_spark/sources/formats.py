"""Format-agnostic table IO: parquet / ORC / CSV / JSON-lines.

The reference hard-wires JSON-in, parquet-out
(``Send_Data_To_DataLake/processing_vehicle.py``,
``connectors/minio_connector.py``); a general engine must also accept
the other formats fleets actually land — ORC (columnar, predicate
pushdown like parquet), CSV (ubiquitous interchange; schema REQUIRED —
inference is a full extra pass over 100 TB), and JSON-lines.

Scale notes per format:

* ``parquet`` / ``orc`` — columnar: column pruning + predicate pushdown
  reach the scan (plan-shape-tested for ORC below parquet's existing
  tests). Prefer these for anything queried more than once.
* ``csv`` / ``json`` — row formats: no pruning, no pushdown, splittable
  only when uncompressed or block-compressed. The reader requires a
  declared schema so ingest never pays an inference pass; malformed
  rows land in the PERMISSIVE corrupt column rather than failing the
  job (same quarantine contract as the JSON bronze scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROW_FORMATS = {"csv", "json"}
COLUMNAR_FORMATS = {"parquet", "orc"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``. CSV gets a header by
    default so round-trips keep column names."""
    if fmt not in ROW_FORMATS | COLUMNAR_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    opts = dict(options)
    if fmt == "csv":
        opts.setdefault("header", "true")
    df.write.format(fmt).mode(mode).options(**opts).save(path)


def read_table_fmt(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Row formats REQUIRE a declared schema
    (no inference pass) and run PERMISSIVE so bad rows quarantine
    instead of failing the scan."""
    if fmt not in ROW_FORMATS | COLUMNAR_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read.format(fmt)
    opts = dict(options)
    if fmt in ROW_FORMATS:
        if schema is None:
            raise ValueError(
                f"{fmt} requires a declared schema: inference is a full "
                "extra pass over the data"
            )
        opts.setdefault("mode", "PERMISSIVE")
        if fmt == "csv":
            opts.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**opts).load(path)
