"""Semi-structured ingestion via Spark 4's VARIANT type.

The reference's bronze layer re-parses every JSON upload against a
fixed StructType (``sources/readers.py`` mirrors that contract). The
modern Spark-4-native alternative for the open-ended parts of a
document — producer-specific ``props`` bags, evolving payloads — is
VARIANT: ``parse_json`` once into a compact binary encoding, keep the
column AS IS in bronze (no schema declared, nothing dropped), and
shred typed fields out lazily with ``variant_get`` at query time.
Against parquet, variant columns store shredded (typed sub-columns +
leftover), so common paths keep columnar pruning while rare keys stay
queryable — schema-on-read without a LongType/StringType guess frozen
into the table.

``shred_variant`` is the bridge back to the declared world: pull a
dict of (path, type) fields into ordinary typed columns in one
projection (map-only, whole-stage codegen). Missing paths yield NULL
(``variant_get`` semantics), and ``try_variant_get`` is used when
``lenient=True`` so type mismatches also degrade to NULL instead of
failing the scan — the PERMISSIVE-mode analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_variant(
    df: DataFrame, json_col: str, out_col: str = "v", drop: bool = False
) -> DataFrame:
    """``parse_json(json_col)`` → a VARIANT column. Malformed JSON
    raises (use ``try_parse_json`` semantics via ``lenient=True`` on
    :func:`shred_variant` only for field access, or quarantine
    upstream); ``drop=True`` removes the raw string after parsing."""
    out = df.withColumn(out_col, F.parse_json(F.col(json_col)))
    return out.drop(json_col) if drop else out


def variant_field(vcol: Column | str, path: str, dtype: str, lenient: bool = False) -> Column:
    """One typed field out of a VARIANT: ``variant_get(v, path, type)``
    (NULL for a missing path; ``lenient`` degrades type mismatches to
    NULL via ``try_variant_get``)."""
    c = F.col(vcol) if isinstance(vcol, str) else vcol
    get = F.try_variant_get if lenient else F.variant_get
    return get(c, path, dtype)


def shred_variant(
    df: DataFrame,
    vcol: str,
    fields: dict[str, tuple[str, str]],
    lenient: bool = False,
    keep_variant: bool = True,
) -> DataFrame:
    """Shred ``fields`` — ``{out_name: (json_path, sql_type)}`` — into
    typed columns in ONE projection. The variant column itself is kept
    by default (bronze keeps everything; silver drops it)."""
    cols = [
        variant_field(vcol, path, dtype, lenient).alias(name)
        for name, (path, dtype) in fields.items()
    ]
    out = df.select("*", *cols)
    return out if keep_variant else out.drop(vcol)
