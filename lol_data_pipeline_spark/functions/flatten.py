"""Schema-driven recursive struct/array flattening.

Re-expresses the reference's recursive JSON flattener
(reference src/api/utils/utils.py:25-43) as a *pure projection*: we
walk the DataFrame's StructType (known at plan time) and emit one
``col("a.b.c").alias("a_b_c")`` per leaf. No UDF, no Python per row —
the flatten compiles to a single Project node that whole-stage
codegen executes, and column pruning still reaches the scan.

Divergence (documented): the reference flattens list elements
*without* an index so sibling elements overwrite each other
(utils.py:37-39 — the index-preserving variant is commented out at
utils.py:45-61, i.e. data loss). We implement the index-preserving
semantics: arrays of struct expand to ``name_{i}_leaf`` up to
``array_limit`` elements, or stay as array columns when
``explode_arrays=False`` and no limit is given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _leaf_cols(
    dtype: T.DataType, path: Column, name: str, array_limit: int | None, sep: str
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    if isinstance(dtype, T.StructType):
        for field in dtype.fields:
            out.extend(
                _leaf_cols(
                    field.dataType,
                    path.getField(field.name),
                    f"{name}{sep}{field.name}" if name else field.name,
                    array_limit,
                    sep,
                )
            )
    elif isinstance(dtype, T.ArrayType) and array_limit:
        for i in range(array_limit):
            # 1-based; try_ variant yields NULL past the end (ANSI mode)
            out.extend(
                _leaf_cols(
                    dtype.elementType,
                    F.try_element_at(path, F.lit(i + 1)),
                    f"{name}{sep}{i}",
                    array_limit,
                    sep,
                )
            )
    else:
        out.append((name, path))
    return out


def flatten(
    df: DataFrame, array_limit: int | None = None, sep: str = "_"
) -> DataFrame:
    """Flatten all nested structs (and optionally fixed-width arrays)
    into ``sep``-joined top-level columns. Pure select — zero shuffle."""
    cols = []
    for field in df.schema.fields:
        for name, col in _leaf_cols(
            field.dataType, F.col(field.name), field.name, array_limit, sep
        ):
            cols.append(col.alias(name))
    return df.select(*cols)
