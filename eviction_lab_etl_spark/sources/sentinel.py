"""Sentinel-null ingest discipline (SURVEY §4.2 item 3, reference area R5).

The reference codes missing data in-band: numeric ``-1``, blank strings, plus
boolean-ish flag columns (``low-flag``, ``imputed``, ``subbed``) in its
published data dictionary. In-band sentinels poison aggregation (a -1 rate
averages in) and comparison semantics, so this engine recodes them to real
NULLs at the source boundary — once, at ingest — while preserving the
information that a value *was* sentinel-coded as an explicit flag column.

Applied at load time, the recode is a pure projection: it fuses into the scan
stage under whole-stage codegen and costs nothing extra at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recode_sentinels(
    df: DataFrame,
    cols: list[str],
    numeric_sentinel: float = -1,
    blank_is_null: bool = True,
    flag_suffix: str = "_was_coded",
) -> DataFrame:
    """Recode in-band sentinels in ``cols`` to NULL + a boolean flag column.

    Numeric columns: ``numeric_sentinel`` → NULL. String columns: blank (or
    whitespace-only, when ``blank_is_null``) → NULL. Each recoded column gains
    ``<col><flag_suffix>`` marking rows whose value was sentinel-coded, so the
    reference's ``imputed``/``subbed`` provenance survives the recode.
    """
    dtypes = dict(df.dtypes)
    out = df
    for c in cols:
        if dtypes[c] == "string":
            is_sentinel = (
                F.trim(F.col(c)) == "" if blank_is_null else F.col(c) == ""
            )
        else:
            is_sentinel = F.col(c) == F.lit(numeric_sentinel)
        is_sentinel = F.coalesce(is_sentinel, F.lit(False))
        out = out.withColumn(
            f"{c}{flag_suffix}", is_sentinel
        ).withColumn(c, F.when(~is_sentinel, F.col(c)))
    return out
