"""Data-quality operators: anti-filters, validity splits, structure
repair, sum invariants (SURVEY.md F1/F3/P10/V*).

The reference's defensive repairs and validations become declarative
operators: a skip-list is a broadcast anti-join, a validity check is a
predicate split with both branches returned, repairs are ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from owl_etl_spark.schemas import COMPOSICION_CATEGORIES


def anti_filter(df: DataFrame, skiplist: DataFrame, df_col: str, skip_col: str) -> DataFrame:
    """Drop rows whose ``df_col`` appears in the skip list (F1).

    The reference checks membership per file in a Python set
    (src/scripts/script_load.py:36-44); distributed form is a
    broadcast left-anti join — the skip list is always tiny.
    """
    return df.join(
        F.broadcast(skiplist.select(F.col(skip_col).alias("__skip"))),
        on=df[df_col] == F.col("__skip"),
        how="left_anti",
    )


def split_by_predicate(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) split — F3's date-consistency gate generalizes
    to any predicate; the invalid branch feeds the skip-list sink
    (reference: src/scripts/script_transform.py:81-114, 270-293)."""
    return df.filter(predicate), df.filter(~predicate | predicate.isNull())


def date_folder_consistency(fecha_corte_iso: Column, anio: Column, mes: Column) -> Column:
    """F3: folder-derived (year, month) must equal fecha_corte's, with
    null on either side passing (reference:
    src/scripts/script_transform.py:81-114)."""
    y = F.substring(fecha_corte_iso, 1, 4).cast("int")
    m = F.substring(fecha_corte_iso, 6, 2).cast("int")
    fy, fm = anio.cast("int"), mes.cast("int")
    return (
        y.isNull() | fy.isNull() | ((y == fy) & (m == fm))
    )


def repair_structure(df: DataFrame) -> DataFrame:
    """P10: backfill absent lists/structs on the FIC document
    (reference: src/etl/transform.py:755-784) — pure ``coalesce``.
    """
    out = df
    for list_col in ("plazo_duracion", "principales_inversiones", "rentabilidad_volatilidad"):
        if list_col in df.columns:
            out = out.withColumn(
                list_col, F.coalesce(F.col(list_col), F.expr(f"CAST(array() AS {_type_of(df, list_col)})"))
            )
    if "composicion_portafolio" in df.columns:
        fields = ", ".join(
            f"'{name}', coalesce(composicion_portafolio.{name}, "
            f"CAST(array() AS array<struct<{key}: string, participacion: double>>))"
            for name, key in COMPOSICION_CATEGORIES.items()
        )
        out = out.withColumn("composicion_portafolio", F.expr(f"named_struct({fields})"))
    return out


def _type_of(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def sum_invariant(df: DataFrame, sum_col: Column, lo: float = 0.95, hi: float = 1.05) -> DataFrame:
    """Flag rows whose participation sum falls outside [lo, hi]
    (reference warns — src/etl/transform.py:660-676; we attach a flag
    column so downstream can filter, quarantine, or alert via
    ``observe``)."""
    return df.withColumn("sum_in_range", (sum_col >= lo) & (sum_col <= hi))


def observed_counts(df: DataFrame, name: str, *metrics: Column):
    """Attach an ``Observation`` for job-metric accounting (A7) —
    replaces the reference's driver-side success/failure counters with
    executor-side accumulation (no extra action needed)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
