"""Vectorized cleansing-expression library.

Every function here returns a pyspark ``Column`` built from native
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, Catalyst
optimizable. This replaces the reference's row-at-a-time
``Series.apply(lambda)`` transform tier (SURVEY.md §2.8, §2.11) with
expressions that vectorize and survive a 100 TB scan.

All casts use ``try_``-style forms so the library is correct under
ANSI SQL mode (Spark 4 default) — a malformed value yields the
documented default, never a task failure.
"""

from .cleansing import (
    NULL_SENTINELS,
    normalize_null_sentinels,
    safe_val,
    safe_num,
    numeric_id,
    file_md5,
)
from .dates import (
    safe_date,
    calc_age,
    tenure_days,
    duration_months,
)
from .banding import (
    band,
    customer_segment,
    risk_category,
    transaction_category,
    gender_norm,
    fraud_flag,
    region_map,
)

__all__ = [
    "NULL_SENTINELS",
    "normalize_null_sentinels",
    "safe_val",
    "safe_num",
    "numeric_id",
    "file_md5",
    "safe_date",
    "calc_age",
    "tenure_days",
    "duration_months",
    "band",
    "customer_segment",
    "risk_category",
    "transaction_category",
    "gender_norm",
    "fraud_flag",
    "region_map",
]
