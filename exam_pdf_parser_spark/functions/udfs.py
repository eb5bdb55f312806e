"""Vectorized scalar UDFs (SURVEY.md §2.9 inventory) — Arrow-batched
wrappers around the shared pure functions.  Use these when composing
ad-hoc DataFrame queries; the main pipeline inlines the same functions
inside its mapInPandas stages instead (fewer Python crossings).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

from ..core.textfuncs import (
    detect_question_start, is_section_header, normalize_text,
)

# re-exported here so the full §2.9 inventory lives in one module
from ..operators.compare import seqmatch_ratio  # noqa: F401


@pandas_udf(StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    """F1 — byte-exact whitespace normalization (src/evaluator.py:97-99).
    Python `re`, never JVM regexp_replace (Unicode-class parity)."""
    return s.map(lambda x: normalize_text(x) if isinstance(x, str) else None)


_QSTART_SCHEMA = StructType([
    StructField("q_num", IntegerType(), True),
    StructField("group_range", StringType(), True),
])


@pandas_udf(_QSTART_SCHEMA)
def qstart_udf(s: pd.Series) -> pd.DataFrame:
    """F3 — ordered-priority question-start detection
    (src/cropper/detector.py:20-26,235-248)."""
    nums, ranges = [], []
    for x in s:
        n, g = detect_question_start(x) if isinstance(x, str) else (None, None)
        nums.append(n)
        ranges.append(g)
    return pd.DataFrame({"q_num": nums, "group_range": ranges})


@pandas_udf(BooleanType())
def section_header_udf(s: pd.Series) -> pd.Series:
    """P3 — section-header predicate (src/cropper/detector.py:219-233)."""
    return s.map(lambda x: is_section_header(x) if isinstance(x, str) else False)
