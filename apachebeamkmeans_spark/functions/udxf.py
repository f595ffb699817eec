"""UDAF / UDTF registration surface.

Completes the function-registration triad (SURVEY.md §2.7 — absent in
the reference) alongside the scalar SQL UDFs in `sqludfs.py`:

- `gmean` — a **Pandas grouped-agg UDAF** (Arrow-batched; the
  sanctioned Python aggregation path — one ndarray per group crosses
  the boundary, never rows).
- `tokenize_udtf` — a **Python UDTF** (one input row → N output rows),
  the lateral-view generator shape.

Both are the slow path relative to built-ins and exist as the
*extension surface*: the hot-path operators never use them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def gmean(v: pd.Series) -> float:
    """Geometric mean of positive values (grouped-agg Pandas UDAF)."""
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """Whitespace tokenizer as a table function: (text) → one row per
    token with its position."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for pos, tok in enumerate(t for t in text.lower().split() if t):
            yield tok, pos


def register_udxfs(spark: SparkSession) -> list[str]:
    """Register the UDAF + UDTF into the session catalog for SQL use."""
    spark.udf.register("gmean", gmean)
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return ["gmean", "tokenize_udtf"]
