"""Example Python UDFs that CREATE FUNCTION ... AS '<dotted.path>'
LANGUAGE PYTHON can target (the pyflink analog: functions declared with
@udf in a user module and registered by path, flink-python
pyflink/table/udf.py:317-553; DDL routing via SqlCreateFunction.java:39).

All examples are Arrow-vectorized pandas UDFs — the repo-wide rule (no
row-at-a-time Python UDFs) applies to registered functions too.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def to_upper(s: pd.Series) -> pd.Series:
    return s.str.upper()


@pandas_udf("long")
def add_one(x: pd.Series) -> pd.Series:
    return x + 1


@pandas_udf("long")
def char_count(s: pd.Series) -> pd.Series:
    return s.str.len().astype("int64")
