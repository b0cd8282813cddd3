"""Grouped-aggregate pandas UDFs (Arrow-batched, one group per call).

NOTE: deliberately no ``from __future__ import annotations`` here —
``pandas_udf`` resolves the signature from live type hints.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def weighted_median_udaf():
    """Weighted-median grouped aggregate as a GROUPED_AGG pandas UDF —
    the remaining vectorized-Python API surface next to mapInPandas /
    applyInPandas / applyInPandasWithState elsewhere in the package.

    Semantics (deterministic): sort the group by (value, id); the
    weighted median is the smallest value whose cumulative weight
    doubled reaches the group's total weight. Integer weights keep the
    comparison exact — no float accumulation at the decision point.

    Scale: grouped-agg pandas UDFs hold ONE GROUP in memory at a time;
    use only when group cardinality is bounded (here: per event_type).
    For unbounded groups prefer the SQL-window formulation (the oracle
    twin) which streams through a shuffle sort instead.
    """

    @pandas_udf("double")
    def wmedian(value: pd.Series, weight: pd.Series, tie_id: pd.Series) -> float:
        df = pd.DataFrame({"v": value, "w": weight, "i": tie_id}).sort_values(
            ["v", "i"], kind="mergesort"
        )
        cum = df["w"].cumsum()
        total = int(df["w"].sum())
        return float(df.loc[(cum * 2 >= total).idxmax(), "v"])

    return wmedian
