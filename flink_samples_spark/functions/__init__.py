from flink_samples_spark.functions.udfs import (
    doc_score_pandas_udf,
    weighted_avg_grouped_agg,
    words_udtf,
    zscore_applyinpandas,
)

__all__ = [
    "doc_score_pandas_udf",
    "weighted_avg_grouped_agg",
    "words_udtf",
    "zscore_applyinpandas",
]
