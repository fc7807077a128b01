"""Standard algorithm library (DataFrame-native implementations)."""

from graphframes_spark.lib.aggregate_messages import AggregateMessages

__all__ = ["AggregateMessages"]
