"""Query registry package. Importing this package imports every query
module so their ``@register`` decorators populate the registry."""

from incubator_flink_spark.queries import (  # noqa: F401
    cep_queries,
    documents,
    embeddings,
    events,
    relational,
    scalar,
    tpch,
)
from incubator_flink_spark.queries.registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
