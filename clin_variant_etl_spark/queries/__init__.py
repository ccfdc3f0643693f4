"""Operator-parity query registry (consumed by __spark_entry__.py)."""

from .registry import REGISTRY, QuerySpec, all_queries, load, query

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "load", "query"]
