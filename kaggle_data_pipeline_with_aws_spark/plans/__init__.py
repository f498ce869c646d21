from .registry import ORACLE_SQL, QUERIES, spark_query

__all__ = ["ORACLE_SQL", "QUERIES", "spark_query"]
