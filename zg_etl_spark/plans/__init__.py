"""Declared analytical queries — the engine's query surface.

Each module contributes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]   # DuckDB SQL equivalents (omit → rows-only check)
"""

from zg_etl_spark.plans import gate_queries, llm, pipeline, relational, streaming_queries


def all_queries():
    q = {}
    q.update(relational.QUERIES)
    q.update(pipeline.QUERIES)
    q.update(llm.QUERIES)
    q.update(streaming_queries.QUERIES)
    q.update(gate_queries.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(relational.ORACLE)
    o.update(pipeline.ORACLE)
    o.update(llm.ORACLE)
    o.update(streaming_queries.ORACLE)
    o.update(gate_queries.ORACLE)
    return o
