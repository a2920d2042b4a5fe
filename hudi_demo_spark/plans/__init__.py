from hudi_demo_spark.plans.queries import ORACLES, QUERIES, query_names

__all__ = ["QUERIES", "ORACLES", "query_names"]
