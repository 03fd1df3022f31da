from . import graph, kmeans, rdd_parity, relational, udfs

__all__ = ["graph", "kmeans", "rdd_parity", "relational", "udfs"]
