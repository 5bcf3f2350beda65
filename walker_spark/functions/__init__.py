"""Scalar kernels + their Arrow-vectorized pandas UDF wrappers.

Everything here is pure Python (importable on executors without a
SparkSession) plus thin ``pandas_udf`` wrappers in :mod:`.udfs`.
"""
