"""walker_spark — a PySpark-native web-crawl analytics engine.

A from-scratch reimplementation of the capabilities of the reference
crawler (dankinder/walker, BSD-3, studied at /root/reference) on top of
the Spark DataFrame API:

* the Cassandra frontier (``links`` / ``segments`` / ``domain_info``)
  becomes partitioned parquet/Iceberg tables (:mod:`walker_spark.sources`),
* each crawl iteration is a batch DataFrame pipeline — dispatch →
  claim → fetch-join → parse → sinks (:mod:`walker_spark.plans`),
* the parity-critical scalar kernels (URL normalization, FNV-1/64
  fingerprints, HTML text/link extraction) live in
  :mod:`walker_spark.functions` as Arrow-vectorized pandas UDFs,
* large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) live in
  :mod:`walker_spark.operators`.

Design stance (SURVEY.md §7): DataFrame/SQL first, Catalyst optimizes;
no RDDs, no per-row Python UDFs — Python only inside Arrow-batched
pandas UDFs / mapInPandas.
"""

from walker_spark.config import WalkerConfig

__version__ = "0.1.0"

__all__ = ["WalkerConfig", "__version__"]
