"""JSONL corpus source/sink — the interchange format LLM corpora
actually ship in (one JSON object per line, typically .jsonl.gz;
Dolma/RedPajama/C4 releases are all this shape).

Spark-first: `spark.read.json` / `df.write.json` ARE the JSONL codec
(Spark treats .gz transparently on read and writes per-partition
compressed shards with `compression="gzip"`), so this module adds only
the contract a pipeline needs on top of the raw codec:

- an EXPLICIT schema on read (never schema inference — on 100 TB,
  inference is a full extra pass over the data and a silent-coercion
  hazard; `mode="FAILFAST"` turns malformed lines into errors instead
  of nulls, `columnNameOfCorruptRecord` collects them in audit mode);
- canonical column order + type enforcement on write so round-trips
  are stable;
- shard-count control: JSONL shards should mirror the parquet
  bucketing discipline (file count is the commit's serial cost —
  CLAUDE.md invariant), so the writer takes num_shards and
  repartitions ONCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: canonical documents-table schema for JSONL interchange (matches the
#: testdata documents parquet shape).
DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
    audit: bool = False,
) -> DataFrame:
    """Read a JSONL directory/file (plain or .gz) with an ENFORCED
    schema. ``audit=False`` (default) is FAILFAST: a malformed line
    fails the job loudly. ``audit=True`` keeps malformed lines in a
    ``_corrupt`` string column (PERMISSIVE) so a quality pass can
    count/quarantine them without losing the scan."""
    if audit:
        sch = schema if not isinstance(schema, str) else schema + ", _corrupt string"
        reader = spark.read.schema(sch).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt"
        )
    else:
        reader = spark.read.schema(schema).option("mode", "FAILFAST")
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int = 16,
    compress: bool = True,
) -> None:
    """Write a DataFrame as JSONL shards (one dir, part-*.json[.gz]).
    Columns are emitted in the DataFrame's order; repartition(num
    shards) bounds the file count (the serial commit cost)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1: {num_shards}")
    w = df.repartition(num_shards).write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
    num_shards: int = 16,
) -> int:
    """Ingest: JSONL -> parquet with the enforced schema; returns the
    row count (rides the write as an Observation — no second scan)."""
    from pyspark.sql import Observation

    df = read_jsonl(spark, src, schema)
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    df.repartition(num_shards).write.mode("overwrite").parquet(dst)
    return int(obs.get["rows"])
