"""eviction_lab_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the EvictionLab/eviction-lab-etl reference pipeline.

The reference (a GNU-Make + pandas batch ETL, see SURVEY.md §1/§3 — mount was empty at
survey time, capabilities reconstructed from public knowledge at path level) is
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming covering the incremental-rebuild role of Make, plus the
LLM-data-pipeline extensions (dedup / similarity / text analysis / multimodal plumbing)
mandated by BASELINE.json.

Public API:
    build_session  — SparkSession factory with the engine's required configs
    load           — schema-aware parquet loader (incl. the timestamp[ns] recipe)
    registry       — QUERIES / ORACLES / CHECKS for the driver contract
"""

from eviction_lab_etl_spark.session import build_session, configure
from eviction_lab_etl_spark.sources.loader import TABLES, load, load_all

__all__ = ["build_session", "configure", "TABLES", "load", "load_all"]
__version__ = "0.1.0"
