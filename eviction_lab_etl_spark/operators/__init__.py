"""Operator inventory (SURVEY.md §2 groups A–J, L).

Importing this package registers every operator into
``eviction_lab_etl_spark.registry`` via the ``@query`` decorator.
"""

from eviction_lab_etl_spark.operators import (  # noqa: F401
    aggregates,
    cleaning,
    clustering,
    complex,
    dedup_text,
    embeddings,
    extensions,
    filters,
    funnels,
    geo,
    incremental,
    joins,
    multimodal,
    pipelines,
    reshape,
    sampling,
    scalars,
    scans,
    setops,
    sorts,
    timeseries,
    tpch_shapes,
    training,
    udfs,
    web,
    windows,
)
