"""PySpark-native table-maintenance engine for Iceberg-style transcript tables.

A from-scratch engine with the table-service capabilities the reference
(`grp-db/e2e-ocsf-cyber-lakehouse-blueprint`) delegates to the Databricks platform
(auto-compaction `utilities/utils.py:87`, optimized writes `:86`, liquid
clustering `post_setup_ocsf_tables.py:44`, schema evolution
`gold_ocsf_iam_event_classes_delta_sinks.py:122`, snapshot isolation / ACID
`_resources/PIPELINE_OVERVIEW.md:319`), re-expressed as pure pyspark.sql
DataFrame plans + vectorized pandas/Arrow UDFs over a lightweight Iceberg-style
table format (Parquet data files + Avro manifests + JSON snapshot chain).

Data plane: DataFrame / Catalyst / AQE.  Metadata plane: driver-side Python.
Kernels Catalyst lacks (Z-order/Hilbert bit interleave): Arrow-batch pandas UDFs.
"""

__version__ = "0.1.0"

from .format.table import Table  # noqa: F401
from .format.catalog import Catalog  # noqa: F401
