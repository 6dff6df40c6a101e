"""projet_data_infrastructure_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``yanggautier/Projet_Data_Infrastructure``
(CDC/streaming ETL + batch relational transforms + flagship bonus analytics;
see SURVEY.md), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): everything is declared with the DataFrame/SQL
API so Catalyst/Tungsten pick the physical plan; Python UDFs appear only where
built-ins genuinely cannot express the semantics (external-API enrichment,
multimodal decode), and then always Arrow-batched.
"""

from projet_data_infrastructure_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
