"""spark_cep_spark — a PySpark-native analytics + CEP engine.

A brand-new engine with the query and data-processing capabilities of
Samsung/spark-cep (continuous SQL over event streams + complex event
processing), re-expressed Spark-first on PySpark 4: DataFrame/SQL API,
Catalyst/AQE optimization, Structured Streaming with watermarks and
stateful processing — plus the LLM-data-pipeline operator set (dedup,
similarity search, text analysis, multimodal columns).

Blueprint: /root/repo/SURVEY.md (§2 is the operator contract).
Note on provenance: the reference checkout at /root/reference is empty
(SURVEY §0), so design derives from the public description of the
spark-cep family (stream tables + continuous SQL + incremental window
aggregation) and the driver contract in __spark_entry__.py.
"""

from spark_cep_spark.session import get_spark
from spark_cep_spark.io import load_tables, table
from spark_cep_spark.registry import QUERIES, ORACLES, register, load_all

__all__ = [
    "get_spark",
    "load_tables",
    "table",
    "QUERIES",
    "ORACLES",
    "register",
    "load_all",
]

__version__ = "0.1.0"
