"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference fraud-detection system
(`Vignesh04011/Intelligent-Fraud-Detection-System-using-Machine-Learning-and-Hadoop`),
re-expressed Spark-first (DataFrame / SQL / Catalyst / MLlib /
Structured Streaming) and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Everything here targets a real multi-executor cluster: declarative
plans (Catalyst optimizes), broadcast joins for small dims, window
functions instead of collect-and-rejoin, Arrow-batched Pandas UDFs
for the few places Python is unavoidable.
"""

from .session import get_spark
from .schema import CLAIMS_SCHEMA, CLAIMS_LABELED_SCHEMA

__version__ = "0.1.0"

__all__ = ["get_spark", "CLAIMS_SCHEMA", "CLAIMS_LABELED_SCHEMA", "__version__"]
