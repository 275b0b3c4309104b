"""spark-etl-engine: a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the reference banking ETL pipeline
(Dhairyasheel24/python-etl-pipeline, surveyed in SURVEY.md) as idiomatic
Spark DataFrame operators: declared StructType schemas, a vectorized
cleansing-expression library, relational core operators, an incremental
merge layer, and LLM-training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) — every operator a pure
``DataFrame -> DataFrame`` function designed for 100 TB scale.
"""

__version__ = "0.1.0"
