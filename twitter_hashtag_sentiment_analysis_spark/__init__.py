"""PySpark-native analytics engine with the query and data-processing
capabilities of ``fsoftwareengineer/twitter-hashtag-sentiment-analysis``.

The reference (see SURVEY.md) is a streaming sentiment pipeline:

    Twitter source -> lang/keyword filter -> JSON parse -> project(text)
      -> 60 s micro-batch -> sentiment enrichment -> NDJSON append sink

re-expressed here Spark-first:

* batch/relational surface  -> ``operators/`` (DataFrame/SQL, Catalyst-optimized)
* scalar function families  -> ``functions/``
* sentiment (Comprehend analog, ref ProcessStreamData.py:21) -> ``functions/sentiment.py``
* the streaming pipeline    -> ``streaming/pipeline.py`` (Structured Streaming)
* sources/sinks             -> ``sources/``
* LLM-pipeline extensions (dedup / similarity / multimodal / text analysis)
                            -> ``operators/dedup.py`` etc.

All queries are registered in ``registry.py``; ``/root/repo/__spark_entry__.py``
exposes them to the driver.
"""

__version__ = "0.1.0"
