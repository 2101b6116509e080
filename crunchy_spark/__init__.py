"""crunchy_spark — a PySpark-native crawl/analytics engine.

A from-scratch reimplementation of the capabilities of Robokishan/Crunchy
(reference at /root/reference, snapshot 2026-03-20) on idiomatic Spark:

- RabbitMQ priority queues  -> snapshot-committed frontier table
  (reference: CrunchyCrawler/CrunchyCrawler/rabbitmq/scheduler.py:136-162)
- MongoDB URL dedup          -> partitioned Bloom bitmaps + exact anti-joins
  (reference: rabbitmq/dupefilter.py:35-44, similar_companies.py:49-68)
- Scrapy/Playwright fetch    -> partition-parallel fetch-sim over an
  image+caption payload table (input_hint in BASELINE.json)
- Scrapy XPath parse         -> Arrow-vectorized mapInPandas decode+extract
  (reference: parser/CrunchbaseDataParser.py:18-82)
- Kafka/queue streaming      -> deterministic micro-batch rounds with
  atomic multi-table snapshot commits and lineage counters

Everything here derives from public knowledge: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
