"""sparklog — a PySpark-native syslog parse → enrich → route → aggregate
pipeline with the grammar and semantics of jeromer/syslogparser, built
Spark-first (DataFrame + Arrow-vectorized pandas UDFs, no per-row Python).
"""

__version__ = "0.1.0"
