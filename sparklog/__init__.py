"""sparklog — a PySpark-native syslog parse → enrich → route → aggregate
pipeline with the grammar and semantics of jeromer/syslogparser, built
Spark-first (DataFrame + Arrow-vectorized batch parsing, no per-row
Python).

Public surface (see api.py):

    sparklog.parse_lines(df, col="raw")          # Spark, raw lines
    sparklog.parse_tokens(df, col="tokens")      # Spark, token arrays
    sparklog.parse_lines_pandas(series)          # no Spark needed
    sparklog.ParseConfig(...)                    # the With* hooks
"""

from .api import (  # noqa: F401
    RFC_3164,
    RFC_5424,
    RFC_UNKNOWN,
    ParseConfig,
    detect_rfc,
    parse_lines,
    parse_lines_pandas,
    parse_rfc3164,
    parse_rfc5424,
    parse_tokens,
)

__version__ = "0.1.0"
