"""Public convenience API — the LogParser-equivalent surface for users
migrating from the reference library.

Reference usage (README.md:83-101 of jeromer/syslogparser):

    rfc, _ := syslogparser.DetectRFC(buff)
    p := rfc3164.NewParser(buff); p.Parse(); parts := p.Dump()

sparklog equivalents:

    # Spark DataFrame with a raw-line column -> parsed columns
    parsed = sparklog.parse_lines(df, col="raw")

    # pandas Series of raw lines -> parsed DataFrame (no Spark needed)
    parsed = sparklog.parse_lines_pandas(lines)

    # the With* injection hooks become a ParseConfig
    cfg = sparklog.ParseConfig(hostname="dummy", default_year=2025)
"""

from __future__ import annotations

import pandas as pd

from .grammar import (  # noqa: F401  (re-exported)
    RFC_3164,
    RFC_5424,
    RFC_UNKNOWN,
    ParseConfig,
    detect_rfc,
    parse_rfc3164,
    parse_rfc5424,
)


def parse_lines(df, col: str = "raw",
                cfg: ParseConfig | None = None):
    """Spark DataFrame with a raw syslog-line column -> the same rows plus
    ``rfc`` and the parsed fields (prefixed ``p_``), via the mapInArrow
    barrier.  Dialect detection is automatic; parse failures surface as
    ``p_parse_error`` values."""
    from pyspark.sql import types as T

    from .udfs import PARSED_SCHEMA, make_map_in_arrow_parser

    fn = make_map_in_arrow_parser(
        cfg, passthrough=tuple(df.columns), input_col=col,
        input_kind="raw", out_prefix="p_", emit_raw=False)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("rfc", T.IntegerType())]
        + [T.StructField(f"p_{f.name}", f.dataType)
           for f in PARSED_SCHEMA.fields])
    return df.mapInArrow(fn, schema)


def parse_tokens(df, col: str = "tokens",
                 cfg: ParseConfig | None = None):
    """Spark DataFrame with a pre-tokenized array<int> column -> parsed
    columns (the pipeline's native input shape).  The token array itself
    is NOT echoed to the output — shipping array<int> back across the
    Arrow boundary costs 10-20x the parse (see udfs.py); the decoded line
    comes back as a ``raw`` string column instead."""
    from pyspark.sql import types as T

    from .udfs import PARSED_SCHEMA, make_map_in_arrow_parser

    keep = tuple(c for c in df.columns if c != col)
    fn = make_map_in_arrow_parser(
        cfg, passthrough=keep, input_col=col,
        input_kind="tokens", out_prefix="p_")
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != col]
        + [T.StructField("raw", T.StringType()),
           T.StructField("rfc", T.IntegerType())]
        + [T.StructField(f"p_{f.name}", f.dataType)
           for f in PARSED_SCHEMA.fields])
    return df.mapInArrow(fn, schema)


def parse_lines_pandas(lines: pd.Series,
                       cfg: ParseConfig | None = None) -> pd.DataFrame:
    """pandas Series of raw lines -> parsed frame with detection (the
    library surface, no Spark session required)."""
    from .udfs import parse_syslog_frame

    cfg = cfg or ParseConfig()
    lines = lines if isinstance(lines, pd.Series) else pd.Series(lines)
    rfc = detect_rfc(lines)
    out = parse_syslog_frame(lines, rfc, cfg)
    out.insert(0, "rfc", rfc.to_numpy())
    return out
