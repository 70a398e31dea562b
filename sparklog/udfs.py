"""Arrow-batched pandas UDF wrappers around the vectorized grammar.

One Series→DataFrame pandas UDF per parse call: the JVM ships Arrow batches
of raw strings + the detected rfc tag, Python runs the masked-column grammar
once per batch (no per-row loops), and a single struct column comes back.
This is the only JVM↔Python boundary in the pipeline; everything before
(detokenize, detect) and after (enrich, route, aggregate) stays JVM-side
under whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .grammar import (
    RFC_3164,
    RFC_5424,
    ParseConfig,
    parse_rfc3164,
    parse_rfc5424,
)

PARSED_SCHEMA = T.StructType([
    T.StructField("priority", T.IntegerType()),
    T.StructField("facility", T.IntegerType()),
    T.StructField("severity", T.IntegerType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("tz_offset_minutes", T.IntegerType()),
    T.StructField("ts_is_nil", T.BooleanType()),
    T.StructField("hostname", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("app_name", T.StringType()),
    T.StructField("proc_id", T.StringType()),
    T.StructField("msg_id", T.StringType()),
    T.StructField("structured_data", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField("parse_error", T.StringType()),
])

_INT_COLS = ["priority", "facility", "severity", "version",
             "tz_offset_minutes"]


def _to_arrow_frame(out: pd.DataFrame) -> pd.DataFrame:
    """Normalize grammar output dtypes for the Arrow return path."""
    for c in _INT_COLS:
        out[c] = out[c].astype("Int64")
    out["ts_is_nil"] = out["ts_is_nil"].astype("boolean")
    return out


def _assemble(n: int, parts, unknown: np.ndarray,
              index=None) -> pd.DataFrame:
    """Positional fill of (mask, parsed-subset-frame) parts into one frame.
    Avoids pd.concat over mixed-NA object frames (slower than the parse)."""
    from .grammar import _OUTPUT_COLUMNS

    data: dict = {}
    for c in _OUTPUT_COLUMNS:
        if c in _INT_COLS:
            flt = np.full(n, np.nan)
            for mask, df in parts:
                flt[mask] = df[c].to_numpy(dtype="float64",
                                           na_value=np.nan)
            data[c] = pd.array(flt, dtype="Int64")
        elif c == "ts":
            ts = np.full(n, np.datetime64("NaT"), dtype="M8[ns]")
            for mask, df in parts:
                ts[mask] = df[c].to_numpy(dtype="M8[ns]")
            data[c] = ts
        else:
            obj = np.full(n, None, dtype=object)
            for mask, df in parts:
                obj[mask] = df[c].to_numpy(dtype=object)
            data[c] = obj
    if unknown.any():
        pe = data["parse_error"]
        pe[unknown] = "DetectFailed"
    return pd.DataFrame(data, index=index)


def parse_syslog_frame(raw: pd.Series, rfc: pd.Series,
                       cfg: ParseConfig) -> pd.DataFrame:
    """Dispatch one batch to both grammars by detected dialect.

    Rows with rfc==UNKNOWN get a 'DetectFailed' parse_error (the reference
    caller would have no parser to construct; we make it routable data).
    """
    rfc = pd.Series(rfc, index=raw.index).fillna(0).astype(int).to_numpy()
    raw = raw.reset_index(drop=True)
    m3 = rfc == RFC_3164
    m5 = rfc == RFC_5424
    parts = []
    if m3.any():
        parts.append((m3, parse_rfc3164(raw[m3], cfg)))
    if m5.any():
        parts.append((m5, parse_rfc5424(raw[m5], cfg)))
    out = _assemble(len(raw), parts, ~(m3 | m5))
    return _to_arrow_frame(out)


def parse_tokens_arrow_frame(tokens: pd.Series,
                             cfg: ParseConfig) -> pd.DataFrame:
    """tokens -> parsed frame, Arrow end-to-end: detokenize builds a
    pa.StringArray directly (no Python string objects), detection and the
    grammar fast paths run as Arrow compute kernels; only quirk/error rows
    drop to the pandas slow path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .encoding import detokenize_arrow
    from .grammar import detect_rfc_arrow

    arr = detokenize_arrow(tokens)
    rfc = detect_rfc_arrow(arr)
    m3 = rfc == RFC_3164
    m5 = rfc == RFC_5424
    parts = []
    if m3.any():
        parts.append((m3, parse_rfc3164(pc.filter(arr, pa.array(m3)), cfg)))
    if m5.any():
        parts.append((m5, parse_rfc5424(pc.filter(arr, pa.array(m5)), cfg)))
    out = _assemble(len(rfc), parts, ~(m3 | m5))
    out.insert(0, "rfc", pd.array(rfc, dtype="Int64"))
    out["ts_is_nil"] = out["ts_is_nil"].astype("boolean")
    for c in _INT_COLS:
        out[c] = out[c].astype("Int64")
    return out


def make_parse_udf(cfg: ParseConfig | None = None):
    """pandas UDF (raw string, rfc int) -> parsed struct."""
    cfg = cfg or ParseConfig()

    @F.pandas_udf(PARSED_SCHEMA)
    def parse_syslog(raw: pd.Series, rfc: pd.Series) -> pd.DataFrame:
        return parse_syslog_frame(raw, rfc, cfg)

    return parse_syslog


# rfc joins the struct so decode+detect+parse is ONE Arrow round trip
PARSED_SCHEMA_TOKENS = T.StructType(
    [T.StructField("rfc", T.IntegerType())] + PARSED_SCHEMA.fields)


def _string_from_token_list(col):
    """pa list<int32> -> pa.StringArray without materializing per-row numpy
    arrays (the mapInArrow input-side win: ListArray values/offsets are
    used directly)."""
    import pyarrow as pa

    from .encoding import detokenize_arrow

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    lo, hi = off[0], off[-1]
    flat = vals[lo:hi]
    rel = (off - lo)
    if len(flat) == 0 or (flat < 0x80).all():
        data = flat.astype(np.uint8).tobytes()
        return pa.StringArray.from_buffers(
            len(off) - 1, pa.py_buffer(rel.astype(np.int32).tobytes()),
            pa.py_buffer(data))
    # non-ASCII fallback: slice per row via the generic pandas-side codec
    toks = pd.Series([flat[a:b] for a, b in zip(rel[:-1], rel[1:])])
    return detokenize_arrow(toks)


def parse_batch_arrow(arr, rfc: np.ndarray, cfg: ParseConfig):
    """Whole-batch parse producing Arrow arrays directly (no pandas on the
    hot path): fast-path hits keep their Arrow string buffers; only misses
    and unknown-dialect rows go through the pandas slow path; the three row
    groups are merged with one gather (take) per column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import fastpath
    from .grammar import (
        _OUTPUT_COLUMNS,
        _fast_eligible,
        _parse_rfc3164_slow,
        _parse_rfc5424_slow,
    )

    n = len(rfc)
    m3 = rfc == RFC_3164
    m5 = rfc == RFC_5424
    if not _fast_eligible(cfg):
        # injected-config jobs: pandas path throughout
        return None

    hit3 = np.zeros(n, dtype=bool)
    hit5 = np.zeros(n, dtype=bool)
    cols3: dict = {}
    cols5: dict = {}
    if m3.all():
        h3, cols3 = fastpath.parse_rfc3164_fast(arr, cfg.default_year)
        hit3 = h3
    elif m3.any():
        a3 = pc.filter(arr, pa.array(m3))
        h3, cols3 = fastpath.parse_rfc3164_fast(a3, cfg.default_year)
        hit3[np.flatnonzero(m3)[h3]] = True
    if m5.all():
        h5, cols5 = fastpath.parse_rfc5424_fast(arr)
        hit5 = h5
    elif m5.any():
        a5 = pc.filter(arr, pa.array(m5))
        h5, cols5 = fastpath.parse_rfc5424_fast(a5)
        hit5[np.flatnonzero(m5)[h5]] = True

    # homogeneous canonical batch (the 100 TB common case): columns are
    # already in row order — skip the concat+gather entirely
    for full_hit, cols_d in ((hit3, cols3), (hit5, cols5)):
        if full_hit.all():
            return {c: _fast_col(cols_d, c, n) for c in _OUTPUT_COLUMNS}

    miss = ~(hit3 | hit5)
    slow_parts = []
    err_codes = None
    err_pos = np.array([], dtype=np.int64)
    if miss.any():
        miss_idx = np.flatnonzero(miss)
        miss_arr = pc.filter(arr, pa.array(miss))
        srfc = rfc[miss_idx]
        # Arrow error pre-classification: provable error codes skip the
        # pandas slow path entirely (garbage bursts stay cheap)
        codes = fastpath.classify_errors_fast(miss_arr, srfc)
        codes[~((srfc == RFC_3164) | (srfc == RFC_5424))] = "DetectFailed"
        classified = np.array([x is not None for x in codes])
        if classified.any():
            err_codes = codes[classified]
            err_pos = miss_idx[classified]
        rem = ~classified
        if rem.any():
            sub = pd.Series(
                pc.filter(miss_arr, pa.array(rem)).to_numpy(
                    zero_copy_only=False),
                index=miss_idx[rem], dtype=object)
            srfc_r = srfc[rem]
            sm3 = srfc_r == RFC_3164
            sm5 = srfc_r == RFC_5424
            frames = []
            order = []
            if sm3.any():
                frames.append(_parse_rfc3164_slow(sub[sm3], cfg))
                order.append(miss_idx[rem][sm3])
            if sm5.any():
                frames.append(_parse_rfc5424_slow(sub[sm5], cfg))
                order.append(miss_idx[rem][sm5])
            for f in frames:  # align dtypes so concat never silently casts
                f["ts_is_nil"] = f["ts_is_nil"].astype(object)
            slow = pd.concat(frames, ignore_index=True)
            slow_pos = np.concatenate(order)
            slow_parts = [(slow, slow_pos)]

    # gather permutation: [3164 hits, 5424 hits, classified errs, slow]
    pos = [np.flatnonzero(hit3), np.flatnonzero(hit5), err_pos]
    if slow_parts:
        pos.append(slow_parts[0][1])
    perm_src = np.concatenate(pos) if pos else np.array([], dtype=np.int64)
    inv = np.empty(n, dtype=np.int64)
    inv[perm_src] = np.arange(n)
    inv_pa = pa.array(inv)

    n3, n5 = int(hit3.sum()), int(hit5.sum())

    n_err = len(err_pos)

    def seg(colname, typ):
        """Build the concatenated [hits3, hits5, classified-errors, slow]
        segment for one output column, then gather into row order."""
        chunks = []
        for nn, cols_d in ((n3, cols3), (n5, cols5)):
            if not nn:
                continue
            if colname in cols_d:
                chunks.append(_to_pa(cols_d[colname], typ))
            elif colname == "ts_is_nil":
                # fast-path hits always carry a concrete False
                chunks.append(pa.array(np.zeros(nn, dtype=bool)))
            else:
                chunks.append(pa.nulls(nn, typ))
        if n_err:
            if colname == "parse_error":
                chunks.append(pa.array(list(err_codes), pa.string()))
            else:
                chunks.append(pa.nulls(n_err, typ))
        if slow_parts:
            slow = slow_parts[0][0]
            chunks.append(_slow_col_to_pa(slow[colname], typ))
        merged = pa.concat_arrays([c.combine_chunks()
                                   if isinstance(c, pa.ChunkedArray) else c
                                   for c in chunks])
        return merged.take(inv_pa)

    return {c: seg(c, _pa_type(c)) for c in _OUTPUT_COLUMNS}


def _pa_type(colname):
    import pyarrow as pa

    if colname in _INT_COLS:
        return pa.int32()
    if colname == "ts":
        return pa.timestamp("us")
    if colname == "ts_is_nil":
        return pa.bool_()
    return pa.string()


def _to_pa(v, typ):
    """Fast-path column (numpy or pa.Array over the hit rows) -> pa.Array
    of `typ`."""
    import pyarrow as pa

    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v.cast(typ)
    if typ == pa.bool_():
        return pa.array(v.astype(bool))
    return pa.array(v).cast(typ)


def _fast_col(cols_d: dict, colname: str, n: int):
    """All-hit shortcut column builder: fast-path output (already in row
    order) -> pa.Array; absent columns are nulls, ts_is_nil is False."""
    import pyarrow as pa

    typ = _pa_type(colname)
    if colname in cols_d:
        return _to_pa(cols_d[colname], typ)
    if colname == "ts_is_nil":
        return pa.array(np.zeros(n, dtype=bool))
    return pa.nulls(n, typ)


def _slow_col_to_pa(series: pd.Series, typ):
    import pyarrow as pa

    if typ == pa.timestamp("us"):
        return pa.array(series.to_numpy(dtype="M8[ns]")).cast(typ)
    return pa.Array.from_pandas(series, type=typ)


def make_map_in_arrow_parser(cfg: ParseConfig | None = None,
                             passthrough=("doc_id", "source"),
                             input_col: str = "tokens",
                             input_kind: str = "tokens",
                             out_prefix: str = "",
                             emit_raw: bool = True):
    """Batch function for DataFrame.mapInArrow: passthrough columns ride
    along untouched (same Arrow buffers); decode+detect+parse append the
    rfc + parsed columns.  Compared to the pandas UDF this skips the
    arrow->pandas conversion of the token list column (65k ndarray
    allocations per batch) on input, and — being a map barrier — can never
    be duplicated by filter pushdown the way struct-field references to a
    pandas UDF can.

    The token ARRAY column must never appear in the OUTPUT batch: shipping
    array<int> back across the Arrow boundary costs 10-20x the parse
    itself (measured 17-23s vs 0.6-2.8s per 400k rows at local[32]) and
    bloats the JVM with list-array allocations.  Instead the decoded line
    is emitted as a plain string column (``emit_raw``) — the codec is
    bijective, so downstream equality audits on the string are exactly the
    token-array invariant."""
    import pyarrow as pa

    cfg = cfg or ParseConfig()

    def fn(batches):
        import pyarrow.compute as pc

        from .grammar import (
            _OUTPUT_COLUMNS,
            detect_rfc_arrow,
            parse_rfc3164,
            parse_rfc5424,
        )

        for b in batches:
            col = b.column(b.schema.get_field_index(input_col))
            if input_kind == "tokens":
                arr = _string_from_token_list(col)
            else:
                arr = (col.combine_chunks()
                       if isinstance(col, pa.ChunkedArray) else col)
                arr = pc.if_else(pc.is_valid(arr), arr, "")
            rfc = detect_rfc_arrow(arr)
            arrays = [b.column(b.schema.get_field_index(c))
                      for c in passthrough]
            names = list(passthrough)
            if emit_raw:
                arrays.append(arr)
                names.append("raw")
            names += ["rfc"] + [f"{out_prefix}{c}" for c in _OUTPUT_COLUMNS]
            arrays.append(pa.array(rfc, pa.int32()))

            out_arrow = parse_batch_arrow(arr, rfc, cfg)
            if out_arrow is not None:      # arrow-native hot path
                arrays.extend(out_arrow[c] for c in _OUTPUT_COLUMNS)
                yield pa.RecordBatch.from_arrays(arrays, names=names)
                continue

            # injected-config jobs: pandas path
            m3 = rfc == RFC_3164
            m5 = rfc == RFC_5424
            parts = []
            if m3.any():
                parts.append((m3, parse_rfc3164(
                    pc.filter(arr, pa.array(m3)), cfg)))
            if m5.any():
                parts.append((m5, parse_rfc5424(
                    pc.filter(arr, pa.array(m5)), cfg)))
            out = _assemble(len(rfc), parts, ~(m3 | m5))
            for c in _OUTPUT_COLUMNS:
                v = out[c]
                if c in _INT_COLS:
                    arrays.append(pa.Array.from_pandas(v, type=pa.int32()))
                elif c == "ts":
                    arrays.append(pa.array(v.to_numpy())
                                  .cast(pa.timestamp("us")))
                elif c == "ts_is_nil":
                    arrays.append(pa.Array.from_pandas(v, type=pa.bool_()))
                else:
                    # from_pandas maps stray NaN (slow-path masked fields)
                    # to null, unlike pa.array over tolist()
                    arrays.append(pa.Array.from_pandas(v,
                                                       type=pa.string()))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn


MAP_IN_ARROW_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()),
     T.StructField("source", T.StringType()),
     T.StructField("raw", T.StringType())]
    + PARSED_SCHEMA_TOKENS.fields)


DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("raw", T.StringType()),
])


def make_decoder_fn(input_col: str = "tokens"):
    """mapInArrow batch fn: tokens -> (doc_id, raw) only, for the audit's
    source side (input-side token arrays are cheap; it is the OUTPUT side
    that must stay string-only)."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index(input_col))
            arr = _string_from_token_list(col)
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("doc_id")), arr],
                names=["doc_id", "raw"])

    return fn


def make_parse_from_tokens_udf(cfg: ParseConfig | None = None):
    """pandas UDF (tokens array<int>) -> (rfc + parsed) struct.

    Detokenize (numpy utf-32 bulk decode), dialect detection, and both
    grammars run in a single Python pass per Arrow batch.  This keeps the
    token arrays out of JVM per-char array ops (split/transform/char),
    which otherwise dominate GC at scale.
    """
    cfg = cfg or ParseConfig()

    @F.pandas_udf(PARSED_SCHEMA_TOKENS)
    def parse_tokens(tokens: pd.Series) -> pd.DataFrame:
        return parse_tokens_arrow_frame(tokens, cfg)

    return parse_tokens


def detect_rfc_col(raw_col: str = "raw"):
    """JVM-side (codegen) dialect detection, quirk-exact vs
    syslogparser.go:30-56 — see grammar.detect_rfc for the taxonomy.

    instr() is 1-based: p = position of '>' within the first 10 chars.
    """
    head = F.substring(F.col(raw_col), 1, 10)
    p = F.instr(head, ">")  # 0 when absent
    after = F.substring(F.col(raw_col), p + 1, 1)
    return (
        # null input -> UNKNOWN, matching detect_rfc_arrow (without this,
        # every when() below is NULL on null input and the chain would
        # fall through to the 3164 otherwise())
        F.when(F.col(raw_col).isNull(), F.lit(0))
        .when(F.length(raw_col) == 0, F.lit(0))
        # no '>' in the scan window: v=0 quirk -> 5424 for full windows,
        # UNKNOWN (reference panic) for short buffers
        .when((p == 0) & (F.length(raw_col) >= 10), F.lit(RFC_5424))
        .when(p == 0, F.lit(0))
        .when(p == 10, F.lit(0))         # '>' at index 9: version outside
        .when(after == "", F.lit(0))     # '>' is the last byte (ref panics)
        .when(F.ascii(after).between(48, 57), F.lit(RFC_5424))
        .otherwise(F.lit(RFC_3164))
    ).cast("int")
