"""Golden-row tests: every end-to-end case from the reference's test suite
(rfc3164_test.go / rfc5424_test.go / syslogparser_test.go) must reproduce
exactly through the vectorized grammar.  Pure pandas — no SparkSession."""

import pandas as pd
import pytest

from sparklog import fixtures
from sparklog.grammar import (
    ParseConfig,
    detect_rfc,
    parse_rfc3164,
    parse_rfc5424,
)


def _run_one(case):
    cfg = ParseConfig(default_year=fixtures.DEFAULT_YEAR, **case["cfg"])
    raw = pd.Series([case["raw"]])
    fn = parse_rfc3164 if case["rfc"] == 1 else parse_rfc5424
    return fn(raw, cfg).iloc[0]


@pytest.mark.parametrize("case", fixtures.GOLDEN_VALID,
                         ids=[c["id"] for c in fixtures.GOLDEN_VALID])
def test_golden_valid(case):
    row = _run_one(case)
    assert row["parse_error"] is None, f"unexpected error {row['parse_error']}"
    for field, want in case["exp"].items():
        got = row[field]
        if field == "ts":
            if want is None:
                assert pd.isna(got), f"ts: want null, got {got}"
            else:
                assert got == pd.Timestamp(want), f"ts: {got!r} != {want!r}"
        elif want is None:
            assert got is None or pd.isna(got), f"{field}: want null got {got!r}"
        else:
            assert got == want, f"{field}: {got!r} != {want!r}"


@pytest.mark.parametrize("case", fixtures.GOLDEN_ERRORS,
                         ids=[c["id"] for c in fixtures.GOLDEN_ERRORS])
def test_golden_errors(case):
    cfg = ParseConfig(default_year=fixtures.DEFAULT_YEAR)
    raw = pd.Series([case["raw"]])
    fn = parse_rfc3164 if case["rfc"] == 1 else parse_rfc5424
    row = fn(raw, cfg).iloc[0]
    assert row["parse_error"] == case["err"]
    # fail-fast: no partial records (rfc3164/rfc3164.go:98-127)
    for f in ("priority", "facility", "severity", "hostname", "tag",
              "content", "app_name", "msg_id", "structured_data"):
        assert row[f] is None or pd.isna(row[f]), f"{f} leaked on error row"


def test_golden_detect():
    raws = pd.Series([r for r, _ in fixtures.GOLDEN_DETECT])
    want = [w for _, w in fixtures.GOLDEN_DETECT]
    got = detect_rfc(raws).tolist()
    assert got == want


def test_g19_header_len():
    """Sanity: the g19 prefix is 139 chars (message = 3048-139 a's),
    matching rfc5424_test.go:1320-1337 which computes
    MAX_PACKET_LEN - len(start)."""
    start = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
             'evntslog - ID47 [exampleSDID@32473 iut="3" '
             'eventSource="Application" eventID="1011"] ')
    assert len(start) == 139


def test_go_layout_timestamp_format():
    """The reference's WithTimestampFormat golden
    (rfc3164/rfc3164_test.go:209-239) with the Go layout string passed
    VERBATIM — the shim must translate it, no strptime knowledge needed."""
    raw = pd.Series(["<30>2006-01-02T15:04:05 localhost foo: "
                     "Selected source 192.168.65.1"])
    cfg = ParseConfig(ts_format="2006-01-02T15:04:05")
    row = parse_rfc3164(raw, cfg).iloc[0]
    assert row["parse_error"] is None
    assert row["ts"] == pd.Timestamp("2006-01-02T15:04:05")
    assert row["hostname"] == "localhost"
    assert row["tag"] == "foo"
    assert row["content"] == "Selected source 192.168.65.1"
    assert row["priority"] == 30 and row["facility"] == 3
    assert row["severity"] == 6


def test_go_layout_translator_units():
    from sparklog.grammar import go_layout_to_strptime

    assert go_layout_to_strptime("2006-01-02T15:04:05") == \
        "%Y-%m-%dT%H:%M:%S"
    assert go_layout_to_strptime("Jan 02 15:04:05") == "%b %d %H:%M:%S"
    assert go_layout_to_strptime("06/01/02 03:04:05 PM -0700") == \
        "%y/%m/%d %I:%M:%S %p %z"
    assert go_layout_to_strptime("2006-01-02T15:04:05.000-07:00") == \
        "%Y-%m-%dT%H:%M:%S.%f%z"
    with pytest.raises(ValueError):
        go_layout_to_strptime("Jan _2 15:04:05")   # variable width
    with pytest.raises(ValueError):
        go_layout_to_strptime("January 2, 2006")


def test_all_goldens_vectorized_batch():
    """All no-config goldens in ONE column pass (the UDF path shape)."""
    rows3 = [c for c in fixtures.GOLDEN_VALID
             if c["rfc"] == 1 and not c["cfg"]]
    raw = pd.Series([c["raw"] for c in rows3])
    out = parse_rfc3164(raw, ParseConfig(default_year=fixtures.DEFAULT_YEAR))
    assert out["parse_error"].isna().all()
    assert out["priority"].tolist() == [c["exp"]["priority"] for c in rows3]
    assert out["tag"].tolist() == [c["exp"]["tag"] for c in rows3]

    rows5 = [c for c in fixtures.GOLDEN_VALID
             if c["rfc"] == 2 and not c["cfg"]]
    raw5 = pd.Series([c["raw"] for c in rows5])
    out5 = parse_rfc5424(raw5, ParseConfig())
    assert out5["parse_error"].isna().all()
