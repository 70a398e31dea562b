"""Sub-parser unit vectors (FIXTURES.md §6), mirroring the reference's
table-driven sub-parser tests: tag machine, secfrac cap, structured-data
boundaries, 2-digit range rules — each exercised through complete lines so
the vectorized grammar's field extraction is pinned exactly."""

import pandas as pd
import pytest

from sparklog.api import parse_lines_pandas
from sparklog.grammar import ParseConfig, parse_rfc3164, parse_rfc5424

CFG = ParseConfig(default_year=2025)
H3 = "<34>Oct 11 22:14:15 myhost "          # valid 3164 prefix
H5 = "<165>1 2003-10-11T22:14:15"           # 5424 prefix up to seconds


def _tag(line_tail: str):
    row = parse_rfc3164(pd.Series([H3 + line_tail]), CFG).iloc[0]
    return row["tag"], row["content"]


# rfc3164/rfc3164_test.go:453-507 (+ the enough-mode content boundary)
@pytest.mark.parametrize("tail,tag,content", [
    ("apache2[10]: x", "apache2", "x"),
    ("apache2: x", "apache2", "x"),
    ("apache2:x after", "apache2", "after"),   # enough-mode eats ':x'
    ("a" * 50, "a" * 32, "a" * 18),            # 32-cap, content mid-word
    (":starts special", "", ":starts special"),  # empty tag rewind
])
def test_tag_vectors(tail, tag, content):
    got_tag, got_content = _tag(tail)
    assert got_tag == tag
    assert got_content == content


# rfc5424/rfc5424_test.go:946-1018 secfrac: 1-6 digits, 6-digit cap
@pytest.mark.parametrize("frac,micros", [
    (".52", 520000),
    (".003", 3000),
    (".000003", 3),
    ("", 0),
])
def test_secfrac_vectors(frac, micros):
    line = f"{H5}{frac}Z h a - - - m"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["parse_error"] is None
    assert row["ts"].microsecond == micros


def test_secfrac_seven_digits_rejected():
    line = f"{H5}.1234567Z h a - - - m"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["parse_error"] == "TimestampUnknownFormat"


def test_secfrac_empty_after_dot_ignored():
    """parseSecFrac error is swallowed; offset parses right after '.'
    (rfc5424/rfc5424.go:458-471)."""
    line = f"{H5}.Z h a - - - m"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["parse_error"] is None
    assert row["ts"].microsecond == 0


# rfc5424/rfc5424_test.go:1260-1318 structured-data boundaries
@pytest.mark.parametrize("sd_and_rest,sd,msg", [
    ("- hello", "-", "hello"),
    ('[a@1 k="v"] m', '[a@1 k="v"]', "m"),
    ("[a@1][b@2] m", "[a@1][b@2]", "m"),          # adjacent joined
    ("[a@1] [b@2]", "[a@1]", "[b@2]"),            # '] ' splits
    ('[a@1 k="] inside"] m', '[a@1 k="]', 'inside"] m'),  # quote-blind
])
def test_structured_data_vectors(sd_and_rest, sd, msg):
    line = f"{H5}.003Z h a - - {sd_and_rest}"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["parse_error"] is None, row["parse_error"]
    assert row["structured_data"] == sd
    assert row["message"] == msg


# 2-digit range rules (rfc5424/rfc5424.go:391-402, 478-490)
@pytest.mark.parametrize("ts,err", [
    ("2003-00-11T22:14:15.003Z", "MonthInvalid"),
    ("2003-13-11T22:14:15.003Z", "MonthInvalid"),
    ("2003-10-00T22:14:15.003Z", "DayInvalid"),
    ("2003-10-32T22:14:15.003Z", "DayInvalid"),
    ("2003-02-31T22:14:15.003Z", None),           # Feb 31 deliberately OK
    ("2003-10-11T24:14:15.003Z", "TimestampUnknownFormat"),
    ("2003-10-11T22:60:15.003Z", "TimestampUnknownFormat"),
    ("2003-10-11T22:14:60.003Z", "TimestampUnknownFormat"),  # no leap sec
])
def test_two_digit_ranges(ts, err):
    line = f"<165>1 {ts} h a - - - m"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["parse_error"] == err


def test_feb31_normalizes_like_go():
    """time.Date normalization: Feb 31 -> Mar 3 (2003 is not a leap year)."""
    line = "<165>1 2003-02-31T22:14:15.003Z h a - - - m"
    row = parse_rfc5424(pd.Series([line]), CFG).iloc[0]
    assert row["ts"] == pd.Timestamp("2003-03-03 22:14:15.003")


def test_public_api_pandas():
    out = parse_lines_pandas(pd.Series([
        "<34>Oct 11 22:14:15 h su: x",
        "<165>1 2003-10-11T22:14:15.003Z h a - - - m",
        "junk but long enough for the v=0 window quirk",
    ]))
    assert out["rfc"].tolist() == [1, 2, 2]
    assert out["parse_error"].iloc[0] is None
    assert out["parse_error"].iloc[2] is not None
