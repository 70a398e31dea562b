"""Golden fixtures + deterministic synthetic fixture-table generator.

Goldens transcribe the reference's end-to-end tests (FIXTURES.md documents
each with its reference citation).  ``default_year=2025`` pins the
reference's ``time.Now().Year()`` substitution (rfc3164/rfc3164.go:331-346).

The synthetic generator (seed=42) cycles golden templates with perturbation:
Zipf-skewed hostnames/sources to exercise salted repartitioning, stepped
timestamps for deterministic hour buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_YEAR = 2025

# Each case: id, raw, cfg kwargs, rfc, expected field dict (None = null).
# ts expected as ISO UTC instant string (naive, UTC); tz = offset minutes.
GOLDEN_VALID = [
    # --- RFC3164 (rfc3164/rfc3164_test.go)
    dict(id="g01", rfc=1, cfg={},
         raw="<34>Oct 11 22:14:15 mymachine very.large.syslog.message.tag: "
             "'su root' failed for lonvick on /dev/pts/8",
         exp=dict(priority=34, facility=4, severity=2,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="very.large.syslog.message.tag",
                  content="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g02", rfc=1, cfg={},
         raw="<34>Oct 11 22:14:15 mymachine su: 'su root' failed for "
             "lonvick on /dev/pts/8",
         exp=dict(priority=34, facility=4, severity=2,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="su",
                  content="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g03", rfc=1, cfg=dict(priority=0),
         raw="Oct 11 22:14:15 mymachine very.large.syslog.message.tag: "
             "'su root' failed for lonvick on /dev/pts/8",
         exp=dict(priority=0, facility=0, severity=0,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="very.large.syslog.message.tag",
                  content="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g04", rfc=1, cfg=dict(hostname="dummy"),
         raw="<30>Jun 23 13:17:42 chronyd[1119]: Selected source "
             "192.168.65.1",
         exp=dict(priority=30, facility=3, severity=6,
                  ts="2025-06-23T13:17:42", tz_offset_minutes=0,
                  hostname="dummy", tag="chronyd",
                  content="Selected source 192.168.65.1")),
    dict(id="g05", rfc=1, cfg=dict(tag="chronyd"),
         raw="<30>Jun 23 13:17:42 localhost Selected source 192.168.65.1",
         exp=dict(priority=30, facility=3, severity=6,
                  ts="2025-06-23T13:17:42", tz_offset_minutes=0,
                  hostname="localhost", tag="chronyd",
                  content="Selected source 192.168.65.1")),
    dict(id="g06", rfc=1, cfg=dict(location="America/New_York"),
         raw="<30>Jun 23 13:17:42 localhost foo: Selected source "
             "192.168.65.1",
         exp=dict(priority=30, facility=3, severity=6,
                  ts="2025-06-23T17:17:42",  # EDT is UTC-4 in June
                  tz_offset_minutes=-240,
                  hostname="localhost", tag="foo",
                  content="Selected source 192.168.65.1")),
    dict(id="g07", rfc=1,
         cfg=dict(ts_format="%Y-%m-%dT%H:%M:%S", ts_format_len=19),
         raw="<30>2006-01-02T15:04:05 localhost foo: Selected source "
             "192.168.65.1",
         exp=dict(priority=30, facility=3, severity=6,
                  ts="2006-01-02T15:04:05", tz_offset_minutes=0,
                  hostname="localhost", tag="foo",
                  content="Selected source 192.168.65.1")),
    dict(id="g08", rfc=1,
         cfg=dict(priority=0, hostname="mymachine", tag="foo"),
         raw="Oct 11 22:14:15 'su root' failed for lonvick on /dev/pts/8",
         exp=dict(priority=0, facility=0, severity=0,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="foo",
                  content="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g09", rfc=1, cfg={},
         raw="<30>Jun 23 13:17:42 127.0.0.1 java.lang.NullPointerException",
         exp=dict(priority=30, facility=3, severity=6,
                  ts="2025-06-23T13:17:42", tz_offset_minutes=0,
                  hostname="127.0.0.1",
                  tag="java.lang.NullPointerException", content="")),
    dict(id="g10", rfc=1, cfg={},
         raw="<34>Oct 11 22:14:15 mymachine su: " + "a" * 2048,
         exp=dict(priority=34, facility=4, severity=2,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="su", content="a" * 2014)),
    dict(id="g10b", rfc=1, cfg={},
         raw="<34>Oct 11 22:14:15 mymachine su: hello",
         exp=dict(priority=34, facility=4, severity=2,
                  ts="2025-10-11T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="su", content="hello")),
    dict(id="g21", rfc=1, cfg={},  # single-digit space-padded day
         raw="<34>Oct  1 22:14:15 mymachine su: hi",
         exp=dict(priority=34, facility=4, severity=2,
                  ts="2025-10-01T22:14:15", tz_offset_minutes=0,
                  hostname="mymachine", tag="su", content="hi")),
    # --- RFC5424 (rfc5424/rfc5424_test.go)
    dict(id="g11", rfc=2, cfg={},
         raw="<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - "
             "ID47 - 'su root' failed for lonvick on /dev/pts/8",
         exp=dict(priority=34, facility=4, severity=2, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="mymachine.example.com",
                  app_name="su", proc_id="-", msg_id="ID47",
                  structured_data="-",
                  message="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g12", rfc=2, cfg={},
         raw="<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc "
             "8710 - - %% It's time to make the do-nuts.",
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  ts="2003-08-24T12:14:15.000003", tz_offset_minutes=-420,
                  ts_is_nil=False, hostname="192.0.2.1", app_name="myproc",
                  proc_id="8710", msg_id="-", structured_data="-",
                  message="%% It's time to make the do-nuts.")),
    dict(id="g13", rfc=2, cfg={},
         raw='<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
             'evntslog - ID47 [exampleSDID@32473 iut="3" '
             'eventSource="Application" eventID="1011"] An application '
             'event log entry...',
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="mymachine.example.com",
                  app_name="evntslog", proc_id="-", msg_id="ID47",
                  structured_data='[exampleSDID@32473 iut="3" '
                                  'eventSource="Application" '
                                  'eventID="1011"]',
                  message="An application event log entry...")),
    dict(id="g14", rfc=2, cfg={},
         raw='<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
             'evntslog - ID47 [exampleSDID@32473 iut="3" eventSource= '
             '"Application" eventID="1011"][examplePriority@32473 '
             'class="high"]',
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="mymachine.example.com",
                  app_name="evntslog", proc_id="-", msg_id="ID47",
                  structured_data='[exampleSDID@32473 iut="3" eventSource= '
                                  '"Application" eventID="1011"]'
                                  '[examplePriority@32473 class="high"]',
                  message="")),
    dict(id="g15", rfc=2, cfg=dict(priority=34),
         raw="1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 "
             "- 'su root' failed for lonvick on /dev/pts/8",
         exp=dict(priority=34, facility=4, severity=2, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="mymachine.example.com",
                  app_name="su", proc_id="-", msg_id="ID47",
                  structured_data="-",
                  message="'su root' failed for lonvick on /dev/pts/8")),
    dict(id="g16", rfc=2, cfg=dict(hostname="mymachine.example.com"),
         raw="<34>1 2003-10-11T22:14:15.003Z su - ID47 - 'su root' failed "
             "for lonvick on /dev/pts/8",
         exp=dict(priority=34, facility=4, severity=2, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="mymachine.example.com",
                  app_name="su", proc_id="-", msg_id="ID47",
                  structured_data="-",
                  message="'su root' failed for lonvick on /dev/pts/8")),
    # NIL timestamp end-to-end (header semantics from rfc5424_test.go:304-314;
    # SD added because a full Parse needs it)
    dict(id="g17", rfc=2, cfg={},
         raw="<165>1 - mymachine.example.com su 123 ID47 - hello",
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  ts=None, tz_offset_minutes=None, ts_is_nil=True,
                  hostname="mymachine.example.com", app_name="su",
                  proc_id="123", msg_id="ID47", structured_data="-",
                  message="hello")),
    dict(id="g18", rfc=2, cfg={},
         raw="<165>1 2003-10-11T22:14:15.003Z - su 123 ID47 - hello",
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  ts="2003-10-11T22:14:15.003000", tz_offset_minutes=0,
                  ts_is_nil=False, hostname="-", app_name="su",
                  proc_id="123", msg_id="ID47", structured_data="-",
                  message="hello")),
    # size-limit tests (rfc5424/rfc5424_test.go:1320-1347)
    dict(id="g19", rfc=2, cfg={},
         raw='<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
             'evntslog - ID47 [exampleSDID@32473 iut="3" '
             'eventSource="Application" eventID="1011"] ' + "a" * 3048,
         exp=dict(priority=165, facility=20, severity=5, version=1,
                  message="a" * (3048 - 139))),  # header is 139 chars
    dict(id="g20", rfc=2, cfg={},
         raw='<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
             'evntslog - ID47 [exampleSDID@32473 iut="3" '
             'eventSource="Application" eventID="1011"]  hello ',
         exp=dict(message="hello")),
    # UTC + fraction variants (rfc5424_test.go:388-503 timestamp vectors)
    dict(id="g22", rfc=2, cfg={},
         raw="<165>1 1985-04-12T23:20:50.52Z host app - - - m",
         exp=dict(ts="1985-04-12T23:20:50.520000", tz_offset_minutes=0)),
    dict(id="g23", rfc=2, cfg={},
         raw="<165>1 1985-04-12T19:20:50.52-04:00 host app - - - m",
         exp=dict(ts="1985-04-12T23:20:50.520000", tz_offset_minutes=-240)),
]

GOLDEN_ERRORS = [
    # id, raw, rfc (parser to use), expected parse_error
    dict(id="e01", rfc=1, raw="", err="PriorityEmpty"),
    dict(id="e02", rfc=1, raw="7>Oct 11 22:14:15 host tag: x",
         err="PriorityNoStart"),
    dict(id="e03", rfc=1, raw="<77", err="PriorityNoEnd"),
    dict(id="e04", rfc=1, raw="<>Oct 11 22:14:15 host tag: x",
         err="PriorityTooShort"),
    dict(id="e05", rfc=1, raw="<1233>Oct 11 22:14:15 host tag: x",
         err="PriorityTooLong"),
    dict(id="e06", rfc=1, raw="<7a8>Oct 11 22:14:15 host tag: x",
         err="PriorityNonDigit"),
    dict(id="e07", rfc=1, raw="<34>Oct 34 32:72:82 mymachine tag: x",
         err="TimestampUnknownFormat"),
    dict(id="e08", rfc=2,
         raw="<165>1 2003-08-24T05:14:15.000000003-07:00 host app - - - m",
         err="TimestampUnknownFormat"),
    dict(id="e09", rfc=2,
         raw="<165>1 2003-10-11T22:14:15.003Z host " + "s" * 49 + " - - - m",
         err="InvalidAppName"),
    dict(id="e10", rfc=2,
         raw="<165>1 2003-10-11T22:14:15.003Z host app " + "a" * 129
             + " - - m",
         err="InvalidProcId"),
    dict(id="e11", rfc=2,
         raw="<165>1 2003-10-11T22:14:15.003Z host app - " + "a" * 33
             + " - m",
         err="InvalidMsgId"),
    dict(id="e12", rfc=2,
         raw="<165>1 2003-10-11T22:14:15.003Z host app - ID47 "
             "no-bracket-sd",
         err="NoStructuredData"),
    dict(id="e13", rfc=2, raw="<165>1 2003-13-11T22:14:15.003Z h a - - - m",
         err="MonthInvalid"),
    dict(id="e14", rfc=2, raw="<165>1 2003-10-32T22:14:15.003Z h a - - - m",
         err="DayInvalid"),
    dict(id="e15", rfc=2, raw="<165>1 20x3-10-11T22:14:15.003Z h a - - - m",
         err="YearInvalid"),
    dict(id="e16", rfc=2, raw="<165>1 2003-10-11x22:14:15.003Z h a - - - m",
         err="InvalidTimeFormat"),
    dict(id="e17", rfc=2, raw="<165>1 2003-10-11T24:14:15.003Z h a - - - m",
         err="TimestampUnknownFormat"),
]

# Detection goldens (syslogparser_test.go:9-29 + quirk rows)
GOLDEN_DETECT = [
    ("<34>Oct 11 22:14:15 ...", 1),
    ("<165>1 2003-10-11T22:14:15.003Z ...", 2),
    ("no gt sign in the first ten bytes", 2),   # latent v=0 quirk
    ("<12345678>9 x", 0),  # '>' at index 9 -> version outside window
    ("<123456789>x", 2),   # '>' outside the 10-byte window -> v=0 quirk
]

_HOSTS_POOL = 1000
_APPS = [f"app{i:02d}" for i in range(50)]
_TAGS = ["su", "sshd", "cron", "kernel", "systemd", "nginx", "postfix",
         "chronyd", "dockerd", "kubelet"]
_SOURCES = ["edge", "dc1", "dc2", "iot"]
_SOURCE_P = [0.70, 0.15, 0.10, 0.05]
_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
               "Sep", "Oct", "Nov", "Dec"]


def synth_lines(n_rows: int, seed: int = 42,
                error_rate: float = 0.02) -> pd.DataFrame:
    """Deterministic synthetic corpus: (doc_id, raw, source) with Zipf-skewed
    hostnames, stepped timestamps in a 48h window, ~50/50 RFC mix and a
    sprinkle of malformed lines for the dead-letter path."""
    rng = np.random.default_rng(seed)
    pri = rng.integers(0, 192, n_rows)
    zipf = np.minimum(rng.zipf(1.2, n_rows), _HOSTS_POOL) - 1
    hosts = np.char.add("host", zipf.astype(str))
    apps = np.array(_APPS)[rng.integers(0, len(_APPS), n_rows)]
    tags = np.array(_TAGS)[rng.integers(0, len(_TAGS), n_rows)]
    srcs = np.array(_SOURCES)[rng.choice(len(_SOURCES), n_rows, p=_SOURCE_P)]
    secs = (np.arange(n_rows) * 7) % (48 * 3600)  # 48-hour window, 7s step
    hh, rem = np.divmod(secs, 3600)
    day = 11 + hh // 24
    hh = hh % 24
    mm, ss = np.divmod(rem, 60)
    is5424 = rng.random(n_rows) < 0.5
    is_err = rng.random(n_rows) < error_rate

    t3164 = [
        f"<{p}>Oct {d:02d} {h:02d}:{m:02d}:{s:02d} {ho} {tg}[{i % 9999}]: "
        f"job {i} finished in {i % 997} ms"
        for i, (p, d, h, m, s, ho, tg)
        in enumerate(zip(pri, day, hh, mm, ss, hosts, tags))
    ]
    t5424 = [
        f"<{p}>1 2025-10-{d:02d}T{h:02d}:{m:02d}:{s:02d}.{i % 1000:03d}Z "
        f"{ho} {ap} {i % 9999} ID{i % 97} [meta@1 seq=\"{i}\"] "
        f"event {i} value={i % 13}"
        for i, (p, d, h, m, s, ho, ap)
        in enumerate(zip(pri, day, hh, mm, ss, hosts, apps))
    ]
    bad = [
        f"<999999>broken line {i}" if i % 3 == 0 else
        (f"<{p}>NotAMonth {i} garbage" if i % 3 == 1 else
         f"<{p}>1 20XX-99-99T99:99:99Z h a - - - broken")
        for i, p in enumerate(pri)
    ]
    raw = np.where(is_err, bad, np.where(is5424, t5424, t3164))
    return pd.DataFrame({
        "doc_id": [f"s{i:09d}" for i in range(n_rows)],
        "raw": raw,
        "source": srcs,
    })


def golden_frame() -> pd.DataFrame:
    """All golden-valid rows without injected config (usable end-to-end)."""
    rows = [g for g in GOLDEN_VALID if not g["cfg"]]
    return pd.DataFrame({
        "doc_id": [g["id"] for g in rows],
        "raw": [g["raw"] for g in rows],
        "source": "golden",
    })


def write_tokens_table(spark, pdf: pd.DataFrame, path: str,
                       n_partitions: int = 8) -> None:
    """Write (doc_id, tokens, n_tok, source) parquet from a raw-line frame
    using the JVM tokenizer (no Python in the encode path)."""
    from pyspark.sql import functions as F

    from .encoding import tokenize_col

    df = spark.createDataFrame(pdf)
    (df.repartition(n_partitions)
       .withColumn("tokens", tokenize_col("raw"))
       .withColumn("n_tok", F.size("tokens").cast("int"))
       .select("doc_id", "tokens", "n_tok", "source")
       .write.mode("overwrite").parquet(path))
