"""Byte-identical scrub: Spark regexp chain == Python oracle chain."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webdq.scrub import scrub, scrub_py

CASES = [
    "plain text no pii",
    "a.b+c%d@sub.ex-ample.org mixed 555-123-4567 and 1.2.3.4",
    "BADWORD1 mid badword2. slur1? not-badword1x",
    "edge@x.io.",
    "phone 555.123.4567 dotted",
    "ip at end 192.168.0.255",
    "",
    "ünïcode tëxt bleibt gleich 北京 text",
]


def test_scrub_byte_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = {r["text"]: r["scrubbed_text"] for r in scrub(df).collect()}
    for c in CASES:
        assert got[c] == scrub_py(c), repr(c)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=200))
def test_scrub_py_idempotent(s):
    assert scrub_py(scrub_py(s)) == scrub_py(s)
