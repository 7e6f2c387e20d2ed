"""S9 JDBC sink wrapper: wiring + option plumbing (no DB in the
container, so the gate is a mock writer plus a real mock-URL call
that must reach Spark's JDBC layer)."""

import pytest

from webdq import sinks


class _FakeWriter:
    def __init__(self, calls):
        self._calls = calls

    def jdbc(self, url, table, mode, properties):
        self._calls.append({"url": url, "table": table, "mode": mode, "properties": properties})


class _FakeDF:
    def __init__(self):
        self.calls = []
        self.coalesced_to = None

    @property
    def write(self):
        return _FakeWriter(self.calls)

    def coalesce(self, n):
        self.coalesced_to = n
        return self


def test_write_jdbc_plumbs_options():
    df = _FakeDF()
    sinks.write_jdbc(
        df,
        "jdbc:postgresql://db.example:5432/corpus",
        "labels",
        mode="append",
        properties={"user": "u", "password": "p"},
        batchsize=5000,
        num_partitions=8,
    )
    assert df.coalesced_to == 8
    (call,) = df.calls
    assert call["url"] == "jdbc:postgresql://db.example:5432/corpus"
    assert call["table"] == "labels"
    assert call["mode"] == "append"
    assert call["properties"] == {"batchsize": "5000", "user": "u", "password": "p"}


def test_write_jdbc_no_coalesce_by_default():
    df = _FakeDF()
    sinks.write_jdbc(df, "jdbc:postgresql://db.example/x", "t")
    assert df.coalesced_to is None
    assert df.calls[0]["mode"] == "error"
    assert df.calls[0]["properties"]["batchsize"] == "10000"


def test_write_jdbc_reaches_spark_jdbc_layer(spark):
    """A real DataFrame against a mock URL must reach Spark's JDBC
    datasource and fail there (no driver/connection), proving the
    wrapper wires into the actual writer, not a stub."""
    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s")
    with pytest.raises(Exception) as ei:
        sinks.write_jdbc(df, "jdbc:postgresql://localhost:1/none", "t", mode="append")
    msg = str(ei.value)
    assert "driver" in msg.lower() or "connection" in msg.lower() or "jdbc" in msg.lower()
