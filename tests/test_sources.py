from __future__ import annotations

from logtrics_spark.api import Engine
from logtrics_spark.sources.readers import lines_df, read_lines


def test_read_lines_batch(spark, tmp_path):
    p = tmp_path / "app.log"
    p.write_text('hello "World"\r\n   padded line   \n' + "x" * 3000 + "\n")
    df = read_lines(spark, str(p))
    rows = df.orderBy("line").collect()
    assert len(rows) == 3
    assert all(r["source"] == f"file:{p}" for r in rows)
    lines = {r["line"] for r in rows}
    assert 'hello "World"' in lines  # CRLF trimmed (readers.go:140-141)
    assert "padded line" in lines  # whitespace trimmed
    assert max(len(line) for line in lines) == 1024  # cap (readers.go:135)


def test_lines_df_console_feeds_engine(spark):
    df = lines_df(spark, ['hello "A"', "junk", 'hello "B"'])
    eng = Engine()
    eng.rule("hello", r'hello "(?P<w>\w+)"', lambda c, m: m.meter("hits").mark(1))
    got = eng.run(df).collect()
    assert len(got) == 2
    assert all(r["source"] == "console" for r in got)


def test_stream_lines_filetail(spark, tmp_path):
    """S4 filetail: rows appended to the directory flow through the
    identical rule path (availableNow drains what exists)."""
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text('num=1\nnum=2\nskip\n')
    from logtrics_spark.sources.readers import stream_lines

    stream = stream_lines(spark, str(d))
    assert stream.isStreaming
    got = []
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, _b: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(r["line"] for r in got) == ["num=1", "num=2", "skip"]


def test_udp_collector_reference_semantics(spark):
    """S2: datagrams arrive tagged UDP:<remote>, trimmed, capped at the
    reference's 1024-byte read buffer (readers.go:131-141)."""
    import socket
    import time

    from logtrics_spark.api import Engine
    from logtrics_spark.sources.readers import UDPLineCollector

    col = UDPLineCollector()
    host, port = col.address
    snd = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    snd.sendto(b"  num=41 \r\n", (host, port))
    snd.sendto(b"num=1 " + b"x" * 2000, (host, port))  # past the read buffer
    snd.close()
    for _ in range(100):
        if len(col._rows) >= 2:
            break
        time.sleep(0.02)
    col.stop()

    df = col.dataframe(spark)
    rows = df.toPandas()
    assert len(rows) == 2
    assert rows["source"].str.startswith("UDP:").all()
    assert "num=41" in set(rows["line"])  # trimmed
    assert rows["line"].str.len().max() <= 1024  # single-recv cap

    eng = Engine()
    eng.rule("n", r"num=(?P<n>\d+)", lambda c, m: m.counter("n").inc(c["n"]))
    got = eng.run(df).toPandas()
    assert sorted(got["value"]) == [1, 41]
