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
