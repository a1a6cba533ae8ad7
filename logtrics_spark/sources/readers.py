"""Line sources — the Spark mapping of the reference's readers.

Reference readers (/root/reference/reader/readers.go): console REPL
(S1, readers.go:73-106), UDP datagrams (S2, 109-147), TCP accept loop
(S3, 150-196), plus the TODO'd filetail (S4, TODO.md:3).  Every reader
produces `LogEvent{Source, Line}`; ours produce DataFrames with
(source, line, ts) ready for Engine.run / extract.

Mappings:
- file/dir of text logs  -> batch `read_lines`     (S4 batch form)
- growing log directory  -> `stream_lines`         (S4, readStream.text)
- TCP socket             -> `stream_socket`        (S2/S3; Spark's socket
  source is TCP text — UDP has no built-in source; front UDP with any
  relay (socat) which is plumbing, not engine semantics)
- in-memory lines        -> `lines_df`             (S1 console analog /
  test harness, per SURVEY.md §3.3)

Reference behaviors preserved: whitespace + CRLF trimming
(readers.go:140-141) and the 1024-byte line cap (readers.go:135,182)
are applied via `normalize_lines`; source tagging mirrors the
"UDP:<remote>" / "TCP:<remote>" convention with "file:<path>" etc.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LINE_BYTES = 1024  # readers.go:135,182


def normalize_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Trim whitespace/CRLF and cap at 1024 chars (reference read buffer).

    NB: Spark's ``trim`` strips only 0x20 spaces; the reference strips
    all whitespace plus ``\\r\\n`` (readers.go:140-141), hence the regex.
    """
    c = F.col(line_col)
    trimmed = F.regexp_replace(c, r"^\s+|\s+$", "")
    return df.withColumn(line_col, F.substring(trimmed, 1, MAX_LINE_BYTES))


def read_lines(
    spark: SparkSession, path: str, source_tag: str | None = None
) -> DataFrame:
    """Batch text source: one row per line, ingestion-time timestamp.

    The batch analog of filetail (S4); source column tags the origin
    like the reference's "TCP:<remote>" convention.
    """
    tag = source_tag or f"file:{path}"
    df = spark.read.text(path).select(
        F.lit(tag).alias("source"),
        F.col("value").alias("line"),
        F.current_timestamp().alias("ts"),
    )
    return normalize_lines(df)


def stream_lines(
    spark: SparkSession, directory: str, source_tag: str | None = None
) -> DataFrame:
    """Streaming text source over a growing directory (S4 filetail)."""
    tag = source_tag or f"dir:{directory}"
    df = spark.readStream.text(directory).select(
        F.lit(tag).alias("source"),
        F.col("value").alias("line"),
        F.current_timestamp().alias("ts"),
    )
    return normalize_lines(df)


def stream_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Streaming TCP text source (S3; S2 via a UDP->TCP relay)."""
    df = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(
            F.lit(f"TCP:{host}:{port}").alias("source"),
            F.col("value").alias("line"),
            F.current_timestamp().alias("ts"),
        )
    )
    return normalize_lines(df)


def lines_df(spark: SparkSession, lines: list[str], source: str = "console") -> DataFrame:
    """Console/test analog (S1): typed lines with row-order timestamps."""
    pdf = pd.DataFrame({"line": lines})
    pdf["source"] = source
    pdf["ts"] = pd.Timestamp("1970-01-01") + pd.to_timedelta(pdf.index, unit="s")
    return normalize_lines(spark.createDataFrame(pdf[["source", "line", "ts"]]))


class UDPLineCollector:
    """S2 — bounded UDP datagram ingest harness.

    Spark has no UDP source, and the production answer stays a
    UDP->TCP relay in front of ``stream_socket``; this harness gives
    datagram ingestion the same dev/test standing the console reader
    has (reference reader/readers.go:109-147): bind, collect datagrams
    on a daemon thread, drain into a lines DataFrame.  Reference
    semantics preserved exactly: 1024-byte read buffer
    (readers.go:135), whitespace + CRLF trim (readers.go:140-141),
    ``UDP:<remote>`` source tag (readers.go:131).  Driver-side by
    design — so was the reference's reader; at scale datagrams belong
    behind a relay or a queue, not in an executor.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        import socket
        import threading

        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.settimeout(0.1)
        self.address = self._sock.getsockname()  # (host, actual_port)
        self._rows: list[tuple[str, str]] = []
        self._stop = threading.Event()

        def pump() -> None:
            while not self._stop.is_set():
                try:
                    data, remote = self._sock.recvfrom(MAX_LINE_BYTES)  # readers.go:135
                except TimeoutError:
                    continue
                except OSError:
                    break
                line = data.decode("utf-8", errors="replace")
                self._rows.append((f"UDP:{remote[0]}:{remote[1]}", line))

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._sock.close()

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """Drain collected datagrams -> (source, line, ts) DataFrame."""
        pdf = pd.DataFrame(self._rows, columns=["source", "line"])
        pdf["ts"] = pd.Timestamp("1970-01-01") + pd.to_timedelta(pdf.index, unit="s")
        if not len(pdf):
            return normalize_lines(
                spark.createDataFrame([], "source string, line string, ts timestamp")
            )
        return normalize_lines(spark.createDataFrame(pdf[["source", "line", "ts"]]))
