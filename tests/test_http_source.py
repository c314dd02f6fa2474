"""Custom httpjson DataSource: decode parity, partitioning, and
streaming offset/replay semantics."""

from __future__ import annotations

import json
import os

from go_http_data_pipeline_spark.sources.http_json import (
    _decode_line,
    register,
)

FIELDS = [("name", "string"), ("age", "int"), ("salary", "bigint")]


def test_decode_go_semantics():
    # Unknown fields dropped, missing null, wrong type null, malformed
    # all-null (Server/main.go:211 Go encoding/json behavior).
    assert _decode_line('{"name":"a","age":30,"salary":1,"x":9}', FIELDS) == (
        "a",
        30,
        1,
    )
    assert _decode_line('{"name":"a"}', FIELDS) == ("a", None, None)
    assert _decode_line('{"name":"a","age":"old"}', FIELDS) == ("a", None, None)
    assert _decode_line("garbage", FIELDS) == (None, None, None)
    assert _decode_line("[1,2,3]", FIELDS) == (None, None, None)


def _write_spool(tmp, files):
    for i, recs in enumerate(files):
        with open(os.path.join(tmp, f"f{i}.jsonl"), "w") as fh:
            for r in recs:
                fh.write((r if isinstance(r, str) else json.dumps(r)) + "\n")


def test_batch_read_partition_per_file(spark, tmp_path):
    _write_spool(
        tmp_path,
        [
            [{"name": "a", "age": 1, "salary": 10}],
            [{"name": "b", "age": 2, "salary": 20}, "broken"],
        ],
    )
    register(spark)
    df = (
        spark.read.format("httpjson")
        .schema("name string, age int, salary bigint")
        .option("spool", str(tmp_path))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {tuple(r) for r in df.collect()}
    assert rows == {("a", 1, 10), ("b", 2, 20), (None, None, None)}


def test_stream_read_batched_replay(spark, tmp_path):
    recs = [{"name": f"u{i}", "age": i, "salary": 100 + i} for i in range(25)]
    _write_spool(tmp_path, [recs])
    register(spark)
    sdf = (
        spark.readStream.format("httpjson")
        .schema("name string, age int, salary bigint")
        .option("spool", str(tmp_path))
        .option("split_size", 10)  # shards the offset range into 3 partitions
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("http_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("http_stream_t")
    assert out.count() == 25  # every record exactly once
    assert {r.name for r in out.collect()} == {f"u{i}" for i in range(25)}


def test_stream_incremental_files_exactly_once(spark, tmp_path):
    # Second spool file lands between runs; resuming from the same
    # checkpoint reads ONLY the new records (exercising the per-file
    # count index / whole-file skip in _SpoolStreamReader.read).
    import json
    import os

    from go_http_data_pipeline_spark.sources.http_json import register

    ckpt = os.path.join(str(tmp_path), "_ckpt")
    spool = os.path.join(str(tmp_path), "spool")
    os.makedirs(spool)

    def land(fname, lo, hi):
        with open(os.path.join(spool, fname), "w") as fh:
            for i in range(lo, hi):
                fh.write(json.dumps({"name": f"u{i}", "age": i}) + "\n")

    register(spark)

    def run_once():
        got = []
        sdf = (
            spark.readStream.format("httpjson")
            .schema("name string, age int")
            .option("spool", spool)
            .option("split_size", 7)
            .load()
        )

        def collect(batch_df, batch_id):
            got.extend(r.name for r in batch_df.collect())

        q = (
            sdf.writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    land("a_first.jsonl", 0, 20)
    assert sorted(run_once()) == sorted(f"u{i}" for i in range(20))
    land("b_second.jsonl", 20, 30)
    # Resuming from the checkpoint, the second run must emit exactly
    # the 10 new records — no replays, no gaps.
    assert sorted(run_once()) == sorted(f"u{i}" for i in range(20, 30))


class _OneShotJsonServer:
    """Localhost HTTP test double for the `url` transport: serves one
    fixed body on every GET (the salary-service / employees-endpoint
    stand-in, Server/main.go:229-259)."""

    def __init__(self, body: str, content_type: str = "application/json"):
        import http.server
        import threading

        payload = body.encode("utf-8")

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                self.send_response(200)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # keep pytest output clean
                pass

        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        self.url = f"http://127.0.0.1:{self._srv.server_address[1]}/"

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()


def test_url_transport_json_array(spark):
    body = json.dumps(
        [
            {"name": "a", "age": 1, "salary": 10, "unknown": "x"},
            {"name": "b", "age": "oops", "salary": 20},
        ]
    )
    srv = _OneShotJsonServer(body)
    try:
        register(spark)
        df = (
            spark.read.format("httpjson")
            .schema("name string, age int, salary bigint")
            .option("url", srv.url)
            .load()
        )
        rows = {tuple(r) for r in df.collect()}
    finally:
        srv.close()
    # Go-decode semantics hold over the network path too: unknown
    # fields dropped, wrong-typed values null.
    assert rows == {("a", 1, 10), ("b", None, 20)}


def test_url_transport_json_lines(spark):
    body = "\n".join(
        [json.dumps({"name": "x", "age": 5, "salary": 50}), "not json", ""]
    )
    srv = _OneShotJsonServer(body, content_type="application/x-ndjson")
    try:
        register(spark)
        df = (
            spark.read.format("httpjson")
            .schema("name string, age int, salary bigint")
            .option("url", srv.url)
            .load()
        )
        rows = {tuple(r) for r in df.collect()}
    finally:
        srv.close()
    assert rows == {("x", 5, 50), (None, None, None)}


def test_stream_offsets_stable_under_adversarial_arrivals(spark, tmp_path):
    """The two producer patterns that broke the old global-index
    offsets: (1) a new file that sorts lexicographically FIRST, and
    (2) an append to a non-last existing file. Per-file offsets must
    emit exactly the new records — the global index would replay
    committed rows and skip new ones."""
    import json
    import os

    from go_http_data_pipeline_spark.sources.http_json import register

    ckpt = os.path.join(str(tmp_path), "_ckpt")
    spool = os.path.join(str(tmp_path), "spool")
    os.makedirs(spool)

    def land(fname, lo, hi, mode="w"):
        with open(os.path.join(spool, fname), mode) as fh:
            for i in range(lo, hi):
                fh.write(json.dumps({"name": f"u{i}", "age": i}) + "\n")

    register(spark)

    def run_once():
        got = []
        sdf = (
            spark.readStream.format("httpjson")
            .schema("name string, age int")
            .option("spool", spool)
            .option("split_size", 7)
            .load()
        )

        def collect(batch_df, batch_id):
            got.extend(r.name for r in batch_df.collect())

        q = (
            sdf.writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    land("m_mid.jsonl", 0, 20)
    assert sorted(run_once()) == sorted(f"u{i}" for i in range(20))
    # (1) new file sorting BEFORE the committed one
    land("a_early.jsonl", 20, 30)
    assert sorted(run_once()) == sorted(f"u{i}" for i in range(20, 30))
    # (2) append to the non-last committed file
    land("m_mid.jsonl", 30, 35, mode="a")
    assert sorted(run_once()) == sorted(f"u{i}" for i in range(30, 35))


def test_legacy_global_index_offset_migrates(tmp_path):
    """A checkpoint committed by the old reader stored one global
    record index ({"index": n}); resolving it as an empty per-file
    map would re-emit the ENTIRE spool. _migrate must allocate the
    first n records across name-sorted files, so partitions() emits
    only the genuinely-new range.

    Builds the schema with StructType/StructField constructors (not
    StructType.fromDDL, which needs an active SparkContext) so the
    test also passes when run standalone."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from go_http_data_pipeline_spark.sources.http_json import (
        _SpoolStreamReader,
    )

    import json as _json

    for fname, lo, hi in (("a.jsonl", 0, 10), ("b.jsonl", 10, 17)):
        with open(tmp_path / fname, "w") as fh:
            for i in range(lo, hi):
                fh.write(_json.dumps({"name": f"u{i}", "age": i}) + "\n")
    schema = StructType(
        [StructField("name", StringType()), StructField("age", IntegerType())]
    )
    rdr = _SpoolStreamReader(schema, str(tmp_path), 0)
    # Legacy start: 13 records consumed = all of a.jsonl + 3 of b.
    assert rdr._migrate({"index": 13}) == {
        "files": {"a.jsonl": 10, "b.jsonl": 3}
    }
    parts = rdr.partitions({"index": 13}, rdr.latestOffset())
    ranges = sorted(p.value for p in parts)
    assert ranges == [(str(tmp_path / "b.jsonl"), 3, 7)]
    # New-format offsets pass through untouched; junk raises clearly.
    assert rdr._migrate({"files": {"a.jsonl": 2}}) == {"files": {"a.jsonl": 2}}
    import pytest

    with pytest.raises(ValueError, match="unsupported httpjson offset"):
        rdr._migrate({"what": 1})


def test_coerce_is_type_strict_like_go():
    """Go's decoder does not parse numeric strings into ints, truncate
    fractional floats, or truthify strings into bools — wrong-typed
    values null out instead of fabricating data."""
    from go_http_data_pipeline_spark.sources.http_json import _decode_line

    fields = [("age", "int"), ("ok", "boolean"), ("score", "double"),
              ("name", "string")]
    line = '{"age":"12","ok":"false","score":"3.5","name":7}'
    assert _decode_line(line, fields) == (None, None, None, None)
    # Go parses int fields from the raw LITERAL (strconv.ParseInt):
    # 3.0 is rejected for an int just like 3.9 — only integer
    # literals decode; real bools/doubles/strings pass through.
    line = '{"age":3,"ok":true,"score":2,"name":"x"}'
    assert _decode_line(line, fields) == (3, True, 2.0, "x")
    assert _decode_line('{"age":3.0}', fields) == (None, None, None, None)
    assert _decode_line('{"age":3.9}', fields) == (None, None, None, None)
    assert _decode_line('{"age":true}', fields)[0] is None
