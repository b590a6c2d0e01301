"""Streaming through the front door: ``?tail=true`` sources, TRIGGER
specs, and the stream_native printer — the reference's core identity
("a query is a dataflow", execution/files/files.go:26-68,
parser/parser.go:503-534), mapped to Structured Streaming.

Also the stream_native golden shape from
tests/scenarios/simple/select_star_from_range.in.
"""

from __future__ import annotations

import threading
import time

from octosql_spark.cli import main


def test_stream_native_golden_range(spark, capsys):
    # golden: octosql "SELECT * FROM range(start => 1, end => 10) r"
    #         --output stream_native  (select_star_from_range.out)
    rc = main(["SELECT * FROM range(start => 1, end => 10) r",
               "--output", "stream_native"])
    out = capsys.readouterr().out
    assert rc == 0
    expected = "".join(f"{{+0001-01-01T00:00:00Z| {i} |}}\n"
                       for i in range(1, 10))
    assert out == expected


def test_cli_tail_drains_and_exits(spark, tmp_path, capsys):
    d = tmp_path / "people"
    d.mkdir()
    (d / "a.json").write_text('{"name": "alice", "age": 3}\n'
                              '{"name": "bob", "age": 5}\n')
    rc = main([f"SELECT name, age FROM '{d}/*.json?tail=true' WHERE age > 4",
               "--output", "json"])
    out = capsys.readouterr().out
    assert rc == 0
    assert '"bob"' in out and '"alice"' not in out


def test_cli_tail_trigger_eos(spark, tmp_path, capsys):
    d = tmp_path / "ev"
    d.mkdir()
    (d / "a.json").write_text('{"k": "x", "v": 1.0}\n{"k": "x", "v": 2.0}\n'
                              '{"k": "y", "v": 5.0}\n')
    rc = main([f"SELECT k, COUNT(*) AS n FROM '{d}/*.json?tail=true' "
               "GROUP BY k TRIGGER ON END OF STREAM",
               "--output", "stream_native"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "{+0001-01-01T00:00:00Z| 'x', 2 |}" in out
    assert "{+0001-01-01T00:00:00Z| 'y', 1 |}" in out


def test_cli_tail_follows_new_files(spark, tmp_path, capsys):
    """The tail loop picks up data that arrives while running (the
    growing-file scenario; Spark's idiom is new files in the watched
    glob)."""
    d = tmp_path / "grow"
    d.mkdir()
    (d / "a.json").write_text('{"n": 1}\n')

    t = threading.Thread(target=main, args=(
        [f"SELECT n FROM '{d}/*.json?tail=true'",
         "--output", "stream_native", "--duration", "20"],))
    t.start()
    # wait for batch 0 to process, then grow the source
    time.sleep(6)
    (d / "b.json").write_text('{"n": 2}\n')
    t.join(timeout=60)
    assert not t.is_alive()
    out = capsys.readouterr().out
    assert "{+0001-01-01T00:00:00Z| 1 |}" in out
    assert "{+0001-01-01T00:00:00Z| 2 |}" in out


# ------------------------------------------- union scenario goldens

import os

_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_union_json_golden(spark, capsys):
    # tests/scenarios/outputs/json/union.out
    rc = main([f"SELECT * FROM '{_FIXTURES}/union.json'", "--output", "json"])
    out = capsys.readouterr().out
    assert rc == 0
    # reference golden (union.out), modulo id rendering: JSON numbers
    # infer as Float (impl.go:89-90) so id prints 0.0 where Go's
    # encoder prints 0 — the VALUE payloads match exactly
    assert out.splitlines() == ['{"id": 0.0, "value": 42}',
                                '{"id": 0.0, "value": "42"}',
                                '{"id": 0.0, "value": [42, "42"]}']


def test_varying_fields_stream_native_golden(spark, capsys):
    # tests/scenarios/objects/varying_object_fields.out
    rc = main([f"SELECT * FROM '{_FIXTURES}/varying.json'",
               "--output", "stream_native"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines() == [
        "{+0001-01-01T00:00:00Z| 'value', 42, { 'eulav', 24, <null> } |}",
        "{+0001-01-01T00:00:00Z| 'value', 42, { <null>, 'eulav', 'value' } |}",
    ]
