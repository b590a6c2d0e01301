"""stdin source (execution/files/files.go:106-127) + TSV handler —
the reference's `seq 100 | octosql "SELECT SUM(int(text)) FROM
stdin.lines"` golden scenario (tests/scenarios/stdin/)."""

from __future__ import annotations

import subprocess
import sys


def _cli(query: str, stdin_text: str, extra: list[str] | None = None):
    return subprocess.run(
        [sys.executable, "-m", "octosql_spark.cli", query,
         "--output", "json"] + (extra or []),
        input=stdin_text, capture_output=True, text=True, cwd="/root/repo",
        timeout=240,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "PYTHONPATH": "/root/repo",
             "JAVA_HOME": "/usr/lib/jvm/java-17-openjdk-amd64"})


def test_stdin_lines_seqsum():
    seq = "\n".join(str(i) for i in range(1, 101)) + "\n"
    out = _cli("SELECT SUM(int(text)) AS s FROM stdin.lines", seq)
    assert out.returncode == 0, out.stderr[-2000:]
    assert '"s":5050' in out.stdout  # Go-style JSON: no spaces


def test_stdin_json():
    data = '{"a": 1}\n{"a": 2}\n'
    out = _cli("SELECT SUM(a) AS s, COUNT(*) AS n FROM stdin.json", data)
    assert out.returncode == 0, out.stderr[-2000:]
    # Float sum renders Go-style: whole double without .0, no spaces
    assert '"s":3' in out.stdout and '"n":2' in out.stdout


def test_tsv_file(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    from octosql_spark.sources import read_file
    df = read_file(spark, str(p))
    rows = df.collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]
