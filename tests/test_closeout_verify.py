"""Gate-of-the-gate: ``closeout.py --verify`` must refuse a snapshot
whose HEAD carries post-certification CODE changes (the r9 loophole:
three untested functions landed 22 minutes after a green close-out),
while allowing the normal artifact-commit workflow (CLOSEOUT.md /
bench records committed after the gate ran)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _git(cwd, *args):
    subprocess.run(["git", *args], cwd=cwd, check=True,
                   capture_output=True)


def _head(cwd) -> str:
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=cwd,
                          capture_output=True,
                          text=True).stdout.strip()


def _fake_repo(tmp_path):
    d = tmp_path / "repo"
    d.mkdir()
    _git(d, "init", "-q")
    _git(d, "config", "user.email", "t@t")
    _git(d, "config", "user.name", "t")
    (d / "octosql_spark").mkdir()
    (d / "octosql_spark" / "mod.py").write_text("x = 1\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "base")
    return d


def _certify(d, extra: str = "") -> None:
    (d / "CLOSEOUT.md").write_text(
        f"# CLOSEOUT — GREEN\n\nTree: `{_head(d)[:9]}` (clean)\n"
        f"Certified-Tree: {_head(d)}\n{extra}\n- all gates green\n")
    _git(d, "add", "CLOSEOUT.md")
    _git(d, "commit", "-qm", "closeout artifacts")


def _verify(monkeypatch, d) -> int:
    import closeout
    monkeypatch.setattr(closeout, "REPO", str(d))
    return closeout.verify()


def test_verify_accepts_artifact_only_advance(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    _certify(d)  # committing CLOSEOUT.md itself advances HEAD
    (d / "BENCH_r10.json").write_text("{}\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "bench record")
    assert _verify(monkeypatch, d) == 0


def test_verify_refuses_post_gate_code_commit(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    _certify(d)
    (d / "octosql_spark" / "sneaky.py").write_text("y = 2\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "smuggled code")
    assert _verify(monkeypatch, d) == 1


def test_verify_refuses_dirty_worktree(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    _certify(d)
    (d / "octosql_spark" / "mod.py").write_text("x = 3\n")  # uncommitted
    assert _verify(monkeypatch, d) == 1


def test_verify_refuses_fast_certification(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    _certify(d, extra="Mode: --fast (pytest skipped; NOT a valid "
                      "round close-out)")
    assert _verify(monkeypatch, d) == 1


def test_verify_refuses_red_or_missing(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    assert _verify(monkeypatch, d) == 1  # no CLOSEOUT.md at all
    (d / "CLOSEOUT.md").write_text(
        f"# CLOSEOUT — RED\n\nCertified-Tree: {_head(d)}\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "red closeout")
    assert _verify(monkeypatch, d) == 1


def test_verify_refuses_non_py_code_in_new_dir(tmp_path, monkeypatch):
    """ADVICE r10: the artifact check is an ALLOWLIST — behavior-
    bearing non-.py files in a new top-level directory (scripts/
    run.sh, SQL fixture dirs) are code and must refuse, not slip
    through as 'artifact-only'."""
    d = _fake_repo(tmp_path)
    _certify(d)
    (d / "scripts").mkdir()
    (d / "scripts" / "run.sh").write_text("echo hi\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "helper script")
    assert _verify(monkeypatch, d) == 1


def test_verify_refuses_unknown_top_level_file(tmp_path, monkeypatch):
    d = _fake_repo(tmp_path)
    _certify(d)
    (d / "setup.cfg").write_text("[tool]\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "config")
    assert _verify(monkeypatch, d) == 1
