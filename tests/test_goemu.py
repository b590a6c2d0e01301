"""Unit tests for the Go error-surface emulator (goemu.py): fastjson
v1.6.3 Parse errors and Go encoding/csv ParseError rendering. All
expected strings are hand-traced against the library sources the
reference pins (fastjson parser.go, go1.17+ csv/reader.go); the two
reference .err fixtures remain the byte-verified anchors in
tests/test_golden_scenarios.py."""

from octosql_spark.goemu import (go_quote, gocsv_decode_error,
                                 json_line_detail)


# ---------------------------------------------------------------- fastjson

def test_number_path_fixture_shape():
    # the error1 fixture class: first char routes to parseRawNumber
    assert json_line_detail("abcd") == (
        "couldn't parse json: cannot parse JSON: cannot parse number: "
        'unexpected char: "a"; unparsed tail: "abcd"')


def test_non_object_fixture_shape():
    # the error2 fixture class: valid value, not an object
    assert json_line_detail('"abcd"') == "expected JSON object, got '\"abcd\"'"
    assert json_line_detail("[1,2]") == "expected JSON object, got '[1,2]'"
    assert json_line_detail("42") == "expected JSON object, got '42'"


def test_valid_object_returns_none():
    assert json_line_detail('{"a": 1, "b": [1, 2, {"c": "d"}]}') is None
    # fastjson parses NaN (case-insensitive) where json.loads differs
    assert json_line_detail('{"a": NaN}') is None


def test_unterminated_string_value():
    assert json_line_detail('{"a": "unterminated') == (
        "couldn't parse json: cannot parse JSON: cannot parse object: "
        "cannot parse object value: cannot parse string: "
        "missing closing '\"'; unparsed tail: \"\"")


def test_trailing_comma_in_object():
    assert json_line_detail('{"a": 1,}') == (
        "couldn't parse json: cannot parse JSON: cannot parse object: "
        "cannot find opening '\"' for object key; unparsed tail: \"}\"")


def test_missing_colon_after_key():
    assert json_line_detail('{"a" 1}') == (
        "couldn't parse json: cannot parse JSON: cannot parse object: "
        "missing ':' after object key; unparsed tail: \"1}\"")


def test_missing_comma_between_members():
    assert json_line_detail('{"a": 1 "b": 2}') == (
        "couldn't parse json: cannot parse JSON: cannot parse object: "
        "missing ',' after object value; unparsed tail: \"\\\"b\\\": 2}\"")


def test_bad_literal():
    assert json_line_detail("truth") == (
        "couldn't parse json: cannot parse JSON: unexpected value found: "
        '"truth"; unparsed tail: "truth"')
    assert json_line_detail('{"a": fals}') == (
        "couldn't parse json: cannot parse JSON: cannot parse object: "
        "cannot parse object value: unexpected value found: "
        '"fals}"; unparsed tail: "fals}"')


def test_unterminated_array():
    assert json_line_detail("[1, 2") == (
        "couldn't parse json: cannot parse JSON: cannot parse array: "
        'unexpected end of array; unparsed tail: ""')


def test_unexpected_tail_after_valid_value():
    assert json_line_detail('{"a": 1} trailing') == (
        'couldn\'t parse json: unexpected tail: "trailing"')


def test_empty_line():
    assert json_line_detail("") == (
        "couldn't parse json: cannot parse JSON: cannot parse empty "
        'string; unparsed tail: ""')


def test_tail_start_end_truncation():
    # startEndString: >80 chars → first 40 + "..." + last 40
    line = "x" * 100
    detail = json_line_detail(line)
    assert detail == (
        "couldn't parse json: cannot parse JSON: cannot parse number: "
        'unexpected char: "x"; unparsed tail: "'
        + "x" * 40 + "..." + "x" * 40 + '"')


def test_go_quote_escapes():
    assert go_quote('a"b\\c\td') == '"a\\"b\\\\c\\td"'
    assert go_quote("\x01") == '"\\x01"'
    assert go_quote("é") == '"é"'


# ------------------------------------------------------------- encoding/csv

def _write(tmp_path, text, name="t.csv"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_csv_wrong_field_count(tmp_path):
    p = _write(tmp_path, "a,b\n1,2\n3,4,5\n")
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: record on line 3: "
        "wrong number of fields")


def test_csv_bare_quote_column(tmp_path):
    # line 3 = `2,ab"cd` — the quote is byte 5 (1-based)
    p = _write(tmp_path, 'a,b\n1,ok\n2,ab"cd\n')
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: parse error on line 3, column 5: "
        'bare " in non-quoted field')


def test_csv_invalid_quoted_field_column(tmp_path):
    # line 2 = `1,"ab"x` — the closing quote is byte 6
    p = _write(tmp_path, 'a,b\n1,"ab"x\n')
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: parse error on line 2, column 6: "
        'extraneous or missing " in quoted-field')


def test_csv_unterminated_quote_eof(tmp_path):
    # `1,"unterminated` + newline consumed into the quoted field; EOF
    # at line 2, column 4 + len("unterminated\n") = 17
    p = _write(tmp_path, 'a,b\n1,"unterminated\n')
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: parse error on line 2, column 17: "
        'extraneous or missing " in quoted-field')


def test_csv_multiline_record_two_position_error(tmp_path):
    # record starts line 2; the stray closing quote is on line 3 byte 2
    p = _write(tmp_path, 'a,b\n1,"x\ny"z,3\n')
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: record on line 2; parse error on "
        'line 3, column 2: extraneous or missing " in quoted-field')


def test_csv_multiline_record_field_count_uses_start_line(tmp_path):
    # quoted newline keeps the record valid; 3 fields vs 2 — Go
    # reports the record's START line
    p = _write(tmp_path, 'a,b\n1,"x\ny",5\n')
    assert gocsv_decode_error(p, ",") == (
        "couldn't decode message: record on line 2: "
        "wrong number of fields")


def test_csv_header_row_error_wrapper(tmp_path):
    p = _write(tmp_path, 'a,"b\n1,2\n')
    msg = gocsv_decode_error(p, ",")
    assert msg.startswith("couldn't decode csv header row: ")
    assert 'extraneous or missing " in quoted-field' in msg


def test_csv_quoted_newline_and_escaped_quotes_ok(tmp_path):
    # valid Go csv: quoted newlines, `""` escapes, blank lines skipped
    p = _write(tmp_path, 'a,b\n1,"x\ny"\n\n2,"he said ""hi"""\n')
    assert gocsv_decode_error(p, ",") is None


def test_csv_crlf_and_tsv(tmp_path):
    p = _write(tmp_path, "a\tb\r\n1\t2\r\n3\t4\t5\r\n", "t.tsv")
    assert gocsv_decode_error(p, "\t") == (
        "couldn't decode message: record on line 3: "
        "wrong number of fields")


def test_fastjson_class_corpus_frozen(spark, tmp_path, capsys):
    """Every emulated fastjson Parse error class, end-to-end through
    the CLI (wrapper chain + line number + inner detail), frozen in
    tests/fixtures/fastjson_classes.json. No Go toolchain or
    reference binary exists in this container, so these are NOT
    reference-captured bytes (the two classes that are —
    error1/error2.err — stay byte-exact in test_golden_scenarios);
    they freeze the source-derived emulation so any drift in ANY
    class fails here. Regenerate deliberately with
    tools/make_fastjson_fixtures.py."""
    import json as _json
    import os

    from octosql_spark.cli import main

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "fastjson_classes.json")
    with open(fix) as f:
        corpus = _json.load(f)
    assert len(corpus) >= 17
    for name, rec in sorted(corpus.items()):
        p = tmp_path / f"{name}.json"
        p.write_text('{"a": 1}\n' + rec["bad_line"] + "\n")
        rc = main([f"SELECT COUNT(*) AS n FROM '{p}'",
                   "--output", "csv"])
        err_lines = capsys.readouterr().err.strip().splitlines()
        got = err_lines[0] if err_lines else ""
        assert rc == rec["rc"], name
        assert got == rec["stderr"], (name, got, rec["stderr"])


def test_csv_quote_probe_cached_per_content(spark, tmp_path, monkeypatch):
    """The quote probe + Go replay run ONCE per (path, size, mtime)
    (r6 What's-wrong #2): a second read of the same quoted CSV must
    not re-read the head or re-replay; touching the file re-probes."""
    import octosql_spark.sources.files as files_mod
    from octosql_spark.sources.files import read_csv

    p = tmp_path / "quoted.csv"
    p.write_text('a,b\n1,"x,y"\n2,"z"\n')
    calls = {"n": 0}
    real = files_mod._read_head

    def counting(path, cap):
        calls["n"] += 1
        return real(path, cap)

    monkeypatch.setattr(files_mod, "_read_head", counting)
    assert read_csv(spark, str(p)).count() == 2
    assert read_csv(spark, str(p)).count() == 2
    assert calls["n"] == 1  # probe + replay verdict memoized
    # content change (size differs) invalidates the cache entry
    with open(p, "a") as f:
        f.write('3,"w"\n')
    assert read_csv(spark, str(p)).count() == 3
    assert calls["n"] == 2


def test_csv_large_quoted_file_replays_executor_side(spark, tmp_path):
    """A quoted CSV past the 64 MB probe cap gets the exact Go-decoder
    replay in ONE executor task (r6 Next #7 — previously such files
    kept the old univocity tolerance): Go-rejected damage errors at
    read time with Go's ParseError text, and the driver never streams
    the file."""
    from octosql_spark.goemu import GoCSVDecodeError
    from octosql_spark.sources.files import read_csv

    p = tmp_path / "big.csv"
    filler = "x" * 63 + ",ok"
    with open(p, "w") as f:
        f.write("a,b\n")
        f.write('1,"q"\n')          # quote in the head → probe fires
        f.write('2,ab"cd\n')        # Go ErrBareQuote on line 3, col 5
        n_rows = (65 << 20) // (len(filler) + 1)
        for i in range(n_rows):     # pad past the 64 MB cap
            f.write(filler + "\n")
    assert p.stat().st_size > (64 << 20)
    try:
        read_csv(spark, str(p))
        raise AssertionError("expected GoCSVDecodeError")
    except GoCSVDecodeError as e:
        assert e.go_msg == (
            "couldn't decode message: parse error on line 3, "
            'column 5: bare " in non-quoted field')


def test_csv_large_file_quote_past_head_still_probed(spark, tmp_path):
    """The large-file probe is a FULL-file memchr, not a head window:
    a file whose only quote damage sits past 64 MB still errors with
    Go's ParseError (previously such files silently kept univocity's
    tolerance)."""
    from octosql_spark.goemu import GoCSVDecodeError
    from octosql_spark.sources.files import read_csv

    p = tmp_path / "late_quote.csv"
    filler = "y" * 63 + ",ok"
    n_rows = (65 << 20) // (len(filler) + 1)
    with open(p, "w") as f:
        f.write("a,b\n")
        for i in range(n_rows):      # quote-free first 65 MB
            f.write(filler + "\n")
        f.write('9,ab"cd\n')         # bare quote only past the cap
    assert p.stat().st_size > (64 << 20)
    try:
        read_csv(spark, str(p))
        raise AssertionError("expected GoCSVDecodeError")
    except GoCSVDecodeError as e:
        assert e.go_msg == (
            f"couldn't decode message: parse error on line "
            f"{n_rows + 2}, column 5: bare \" in non-quoted field")


# ------------------------------------------- seeded damage fuzzing
#
# r6 verdict Next #9: the frozen fixture set covers hand-built shapes;
# these sweeps pin the emulated Go error surface over GENERATED damage
# — every classification must be deterministic across calls, and every
# produced message must have one of Go's exact shapes with an in-range
# line number. Seeds are pinned; a falsifying case gets frozen as a
# named regression test above.

import random
import re


def _random_csv(rng):
    """A structurally valid CSV, then 0-2 random damage operations
    (quote injection, field add/drop, newline-in-quote, truncation)."""
    ncols = rng.randint(1, 5)
    rows = [[f"h{c}" for c in range(ncols)]]
    for _ in range(rng.randint(1, 8)):
        rows.append([rng.choice(["v", "1", "2.5", "", "x y"])
                     + str(rng.randint(0, 9)) for _ in range(ncols)])
    txt = "\n".join(",".join(r) for r in rows) + "\n"
    for _ in range(rng.randint(0, 2)):
        op = rng.randint(0, 4)
        i = rng.randint(0, max(0, len(txt) - 2))
        if op == 0:
            txt = txt[:i] + '"' + txt[i:]          # bare/extra quote
        elif op == 1:
            txt = txt[:i] + "," + txt[i:]          # field count damage
        elif op == 2:
            txt = txt[:i] + '"a\nb"' + txt[i:]     # quoted newline
        elif op == 3:
            txt = txt[:rng.randint(0, len(txt))]   # truncation
        else:
            txt = txt[:i] + '""' + txt[i:]         # RFC escape pair
    return txt


_CSV_MSG_RE = re.compile(
    r"^couldn't decode (?:csv header row|message): "
    r"(?:record on line (\d+): wrong number of fields"
    r"|(?:record on line \d+; )?parse error on line (\d+), column \d+: "
    r'(?:bare " in non-quoted field'
    r'|extraneous or missing " in quoted-field'
    r"|unexpected end of file))$")


def test_fuzz_gocsv_classification_deterministic_and_well_formed(tmp_path):
    rng = random.Random(20260815)
    n_err = 0
    for case in range(250):
        txt = _random_csv(rng)
        p = tmp_path / f"c{case}.csv"
        p.write_bytes(txt.encode())
        m1 = gocsv_decode_error(str(p), ",")
        m2 = gocsv_decode_error(str(p), ",")
        assert m1 == m2, f"nondeterministic on case {case}: {txt!r}"
        if m1 is not None:
            n_err += 1
            mt = _CSV_MSG_RE.match(m1)
            assert mt, f"unknown message shape on case {case}: {m1!r}\n{txt!r}"
            line = int(mt.group(1) or mt.group(2))
            assert 1 <= line <= txt.count("\n") + 2, (m1, txt)
    assert n_err > 50  # the damage grammar really produces errors


def test_fuzz_quote_free_csv_agrees_with_spark_failfast(spark, tmp_path):
    """For QUOTE-FREE files goemu never fires at read time — the
    splittable univocity FAILFAST scan is the arbiter — so Go's
    accept/reject (wrong field count is the only possible damage
    class) must AGREE with the scan, or strictness would depend on
    file size. Differential over seeded field-count damage."""
    from octosql_spark.sources.files import read_csv
    rng = random.Random(42)
    for case in range(25):
        ncols = rng.randint(2, 4)
        rows = [",".join(f"h{c}" for c in range(ncols))]
        for _ in range(rng.randint(1, 6)):
            n = ncols + rng.choice([0, 0, 0, 1, -1])
            rows.append(",".join(f"v{rng.randint(0, 9)}"
                                 for _ in range(max(1, n))))
        txt = "\n".join(rows) + "\n"
        p = tmp_path / f"q{case}.csv"
        p.write_bytes(txt.encode())
        go_rejects = gocsv_decode_error(str(p), ",") is not None
        try:
            read_csv(spark, str(p), octosql_infer=False).collect()
            spark_rejects = False
        except Exception:  # noqa: BLE001 — any scan failure counts
            spark_rejects = True
        assert go_rejects == spark_rejects, (case, txt, go_rejects)


def test_fuzz_fastjson_classification_total_and_deterministic():
    """json_line_detail must be TOTAL (no exception on arbitrary
    damage), deterministic, and every produced message must carry one
    of the emulated fastjson/tail shapes."""
    rng = random.Random(77)
    n_err = 0
    for case in range(250):
        obj = {"a": rng.randint(0, 99), "s": "x" * rng.randint(0, 5),
               "l": [1, {"k": "v"}], "f": rng.random()}
        import json as _json
        line = _json.dumps(obj)
        for _ in range(rng.randint(0, 3)):
            op = rng.randint(0, 2)
            i = rng.randint(0, max(0, len(line) - 1))
            if op == 0 and line:
                line = line[:i] + line[i + 1:]            # delete
            elif op == 1:
                line = line[:i] + rng.choice(',:"{}[]x\\ ') + line[i:]
            else:
                line = line[:rng.randint(0, len(line))]   # truncate
        d1 = json_line_detail(line)
        d2 = json_line_detail(line)
        assert d1 == d2, f"nondeterministic on case {case}: {line!r}"
        if d1 is not None:
            n_err += 1
            assert (d1.startswith("couldn't parse json: ")
                    or d1.startswith("expected JSON object, got ")), \
                f"unknown shape on case {case}: {d1!r}\n{line!r}"
    assert n_err > 50


def test_gocsv_quoted_field_comma_at_eof():
    """b'a,b\\n\"x\",' (no trailing newline): Go parses record 2 as
    ["x", ""] — the early EOF break dropped the pending empty field
    and fabricated a wrong-field-count error (r8 review)."""
    import tempfile

    from octosql_spark.goemu import gocsv_decode_error

    with tempfile.NamedTemporaryFile("wb", suffix=".csv",
                                     delete=False) as f:
        f.write(b'a,b\n"x",')
        p = f.name
    assert gocsv_decode_error(p, ",") is None


def test_fastjson_escaped_quote_then_plain_close():
    r"""'{"k":"a\"b"}' is valid JSON: the slow path must re-run the
    fast-path check per iteration like fastjson's parseRawString
    (r8 review: the port misparsed it as unterminated)."""
    from octosql_spark.cli import _json_line_detail

    assert _json_line_detail('{"k":"a\\"b"}') is None
    assert _json_line_detail('{"k":"a\\\\"}') is None   # escaped backslash
    assert _json_line_detail('{"k":"unterminated') is not None


def test_start_end_truncates_by_bytes():
    """startEndString cuts at 80 BYTES (r8 review: 60 multibyte chars
    = 120 bytes slipped through the char-based check)."""
    from octosql_spark.goemu import _start_end, go_quote

    s = "ż" * 60  # 120 UTF-8 bytes
    out = _start_end(s)
    assert "..." in out
    # 40-byte cut = 20 two-byte runes on each side
    assert out == "ż" * 20 + "..." + "ż" * 20
    # a cut splitting a rune renders the fragment byte as \xNN via %q
    s2 = "x" * 39 + "ż" + "y" * 60
    q = go_quote(_start_end(s2))
    assert "\\xc5" in q  # first byte of ż split at offset 40
