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
