"""Freeze the fastjson error-class corpus.

The reference wraps valyala/fastjson v1.6.3 Parse errors
(datasources/json/workers.go:53-62); goemu.py re-derives that error
surface from the pinned library source. This container has no Go
toolchain and no prebuilt reference binary, so the fixtures CANNOT be
reference-captured bytes; instead each class's full CLI stderr line
(wrapper chain + 1-based line number + inner detail) is frozen here
so any later goemu/cli change that shifts ANY class fails the golden
test. The two classes that DO have reference-captured fixtures
(error1/error2.err) are byte-exact already (test_golden_scenarios).

Run: python tools/make_fastjson_fixtures.py   # rewrites the corpus
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one representative malformed line per fastjson Parse error class
# (class name → the bad line placed at line 2 of a 2-line file)
CLASSES = {
    "unterminated_string_value": '{"a": "abc',
    "unterminated_object": '{"a": 1',
    "missing_colon_after_key": '{"a" 1}',
    "missing_comma_between_members": '{"a": 1 "b": 2}',
    "bad_literal_true": '{"a": tru}',
    "bad_literal_null": '{"a": nul}',
    "unterminated_array": '{"a": [1, 2',
    "missing_comma_in_array": '{"a": [1 2]}',
    "bad_number": '{"a": 12x3}',
    "bad_object_key": "{a: 1}",
    "unterminated_key": '{"a',
    "empty_object_member": '{,}',
    "depth_limit": '{"a": ' + "[" * 301 + "]" * 301 + "}",
    "unexpected_char_value": '{"a": @}',
    "non_object_scalar": "42",
    "non_object_string": '"abc"',
    "valid_value_with_tail": '{"a": 1} trailing',
}


def main() -> int:
    from octosql_spark.cli import main as cli_main

    out = {}
    for name, bad in CLASSES.items():
        with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False) as f:
            f.write('{"a": 1}\n' + bad + "\n")
            path = f.name
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = cli_main([f"SELECT COUNT(*) AS n FROM '{path}'",
                           "--output", "csv"])
        line = err.getvalue().strip().splitlines()
        out[name] = {"bad_line": bad, "rc": rc,
                     "stderr": line[0] if line else ""}
        os.unlink(path)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "fastjson_classes.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for name, rec in sorted(out.items()):
        print(f"{name}: rc={rec['rc']} {rec['stderr']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
