"""Byte-level emulation of the Go error surfaces the reference leaks
through its CLI: fastjson's ``Parse`` errors (the JSON datasource,
datasources/json/workers.go:53-62 wraps them as ``couldn't parse
json: %w``) and ``encoding/csv``'s ``ParseError`` (the CSV datasource,
datasources/csv/execution.go:42-60 wraps header errors as ``couldn't
decode csv header row: %w`` and record errors as ``couldn't decode
message: %w``).

Both emulators run DRIVER-SIDE on the ERROR PATH ONLY — one
sequential pass over the single offending file after Spark's FAILFAST
scan has already raised — so they cost nothing at scale and never
touch executors.

Sources emulated (both public third-party libraries the reference
depends on, not reference code):

- github.com/valyala/fastjson v1.6.3 ``parser.go`` (pinned by the
  reference's go.sum). The full error surface of ``Parser.Parse`` is
  reproduced: value dispatch, object/array/string/number sub-errors,
  the ``; unparsed tail: %q`` suffix with its 80-byte start..end
  truncation, and the ``unexpected tail`` post-parse check. The two
  reference error fixtures (invalid token → number path, valid
  non-object) are byte-verified by the golden harness; the remaining
  classes follow the same v1.6.3 code paths but have no reference
  fixture to pin them.
- Go ``encoding/csv`` ``Reader.readRecord`` (go1.17+ semantics:
  1-based byte columns, ``record on line N; parse error on line N,
  column M`` two-position rendering). ``LazyQuotes=false``,
  ``TrimLeadingSpace=false``, ``Comment=0`` — the reference leaves
  the decoder at defaults and only sets ``Comma``.
"""

from __future__ import annotations

_FJ_WS = " \n\t\r"          # fastjson skipWS set (0x20 0x0A 0x09 0x0D)
_FJ_MAX_DEPTH = 300          # fastjson MaxDepth
_FJ_NUM_CHARS = set("0123456789.-eE+")


def go_quote(s: str) -> str:
    """Go's ``%q`` (strconv.Quote) for strings: standard Go escapes
    for control characters (``\\t \\n \\r \\a \\b \\f \\v``, else
    ``\\x%02x``), printable runes pass through, non-printable
    non-ASCII uses ``\\u%04x`` / ``\\U%08x``."""
    special = {'"': '\\"', "\\": "\\\\", "\t": "\\t", "\n": "\\n",
               "\r": "\\r", "\a": "\\a", "\b": "\\b", "\f": "\\f",
               "\v": "\\v"}
    out = ['"']
    for ch in s:
        if ch in special:
            out.append(special[ch])
        elif " " <= ch <= "~":
            out.append(ch)
        elif ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append("\\x%02x" % ord(ch))
        elif 0xDC80 <= ord(ch) <= 0xDCFF:
            # surrogateescape carrier for a raw invalid byte (e.g. a
            # rune split by the byte-based _start_end cut): Go's %q
            # prints the byte as \x%02x
            out.append("\\x%02x" % (ord(ch) - 0xDC00))
        elif ch.isprintable():
            out.append(ch)
        elif ord(ch) > 0xFFFF:
            out.append("\\U%08x" % ord(ch))
        else:
            out.append("\\u%04x" % ord(ch))
    out.append('"')
    return "".join(out)


def _start_end(s: str) -> str:
    """fastjson ``startEndString``: >80 BYTES → first 40 + "..." +
    last 40, measured and cut in UTF-8 bytes like the Go string (a
    character-based cut let ≤80 multibyte chars through untruncated
    and split at the wrong offset — r8 review). A cut that lands
    inside a rune decodes its fragment bytes as lone surrogates,
    which ``go_quote`` renders as ``\\x%02x`` exactly like Go's %q
    renders invalid bytes."""
    b = s.encode("utf-8", "surrogateescape")
    if len(b) <= 80:
        return s
    return ((b[:40] + b"..." + b[-40:])
            .decode("utf-8", "surrogateescape"))


class _FJError(Exception):
    """A fastjson parse error: inner message + the unparsed tail it
    was raised with (``parseValue`` returns both)."""

    def __init__(self, msg: str, tail: str):
        super().__init__(msg)
        self.msg = msg
        self.tail = tail


def _fj_skip_ws(s: str) -> str:
    return s.lstrip(_FJ_WS)


def _fj_parse_raw_string(s: str) -> str:
    """parser.go parseRawString (opening quote already consumed):
    find the first unescaped ``"``; error tail is the EMPTY string.
    The fast-path check (``n == 0 or s[n-1] != '\\'``) re-runs at the
    TOP of the slow-path loop exactly like fastjson's — omitting it
    misparsed any string whose escaped quote is followed by a closing
    quote not preceded by a backslash, e.g. ``"a\\"b"`` (r8 review,
    reproduced)."""
    n = s.find('"')
    if n < 0:
        raise _FJError("missing closing '\"'", "")
    while True:
        if n == 0 or s[n - 1] != "\\":
            return s[n + 1:]
        i = n - 1
        while i > 0 and s[i - 1] == "\\":
            i -= 1
        if (n - i) % 2 == 0:
            return s[n + 1:]
        s = s[n + 1:]
        n = s.find('"')
        if n < 0:
            raise _FJError("missing closing '\"'", "")


def _fj_parse_raw_key(s: str) -> str:
    """parser.go parseRawKey: fast scan for ``"``; any backslash
    falls back to the full string parser."""
    for i, ch in enumerate(s):
        if ch == '"':
            return s[i + 1:]
        if ch == "\\":
            return _fj_parse_raw_string(s)
    raise _FJError("missing closing '\"'", "")


def _fj_parse_raw_number(s: str) -> str:
    """parser.go parseRawNumber: scan the number charset; a reject at
    position 0 (or 1 after a sign) checks inf/nan then errors with
    the first char; the error tail is the whole remaining input."""
    for i, ch in enumerate(s):
        if ch in _FJ_NUM_CHARS:
            continue
        if i == 0 or (i == 1 and s[0] in "-+"):
            if len(s) - i >= 3 and s[i:i + 3].lower() in ("inf", "nan"):
                return s[i + 3:]
            raise _FJError(f"unexpected char: {go_quote(s[:1])}", s)
        return s[i:]
    return ""


def _fj_parse_value(s: str, depth: int) -> str:
    """parser.go parseValue: returns the unparsed tail; raises
    ``_FJError`` with fastjson's exact message chain."""
    if not s:
        raise _FJError("cannot parse empty string", s)
    depth += 1
    if depth > _FJ_MAX_DEPTH:
        raise _FJError(
            f"too big depth for the nested JSON; it exceeds {_FJ_MAX_DEPTH}",
            s)
    c = s[0]
    if c == "{":
        try:
            return _fj_parse_object(s[1:], depth)
        except _FJError as e:
            raise _FJError(f"cannot parse object: {e.msg}", e.tail)
    if c == "[":
        try:
            return _fj_parse_array(s[1:], depth)
        except _FJError as e:
            raise _FJError(f"cannot parse array: {e.msg}", e.tail)
    if c == '"':
        try:
            return _fj_parse_raw_string(s[1:])
        except _FJError as e:
            raise _FJError(f"cannot parse string: {e.msg}", e.tail)
    if c == "t":
        if s[:4] != "true":
            raise _FJError(f"unexpected value found: {go_quote(s)}", s)
        return s[4:]
    if c == "f":
        if s[:5] != "false":
            raise _FJError(f"unexpected value found: {go_quote(s)}", s)
        return s[5:]
    if c == "n":
        if s[:4] != "null":
            if s[:3].lower() == "nan":
                return s[3:]
            raise _FJError(f"unexpected value found: {go_quote(s)}", s)
        return s[4:]
    try:
        return _fj_parse_raw_number(s)
    except _FJError as e:
        raise _FJError(f"cannot parse number: {e.msg}", e.tail)


def _fj_parse_object(s: str, depth: int) -> str:
    s = _fj_skip_ws(s)
    if not s:
        raise _FJError("missing '}'", s)
    if s[0] == "}":
        return s[1:]
    while True:
        s = _fj_skip_ws(s)
        if not s or s[0] != '"':
            raise _FJError("cannot find opening '\"' for object key", s)
        try:
            s = _fj_parse_raw_key(s[1:])
        except _FJError as e:
            raise _FJError(f"cannot parse object key: {e.msg}", e.tail)
        s = _fj_skip_ws(s)
        if not s or s[0] != ":":
            raise _FJError("missing ':' after object key", s)
        s = _fj_skip_ws(s[1:])
        try:
            s = _fj_parse_value(s, depth)
        except _FJError as e:
            raise _FJError(f"cannot parse object value: {e.msg}", e.tail)
        s = _fj_skip_ws(s)
        if not s:
            raise _FJError("unexpected end of object", s)
        if s[0] == ",":
            s = s[1:]
            continue
        if s[0] == "}":
            return s[1:]
        raise _FJError("missing ',' after object value", s)


def _fj_parse_array(s: str, depth: int) -> str:
    s = _fj_skip_ws(s)
    if not s:
        raise _FJError("missing ']'", s)
    if s[0] == "]":
        return s[1:]
    while True:
        s = _fj_skip_ws(s)
        try:
            s = _fj_parse_value(s, depth)
        except _FJError as e:
            raise _FJError(f"cannot parse array value: {e.msg}", e.tail)
        s = _fj_skip_ws(s)
        if not s:
            raise _FJError("unexpected end of array", s)
        if s[0] == ",":
            s = s[1:]
            continue
        if s[0] == "]":
            return s[1:]
        raise _FJError("missing ',' after array value", s)


def fastjson_parse_error(data: str) -> tuple[str | None, bool]:
    """``fastjson.Parser.Parse`` on ``data``: returns
    ``(error_message, is_object)``. ``error_message`` is None on
    success; ``is_object`` says whether the parsed top-level value is
    a JSON object (``Value.Object()`` succeeds)."""
    s = _fj_skip_ws(data)
    try:
        tail = _fj_parse_value(s, 0)
    except _FJError as e:
        return (f"cannot parse JSON: {e.msg}; unparsed tail: "
                f"{go_quote(_start_end(e.tail))}", False)
    is_obj = s[:1] == "{"
    tail = _fj_skip_ws(tail)
    if tail:
        return f"unexpected tail: {go_quote(_start_end(tail))}", False
    return None, is_obj


def json_line_detail(line: str) -> str | None:
    """The reference's inner error detail for one bad JSON line
    (datasources/json/workers.go:53-62): a fastjson parse failure is
    wrapped ``couldn't parse json: <err>``; a valid but non-object
    value is ``expected JSON object, got '<raw line>'``; a valid
    object returns None (the failure was elsewhere — print the line
    number alone rather than guess)."""
    err, is_obj = fastjson_parse_error(line)
    if err is not None:
        return f"couldn't parse json: {err}"
    if not is_obj:
        return f"expected JSON object, got '{line}'"
    return None


# ---------------------------------------------------------------------------
# Go encoding/csv
# ---------------------------------------------------------------------------

_ERR_BARE_QUOTE = 'bare " in non-quoted field'
_ERR_QUOTE = 'extraneous or missing " in quoted-field'
_ERR_FIELD_COUNT = "wrong number of fields"


class _CSVParseError(Exception):
    """encoding/csv ``ParseError`` with its exact rendering."""

    def __init__(self, start_line: int, line: int, column: int | None,
                 err: str):
        self.start_line, self.line, self.column, self.err = (
            start_line, line, column, err)
        super().__init__(self.render())

    def render(self) -> str:
        if self.err == _ERR_FIELD_COUNT:
            return f"record on line {self.line}: {self.err}"
        if self.start_line != self.line:
            return (f"record on line {self.start_line}; parse error on "
                    f"line {self.line}, column {self.column}: {self.err}")
        return (f"parse error on line {self.line}, column "
                f"{self.column}: {self.err}")


class _GoCSVReader:
    """encoding/csv ``Reader`` (go1.17+ reader.go) restricted to what
    the reference configures: ``Comma`` set, everything else default.
    Tracks physical line numbers and 1-based byte columns exactly as
    Go does, including ``\\r\\n`` normalization, quoted fields
    spanning lines, and blank-line skipping."""

    def __init__(self, data: bytes, comma: str):
        self.lines = data.split(b"\n")
        self.nl_at_eof = data.endswith(b"\n")
        if self.nl_at_eof:
            self.lines = self.lines[:-1]
        self.idx = 0            # next physical line index (0-based)
        self.num_line = 0       # Go r.numLine
        self.comma = comma.encode()
        self.fields_per_record = 0

    def _read_line(self) -> bytes | None:
        """Go readLine: one physical line with its ``\\n`` restored
        (``\\r\\n`` normalized to ``\\n``; the final unterminated
        line keeps no newline and drops a trailing ``\\r``). None at
        EOF."""
        if self.idx >= len(self.lines):
            return None
        raw = self.lines[self.idx]
        last = self.idx == len(self.lines) - 1
        self.idx += 1
        self.num_line += 1
        if last and not self.nl_at_eof:
            if raw.endswith(b"\r"):
                raw = raw[:-1]
            return raw
        if raw.endswith(b"\r"):
            raw = raw[:-1]
        return raw + b"\n"

    @staticmethod
    def _length_nl(b: bytes) -> int:
        return 1 if b.endswith(b"\n") else 0

    def read(self) -> list[bytes] | None:
        """Go ``Reader.Read``: one record or None at EOF; raises
        ``_CSVParseError``."""
        # skip blank lines
        line = None
        while True:
            line = self._read_line()
            if line is None:
                return None
            if len(line) == self._length_nl(line):
                continue
            break

        pos_line, pos_col = self.num_line, 1
        rec_line = pos_line
        fields: list[bytes] = []
        err: _CSVParseError | None = None

        while True:  # parseField
            if not line or not line.startswith(b'"'):
                # Non-quoted field
                i = line.find(self.comma)
                field = line[:i] if i >= 0 else (
                    line[:len(line) - self._length_nl(line)])
                j = field.find(b'"')
                if j >= 0:
                    err = _CSVParseError(rec_line, pos_line, pos_col + j,
                                         _ERR_BARE_QUOTE)
                    break
                fields.append(field)
                if i >= 0:
                    line = line[i + len(self.comma):]
                    pos_col += i + len(self.comma)
                    continue
                break
            # Quoted field
            line = line[1:]
            pos_col += 1
            buf = b""
            closed = False
            comma_closed = False
            while not closed:
                i = line.find(b'"')
                if i >= 0:
                    buf += line[:i]
                    line = line[i + 1:]
                    pos_col += i + 1
                    nxt = line[:1]
                    if nxt == b'"':
                        buf += b'"'
                        line = line[1:]
                        pos_col += 1
                    elif nxt == self.comma:
                        line = line[len(self.comma):]
                        pos_col += len(self.comma)
                        fields.append(buf)
                        closed = True          # continue parseField
                        comma_closed = True
                    elif self._length_nl(line) == len(line):
                        fields.append(buf)     # `"\n` — end of record
                        closed = True
                        line = b""
                    else:
                        err = _CSVParseError(rec_line, pos_line,
                                             pos_col - 1, _ERR_QUOTE)
                        break
                elif line:
                    buf += line
                    pos_col += len(line)
                    line = self._read_line()
                    if line is None:
                        line = b""
                        continue
                    if line:
                        pos_line = self.num_line
                        pos_col = 1
                else:
                    # abrupt EOF inside a quoted field
                    err = _CSVParseError(rec_line, pos_line, pos_col,
                                         _ERR_QUOTE)
                    break
            if err is not None:
                break
            if not line:
                if comma_closed:
                    # Go parses one more (empty) field after a quoted
                    # field closed by a comma at EOF without a
                    # newline: b'"x",' is ["x", ""] (parseField's
                    # next iteration hits the empty non-quoted
                    # branch) — the early break dropped it and
                    # fabricated a wrong-field-count error (r8
                    # review, reproduced)
                    fields.append(b"")
                break

        if err is not None:
            raise err
        if self.fields_per_record > 0:
            if len(fields) != self.fields_per_record:
                raise _CSVParseError(rec_line, rec_line, None,
                                     _ERR_FIELD_COUNT)
        elif self.fields_per_record == 0:
            self.fields_per_record = len(fields)
        return fields


def gocsv_decode_error(path: str, sep: str,
                       header: bool = True) -> str | None:
    """Replay Go's ``encoding/csv`` over the file exactly as the
    reference's CSV datasource drives it (datasources/csv/
    execution.go:38-60): ``Comma`` set, header row read first WHEN
    the source is configured with one (``d.header`` — its failure
    wraps as ``couldn't decode csv header row: <err>``), then records
    until the first error (``couldn't decode message: <err>``).
    Returns the wrapped reference message for the first failure, or
    None if Go's decoder accepts the whole file (the Spark failure
    was something else — keep the generic error)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    rdr = _GoCSVReader(data, sep)
    if header:
        try:
            if rdr.read() is None:  # header (sets the field count)
                return None
        except _CSVParseError as e:
            return f"couldn't decode csv header row: {e.render()}"
    while True:
        try:
            if rdr.read() is None:
                return None
        except _CSVParseError as e:
            return f"couldn't decode message: {e.render()}"


class GoCSVDecodeError(ValueError):
    """A CSV file Go's decoder rejects, caught at READ time by the
    strict-quote replay (sources/files.read_csv): univocity accepts
    two damage classes Go errors on — a bare ``"`` mid-field
    (ErrBareQuote: univocity only treats a field as quoted when it
    STARTS with a quote) and an unterminated quote running to EOF —
    so FAILFAST never fires and the runtime error path can't render
    them. Carries the already-wrapped reference message
    (``couldn't decode message: …`` / ``couldn't decode csv header
    row: …``) for the CLI chain."""

    def __init__(self, msg: str):
        self.go_msg = msg
        super().__init__(msg)
