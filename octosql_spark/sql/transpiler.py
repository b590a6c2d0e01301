"""OctoSQL dialect → Spark SQL transpiler.

The reference's SQL surface (parser/sqlparser fork + parser/parser.go)
differs from Spark SQL in a handful of ways; everything else IS
standard SQL, so we rewrite only the deltas and hand the result to
Catalyst (SURVEY.md §3 "Spark mapping of the lifecycle"):

| OctoSQL                      | rewritten to                           |
|------------------------------|----------------------------------------|
| ``obj->field``, ``obj->*``   | ``obj.field`` / ``obj.*`` (parser/parser.go:745-751) |
| ``x::Int``                   | ``TRY_CAST(x AS BIGINT)`` (TypeAssertion — README.md:271) |
| ``a ~ 'p'`` / ``~*`` / ``!~``| ``regexp_like`` forms (functions.go:591-668) |
| ``int(x)/float(x)/string(x)``| ``TRY_CAST``/``CAST`` (functions.go:900-1013) |
| ``len(x)``                   | ``length(x)`` (strings; `size` for arrays) |
| ``now()``                    | ``current_timestamp()``                |
| ``parse_time(s)``            | ``try_to_timestamp(s)`` (+Go-layout translation) |
| ``time_from_unix/to_unix``   | ``timestamp_seconds``/``unix_timestamp`` |
| ``FROM file.csv`` etc.       | temp view over the file reader (cmd/root.go:192-217) |
| ``tumble(...)/max_diff_watermark(...)/poll(...)`` TVFs | materialized to temp views via octosql_spark.tvf |
| ``TRIGGER ...`` clause       | stripped; returned as metadata (→ streaming output modes) |

``range(a,b)`` passes through (Spark SQL TVF, column aliased ``i`` by
the reference — use ``range(a,b) t(i)``-style aliasing or ``id``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from octosql_spark.functions.registry import go_layout_to_java
from octosql_spark.sql.tokenizer import Tok, tokenize

_TYPE_MAP = {
    "int": "BIGINT", "float": "DOUBLE", "string": "STRING",
    "boolean": "BOOLEAN", "bool": "BOOLEAN", "time": "TIMESTAMP",
    "null": "VOID",
}

_FILE_EXTS = {"csv", "tsv", "json", "parquet", "lines"}
_TVF_NAMES = {"tumble", "max_diff_watermark", "poll", "range"}
_CLAUSE_KW = {"WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "ON", "USING",
              "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS",
              "UNION", "INTERSECT", "EXCEPT", "TRIGGER", "STREAM", "LOOKUP"}

# Keywords that can directly precede a parenthesized expression and
# must NOT be mistaken for a function-call name when walking back to a
# primary's start (`SELECT (x) * 2`: the left operand of `*` is `(x)`,
# not `SELECT(x)`).
_NONCALL_KW = _CLAUSE_KW | {
    "SELECT", "FROM", "AND", "OR", "NOT", "WHEN", "THEN", "ELSE", "END",
    "CASE", "AS", "BY", "IN", "DISTINCT", "ALL", "VALUES", "THEN", "SET",
    "BETWEEN", "LIKE", "ILIKE", "IS", "OF", "WITH"}

_view_counter = itertools.count()


@dataclass
class Transpiled:
    sql: str
    triggers: list[str] = field(default_factory=list)
    views: dict[str, str] = field(default_factory=dict)  # view -> source desc
    polls: list[str] = field(default_factory=list)  # poll() intervals
    event_time: str | None = None  # column carrying record event time
    ordered: bool = False  # top-level ORDER BY (sink must not re-sort)


def _sig(toks: list[Tok]) -> list[int]:
    return [i for i, t in enumerate(toks) if t.kind not in ("WS", "COMMENT")]


def _match_paren(toks: list[Tok], open_i: int, direction: int = 1) -> int:
    """Index of the paren/bracket matching toks[open_i]
    ('('/'[' forward, ')'/']' backward)."""
    opens, closes = ("(", "["), (")", "]")
    depth = 0
    i = open_i
    while 0 <= i < len(toks):
        if toks[i].text in opens:
            depth += 1
        elif toks[i].text in closes:
            depth -= 1
        if depth == 0:
            return i
        i += direction
    raise ValueError("unbalanced parentheses")


def _primary_start(toks: list[Tok], end_i: int) -> int:
    """Start index of the primary expression ending at ``end_i``
    (inclusive): walks back over dotted chains, subscripts and one
    balanced paren/bracket group. Used to find the left operand of
    postfix/infix rewrites (``::``, ``~``)."""
    i = end_i
    while True:
        t = toks[i]
        if t.text in (")", "]"):
            i = _match_paren(toks, i, -1)
            # function call: name before '('
            j = i - 1
            while j >= 0 and toks[j].kind in ("WS", "COMMENT"):
                j -= 1
            if (j >= 0 and toks[j].kind in ("IDENT", "QIDENT")
                    and toks[i].text == "("
                    and toks[j].text.upper() not in _NONCALL_KW):
                i = j
        elif t.kind not in ("IDENT", "QIDENT", "STRING", "NUMBER"):
            raise ValueError(f"cannot find primary start at {t.text!r}")
        # `INTERVAL <n> <unit>` literal: extend back from the unit
        if t.kind == "IDENT":
            back = []
            j = i - 1
            while j >= 0 and len(back) < 2:
                if toks[j].kind not in ("WS", "COMMENT"):
                    back.append(j)
                j -= 1
            if (len(back) == 2 and toks[back[0]].kind in ("NUMBER", "STRING")
                    and toks[back[1]].is_kw("INTERVAL")):
                return back[1]
        # extend over `.`-qualified prefix
        j = i - 1
        while j >= 0 and toks[j].kind in ("WS", "COMMENT"):
            j -= 1
        if j >= 1 and toks[j].text == "." and toks[j].kind == "PUNCT":
            k = j - 1
            while k >= 0 and toks[k].kind in ("WS", "COMMENT"):
                k -= 1
            if k >= 0 and toks[k].kind in ("IDENT", "QIDENT") or toks[k].text in (")", "]"):
                i = k
                continue
        return i


def _primary_end(toks: list[Tok], start_i: int) -> int:
    """End index (inclusive) of the primary expression starting at
    ``start_i``: identifier chains, literals, one call/paren group."""
    i = start_i
    while True:
        t = toks[i]
        if t.text == "(":
            i = _match_paren(toks, i, 1)
        elif t.is_kw("INTERVAL"):
            # `INTERVAL <n> <unit>` literal spans three tokens
            j = i + 1
            while j < len(toks) and toks[j].kind in ("WS", "COMMENT"):
                j += 1
            if j < len(toks) and toks[j].kind in ("NUMBER", "STRING"):
                k = j + 1
                while k < len(toks) and toks[k].kind in ("WS", "COMMENT"):
                    k += 1
                if k < len(toks) and toks[k].kind == "IDENT":
                    return k
            raise ValueError("malformed INTERVAL literal")
        elif t.kind in ("IDENT", "QIDENT"):
            # maybe a call: peek next significant
            j = i + 1
            while j < len(toks) and toks[j].kind in ("WS", "COMMENT"):
                j += 1
            if j < len(toks) and toks[j].text == "(":
                i = _match_paren(toks, j, 1)
        elif t.kind in ("STRING", "NUMBER"):
            pass
        else:
            raise ValueError(f"cannot find primary end at {t.text!r}")
        # continue over `.field` / subscript
        j = i + 1
        while j < len(toks) and toks[j].kind in ("WS", "COMMENT"):
            j += 1
        if j < len(toks) and toks[j].text == ".":
            k = j + 1
            while k < len(toks) and toks[k].kind in ("WS", "COMMENT"):
                k += 1
            if k < len(toks) and toks[k].kind in ("IDENT", "QIDENT"):
                i = k
                continue
        if j < len(toks) and toks[j].text == "[":
            i = _match_paren(toks, j, 1)
            continue
        return i


# ------------------------------------------------------------ rewrites

def _rewrite_arrow(toks: list[Tok]) -> list[Tok]:
    return [Tok("PUNCT", ".") if t.kind == "OP" and t.text == "->" else t
            for t in toks]


# runtime typeof() names that satisfy each assertion target — the
# numeric widths collapse because the reference's Int is one type
_STRICT_TYPEOF = {
    "BIGINT": ("tinyint", "smallint", "int", "bigint"),
    "DOUBLE": ("float", "double"),
    "STRING": ("string",),
    "BOOLEAN": ("boolean",),
    "TIMESTAMP": ("timestamp", "timestamp_ntz"),
}


def _collect_variant_cols(spark: SparkSession, toks: list[Tok]) -> set[str]:
    """Lowercased column names with Spark 4 VARIANT type across the
    referenced tables/views (union carriers from JSON sources) — the
    only expressions strict `::` needs the schema_of_variant guard
    for (the guard is analysis-time illegal on non-variant input)."""
    sig = _sig(toks)
    out: set[str] = set()
    for si in _table_positions(toks):
        t = toks[sig[si]]
        if t.kind not in ("IDENT", "QIDENT"):
            continue
        try:
            dtypes = spark.table(t.text.strip('"`')).dtypes
        except Exception:
            continue
        out |= {c.lower() for c, d in dtypes if d == "variant"}
    return out


def _rewrite_type_assert(toks: list[Tok], strict: bool = False,
                         variant_cols: set[str] | None = None) -> list[Tok]:
    """``expr::Type`` → ``TRY_CAST(expr AS T)``. The reference's
    ``::`` is a runtime TypeAssertion (execution/expressions.go:91-102):
    keep the value if it already has the type, else NULL — never error.
    TRY_CAST gives NULL-never-error under Spark 4 ANSI mode, matching
    the README idiom ``COALESCE(age::int, int(age::string), 0)``.
    Residual deviation (documented): for a string carrier, TRY_CAST
    *converts* parsable values ('42'::Int → 42) where the reference's
    assertion yields NULL; union carriers read from JSON rely on the
    convert behavior (types.py try_cast accessor policy).

    ``strict=True`` closes that deviation (DEVIATIONS 1): the
    assertion only passes values whose RUNTIME type already matches —
    ``CASE WHEN typeof(e) IN (...) THEN CAST(e AS T)`` for plain
    carriers, plus a ``schema_of_variant`` guard for Spark 4 VARIANT
    union carriers — so ``'42'::Int`` is NULL, exactly the reference's
    no-conversion TypeCast (execution/expressions.go:79-102)."""
    while True:
        sig = _sig(toks)
        hit = None
        for si, i in enumerate(sig):
            if toks[i].kind == "OP" and toks[i].text == "::":
                hit = (si, i)
                break
        if hit is None:
            return toks
        si, i = hit
        type_i = sig[si + 1]
        tname = toks[type_i].text.lower()
        sqlt = _TYPE_MAP.get(tname, toks[type_i].text.upper())
        start = _primary_start(toks, sig[si - 1])
        expr = toks[start:i]
        if strict and sqlt in _STRICT_TYPEOF:
            e = "".join(t.text for t in expr)
            base = e.rsplit(".", 1)[-1].strip().strip('`"').lower()
            if variant_cols and base in variant_cols:
                # VARIANT union carrier: runtime type lives in the
                # variant itself
                guarded = (
                    f"CASE WHEN schema_of_variant({e}) = '{sqlt}' "
                    f"THEN try_variant_get({e}, '$', '{sqlt}') END")
            else:
                names = ", ".join(f"'{n}'" for n in _STRICT_TYPEOF[sqlt])
                guarded = (
                    f"CASE WHEN typeof({e}) IN ({names}) "
                    f"THEN CAST({e} AS {sqlt}) END")
            toks = (toks[:start] + [Tok("PUNCT", "(")] + tokenize(guarded)
                    + [Tok("PUNCT", ")")] + toks[type_i + 1:])
            continue
        toks = (toks[:start]
                + [Tok("IDENT", "TRY_CAST"), Tok("PUNCT", "(")]
                + expr
                + [Tok("WS", " "), Tok("IDENT", "AS"), Tok("WS", " "),
                   Tok("IDENT", sqlt), Tok("PUNCT", ")")]
                + toks[type_i + 1:])


def _rewrite_regex_ops(toks: list[Tok]) -> list[Tok]:
    while True:
        sig = _sig(toks)
        hit = None
        for si, i in enumerate(sig):
            if toks[i].kind == "OP" and toks[i].text in ("~", "~*", "!~", "!~*"):
                hit = (si, i)
                break
        if hit is None:
            return toks
        si, i = hit
        op = toks[i].text
        lstart = _primary_start(toks, sig[si - 1])
        rstart = sig[si + 1]
        rend = _primary_end(toks, rstart)
        left = toks[lstart:sig[si - 1] + 1]
        right = toks[rstart:rend + 1]
        out: list[Tok] = []
        if op.startswith("!"):
            out += [Tok("IDENT", "NOT"), Tok("WS", " ")]
        out += [Tok("IDENT", "regexp_like"), Tok("PUNCT", "(")] + left + [Tok("PUNCT", ","), Tok("WS", " ")]
        if op.endswith("*"):
            out += [Tok("IDENT", "concat"), Tok("PUNCT", "("),
                    Tok("STRING", "'(?i)'"), Tok("PUNCT", ","), Tok("WS", " ")] \
                + right + [Tok("PUNCT", ")")]
        else:
            out += right
        out += [Tok("PUNCT", ")")]
        toks = toks[:lstart] + out + toks[rend + 1:]


def _is_call(toks: list[Tok], sig: list[int], si: int) -> bool:
    """significant index si is an IDENT directly followed by '(' and
    not preceded by '.' (qualified name) — i.e. a function call."""
    i = sig[si]
    if toks[i].kind != "IDENT":
        return False
    if si + 1 >= len(sig) or toks[sig[si + 1]].text != "(":
        return False
    if si > 0 and toks[sig[si - 1]].text == ".":
        return False
    return True


_CAST_FNS = {"int": ("TRY_CAST", "BIGINT"), "float": ("TRY_CAST", "DOUBLE"),
             "string": ("CAST", "STRING")}
# panic(msg) fails the query at runtime (functions.go catalog;
# tests/scenarios/functions/panic golden) → Spark's raise_error
_SIMPLE_RENAMES = {"now": "current_timestamp",
                   "time_from_unix": "timestamp_seconds",
                   "panic": "raise_error"}


def _split_call_args(toks: list[Tok], open_i: int, close_i: int) -> list[tuple[int, int]]:
    """Token spans (start, end inclusive) of a call's top-level args,
    whitespace-trimmed."""
    spans: list[tuple[int, int]] = []
    depth = 0
    start = open_i + 1
    for j in range(open_i + 1, close_i):
        t = toks[j]
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        elif depth == 0 and t.text == ",":
            spans.append((start, j - 1))
            start = j + 1
    if start <= close_i - 1:
        spans.append((start, close_i - 1))
    trimmed = []
    for s, e in spans:
        while s <= e and toks[s].kind in ("WS", "COMMENT"):
            s += 1
        while e >= s and toks[e].kind in ("WS", "COMMENT"):
            e -= 1
        if s <= e:
            trimmed.append((s, e))
    return trimmed


def _rewrite_functions(toks: list[Tok],
                       types: dict[str, str] | None = None) -> list[Tok]:
    types = types or {}
    changed = True
    while changed:
        changed = False
        sig = _sig(toks)
        for si in range(len(sig)):
            if not _is_call(toks, sig, si):
                continue
            i = sig[si]
            name = toks[i].text.lower()
            if name in _SIMPLE_RENAMES:
                toks[i] = Tok("IDENT", _SIMPLE_RENAMES[name])
                changed = True
                break
            if name in ("floor", "ceil"):
                # the reference returns FLOAT (functions.go:394-412);
                # Spark's floor/ceil return LONG → wrap in CAST(..
                # AS DOUBLE). Guard: skip a call we already wrapped
                # (its immediate parent is the CAST we emitted).
                if (si >= 2 and toks[sig[si - 1]].text == "("
                        and toks[sig[si - 2]].kind == "IDENT"
                        and toks[sig[si - 2]].text.upper() == "CAST"):
                    continue
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                toks = (toks[:i]
                        + [Tok("IDENT", "CAST"), Tok("PUNCT", "("),
                           Tok("IDENT", name), Tok("PUNCT", "(")]
                        + toks[open_i + 1:close_i]
                        + [Tok("PUNCT", ")"), Tok("WS", " "),
                           Tok("IDENT", "AS"), Tok("WS", " "),
                           Tok("IDENT", "DOUBLE"), Tok("PUNCT", ")")]
                        + toks[close_i + 1:])
                changed = True
                break
            if name == "len":
                # len dispatches on the runtime type in the reference
                # (functions.go:774-831): String → length, List → size.
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                args = _split_call_args(toks, open_i, close_i)
                cat = None
                if len(args) == 1:
                    asig = [sj for sj in range(len(sig))
                            if args[0][0] <= sig[sj] <= args[0][1]]
                    if asig:
                        cat = _operand_cat(toks, sig, asig[0], "right", types)
                toks[i] = Tok("IDENT",
                              "size" if cat in ("array", "map") else "length")
                changed = True
                break
            if name in _CAST_FNS:
                fn, sqlt = _CAST_FNS[name]
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                toks = (toks[:i]
                        + [Tok("IDENT", fn), Tok("PUNCT", "(")]
                        + toks[open_i + 1:close_i]
                        + [Tok("WS", " "), Tok("IDENT", "AS"), Tok("WS", " "),
                           Tok("IDENT", sqlt), Tok("PUNCT", ")")]
                        + toks[close_i + 1:])
                changed = True
                break
            if name == "substr":
                # 0-based in the dialect (functions.go:720-739) →
                # Spark's 1-based substring: bump arg 2 by one.
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                args = _split_call_args(toks, open_i, close_i)
                if len(args) >= 2:
                    s, e = args[1]
                    toks = (toks[:i] + [Tok("IDENT", "substring")]
                            + toks[i + 1:s]
                            + [Tok("PUNCT", "(")] + toks[s:e + 1]
                            + [Tok("PUNCT", ")"), Tok("OP", "+"),
                               Tok("NUMBER", "1")]
                            + toks[e + 1:])
                else:
                    toks[i] = Tok("IDENT", "substring")
                changed = True
                break
            if name == "position":
                # position(haystack, needle) → 0-based, NULL-on-absent
                # (functions.go:757-772). Spark's builtin position is
                # (needle, haystack) 1-based / 0-on-absent.
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                toks = (toks[:i]
                        + [Tok("PUNCT", "("), Tok("IDENT", "nullif"),
                           Tok("PUNCT", "("), Tok("IDENT", "instr"),
                           Tok("PUNCT", "(")]
                        + toks[open_i + 1:close_i]
                        + [Tok("PUNCT", ")"), Tok("PUNCT", ","),
                           Tok("WS", " "), Tok("NUMBER", "0"),
                           Tok("PUNCT", ")"), Tok("WS", " "),
                           Tok("OP", "-"), Tok("WS", " "),
                           Tok("NUMBER", "1"), Tok("PUNCT", ")")]
                        + toks[close_i + 1:])
                changed = True
                break
            if name == "time_to_unix":
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                toks = (toks[:i]
                        + [Tok("IDENT", "unix_timestamp"), Tok("PUNCT", "("),
                           Tok("IDENT", "CAST"), Tok("PUNCT", "(")]
                        + toks[open_i + 1:close_i]
                        + [Tok("WS", " "), Tok("IDENT", "AS"), Tok("WS", " "),
                           Tok("IDENT", "TIMESTAMP"), Tok("PUNCT", ")"),
                           Tok("PUNCT", ")")]
                        + toks[close_i + 1:])
                changed = True
                break
            if name == "parse_time":
                toks[i] = Tok("IDENT", "try_to_timestamp")
                # translate a literal Go layout 2nd arg, if present
                open_i = sig[si + 1]
                close_i = _match_paren(toks, open_i, 1)
                depth = 0
                for j in range(open_i, close_i):
                    if toks[j].text == "(":
                        depth += 1
                    elif toks[j].text == ")":
                        depth -= 1
                    elif depth == 1 and toks[j].text == ",":
                        k = j + 1
                        while k < close_i and toks[k].kind in ("WS", "COMMENT"):
                            k += 1
                        if toks[k].kind == "STRING":
                            layout = toks[k].text[1:-1]
                            toks[k] = Tok("STRING", f"'{go_layout_to_java(layout)}'")
                changed = True
                break
    return toks


def _rewrite_subscript(toks: list[Tok]) -> list[Tok]:
    """``list[i]`` → ``get(list, i)`` — the reference's 0-based,
    NULL-on-out-of-range indexing (functions.go:1014-1042). Spark's
    native ``[]`` is also 0-based but *errors* out-of-range under
    ANSI mode; ``get()`` matches the reference exactly."""
    while True:
        sig = _sig(toks)
        hit = None
        for si in range(1, len(sig)):
            i = sig[si]
            if toks[i].text != "[" or toks[i].kind != "PUNCT":
                continue
            prev = toks[sig[si - 1]]
            if prev.kind in ("IDENT", "QIDENT") or prev.text in (")", "]"):
                hit = (si, i)
                break
        if hit is None:
            return toks
        si, i = hit
        close = _match_paren(toks, i, 1)
        start = _primary_start(toks, sig[si - 1])
        toks = (toks[:start]
                + [Tok("IDENT", "get"), Tok("PUNCT", "(")]
                + toks[start:i]
                + [Tok("PUNCT", ","), Tok("WS", " ")]
                + toks[i + 1:close]
                + [Tok("PUNCT", ")")]
                + toks[close + 1:])


def _type_cat(dtype: str) -> str:
    """Spark dtype string → overload category."""
    d = dtype.lower()
    if d == "string":
        return "string"
    if d.startswith(("tinyint", "smallint", "int", "bigint", "long",
                     "short", "byte")):
        return "int"
    if d.startswith(("float", "double", "decimal")):
        return "float"
    if d.startswith("array"):
        return "array"
    if d.startswith("map"):
        return "map"
    if d.startswith("struct"):
        return "struct"
    return d


def _collect_column_types(spark: SparkSession, toks: list[Tok]) -> dict[str, str]:
    """Unqualified column name → type category, from every table/view
    referenced in the (already view-rewritten) query. Names that
    resolve to conflicting categories across tables are dropped
    (ambiguous — leave the operator untouched). This is the runtime
    half of the reference's typecheck-time overload resolution
    (logical/function.go:24-132)."""
    sig = _sig(toks)
    types: dict[str, str] = {}
    for si in _table_positions(toks):
        t = toks[sig[si]]
        if t.kind not in ("IDENT", "QIDENT"):
            continue
        name = t.text.strip('"`')
        try:
            dtypes = spark.table(name).dtypes
        except Exception:
            continue
        for col, dtype in dtypes:
            cat = _type_cat(dtype)
            key = col.lower()
            if key in types and types[key] != cat:
                types[key] = "__ambiguous__"
            else:
                types.setdefault(key, cat)
    return {k: v for k, v in types.items() if v != "__ambiguous__"}


# Category of a function call's RESULT, by (dialect) name — used to
# resolve overloads whose operand is itself a call. `len` is "int" in
# the dialect regardless of its argument (functions.go:774-831).
_FN_RESULT_CAT = {
    "upper": "string", "lower": "string", "reverse": "string",
    "concat": "string", "repeat": "string", "substr": "string",
    "substring": "string", "replace": "string", "trim": "string",
    "string": "string", "concat_ws": "string",
    "len": "int", "length": "int", "size": "int", "instr": "int",
    "int": "int", "float": "float", "sqrt": "float",
    "pow": "float", "log": "float", "log2": "float", "log10": "float",
    # aggregates (aggregates/table.go): count is Int regardless of
    # argument, avg(Int) is Float; min/max/sum are per-overload
    # polymorphic (see _POLY_FNS)
    "count": "int", "count_distinct": "int",
    "avg": "float", "avg_distinct": "float",
    # nanosecond-carrying Duration (division results): see
    # _rewrite_arith_pass "durdiv_int" and _expand_durns_markers
    "__durns__": "durns",
}

# Polymorphic functions whose result category is derived from their
# argument categories (the reference types them per-overload —
# functions.go:357-380 abs, and coalesce/nullif/greatest/least get
# the union of their argument types in its planner). Without this,
# ``coalesce(nullif(0, 0), 1) / 2`` lost the Int/Int integer-division
# overload and float-divided (found by the long differential-fuzz
# sweep).
_POLY_FNS = {"coalesce", "nullif", "ifnull", "nvl", "greatest",
             "least", "abs",
             # per-overload polymorphic aggregates: min/max/sum keep
             # their argument's category (sum(Int) is Int, so
             # SUM(a)/COUNT(*) integer-divides like the reference)
             "min", "max", "sum",
             "min_distinct", "max_distinct", "sum_distinct"}


_CAST_TARGET_CAT = {
    "BIGINT": "int", "INT": "int", "INTEGER": "int", "SMALLINT": "int",
    "TINYINT": "int", "LONG": "int",
    "DOUBLE": "float", "FLOAT": "float", "REAL": "float",
    "STRING": "string", "VARCHAR": "string", "TEXT": "string",
}


def _scalar_subquery_cat(toks: list[Tok], sig: list[int],
                         types: dict[str, str]) -> str | None:
    """Category of a scalar subquery span (``sig[0]`` is SELECT): the
    category of its single select item — the reference types a
    subquery by its output column, so ``(SELECT min(k) FROM t) / 2``
    keeps the Int/Int integer-division overload (found by the r8
    9k-example fuzz soak). The item ends at the first depth-0 FROM.
    None (no rewrite — Spark semantics, the safe fallback) for:
    a multi-column list; an ALIASED item (`f AS cnt` must not
    resolve the ALIAS name against the outer column-type map — r8
    review); a set-operation subquery (UNION/INTERSECT/EXCEPT
    branches can differ in category and the first branch alone
    doesn't decide — r8 review)."""
    start = 1
    if (len(sig) > 1 and toks[sig[1]].kind == "IDENT"
            and toks[sig[1]].text.upper() == "DISTINCT"):
        start = 2  # DISTINCT keeps the item's category
    depth = 0
    item_end = None
    from_pos = None
    for pos in range(start, len(sig)):
        tt = toks[sig[pos]]
        up = tt.text.upper() if tt.kind == "IDENT" else ""
        if tt.text in ("(", "["):
            depth += 1
        elif tt.text in (")", "]"):
            depth -= 1
        elif depth == 0 and tt.text == ",":
            return None  # multi-column subquery: not scalar
        elif depth == 0 and up == "AS":
            return None  # aliased item: alias ≠ a typed column
        elif depth == 0 and up == "FROM":
            item_end = sig[pos - 1]
            from_pos = pos
            break
    if item_end is None or item_end < sig[start]:
        return None
    depth = 0
    for pos in range(from_pos + 1, len(sig)):
        tt = toks[sig[pos]]
        if tt.text in ("(", "["):
            depth += 1
        elif tt.text in (")", "]"):
            depth -= 1
        elif (depth == 0 and tt.kind == "IDENT" and tt.text.upper()
              in ("UNION", "INTERSECT", "EXCEPT")):
            return None  # set-op: later branches may differ
    return _span_cat(toks, sig[start], item_end, types)


def _span_cat(toks: list[Tok], lo: int, hi: int,
              types: dict[str, str]) -> str | None:
    """Type category of the expression spanned by toks[lo..hi]
    (significant-token bounds, inclusive): handles primaries, calls,
    paren groups and flat binary arithmetic chains."""
    sig = [i for i in range(lo, hi + 1)
           if toks[i].kind not in ("WS", "COMMENT")]
    if not sig:
        return None
    if (toks[sig[0]].kind == "IDENT"
            and toks[sig[0]].text.upper() == "SELECT"):
        # scalar subquery — MUST be handled before the binary-op scan
        # below: a SELECT-led span is never an operand chain, and an
        # arithmetic token inside the subquery's item or WHERE (e.g.
        # `SELECT min(k)+1 …`, `… WHERE k % 2 = 0`) sits at paren
        # depth 0 relative to this span and would wrongly split it
        # (r8 review finding on the r8 soak fix)
        return _scalar_subquery_cat(toks, sig, types)
    # top-level binary operators?
    depth = 0
    ops = []
    for i in sig:
        t = toks[i]
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        elif depth == 0 and ((t.kind == "OP" and t.text in ("+", "-", "*", "/", "%"))
                             or (t.kind == "IDENT" and t.text.upper() == "DIV")):
            ops.append(i)
    if ops:
        cats = []
        prev = lo
        for op_i in ops + [hi + 1]:
            cats.append(_span_cat(toks, prev, op_i - 1, types)
                        if prev <= op_i - 1 else None)
            prev = op_i + 1
        if any(c is None for c in cats):
            return None
        if all(c == "int" for c in cats):
            # dialect semantics: Int/Int is integer division
            # (functions.go:320-355), so the whole chain stays Int
            return "int"
        if set(cats) <= {"int", "float"}:
            return "float"
        if all(c == "string" for c in cats):
            return "string"  # will rewrite to concat/repeat
        if "durns" in cats and set(cats) <= {"durns", "duration", "int"}:
            # any chain touching a nanos-carrying duration stays nanos
            return "durns"
        if "duration" in cats and set(cats) <= {"duration", "int", "float"}:
            # duration +/- duration, duration */÷ scalar → duration
            # (functions.go:156-355 Duration overloads)
            return "duration"
        return None
    t = toks[sig[0]]
    if (t.kind == "IDENT" and t.text.upper() == "CASE"
            and toks[sig[-1]].kind == "IDENT"
            and toks[sig[-1]].text.upper() == "END"):
        # CASE result category = combined category of the THEN/ELSE
        # result expressions (the reference's planner types CASE as
        # the union of its branch types, so Int branches keep the
        # Int/Int division overload — found by the differential-fuzz
        # sweep via "(CASE WHEN 0 >= 0 THEN 1 ELSE 0 END) / 2")
        depth = 0
        casedepth = 0
        results: list[tuple[int, int]] = []
        cur: int | None = None
        mode = ""
        last = sig[0]
        for idx in sig:
            tt = toks[idx]
            up = tt.text.upper() if tt.kind == "IDENT" else ""
            if tt.text in ("(", "["):
                depth += 1
            elif tt.text in (")", "]"):
                depth -= 1
            elif depth == 0 and up == "CASE":
                casedepth += 1
                if casedepth == 1:
                    continue
            elif depth == 0 and up == "END":
                casedepth -= 1
                if casedepth == 0:
                    if mode in ("then", "else") and cur is not None:
                        results.append((cur, last))
                    break
            elif (depth == 0 and casedepth == 1
                  and up in ("WHEN", "THEN", "ELSE")):
                if mode in ("then", "else") and cur is not None:
                    results.append((cur, last))
                cur = None
                mode = up.lower()
                last = idx
                continue
            if mode in ("then", "else") and cur is None:
                cur = idx
            last = idx
        cats = {_span_cat(toks, s, e, types) for s, e in results}
        if not cats or None in cats:
            return None
        if cats == {"int"}:
            return "int"
        if cats <= {"int", "float"}:
            return "float"
        return cats.pop() if len(cats) == 1 else None
    if t.kind == "STRING":
        return "string" if len(sig) == 1 else None
    if t.kind == "NUMBER":
        if len(sig) != 1:
            return None
        txt = t.text.lower()
        return "float" if ("." in txt or "e" in txt) else "int"
    if t.kind in ("IDENT", "QIDENT"):
        if (t.is_kw("INTERVAL") and len(sig) == 3
                and toks[sig[1]].kind in ("NUMBER", "STRING")
                and toks[sig[2]].kind == "IDENT"):
            return "duration"
        if len(sig) == 1:
            return types.get(t.text.strip('"`').lower())
        if toks[sig[1]].text == "(" and sig[-1] == _match_paren(toks, sig[1], 1):
            if t.text.lower() in ("try_cast", "cast"):
                # ``x::T`` has already been rewritten to
                # TRY_CAST(x AS T) by the time the overload pass runs,
                # so the cast target (token before the closing paren)
                # determines the category: '7'::Int / 2 must still be
                # Int/Int integer division (functions.go:320-355).
                return _CAST_TARGET_CAT.get(toks[sig[-2]].text.upper())
            fname = t.text.lower()
            if fname in _POLY_FNS:
                args = _split_call_args(toks, sig[1], sig[-1])
                if not args:
                    return None
                if fname == "nullif":
                    # result type = first argument (second only
                    # compares)
                    return _span_cat(toks, args[0][0], args[0][1],
                                     types)
                cats = {_span_cat(toks, a, b, types) for a, b in args}
                if None in cats:
                    return None
                if cats == {"int"}:
                    return "int"
                if cats <= {"int", "float"}:
                    return "float"
                return cats.pop() if len(cats) == 1 else None
            return _FN_RESULT_CAT.get(fname)
        # dotted chain t.col → category of the final identifier
        if all(toks[i].kind in ("IDENT", "QIDENT") or toks[i].text == "."
               for i in sig):
            return types.get(toks[sig[-1]].text.strip('"`').lower())
        return None
    if t.text == "(" and sig[-1] == _match_paren(toks, sig[0], 1):
        return _span_cat(toks, sig[0] + 1, sig[-1] - 1, types)
    return None


def _operand_cat(toks: list[Tok], sig: list[int], si: int, side: str,
                 types: dict[str, str]) -> str | None:
    """Type category of the operand ending (side='left') or starting
    (side='right') at significant index ``si``; None when unknown."""
    try:
        if side == "left":
            start = _primary_start(toks, sig[si])
            return _span_cat(toks, start, sig[si], types)
        end = _primary_end(toks, sig[si])
        return _span_cat(toks, sig[si], end, types)
    except ValueError:
        return None


def _rewrite_arith_overloads(toks: list[Tok],
                             types: dict[str, str] | None = None) -> list[Tok]:
    """The reference's arithmetic overload set (functions.go:156-355):
    String+String → concat, String*Int / Int*String → repeat,
    Int/Int → integer division. Literals pin the overload directly;
    column operands resolve through ``types`` (view schemas collected
    post-``_rewrite_file_tables`` — the Spark-side equivalent of the
    reference's typecheck, logical/function.go:24-132)."""
    types = types or {}
    # multiplicative ops rewrite BEFORE additive (SQL precedence:
    # `'x' + s * 2` must become concat('x', repeat(s, 2)), not
    # concat('x', s) * 2). "-" participates only in the durns rules.
    # The pass pair iterates to a FIXPOINT: a durns rule only fires
    # on operands already normalized to a pure __DURNS__ marker, so
    # `((dur/3 + 1s) * 2) + 1s` needs mul → add → mul → add rounds
    # before every chain has collapsed. Uncapped: each round either
    # rewrites at least one site (strictly shrinking the remaining
    # work) or reaches the fixpoint; the guard only trips on a
    # rewrite-system bug, not on deep-but-valid nesting.
    rounds = 0
    while True:
        before = "".join(t.text for t in toks)
        for ops in (("*", "/"), ("+", "-")):
            toks = _rewrite_arith_pass(toks, types, ops)
        if "".join(t.text for t in toks) == before:
            break
        rounds += 1
        if rounds > 500:
            raise ValueError(
                "arithmetic overload rewrite did not converge "
                "(internal error; please report the query)")
    return toks


def _ns_of_duration(span: list[Tok]) -> list[Tok]:
    """Tokens for the exact total NANOSECONDS of a duration expression
    (epoch-shift to micros, then ×1000 — Spark intervals carry µs, so
    the ×1000 is exact)."""
    return ([Tok("PUNCT", "("), Tok("IDENT", "unix_micros"),
             Tok("PUNCT", "("), Tok("IDENT", "timestamp_micros"),
             Tok("PUNCT", "("), Tok("NUMBER", "0"), Tok("PUNCT", ")"),
             Tok("WS", " "), Tok("OP", "+"), Tok("WS", " ")]
            + span + [Tok("PUNCT", ")"), Tok("WS", " "), Tok("OP", "*"),
                      Tok("WS", " "), Tok("NUMBER", "1000"),
                      Tok("PUNCT", ")")])


def _durns_inner(span: list[Tok]) -> list[Tok] | None:
    """For a span that IS a (possibly parenthesized) pure
    ``__DURNS__( inner )`` marker: the parenthesized raw BIGINT nanos
    tokens. None for anything else — a durns-categorized CHAIN
    (marker + interval, marker * int …) is NOT unwrappable until the
    other passes have collapsed it into one marker."""
    def _sig_of(s):
        return [i for i, t in enumerate(s)
                if t.kind not in ("WS", "COMMENT")]
    sig = _sig_of(span)
    while (len(sig) >= 2 and span[sig[0]].text == "("
           and _match_paren(span, sig[0], 1) == sig[-1]):
        span = span[sig[0] + 1:sig[-1]]
        sig = _sig_of(span)
    if (len(sig) >= 3 and span[sig[0]].kind == "IDENT"
            and span[sig[0]].text == "__DURNS__"
            and span[sig[1]].text == "("
            and _match_paren(span, sig[1], 1) == sig[-1]):
        return [Tok("PUNCT", "(")] + span[sig[1] + 1:sig[-1]] \
            + [Tok("PUNCT", ")")]
    return None


def _durns_wrap(inner: list[Tok]) -> list[Tok]:
    return ([Tok("IDENT", "__DURNS__"), Tok("PUNCT", "(")] + inner
            + [Tok("PUNCT", ")")])


def _is_arith_op_tok(toks: list[Tok], i: int) -> bool:
    t = toks[i]
    return ((t.kind == "OP" and t.text in ("+", "-", "*", "/", "%"))
            or (t.kind == "IDENT" and t.text.upper() == "DIV"))


def _collect_arith_chain(toks: list[Tok], op_i: int):
    """Maximal flat run ``primary (op primary)*`` — across BOTH
    precedence levels — containing the arithmetic operator at token
    index ``op_i``. Returns ``(operand_spans, op_indices)`` with
    inclusive (start, end) token ranges, or None when the immediate
    neighborhood doesn't parse as a chain (unary minus, keyword…)."""
    def prev_sig(i):
        i -= 1
        while i >= 0 and toks[i].kind in ("WS", "COMMENT"):
            i -= 1
        return i

    def next_sig(i):
        i += 1
        while i < len(toks) and toks[i].kind in ("WS", "COMMENT"):
            i += 1
        return i if i < len(toks) else -1

    try:
        i = prev_sig(op_i)
        if i < 0:
            return None
        spans = [(_primary_start(toks, i), i)]
        ops = [op_i]
        i = next_sig(op_i)
        if i < 0:
            return None
        spans.append((i, _primary_end(toks, i)))
    except ValueError:
        return None
    while True:  # extend left while the previous token is a binary op
        j = prev_sig(spans[0][0])
        if j < 0 or not _is_arith_op_tok(toks, j):
            break
        k = prev_sig(j)
        if k < 0 or _is_arith_op_tok(toks, k):
            break  # doubled op ⇒ unary sign, not part of the chain
        try:
            start = _primary_start(toks, k)
        except ValueError:
            break
        ops.insert(0, j)
        spans.insert(0, (start, k))
    while True:  # and right symmetrically
        j = next_sig(spans[-1][1])
        if j < 0 or not _is_arith_op_tok(toks, j):
            break
        k = next_sig(j)
        if k < 0 or _is_arith_op_tok(toks, k):
            break
        try:
            end = _primary_end(toks, k)
        except ValueError:
            break
        ops.append(j)
        spans.append((k, end))
    return spans, ops


def _fold_duration_chain(toks: list[Tok], spans, op_idx,
                         types: dict[str, str]):
    """Left-to-right precedence-aware fold of a flat arithmetic chain
    involving Duration operands. Pairwise rewriting at a non-leftmost
    operator breaks left associativity — ``10s - 3s + 7s/3`` must
    group as ``(10s - 3s) + (7s/3)``, not ``10s - (3s + 7s/3)``
    (reference functions.go:156-355 evaluates strictly left-assoc
    within a precedence level) — so the WHOLE chain folds in one
    rewrite over exact int64 nanos. Returns the replacement token
    list, or the sentinel string ``"skip"`` when an operand is a
    still-mixed durns chain (or unknown type) that a later fixpoint
    round must collapse first."""
    sp = [Tok("WS", " ")]

    def paren(inner):
        return [Tok("PUNCT", "(")] + inner + [Tok("PUNCT", ")")]

    vals = []  # (cat, toks) — duration operands normalized to ns form
    for (s, e) in spans:
        c = _span_cat(toks, s, e, types)
        span = toks[s:e + 1]
        if c == "duration":
            vals.append(("durns", _ns_of_duration(span)))
        elif c == "durns":
            inner = _durns_inner(span)
            if inner is None:
                return "skip"
            vals.append(("durns", inner))
        elif c in ("int", "float"):
            vals.append((c, paren(span)))
        else:
            return "skip"

    def step_mul(left, op, right):
        (lc, lt), (rc, rt) = left, right
        if lc == "durns" and op in ("/", "DIV") and rc == "int":
            # Duration / Int divides the int64 nanos (Go truncation)
            return ("durns", paren(lt + sp + [Tok("IDENT", "DIV")]
                                   + sp + rt))
        if op == "*" and {lc, rc} == {"durns", "int"}:
            return ("durns", paren(lt + sp + [Tok("OP", "*")] + sp + rt))
        if lc == rc == "durns" and op == "/":
            return ("float", paren(lt + sp + [Tok("OP", "/")] + sp + rt))
        if lc == rc == "int" and op in ("/", "DIV"):
            return ("int", paren(lt + sp + [Tok("IDENT", "DIV")]
                                 + sp + rt))
        if {lc, rc} <= {"int", "float"} and op in ("*", "/", "%"):
            cat = "float" if ("float" in (lc, rc) or op == "/") else "int"
            return (cat, paren(lt + sp + [Tok("OP", op)] + sp + rt))
        return None

    def step_add(left, op, right):
        (lc, lt), (rc, rt) = left, right
        if lc == rc == "durns":
            return ("durns", paren(lt + sp + [Tok("OP", op)] + sp + rt))
        if {lc, rc} <= {"int", "float"}:
            cat = "float" if "float" in (lc, rc) else "int"
            return (cat, paren(lt + sp + [Tok("OP", op)] + sp + rt))
        return None

    op_texts = ["DIV" if toks[i].kind == "IDENT" else toks[i].text
                for i in op_idx]
    # multiplicative level first, grouped into additive terms
    terms = []
    pending_add = None
    cur = vals[0]
    for op, right in zip(op_texts, vals[1:]):
        if op in ("*", "/", "%", "DIV"):
            cur = step_mul(cur, op, right)
            if cur is None:
                return "skip"
        else:
            terms.append((pending_add, cur))
            pending_add, cur = op, right
    terms.append((pending_add, cur))
    acc = terms[0][1]
    for op, right in terms[1:]:
        acc = step_add(acc, op, right)
        if acc is None:
            return "skip"
    cat, body = acc
    return _durns_wrap(body) if cat == "durns" else body


def _rewrite_arith_pass(toks: list[Tok], types: dict[str, str],
                        ops: tuple[str, ...]) -> list[Tok]:
    while True:
        sig = _sig(toks)
        hit = None
        chain_repl = None
        for si in range(1, len(sig) - 1):
            i = sig[si]
            if toks[i].kind != "OP" or toks[i].text not in ops:
                continue
            op = toks[i].text
            lcat = _operand_cat(toks, sig, si - 1, "left", types)
            rcat = _operand_cat(toks, sig, si + 1, "right", types)
            if op == "+" and "string" in (lcat, rcat):
                hit = (si, "concat")
            elif op == "*" and ((lcat == "string" and rcat == "int")
                                or (lcat == "int" and rcat == "string")):
                hit = (si, "repeat" if lcat == "string" else "repeat_swap")
            elif op == "/" and lcat == rcat == "int":
                hit = (si, "div")
            elif op == "/" and lcat == "duration" and rcat == "int":
                # Duration / Int → nanosecond-carrying Duration: Go
                # divides the int64 nanos (functions.go:320-355), so
                # INTERVAL 7 SECOND / 3 = 2.333333333s — µs intervals
                # would lose the last 3 digits (DEVIATIONS 5, closed)
                hit = (si, "durdiv_int")
            elif "durns" in (lcat, rcat) and (
                    (op in ("+", "-") and {lcat, rcat} <= {"durns",
                                                           "duration"})
                    or (op == "*" and {lcat, rcat} == {"durns", "int"})
                    or (op == "/" and lcat == "durns"
                        and rcat in ("int", "duration", "durns"))
                    or (op == "/" and lcat == "duration"
                        and rcat == "durns")):
                # closure of the nanos-carrying duration over the
                # reference's Duration overload set — but ONLY once
                # each durns operand is a pure marker (a still-mixed
                # chain collapses in a later fixpoint round)
                try:
                    lspan = toks[_primary_start(toks, sig[si - 1]):
                                 sig[si - 1] + 1]
                    rspan = toks[sig[si + 1]:
                                 _primary_end(toks, sig[si + 1]) + 1]
                except ValueError:
                    continue
                if (lcat != "durns" or _durns_inner(lspan) is not None) \
                        and (rcat != "durns"
                             or _durns_inner(rspan) is not None):
                    hit = (si, f"durns:{op}:{lcat}:{rcat}")
            elif op == "/" and lcat == rcat == "duration":
                # Duration / Duration → Float ratio (functions.go
                # Duration overloads; arithmetic golden: INTERVAL 7
                # SECOND / INTERVAL 3 SECOND = 2.333…). Spark can't
                # divide intervals — convert each to exact micros via
                # epoch shift, then BIGINT/BIGINT → DOUBLE.
                hit = (si, "durdiv")
            if hit and (hit[1] in ("durdiv_int", "durdiv")
                        or hit[1].startswith("durns:")):
                # Duration hit inside a longer flat chain: pairwise
                # rewriting here would steal only the adjacent primary
                # and break left associativity (`10s - 3s + 7s/3`
                # must not become `10s - (3s + 7s/3)`). Fold the
                # whole chain in one precedence-aware rewrite; if an
                # operand hasn't collapsed yet, pairwise is only safe
                # at the chain-leftmost operator.
                chain = _collect_arith_chain(toks, i)
                if chain is not None and len(chain[0]) > 2:
                    folded = _fold_duration_chain(toks, chain[0],
                                                  chain[1], types)
                    if folded != "skip":
                        lo, hi = chain[0][0][0], chain[0][-1][1]
                        chain_repl = (lo, hi, folded)
                        break
                    if chain[1][0] != i:
                        hit = None
                        continue
            if hit:
                break
        if chain_repl is not None:
            lo, hi, folded = chain_repl
            toks = toks[:lo] + folded + toks[hi + 1:]
            continue
        if hit is None:
            return toks
        si, kind = hit
        lstart = _primary_start(toks, sig[si - 1])
        rend = _primary_end(toks, sig[si + 1])
        left = toks[lstart:sig[si - 1] + 1]
        right = toks[sig[si + 1]:rend + 1]
        if kind == "div":
            repl = left + [Tok("WS", " "), Tok("IDENT", "DIV"), Tok("WS", " ")] + right
        elif kind == "durdiv_int":
            # nanos(left) DIV right — Go's integer division of int64
            # nanos (truncation toward zero, like Spark's DIV)
            repl = _durns_wrap(
                _ns_of_duration(left)
                + [Tok("WS", " "), Tok("IDENT", "DIV"), Tok("WS", " ")]
                + right)
        elif kind.startswith("durns:"):
            _, op, lcat, rcat = kind.split(":")
            lns = (_durns_inner(left) if lcat == "durns"
                   else (_ns_of_duration(left) if lcat == "duration"
                         else left))
            rns = (_durns_inner(right) if rcat == "durns"
                   else (_ns_of_duration(right) if rcat == "duration"
                         else right))
            if op == "/" and rcat == "int":
                repl = _durns_wrap(lns + [Tok("WS", " "),
                                          Tok("IDENT", "DIV"),
                                          Tok("WS", " ")] + rns)
            elif op == "/":
                # ns/ns ratio → Float (Duration/Duration overload)
                repl = ([Tok("PUNCT", "(")] + lns
                        + [Tok("WS", " "), Tok("OP", "/"), Tok("WS", " ")]
                        + rns + [Tok("PUNCT", ")")])
            else:  # + - * stay nanos-carrying
                repl = _durns_wrap(lns + [Tok("WS", " "), Tok("OP", op),
                                          Tok("WS", " ")] + rns)
        elif kind == "durdiv":
            def _micros(span: list[Tok]) -> list[Tok]:
                return ([Tok("IDENT", "unix_micros"), Tok("PUNCT", "("),
                         Tok("IDENT", "timestamp_micros"), Tok("PUNCT", "("),
                         Tok("NUMBER", "0"), Tok("PUNCT", ")"),
                         Tok("WS", " "), Tok("OP", "+"), Tok("WS", " ")]
                        + span + [Tok("PUNCT", ")")])
            repl = ([Tok("PUNCT", "(")] + _micros(left)
                    + [Tok("WS", " "), Tok("OP", "/"), Tok("WS", " ")]
                    + _micros(right) + [Tok("PUNCT", ")")])
        else:
            fn = "concat" if kind == "concat" else "repeat"
            if kind == "repeat_swap":
                left, right = right, left  # repeat(str, n)
            repl = ([Tok("IDENT", fn), Tok("PUNCT", "(")] + left
                    + [Tok("PUNCT", ","), Tok("WS", " ")] + right
                    + [Tok("PUNCT", ")")])
        toks = toks[:lstart] + repl + toks[rend + 1:]


def _expand_durns_markers(toks: list[Tok]) -> list[Tok]:
    """``__DURNS__( e )`` → ``named_struct('__dur_ns', CAST((e) AS
    BIGINT))`` — the wire form of a nanosecond-carrying Duration.
    Spark's interval type holds microseconds, so division-derived
    durations travel as a 1-field struct of int64 nanos (Go's own
    representation, time.Duration = int64 ns); the sinks detect the
    field and render through go_duration_ns. Expanded LAST so the
    arithmetic passes can still compose markers structurally."""
    while True:
        idx = next((i for i, t in enumerate(toks)
                    if t.kind == "IDENT" and t.text == "__DURNS__"), None)
        if idx is None:
            return toks
        j = idx + 1
        while toks[j].kind in ("WS", "COMMENT"):
            j += 1
        close = _match_paren(toks, j, 1)
        inner = toks[j + 1:close]
        repl = ([Tok("IDENT", "named_struct"), Tok("PUNCT", "("),
                 Tok("STRING", "'__dur_ns'"), Tok("PUNCT", ","),
                 Tok("WS", " "), Tok("IDENT", "CAST"), Tok("PUNCT", "("),
                 Tok("PUNCT", "(")] + inner
                + [Tok("PUNCT", ")"), Tok("WS", " "), Tok("IDENT", "AS"),
                   Tok("WS", " "), Tok("IDENT", "BIGINT"),
                   Tok("PUNCT", ")"), Tok("PUNCT", ")")])
        toks = toks[:idx] + repl + toks[close + 1:]


def _rewrite_float_literals(toks: list[Tok]) -> list[Tok]:
    """``42.42`` → ``CAST(42.42 AS DOUBLE)``: the dialect's Float is
    float64 (octosql/values.go:17-18), but Spark SQL parses decimal
    literals as DecimalType (7.0/3.0 would yield Decimal('2.333333')
    instead of the reference's 2.3333333333333335)."""
    out: list[Tok] = []
    prev_sig: Tok | None = None
    for t in toks:
        if (t.kind == "NUMBER" and any(c in t.text for c in ".eE")
                and not (prev_sig is not None
                         and prev_sig.is_kw("INTERVAL"))):
            out += [Tok("IDENT", "CAST"), Tok("PUNCT", "("), t,
                    Tok("WS", " "), Tok("IDENT", "AS"), Tok("WS", " "),
                    Tok("IDENT", "DOUBLE"), Tok("PUNCT", ")")]
        else:
            out.append(t)
        if t.kind not in ("WS", "COMMENT"):
            prev_sig = t
    return out


def _strip_trigger(toks: list[Tok]) -> tuple[list[Tok], list[str]]:
    """Remove ``TRIGGER <spec>[, <spec>]*`` clauses; return the specs
    (parser/parser.go:503-534)."""
    triggers: list[str] = []
    sig = _sig(toks)
    for si in range(len(sig) - 1, -1, -1):
        i = sig[si]
        if not toks[i].is_kw("TRIGGER"):
            continue
        # consume until a clause keyword / ')' / end at same depth
        j = i + 1
        depth = 0
        while j < len(toks):
            t = toks[j]
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.kind == "IDENT" and t.text.upper() in (
                    _CLAUSE_KW - {"TRIGGER", "ON", "STREAM"}) and t.text.upper() != "OF":
                break
            j += 1
        triggers.append("".join(t.text for t in toks[i + 1:j]).strip())
        toks = toks[:i] + toks[j:]
    return toks, list(reversed(triggers))


_DISTINCT_AGG_NAMES = {"count_distinct": "count", "sum_distinct": "sum",
                       "avg_distinct": "avg",
                       "array_agg_distinct": "array_agg"}


def _rewrite_distinct_agg_names(toks: list[Tok]) -> list[Tok]:
    """The reference registers the ``*_distinct`` aggregates as
    CALLABLE names (aggregates/table.go: count_distinct, sum_distinct,
    avg_distinct, array_agg_distinct — the same names ``docs.
    aggregates`` lists), alongside the ``AGG(DISTINCT x)`` syntax the
    parser folds into them (parser.go:469-472). Spark SQL only has
    the syntax form, so rewrite ``count_distinct(x)`` →
    ``count(DISTINCT x)`` (found by the r7 distinct-aggregate
    fuzzer). Runs before _alias_select_items, whose naming branch
    re-derives the ``<base>_distinct`` output name from the DISTINCT
    keyword — reference output naming is unchanged."""
    sig = _sig(toks)
    out = list(toks)
    for k in range(len(sig) - 1):
        t = toks[sig[k]]
        base = (_DISTINCT_AGG_NAMES.get(t.text.lower())
                if t.kind == "IDENT" else None)
        if base and toks[sig[k + 1]].text == "(":
            out[sig[k]] = Tok("IDENT", base)
            out[sig[k + 1]] = Tok("PUNCT", "(")
            # inject DISTINCT right after the open paren
            out.insert(sig[k + 1] + 1, Tok("WS", " "))
            out.insert(sig[k + 1] + 1, Tok("IDENT", "DISTINCT"))
            return _rewrite_distinct_agg_names(out)  # indices shifted
    return out


def _strip_join_modifiers(toks: list[Tok]) -> list[Tok]:
    """``LOOKUP JOIN`` / ``STREAM JOIN`` (parser extensions,
    token.go:257,379) → plain JOIN; LOOKUP marks the broadcast side,
    which Catalyst/AQE decides better from sizes (a hint would go here
    if ever needed)."""
    out: list[Tok] = []
    sig_next_join = set()
    sig = _sig(toks)
    for si, i in enumerate(sig):
        if toks[i].is_kw("LOOKUP", "STREAM") and si + 1 < len(sig) \
                and toks[sig[si + 1]].is_kw("JOIN"):
            sig_next_join.add(i)
    skip_ws_after: int | None = None
    for i, t in enumerate(toks):
        if i in sig_next_join:
            skip_ws_after = i
            continue
        if skip_ws_after is not None and t.kind == "WS":
            skip_ws_after = None
            continue
        out.append(t)
    return out


def _rewrite_outer_join(toks: list[Tok]) -> list[Tok]:
    """Bare ``OUTER JOIN`` → ``FULL OUTER JOIN``: the reference's
    parser reads OUTER as full outer (tests/scenarios/nodes/
    outer_join_1.in); Spark SQL requires the FULL keyword."""
    sig = _sig(toks)
    hits = []
    for si, i in enumerate(sig):
        if (toks[i].is_kw("OUTER") and si + 1 < len(sig)
                and toks[sig[si + 1]].is_kw("JOIN")
                and not (si > 0
                         and toks[sig[si - 1]].is_kw("LEFT", "RIGHT", "FULL"))):
            hits.append(i)
    for i in reversed(hits):
        toks = toks[:i] + [Tok("IDENT", "FULL"), Tok("WS", " ")] + toks[i:]
    return toks


# ----------------------------------------- output naming (reference parity)

_AGG_FNS = {"count", "sum", "avg", "min", "max", "array_agg"}
# keywords that make an all-IDENT item an expression, not a column
# reference (`NULL IS NULL` names col_N, not "NULL")
_EXPR_KW = {"NULL", "TRUE", "FALSE", "IS", "NOT", "AND", "OR", "BETWEEN",
            "LIKE", "IN", "CASE", "WHEN", "THEN", "ELSE", "END",
            "INTERVAL", "EXISTS", "DISTINCT", "ALL",
            "CURRENT_TIMESTAMP", "CURRENT_DATE"}


def _top_select_span(toks: list[Tok]):
    """(sig, select_si, from_si_or_None) for the single depth-0
    SELECT; None for set operations / multiple statements."""
    sig = _sig(toks)
    depth = 0
    selects = []
    for si, i in enumerate(sig):
        t = toks[i]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("SELECT"):
            selects.append(si)
        elif depth == 0 and t.is_kw("UNION", "INTERSECT", "EXCEPT"):
            return None
    if len(selects) != 1:
        return None
    si = selects[0]
    depth = 0
    for sj in range(si + 1, len(sig)):
        t = toks[sig[sj]]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("FROM"):
            return sig, si, sj
    return sig, si, None


def _split_top_commas(toks: list[Tok], start: int, end: int) -> list[tuple[int, int]]:
    """Comma-split token span [start, end] at depth 0, trimmed."""
    spans = []
    depth = 0
    s = start
    for j in range(start, end + 1):
        t = toks[j]
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        elif depth == 0 and t.text == ",":
            spans.append((s, j - 1))
            s = j + 1
    spans.append((s, end))
    trimmed = []
    for s, e in spans:
        while s <= e and toks[s].kind in ("WS", "COMMENT"):
            s += 1
        while e >= s and toks[e].kind in ("WS", "COMMENT"):
            e -= 1
        if s <= e:
            trimmed.append((s, e))
    return trimmed


def _tables_with_aliases(toks: list[Tok]) -> list[tuple[str, str | None]]:
    """(table_name, alias) for every FROM/JOIN table reference."""
    sig = _sig(toks)
    out = []
    for si in _table_positions(toks):
        t = toks[sig[si]]
        if t.kind not in ("IDENT", "QIDENT"):
            continue
        name = t.text.strip('"`')
        alias = None
        sj = si + 1
        if sj < len(sig) and toks[sig[sj]].is_kw("AS"):
            sj += 1
        if sj < len(sig) and toks[sig[sj]].kind in ("IDENT", "QIDENT") \
                and not toks[sig[sj]].is_kw(*_CLAUSE_KW) \
                and not toks[sig[sj]].is_kw("AS"):
            alias = toks[sig[sj]].text.strip('"`')
        out.append((name, alias))
    return out


def _name_tok(name: str) -> Tok:
    import re as _re
    if _re.fullmatch(r"\w+", name):
        return Tok("IDENT", name)
    return Tok("QIDENT", f"`{name}`")


def _expand_star(spark: SparkSession, toks: list[Tok]) -> list[Tok]:
    """Top-level ``SELECT *`` over 2+ tables expands to qualified
    columns so colliding names render alias-qualified, like the
    reference's requalified output (tests/scenarios/nodes/
    inner_join_0.out headers ``l.i | r.i``)."""
    span = _top_select_span(toks)
    if span is None:
        return toks
    sig, sel_si, from_si = span
    if from_si is None:
        return toks
    items = _split_top_commas(toks, sig[sel_si] + 1, sig[from_si] - 1)
    if len(items) != 1:
        return toks
    s, e = items[0]
    if not (s == e and toks[s].text == "*"):
        return toks
    tables = _tables_with_aliases(toks)
    if len(tables) < 2:
        return toks
    cols: list[tuple[str, str]] = []  # (qualifier, column)
    for name, alias in tables:
        try:
            table_cols = spark.table(name).columns
        except Exception:
            return toks
        ref = alias or name
        cols.extend((ref, c) for c in table_cols)
    counts: dict[str, int] = {}
    for _, c in cols:
        counts[c] = counts.get(c, 0) + 1
    new: list[Tok] = []
    for idx, (ref, c) in enumerate(cols):
        if idx:
            new += [Tok("PUNCT", ","), Tok("WS", " ")]
        out_name = c if counts[c] == 1 else f"{ref}.{c}"
        new += [_name_tok(ref), Tok("PUNCT", "."), _name_tok(c),
                Tok("WS", " "), Tok("IDENT", "AS"), Tok("WS", " "),
                _name_tok(out_name)]
    return toks[:s] + new + toks[e + 1:]


def _classify_item(toks: list[Tok], s: int, e: int):
    """(kind, detail) for one select item:
    star | aliased(name, alias_tok_idx) | bare(name) |
    agg(aggname, argname_or_None) | expr."""
    isig = [j for j in range(s, e + 1) if toks[j].kind not in ("WS", "COMMENT")]
    while isig and toks[isig[0]].is_kw("DISTINCT", "ALL"):
        isig = isig[1:]
    if not isig:
        return ("expr", None)
    # trailing explicit alias?
    depth = 0
    for k, j in enumerate(isig):
        t = toks[j]
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        elif depth == 0 and t.is_kw("AS") and k + 1 < len(isig):
            return ("aliased", (toks[isig[k + 1]].text.strip('"`'), isig[k + 1]))
    if any(toks[j].text == "*" and toks[j].kind == "OP" for j in isig) \
            and len(isig) <= 3 and toks[isig[-1]].text == "*":
        return ("star", None)  # `*` / `t.*` / (post-arrow) `obj.*`
    if all(toks[j].kind in ("IDENT", "QIDENT") or toks[j].text == "."
           for j in isig) \
            and not any(toks[j].is_kw(*_EXPR_KW) for j in isig):
        return ("bare", toks[isig[-1]].text.strip('"`'))
    fn = toks[isig[0]].text.lower()
    base = fn[:-9] if fn.endswith("_distinct") else fn
    if (toks[isig[0]].kind == "IDENT" and base in _AGG_FNS
            and len(isig) >= 2 and toks[isig[1]].text == "("
            and _match_paren(toks, isig[1], 1) == isig[-1]):
        args = _split_call_args(toks, isig[1], isig[-1])
        aggname = fn
        argname = None
        if len(args) == 1:
            asig = [j for j in range(args[0][0], args[0][1] + 1)
                    if toks[j].kind not in ("WS", "COMMENT")]
            if asig and toks[asig[0]].is_kw("DISTINCT"):
                if not fn.endswith("_distinct"):
                    aggname = fn + "_distinct"
                asig = asig[1:]
            if asig and all(toks[j].kind in ("IDENT", "QIDENT")
                            or toks[j].text == "." for j in asig) \
                    and not any(toks[j].is_kw(*_EXPR_KW) for j in asig):
                argname = toks[asig[-1]].text.strip('"`')
        return ("agg", (aggname, argname))
    return ("expr", None)


def _alias_select_items(toks: list[Tok]) -> list[Tok]:
    """Reference output naming for unaliased select items
    (logical/map.go:100-117, parser/parser.go:140-185): plain
    expressions → ``col_<position>``; aggregates → ``<agg>`` /
    ``<agg>_<field>``; group-by key expressions → ``key_<n>``;
    duplicate names get ``_<count>`` suffixes. Emitted as explicit
    ``AS`` aliases so Spark's output schema matches the reference."""
    span = _top_select_span(toks)
    if span is None:
        return toks
    sig, sel_si, from_si = span
    end_tok = sig[from_si] - 1 if from_si is not None else len(toks) - 1
    items = _split_top_commas(toks, sig[sel_si] + 1, end_tok)
    infos = [_classify_item(toks, s, e) for s, e in items]
    is_group_by = any(kind == "agg" for kind, _ in infos)
    group_keys: list[str] = []
    if is_group_by:
        depth = 0
        gb_si = None
        for sj in range(len(sig)):
            t = toks[sig[sj]]
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif depth == 0 and t.is_kw("GROUP") and sj + 1 < len(sig) \
                    and toks[sig[sj + 1]].is_kw("BY"):
                gb_si = sj
                break
        if gb_si is not None:
            gend = len(toks) - 1
            depth = 0
            for sj in range(gb_si + 2, len(sig)):
                t = toks[sig[sj]]
                if t.text == "(":
                    depth += 1
                elif t.text == ")":
                    if depth == 0:
                        gend = sig[sj] - 1
                        break
                    depth -= 1
                elif depth == 0 and t.is_kw("HAVING", "ORDER", "LIMIT",
                                            "WINDOW", "TRIGGER"):
                    gend = sig[sj] - 1
                    break
            for s, e in _split_top_commas(toks, sig[gb_si + 2], gend):
                group_keys.append("".join(
                    t.text for t in toks[s:e + 1] if t.kind not in ("WS", "COMMENT")))
    counter: dict[str, int] = {}

    def unique(name: str) -> str:
        n = counter.get(name, 0)
        counter[name] = n + 1
        return name if n == 0 else f"{name}_{n}"

    edits: list[tuple[int, Tok | None, list[Tok]]] = []
    for idx, ((s, e), (kind, detail)) in enumerate(zip(items, infos)):
        if kind == "star":
            continue
        if kind == "aliased":
            alias, alias_idx = detail
            final = unique(alias)
            if final != alias:
                edits.append((e, toks[alias_idx], [_name_tok(final)]))
            continue
        if kind == "bare":
            final = unique(detail)
            if final != detail:
                edits.append((e, None, [Tok("WS", " "), Tok("IDENT", "AS"),
                                        Tok("WS", " "), _name_tok(final)]))
            continue
        if kind == "agg":
            aggname, argname = detail
            name = f"{aggname}_{argname}" if argname else aggname
        else:  # expr
            item_text = "".join(t.text for t in toks[s:e + 1]
                                if t.kind not in ("WS", "COMMENT"))
            if is_group_by and item_text in group_keys:
                name = f"key_{group_keys.index(item_text)}"
            else:
                name = f"col_{idx}"
        final = unique(name)
        edits.append((e, None, [Tok("WS", " "), Tok("IDENT", "AS"),
                                Tok("WS", " "), _name_tok(final)]))
    for e, replace, new in reversed(edits):
        if replace is not None:
            pos = next(j for j in range(e, -1, -1) if toks[j] is replace)
            toks = toks[:pos] + new + toks[pos + 1:]
        else:
            toks = toks[:e + 1] + new + toks[e + 1:]
    return toks


def _table_positions(toks: list[Tok]) -> list[int]:
    """Significant indices where a table reference starts (after
    FROM/JOIN, and after commas directly inside a FROM list)."""
    sig = _sig(toks)
    positions = []
    expecting = False
    from_depth = None
    depth = 0
    for si, i in enumerate(sig):
        t = toks[i]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
            if from_depth is not None and depth < from_depth:
                from_depth = None
        if t.is_kw("FROM", "JOIN"):
            expecting = True
            from_depth = depth if t.is_kw("FROM") else from_depth
            continue
        if t.text == "," and from_depth is not None and depth == from_depth:
            expecting = True
            continue
        if expecting and t.kind in ("IDENT", "QIDENT", "STRING"):
            positions.append(si)
            expecting = False
        elif expecting and t.text == "(":
            expecting = False  # subquery
        elif t.is_kw(*_CLAUSE_KW):
            if from_depth is not None and t.is_kw("WHERE", "GROUP", "ORDER",
                                                 "HAVING", "LIMIT"):
                from_depth = None
    return positions


def _read_table_ref(spark: SparkSession, desc: str) -> DataFrame | None:
    if desc == "dual":
        # one-row dummy table (logical/logical.go:101-122)
        return spark.createDataFrame([("X",)], "dummy string")
    if desc.startswith("docs."):
        from octosql_spark.sources.docs import docs_table
        return docs_table(spark, desc.split(".", 1)[1])
    if desc.startswith("plugins."):
        from octosql_spark.sources.plugins import plugins_table
        return plugins_table(spark, desc.split(".", 1)[1])
    if "." in desc and not desc.startswith("stdin."):
        # configured database? `mydb.tablename` resolves through the
        # octosql.yml-style config (the reference's plugin databases,
        # cmd/root.go:132-217 → spark JDBC here)
        from octosql_spark.sources.jdbc import (
            database_by_name, jdbc_table, load_config)
        db = database_by_name(load_config(), desc.split(".", 1)[0])
        if db is not None:
            return jdbc_table(spark, db, desc.split(".", 1)[1])
    from octosql_spark.sources import read_file
    path_opts = desc.split("?", 1)
    path = path_opts[0]
    opts: dict[str, object] = {}
    if len(path_opts) == 2:
        for kv in path_opts[1].split("&"):
            k, _, v = kv.partition("=")
            opts[k] = {"true": True, "false": False}.get(v.lower(), v)
    return read_file(spark, path, **opts)


def _rewrite_file_tables(spark: SparkSession, toks: list[Tok],
                         out: Transpiled) -> list[Tok]:
    """``FROM people.csv`` / ``FROM 'dir/x.json?opt=v'`` /
    ``FROM mydb.tbl`` (configured database) → temp view."""
    from octosql_spark.sources.jdbc import load_config
    db_names = {d.get("name") for d in load_config().get("databases", [])}
    while True:
        sig = _sig(toks)
        positions = _table_positions(toks)
        target = None
        for si in positions:
            i = sig[si]
            t = toks[i]
            if t.kind in ("STRING", "QIDENT"):
                inner = t.text[1:-1]
                ext = inner.split("?")[0].rsplit(".", 1)[-1].lower()
                if ext in _FILE_EXTS or inner.startswith("stdin."):
                    target = (si, si, inner)
                    break
            elif t.kind == "IDENT":
                # ident((.|/|-)ident)* chain — unquoted paths like
                # ``mydir/my-file.csv`` work in the reference's parser
                # (README examples); dotted chains cover stdin./docs./
                # configured databases
                chain = [t.text]
                text = t.text
                sj = si
                while sj + 2 < len(sig) \
                        and toks[sig[sj + 1]].text in (".", "/", "-") \
                        and toks[sig[sj + 2]].kind in ("IDENT", "NUMBER"):
                    text += toks[sig[sj + 1]].text + toks[sig[sj + 2]].text
                    if toks[sig[sj + 1]].text == ".":
                        chain.append(toks[sig[sj + 2]].text)
                    else:
                        chain[-1] += toks[sig[sj + 1]].text + toks[sig[sj + 2]].text
                    sj += 2
                if len(chain) >= 2 and chain[-1].lower() in _FILE_EXTS:
                    target = (si, sj, text)
                    break
                if len(chain) == 2 and chain[-1].lower() == "stdin":
                    # `lines.stdin` == `stdin.lines` (the reference
                    # accepts either order for the stdin pseudo-file)
                    target = (si, sj, f"stdin.{chain[0]}")
                    break
                if chain[0] in ("stdin", "docs", "plugins") and len(chain) >= 2:
                    target = (si, sj, text)
                    break
                if chain == ["dual"]:
                    target = (si, si, "dual")
                    break
                if chain[0] in db_names and len(chain) >= 2:
                    target = (si, sj, text)
                    break
        if target is None:
            return toks
        si, sj, desc = target
        view = f"_octo_file_{next(_view_counter)}"
        df = _read_table_ref(spark, desc)
        df.createOrReplaceTempView(view)
        out.views[view] = desc
        toks = toks[:sig[si]] + [Tok("IDENT", view)] + toks[sig[sj] + 1:]


def _parse_tvf_args(toks: list[Tok]) -> tuple[list[str], dict[str, list[Tok]]]:
    """Split a TVF arg list into positional / ``name => value`` parts."""
    args: list[str] = []
    kwargs: dict[str, list[Tok]] = {}
    depth = 0
    cur: list[Tok] = []
    parts: list[list[Tok]] = []
    for t in toks:
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        if depth == 0 and t.text == ",":
            parts.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        parts.append(cur)
    for part in parts:
        sig = [t for t in part if t.kind not in ("WS", "COMMENT")]
        if len(sig) >= 2 and sig[1].text == "=>":
            val = []
            seen = False
            for t in part:
                if seen:
                    val.append(t)
                elif t.text == "=>":
                    seen = True
            kwargs[sig[0].text.lower()] = val
        else:
            args.append("".join(t.text for t in part).strip())
    return args, kwargs


def _interval_to_spark(text: str) -> str:
    """'INTERVAL 1 MINUTE' / INTERVAL '1' MINUTE → '1 minute' string
    for F.window."""
    s = text.strip()
    if s.upper().startswith("INTERVAL"):
        s = s[len("INTERVAL"):].strip()
    return s.replace("'", "").lower()


def _rewrite_tvfs(spark: SparkSession, toks: list[Tok], out: Transpiled) -> list[Tok]:
    from octosql_spark import tvf as tvfmod
    while True:
        sig = _sig(toks)
        positions = _table_positions(toks)
        target = None
        for si in positions:
            i = sig[si]
            if toks[i].kind == "IDENT" and toks[i].text.lower() in _TVF_NAMES \
                    and si + 1 < len(sig) and toks[sig[si + 1]].text == "(":
                target = (si, i)
                break
        if target is None:
            return toks
        si, i = target
        open_i = sig[si + 1]
        close_i = _match_paren(toks, open_i, 1)
        name = toks[i].text.lower()
        args, kwargs = _parse_tvf_args(toks[open_i + 1:close_i])

        def _df_arg(key: str) -> DataFrame:
            val = kwargs[key]
            vsig = [t for t in val if t.kind not in ("WS", "COMMENT")]
            if vsig and vsig[0].is_kw("TABLE"):
                inner = val[[t.text for t in val].index("(") + 1:
                            len(val) - 1 - [t.text for t in val[::-1]].index(")")]
                inner_sql = "".join(t.text for t in inner).strip()
                if inner_sql.upper().startswith("SELECT"):
                    return run_query(spark, inner_sql).df
                return spark.table(inner_sql)
            raise ValueError(f"{name}: {key} must be TABLE(...)")

        def _str_arg(key: str, default: str | None = None) -> str | None:
            if key not in kwargs:
                return default
            return "".join(t.text for t in kwargs[key]).strip()

        if name == "range":
            # range(start => 1, end => 10) / range(1, 10) → column `i`
            # (table_valued_functions/range.go:14-109)
            def _int_arg(key: str, idx: int) -> int:
                if key in kwargs:
                    return int("".join(t.text for t in kwargs[key]).strip())
                if idx >= len(args):
                    # both args are Required in the reference
                    # (range.go:28-41) — a missing one is a typecheck
                    # error there, so raise the matching ValueError
                    # instead of an IndexError (r11 verdict #8)
                    raise ValueError(
                        f"range: missing required argument '{key}' — "
                        "usage range(start, end)")
                return int(args[idx])
            res = tvfmod.range_tvf(spark, _int_arg("start", 0),
                                   _int_arg("end", 1))
        elif name == "tumble":
            df = _df_arg("source")
            length = _interval_to_spark(_str_arg("window_length"))
            tf = _str_arg("time_field")
            if tf and tf.upper().startswith("DESCRIPTOR"):
                tf = tf[tf.index("(") + 1:tf.rindex(")")].strip()
            offset = _str_arg("offset")
            res = tvfmod.tumble(df, length, tf,
                                _interval_to_spark(offset) if offset else "0 seconds")
            # window_end becomes the event-time column (tumble.go:70-122)
            out.event_time = "window_end"
        elif name == "max_diff_watermark":
            df = _df_arg("source")
            tf = _str_arg("time_field")
            if tf and tf.upper().startswith("DESCRIPTOR"):
                tf = tf[tf.index("(") + 1:tf.rindex(")")].strip()
            resolution = _str_arg("resolution")
            if df.isStreaming:
                # streaming source (?tail=true): this TVF IS
                # Structured Streaming's event-time watermark — the
                # batch emulation's windows would be rejected at
                # stream start (r6 fix: it used to be applied
                # unconditionally and failed there). Late rows drop
                # at the downstream stateful operator, which is where
                # the reference's drop is observable too (a
                # pass-through select has no state to be late FOR).
                #
                # resolution: the reference advances its watermark
                # from FLOOR(ts, resolution) (max_diff_watermark.go:
                # 148-160), i.e. its watermark sits up to one
                # resolution unit LOWER than max(ts) - max_diff.
                # withWatermark can only track the raw column, so fold
                # resolution into the delay (max_diff + resolution):
                # the resulting watermark is ≤ the reference's —
                # conservative, never drops a row the reference keeps
                # (Spark's late-drop is per-micro-batch best-effort in
                # that direction anyway). Default resolution is
                # 1 second, like the reference (:108).
                from octosql_spark.streaming.core import with_watermark
                from octosql_spark.tvf import interval_micros
                delay_us = (interval_micros(
                    _interval_to_spark(_str_arg("max_diff")))
                    + interval_micros(
                        _interval_to_spark(resolution)
                        if resolution else "1 second"))
                res = with_watermark(df, tf, f"{delay_us} microseconds")
            else:
                res = tvfmod.max_diff_watermark(
                    df, _interval_to_spark(_str_arg("max_diff")), tf,
                    resolution=_interval_to_spark(resolution)
                    if resolution else None)
            # the time field becomes the record event time
            # (max_diff_watermark.go:14-180)
            out.event_time = tf
        elif name == "poll":
            df = _df_arg("source")
            # one round materializes here; the CLI re-runs the whole
            # query per round for the reference's continuous
            # retract-then-emit loop (poll.go:104-149)
            out.polls.append(_str_arg("poll_interval") or "1 second")
            res = next(tvfmod.poll(spark, lambda s: df, rounds=1, sleep=False))
        else:  # pragma: no cover
            raise ValueError(name)
        view = f"_octo_tvf_{next(_view_counter)}"
        res.createOrReplaceTempView(view)
        out.views[view] = name
        toks = toks[:i] + [Tok("IDENT", view)] + toks[close_i + 1:]


# -------------------------------------------------------------- driver

def rewrite_scalar_expression(expr_sql: str, df) -> str:
    """Dialect rewrites for a standalone scalar expression evaluated
    against ``df``'s columns. Fast paths that filter with raw SQL text
    (the counting-trigger shape match in cli.py) must NOT hand the
    dialect's WHERE to Spark verbatim — ``v / 2 = 1`` is integer
    division in the dialect (functions.go:320-355) but float division
    in Spark SQL, silently selecting different rows."""
    types: dict[str, str | None] = {}
    for col, dtype in df.dtypes:
        cat = _type_cat(dtype)
        key = col.lower()
        if key in types and types[key] != cat:
            types[key] = None
        else:
            types.setdefault(key, cat)
    known = {k: v for k, v in types.items() if v}
    toks = tokenize(expr_sql)
    toks = _rewrite_arrow(toks)
    toks = _rewrite_type_assert(toks)
    toks = _rewrite_regex_ops(toks)
    toks = _rewrite_subscript(toks)
    toks = _rewrite_arith_overloads(toks, known)
    toks = _rewrite_functions(toks, known)
    toks = _rewrite_float_literals(toks)
    toks = _expand_durns_markers(toks)
    return "".join(t.text for t in toks)


_ORD_CLAUSE_END = ("LIMIT", "OFFSET", "HAVING", "WINDOW", "UNION",
                   "EXCEPT", "INTERSECT", "ORDER", "GROUP", "TRIGGER",
                   "FROM", "WHERE", "SELECT", "JOIN", "ON", "LEFT",
                   "RIGHT", "FULL", "INNER", "CROSS")
_ORD_ITEM_SUFFIX = ("ASC", "DESC", "NULLS", "FIRST", "LAST")


def _rewrite_ordinal_keys(toks: list[Tok]) -> list[Tok]:
    """Bare integer-literal keys in ORDER BY / GROUP BY are CONSTANT
    expressions in the dialect (the reference parses every key
    through ParseExpression, parser.go:862-870), while Spark binds
    them POSITIONALLY (orderByOrdinal/groupByOrdinal — and errors on
    ``ORDER BY 0``). Rewriting ``N`` to ``(N + 0)`` — an unresolved
    Add the analyzer's ordinal substitution never touches — pins the
    reference semantics PER EXPRESSION. The previous approach
    (flipping the two session confs around ``spark.sql``) was correct
    single-threaded but RACED concurrent plain-Spark-SQL callers on
    the same session: the checker's thread pool flaked
    ``recursive_month_spine_gapfill`` (its ``GROUP BY 1`` resolved
    under the dialect's pin ~1 run in 3, MISSING_AGGREGATION)."""
    sig = _sig(toks)
    wrap: list[int] = []  # raw indices of NUMBER tokens to wrap

    def flush(item: list[int]) -> None:
        while item and toks[sig[item[-1]]].is_kw(*_ORD_ITEM_SUFFIX):
            item.pop()
        # Unwrap any depth of balanced parentheses around a lone
        # literal: the dialect treats ``ORDER BY (1)`` exactly like
        # ``ORDER BY 1`` (both parse through ParseExpression), while
        # Spark's ordinal substitution also fires on the
        # parenthesized form.
        while (len(item) >= 3
               and toks[sig[item[0]]].text == "("
               and toks[sig[item[-1]]].text == ")"):
            item = item[1:-1]
        if len(item) == 1:
            t = toks[sig[item[0]]]
            if (t.kind == "NUMBER" and "." not in t.text
                    and "e" not in t.text.lower()):
                wrap.append(sig[item[0]])

    k = 0
    while k + 1 < len(sig):
        if not (toks[sig[k]].is_kw("ORDER", "GROUP")
                and toks[sig[k + 1]].is_kw("BY")):
            k += 1
            continue
        j = k + 2
        depth = 0
        item: list[int] = []
        while j < len(sig):
            t = toks[sig[j]]
            if t.text == "(":
                depth += 1
                item.append(j)
            elif t.text == ")":
                if depth == 0:
                    break  # subquery / OVER(...) clause end
                depth -= 1
                item.append(j)
            elif depth == 0 and t.text == ",":
                flush(item)
                item = []
            elif depth == 0 and t.is_kw(*_ORD_CLAUSE_END):
                break
            else:
                item.append(j)
            j += 1
        flush(item)
        k = j if j > k else k + 1
    if not wrap:
        return toks
    out: list[Tok] = []
    wrapset = set(wrap)
    for i, t in enumerate(toks):
        if i in wrapset:
            out.extend([Tok("PUNCT", "("), Tok("NUMBER", t.text),
                        Tok("OP", "+"), Tok("NUMBER", "0"),
                        Tok("PUNCT", ")")])
        else:
            out.append(t)
    return out


def transpile(spark: SparkSession, sql: str,
              strict_assert: bool = False) -> Transpiled:
    out = Transpiled(sql="")
    toks = tokenize(sql)
    toks, out.triggers = _strip_trigger(toks)
    toks = _strip_join_modifiers(toks)
    toks = _rewrite_outer_join(toks)
    toks = _rewrite_arrow(toks)
    toks = _rewrite_tvfs(spark, toks, out)
    toks = _rewrite_file_tables(spark, toks, out)
    toks = _expand_star(spark, toks)
    toks = _rewrite_distinct_agg_names(toks)
    toks = _alias_select_items(toks)
    types = _collect_column_types(spark, toks)
    variant_cols = (_collect_variant_cols(spark, toks)
                    if strict_assert else set())
    toks = _rewrite_type_assert(toks, strict=strict_assert,
                                variant_cols=variant_cols)
    toks = _rewrite_regex_ops(toks)
    toks = _rewrite_subscript(toks)
    toks = _rewrite_arith_overloads(toks, types)
    toks = _rewrite_functions(toks, types)
    toks = _rewrite_float_literals(toks)
    toks = _expand_durns_markers(toks)
    toks = _rewrite_ordinal_keys(toks)
    depth = 0
    for t in toks:
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("ORDER"):
            out.ordered = True
    out.sql = "".join(t.text for t in toks).strip()
    return out


@dataclass
class QueryResult:
    df: DataFrame
    triggers: list[str]
    spark_sql: str
    polls: list[str] = field(default_factory=list)
    views: dict[str, str] = field(default_factory=dict)
    event_time: str | None = None
    ordered: bool = False


def run_query(spark: SparkSession, sql: str,
              strict_assert: bool = False) -> QueryResult:
    """Full front-end: OctoSQL dialect in, DataFrame out.

    ``strict_assert`` switches ``x::T`` from TRY_CAST conversion to
    the reference's no-conversion runtime type assertion."""
    # The dialect has NO ordinal ORDER BY/GROUP BY (the reference
    # parses every key through ParseExpression, so an integer literal
    # is a CONSTANT key — no-op sort / single group, found by the r7
    # clause-surface fuzzer). That is pinned TOKEN-LEVEL by
    # _rewrite_ordinal_keys inside transpile — NOT by flipping the
    # session's orderByOrdinal/groupByOrdinal confs around this call:
    # session confs are global across threads, so the flip raced
    # concurrent plain-Spark-SQL callers on the same session (the
    # checker's thread pool flaked a positional GROUP BY 1 entry).
    t = transpile(spark, sql, strict_assert=strict_assert)
    df = spark.sql(t.sql)
    return QueryResult(df, t.triggers, t.sql, t.polls,
                       t.views, t.event_time, t.ordered)
