"""Minimal SQL tokenizer for the OctoSQL dialect front-end.

Only as much lexing as the dialect rewrites need — the real parser is
Spark SQL's (Catalyst) after transpilation. The reference's parser is
a 20k-line vitess yacc fork (parser/sqlparser/); we deliberately do
not rebuild that: Spark SQL covers the grammar, this layer covers the
dialect differences (SURVEY.md §7 item 3).
"""

from __future__ import annotations

from dataclasses import dataclass

# multi-char operators first (longest match wins)
_OPERATORS = ["!~*", "!~", "~*", "::", "->", "<=", ">=", "!=", "<>", "||",
              "=>", "~", "<", ">", "=", "+", "-", "*", "/", "%"]
_PUNCT = "(),.;[]"


@dataclass
class Tok:
    kind: str  # WS COMMENT STRING QIDENT NUMBER OP PUNCT IDENT
    text: str

    def is_kw(self, *kws: str) -> bool:
        return self.kind == "IDENT" and self.text.upper() in kws


def tokenize(sql: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            j = i
            while j < n and sql[j].isspace():
                j += 1
            toks.append(Tok("WS", sql[i:j])); i = j
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j == -1 else j
            toks.append(Tok("COMMENT", sql[i:j])); i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            j = n if j == -1 else j + 2
            toks.append(Tok("COMMENT", sql[i:j])); i = j
        elif c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    j += 1; break
                else:
                    j += 1
            toks.append(Tok("STRING", sql[i:j])); i = j
        elif c in '"`':
            close = c
            j = i + 1
            while j < n and sql[j] != close:
                j += 1
            j = min(j + 1, n)
            toks.append(Tok("QIDENT", sql[i:j])); i = j
        elif c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            while j < n and (sql[j].isdigit() or sql[j] in ".eE"
                             or (sql[j] in "+-" and sql[j - 1] in "eE")):
                j += 1
            toks.append(Tok("NUMBER", sql[i:j])); i = j
        else:
            for op in _OPERATORS:
                if sql.startswith(op, i):
                    toks.append(Tok("OP", op)); i += len(op)
                    break
            else:
                if c in _PUNCT:
                    toks.append(Tok("PUNCT", c)); i += 1
                elif c.isalpha() or c == "_":
                    j = i
                    while j < n and (sql[j].isalnum() or sql[j] == "_"):
                        j += 1
                    toks.append(Tok("IDENT", sql[i:j])); i = j
                else:
                    toks.append(Tok("PUNCT", c)); i += 1
    return toks


def render(toks: list[Tok]) -> str:
    return "".join(t.text for t in toks)


def significant(toks: list[Tok]) -> list[int]:
    """Indices of non-WS/COMMENT tokens."""
    return [i for i, t in enumerate(toks) if t.kind not in ("WS", "COMMENT")]
