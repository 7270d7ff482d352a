"""TQL lexer.

Token set mirrors the reference's extended Hyrise grammar surface we
support (reference `cpp/3rd_party/sql-parser/src/parser/bison_parser.y`
productions at :789-841 SELECT core, :875 EXPAND, :880-886 GROUP,
:899-917 UNGROUP/SAMPLE, :939-950 TOP/LIMIT PERCENT, :965-973 pair
args). TQL specifics vs ANSI SQL: `==` equality alias, glob LIKE
patterns, python-style `[]` indexing/slicing, `?` parameters.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "SELECT", "DISTINCT", "TOP", "FROM", "WHERE", "GROUP", "UNGROUP", "EXPAND",
    "BY", "ACROSS", "TIME", "SPACE", "SPLIT", "ORDER", "ASC", "DESC", "LIMIT",
    "OFFSET", "PERCENT", "SAMPLE", "REPLACE", "UNION", "INTERSECT", "EXCEPT",
    "ALL", "AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "LIKE", "ILIKE",
    "AS", "TRUE", "FALSE", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER",
    "CROSS", "ON", "USING", "HAVING",
}

_PUNCT = [
    "==", "!=", "<>", "<=", ">=", "<", ">", "=", "(", ")", "[", "]", ",",
    "+", "-", "*", "/", "%", ":", ".", "?",
]


@dataclass
class Token:
    kind: str  # KEYWORD, IDENT, NUMBER, STRING, PUNCT, EOF
    value: str
    pos: int


class TQLSyntaxError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            j = i + 1
            buf = []
            while j < n:
                if text[j] == quote:
                    if j + 1 < n and text[j + 1] == quote:  # doubled quote escape
                        buf.append(quote)
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            else:
                raise TQLSyntaxError(f"unterminated string at {i}")
            out.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if ch.isdigit() or (ch == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            while j < n and (text[j].isdigit() or (text[j] == "." and not seen_dot)):
                if text[j] == ".":
                    # don't swallow `1.` followed by non-digit (attr access)
                    if j + 1 >= n or not text[j + 1].isdigit():
                        break
                    seen_dot = True
                j += 1
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    while k < n and text[k].isdigit():
                        k += 1
                    j = k
            out.append(Token("NUMBER", text[i:j], i))
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            if word.upper() in KEYWORDS:
                out.append(Token("KEYWORD", word.upper(), i))
            else:
                out.append(Token("IDENT", word, i))
            i = j
            continue
        for p in _PUNCT:
            if text.startswith(p, i):
                out.append(Token("PUNCT", p, i))
                i += len(p)
                break
        else:
            raise TQLSyntaxError(f"unexpected character {ch!r} at {i}")
    out.append(Token("EOF", "", n))
    return out
