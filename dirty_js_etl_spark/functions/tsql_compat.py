"""Tiny T-SQL → Spark SQL alias shim for raw-SQL passthrough strings.

The reference passes raw T-SQL strings through unparsed (``Sql``
combinator ``/root/reference/mappr.js:330-351``; ``sourceFilter`` /
``killWhere`` predicates ``/root/reference/tsql2008.js:279,95``). We accept
Spark SQL, but translate the handful of T-SQL spellings the reference's
own mappings and docs use so those configs port verbatim. This is a
lexical alias table, not a SQL parser — anything beyond it should be
written in Spark SQL directly.

Semantics-preserving details:

- ``CHARINDEX(find, search)`` maps to Spark ``position(find, search)``,
  which has the *same* argument order (``instr`` would silently swap
  the needle and the haystack).
- ``LEN(x)`` maps to ``length(rtrim(x))`` because T-SQL ``LEN`` ignores
  trailing spaces (``LEN('a  ') = 1``); a plain ``length`` alias would
  diverge on whitespace-padded strings.
"""

from __future__ import annotations

import re

# function-name aliases: T-SQL name -> Spark SQL name (1:1 renames only;
# LEN needs an argument rewrite and is handled separately below)
_FN_ALIASES = {
    "GETDATE": "current_timestamp",
    "GETUTCDATE": "current_timestamp",
    "NEWID": "uuid",
    "ISNULL": "coalesce",
    # T-SQL CHARINDEX(find, search) == Spark position(find, search)
    "CHARINDEX": "position",
}

_FN_RE = re.compile(
    r"\b(" + "|".join(_FN_ALIASES) + r")\s*\(", flags=re.IGNORECASE
)
_BRACKET_RE = re.compile(r"\[([A-Za-z_][A-Za-z0-9_ ]*)\]")
_LEN_RE = re.compile(r"\bLEN\s*\(", flags=re.IGNORECASE)


def _rewrite_len(sql: str) -> str:
    """``LEN(expr)`` → ``length(rtrim(expr))`` with balanced-paren
    matching (single-quoted strings respected, '' escapes included)."""
    out: list[str] = []
    pos = 0
    while True:
        m = _LEN_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        out.append(sql[pos : m.start()])
        i = m.end()
        depth = 1
        in_str = False
        while i < len(sql) and depth:
            ch = sql[i]
            if in_str:
                if ch == "'":
                    if i + 1 < len(sql) and sql[i + 1] == "'":
                        i += 1  # doubled-quote escape stays inside the string
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced parens — leave the tail untouched
            out.append(sql[m.start() :])
            break
        inner = sql[m.end() : i - 1]
        out.append(f"length(rtrim({inner}))")
        pos = i
    return "".join(out)


def translate(sql: str) -> str:
    """Translate common T-SQL spellings to Spark SQL.

    - ``[bracketed identifiers]`` -> backquoted identifiers
    - ``GETDATE()`` -> ``current_timestamp()``, ``CHARINDEX`` ->
      ``position`` (same arg order), ``LEN(x)`` -> ``length(rtrim(x))``
    """
    out = _BRACKET_RE.sub(lambda m: f"`{m.group(1)}`", sql)
    out = _FN_RE.sub(lambda m: _FN_ALIASES[m.group(1).upper()] + "(", out)
    return _rewrite_len(out)
