"""Tiny T-SQL → Spark SQL alias shim for raw-SQL passthrough strings.

The reference passes raw T-SQL strings through unparsed (``Sql``
combinator ``/root/reference/mappr.js:330-351``; ``sourceFilter`` /
``killWhere`` predicates ``/root/reference/tsql2008.js:279,95``). We accept
Spark SQL, but translate the handful of T-SQL spellings the reference's
own mappings and docs use so those configs port verbatim. This is a
lexical alias table, not a SQL parser — anything beyond it should be
written in Spark SQL directly.
"""

from __future__ import annotations

import re

# function-name aliases: T-SQL name -> Spark SQL name
_FN_ALIASES = {
    "GETDATE": "current_timestamp",
    "GETUTCDATE": "current_timestamp",
    "NEWID": "uuid",
    "LEN": "length",
    "ISNULL": "coalesce",
    "CHARINDEX": "instr",
}

_FN_RE = re.compile(
    r"\b(" + "|".join(_FN_ALIASES) + r")\s*\(", flags=re.IGNORECASE
)
_BRACKET_RE = re.compile(r"\[([A-Za-z_][A-Za-z0-9_ ]*)\]")


def translate(sql: str) -> str:
    """Translate common T-SQL spellings to Spark SQL.

    - ``[bracketed identifiers]`` -> backquoted identifiers
    - ``GETDATE()`` -> ``current_timestamp()``, ``LEN`` -> ``length``, etc.
    """
    out = _BRACKET_RE.sub(lambda m: f"`{m.group(1)}`", sql)
    out = _FN_RE.sub(lambda m: _FN_ALIASES[m.group(1).upper()] + "(", out)
    return out
