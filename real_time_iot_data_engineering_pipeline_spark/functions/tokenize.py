"""Engine-portable whitespace class, shared by every tokenization site.

Java's `\\s` is exactly [ \\t\\n\\x0B\\f\\r]; RE2's (DuckDB's) `\\s` is the
same set WITHOUT vertical tab, so any query spelling `\\s+` tokenizes a
document containing \\x0B differently in the two engines (first observed
in ranking.py, round 3; generalized to the whole text tier in round 9
after a hostile-docs probe reproduced the divergence in six queries).

The class below holds the LITERAL control characters, not backslash
escapes: interpolated into a DuckDB literal, a Spark SQL (F.expr)
literal, or a Python-API regex, the bytes that reach each regex engine
are identical — no dialect's escape processing can reinterpret them.
Semantically WS == Java \\s exactly, so migrating Spark-side sites is a
no-op; migrating DuckDB-side sites aligns the oracle to the engine.
"""

# the six characters of Java's \s, as literal characters
WS_CHARS = " \t\n\r\f\x0b"
# whitespace run (tokenizer split pattern)
WS = f"[{WS_CHARS}]+"
# one non-whitespace run (e.g. URL tails)
NOT_WS = f"[^{WS_CHARS}]+"
