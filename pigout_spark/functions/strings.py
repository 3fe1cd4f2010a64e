"""Pig string builtins (SURVEY.md §2.7 "String") as Column expressions.

Pig's conventions (org/apache/pig/builtin/*.java upstream — reference
checkout is empty, see SURVEY.md §0) differ from Spark's in indexing:
Pig is 0-based with stop-exclusive SUBSTRING (Java String.substring),
Spark SQL is 1-based with length.  These wrappers present Pig semantics
so a reference user gets identical answers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def CONCAT(*cols: Column | str) -> Column:
    """Pig CONCAT: 2+ args, any-null → null.  Spark concat matches exactly."""
    return F.concat(*[_col(c) for c in cols])


def SPRINTF(fmt: str, *cols: Column | str) -> Column:
    return F.format_string(fmt, *[_col(c) for c in cols])


def SUBSTRING(c: Column | str, start: int, stop: int) -> Column:
    """Pig SUBSTRING(s, start, stop): 0-based, stop-exclusive (D4).

    Maps to Spark substring(s, start+1, stop-start).  Pig (Java) raises on
    out-of-range; Spark clamps — we keep Spark's forgiving behavior and
    document the divergence.
    """
    return F.substring(_col(c), start + 1, stop - start)


def INDEXOF(c: Column | str, needle: str, from_index: int = 0) -> Column:
    """Pig INDEXOF: 0-based first occurrence, -1 if absent (D4)."""
    return (F.locate(needle, _col(c), pos=from_index + 1) - F.lit(1)).cast("int")


def LAST_INDEX_OF(c: Column | str, needle: str) -> Column:
    """Pig LAST_INDEX_OF: 0-based last occurrence, -1 if absent.

    No direct Spark builtin — computed from the reversed string, staying
    JVM-side: last = len - (pos of reversed needle in reversed s) - len(needle) + 1 - 1.
    """
    s = _col(c)
    rev_pos = F.locate(needle[::-1], F.reverse(s))  # 1-based in reversed
    return (
        F.when(rev_pos == 0, F.lit(-1))
        .otherwise(F.length(s) - rev_pos - F.lit(len(needle) - 1))
        .cast("int")
    )


def UPPER(c: Column | str) -> Column:
    return F.upper(_col(c))


def LOWER(c: Column | str) -> Column:
    return F.lower(_col(c))


def UCFIRST(c: Column | str) -> Column:
    s = _col(c)
    return F.concat(F.upper(F.substring(s, 1, 1)), F.expr(f"substring({_sql(c)}, 2)"))


def LCFIRST(c: Column | str) -> Column:
    s = _col(c)
    return F.concat(F.lower(F.substring(s, 1, 1)), F.expr(f"substring({_sql(c)}, 2)"))


def _sql(c: Column | str) -> str:
    if isinstance(c, str):
        return c
    raise TypeError("UCFIRST/LCFIRST take a column name string")


def TRIM(c: Column | str) -> Column:
    return F.trim(_col(c))


def LTRIM(c: Column | str) -> Column:
    return F.ltrim(_col(c))


def RTRIM(c: Column | str) -> Column:
    return F.rtrim(_col(c))


def REPLACE(c: Column | str, pattern: str, replacement: str) -> Column:
    """Pig REPLACE is REGEX replace (String.replaceAll) → regexp_replace,
    not literal replace.  The most common silent-wrong-answer trap (D4).
    """
    return F.regexp_replace(_col(c), pattern, replacement)


def REGEX_EXTRACT(c: Column | str, pattern: str, index: int) -> Column:
    return F.regexp_extract(_col(c), pattern, index)


def STARTSWITH(c: Column | str, prefix: str) -> Column:
    return F.startswith(_col(c), F.lit(prefix))


def ENDSWITH(c: Column | str, suffix: str) -> Column:
    return F.endswith(_col(c), F.lit(suffix))


def EQUALS_IGNORE_CASE(a: Column | str, b: Column | str) -> Column:
    return F.lower(_col(a)) == F.lower(_col(b))


def _java_split(c: Column, pattern: str, limit: int) -> Column:
    """Java ``String.split`` semantics (what Pig wraps).  Only
    limit == 0 differs between the engines: Java drops TRAILING empty
    tokens there, Spark keeps them (D4).  Positive limits match
    exactly, and NEGATIVE limits keep trailing empties in BOTH (so the
    drop must not apply — r9 self-review).  Limit-0 emulation: split
    with limit -1 and slice the array up to its LAST non-empty element
    — exactly Java's post-tokenize trailing-empty removal.  (The r9
    construction trimmed trailing separator RUNS off the input string
    first, which diverges for multi-char/overlapping patterns: Java
    tokenizes left-to-right, so ``'x---'.split('--')`` is
    ``['x','-']`` but the right-anchored trim ate the odd dash —
    r9 advice.)  Java corner case kept: ``""`` → [""] (the no-match
    whole-string return); all-separators → [] falls out of the slice
    (every token is a trailing empty → slice length 0)."""
    if limit != 0:
        return F.split(c, pattern, limit)
    arr = F.split(c, pattern, -1)
    last_nonempty = F.array_max(
        F.zip_with(
            arr,
            F.sequence(F.lit(1), F.size(arr)),
            lambda e, i: F.when(e != "", i),
        )
    )
    return F.when(c == "", F.array(F.lit(""))).otherwise(
        F.slice(arr, F.lit(1), F.coalesce(last_nonempty, F.lit(0)))
    )


def STRSPLIT(c: Column | str, pattern: str = r"\s+", limit: int = 0) -> Column:
    """Pig STRSPLIT returns a tuple; the array is the Spark-native shape.

    D4: Pig wraps Java ``String.split(regex)`` whose default limit 0
    DROPS trailing empty tokens; Spark keeps them for every limit<=0, so
    the Java behavior is replicated explicitly.  (DuckDB's string_split
    also keeps trailing empties — oracles over data with trailing
    separators must account for it.)  Pig's 1-arg form splits on
    whitespace — ``pattern`` defaults to ``\\s+`` accordingly."""
    return _java_split(_col(c), pattern, limit)


def STRSPLITTOBAG(
    c: Column | str, pattern: str = r"\s+", limit: int = 0
) -> Column:
    """Pig STRSPLITTOBAG: string → bag of single-field tuples, one per
    split token.  Same Java-split trailing-empty-drop as STRSPLIT (D4);
    the Spark-native shape is an array — FLATTEN/explode it to get the
    bag's one-row-per-token form (which is how Pig scripts consume
    it)."""
    return _java_split(_col(c), pattern, limit)


def REGEX_EXTRACT_ALL(c: Column | str, pattern: str) -> Column:
    """Pig REGEX_EXTRACT_ALL: match the WHOLE string against ``pattern``
    (Java ``Matcher.matches()``, i.e. anchored) and return a tuple of
    every capture group, or NULL if the string doesn't match.

    D4 trap: Spark's ``regexp_extract`` uses unanchored ``find()``, so a
    bare translation silently accepts partial matches Pig rejects.  We
    anchor with a non-capturing wrapper ``^(?:pattern)$`` (the wrapper
    keeps user group numbering intact) and gate the struct on a full
    ``rlike`` match so non-matching rows yield NULL — not a struct of
    empty strings.

    D-register divergence (r9 advice, documented): a capture group that
    did NOT participate in the match reads ``''`` here (Spark
    ``regexp_extract`` semantics) where Pig's ``Matcher.group(i)``
    returns null — e.g. pattern ``(a)|(b)`` on ``'b'`` yields
    ``('', 'b')`` vs Pig's ``(null, 'b')``.  Participation is not
    observable from ``regexp_extract`` alone (an empty match and a
    non-match both read ``''``), so NULL-gating it JVM-side would need
    a per-group pattern rewrite; alternation-with-optional-groups is
    rare in Pig scripts and the divergence only maps null→'' (never
    changes a matched value), so it is registered rather than patched.
    """
    import re as _re

    n_groups = _re.compile(pattern).groups
    if n_groups < 1:
        raise ValueError(
            "REGEX_EXTRACT_ALL: pattern has no capture groups — Pig "
            "returns the groups tuple, so a group-free pattern is a bug"
        )
    anchored = f"^(?:{pattern})$"
    col = _col(c)
    return F.when(
        col.rlike(anchored),
        F.struct(
            *[
                F.regexp_extract(col, anchored, i + 1).alias(f"group_{i + 1}")
                for i in range(n_groups)
            ]
        ),
    )


def UNIQUE_ID() -> Column:
    """Pig UniqueID: a per-record unique string ``"taskindex-counter"``.

    The Spark-native analog is ``monotonically_increasing_id`` — an
    int64 encoding (partitionId << 33) | counter, the same
    (task, per-task counter) construction with the same guarantee
    (unique per record, NOT consecutive, NOT stable across reruns).
    We render it in Pig's "task-counter" string shape.  Divergence
    (SURVEY.md D-register): values differ from Pig's — only uniqueness
    is contractual, which is the only property scripts may rely on
    across reruns in either engine.
    """
    mid = F.monotonically_increasing_id()
    return F.concat_ws(
        "-",
        F.shiftrightunsigned(mid, 33).cast("string"),
        (mid.bitwiseAND(F.lit((1 << 33) - 1))).cast("string"),
    )


#: Pig TOKENIZE's delimiter class: space, double-quote, comma, parens, star
#: (org/apache/pig/builtin/TOKENIZE.java uses StringTokenizer " \",()*").
_TOKENIZE_DELIMS = '[ ",()*]'


def TOKENIZE(c: Column | str) -> Column:
    """Pig TOKENIZE: string → bag of words.  StringTokenizer drops empty
    tokens, so filter out the '' fragments split() produces.
    """
    arr = F.split(_col(c), _TOKENIZE_DELIMS)
    return F.filter(arr, lambda t: t != F.lit(""))
