"""Text scalar expressions — whitespace/BPE-ish tokenization, n-gram
shingles, normalization, fingerprinting, quality ratios.

All are pure `pyspark.sql.functions` compositions (codegen'd, vectorized);
each has an exact ANSI-SQL twin used by the DuckDB oracle in
__spark_entry__.oracle_sql, so regex/semantics are deliberately kept to the
dialect-portable subset (\\s, \\w, explicit char classes)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def bind(col: Column, f) -> Column:
    """Evaluate `col` ONCE per row and feed the result to `f`.

    Referencing a composed Column (e.g. ``tokens(text)``) several times
    inside a higher-order-function lambda re-evaluates the whole subtree
    at every reference — for n-gram builders that turns O(tokens) work
    into O(tokens²·n) (measured 8x slowdown at n=8). Wrapping the value
    in a single-element array and binding it to a transform() lambda
    variable forces one evaluation; the variable is then free to reuse.
    """
    return F.element_at(F.transform(F.array(col), f), 1)


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization: word runs or punctuation runs (the
    GPT-2-style `\\w+|[^\\w\\s]+` split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"\w+|[^\w\s]+"), 0)


def word_trigrams(col: Column | str) -> Column:
    """Word 3-gram shingles (space-joined); empty array for <3 tokens."""
    return word_ngrams(col, 3)


def word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-gram shingles (space-joined); empty array for <n tokens.

    Tokenization is bound once per row (see `bind`); each gram is a
    slice + join of the bound array, so total cost is O(tokens·n)."""

    def build(toks: Column) -> Column:
        sz = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), sz - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
        return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))

    return bind(tokens(col), build)


def normalize_text(col: Column | str) -> Column:
    """lowercase, collapse whitespace, trim — the dedup normal form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normal form (portable to any
    engine; the rolling-hash variant lives in operators.dedup.simhash)."""
    return F.md5(normalize_text(col))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def upper_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return n_upper / F.greatest(F.length(c), F.lit(1))
