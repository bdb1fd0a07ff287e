"""Column-level text primitives shared by the text-analysis and dedup
operators.

Everything here is built from JVM-side ``pyspark.sql.functions`` only — no
Python UDFs — so the operators stay inside whole-stage codegen and scale
linearly with executors. Each primitive has an exact DuckDB-SQL twin used by
the oracle queries (the md5-based hashing keeps the two engines bit-equal).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from timedb_spark.functions.binding import bind1

#: BPE-ish tokenizer: words | numbers | single punctuation marks.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword regexes for the langid heuristic.
LANG_STOPWORDS = {
    "en": r"\b(the|a|of|and|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|von)\b",
    "es": r"\b(el|la|de|los|y|que)\b",
    "fr": r"\b(le|les|et|des|un|une)\b",
}

_FP_MULT = 1000003
_FP_MOD = 2147483647


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of the trimmed text."""
    return F.split(F.trim(text), r"\s+")


def bpe_tokens_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))


def stopword_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 0))


def shingles(tokens: Column, n: int = 5) -> Column:
    """Word n-gram shingles as space-joined strings (distinct not applied).

    Sequence-index formulation — no explode, the whole array pipeline stays
    one projection: shingle i = tokens[i .. i+n-1].

    ``tokens`` is bound once (:func:`~timedb_spark.functions.binding.bind1`):
    callers pass tokenizer EXPRESSIONS (regex splits), and unbound, Catalyst
    inlines the split into the per-shingle slice — re-tokenizing the whole
    document at every shingle position (the r14 audit's worst per-element
    re-evaluation).
    """
    return bind1(
        tokens,
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    )


def nibble(c: Column) -> Column:
    """Hex char → 0..15 via strpos arithmetic (identical in DuckDB)."""
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def token_hash(t: Column) -> Column:
    """24-bit integer hash of a token: first 6 hex nibbles of md5."""
    h = F.md5(t)
    out = F.lit(0).cast("long")
    for j in range(1, 7):
        out = out * 16 + nibble(F.substring(h, j, 1)).cast("long")
    return out


def fingerprint(tokens: Column) -> Column:
    """Polynomial rolling hash over token hashes — the document fingerprint.

    fold(acc=0; acc*1000003 + token_hash mod 2^31-1). Exact integer
    arithmetic, so Spark's fold and DuckDB's list_reduce agree bit-for-bit.
    """
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * _FP_MULT + token_hash(t)) % _FP_MOD,
    )


#: modulus for the affine MinHash family (2^31 − 1; products with 31-bit
#: coefficients stay under 2^63 in both engines)
MH_P = 2_147_483_647


def mh_params(k: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a_i, b_i) for the k MinHash
    permutations — plain arithmetic, identical in Python and inline SQL."""
    return [(((i * 2654435761 + 1) % MH_P) or 1, (i * 40503 + 7) % MH_P) for i in range(k)]


def base_hash(s: Column) -> Column:
    """One strong 31-bit hash per shingle: first 15 md5 hex digits as int,
    reduced mod MH_P. The single md5 call per shingle — the k permutations
    are cheap affine mixes of this value."""
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MH_P).cast("long")


BASE_HASH_SQL = "((('0x' || substr(md5({s}), 1, 15))::BIGINT) % 2147483647)"


def minhash_signature(base_arr: Column, k: int = 16) -> Column:
    """MinHash signature from a MATERIALIZED base-hash array: element i is
    min over shingles of (a_i·h + b_i) mod MH_P.

    One md5 per shingle total (vs k salted md5s): the classic
    one-hash + affine-permutations family. Callers must project the
    ``base_hash`` array into its own column first — referenced k times, it
    escapes CollapseProject, so the md5 pass runs once."""
    # NB: factory closure, not a default-arg lambda — PySpark dispatches on
    # lambda arity, and an extra defaulted param turns transform's element
    # lambda into the (element, index) form.
    def _mix(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % MH_P

    return F.array(*[F.array_min(F.transform(base_arr, _mix(a, b))) for a, b in mh_params(k)])


def simhash32(digests: Column) -> Column:
    """32-bit SimHash from a MATERIALIZED per-token md5-digest array: bit j
    is the sign of the sum over tokens of (2*lsb(nibble_j(digest)) - 1).
    Exact integer arithmetic, engine-neutral.

    Callers must project ``transform(tokens, md5)`` into its own column
    first — the digest array is referenced by 32 folds, so CollapseProject
    keeps it materialized and each token is hashed ONCE (not 32×)."""
    def _bit_folder(j: int):
        return lambda acc, d: acc + (nibble(F.substring(d, j + 1, 1)) % 2) * 2 - 1

    sig = F.lit(0).cast("long")
    for j in range(32):
        bit_sum = F.aggregate(digests, F.lit(0).cast("long"), _bit_folder(j))
        sig = sig + F.when(bit_sum > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig
