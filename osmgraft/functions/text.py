"""Text-analysis kernels for the training-data pipeline (brief: language-ID,
quality scoring, token counting, document fingerprinting).

Everything here is JVM-side Column expressions (split/filter/transform
lambdas) — whole-stage-codegen friendly, no Python workers. Each function has
a DuckDB SQL twin for the oracle gate. Integer-valued outputs only (counts,
hashes, buckets) so cross-engine value hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny fixed stopword lists (deterministic; good enough for a heuristic lang-id)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text → empty array)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def sql_tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t <> '')"


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def sql_token_count(expr: str) -> str:
    return f"len({sql_tokens(expr)})"


def ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams of the whitespace tokens (array<string>;
    texts shorter than n tokens → empty array). All JVM: transform over a
    sequence of start offsets + slice + concat_ws. The explicit short-text
    guard matters because sequence(1, 0) in Spark DESCENDS — without it a
    short doc would emit phantom reversed windows."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def sql_ngrams(expr: str, n: int) -> str:
    """DuckDB twin (1-based inclusive list slicing; range(a,b) is [a,b))."""
    t = sql_tokens(expr)
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n - 2}), "
        f"i -> array_to_string(({t})[i:i+{n - 1}], ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))


def sql_punct_count(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^.!?,;:]', '', 'g'))"


def stopword_count(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(text)), lambda t: t.isin(*words)))


def sql_stopword_count(expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({sql_tokens(f'lower({expr})')}, t -> t IN ({words})))"


def lang_id(text: Column) -> Column:
    """Heuristic language id: argmax stopword hits; CASE evaluated in
    LANG_ORDER so ties go to the earlier language; 'und' when zero hits."""
    scores = {lang: stopword_count(text, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        cond = scores[lang] > 0
        for other in LANG_ORDER:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def sql_lang_id(expr: str) -> str:
    s = {lang: sql_stopword_count(expr, lang) for lang in LANG_ORDER}
    clauses = []
    for lang in LANG_ORDER:
        conds = [f"{s[lang]} > 0"] + [
            f"{s[lang]} >= {s[o]}" for o in LANG_ORDER if o != lang
        ]
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.
    Identical in DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def normalize_text(text: Column) -> Column:
    """lower + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def sql_normalize_text(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of normalized text."""
    return md5_long(normalize_text(text))


def sql_fingerprint(expr: str) -> str:
    return sql_md5_long(sql_normalize_text(expr))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text (n-gram units for
    Jaccard/minhash).

    Built from ``slice`` + ``zip_with`` over shifted token arrays rather than
    ``transform(sequence, i -> element_at(toks, i+k))``: higher-order-function
    lambdas are interpreted per element and re-evaluate any captured subtree,
    so referencing the tokenize pipeline (regex normalize + split) inside the
    lambda re-ran it O(tokens x n) times per row (~150x). Here the lambdas
    only touch their own arguments, so tokenization is evaluated O(n) times
    per row."""
    toks = tokens(normalize_text(text))
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    sh = F.slice(toks, 1, cnt)
    for k in range(1, n):
        sh = F.zip_with(sh, F.slice(toks, k + 1, cnt), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(sh)


def sql_shingles(expr: str, n: int = 3) -> str:
    """Shingles as a single inline expression (token list spelled out; use a
    CTE aliasing the token list to keep the final SQL readable)."""
    w = sql_tokens(sql_normalize_text(expr))
    parts = " || ' ' || ".join(f"({w})[i+{k}]" for k in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len({w}) - {n - 2}, 1)), "
        f"i -> {parts}))"
    )


# --- repetition signals (Gopher-style quality rules: Rae et al. 2021, public) --


def top_token_count(toks: Column) -> Column:
    """Count of the most frequent token (0 for an empty array).

    Nested higher-order functions, O(distinct × n) per row — fine for
    document-sized token arrays, and the lambdas only touch their own
    arguments plus a *column reference* to the token array (callers must
    materialize the array with withColumn first; see shingles() for why
    capturing the tokenize pipeline inside a lambda is a 150× trap)."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda t: t == d)),
            )
        ),
        F.lit(0),
    )


def sql_top_token_count(toks: str) -> str:
    return (
        f"coalesce(list_max(list_transform(list_distinct({toks}), "
        f"d -> len(list_filter({toks}, t -> t = d)))), 0)"
    )


def word_bigrams(toks: Column) -> Column:
    """Adjacent word pairs (non-distinct), shifted-slice zip — no lambda
    captures anything but its own arguments."""
    cnt = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, cnt), F.slice(toks, 2, cnt), lambda a, b: F.concat_ws(" ", a, b)
    )


def sql_word_bigrams(toks: str) -> str:
    # range(1, len) is exclusive → i = 1..len-1, pairing 1-based [i], [i+1]
    return (
        f"list_transform(range(1, greatest(len({toks}), 1)), "
        f"i -> ({toks})[i] || ' ' || ({toks})[i+1])"
    )


# Frequent English character bigrams (standard public frequency data —
# Norvig's Google-corpus tables / classical cryptanalysis lists).  Used as a
# fixed feature set, not a trained model: the score is integer per-mille of
# bigrams that are common-English, a cheap fluency/quality signal
# (gibberish, base64 blobs, and non-Latin text score near 0).
COMMON_BIGRAMS = [
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
]


def bigram_quality(text: Column) -> Column:
    """Integer per-mille of character bigrams (of lowercased text) that are
    common English — pure JVM expression (sequence + transform + filter),
    exact integer output, 0 for texts shorter than 2 chars."""
    t = F.lower(text)
    grams = F.when(
        F.length(t) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
            lambda i: F.substring(t, i, 2),
        )
    )
    lits = F.array(*[F.lit(b) for b in COMMON_BIGRAMS])
    hits = F.size(F.filter(grams, lambda g: F.array_contains(lits, g)))
    tot = F.greatest(F.length(t) - 1, F.lit(1))
    # floor(p/q) == integer div for these magnitudes (p < 2^30: the double
    # quotient cannot sit within an ulp of a wrong integer)
    return F.when(F.length(t) < 2, F.lit(0)).otherwise(
        F.floor(hits * 1000 / tot)
    ).cast("long")


def sql_bigram_quality(expr: str) -> str:
    """DuckDB twin: identical bigram set, identical integer floor-division."""
    inset = ", ".join(f"'{b}'" for b in COMMON_BIGRAMS)
    grams = (
        f"CASE WHEN len(lower({expr})) < 2 THEN [] ELSE "
        f"list_transform(generate_series(1, len(lower({expr})) - 1),"
        f" i -> substr(lower({expr}), i, 2)) END"
    )
    return (
        f"CASE WHEN len(lower({expr})) < 2 THEN 0 ELSE "
        f"(1000 * len(list_filter({grams}, g -> g IN ({inset}))))"
        f" // greatest(len(lower({expr})) - 1, 1) END"
    )


# --- PII scrubbing (curation redaction pass) ------------------------------------
#
# Conservative patterns chosen to mean the same thing in Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround, no unicode classes.

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\d{3}-\d{3}-\d{4}",
}
# replacement order matters: emails can contain digit runs, ipv4 must be
# consumed before the bare phone pattern can nibble at dotted quads
PII_ORDER = ["email", "ipv4", "phone"]


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: match count} per PII pattern (JVM regexp_count)."""
    return {k: F.regexp_count(text, F.lit(PII_PATTERNS[k])) for k in PII_ORDER}


def sql_pii_counts(expr: str) -> dict[str, str]:
    return {
        k: f"len(regexp_extract_all({expr}, '{PII_PATTERNS[k]}'))" for k in PII_ORDER
    }


def pii_scrub(text: Column) -> Column:
    """Redact every PII match with <KIND> placeholders, email→ipv4→phone."""
    out = text
    for k in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def sql_pii_scrub(expr: str) -> str:
    out = expr
    for k in PII_ORDER:
        out = f"regexp_replace({out}, '{PII_PATTERNS[k]}', '<{k.upper()}>', 'g')"
    return out


# --- BPE-style pre-tokenization --------------------------------------------------
#
# The GPT-2 pre-tokenizer split (Radford et al. 2019, public repo), minus its
# trailing-whitespace lookahead `\s+(?!\S)` — RE2 has no lookaround, so the
# portable variant folds all whitespace runs into one branch. Contractions,
# optionally-space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs: the split a byte-level BPE tokenizer applies before its
# merge table, which makes count(pre_tokens) the standard fast proxy for
# "token count" in curation budgets (merges only ever shrink counts within a
# pre-token).

BPE_SPLIT_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(text: Column) -> Column:
    """Array of BPE pre-tokens (leftmost-first alternation, same in RE2)."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)


def sql_bpe_pretokens(expr: str) -> str:
    # RE2: single-quoted pattern; leftmost-first alternation like Java
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"regexp_extract_all({expr}, '{pat}')"


def luhn_valid(digits: Column) -> Column:
    """Luhn mod-10 checksum (ISO/IEC 7812, public — the card-number
    validity test a PII scrubber uses to cut false positives on arbitrary
    digit runs): from the RIGHT, every second digit doubles (minus 9 past
    9); valid iff the total divides by 10.  A pure integer fold over
    sequence(1, length) — whole-stage codegen, no UDF; the pii_luhn_cards
    oracle evaluates the same checksum relationally (unnest + grouped
    CASE sum) including the >= 13-digit gate."""
    n = F.length(digits)

    def term(acc: Column, i: Column) -> Column:
        d = F.ascii(F.substring(digits, i, F.lit(1))) - 48
        j = n - i  # 0-based position from the right
        dbl = 2 * d
        return acc + F.when(j % 2 == 1, F.when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term)
    return (total % 10 == 0) & (n >= 13)


# --- Flesch reading ease (Flesch 1948 / Kincaid et al. 1975) -----------------------
# Pinned counting heuristics (documented, shared verbatim by both engines):
#   words     = maximal [A-Za-z]+ runs
#   sentences = maximal [.!?]+ runs, floored at 1 for non-empty word counts
#   syllables = maximal [aeiouyAEIOUY]+ vowel-letter runs (the standard
#               vowel-group proxy; consonant-only words under-count by 1 —
#               a pinned, engine-shared property of the heuristic)
# The score itself is carried as an exact rational: with W, S, Y the counts,
#   FRE = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
#       = (206835·S·W − 1015·W² − 84600·Y·S) / (1000·S·W)
# so fre_num/fre_den is exact and every class threshold cross-multiplies.

_WORD_RE = "[A-Za-z]+"
_SENT_RE = "[.!?]+"
_SYL_RE = "[aeiouyAEIOUY]+"


def word_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(_WORD_RE)).cast("long")


def sentence_count(text: Column) -> Column:
    return F.greatest(F.regexp_count(text, F.lit(_SENT_RE)).cast("long"), F.lit(1).cast("long"))


def syllable_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(_SYL_RE)).cast("long")


def sql_word_count(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{_WORD_RE}')) AS BIGINT)"


def sql_sentence_count(expr: str) -> str:
    return f"greatest(CAST(len(regexp_extract_all({expr}, '{_SENT_RE}')) AS BIGINT), 1)"


def sql_syllable_count(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{_SYL_RE}')) AS BIGINT)"
