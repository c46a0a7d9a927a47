"""Text-pipeline scalar functions (SURVEY.md §2.8 F5–F15).

Re-expresses the reference's tweet-text cleaning stack
(/root/reference/thisishappening/utils/tweet_utils.py:322-457) Spark-first:

- Everything that is regex/array work runs as column expressions inside
  the JVM (remove_urls, ellipsis-token drop, filler-char removal, emoji
  padding, clean_token, token partition, ordered dedup).
- The genuinely Python-bound unicode stage — HTML-entity unescape +
  transliteration + NFKC normalization (the reference uses
  ftfy/unidecode, tweet_utils.py:383-426) — is ONE Arrow-batched pandas
  UDF pass per corpus scan. ftfy/unidecode are not in this container, so
  the UDF uses a deterministic stdlib fallback (html.unescape + NFKD
  accent folding + a small public punctuation translit map) and swaps in
  the real libraries when importable; the swap point is marked below.

Emoji are detected by Unicode block ranges (the public emoji blocks),
with ZWJ sequences and skin-tone modifiers treated as one emoji — enough
to reproduce the reference's golden token string (tests/test_event.py).
"""

from __future__ import annotations

import html
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Gruber's liberal URL regex (public: https://gist.github.com/gruber/249502),
# as used by the reference (tweet_utils.py:23-28), case-insensitive via (?i).
# Java regex accepts the same construct set (alternation + nesting, no
# backreferences).
URL_REGEX = (
    r"(?i)\b((?:[a-z][\w-]+:(?:/{1,3}|[a-z0-9%])|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}/)"
    r"(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+(?:\(([^\s()<>]+|"
    r"(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:'\".,<>?«»“”‘’]))"
)

# Emoji character classes by Unicode block (Java regex \x{...} syntax).
_EMOJI_BASE = (
    "\\x{1F1E6}-\\x{1F1FF}"  # regional indicators (flags)
    "\\x{1F300}-\\x{1F5FF}"  # misc symbols & pictographs
    "\\x{1F600}-\\x{1F64F}"  # emoticons
    "\\x{1F680}-\\x{1F6FF}"  # transport & map
    "\\x{1F900}-\\x{1F9FF}"  # supplemental symbols & pictographs
    "\\x{1FA70}-\\x{1FAFF}"  # symbols & pictographs extended-A
    "\\x{2600}-\\x{26FF}"  # misc symbols
    "\\x{2700}-\\x{27BF}"  # dingbats
    "\\x{2B00}-\\x{2BFF}"  # misc symbols & arrows (⭐ etc.)
)
_EMOJI_MOD = "\\x{1F3FB}-\\x{1F3FF}\\x{FE0F}"  # skin tones + VS-16
# One emoji "token": base char + modifiers, optionally chained with ZWJ.
EMOJI_SEQ_REGEX = (
    f"([{_EMOJI_BASE}][{_EMOJI_MOD}]*"
    f"(?:\\x{{200D}}[{_EMOJI_BASE}\\x{{2640}}\\x{{2642}}][{_EMOJI_MOD}]*)*)"
)
# Python-side equivalents (for the pandas-UDF char loop).
_PY_EMOJI_RANGES = [
    (0x1F1E6, 0x1F1FF),
    (0x1F300, 0x1F5FF),
    (0x1F600, 0x1F64F),
    (0x1F680, 0x1F6FF),
    (0x1F900, 0x1F9FF),
    (0x1FA70, 0x1FAFF),
    (0x2600, 0x26FF),
    (0x2700, 0x27BF),
    (0x2B00, 0x2BFF),
    (0x1F3FB, 0x1F3FF),
]

# Characters preserved verbatim through transliteration (reference
# UNICODE_KEEP, tweet_utils.py:39-44): ZWJ, male/female sign, VS-16.
_KEEP_CHARS = {"‍", "♂", "♀", "️"}

# Hangul fillers dropped mid-word (reference UNICODE_IGNORE minus the
# ellipsis, which is handled at token level): U+3164, U+FFA0.
_FILLER_CHARS = "ㅤﾠ"

# Minimal public transliteration map for the no-unidecode fallback: the
# common typographic punctuation that appears in tweet text.
_TRANSLIT = str.maketrans(
    {
        "‘": "'",
        "’": "'",
        "‚": ",",
        "“": '"',
        "”": '"',
        "„": '"',
        "–": "-",
        "—": "--",
        "…": "...",
        "«": '"',
        "»": '"',
        " ": " ",
        "×": "x",
        "•": "*",
    }
)

try:  # pragma: no cover - not installed in this container
    from ftfy import fix_text as _fix_text  # type: ignore
except ImportError:
    _fix_text = None
try:  # pragma: no cover - not installed in this container
    from unidecode import unidecode as _unidecode  # type: ignore
except ImportError:
    _unidecode = None


def _is_emoji_char(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _PY_EMOJI_RANGES)


def _translit_char(ch: str) -> str:
    """unidecode fallback for one non-emoji, non-keep character:
    exact map hit, else NFKD accent folding for Latin, else identity for
    ASCII, else unidecode when available, else the char itself."""
    if ch in _KEEP_CHARS or _is_emoji_char(ch):
        return ch
    if ord(ch) < 128:
        return ch
    if _unidecode is not None:
        return _unidecode(ch)
    mapped = ch.translate(_TRANSLIT)
    if mapped != ch:
        return mapped
    decomp = unicodedata.normalize("NFKD", ch)
    stripped = "".join(c for c in decomp if not unicodedata.combining(c))
    return stripped if stripped.isascii() else ch


@F.pandas_udf("string")
def fix_and_transliterate(texts: pd.Series) -> pd.Series:
    """The ftfy + unidecode + NFKC stage (reference tweet_utils.py:394-426)
    as one Arrow-batched pass. Deterministic stdlib fallback when the real
    libraries are absent: html.unescape stands in for ftfy's entity repair
    (the mojibake-repair part is identity on clean input), and NFKD accent
    folding + a punctuation map stands in for unidecode."""

    def one(text):
        if text is None:
            return None
        fixed = _fix_text(text) if _fix_text is not None else html.unescape(text)
        fixed = "".join(c for c in fixed if c not in _FILLER_CHARS)
        decoded = "".join(_translit_char(c) for c in fixed)
        return unicodedata.normalize("NFKC", decoded)

    return texts.map(one)


def remove_urls(col: Column) -> Column:
    """F5: strip URLs (Gruber regex), reference tweet_utils.py:378-380."""
    return F.regexp_replace(col, URL_REGEX, "")


def drop_ellipsis_tokens(col: Column) -> Column:
    """Drop whitespace tokens containing U+2026 (truncation artifacts),
    reference tweet_utils.py:385-391. Whitespace collapses to single
    spaces exactly like the reference's split+join."""
    cleaned = F.regexp_replace(col, "\\S*\\x{2026}\\S*", "")
    return F.trim(F.regexp_replace(cleaned, "\\s+", " "))


def pad_emoji(col: Column) -> Column:
    """Space-pad every emoji sequence (ZWJ sequences stay intact), the
    column twin of the reference's split_text padding
    (tweet_utils.py:322-330)."""
    return F.regexp_replace(col, EMOJI_SEQ_REGEX, " $1")


def clean_token_col(t: Column) -> Column:
    """F7 clean_token (reference tweet_utils.py:345-375) as a column
    expression over one token:

    1. tokens matching the URL regex pass through verbatim;
    2. the punctuation set !"$%&()*+,-/;<=>?[\\]^`{|}~ becomes spaces,
       then trim;
    3. @user/#tag tokens lose a possessive trailing 's;
    4. trailing non-alphanumerics are stripped — but only when the token
       contains at least one alphanumeric (the reference keeps pure-
       symbol tokens like emoji intact);
    5. a token that is nothing but ASCII punctuation becomes ''.
    """
    punct_cleaned = F.trim(
        F.regexp_replace(t, "[!\"$%&()*+,\\-/;<=>?\\[\\\\\\]^`{|}~]", " ")
    )
    possessive = F.when(
        punct_cleaned.rlike("^[@#]"),
        F.regexp_replace(punct_cleaned, "(.+)'s$", "$1"),
    ).otherwise(punct_cleaned)
    # [\p{L}\p{N}] ≈ Python str.isalnum (unicode letters + digits).
    end_stripped = F.when(
        possessive.rlike("[\\p{L}\\p{N}]"),
        F.regexp_replace(possessive, "[^\\p{L}\\p{N}]+$", ""),
    ).otherwise(possessive)
    all_punct = "^[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]+$"
    return (
        F.when(t.rlike(URL_REGEX), t)
        .when(end_stripped.rlike(all_punct), F.lit(""))
        .otherwise(end_stripped)
    )


def clean_text_column(col: Column) -> Column:
    """F6 clean_text (reference tweet_utils.py:383-434): the full cleaning
    chain producing a space-joined cleaned string. Expression stages
    sandwich the single pandas-UDF unicode pass."""
    staged = pad_emoji(fix_and_transliterate(drop_ellipsis_tokens(col)))
    toks = F.split(staged, "\\s+")
    cleaned = F.transform(toks, clean_token_col)
    joined = F.array_join(F.filter(cleaned, lambda x: x != ""), " ")
    return F.trim(F.regexp_replace(joined, "\\s+", " "))


def is_username(t: Column) -> Column:
    """F9, reference tweet_utils.py:333-334."""
    return t.startswith("@")


def is_hashtag(t: Column) -> Column:
    """F9, reference tweet_utils.py:337-338."""
    return t.startswith("#")


def has_emoji(t: Column) -> Column:
    return t.rlike(f"[{_EMOJI_BASE}]")


def ordered_dedup(arr: Column) -> Column:
    """F15: per-row dedup preserving first occurrence
    (list(dict.fromkeys(...)), reference tweet_utils.py:528-529).
    Spark's array_distinct keeps first-occurrence order."""
    return F.array_distinct(arr)
