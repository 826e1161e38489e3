"""Token admission + code-aware tokenizer.

Reference: code/functions/language-processing/java/nu/marginalia/keyword/
DocumentPositionMapper.java:201-260 (``matchesWordPattern``) — a word is
admissible iff it is <= 48 chars and consists of an alnum run of 1..15
chars followed by up to 8 groups of (1..2 separator chars from
``.-_/:+*@#`` then an alnum run of 1..10 chars), consuming the entire
string.

Two implementations:

- ``matches_word_pattern`` — a literal port of the codepoint loop
  (unit-test oracle).
- ``ADMIT_RE`` — an equivalent anchored regex.  Equivalence holds because
  alnum runs are homogeneous: no backtracking parse can split a run
  across two bounded groups without an intervening separator, so the
  greedy regex accepts exactly the strings the loop accepts (tested by
  randomized cross-check in tests/test_wordpattern.py).

Tokenizer semantics for the source-code corpus (this engine's own
definition — the reference's SentenceExtractor is HTML/NLP-specific):

1. lowercase the content;
2. candidate words = maximal runs of ``[0-9a-z.\\-_/:+*@#]`` (everything
   else — whitespace, brackets, quotes, non-ASCII — separates words);
3. strip leading/trailing separator chars (sentence-final periods etc.);
4. admit via the word pattern + length caps.

Restricting the alphabet to ASCII alnum keeps the tokenizer exactly
reproducible in DuckDB SQL (see ``SQL_*`` fragments) for the driver's
correctness oracle; non-ASCII keyword hashing parity is pinned
separately by the murmur test vectors.
"""

from __future__ import annotations

import re

SEPARATORS = ".-_/:+*@#"
MAX_WORD_LEN = 48

# anchored admission pattern (ASCII-alnum variant; RE2-compatible).
# Quirk preserved from the Java loop: a trailing run of 1-2 separators IS
# accepted (the ``i == s.length()`` acceptance check sits at the top of
# the *next* group iteration, DocumentPositionMapper.java:223-224), but
# only when at most 7 joined groups precede it — after the 8th group the
# final check requires the string to end exactly.
_A = r"[0-9a-z]{1,15}"
_S = r"[.\-_/:+*@#]{1,2}"
_B = r"[0-9a-z]{1,10}"
ADMIT_PATTERN = rf"{_A}(?:(?:{_S}{_B}){{0,8}}|(?:{_S}{_B}){{0,7}}{_S})"
ADMIT_RE = re.compile(ADMIT_PATTERN)

# candidate extraction: maximal runs of token-alphabet characters
CANDIDATE_PATTERN = r"[0-9a-z.\-_/:+*@#]+"
CANDIDATE_RE = re.compile(CANDIDATE_PATTERN)

STRIP_RE = re.compile(r"^[.\-_/:+*@#]+|[.\-_/:+*@#]+$")

# DuckDB-SQL equivalents (regexp_extract_all / regexp_replace /
# regexp_full_match use RE2 — same language as the Python patterns above).
SQL_CANDIDATE_PATTERN = r"[0-9a-z.\-_/:+*@#]+"
SQL_STRIP_PATTERN = r"^[.\-_/:+*@#]+|[.\-_/:+*@#]+$"
SQL_ADMIT_PATTERN = (
    r"[0-9a-z]{1,15}(?:(?:[.\-_/:+*@#]{1,2}[0-9a-z]{1,10}){0,8}"
    r"|(?:[.\-_/:+*@#]{1,2}[0-9a-z]{1,10}){0,7}[.\-_/:+*@#]{1,2})"
)


def sql_tokenize_expr(text_col: str) -> str:
    """DuckDB expression producing the exact token list ``tokenize``
    produces for ``text_col`` (list<varchar>, in order)."""
    return (
        "list_filter("
        f"list_transform(regexp_extract_all(lower({text_col}), '{SQL_CANDIDATE_PATTERN}'),"
        f" w -> regexp_replace(w, '{SQL_STRIP_PATTERN}', '', 'g')),"
        f" w -> length(w) BETWEEN 1 AND {MAX_WORD_LEN}"
        f" AND regexp_full_match(w, '{SQL_ADMIT_PATTERN}'))"
    )


def matches_word_pattern(s: str) -> bool:
    """Literal port of DocumentPositionMapper.matchesWordPattern:201-260.

    Uses Java semantics: alphabetic-or-digit per Unicode, codepoint
    stepping.  (The vectorized tokenizer uses the ASCII regex; this port
    is the fidelity oracle.)
    """
    if len(s) > 48:
        return False

    i = 0
    n = len(s)

    run = 0
    while run < 15 and i < n:
        if s[i].isalpha() or s[i].isdigit():
            i += 1
            run += 1
            continue
        break

    if i == 0:
        return False

    for _ in range(8):
        if i == n:
            return True

        seps = 0
        while seps < 3 and i < n:
            c = s[i]
            if c.isalpha() or c.isdigit():
                break
            elif c not in SEPARATORS:
                return False
            else:
                i += 1
                seps += 1
        if seps > 2 or seps == 0:
            return False

        run = 0
        while run < 10 and i < n:
            if s[i].isalpha() or s[i].isdigit():
                i += 1
                run += 1
                continue
            break

    return i == n


def admit_word(w: str) -> bool:
    """Regex-equivalent admission for the ASCII-lowercase token alphabet."""
    return 1 <= len(w) <= MAX_WORD_LEN and ADMIT_RE.fullmatch(w) is not None


CASED_CANDIDATE_RE = re.compile(r"[0-9A-Za-z.\-_/:+*@#]+")

# SQL fragment mirroring name_like_tokens (case-preserving candidates,
# uppercase initial, admissible after lowering)
SQL_CASED_CANDIDATE_PATTERN = r"[0-9A-Za-z.\-_/:+*@#]+"


def sql_name_like_expr(text_col: str) -> str:
    """DuckDB list of the document's name-like tokens, lowered."""
    return (
        "list_distinct(list_transform(list_filter("
        f"list_transform(regexp_extract_all({text_col}, '{SQL_CASED_CANDIDATE_PATTERN}'),"
        f" w -> regexp_replace(w, '{SQL_STRIP_PATTERN}', '', 'g')),"
        f" w -> regexp_matches(w, '^[A-Z]')"
        f" AND length(w) BETWEEN 1 AND {MAX_WORD_LEN}"
        f" AND regexp_full_match(lower(w), '{SQL_ADMIT_PATTERN}')),"
        " w -> lower(w)))"
    )


_HAS_UPPER_RE = re.compile(r"[A-Z]")


def name_like_tokens(text: str) -> set[str]:
    """NameLikeKeywords analog for the code corpus: admissible tokens
    whose raw occurrence starts with an uppercase letter (the reference
    flags capitalized non-sentence-initial words via POS heuristics,
    NameLikeKeywords.java; case is the code-corpus signal).  Returned
    lowered, as a membership set.

    One C-level uppercase scan short-circuits the (second) tokenize pass
    on all-lowercase documents — the overwhelmingly common case."""
    if _HAS_UPPER_RE.search(text) is None:
        return set()
    out: set[str] = set()
    for cand in CASED_CANDIDATE_RE.findall(text):
        w = STRIP_RE.sub("", cand)
        if w and "A" <= w[0] <= "Z":
            lw = w.lower()
            if admit_word(lw):
                out.add(lw)
    return out


def tokenize(text: str) -> list[str]:
    """Tokenize one document (already matches sql_tokenize_expr)."""
    out = []
    for cand in CANDIDATE_RE.findall(text.lower()):
        w = STRIP_RE.sub("", cand)
        if w and len(w) <= MAX_WORD_LEN and ADMIT_RE.fullmatch(w):
            out.append(w)
    return out


# ArtifactKeywords (ArtifactKeywords.java:12-48): mail-like tokens yield
# synthetic discovery keywords — the full address, the domain (with and
# without '@'), and the user part, minus the reference's ignore lists.
_MAIL_LIKE_RE = re.compile(r"[a-zA-Z0-9._\-]+@[a-zA-Z0-9]+(?:\.[a-zA-Z0-9]+)+")
# a mail-like fullmatch contains exactly one '@' (neither side's character
# class admits it), so split_part on '@' is exact in the SQL twin below
SQL_MAIL_LIKE_PATTERN = r"[a-z0-9._\-]+@[a-z0-9]+(\.[a-z0-9]+)+"
_ARTIFACT_IGNORED_DOMAINS = {"@hotmail.com", "@gmail.com", "@paypal.com"}
_ARTIFACT_IGNORED_USERS = {
    "info", "legal", "contact", "press", "donotreply", "noreply",
    "no-reply", "admin", "root",
}


def artifact_keywords(tokens: list[str]) -> list[str]:
    """Synthetic artifact keywords from a document's token stream
    (ArtifactKeywords.java:20-44 semantics over wordsLowerCase).  Sorted
    for determinism."""
    out: set[str] = set()
    for lc in tokens:
        at = lc.find("@")
        if len(lc) < 6 or at < 0 or _MAIL_LIKE_RE.fullmatch(lc) is None:
            continue
        out.add(lc)
        domain = lc[at:]
        user = lc[:at]
        if domain not in _ARTIFACT_IGNORED_DOMAINS:
            out.add(domain[1:])
            out.add(domain)
        if user not in _ARTIFACT_IGNORED_USERS:
            out.add(user)
    return sorted(out)


def sql_artifact_expr(toks_col: str) -> str:
    """DuckDB list of the artifact keywords ``artifact_keywords`` yields
    for the token list ``toks_col`` (order-free: consumers use it for
    membership/counts only)."""
    ign_dom = "['hotmail.com', 'gmail.com', 'paypal.com']"
    ign_usr = (
        "['info', 'legal', 'contact', 'press', 'donotreply', 'noreply',"
        " 'no-reply', 'admin', 'root']"
    )
    return (
        "list_distinct(flatten(list_transform("
        f"list_filter({toks_col}, x -> length(x) >= 6"
        f" AND regexp_full_match(x, '{SQL_MAIL_LIKE_PATTERN}')),"
        " x -> [x]"
        f" || (CASE WHEN list_contains({ign_dom}, split_part(x, '@', 2))"
        " THEN []::VARCHAR[]"
        " ELSE [split_part(x, '@', 2), '@' || split_part(x, '@', 2)] END)"
        f" || (CASE WHEN list_contains({ign_usr}, split_part(x, '@', 1))"
        " THEN []::VARCHAR[] ELSE [split_part(x, '@', 1)] END))))"
    )
