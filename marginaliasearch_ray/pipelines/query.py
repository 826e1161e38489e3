"""Query serving: compiler + shared-nothing partition searcher actors +
driver-side merge.

Reference shape (SURVEY.md §3.2): QueryFactory/QueryParser compile the
human query; IndexClient fans the identical request out to every index
partition; per partition the query runs lookup -> intersect/exclude ->
gather -> rank; the driver concatenates, sorts by score, dedups by
content hash and decorates.  Here each partition is a Ray actor holding
its segment's term table, postings and forward index in memory (ST6
analog); the Dataset API cannot express a shared queryable index, so
this is one of the few places raw actors are warranted.

Scoring is BM25 (Bm25GraphVisitor formulas, k1=1.2 b=0.5, global idf —
divergence: the reference uses per-partition df/N; global idf is
order-independent of the partitioning and is what the SQL oracle
computes).  Results are rank-deterministic: sort key is
(round(score, 6) DESC, doc ordinal ASC).

Query syntax (QueryParser.java:13-100 subset): bare terms (AND),
``-term`` exclusion, ``"quoted phrase"`` mandatory adjacency constraint,
``repo:name`` domain filter.
"""

from __future__ import annotations

import itertools
import os
import re
import threading
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import bm25, idcodec
from ..functions.codecs import decode_counts, decode_doc_ids, decode_varints
from ..functions.wordpattern import tokenize
from ..functions.murmur import hash_nearly_ascii
from ..stages.reverse import flat_positions_by_counts


@dataclass
class CompiledQuery:
    include: list[str] = field(default_factory=list)  # AND terms (token strings)
    exclude: list[str] = field(default_factory=list)
    priority: list[str] = field(default_factory=list)  # ?term — boost, not filter
    groups: list[list[str]] = field(default_factory=list)  # (a | b) OR-groups
    phrases: list[list[str]] = field(default_factory=list)
    # nested compiled query tree (CqExpression And/Or model) — set only
    # when the query's paren/| structure doesn't flatten to include+groups
    tree: tuple | None = None
    repo: str | None = None
    lang: str | None = None  # lang:xx — per-language journal partition filter
    priority_orgs: list[str] = field(default_factory=list)  # ?org:<prefix>
    # advice terms (QueryParser.java:240-252 prefixes -> QueryFactory
    # require(), :147): REQUIRED in the document, excluded from scoring
    advice: list[str] = field(default_factory=list)
    size_gt: int | None = None  # size>N spec limit (QueryParser year>/size< analog)
    size_lt: int | None = None
    # ParamMatchingQueryFilter meta limits (CombinedIndexReader.java:349-450):
    # (field, op, value) with field in year/rank/quality, op in <, >, =
    meta_limits: list[tuple[str, str, int]] = field(default_factory=list)
    # qs=<strategy> token (QueryToken.QsTerm, QueryParser.java:238-239)
    query_strategy: str | None = None
    # set:<name> token (QueryToken.SetTerm -> userSearchSet,
    # QueryFactory.java:154); resolved against the search_sets mapping
    # at search time (SearchSetsService.getSearchSetByName:95-105 —
    # NONE/blank means any, an unknown name is an error)
    search_set: str | None = None

    @property
    def include_ids(self) -> list[int]:
        return [hash_nearly_ascii(t) for t in self.include]

    @property
    def exclude_ids(self) -> list[int]:
        return [hash_nearly_ascii(t) for t in self.exclude]

    @property
    def advice_ids(self) -> list[int]:
        return [hash_nearly_ascii(t) for t in self.advice]

    @property
    def priority_ids(self) -> list[int]:
        return [hash_nearly_ascii(t) for t in self.priority]

    def phrase_ids(self) -> list[list[int]]:
        return [[hash_nearly_ascii(t) for t in p] for p in self.phrases]

    def group_ids(self) -> list[list[int]]:
        return [[hash_nearly_ascii(t) for t in g] for g in self.groups]

    def tree_ids(self) -> tuple | None:
        return None if self.tree is None else tree_map_words(self.tree, hash_nearly_ascii)


_QUOTE_RE = re.compile(r'"([^"]*)"')
_SPEC_RE = re.compile(r"size([<>])(\d+)")
# year>2000 / rank<40 / q<5 spec limits (QueryParser.java year>/q>/rank
# tokens -> SpecificationLimit -> ParamMatchingQueryFilter)
_META_SPEC_RE = re.compile(r"(year|rank|q)([<>=])(\d+)")


# --- nested compiled query trees -------------------------------------------
# Node model mirrors CqExpression (reference code/functions/search-query/api/
# java/nu/marginalia/api/searchquery/model/compiled/CqExpression.java):
# ("word", term) | ("and", [children]) | ("or", [children]).  An empty
# query is ("or", []).


class _AndOrState:
    """CompiledQueryParser.AndOrState technique (CompiledQueryParser.java:
    70-103): n-ary And/Or built directly, no flattening pass."""

    def __init__(self):
        self.and_state: list = []
        self.or_state: list = []

    def and_(self, e):
        self.and_state.append(e)

    def or_(self):
        self._close_and()
        self.and_state = []

    def _close_and(self):
        if len(self.and_state) == 1:
            self.or_state.append(self.and_state[0])
        elif self.and_state:
            self.or_state.append(("and", list(self.and_state)))

    def close_or(self):
        self._close_and()
        if not self.or_state:
            return ("or", [])
        if len(self.or_state) == 1:
            return self.or_state[0]
        return ("or", list(self.or_state))


def parse_cq_tree_tokens(tokens: list[str]) -> tuple:
    """N-ary And/Or parse of a token stream (CompiledQueryParser.java:10-67).
    Word tokens run through the engine tokenizer and may contribute several
    and-terms; empty inner groups are dropped (lenient divergence — the
    reference throws on them only for mismatched parens)."""
    stack = [_AndOrState()]
    for tk in tokens:
        if tk == "|":
            stack[-1].or_()
        elif tk == "(":
            stack.append(_AndOrState())
        elif tk == ")":
            if len(stack) < 2:
                raise ValueError("mismatched parentheses in query")
            inner = stack.pop().close_or()
            if inner != ("or", []):
                stack[-1].and_(inner)
        else:
            for w in tokenize(tk):
                stack[-1].and_(("word", w))
    if len(stack) != 1:
        raise ValueError("mismatched parentheses in query")
    return stack[0].close_or()


def parse_cq_tree(q: str) -> tuple:
    q = q.replace("(", " ( ").replace(")", " ) ").replace("|", " | ")
    return parse_cq_tree_tokens(q.split())


def tree_map_words(node: tuple, fn) -> tuple:
    if node[0] == "word":
        return ("word", fn(node[1]))
    return (node[0], [tree_map_words(p, fn) for p in node[1]])


def tree_words(node: tuple) -> list:
    """All word payloads in document order (CqExpression.stream analog)."""
    if node[0] == "word":
        return [node[1]]
    return [w for p in node[1] for w in tree_words(p)]


def _flatten_tree(root: tuple) -> tuple[list[str], list[list[str]]] | None:
    """(include, groups) when the tree is the classic flat shape — an And
    of words and single-level Or-of-word groups — else None (the nested
    evaluator takes over)."""

    def or_members(node):
        if node[0] != "or":
            return None
        ms = []
        for p in node[1]:
            if p[0] != "word":
                return None
            ms.append(p[1])
        return ms

    include: list[str] = []
    groups: list[list[str]] = []
    if root[0] == "or":
        ms = or_members(root)
        if ms is None:
            return None
        return [], [list(dict.fromkeys(ms))] if ms else []
    children = root[1] if root[0] == "and" else [root]
    for ch in children:
        if ch[0] == "word":
            if ch[1] not in include:
                include.append(ch[1])
        else:
            ms = or_members(ch)
            if ms is None:
                return None
            if ms:
                groups.append(list(dict.fromkeys(ms)))
    return include, groups

# priority-term boost: a ?term present in the document contributes this
# fraction of its BM25 term score (simplified, SQL-expressible stand-in
# for the reference's prio-presence ranking adjustment,
# IndexResultRankingService:145-153)
PRIORITY_WEIGHT = 0.25

# multiplicative composition (plan["multiplicative_priority"]): per-term /
# per-domain promote amounts summed into priorityTermAdjustment, then
# score *= exp(adj/5) — the defaults mirror the reference's usual 1.0f
# promote weights (IndexQueryServiceIntegrationTest.java:149,
# SearchContext.java:146-153, IndexResultRankingService.java:145-156)
PRIORITY_TERM_ADJ = 1.0
PRIORITY_DOMAIN_ADJ = 1.0

# VerbatimMatches per-tag weight table mapped onto the code corpus's span
# model (head = first 16 tokens ~ TITLE, everything else ~ BODY) —
# IndexResultRankingService.java:406-454: weights_full/weights_partial/
# attenuation switch tables
VERBATIM_W_FULL_HEAD = 3.0  # TITLE -> 3.0f
VERBATIM_W_FULL_BODY = 1.0  # BODY -> 1.0f
VERBATIM_W_PART_HEAD = 2.25  # TITLE -> 2.25f
VERBATIM_W_PART_BODY = 0.5  # BODY -> 0.5f
VERBATIM_ATT_HEAD = 1.0  # default attenuation
VERBATIM_ATT_BODY = 0.5  # BODY/HEADING -> 0.5f
# anchor-region tags (weights_full/weights_partial tables,
# IndexResultRankingService.java:419-453; attenuation default 1.0)
VERBATIM_W_FULL_LINK = 2.0  # EXTERNAL_LINKTEXT -> 2.0f
VERBATIM_W_PART_LINK = 1.5  # EXTERNAL_LINKTEXT -> 1.5f
VERBATIM_W_FULL_URL = 0.75  # DOC_URL -> 0.75f
VERBATIM_W_PART_URL = 0.5  # DOC_URL -> 0.5f
VERBATIM_SINGLE_TITLE_BONUS = 4.0  # single-word title == query -> +4

# ?tld: analog for the code corpus: '?org:<prefix>' boosts documents whose
# repo (domain) name starts with the prefix — the reference's
# priorityDomainIds adjustment (QueryFactory '?tld:se' patterns ->
# SearchContext.priorityDomainIds, IndexResultRankingService.java:150-153)
PRIORITY_DOMAIN_WEIGHT = 0.5

# ranking-factor breakdown columns for search(explain=True) — the
# DebugRankingFactors surface (DebugRankingFactors.java:10-40;
# IndexResultRankingService.java:173-177 score.* document factors and
# :334-338 documentParam.* factors).  Score factors are the per-component
# deltas of the additive score; param factors are the decoded packed
# document metadata fields.
FX_SCORE_COLS = (
    "fx_bm25",
    "fx_first_position",
    "fx_verbatim",
    "fx_proximity",
    "fx_flags",
    "fx_priority",
    "fx_doc_bonus",
)
FX_PARAM_COLS = (
    "fx_rank",
    "fx_asl",
    "fx_quality",
    "fx_size",
    "fx_topology",
    "fx_year",
)


def _membership(cand: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Boolean mask: which sorted-unique cand ids appear in sorted docs
    (searchsorted semi-join — SkipListReader retain/reject analog)."""
    if len(docs) == 0:
        return np.zeros(len(cand), dtype=bool)
    ix = np.searchsorted(docs, cand)
    ix_c = np.minimum(ix, len(docs) - 1)
    return (docs[ix_c] == cand) & (ix < len(docs))


def _retain(cand: np.ndarray, docs: np.ndarray) -> np.ndarray:
    return cand[_membership(cand, docs)]


def _reject(cand: np.ndarray, docs: np.ndarray) -> np.ndarray:
    return cand[~_membership(cand, docs)]


# ragged-key packing for the batched sequence ops: one int64 key per
# (candidate, position) pair, candidate index in the high bits.  Safe while
# positions < 2**32 and candidate chunks < 2**31 (chunks are 2**15).
_POS_SHIFT = np.int64(1) << np.int64(32)
_VERIFY_CHUNK = 1 << 15


def _gather_ragged(
    flat: np.ndarray, offsets: np.ndarray, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate ``flat[offsets[r]:offsets[r+1]]`` for each r in rows —
    one vectorized fancy-index, no per-row Python loop.  Returns
    (values, per-row lengths)."""
    starts = offsets[rows]
    lens = offsets[rows + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype), lens
    idx = np.repeat(starts - (np.cumsum(lens) - lens), lens) + np.arange(total)
    return flat[idx], lens


def _intersect_sequences_batched(
    term_pos: list[tuple[np.ndarray, np.ndarray]],
    rows_per_term: list[np.ndarray],
    sel: np.ndarray,
) -> np.ndarray:
    """Batched ``SequenceOperations.intersectSequences`` (reference
    code/libraries/coded-sequence/java/nu/marginalia/sequence/
    SequenceOperations.java:11-52): for every candidate at once, find the
    start offsets s such that term j occurs at position s + j for ALL j.

    ``term_pos[j]`` is term j's (flat positions, ragged offsets);
    ``rows_per_term[j]`` the candidates' posting rows in term j;
    ``sel`` the candidate indices the keys should carry.

    Returns sorted int64 keys ``cand_idx * _POS_SHIFT + s`` of every
    surviving (candidate, start) pair — one sorted-merge membership test
    per term instead of a Python loop over candidates."""
    running: np.ndarray | None = None
    for j, (flat, offs) in enumerate(term_pos):
        vals, lens = _gather_ragged(flat, offs, rows_per_term[j])
        cidx = np.repeat(sel, lens)
        keys = cidx * _POS_SHIFT + (vals - j)
        running = keys if running is None else running[_membership(running, keys)]
        if len(running) == 0:
            break
    return running if running is not None else np.empty(0, dtype=np.int64)


def _min_distance_k(
    term_pos: list[tuple[np.ndarray, np.ndarray]],
    rows_per_term: list[np.ndarray],
    sel: np.ndarray,
    n: int,
) -> np.ndarray:
    """Batched ``SequenceOperations.minDistance`` (SequenceOperations.java:
    195-253): per candidate, the smallest spread of one position from each
    term, each offset by -term_index (PhraseConstraintGroup.minDistance's
    iterOffsets).  Classic smallest-covering-range, vectorized: sort all
    (candidate, offset position) keys, forward-fill each term's last-seen
    key, window = key - min over terms; per-candidate min via minimum.at.

    Divergence: the reference skips terms with > 16 positions in a doc as
    a CPU heuristic; we keep them (the batched form makes them cheap), so
    our distance is never larger than the reference's."""
    k = len(term_pos)
    keys_all, term_tag = [], []
    for j, (flat, offs) in enumerate(term_pos):
        vals, lens = _gather_ragged(flat, offs, rows_per_term[j])
        cidx = np.repeat(sel, lens)
        # +k bias keeps offset positions strictly positive (a term at
        # position <= its index would otherwise bleed into the previous
        # candidate's key band); the spread is shift-invariant
        keys_all.append(cidx * _POS_SHIFT + (vals - j + k))
        term_tag.append(np.full(len(vals), j, dtype=np.int64))
    keys = np.concatenate(keys_all)
    tags = np.concatenate(term_tag)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    tags = tags[order]
    big = np.int64(1) << 40
    lasts = np.empty((k, len(keys)), dtype=np.int64)
    for j in range(k):
        lasts[j] = np.maximum.accumulate(np.where(tags == j, keys, np.int64(-1)))
    lo = lasts.min(axis=0)
    cand_of = keys // _POS_SHIFT
    valid = lo >= cand_of * _POS_SHIFT  # every term seen within this candidate
    width = keys - lo
    out = np.full(n, big, dtype=np.int64)
    np.minimum.at(out, cand_of[valid], width[valid])
    return out


def _present_rows(
    term_docs: list[np.ndarray], sub: np.ndarray
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Membership mask (candidate present in EVERY term's postings) plus
    the per-term posting rows, all via searchsorted."""
    ok = np.ones(len(sub), dtype=bool)
    rows: list[np.ndarray] = []
    for docs in term_docs:
        if len(docs) == 0:
            ok[:] = False
            rows.append(np.zeros(len(sub), dtype=np.int64))
            continue
        di = np.searchsorted(docs, sub)
        dic = np.minimum(di, len(docs) - 1)
        ok &= (di < len(docs)) & (docs[dic] == sub)
        rows.append(dic)
    return ok, rows


# QueryParser.java:240-252 advisory-term prefixes (the token is a
# synthetic keyword the document must carry; site: is handled by repo:)
ADVICE_PREFIXES = (
    "site:", "format:", "file:", "tld:", "ip:", "as:", "asn:", "generator:"
)

# QueryStrategy REQUIRE_FIELD_* -> the WordFlags bit every scored query
# keyword must carry in a result document (meetsQueryStrategyRequirements,
# IndexResultRankingService.java:226-260; booleanAggregate over the
# compiled query: AND terms all required, OR groups any member).
# EXTERNAL_LINK's bit (1 << 8) overflows the byte-wide flags field in
# Java exactly as it does here, so REQUIRE_FIELD_LINK can never match;
# SITE is never assigned by this corpus's flag extractors — same effect.
QUERY_STRATEGY_FLAG = {
    "REQUIRE_FIELD_SITE": 1 << 4,
    "REQUIRE_FIELD_TITLE": 1 << 0,
    "REQUIRE_FIELD_SUBJECT": 1 << 1,
    "REQUIRE_FIELD_URL": 1 << 6,
    "REQUIRE_FIELD_DOMAIN": 1 << 7,
    "REQUIRE_FIELD_LINK": 1 << 8,
}
# SENTENCE/TOPIC are scoring-era legacy values: no filtering (the
# reference returns true for them, :230-234)
QUERY_STRATEGIES = ("AUTO", "SENTENCE", "TOPIC", *QUERY_STRATEGY_FLAG)

_SEP_SPLIT_RE = re.compile(r"[.\-_]+")


def expand_term(t: str) -> list[str] | None:
    """Separator-variant expansion for code identifiers
    (QueryExpansion joinDashes/joinTerms analog, QueryExpansion.java:57-109):
    ``parse-tree`` also matches ``parse_tree``, ``parse.tree`` and
    ``parsetree``.  Returns the sorted variant list, or None when the term
    has no separators."""
    parts = _SEP_SPLIT_RE.split(t)
    if len(parts) < 2 or not all(parts):
        return None
    variants = {t}
    for sep in ("_", "-", ".", ""):
        variants.add(sep.join(parts))
    return sorted(variants)


# categoryKeywords substitution table (QueryExpansion.java:130-146): the
# replacement is a synthetic keyword in its reference colon form — the
# build injects generator:<class> keywords per document (tokenize.py), so
# the substituted term resolves against real lexicon entries
CATEGORY_KEYWORDS = {
    "recipe": "category:food",
    "recipes": "category:food",
    "forum": "generator:forum",
    "wiki": "generator:wiki",
    "docs": "generator:docs",
}

_WORDNUM_RE = re.compile(r"^([a-z]+)([0-9]+)$|^([0-9]+)([a-z]+)$")


def plural_variants(w: str) -> list[str]:
    """nounPluralFormsEN analog (QueryExpansion.java:168-180): rewrite the
    word in the other pluralization.  The reference consults a noun-form
    dictionary; the code corpus has none, so the s-suffix rule stands in."""
    if len(w) > 3 and w.endswith("s"):
        return [w[:-1]]
    if w and not w.endswith("s"):
        return [w + "s"]
    return []


def compile_query(
    q: str,
    expand: bool = False,
    expand_plural: bool = False,
    expand_category: bool = False,
    expand_wordnum: bool = False,
    expand_ngram_all: bool = False,
) -> CompiledQuery:
    """Parse the human query into a compiled query (QueryParser subset).

    Quoted phrases contribute their terms to the include set AND add a
    mandatory adjacency constraint (QueryFactory.java:100-113 analog).
    With ``expand=True``, separator-bearing include terms become OR-groups
    of their separator variants.  The remaining QueryExpansion strategies
    are separate flags: ``expand_plural`` (nounPluralFormsEN on the last
    word), ``expand_category`` (categoryKeywords on the last word),
    ``expand_wordnum`` (splitWordNum: letter/digit boundary -> dashed
    variant), ``expand_ngram_all`` (ngramAll: OR the whole query against
    its underscore-joined identifier, as a nested tree).
    """
    out = CompiledQuery()
    rest = q

    def grab_phrase(m):
        toks = tokenize(m.group(1))
        if toks:
            out.phrases.append(toks)
            out.include.extend(t for t in toks if t not in out.include)
        return " "

    rest = _QUOTE_RE.sub(grab_phrase, rest)

    # pull spec/exclude/priority tokens out of the stream; what remains
    # (words, parens, |) feeds the n-ary And/Or parser
    rest = rest.replace("(", " ( ").replace(")", " ) ").replace("|", " | ")
    struct_tokens: list[str] = []
    for word in rest.split():
        if word in ("(", ")", "|"):
            struct_tokens.append(word)
        elif word.startswith("repo:") and len(word) > 5:
            out.repo = word[5:]
        elif word.startswith("lang:") and len(word) > 5:
            out.lang = word[5:]
        elif (
            word.startswith(("links:", "special:", "category:", "js:"))
            and len(word.split(":", 1)[1]) > 0
        ):
            # ordinary colon keywords: links:<dst> (backlink/link search,
            # SearchOperator.java:103-128), special:*/category:*/js:*
            # (HtmlFeature.getKeyword synthetic terms).  None of these are
            # advice prefixes in the reference (QueryParser.java:240-252),
            # so the token is an ORDINARY scored include term whose
            # literal string hashes against the injected synthetic keyword
            w = word.lower()
            if w not in out.include:
                out.include.append(w)
        elif word.startswith(ADVICE_PREFIXES) and ":" in word:
            # advisory term: the whole prefixed token is the keyword
            # (admitted by the code tokenizer — ':' is a separator char)
            out.advice.append(word.lower())
        elif m := _SPEC_RE.fullmatch(word):
            # size>N / size<N spec limits (QueryParser.java:20-27 year>/
            # size< analog -> ParamMatchingQueryFilter semantics)
            if m.group(1) == ">":
                out.size_gt = int(m.group(2))
            else:
                out.size_lt = int(m.group(2))
        elif m := _META_SPEC_RE.fullmatch(word):
            fieldname = {"q": "quality"}.get(m.group(1), m.group(1))
            out.meta_limits.append((fieldname, m.group(2), int(m.group(3))))
        elif word.startswith("qs=") and len(word) > 3:
            # query-strategy token (QueryToken.QsTerm,
            # QueryParser.java:238-239); validated at search time
            out.query_strategy = word[3:].upper()
        elif word.startswith("set:") and len(word) > 4:
            out.search_set = word[4:].upper()
        elif word.startswith("?org:") and len(word) > 5:
            out.priority_orgs.append(word[5:])
        elif word.startswith("?") and len(word) > 1:
            for t in tokenize(word[1:]):
                if t not in out.priority:
                    out.priority.append(t)
        elif word.startswith("-") and len(word) > 1:
            body = word[1:]
            if (
                body.startswith(("links:", "special:", "category:", "js:"))
                and len(body.split(":", 1)[1]) > 0
            ):
                # negated literal colon keyword: exclude the SYNTHETIC
                # keyword itself ('-special:ads' rejects ad-flagged
                # docs), not its colon-split word pieces
                w = body.lower()
                if w not in out.exclude:
                    out.exclude.append(w)
            else:
                for t in tokenize(body):
                    if t not in out.exclude:
                        out.exclude.append(t)
        else:
            struct_tokens.append(word)

    tree = parse_cq_tree_tokens(struct_tokens)
    flat = _flatten_tree(tree)
    if flat is not None:
        inc, grps = flat
        for t in inc:
            if t not in out.include:
                out.include.append(t)
        out.groups.extend(grps)
    else:
        # nested shape: And/Or evaluator owns candidates + BM25; phrase
        # tokens (already in out.include) stay as mandatory AND terms
        out.tree = tree

    if expand:
        # separator identifiers expand to an OR of (a) the segmented word
        # sequence as a conjunction — the reference's sentence extractor
        # splits hyphenated words into separate query words, so
        # ``fast-table`` admits documents containing both ``fast`` and
        # ``table`` (QueryExpansion.java:57-109 joinDashes over the
        # segmented graph) — and (b) every joined separator variant.
        # Expressed as a nested And/Or tree so the intMaxSum aggregate
        # scores it exactly like the reference's compiled query.
        kept: list[str] = []
        nodes: list[tuple] = []
        for t in out.include:
            variants = expand_term(t)
            if variants:
                parts = _SEP_SPLIT_RE.split(t)
                nodes.append(
                    (
                        "or",
                        [("and", [("word", p) for p in parts])]
                        + [("word", v) for v in variants],
                    )
                )
            else:
                kept.append(t)
        out.include = kept
        if nodes:
            if out.tree is not None:
                nodes = [out.tree] + nodes
            out.tree = nodes[0] if len(nodes) == 1 else ("and", nodes)

    # ngramAll (QueryExpansion.java:95-110): OR the whole query against
    # one underscore-joined identifier — expressed as a nested tree
    if (
        expand_ngram_all
        and len(out.include) >= 2
        and out.tree is None
        and not out.groups
    ):
        joined = "_".join(out.include)
        out.tree = (
            "or",
            [("and", [("word", w) for w in out.include]), ("word", joined)],
        )
        out.include = []
    # strategies rewriting the LAST query word into an OR-group of variants
    if out.include:
        last = out.include[-1]
        variants: list[str] = []
        if expand_plural:
            variants += plural_variants(last)
        if expand_category and last in CATEGORY_KEYWORDS:
            variants.append(CATEGORY_KEYWORDS[last])
        if variants:
            out.include = out.include[:-1]
            out.groups.append([last] + variants)
    if expand_wordnum:
        # splitWordNum (QueryExpansion.java:112-121): 'mp3' also matches
        # the dashed identifier 'mp-3'
        kept = []
        for t in out.include:
            m = _WORDNUM_RE.fullmatch(t)
            if m:
                a, b = (m.group(1), m.group(2)) if m.group(1) else (
                    m.group(3), m.group(4)
                )
                out.groups.append([t, f"{a}-{b}"])
            else:
                kept.append(t)
        out.include = kept
    return out


def _blob(arr: pa.Array, i: int) -> memoryview:
    """Zero-copy view of one binary cell — the Arrow buffer backs the view,
    no Python bytes object is materialized (VERDICT r1 item 10: keeps
    actor RSS at the Arrow footprint instead of ~2x in PyObjects)."""
    return memoryview(arr[int(i)].as_buffer())


class _Segment:
    """In-memory view of one partition's index files.

    Blob columns stay as Arrow arrays (zero-copy buffer slices at access
    time); positions decode to ONE flat int64 array + ragged offsets per
    term so downstream verification is batched, never per-candidate.

    ``suppress`` lists later delta segments that tombstone documents of
    THIS segment: tuples of (delta_dir, prior_idx) resolving to
    ``<delta_dir>/tombstones/prior=<idx>/part=<p>`` id tables and the
    matching df-correction tables (pipelines.delta).  Tombstoned ids are
    filtered out of every postings/positions/prio decode and the stored
    df/prio_df values are pre-corrected, so a suppressed segment scores
    exactly like one rebuilt without those documents.  Block-max pruning
    is disabled while suppressions are active (every decode goes through
    the filtered full path); compaction restores it."""

    def __init__(
        self,
        out_dir: str,
        part: int,
        suppress: tuple[tuple[str, int], ...] = (),
    ):
        import pyarrow.dataset as pads

        self.part = part
        self.out_dir = out_dir
        self._lang_ids: dict[str, np.ndarray] = {}
        self.tomb: np.ndarray | None = None
        # raw-length keep masks per term id (postings() populates; the
        # positions decode reuses them so ragged positions stay aligned
        # with the filtered posting list)
        self._tomb_mask: dict[int, np.ndarray] = {}
        corr_t: list[np.ndarray] = []
        corr_df: list[np.ndarray] = []
        corr_pr: list[np.ndarray] = []
        tomb_parts: list[np.ndarray] = []
        for delta_dir, j in suppress:
            td = os.path.join(
                delta_dir, "tombstones", f"prior={j}", f"part={part}"
            )
            if os.path.isdir(td):
                tomb_parts.append(
                    pq.read_table(td, columns=["combined_id"])[
                        "combined_id"
                    ].to_numpy(zero_copy_only=False)
                )
            cd = os.path.join(
                delta_dir, "df_correction", f"prior={j}", f"part={part}"
            )
            if os.path.isdir(cd):
                c = pq.read_table(cd, columns=["term_id", "cnt", "prio_cnt"])
                corr_t.append(c["term_id"].to_numpy(zero_copy_only=False))
                corr_df.append(c["cnt"].to_numpy(zero_copy_only=False))
                corr_pr.append(c["prio_cnt"].to_numpy(zero_copy_only=False))
        if tomb_parts:
            self.tomb = np.unique(np.concatenate(tomb_parts))
        if corr_t:
            allt = np.concatenate(corr_t)
            uniq, inv = np.unique(allt, return_inverse=True)
            self._corr = (
                uniq,
                np.bincount(inv, weights=np.concatenate(corr_df)).astype(
                    np.int64
                ),
                np.bincount(inv, weights=np.concatenate(corr_pr)).astype(
                    np.int64
                ),
            )
        else:
            self._corr = None
        post_dir = os.path.join(out_dir, "postings", f"part={part}")
        # positions wire codec: "varint" (hot default) or "gamma" (the
        # reference's legacy GammaCodedSequence format; segments migrated
        # by pipelines.transcode serve as-is)
        from .transcode import positions_codec

        self.pos_codec = positions_codec(out_dir)
        cols = ["term_id", "df", "docs", "tfs", "metas", "positions", "pos_cnts"]
        schema_names = set(pads.dataset(post_dir).schema.names)
        # block-max pruning is unavailable while suppressions are active:
        # blk_maxtf upper bounds would count tombstoned postings and the
        # block decode bypasses the tomb filter; compaction restores it
        self.has_blocks = "blk_last" in schema_names and self.tomb is None
        if self.has_blocks:
            cols += ["blk_last", "blk_maxtf", "blk_boff", "blk_tf_boff"]
        post = pq.read_table(post_dir, columns=cols)
        order = np.argsort(post["term_id"].to_numpy(zero_copy_only=False))
        post = post.take(pa.array(order))
        self.term_ids = post["term_id"].to_numpy(zero_copy_only=False)
        self.df = post["df"].to_numpy(zero_copy_only=False)
        if self._corr is not None:
            # pre-correct stored dfs for tombstoned documents so BM25 over
            # a suppressed segment equals a rebuild without those docs
            ct, cdf, _cpr = self._corr
            ix = np.searchsorted(self.term_ids, ct)
            ok = (ix < len(self.term_ids))
            ok[ok] = self.term_ids[ix[ok]] == ct[ok]
            self.df = self.df.copy()
            self.df[ix[ok]] -= cdf[ok]
        self.docs_blobs = post["docs"].combine_chunks()
        self.tfs_blobs = post["tfs"].combine_chunks()
        self.pos_blobs = post["positions"].combine_chunks()
        self.pos_cnts = post["pos_cnts"].combine_chunks()
        self.metas_blobs = post["metas"].combine_chunks()
        if self.has_blocks:
            # block-max side index (add_block_stats): flat values + ragged
            # offsets, numpy-sliced per term at query time
            def _flat(name):
                col = post[name].combine_chunks()
                return (
                    np.asarray(col.offsets).astype(np.int64),
                    np.asarray(col.values),
                )

            self.blk_offs, self.blk_last_vals = _flat("blk_last")
            _, self.blk_maxtf_vals = _flat("blk_maxtf")
            _, self.blk_boff_vals = _flat("blk_boff")
            _, self.blk_tf_boff_vals = _flat("blk_tf_boff")
        # pruned-decode metrics (blocks skipped vs decoded) — lineage /
        # test observability
        self.blocks_decoded = 0
        self.blocks_skipped = 0

        fwd = pq.read_table(
            os.path.join(out_dir, "forward", f"part={part}"),
            columns=["combined_id", "document_meta", "features", "size"],
        )
        cid = fwd["combined_id"].to_numpy(zero_copy_only=False)
        o = np.argsort(cid)
        self.fwd_ids = cid[o]
        self.fwd_size = fwd["size"].to_numpy(zero_copy_only=False)[o]
        self.fwd_meta = fwd["document_meta"].to_numpy(zero_copy_only=False)[o]
        # HtmlFeature bitmask per doc (zeros unless the segment was built
        # with html_features — the flagsPenalty short-circuit then holds)
        self.fwd_features = fwd["features"].to_numpy(zero_copy_only=False)[
            o
        ].astype(np.int64)

        # prio posting lists (flagged terms, gamma/delta coded) for the
        # bFlags score component
        prio_dir = os.path.join(out_dir, "postings_prio", f"part={part}")
        if os.path.isdir(prio_dir):
            pr = pq.read_table(prio_dir, columns=["term_id", "df", "docs"])
            po = np.argsort(pr["term_id"].to_numpy(zero_copy_only=False))
            pr = pr.take(pa.array(po))
            self.prio_term_ids = pr["term_id"].to_numpy(zero_copy_only=False)
            self.prio_df = pr["df"].to_numpy(zero_copy_only=False)
            if self._corr is not None:
                ct, _cdf, cpr = self._corr
                ix = np.searchsorted(self.prio_term_ids, ct)
                ok = (ix < len(self.prio_term_ids))
                ok[ok] = self.prio_term_ids[ix[ok]] == ct[ok]
                self.prio_df = self.prio_df.copy()
                self.prio_df[ix[ok]] -= cpr[ok]
            self.prio_blobs = pr["docs"].combine_chunks()
        else:
            self.prio_term_ids = np.empty(0, dtype=np.int64)
            self.prio_df = np.empty(0, dtype=np.int64)
            self.prio_blobs = pa.array([], pa.binary())
        self._prio_decoded: dict[int, np.ndarray] = {}

        # docmeta (docdb analog) for decoration + content-hash dedup,
        # aligned with fwd_ids order
        dm = pq.read_table(
            os.path.join(out_dir, "journal", f"part={part}"),
            columns=[
                "combined_id", "repo", "path", "title", "description",
                "data_hash",
            ],
        )
        dmo = np.argsort(dm["combined_id"].to_numpy(zero_copy_only=False))
        self.dm_repo = dm["repo"].take(pa.array(dmo))
        self.dm_path = dm["path"].take(pa.array(dmo))
        self.dm_title = dm["title"].take(pa.array(dmo))
        self.dm_description = dm["description"].take(pa.array(dmo))
        self.dm_hash = dm["data_hash"].take(pa.array(dmo))

        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._pos_decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cspans: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
        self._aspans: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
        self._uspans: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def comment_spans(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Comment-span ('heading' analog) lookup structures, loaded
        lazily on the first heading-scored query:

        - ``keys``: sorted ``doc_row * _POS_SHIFT + boundary`` over every
          doc's flattened [start, end) comment pairs — position p of doc
          row r is inside a span iff ``searchsorted(keys, r*S + p,
          'right') - off[r]`` is odd (interval-parity trick, batched as
          ONE searchsorted for all (candidate, position) pairs);
        - ``off``: per-doc-row offsets into keys;
        - ``clen``: per-doc total comment tokens (the reference's
          ``spans.heading.length()``)."""
        if self._cspans is not None:
            return self._cspans
        import pyarrow.compute as pc

        from ..stages.tokenize import SPAN_COMMENT

        jr = pq.read_table(
            os.path.join(self.out_dir, "journal", f"part={self.part}"),
            columns=["combined_id", "span_codes", "spans"],
        )
        o = np.argsort(jr["combined_id"].to_numpy(zero_copy_only=False))
        jr = jr.take(pa.array(o))  # aligned with fwd_ids order
        n = len(jr)
        codes_col = jr["span_codes"].combine_chunks()
        codes_flat = np.frombuffer(
            b"".join(codes_col.to_pylist()), dtype=np.uint8
        )
        outer = jr["spans"].combine_chunks()
        inner = pc.list_flatten(outer)  # list<int32> per span tag
        parents = pc.list_parent_indices(outer).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(codes_flat == SPAN_COMMENT)
        inner_sel = inner.take(pa.array(sel))
        vals = pc.list_flatten(inner_sel).to_numpy(zero_copy_only=False)
        vals = vals.astype(np.int64)
        cnts = pc.list_value_length(inner_sel).to_numpy(zero_copy_only=False)
        per_doc = np.zeros(n, dtype=np.int64)
        per_doc[parents[sel]] = cnts  # at most one comment sublist per doc
        off = np.concatenate([[0], np.cumsum(per_doc)])
        rows = np.repeat(np.arange(n, dtype=np.int64), per_doc)
        keys = rows * _POS_SHIFT + vals
        # total comment tokens per doc: sum(end) - sum(start) over pairs
        within = np.arange(len(vals)) - np.repeat(off[:-1], per_doc)
        sign = np.where(within % 2 == 1, 1, -1)
        clen = np.zeros(n, dtype=np.int64)
        np.add.at(clen, rows, vals * sign)
        self._cspans = (keys, off, clen)
        return self._cspans

    def _load_tag_spans(
        self, code: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(keys, off, exact_keys) interval-parity structure for one span
        tag (same key scheme as :meth:`comment_spans`); ``exact_keys`` =
        sorted ``doc_row * _POS_SHIFT + start`` of the width-1 spans
        (DocumentSpan.countRangeMatchesExact for single-word groups)."""
        import pyarrow.compute as pc

        jr = pq.read_table(
            os.path.join(self.out_dir, "journal", f"part={self.part}"),
            columns=["combined_id", "span_codes", "spans"],
        )
        o = np.argsort(jr["combined_id"].to_numpy(zero_copy_only=False))
        jr = jr.take(pa.array(o))
        n = len(jr)
        codes_col = jr["span_codes"].combine_chunks()
        codes_flat = np.frombuffer(
            b"".join(codes_col.to_pylist()), dtype=np.uint8
        )
        outer = jr["spans"].combine_chunks()
        inner = pc.list_flatten(outer)
        parents = pc.list_parent_indices(outer).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(codes_flat == code)
        inner_sel = inner.take(pa.array(sel))
        vals = pc.list_flatten(inner_sel).to_numpy(zero_copy_only=False)
        vals = vals.astype(np.int64)
        cnts = pc.list_value_length(inner_sel).to_numpy(zero_copy_only=False)
        per_doc = np.zeros(n, dtype=np.int64)
        per_doc[parents[sel]] = cnts  # at most one sublist per tag per doc
        off = np.concatenate([[0], np.cumsum(per_doc)])
        rows = np.repeat(np.arange(n, dtype=np.int64), per_doc)
        keys = rows * _POS_SHIFT + vals
        starts = vals[0::2]
        widths = vals[1::2] - starts
        exact_keys = (rows[0::2] * _POS_SHIFT + starts)[widths == 1]
        return keys, off, np.sort(exact_keys)

    _EMPTY_SPANS = (
        np.empty(0, dtype=np.int64),
        np.zeros(1, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )

    def _has_anchor_regions(self) -> bool:
        """Journal-manifest flag: non-anchor segments skip the span-column
        scan entirely (their journals hold no 'a'/'u' spans)."""
        from ..state import manifest as mf

        try:
            return bool(
                mf.read_manifest(self.out_dir, "journal").get(
                    "anchor_regions", False
                )
            )
        except Exception:
            return True  # unknown provenance: fall back to reading

    def linktext_spans(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """EXTERNAL_LINKTEXT ('a') span lookup structures (anchor-region
        indexes; empty on default builds), loaded lazily."""
        if self._aspans is None:
            from ..stages.tokenize import SPAN_LINKTEXT

            self._aspans = (
                self._load_tag_spans(SPAN_LINKTEXT)
                if self._has_anchor_regions()
                else self._EMPTY_SPANS
            )
        return self._aspans

    def url_spans(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """DOC_URL ('u') span lookup structures (anchor-region indexes;
        empty on default builds), loaded lazily."""
        if self._uspans is None:
            from ..stages.tokenize import SPAN_URL

            self._uspans = (
                self._load_tag_spans(SPAN_URL)
                if self._has_anchor_regions()
                else self._EMPTY_SPANS
            )
        return self._uspans

    def term_row(self, tid: int) -> int:
        i = int(np.searchsorted(self.term_ids, tid))
        if i < len(self.term_ids) and self.term_ids[i] == tid:
            return i
        return -1

    def postings(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """(sorted combined ids, tfs) for a term; decoded lazily, cached."""
        cached = self._decoded.get(tid)
        if cached is not None:
            return cached
        r = self.term_row(tid)
        if r < 0:
            out = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        else:
            out = (
                decode_doc_ids(_blob(self.docs_blobs, r)),
                decode_counts(_blob(self.tfs_blobs, r)),
            )
            if self.tomb is not None and len(out[0]):
                keep = ~_membership(out[0], self.tomb)
                if not keep.all():
                    # keep the raw-length mask so positions_flat can
                    # filter its ragged arrays into alignment
                    self._tomb_mask[tid] = keep
                    out = (out[0][keep], out[1][keep])
        if len(self._decoded) < 4096:
            self._decoded[tid] = out
        return out

    def term_flag_bytes(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """(sorted combined ids, WordFlags byte per posting) for a term —
        the per-keyword flags surface the search service reads off each
        result (SearchResultKeywordScore.flags,
        code/functions/search-query/api/.../SearchResultKeywordScore
        .java:10-24).  The flag byte is the low byte of the posting's
        term-meta word (stages/reverse.py run schema, ``metas``).
        Aligned with ``postings()``: tombstoned postings are dropped via
        the same mask, so ``docs`` here equals the first element of
        ``postings(tid)``."""
        docs, _tfs = self.postings(tid)  # ensures _tomb_mask is populated
        r = self.term_row(tid)
        if r < 0:
            return docs, np.empty(0, dtype=np.int64)
        metas = np.frombuffer(_blob(self.metas_blobs, r), dtype=np.int64)
        mask = self._tomb_mask.get(tid)
        if mask is not None:
            metas = metas[mask]
        return docs, metas & 0xFF

    def block_meta(self, tid: int):
        """(term row, blk_last, blk_maxtf) of the term's block-max side
        index, or None when the term has no blocks (df <= block size, or
        pre-v10 index)."""
        if not self.has_blocks:
            return None
        r = self.term_row(tid)
        if r < 0:
            return None
        s, e = int(self.blk_offs[r]), int(self.blk_offs[r + 1])
        if e == s:
            return None
        return r, self.blk_last_vals[s:e], self.blk_maxtf_vals[s:e]

    def _decode_blocks(
        self, r: int, s: int, bl: np.ndarray, b: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode blocks ``b`` (sorted unique indices) of term row ``r``
        from the docs/tfs blobs — standalone, using blk_last of the
        preceding block as the delta base (add_block_stats contract)."""
        doc_blob = _blob(self.docs_blobs, r)
        tf_blob = _blob(self.tfs_blobs, r)
        boff = self.blk_boff_vals[s : s + len(bl)]
        tboff = self.blk_tf_boff_vals[s : s + len(bl)]
        runs = np.split(b, np.flatnonzero(np.diff(b) > 1) + 1)
        docs_parts, tfs_parts = [], []
        for run in runs:
            b0, b1 = int(run[0]), int(run[-1])
            dend = int(boff[b1 + 1]) if b1 + 1 < len(bl) else len(doc_blob)
            tend = int(tboff[b1 + 1]) if b1 + 1 < len(bl) else len(tf_blob)
            deltas = decode_varints(doc_blob[int(boff[b0]) : dend]).astype(
                np.int64
            )
            base = int(bl[b0 - 1]) if b0 > 0 else -1
            docs_parts.append(base + np.cumsum(deltas))
            tfs_parts.append(
                decode_varints(tf_blob[int(tboff[b0]) : tend]).astype(np.int64)
            )
        return np.concatenate(docs_parts), np.concatenate(tfs_parts)

    def postings_subset(
        self, tid: int, cand: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(docs, tfs) restricted to the blocks that can contain ids in
        ``cand`` (sorted) — a superset of ``postings(tid) ∩ cand``, sorted.
        Decodes ONLY those blocks via the block-max side index; rare terms
        (no blocks) fall back to the full cached decode.  Exactness: any
        retain/membership/tf-gather over candidates drawn from ``cand`` is
        identical to using the full list."""
        cached = self._decoded.get(tid)
        if cached is not None:
            return cached
        meta = self.block_meta(tid)
        if meta is None:
            return self.postings(tid)
        r, bl, _ = meta
        b = np.unique(np.searchsorted(bl, cand))
        b = b[b < len(bl)]
        self.blocks_decoded += len(b)
        self.blocks_skipped += len(bl) - len(b)
        if len(b) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        out = self._decode_blocks(r, int(self.blk_offs[r]), bl, b)
        if len(b) == len(bl) and len(self._decoded) < 4096:
            # candidates touched every block: this IS the full posting
            # list (has_blocks implies no tombstones owed) — cache it so
            # repeated probes against the same hot term (chunked scans,
            # exclude filters, scoring passes) decode once
            self._decoded[tid] = out
        return out

    def positions_flat(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """A term's positions as (flat int64 array, ragged offsets) —
        posting i owns ``flat[offsets[i]:offsets[i+1]]``.  Decoded once
        per query in one vectorized varint pass, cached."""
        cached = self._pos_decoded.get(tid)
        if cached is not None:
            return cached
        r = self.term_row(tid)
        if r < 0:
            out = (np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64))
        else:
            cnts = self.pos_cnts[int(r)].values.to_numpy(zero_copy_only=False)
            if self.pos_codec == "gamma":
                from ..functions.gamma_seq import flat_gamma_positions_by_counts

                out = flat_gamma_positions_by_counts(
                    _blob(self.pos_blobs, r), np.asarray(cnts, dtype=np.int64)
                )
            else:
                out = flat_positions_by_counts(
                    _blob(self.pos_blobs, r), np.asarray(cnts, dtype=np.int64)
                )
            if self.tomb is not None:
                self.postings(tid)  # ensure the keep mask is populated
                keep = self._tomb_mask.get(tid)
                if keep is not None:
                    flat, offs = out
                    lens = offs[1:] - offs[:-1]
                    klens = lens[keep]
                    noffs = np.concatenate(
                        [[0], np.cumsum(klens)]
                    ).astype(np.int64)
                    idx = np.repeat(offs[:-1][keep], klens) + (
                        np.arange(noffs[-1], dtype=np.int64)
                        - np.repeat(noffs[:-1], klens)
                    )
                    out = (flat[idx], noffs)
        if len(self._pos_decoded) < 256:
            self._pos_decoded[tid] = out
        return out

    def doc_sizes(self, ids: np.ndarray) -> np.ndarray:
        i = np.searchsorted(self.fwd_ids, ids)
        return self.fwd_size[i]

    def doc_years(self, ids: np.ndarray) -> np.ndarray:
        """Publication year per doc from the packed doc meta — the ONE
        decode shared by the meta-limit filter and the year facet."""
        from ..functions.metadata import (
            PUBDATE_ENCODING_OFFSET,
            decode_year_byte,
        )

        i = np.searchsorted(self.fwd_ids, ids)
        return PUBDATE_ENCODING_OFFSET + decode_year_byte(self.fwd_meta[i])

    def lang_ids(self, lang: str) -> np.ndarray:
        """Sorted combined ids of one language — a PRUNED read: only this
        part's ``lang_index/part=p/lang=<lang>`` dir is listed (per-language
        journal partitioning, IndexJournal.java:15-17,28-34), decoded once
        and cached."""
        cached = self._lang_ids.get(lang)
        if cached is None:
            d = os.path.join(
                self.out_dir, "lang_index", f"part={self.part}", f"lang={lang}"
            )
            if os.path.isdir(d):
                cached = np.sort(
                    pq.read_table(d, columns=["combined_id"])[
                        "combined_id"
                    ].to_numpy(zero_copy_only=False)
                )
                if self.tomb is not None and len(cached):
                    cached = _reject(cached, self.tomb)
            else:
                cached = np.empty(0, dtype=np.int64)
            self._lang_ids[lang] = cached
        return cached

    def langs(self) -> list[str]:
        """Languages present in this part's lang index (dir listing of the
        hive partition keys — no data read)."""
        d = os.path.join(self.out_dir, "lang_index", f"part={self.part}")
        if not os.path.isdir(d):
            return []
        return sorted(
            e.split("=", 1)[1]
            for e in os.listdir(d)
            if e.startswith("lang=")
        )

    def prio_postings(self, tid: int) -> np.ndarray:
        """Sorted combined ids of the term's priority (flagged) postings."""
        cached = self._prio_decoded.get(tid)
        if cached is not None:
            return cached
        from ..functions.prio_codec import decode_prio_doc_ids

        i = int(np.searchsorted(self.prio_term_ids, tid))
        if i < len(self.prio_term_ids) and self.prio_term_ids[i] == tid:
            out = decode_prio_doc_ids(_blob(self.prio_blobs, i))
            if self.tomb is not None and len(out):
                out = _reject(out, self.tomb)
        else:
            out = np.empty(0, dtype=np.int64)
        if len(self._prio_decoded) < 1024:
            self._prio_decoded[tid] = out
        return out

    def prio_df_of(self, tid: int) -> int:
        i = int(np.searchsorted(self.prio_term_ids, tid))
        if i < len(self.prio_term_ids) and self.prio_term_ids[i] == tid:
            return int(self.prio_df[i])
        return 0

    def first_positions(self, tid: int) -> np.ndarray:
        """First occurrence position per posting (aligned with postings)."""
        flat, offs = self.positions_flat(tid)
        out = np.zeros(len(offs) - 1, dtype=np.int64)
        nz = offs[:-1] < offs[1:]
        out[nz] = flat[offs[:-1][nz]]
        return out


def _adjacency_keys(
    seg: "_Segment", cand: np.ndarray, seq_ids: list[int]
) -> np.ndarray:
    """Surviving (candidate, start) keys of the exact-adjacency match of
    ``seq_ids`` over ALL candidates — global candidate indices, sorted.
    Computed once per query and shared by the verbatim/proximity/tag-score
    consumers."""
    term_docs = [seg.postings(t)[0] for t in seq_ids]
    term_pos = [seg.positions_flat(t) for t in seq_ids]
    parts: list[np.ndarray] = []
    for lo in range(0, len(cand), _VERIFY_CHUNK):
        sub = cand[lo : lo + _VERIFY_CHUNK]
        ok, rows = _present_rows(term_docs, sub)
        sel = np.flatnonzero(ok)
        if len(sel) == 0:
            continue
        surv = _intersect_sequences_batched(
            term_pos, [r[sel] for r in rows], sel.astype(np.int64) + lo
        )
        if len(surv):
            parts.append(surv)
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def _group_tag_score(
    seg: "_Segment",
    cand: np.ndarray,
    seq_ids: list[int],
    sizes: np.ndarray,
    w_head: float,
    w_body: float,
    att_head: float,
    att_body: float,
    scale: float,
    head_boundary_bonus: bool,
    keys: np.ndarray | None = None,
    w_link: float = 0.0,
    w_url: float = 0.0,
) -> np.ndarray:
    """Per-candidate tag-weighted verbatim score of one phrase group
    (VerbatimMatches full/optional-group matching, IndexResultRanking
    Service.java:456-554): count the group's exact-adjacency matches per
    tag (head span vs body), score w * |group| * scale *
    (1 + ln(1 + cnt^attenuation)) per tag with matches, plus the 1.5x
    title(=head)-boundary bonus for the full group.

    ``w_link``/``w_url``: EXTERNAL_LINKTEXT / DOC_URL weights (reference
    weight tables :419-453, attenuation 1.0) — matches whose whole range
    lies inside an 'a'/'u' span class there instead of BODY.  Anchor
    spans live past the body, so they never overlap the head class; on
    default builds there are no such spans and the classification is
    unchanged."""
    from ..stages.tokenize import HEAD_SPAN_TOKENS

    Lg = len(seq_ids)
    n = len(cand)
    if keys is None:
        keys = _adjacency_keys(seg, cand, seq_ids)
    if len(keys) == 0:
        return np.zeros(n, dtype=np.float64)
    head_end = np.minimum(HEAD_SPAN_TOKENS, sizes.astype(np.int64))
    cidx = keys // _POS_SHIFT
    start = keys - cidx * _POS_SHIFT
    he = head_end[cidx]
    in_head = start + Lg - 1 <= he

    def _contained(span_struct) -> np.ndarray:
        skeys, soff, _ = span_struct
        if len(skeys) == 0:
            return np.zeros(len(keys), dtype=bool)
        rows = np.searchsorted(seg.fwd_ids, cand[cidx])
        g1 = np.searchsorted(skeys, rows * _POS_SHIFT + start, side="right")
        g2 = np.searchsorted(
            skeys, rows * _POS_SHIFT + (start + Lg - 1), side="right"
        )
        # whole range inside ONE span: start is at odd parity and no
        # span boundary falls between start and start+Lg-1
        return (((g1 - soff[rows]) % 2) == 1) & (g1 == g2)

    in_a = np.zeros(len(keys), dtype=bool)
    in_u = np.zeros(len(keys), dtype=bool)
    if w_link > 0:
        in_a = _contained(seg.linktext_spans())
    if w_url > 0:
        in_u = _contained(seg.url_spans()) & ~in_a
    in_body = ~in_head & ~in_a & ~in_u
    cnt_h = np.bincount(cidx[in_head], minlength=n).astype(np.float64)
    cnt_b = np.bincount(cidx[in_body], minlength=n).astype(np.float64)
    out = np.where(
        cnt_h > 0,
        w_head * Lg * scale * (1.0 + np.log1p(cnt_h**att_head)),
        0.0,
    )
    out += np.where(
        cnt_b > 0,
        w_body * Lg * scale * (1.0 + np.log1p(cnt_b**att_body)),
        0.0,
    )
    if w_link > 0:
        cnt_a = np.bincount(cidx[in_a], minlength=n).astype(np.float64)
        out += np.where(
            cnt_a > 0,
            w_link * Lg * scale * (1.0 + np.log1p(cnt_a)),
            0.0,
        )
    if w_url > 0:
        cnt_u = np.bincount(cidx[in_u], minlength=n).astype(np.float64)
        out += np.where(
            cnt_u > 0,
            w_url * Lg * scale * (1.0 + np.log1p(cnt_u)),
            0.0,
        )
    if head_boundary_bonus:
        bd = in_head & ((start == 1) | (start + Lg - 1 == he))
        out += 1.5 * np.bincount(cidx[bd], minlength=n).astype(np.float64)
    return out


def _tree_docs(seg: "_Segment", node: tuple) -> np.ndarray:
    """Sorted doc ids satisfying the And/Or tree — And intersects
    smallest-first (rarest-first heuristic, CombinedIndexReader.
    createQueries:94-130), Or takes the sorted union."""
    if node[0] == "word":
        return seg.postings(node[1])[0]
    parts = [_tree_docs(seg, p) for p in node[1]]
    if not parts:
        return np.empty(0, dtype=np.int64)
    if node[0] == "and":
        parts.sort(key=len)
        cand = parts[0]
        for d in parts[1:]:
            if len(cand) == 0:
                break
            cand = _retain(cand, d)
        return cand
    return np.unique(np.concatenate(parts))


def _tree_score(
    seg: "_Segment",
    node: tuple,
    cand: np.ndarray,
    sizes: np.ndarray,
    global_df: dict[int, int],
    total_docs: int,
) -> np.ndarray:
    """Per-candidate aggregate over the tree: sum over AND parts, max over
    OR branches of the member's BM25 term score where present
    (CompiledQueryAggregates.intMaxSum shape, CompiledQueryAggregates.java:
    66-210 / Bm25GraphVisitor)."""
    if node[0] == "word":
        t = node[1]
        docs, tfs = seg.postings(t)
        if len(docs) == 0:
            return np.zeros(len(cand), dtype=np.float64)
        present = _membership(cand, docs)
        ix = np.minimum(np.searchsorted(docs, cand), len(tfs) - 1)
        tf = np.where(present, tfs[ix], 0).astype(np.float64)
        return np.where(
            present,
            bm25.bm25_term_score(total_docs, global_df.get(t, 0), tf, sizes),
            0.0,
        )
    scores = [
        _tree_score(seg, p, cand, sizes, global_df, total_docs) for p in node[1]
    ]
    if not scores:
        return np.zeros(len(cand), dtype=np.float64)
    if node[0] == "and":
        return np.sum(scores, axis=0)
    return np.maximum.reduce(scores)


class SearcherLogic:
    """Pure search logic over a _Segment (testable without Ray)."""

    def __init__(
        self,
        out_dir: str,
        part: int,
        suppress: tuple[tuple[str, int], ...] = (),
    ):
        self.seg = _Segment(out_dir, part, suppress)

    def local_df(self, term_ids: list[int]) -> dict[int, int]:
        seg = self.seg
        out = {}
        for t in term_ids:
            r = seg.term_row(t)
            out[t] = int(seg.df[r]) if r >= 0 else 0
        return out

    def local_prio_df(self, term_ids: list[int]) -> dict[int, int]:
        return {t: self.seg.prio_df_of(t) for t in term_ids}

    def search(self, plan: dict, global_df: dict[int, int], total_docs: int) -> dict:
        import time

        seg = self.seg
        # wall-clock search budget (IndexSearchBudget.java:1-20 analog):
        # phrase verification — the only unbounded per-candidate loop —
        # checks the deadline and truncates the candidate set, yielding a
        # partial (still correctly ranked) result like the reference's
        # budgeted early exit.  Default budget is infinite so parity runs
        # stay exhaustive (SURVEY §2.6 O7).
        deadline = time.monotonic() + plan.get("budget_s", float("inf"))
        include_ids = plan["include_ids"]
        exclude_ids = plan["exclude_ids"]
        phrase_ids = plan["phrase_ids"]
        priority_ids = plan.get("priority_ids", [])
        group_ids = plan.get("group_ids", [])
        domain_range = plan.get("domain_range")
        size_gt = plan.get("size_gt")
        size_lt = plan.get("size_lt")
        first_position_weight = plan.get("first_position_weight", 0.0)
        tree = plan.get("tree")
        k = plan["k"]
        if not include_ids and not group_ids and tree is None:
            return _empty_partition_result()

        # pruned execution (plan["pruned"], block-max side index): non-
        # driver posting lists decode ONLY the blocks that can contain the
        # current candidates — a superset of list ∩ cand, so every retain/
        # reject/membership/tf-gather below is EXACT (postings_subset
        # contract).  Off by default; identical results either way.
        # count_only forces exhaustive candidates: the pruned top-k paths
        # (block-max AND / MaxScore OR) produce score-ordered SUBSETS
        pruned = (
            bool(plan.get("pruned"))
            and seg.has_blocks
            and not plan.get("count_only")
            and not plan.get("facet")
            and not plan.get("facet_with")
            # explain needs the generic scorer's factor checkpoints, not
            # the block-max early-exit paths (debug runs full evaluation,
            # like the reference's debugRankingFactors != null path)
            and not plan.get("explain")
        )

        def _pl(t: int, against: np.ndarray) -> np.ndarray:
            if pruned and len(against):
                return seg.postings_subset(t, against)[0]
            return seg.postings(t)[0]

        # block-max early termination (Ding & Suel BMW, adapted): a plain
        # conjunctive top-k scan visits driver-term blocks in upper-bound
        # order and stops when no unvisited block can beat the running
        # k-th score (N=1: the single-term scan; N>1: block-max AND)
        if pruned and self._plan_is_plain_conj(plan):
            res = self._pruned_conj_topk(plan, global_df, total_docs, deadline)
            if res is not None:
                return res

        # rarest-first execution ordering (CombinedIndexReader.createQueries
        # :94-130 heuristic) — cheapest posting list drives the intersection
        rest_groups = group_ids
        if include_ids:
            ordered = sorted(include_ids, key=lambda t: global_df.get(t, 0))
            cand, _ = seg.postings(ordered[0])
            for t in ordered[1:]:
                if len(cand) == 0:
                    break
                cand = _retain(cand, _pl(t, cand))
            if tree is not None and len(cand):
                cand = _retain(cand, _tree_docs(seg, tree))
        elif tree is not None:
            cand = _tree_docs(seg, tree)
        else:
            # seed from the first OR-group: union of member lists (J3
            # any-of).  Pure-OR top-k under pruning seeds from MaxScore +
            # block-max discovery instead — a provable superset of every
            # doc that can reach the K-th boundary; the group-score loop
            # below then scores the seed EXACTLY (postings_subset), so the
            # result is identical to the exhaustive union seed.
            cand = None
            if pruned and self._plan_is_pure_or(plan):
                cand = self._pruned_or_candidates(
                    plan, global_df, total_docs, deadline
                )
            if cand is None:
                cand = np.unique(
                    np.concatenate([seg.postings(t)[0] for t in group_ids[0]])
                )
            rest_groups = group_ids[1:]
        for g in rest_groups:
            if len(cand) == 0:
                break
            mask = np.zeros(len(cand), dtype=bool)
            for t in g:
                mask |= _membership(cand, _pl(t, cand))
            cand = cand[mask]
        cand = self._apply_filters(seg, cand, plan, _pl)

        # mandatory phrase constraints — batched SequenceOperations.
        # intersectSequences: one sorted-merge membership pass per phrase
        # term over ALL candidates' (candidate, start) keys at once; the
        # budget is honored per chunk (partial-but-correct early exit).
        for phrase in phrase_ids:
            if len(cand) == 0 or len(phrase) < 2:
                continue
            term_docs = [seg.postings(t)[0] for t in phrase]
            term_pos = [seg.positions_flat(t) for t in phrase]
            keep = np.zeros(len(cand), dtype=bool)
            for lo in range(0, len(cand), _VERIFY_CHUNK):
                if time.monotonic() > deadline:
                    break
                sub = cand[lo : lo + _VERIFY_CHUNK]
                ok, rows = _present_rows(term_docs, sub)
                sel = np.flatnonzero(ok)
                if len(sel) == 0:
                    continue
                surv = _intersect_sequences_batched(
                    term_pos, [r[sel] for r in rows], sel.astype(np.int64)
                )
                if len(surv):
                    keep[lo + np.unique(surv // _POS_SHIFT)] = True
            cand = cand[keep]

        if plan.get("count_only"):
            # total-hit counting (ResultPriorityQueue size analog): the
            # full candidate set post-filters, no scoring
            return {"match_count": int(len(cand))}

        if plan.get("facet"):
            # facet counting (per-domain result counting generalized,
            # IndexQueryExecution:159-178 domain-count analog): counts of
            # the FULL post-filter candidate set grouped by a per-doc key,
            # no scoring.  Partials merge by summation on the driver;
            # tombstone suppression already happened at decode time, so a
            # delta chain facets exactly like a rebuilt corpus.
            return self._facet_partial(seg, cand, plan["facet"])

        # combined results+facets: piggyback the facet partial on the
        # top-k pass (one fan-out, one candidate enumeration — the
        # reference's count-while-collecting shape).  facet_with forces
        # pruned off at the driver so cand here is the FULL match set.
        facet_extra = (
            self._facet_partial(seg, cand, plan["facet_with"])
            if plan.get("facet_with")
            else None
        )

        if len(cand) == 0:
            out = _empty_partition_result()
            if facet_extra is not None:
                out.update(facet_extra)
            return out

        # BM25 over included terms, global idf (Bm25GraphVisitor formulas).
        # head_tf_weight > 0 switches to tag-weighted counts (UnorderedMatches
        # analog, IndexResultRankingService:557-618): occurrences inside the
        # head span count (1 + w) instead of 1.
        sizes = seg.doc_sizes(cand).astype(np.float64)
        score = np.zeros(len(cand), dtype=np.float64)
        # explain mode (DebugRankingFactors analog): checkpoint the
        # additive score after every component block and attribute the
        # delta to a named factor.  fx arrays stay aligned with cand.
        explain = bool(plan.get("explain"))
        fx: dict[str, np.ndarray] = {}
        fx_last = np.zeros(len(cand), dtype=np.float64) if explain else None

        def _fx_take(name: str, cur: np.ndarray) -> None:
            nonlocal fx_last
            d = cur - fx_last
            fx[name] = fx[name] + d if name in fx else d
            fx_last = cur.astype(np.float64, copy=True)

        head_tf_weight = plan.get("head_tf_weight", 0.0)
        from ..stages.tokenize import HEAD_SPAN_TOKENS

        for t in include_ids:
            # pruned: gather tf from candidate-bearing blocks only; the
            # head-tf path needs the FULL list (positions offsets align
            # with full posting indices)
            docs, tfs = (
                seg.postings_subset(t, cand)
                if pruned and head_tf_weight == 0
                else seg.postings(t)
            )
            ix = np.searchsorted(docs, cand)
            tf = tfs[ix].astype(np.float64)
            if head_tf_weight > 0:
                # tag-weighted counts, batched: gather all candidates'
                # positions in one ragged pass, count head-span hits per
                # candidate with a bincount
                flat, offs = seg.positions_flat(t)
                vals, lens = _gather_ragged(flat, offs, ix)
                cidx = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
                head_tf = np.bincount(
                    cidx[vals <= HEAD_SPAN_TOKENS], minlength=len(cand)
                ).astype(np.float64)
                tf = tf + head_tf_weight * head_tf
            score += bm25.bm25_term_score(
                total_docs, global_df.get(t, 0), tf, sizes
            )
        # OR-groups: max over present members of the member's BM25 score
        # (CompiledQueryAggregates intMaxSum shape: max over OR branches,
        # sum over AND — CompiledQueryAggregates.java:165)
        for g in group_ids:
            gscore = np.zeros(len(cand), dtype=np.float64)
            for t in g:
                docs, tfs = (
                    seg.postings_subset(t, cand) if pruned else seg.postings(t)
                )
                if len(docs) == 0:
                    continue
                present = _membership(cand, docs)
                ix = np.minimum(np.searchsorted(docs, cand), len(tfs) - 1)
                tf = np.where(present, tfs[ix], 0).astype(np.float64)
                gscore = np.maximum(
                    gscore,
                    np.where(
                        present,
                        bm25.bm25_term_score(
                            total_docs, global_df.get(t, 0), tf, sizes
                        ),
                        0.0,
                    ),
                )
            score += gscore

        # nested tree aggregate: sum over AND, max over OR on the tree
        if tree is not None:
            score += _tree_score(seg, tree, cand, sizes, global_df, total_docs)
        if explain:
            _fx_take("fx_bm25", score)

        # first-position component: w / sqrt(max over include terms of the
        # term's first occurrence) — IndexResultRankingService:133,595
        # (tcfFirstPositionWeight), enabled per query
        if first_position_weight > 0 and include_ids:
            fp = np.zeros(len(cand), dtype=np.float64)
            for t in include_ids:
                docs, _ = seg.postings(t)
                firsts = seg.first_positions(t)
                ix = np.searchsorted(docs, cand)
                fp = np.maximum(fp, firsts[ix].astype(np.float64))
            score += first_position_weight / np.sqrt(np.maximum(fp, 1.0))
        if explain:
            _fx_take("fx_first_position", score)

        # exact-adjacency keys of the include sequence, computed at most
        # ONCE per query and shared by the verbatim v1 / verbatim-tags /
        # proximity title-check consumers (review finding: was 3x)
        _adj_memo: list[np.ndarray] = []

        def _include_adjacency() -> np.ndarray:
            if not _adj_memo:
                _adj_memo.append(_adjacency_keys(seg, cand, include_ids))
            return _adj_memo[0]

        # verbatim component (VerbatimMatches analog, IndexResultRanking
        # Service:406-554 simplified): bonus when the include terms occur
        # as an exact adjacent phrase; x1.5 when a match starts inside the
        # head span (title-boundary bonus analog, :509-513)
        verbatim_weight = plan.get("verbatim_weight", 0.0)
        if verbatim_weight > 0 and len(include_ids) >= 2:
            keys_v = _include_adjacency()
            vbonus = np.zeros(len(cand), dtype=np.float64)
            if len(keys_v):
                cidx = keys_v // _POS_SHIFT
                start = keys_v - cidx * _POS_SHIFT
                has = np.zeros(len(cand), dtype=bool)
                has[cidx] = True
                inh = np.zeros(len(cand), dtype=bool)
                inh[cidx[start <= HEAD_SPAN_TOKENS]] = True
                vbonus = np.where(
                    has, verbatim_weight * np.where(inh, 1.5, 1.0), 0.0
                )
            score += vbonus
        if explain:
            _fx_take("fx_verbatim", score)

        # proximity component (2-term queries): w * 2/(0.1 + sqrt(minDist))
        # over the terms' position lists — IndexResultRankingService
        # :365-383 formula, pinned to the pairwise min distance
        proximity_weight = plan.get("proximity_weight", 0.0)
        if proximity_weight > 0 and len(include_ids) == 2:
            t1, t2 = include_ids
            docs1, _ = seg.postings(t1)
            docs2, _ = seg.postings(t2)
            flat1, offs1 = seg.positions_flat(t1)
            flat2, offs2 = seg.positions_flat(t2)
            big = np.int64(1) << 40
            dist = np.full(len(cand), big, dtype=np.int64)
            for lo in range(0, len(cand), _VERIFY_CHUNK):
                sub = cand[lo : lo + _VERIFY_CHUNK]
                ok, rows = _present_rows([docs1, docs2], sub)
                sel = np.flatnonzero(ok)
                if len(sel) == 0:
                    continue
                # keyed nearest-neighbor merge: both terms' positions for
                # all candidates in two sorted key arrays; per element the
                # nearest cross-term position is found by one searchsorted
                v1, l1 = _gather_ragged(flat1, offs1, rows[0][sel])
                v2, l2 = _gather_ragged(flat2, offs2, rows[1][sel])
                c1 = np.repeat(sel.astype(np.int64), l1)
                c2 = np.repeat(sel.astype(np.int64), l2)
                k1 = c1 * _POS_SHIFT + v1
                k2 = c2 * _POS_SHIFT + v2
                if len(k1) == 0 or len(k2) == 0:
                    continue
                j = np.searchsorted(k2, k1)
                jc = np.minimum(j, len(k2) - 1)
                right = np.where(
                    (j < len(k2)) & (k2[jc] // _POS_SHIFT == c1), k2[jc] - k1, big
                )
                jl = np.maximum(j - 1, 0)
                left = np.where(
                    (j > 0) & (k2[jl] // _POS_SHIFT == c1), k1 - k2[jl], big
                )
                d = np.minimum(left, right)
                nz = l1 > 0
                if nz.all():
                    dmin = np.minimum.reduceat(d, np.cumsum(l1) - l1)
                else:
                    dmin = np.full(len(sel), big, dtype=np.int64)
                    np.minimum.at(
                        dmin, np.repeat(np.arange(len(sel)), l1), d
                    )
                dist[lo + sel] = dmin
            score += proximity_weight * 2.0 / (0.1 + np.sqrt(dist.astype(np.float64)))
        if explain:
            _fx_take("fx_proximity", score)

        # k-term proximity (getProximitiyFac:373-383 for >2 terms): the
        # minimal covering range over one offset position per term; only a
        # sufficiently tight range (minDist < k + 8) earns the tapering
        # 2/(0.1+sqrt(d)) reward, and an exact in-order adjacency
        # (minDist == 0) earns nothing (verbatim covers it)
        proximity_all_weight = plan.get("proximity_all_weight", 0.0)
        if proximity_all_weight > 0 and len(include_ids) > 2 and len(cand):
            L = len(include_ids)
            term_docs_p = [seg.postings(t)[0] for t in include_ids]
            term_pos_p = [seg.positions_flat(t) for t in include_ids]
            big = np.int64(1) << 40
            md = np.full(len(cand), big, dtype=np.int64)
            for lo_i in range(0, len(cand), _VERIFY_CHUNK):
                sub = cand[lo_i : lo_i + _VERIFY_CHUNK]
                ok, rows = _present_rows(term_docs_p, sub)
                sel = np.flatnonzero(ok)
                if len(sel) == 0:
                    continue
                md[lo_i : lo_i + len(sub)] = _min_distance_k(
                    term_pos_p, [r[sel] for r in rows], sel.astype(np.int64),
                    len(sub),
                )
            fac = np.where(
                (md > 0) & (md < L + 8),
                2.0 / (0.1 + np.sqrt(np.maximum(md, 1).astype(np.float64))),
                0.0,
            )
            # all-terms-in-title(=head) bonus (getProximitiyFac:387-392):
            # when the TOTAL head-span observation count equals the
            # keyword count (the reference's aggregate condition,
            # observationsByTag[tag] == searchableKeywordCount) and the
            # full phrase does NOT verbatim-match there, add
            # obs * (2.5 + 2/max(1, title_len))
            he = np.minimum(HEAD_SPAN_TOKENS, sizes.astype(np.int64))
            obs = np.zeros(len(cand), dtype=np.int64)
            for j, t in enumerate(include_ids):
                docs_t = term_docs_p[j]
                ix = np.searchsorted(docs_t, cand)
                flat, offs = term_pos_p[j]
                vals, lens = _gather_ragged(flat, offs, np.minimum(ix, len(offs) - 2))
                cidx = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
                obs += np.bincount(cidx[vals <= he[cidx]], minlength=len(cand))
            vb_head = np.zeros(len(cand), dtype=bool)
            keys_p = _include_adjacency()
            if len(keys_p):
                cidx2 = keys_p // _POS_SHIFT
                start = keys_p - cidx2 * _POS_SHIFT
                inh = start + L - 1 <= he[cidx2]
                vb_head[cidx2[inh]] = True
            fac += np.where(
                (obs == L) & ~vb_head,
                obs * (2.5 + 2.0 / np.maximum(1, he).astype(np.float64)),
                0.0,
            )
            score += proximity_all_weight * fac
        if explain:
            _fx_take("fx_proximity", score)

        # all-keywords-in-a-heading bonus (getProximitiyFac:394-400): when
        # the total observation count inside HEADING spans equals the
        # keyword count and the heading field is short
        # (spans.heading.length() < 64), add 1.0 * obs.  The code corpus's
        # heading analog is the COMMENT span family ('c' tag, section
        # comment lines).  Divergence: the reference also requires no
        # verbatim HEADING match; the 2-tag verbatim model has no comment
        # tag, so that suppression is vacuous here (documented).
        heading_bonus_weight = plan.get("heading_bonus_weight", 0.0)
        if heading_bonus_weight > 0 and len(include_ids) >= 1 and len(cand):
            ckeys, coff, clen = seg.comment_spans()
            rows_c = np.searchsorted(seg.fwd_ids, cand)
            obs_c = np.zeros(len(cand), dtype=np.int64)
            for t in include_ids:
                docs_t = seg.postings(t)[0]
                ix = np.searchsorted(docs_t, cand)
                flat, offs = seg.positions_flat(t)
                vals, lens = _gather_ragged(
                    flat, offs, np.minimum(ix, max(len(offs) - 2, 0))
                )
                cidx = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
                # interval parity: position inside a [start, end) comment
                # pair iff its rank among the doc's flattened boundaries
                # is odd — ONE searchsorted for every (candidate, pos)
                qk = rows_c[cidx] * _POS_SHIFT + vals
                gi = np.searchsorted(ckeys, qk, side="right")
                inside = ((gi - coff[rows_c[cidx]]) % 2) == 1
                obs_c += np.bincount(cidx[inside], minlength=len(cand))
            hit = (obs_c == len(include_ids)) & (clen[rows_c] < 64)
            score += np.where(
                hit, heading_bonus_weight * obs_c.astype(np.float64), 0.0
            )
        if explain:
            _fx_take("fx_proximity", score)

        # tag-weighted verbatim (VerbatimMatches full analog): per-tag
        # weight table + attenuation + head-boundary bonus + single-word
        # title rule + sqrt-scaled optional groups (the query's phrases)
        verbatim_tag_weight = plan.get("verbatim_tag_weight", 0.0)
        if verbatim_tag_weight > 0:
            L = len(include_ids)
            if L >= 2:
                v2 = _group_tag_score(
                    seg, cand, include_ids, sizes,
                    VERBATIM_W_FULL_HEAD, VERBATIM_W_FULL_BODY,
                    VERBATIM_ATT_HEAD, VERBATIM_ATT_BODY, 1.0, True,
                    keys=_include_adjacency(),
                    w_link=VERBATIM_W_FULL_LINK, w_url=VERBATIM_W_FULL_URL,
                )
            elif L == 1:
                # single-word query whose "title" (head span) is exactly
                # that word: head length 1 <=> doc length 1
                v2 = np.where(sizes == 1.0, VERBATIM_SINGLE_TITLE_BONUS, 0.0)
                # EXTERNAL_LINKTEXT exact/partial span matches for the
                # single-word group (IndexResultRankingService.java:
                # 470-481): 1.5 per exact (a width-1 'a' span equal to
                # [p, p+1)) + 0.5 per partial (inside an 'a' span but not
                # exact).  Zero-cost on default builds (no 'a' spans).
                akeys, aoff, aexact = seg.linktext_spans()
                t0 = include_ids[0]
                docs_t = seg.postings(t0)[0] if len(akeys) else ()
                if len(akeys) and len(cand) and len(docs_t):
                    rows_a = np.searchsorted(seg.fwd_ids, cand)
                    ix = np.searchsorted(docs_t, cand)
                    # candidates absent from this term's postings (OR
                    # plans) contribute no intersections
                    safe = np.minimum(ix, len(docs_t) - 1)
                    sel0 = np.flatnonzero(docs_t[safe] == cand)
                    flat, offs = seg.positions_flat(t0)
                    vals, lens = _gather_ragged(
                        flat, offs,
                        np.minimum(ix[sel0], max(len(offs) - 2, 0)),
                    )
                    cidx = np.repeat(sel0.astype(np.int64), lens)
                    qk = rows_a[cidx] * _POS_SHIFT + vals
                    gi = np.searchsorted(akeys, qk, side="right")
                    inside = ((gi - aoff[rows_a[cidx]]) % 2) == 1
                    partial = np.bincount(
                        cidx[inside], minlength=len(cand)
                    )
                    if len(aexact):
                        ei = np.searchsorted(aexact, qk)
                        is_ex = (
                            aexact[np.minimum(ei, len(aexact) - 1)] == qk
                        ) & (ei < len(aexact))
                        exact = np.bincount(
                            cidx[is_ex], minlength=len(cand)
                        )
                    else:
                        exact = np.zeros(len(cand), dtype=np.int64)
                    v2 = v2 + 1.5 * exact + 0.5 * (partial - exact)
            else:
                v2 = np.zeros(len(cand), dtype=np.float64)
            for p in phrase_ids:
                if len(p) >= 2 and list(p) != list(include_ids):
                    v2 += _group_tag_score(
                        seg, cand, p, sizes,
                        VERBATIM_W_PART_HEAD, VERBATIM_W_PART_BODY,
                        VERBATIM_ATT_HEAD, VERBATIM_ATT_BODY,
                        float(np.sqrt(len(p) / max(L, 1))), False,
                        w_link=VERBATIM_W_PART_LINK,
                        w_url=VERBATIM_W_PART_URL,
                    )
            score += verbatim_tag_weight * v2
        if explain:
            _fx_take("fx_verbatim", score)

        # bFlags component (TermFlagsGraphVisitor analog, score_bFlags =
        # 0.5 x flag-presence BM25, IndexResultRankingService:139-141):
        # presence comes from the prio index, idf from the global prio df
        flags_weight = plan.get("flags_weight", 0.0)
        if flags_weight > 0:
            prio_df = plan.get("prio_df", {})
            for t in include_ids:
                pd_docs = seg.prio_postings(t)
                fl = _membership(cand, pd_docs).astype(np.float64)
                score += (
                    flags_weight
                    * 0.5
                    * bm25.bm25_term_score(
                        total_docs, prio_df.get(t, 0), fl, sizes
                    )
                )
        if explain:
            _fx_take("fx_flags", score)

        # ?priority terms. Two compositions:
        #  - additive (default, legacy): PRIORITY_WEIGHT x the term's BM25
        #    score where present (SQL-expressible stand-in)
        #  - multiplicative (plan["multiplicative_priority"]): the
        #    reference's exact shape — each present ?term contributes its
        #    promote weight (default 1.0/term) to priorityTermAdjustment,
        #    and the final score is
        #    rankingAdjustment * Σscores * exp(priorityTermAdjustment/5)
        #    (IndexResultRankingService.java:145-156; rankingAdjustment is
        #    a per-domain override factor, default 1.0 — modeled as 1.0)
        multiplicative = plan.get("multiplicative_priority", False)
        prio_adj = np.zeros(len(cand), dtype=np.float64) if multiplicative else None
        # per-term promote amounts (SearchFilterSpec termsPromote /
        # searchTermsPriorityWeight — the reference threads each ?term's
        # weight into priorityTermAdjustment); default 1.0 per term
        prio_w = plan.get("priority_weight_by_id") or {}
        for t in priority_ids:
            docs, tfs = (
                seg.postings_subset(t, cand) if pruned else seg.postings(t)
            )
            if len(docs) == 0:
                continue
            amt = float(prio_w.get(t, 1.0))
            ix = np.searchsorted(docs, cand)
            present = _membership(cand, docs)
            if multiplicative:
                prio_adj += (
                    amt * PRIORITY_TERM_ADJ * present.astype(np.float64)
                )
                continue
            tf = np.where(present, tfs[np.minimum(ix, len(tfs) - 1)], 0).astype(
                np.float64
            )
            score += amt * PRIORITY_WEIGHT * np.where(
                present,
                bm25.bm25_term_score(total_docs, global_df.get(t, 0), tf, sizes),
                0.0,
            )

        # priority-domain boost (?org:<prefix> -> priorityDomainIds,
        # IndexResultRankingService.java:150-153): flat adjustment where
        # the candidate's domain id is in the prioritized set; in
        # multiplicative mode it joins priorityTermAdjustment instead
        # (SearchContext.java:146-153 — priorityDomainIds amounts feed
        # the same exp() term, IndexResultRankingService.java:153-156)
        prio_domains = plan.get("priority_domains")
        if prio_domains:
            dom = idcodec.get_domain_id(cand)
            in_set = np.isin(
                dom, np.asarray(prio_domains, dtype=np.int64)
            ).astype(np.float64)
            if multiplicative:
                prio_adj += PRIORITY_DOMAIN_ADJ * in_set
            else:
                score += PRIORITY_DOMAIN_WEIGHT * in_set

        if multiplicative:
            # applied to the full additive sum (first/prox/verbatim/bm25/
            # bFlags), before the document-bonus family — mirroring the
            # reference where documentBonus only feeds normalize's penalty
            score = score * np.exp(prio_adj / 5.0)
        if explain:
            # additive ?term/?org: contributions, plus (in multiplicative
            # mode) the whole exp(adj/5) rescaling delta
            _fx_take("fx_priority", score)

        # document rank bonus (calculateDocumentBonus:281-358 subset):
        # w * (255 - rank_field)/100, rank from the packed document meta
        rank_bonus_weight = plan.get("rank_bonus_weight", 0.0)
        if rank_bonus_weight > 0:
            from ..functions.metadata import decode_rank

            fi = np.searchsorted(seg.fwd_ids, cand)
            ranks = decode_rank(seg.fwd_meta[fi]).astype(np.float64)
            score += rank_bonus_weight * (255.0 - ranks) / 100.0

        # full document-bonus family (calculateDocumentBonus:281-358 with
        # PrototypeRankingParameters defaults) + the final normalize(v,p)
        # transform (IndexResultRankingService.java:155-158,690-695).
        # With normalize the score becomes LOWER-is-better; the partition
        # heap and driver merge flip to ascending via plan["ascending"].
        document_bonus_weight = plan.get("document_bonus_weight", 0.0)
        normalize = plan.get("normalize_score", False)
        if document_bonus_weight > 0 or normalize:
            from ..functions.metadata import document_bonus, normalize_score

            fi = np.searchsorted(seg.fwd_ids, cand)
            bonus = document_bonus(
                seg.fwd_meta[fi],
                sizes,
                plan.get("temporal_bias", "none"),
                features=seg.fwd_features[fi],
            )
            if document_bonus_weight > 0:
                score += document_bonus_weight * bonus
            if explain:
                # checkpoint BEFORE normalize: the normalize transform is
                # not additive, so with normalize_score on, score_r is
                # normalize(sum of fx factors, penalty) rather than the sum
                _fx_take("fx_doc_bonus", score)
            if normalize:
                score = normalize_score(score, np.maximum(0.0, -bonus))
        elif explain:
            _fx_take("fx_doc_bonus", score)  # rank_bonus_weight path

        out = self._package(seg, cand, score, plan, fx if explain else None)
        if facet_extra is not None:
            out.update(facet_extra)
        return out

    @staticmethod
    def _package(seg: "_Segment", cand: np.ndarray, score: np.ndarray,
                 plan: dict, fx: dict | None = None) -> dict:
        """Round, pick the partition's (2k+8)-deep top (ResultPriorityQueue
        2x-limit heap analog) and decorate — shared by the generic path and
        the block-max early-exit path.  ``fx`` (explain mode) adds the
        per-factor score columns + decoded documentParam.* fields."""
        k = plan["k"]
        score_r = np.round(score, 6)
        ordinals = idcodec.get_ordinal(cand)
        sort_score = score_r if plan.get("ascending") else -score_r
        top = np.lexsort((ordinals, sort_score))[: 2 * k + 8]
        fi = np.searchsorted(seg.fwd_ids, cand[top])
        out = {
            "combined_id": cand[top].tolist(),
            "score_r": score_r[top].tolist(),
            "repo": seg.dm_repo.take(pa.array(fi)).to_pylist(),
            "path": seg.dm_path.take(pa.array(fi)).to_pylist(),
            "title": seg.dm_title.take(pa.array(fi)).to_pylist(),
            "description": seg.dm_description.take(pa.array(fi)).to_pylist(),
            "data_hash": seg.dm_hash.take(pa.array(fi)).to_pylist(),
        }
        if plan.get("positions_mask"):
            out["positions_mask"] = SearcherLogic._positions_mask(
                seg, cand[top], plan["include_ids"]
            ).tolist()
        if plan.get("collect_flags"):
            out["flags_or"] = SearcherLogic._collect_flags(
                seg, cand[top], plan
            ).tolist()
        if fx is not None:
            from ..functions import metadata as mdmod

            z = np.zeros(len(cand), dtype=np.float64)
            for name in FX_SCORE_COLS:
                out[name] = np.round(fx.get(name, z)[top], 6).tolist()
            metas = seg.fwd_meta[fi]
            out["fx_rank"] = mdmod.decode_rank(metas).tolist()
            out["fx_asl"] = mdmod.decode_asl(metas).tolist()
            out["fx_quality"] = mdmod.decode_quality(metas).tolist()
            out["fx_size"] = mdmod.decode_size(metas).tolist()
            out["fx_topology"] = mdmod.decode_topology(metas).tolist()
            out["fx_year"] = (
                mdmod.PUBDATE_ENCODING_OFFSET + mdmod.decode_year_byte(metas)
            ).tolist()
        return out

    @staticmethod
    def _collect_flags(
        seg: "_Segment", docs_top: np.ndarray, plan: dict
    ) -> np.ndarray:
        """Per-result OR of the WordFlags bytes over the query's scored
        keywords (conjunction terms + OR-group members) — the data the
        search service's keywordScores loop reads (ClusteredUrlDetails
        .java:48-63).  A per-doc SYNTHETIC occurrence contributes nothing
        (isKeywordSpecial, SearchResultKeywordScore.java:26-28); ':'
        keywords never appear here because compile_query routes them to
        advice/meta terms, which are unscored."""
        from ..functions.metadata import WordFlags

        fb = np.zeros(len(docs_top), dtype=np.int64)
        terms = list(plan["include_ids"])
        for g in plan.get("group_ids") or []:
            terms.extend(g)
        if plan.get("tree") is not None:
            # nested And/Or queries keep ALL their scored keywords in the
            # tree (include/groups stay empty for non-flattenable shapes)
            def _leaves(node):
                if node[0] == "word":
                    terms.append(node[1])
                else:
                    for p in node[1]:
                        _leaves(p)

            _leaves(plan["tree"])
        for t in dict.fromkeys(terms):
            docs, flags = seg.term_flag_bytes(t)
            if not len(docs):
                continue
            ix = np.minimum(np.searchsorted(docs, docs_top), len(docs) - 1)
            present = docs[ix] == docs_top
            f = flags[ix]
            f = np.where((f & int(WordFlags.SYNTHETIC)) != 0, 0, f)
            fb |= np.where(present, f, 0)
        return fb

    @staticmethod
    def _apply_filters(seg: "_Segment", cand: np.ndarray, plan: dict,
                       plist) -> np.ndarray:
        """Candidate filters shared by the generic path and the block-max
        chunk loop: excludes, advice terms, domain range, language, size
        and meta limits.  ``plist(t, cand)`` supplies a term's doc ids
        (possibly block-pruned to the candidate set)."""
        for t in plan["exclude_ids"]:
            if len(cand) == 0:
                break
            cand = _reject(cand, plist(t, cand))
        for t in plan.get("advice_ids", []):
            # required but unscored (searchTermsAdvice semantics)
            if len(cand) == 0:
                break
            cand = _retain(cand, plist(t, cand))
        domain_range = plan.get("domain_range")
        if domain_range is not None:
            lo, hi = domain_range
            cand = cand[(cand >= lo) & (cand < hi)]
        ranges = plan.get("domain_ranges")
        if ranges is not None and len(cand):
            # domain-SET retain (SearchFilterSpec domain lists): union of
            # per-repo combined-id ranges
            m = np.zeros(len(cand), dtype=bool)
            for lo, hi in ranges:
                m |= (cand >= lo) & (cand < hi)
            cand = cand[m]
        ex_ranges = plan.get("domain_ranges_exclude")
        if ex_ranges is not None and len(cand):
            # domain-SET reject (SearchFilterSpec domainsExclude)
            m = np.zeros(len(cand), dtype=bool)
            for lo, hi in ex_ranges:
                m |= (cand >= lo) & (cand < hi)
            cand = cand[~m]
        lang = plan.get("lang")
        if lang is not None and len(cand):
            cand = _retain(cand, seg.lang_ids(lang))
        size_gt, size_lt = plan.get("size_gt"), plan.get("size_lt")
        if (size_gt is not None or size_lt is not None) and len(cand):
            # metadata param filter (ParamMatchingQueryFilter analog,
            # CombinedIndexReader.java:349-450) as a forward-index predicate
            sz = seg.doc_sizes(cand)
            mask = np.ones(len(cand), dtype=bool)
            if size_gt is not None:
                mask &= sz > size_gt
            if size_lt is not None:
                mask &= sz < size_lt
            cand = cand[mask]
        meta_limits = plan.get("meta_limits") or []
        if meta_limits and len(cand):
            # year> / rank< / q< limits on the packed document meta
            # (ParamMatchingQueryFilter.validateParameters' year/rank/
            # quality branches)
            from ..functions.metadata import decode_quality, decode_rank

            fi = np.searchsorted(seg.fwd_ids, cand)
            metas = seg.fwd_meta[fi]
            fields = {
                "year": seg.doc_years(cand),
                "rank": decode_rank(metas),
                "quality": decode_quality(metas),
            }
            mask = np.ones(len(cand), dtype=bool)
            for fname, op, val in meta_limits:
                v = fields[fname]
                if op == ">":
                    mask &= v > val
                elif op == "<":
                    mask &= v < val
                else:
                    mask &= v == val
            cand = cand[mask]
        strategy = plan.get("query_strategy")
        if strategy in QUERY_STRATEGY_FLAG and len(cand):
            cand = cand[
                SearcherLogic._strategy_mask(
                    seg, cand, plan, QUERY_STRATEGY_FLAG[strategy]
                )
            ]
        return cand

    @staticmethod
    def _strategy_mask(
        seg: "_Segment", cand: np.ndarray, plan: dict, bit: int
    ) -> np.ndarray:
        """booleanAggregate of per-keyword flag presence over the compiled
        query (meetsQueryStrategyRequirements + CompiledQueryAggregates
        booleanAggregate): every AND term must carry ``bit`` in the doc,
        each OR group needs one member, nested trees evaluate their
        And/Or structure over the same leaf predicate."""

        def has_flag(t: int) -> np.ndarray:
            docs, fl = seg.term_flag_bytes(t)
            if not len(docs):
                return np.zeros(len(cand), dtype=bool)
            ix = np.minimum(np.searchsorted(docs, cand), len(docs) - 1)
            return (docs[ix] == cand) & ((fl[ix] & bit) != 0)

        def tree_ok(node) -> np.ndarray:
            if node[0] == "word":
                return has_flag(node[1])
            parts = [tree_ok(p) for p in node[1]]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if node[0] == "and" else (out | p)
            return out

        ok = np.ones(len(cand), dtype=bool)
        for t in plan["include_ids"]:
            ok &= has_flag(t)
        for g in plan.get("group_ids") or []:
            gok = np.zeros(len(cand), dtype=bool)
            for t in g:
                gok |= has_flag(t)
            ok &= gok
        if plan.get("tree") is not None:
            ok &= tree_ok(plan["tree"])
        return ok

    @staticmethod
    def _facet_partial(seg: "_Segment", cand: np.ndarray, by: str) -> dict:
        """Per-partition facet partial: unique (key, count) pairs over the
        candidate set.  ``repo`` keys are domain ids straight out of the
        combined id (no forward lookup); ``year`` decodes the packed doc
        meta year byte the same way the meta-limit filter does."""
        if by == "repo":
            keys = idcodec.get_domain_id(cand)
        elif by == "year":
            keys = seg.doc_years(cand)
        elif by == "lang":
            # lang keys live in the per-part lang index, not the combined
            # id: one sorted-membership count per language present
            keys_l: list[str] = []
            cnt_l: list[int] = []
            for lg in seg.langs():
                c = int(_membership(cand, seg.lang_ids(lg)).sum())
                if c:
                    keys_l.append(lg)
                    cnt_l.append(c)
            return {"facet_keys": keys_l, "facet_counts": cnt_l}
        else:
            raise ValueError(f"unknown facet key {by!r}")
        uniq, cnt = np.unique(
            np.asarray(keys, dtype=np.int64), return_counts=True
        )
        return {
            "facet_keys": uniq.tolist(),
            "facet_counts": cnt.tolist(),
        }

    @staticmethod
    def _plan_scoring_is_bm25_only(plan: dict) -> bool:
        """True when the final score is EXACTLY the BM25 sum/max over the
        query terms — the quantity the block-max side index upper-bounds.
        Filters are allowed (they only remove candidates); every other
        scoring component adds positive mass the bound doesn't cover, and
        normalize flips to ascending order where upper bounds are useless."""
        return (
            not plan.get("priority_ids")
            and not plan.get("priority_domains")
            and not plan.get("positions_mask")
            and not plan.get("normalize_score")
            and not plan.get("multiplicative_priority")
            and all(
                not plan.get(w)
                for w in (
                    "first_position_weight",
                    "proximity_weight",
                    "proximity_all_weight",
                    "heading_bonus_weight",
                    "verbatim_weight",
                    "verbatim_tag_weight",
                    "flags_weight",
                    "head_tf_weight",
                    "rank_bonus_weight",
                    "document_bonus_weight",
                )
            )
        )

    @staticmethod
    def _plan_is_plain_conj(plan: dict) -> bool:
        """Plain conjunctive top-k: score = Σ include-term BM25, nothing
        else — the shape `_pruned_conj_topk` covers (N=1 is the original
        single-term BMW scan)."""
        return (
            len(plan["include_ids"]) >= 1
            and not plan.get("group_ids")
            and plan.get("tree") is None
            and not plan["phrase_ids"]
            and SearcherLogic._plan_scoring_is_bm25_only(plan)
        )

    @staticmethod
    def _plan_is_pure_or(plan: dict) -> bool:
        """Pure disjunctive top-k: score = max over ONE OR-group's present
        members' BM25 — the shape `_pruned_or_candidates` covers."""
        return (
            not plan["include_ids"]
            and len(plan.get("group_ids") or []) == 1
            and plan.get("tree") is None
            and not plan["phrase_ids"]
            and SearcherLogic._plan_scoring_is_bm25_only(plan)
        )

    def _term_global_ub(self, t: int, global_df: dict[int, int],
                        total_docs: int) -> float | None:
        """A term's global BM25 upper bound: score at the term's max tf
        and doc length 0 (BM25 is monotone decreasing in length).  Max tf
        comes from the block side index when present, else from the full
        (cached, cheap — the term is rare) decode.  None = term absent."""
        seg = self.seg
        meta = seg.block_meta(t)
        if meta is not None:
            mt = float(meta[2].max())
        else:
            _, tfs = seg.postings(t)
            if len(tfs) == 0:
                return None
            mt = float(tfs.max())
        return float(
            bm25.bm25_term_score(
                total_docs,
                global_df.get(t, 0),
                np.array([mt], dtype=np.float64),
                np.zeros(1, dtype=np.float64),
            )[0]
        )

    def _pruned_conj_topk(
        self, plan: dict, global_df: dict[int, int], total_docs: int,
        deadline: float,
    ) -> dict | None:
        """Block-max early termination for plain conjunctive top-k (the
        BMW idea, Ding & Suel SIGIR'11, on the blk_maxtf side index).
        N=1 is the single-term scan: visit blocks in upper-bound order
        (bound = BM25 at the block's max tf and doc length 0 — score is
        monotone decreasing in length, so this dominates every real score
        in the block), keep the running (2k+8)-th best actual score, and
        stop once no unvisited block's bound can reach it.  N>1 is
        block-max AND: the rarest term drives the scan; a driver block's
        bound adds every other term's global upper bound, survivors are
        the exact intersection (postings_subset retains), and their sum-
        BM25 scores are exact.  The 1e-6 margin keeps the skip safe under
        the final round(score, 6): skipped candidates land strictly below
        the k-th rounded score, so the result — including tie-breaks — is
        IDENTICAL to the exhaustive path.  Returns None when the driver
        has no block index (rare term) — caller falls through to the
        generic path."""
        import time

        seg = self.seg
        include = plan["include_ids"]
        di = min(
            range(len(include)), key=lambda i: global_df.get(include[i], 0)
        )
        t = include[di]
        others = include[:di] + include[di + 1 :]
        meta = seg.block_meta(t)
        if meta is None:
            return None
        # Σ other-term global bounds (loose but valid; a per-driver-block
        # aligned max over the other term's overlapping blocks would be
        # tighter — monotone two-pointer sweep, future work).  An absent
        # other term empties the conjunction outright.
        other_ub = 0.0
        for ot in others:
            u = self._term_global_ub(ot, global_df, total_docs)
            if u is None:
                return _empty_partition_result()
            other_ub += u
        r, bl, maxtf = meta
        nb = len(bl)
        ub = other_ub + bm25.bm25_term_score(
            total_docs,
            global_df.get(t, 0),
            maxtf.astype(np.float64),
            np.zeros(nb, dtype=np.float64),
        )
        order = np.argsort(-ub, kind="stable")
        K = 2 * plan["k"] + 8
        CHUNK = 16
        s_off = int(seg.blk_offs[r])
        _subset = lambda tt, cc: seg.postings_subset(tt, cc)[0]  # noqa: E731
        cands: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        nsurv = 0
        thr = -np.inf
        # Adaptive fallback (measured at 3.84M docs: two head terms make
        # UB-ordered chunked scanning 5.5x SLOWER than exhaustive — every
        # chunk re-probes the other terms' blocks and nothing ever skips).
        # Once the threshold exists, if it can't skip >=30% of what's
        # left, finish in ONE bulk vectorized pass: worst case becomes
        # exhaustive cost + one chunk, while effective pruning (rarer
        # drivers, selective thresholds) keeps the chunked scan.
        bulk = False
        lo = 0
        while lo < nb:
            chunk = order[lo:] if bulk else order[lo : lo + CHUNK]
            if float(ub[chunk[0]]) < thr - 1e-6:
                seg.blocks_skipped += nb - lo
                break
            if time.monotonic() > deadline and cands:
                break  # budget: partial-but-correctly-ranked, like phrases
            b = np.sort(chunk)
            seg.blocks_decoded += len(b)
            docs_c, tfs_c = seg._decode_blocks(r, s_off, bl, b)
            lo += len(chunk)
            cand_c = docs_c
            sub: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for ot in others:  # exact intersection, pruned decode
                if len(cand_c) == 0:
                    break
                sub[ot] = seg.postings_subset(ot, cand_c)
                cand_c = _retain(cand_c, sub[ot][0])
            cand_c = self._apply_filters(seg, cand_c, plan, _subset)
            if len(cand_c) == 0:
                continue
            tf = tfs_c[np.searchsorted(docs_c, cand_c)].astype(np.float64)
            sizes = seg.doc_sizes(cand_c).astype(np.float64)
            sc = bm25.bm25_term_score(total_docs, global_df.get(t, 0), tf, sizes)
            for ot in others:
                # cand_c only shrank since sub[ot] was decoded, so every
                # member is present there — gather tfs without a second
                # block decode (this alone halves other-term decode cost)
                docs_o, tfs_o = sub[ot]
                tf_o = tfs_o[np.searchsorted(docs_o, cand_c)].astype(np.float64)
                sc += bm25.bm25_term_score(
                    total_docs, global_df.get(ot, 0), tf_o, sizes
                )
            cands.append(cand_c)
            scores.append(sc)
            nsurv += len(cand_c)
            if nsurv >= K:
                allsc = np.concatenate(scores)
                thr = float(np.partition(allsc, len(allsc) - K)[len(allsc) - K])
                if not bulk and lo < nb:
                    rem = ub[order[lo:]]
                    if float(np.mean(rem < thr - 1e-6)) < 0.3:
                        bulk = True
        if not cands:
            return _empty_partition_result()
        cand = np.concatenate(cands)
        score = np.concatenate(scores)
        o = np.argsort(cand, kind="stable")
        return self._package(seg, cand[o], score[o], plan)

    def _pruned_or_candidates(
        self, plan: dict, global_df: dict[int, int], total_docs: int,
        deadline: float,
    ) -> np.ndarray | None:
        """MaxScore + block-max candidate discovery for a pure OR-group
        top-k (Turtle & Flood '95 term ordering; Ding & Suel SIGIR'11
        block bounds): process members in descending global-upper-bound
        order, decode only blocks whose bound can still reach the running
        (2k+8)-th best PER-DOC max of the exact contributions seen so
        far, and stop at the first member whose global bound can't.
        Returns a sorted doc-id superset of every document whose true
        group score can reach the partition's K-th boundary (margin 1e-6
        under the final rounding); the caller scores that set EXACTLY via
        the generic group loop, so results are identical to the
        exhaustive path.  A never-decoded doc's contributions were each
        below the threshold at skip time ≤ the final K-th score, and max
        over them stays below it.  The threshold uses only post-filter
        docs (a filtered-out high scorer must not suppress real
        candidates).  None = no member has a block index (all rare) —
        caller falls through to the full-union seed."""
        import time

        seg = self.seg
        g = plan["group_ids"][0]
        K = 2 * plan["k"] + 8
        infos: list[tuple[float, int]] = []
        any_blocks = False
        for t in g:
            u = self._term_global_ub(t, global_df, total_docs)
            if u is None:
                continue
            if seg.block_meta(t) is not None:
                any_blocks = True
            infos.append((u, t))
        if not any_blocks:
            return None
        if len(infos) == 1:
            # a single surviving member always decodes in full (the
            # threshold is -inf at its turn): discovery would walk and
            # score the whole list only to return it verbatim — the
            # exhaustive union seed is the same set for free
            return None
        infos.sort(key=lambda x: -x[0])
        _subset = lambda tt, cc: seg.postings_subset(tt, cc)[0]  # noqa: E731
        acc_d: list[np.ndarray] = []
        acc_s: list[np.ndarray] = []
        thr = -np.inf
        for i, (u, t) in enumerate(infos):
            if u < thr - 1e-6:
                # every remaining member is also below (sorted): their
                # contributions can only raise already-discovered docs
                for _, rt in infos[i:]:
                    m = seg.block_meta(rt)
                    if m is not None:
                        seg.blocks_skipped += len(m[1])
                break
            if time.monotonic() > deadline and acc_d:
                break  # budget: partial-but-correctly-ranked
            meta = seg.block_meta(t)
            if meta is None or thr == -np.inf:
                # no blocks, or nothing is skippable yet (the first
                # member always decodes in full: thr is -inf) — take /
                # seed the full-decode cache so the exact-scoring loop
                # below and later queries reuse it instead of paying a
                # second block decode (measured 1.5-2x pruned-OR
                # overhead vs exhaustive at 3.84M docs without this;
                # safe: has_blocks implies tomb is None, so no
                # tombstone mask is owed)
                docs_c, tfs_c = seg.postings(t)
            else:
                r, bl, maxtf = meta
                bub = bm25.bm25_term_score(
                    total_docs,
                    global_df.get(t, 0),
                    maxtf.astype(np.float64),
                    np.zeros(len(bl), dtype=np.float64),
                )
                cached = seg._decoded.get(t)
                if cached is not None:
                    # full list already decoded (warm segment): the
                    # competitive subset is a vectorized mask — block
                    # of doc d is searchsorted(blk_last, d), keep docs
                    # whose block bound can still reach the threshold.
                    # Identical rows to decoding exactly those blocks.
                    blkidx = np.searchsorted(bl, cached[0])
                    m = bub[blkidx] >= thr - 1e-6
                    kept = int(len(np.unique(blkidx[m])))
                    seg.blocks_decoded += kept
                    seg.blocks_skipped += len(bl) - kept
                    if not m.any():
                        continue
                    docs_c, tfs_c = cached[0][m], cached[1][m]
                else:
                    b = np.flatnonzero(bub >= thr - 1e-6)
                    seg.blocks_decoded += len(b)
                    seg.blocks_skipped += len(bl) - len(b)
                    if len(b) == 0:
                        continue
                    docs_c, tfs_c = seg._decode_blocks(
                        r, int(seg.blk_offs[r]), bl, b
                    )
                    if len(b) == len(bl) and len(seg._decoded) < 4096:
                        seg._decoded[t] = (docs_c, tfs_c)
            cand_c = self._apply_filters(seg, docs_c, plan, _subset)
            if len(cand_c) == 0:
                continue
            tf = tfs_c[np.searchsorted(docs_c, cand_c)].astype(np.float64)
            sizes = seg.doc_sizes(cand_c).astype(np.float64)
            acc_d.append(cand_c)
            acc_s.append(
                bm25.bm25_term_score(total_docs, global_df.get(t, 0), tf, sizes)
            )
            thr = _kth_group_max(acc_d, acc_s, K)
            if len(acc_d) == 1 and len(infos) > 1 and thr > -np.inf:
                # Adaptive fallback (same measured lesson as the conj
                # path): the first member just decoded in full by
                # necessity — if its threshold can't skip >=30% of the
                # remaining members' blocks, discovery would re-walk
                # every posting list only to hand the caller the same
                # full union, at ~2x exhaustive cost (measured on
                # head-term ORs at 3.84M docs).  Bail to the exhaustive
                # union seed instead: the full decode above is cache-
                # seeded, so the aborted discovery cost ~nothing.
                rem_tot = rem_skip = 0
                for _, t2 in infos[i + 1 :]:
                    m2 = seg.block_meta(t2)
                    if m2 is None:
                        continue
                    _, bl2, maxtf2 = m2
                    bub2 = bm25.bm25_term_score(
                        total_docs,
                        global_df.get(t2, 0),
                        maxtf2.astype(np.float64),
                        np.zeros(len(bl2), dtype=np.float64),
                    )
                    rem_tot += len(bl2)
                    rem_skip += int((bub2 < thr - 1e-6).sum())
                if rem_tot == 0 or rem_skip / rem_tot < 0.3:
                    # no remaining member even has a block index, or
                    # the threshold can't skip enough to pay
                    return None
        if not acc_d:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(acc_d))

    @staticmethod
    def _positions_mask(
        seg: "_Segment", ids: np.ndarray, include_ids: list[int]
    ) -> np.ndarray:
        """GUI bitmask of the full query group's intersected positions
        (calculatePositionsMask, IndexResultRankingService.java:262-278):
        for each of the first 64 intersections, bit floor(sqrt(pos)) is
        set; Java's ``1L << bit`` wraps at 64 (bit & 63) and the loop
        stops after the first bit >= 64 — both replicated.  Computed for
        the returned top candidates only."""
        n = len(ids)
        if n == 0 or not include_ids:
            return np.zeros(n, dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # adjacency needs sorted ids
        keys = _adjacency_keys(seg, ids[order], list(include_ids))
        mask_sorted = _mask_from_keys(keys, n)
        out = np.zeros(n, dtype=np.uint64)
        out[order] = mask_sorted
        return out.view(np.int64)


def _mask_from_keys(keys: np.ndarray, n: int) -> np.ndarray:
    """Vectorized Java loop of calculatePositionsMask
    (IndexResultRankingService.java:265-278) over sorted
    ``cand_idx * _POS_SHIFT + position`` keys for ``n`` candidates:
    per candidate, take the first 64 intersection starts
    (findIntersections limit), set bit ``floor(sqrt(pos))`` with Java's
    ``1L << bit`` wrap (& 63), and stop AFTER processing the first
    bit >= 64 (the ``while (... && bit < 64)`` check runs before the
    NEXT read, so the over-64 element itself is included, wrapped)."""
    masks = np.zeros(n, dtype=np.uint64)
    if len(keys) == 0:
        return masks
    cidx = keys // _POS_SHIFT
    pos = keys - cidx * _POS_SHIFT
    first = np.ones(len(keys), dtype=bool)
    first[1:] = cidx[1:] != cidx[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, len(keys)))
    r = np.arange(len(keys)) - np.repeat(starts, runs)
    bit = np.floor(np.sqrt(pos.astype(np.float64))).astype(np.int64)
    over = bit >= 64
    # positions ascend within a candidate, so 'over' is a suffix:
    # include ranks < 64 that are not past the first over-bit
    over_rank = np.where(over, r, np.iinfo(np.int64).max)
    first_over = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_over, cidx, over_rank)
    inc = (r < 64) & (r <= first_over[cidx])
    np.bitwise_or.at(
        masks,
        cidx[inc],
        np.uint64(1) << (bit[inc].astype(np.uint64) & np.uint64(63)),
    )
    return masks


def _kth_group_max(
    acc_d: list[np.ndarray], acc_s: list[np.ndarray], K: int
) -> float:
    """K-th largest PER-DOC max over accumulated (docs, scores) pairs —
    the exact MaxScore threshold.  Collapsing duplicates matters: the
    K-th of the raw concatenation OVERestimates (a doc seen in two lists
    counts twice), which would skip blocks unsafely."""
    if len(acc_d) == 1:
        # one member: docs are already unique and sorted — the per-doc
        # max IS the score vector, so skip the O(n log n) lexsort (it
        # measured ~40% of discovery cost on a 1.4M-posting head term)
        m = acc_s[0]
        if len(m) < K:
            return -np.inf
        return float(np.partition(m, len(m) - K)[len(m) - K])
    d = np.concatenate(acc_d)
    s = np.concatenate(acc_s)
    o = np.lexsort((-s, d))
    d, s = d[o], s[o]
    first = np.ones(len(d), dtype=bool)
    first[1:] = d[1:] != d[:-1]
    m = s[first]  # max per doc: first row of each (doc, -score) group
    if len(m) < K:
        return -np.inf
    return float(np.partition(m, len(m) - K)[len(m) - K])


def _empty_partition_result() -> dict:
    return {
        "combined_id": [],
        "score_r": [],
        "repo": [],
        "path": [],
        "title": [],
        "description": [],
        "data_hash": [],
        "positions_mask": [],
        "flags_or": [],
    }


def _make_searcher_actor():
    import ray

    @ray.remote
    class PartitionSearcher(SearcherLogic):
        pass

    return PartitionSearcher


@dataclass
class RankingParams:
    """Bundled ranking parameters (RpcResultRankingParameters analog,
    threaded like SearchContext.java:104,141): one object a caller
    builds once and splats into any search —
    ``idx.search(q, **params.kwargs())``."""

    first_position_weight: float = 0.0
    proximity_weight: float = 0.0
    proximity_all_weight: float = 0.0
    heading_bonus_weight: float = 0.0
    verbatim_weight: float = 0.0
    verbatim_tag_weight: float = 0.0
    flags_weight: float = 0.0
    head_tf_weight: float = 0.0
    rank_bonus_weight: float = 0.0
    document_bonus_weight: float = 0.0
    normalize_score: bool = False
    multiplicative_priority: bool = False
    temporal_bias: str = "none"
    budget_s: float = float("inf")
    pruned: bool = False

    def kwargs(self) -> dict:
        from dataclasses import asdict

        return asdict(self)


class _BatchEvaluator:
    """map_batches callable for :meth:`IndexSearch.batch_eval`.

    Each evaluator worker unpickles the DRIVER handle once in
    ``__init__`` (registry + df caches + searcher ACTOR handles — the
    index state itself stays in the shared searcher actors, loaded once
    per (segment, part), never per evaluator) and then runs the exact
    serial ``search`` path for every query in its batch.  Results are
    identical to driver-side ``search`` by construction; what
    distributes is the per-query compile / fan-out / top-k merge work
    that would otherwise serialize on the driver."""

    def __init__(self, idx_ref, k: int, search_kw: dict, max_in_flight: int):
        import ray

        self.idx = ray.get(idx_ref)
        self.k = k
        self.kw = search_kw
        self.max_in_flight = max_in_flight

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy(zero_copy_only=False).astype(np.int64)
        queries = batch["query"].to_pylist()
        tables = self.idx.search_many(
            [(q, {"k": self.k, **self.kw}) for q in queries],
            max_in_flight=self.max_in_flight,
        )
        keep = [t for t in tables if len(t)]
        rep = [
            np.full(len(t), qid, dtype=np.int64)
            for qid, t in zip(qids, tables)
            if len(t)
        ]
        res = (
            pa.concat_tables(keep) if keep else _result_table([], [], None)
        )
        qid_col = pa.array(
            np.concatenate(rep) if rep else np.array([], np.int64)
        )
        return res.add_column(0, "qid", qid_col)


class IndexSearch:
    """Driver-side handle: one searcher actor per partition; fan-out +
    merge (IndexClient.executeQueries:85-176 analog).

    ``out_dir`` may be a LIST of segment directories — a base index plus
    delta segments built by ``pipelines.delta.build_delta_index`` (oldest
    first).  Each prior segment's searchers load the tombstones + df
    corrections laid against it by later deltas, so the chain scores
    exactly like one index rebuilt over the corpus-with-replacement;
    global df / total-doc-count sum across segments the same way they sum
    across partitions."""

    @classmethod
    def from_chain(
        cls, chain_path: str, use_actors: bool = True, replicas: int = 1
    ):
        """Open whatever segment chain the pointer file currently names
        (state.manifest.publish_chain — the index-switch analog)."""
        from ..state import manifest as mf

        idx = cls(
            mf.read_chain(chain_path),
            use_actors=use_actors,
            replicas=replicas,
        )
        idx._chain_path = chain_path
        return idx

    def maybe_reload(self) -> bool:
        """StatefulIndex.switchIndex analog (StatefulIndex.java:46-96):
        re-read the pointer file this handle was opened from; if it now
        names a different chain, open the new chain and swap it in —
        the old actor set is released to Ray's reference-counted GC (the
        background close), the df caches reset with the chain.  Returns
        True iff a swap happened.  Like the reference's write-locked
        switch, this must not run concurrently with in-flight searches:
        call it from the serving loop between queries/batches."""
        from ..state import manifest as mf

        if self._chain_path is None:
            raise ValueError(
                "maybe_reload() needs a handle opened via from_chain()"
            )
        new_dirs = [
            os.path.abspath(d) for d in mf.read_chain(self._chain_path)
        ]
        with self._respawn_lock:
            if new_dirs == self.segment_dirs:
                return False
            fresh = IndexSearch(
                new_dirs,
                use_actors=self.use_actors,
                replicas=self.replicas,
            )
            for attr in (
                "out_dir",
                "segment_dirs",
                "total_docs",
                "num_parts",
                "_registry",
                "parts",
                "_seg_parts",
                "searchers",
                "_replica_sets",
                "_df_cache",
                "_prio_df_cache",
                "_repo_by_dom",
            ):
                setattr(self, attr, getattr(fresh, attr))
            if self.use_actors:
                self._actor_cls = fresh._actor_cls
            return True

    def __init__(self, out_dir, use_actors: bool = True, replicas: int = 1):
        from ..state import manifest as mf

        self._chain_path: str | None = None
        dirs = (
            [out_dir]
            if isinstance(out_dir, str)
            else [os.path.abspath(d) for d in out_dir]
        )
        self.out_dir = dirs[0]
        self.segment_dirs = dirs
        # which later deltas suppress each segment, and how many docs
        # they tombstone (delta manifests record both)
        suppress: dict[str, list[tuple[str, int]]] = {d: [] for d in dirs}
        total, tombed = 0, 0
        for d in dirs:
            total += int(mf.read_manifest(d, "root")["n_docs"])
        for k, dk in enumerate(dirs[1:], start=1):
            # read-side chain validation (mirrors build_delta_index's
            # write-side guard): suppression matches priors by their
            # RECORDED build-time abspaths, so a relocated tree, a
            # reordered chain, or an uncommitted delta would otherwise
            # silently serve stale tombstoned documents as duplicates
            if not mf.is_committed(dk, "delta"):
                raise ValueError(
                    f"segment {dk} has no committed delta phase — it is "
                    "not a finished delta; rebuild it or drop it from "
                    "the chain"
                )
            dman = mf.read_manifest(dk, "delta")
            rec = [os.path.abspath(d) for d in dman.get("prior_dirs", [])]
            if rec != dirs[:k]:
                raise ValueError(
                    f"segment chain mismatch: {dk} was built against "
                    f"{rec}, but the chain lists {dirs[:k]} before it "
                    "(segments must be opened under their build-time "
                    "paths, oldest first)"
                )
            for j, prior in enumerate(rec):
                suppress[prior].append((dk, j))
                tombed += int(dman.get("tombstones", {}).get(prior, 0))
        self.total_docs = total - tombed
        self.num_parts = mf.read_manifest(dirs[0], "root")["num_parts"]
        # the LAST segment's registry is the superset (append-only chain)
        reg = pq.read_table(os.path.join(dirs[-1], "registry.parquet"))
        self._registry = {
            r["repo"]: (r["domain_id"], r["rank"], r["part"])
            for r in reg.to_pylist()
        }
        seg_parts = [
            (d, p, tuple(suppress[d]))
            for d in dirs
            for p in range(self.num_parts)
            if os.path.isdir(os.path.join(d, "postings", f"part={p}"))
        ]
        self.parts = [p for _d, p, _s in seg_parts]
        self._seg_parts = seg_parts
        self.use_actors = use_actors
        # guards the self.searchers list when concurrent search_many
        # threads hit _respawn_dead at the same time
        self._respawn_lock = threading.Lock()
        # term df / prio-df are immutable for an open segment chain, so
        # the driver caches them exactly: repeat terms (zipf-hot in real
        # query streams) skip the whole phase-1 fan-out, halving warm
        # query round trips.  Plain dict ops are GIL-atomic — safe under
        # search_many threads.
        self._df_cache: dict[int, int] = {}
        self._prio_df_cache: dict[int, int] = {}
        # domain id -> repo name, inverted once per open chain (the
        # registry is immutable like the df caches) for repo-facet merges
        self._repo_by_dom = {
            int(d): rname for rname, (d, _rk, _p) in self._registry.items()
        }
        # read replicas: R identical actors per (segment, part), queries
        # round-robin across them per fan-out.  A partition actor is
        # single-threaded, so a FIXED pool caps serving throughput at
        # num_parts CPUs of scoring no matter how many clients pile on;
        # replicas are how a read-heavy deployment scales QPS with the
        # cluster instead of with the partition count.  Segments are
        # immutable, so replicas need no coordination — results are
        # identical whichever replica answers.
        self.replicas = max(1, int(replicas))
        if use_actors:
            self._actor_cls = _make_searcher_actor()
            self._replica_sets = [
                [
                    self._actor_cls.remote(d, p, s)
                    for _ in range(self.replicas)
                ]
                for d, p, s in seg_parts
            ]
            self.searchers = [rs[0] for rs in self._replica_sets]
        else:
            self.searchers = [SearcherLogic(d, p, s) for d, p, s in seg_parts]
            self._replica_sets = [[s] for s in self.searchers]
        self._rr = itertools.count()

    def __getstate__(self):
        """Pickle support for shipping the handle into Ray workers
        (batch_eval).  Only the actor-backed form travels: the handle is
        then registry + caches + actor HANDLES (small); a local
        (use_actors=False) handle holds every segment's decoded arrays
        in-process and must never ride a task argument."""
        if not self.use_actors:
            raise TypeError(
                "IndexSearch(use_actors=False) holds full in-process "
                "segment state and cannot be pickled; open the chain "
                "with use_actors=True to ship the handle to workers"
            )
        d = self.__dict__.copy()
        d["_respawn_lock"] = None
        d["_actor_cls"] = None  # regenerated on unpickle
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._respawn_lock = threading.Lock()
        self._actor_cls = _make_searcher_actor()

    def batch_eval(
        self,
        queries_ds,
        k: int = 10,
        eval_concurrency: int = 2,
        eval_batch_size: int = 32,
        max_in_flight: int = 8,
        **kw,
    ):
        """Batched query evaluation as a Ray Dataset — SURVEY §3.2's own
        Ray-Data shape for the reference-query-set evaluator
        (IndexClient.executeQueries fan-out,
        code/index/api/java/.../IndexClient.java:85-176, made
        data-parallel).

        ``queries_ds`` is a Dataset with columns ``(qid: int64,
        query: string)``; the result is a Dataset with one row per
        (query, result doc): ``qid`` + the serial ``search()`` result
        columns.  Each evaluator worker in the ``map_batches`` actor
        pool shares THIS handle's searcher actor pool — index state
        loads once per (segment, part) actor regardless of evaluator
        count — and runs the exact serial search path per query, so
        per-query results are identical to ``search()`` by
        construction.  At reference-set scale (thousands of queries)
        the compile / fan-out / merge work that ``search_many``
        serializes on the driver streams through the evaluator pool
        with backpressure instead."""
        if not self.use_actors:
            raise ValueError(
                "batch_eval needs use_actors=True (evaluator workers "
                "share the searcher actor pool)"
            )
        import ray

        # ship the handle ONCE via the object store; each evaluator
        # worker reads it in __init__, not per batch
        idx_ref = ray.put(self)
        return queries_ds.map_batches(
            _BatchEvaluator,
            fn_constructor_args=(idx_ref, k, dict(kw), max_in_flight),
            batch_format="pyarrow",
            batch_size=eval_batch_size,
            concurrency=eval_concurrency,
        )

    def _respawn_dead(self) -> int:
        """Replace searcher actors that died (node loss / OOM kill) with
        fresh ones over the same immutable segment files — serving keeps
        answering after partial failure instead of erroring the query.
        All probes fire first and share ONE timeout window: with hundreds
        of (segment, part) actors, serial 60 s probes would stall a
        failover by minutes."""
        import ray

        with self._respawn_lock:
            return self._respawn_dead_locked(ray)

    def _respawn_dead_locked(self, ray) -> int:
        flat = [
            (i, j, a)
            for i, rs in enumerate(self._replica_sets)
            for j, a in enumerate(rs)
        ]
        refs = [a.local_df.remote([]) for _i, _j, a in flat]
        replaced = 0
        ready, _ = ray.wait(
            refs, num_returns=len(refs), timeout=60, fetch_local=False
        )
        ready_set = set(ready)
        for (i, j, _a), ref in zip(flat, refs):
            if ref not in ready_set:
                # slow but alive (cold segment load, saturated node) —
                # leave it; the retried fan-out will wait normally
                continue
            try:
                ray.get(ref)
            except ray.exceptions.RayActorError:
                fresh = self._actor_cls.remote(*self._seg_parts[i])
                self._replica_sets[i][j] = fresh
                if j == 0:
                    self.searchers[i] = fresh
                replaced += 1
        return replaced

    def _call(self, method: str, *args):
        if self.use_actors:
            import ray

            if self.replicas > 1:
                # per-fan-out round-robin: segments are immutable, so
                # any replica gives the identical answer; next() on an
                # itertools counter is GIL-atomic under search_many
                # threads
                r = next(self._rr)
                targets = [rs[r % len(rs)] for rs in self._replica_sets]
            else:
                targets = self.searchers
            try:
                return ray.get(
                    [getattr(s, method).remote(*args) for s in targets]
                )
            except ray.exceptions.RayActorError:
                self._respawn_dead()
                return ray.get(
                    [getattr(s, method).remote(*args) for s in self.searchers]
                )
        return [getattr(s, method)(*args) for s in self.searchers]

    def search(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        domain_cap: int | None = None,
        dedup_by_hash: bool = False,
        decorate: bool = False,
        first_position_weight: float = 0.0,
        proximity_weight: float = 0.0,
        proximity_all_weight: float = 0.0,
        heading_bonus_weight: float = 0.0,
        positions_mask: bool = False,
        verbatim_weight: float = 0.0,
        verbatim_tag_weight: float = 0.0,
        flags_weight: float = 0.0,
        head_tf_weight: float = 0.0,
        rank_bonus_weight: float = 0.0,
        document_bonus_weight: float = 0.0,
        normalize_score: bool = False,
        multiplicative_priority: bool = False,
        temporal_bias: str = "none",
        expand: bool = False,
        expand_plural: bool = False,
        expand_category: bool = False,
        expand_wordnum: bool = False,
        expand_ngram_all: bool = False,
        budget_s: float = float("inf"),
        pruned: bool = False,
        filter_spec: dict | None = None,
        count_only: bool = False,
        facet: str | None = None,
        facet_k: int = 20,
        facet_with: str | None = None,
        explain: bool = False,
        collect_flags: bool = False,
        query_strategy: str = "AUTO",
        positions_render: bool = False,
        search_sets: "dict[str, list[str]] | None" = None,
        nsfw_tier: int = 0,
        nsfw_blocklists: "dict[int, list[str]] | None" = None,
    ) -> "pa.Table | tuple[pa.Table, pa.Table]":
        """Fan-out + merge.  ``domain_cap`` limits results per repo
        (ResultPriorityQueue.limitByDomain analog, IndexQueryExecution
        :159-178); ``dedup_by_hash`` drops later results with a seen
        sha256 (ResultConverter dataHash dedup, :512-524); ``decorate``
        adds repo/path/title/description/data_hash columns (docdb
        decoration join).  Returns a (results, facets) tuple when
        ``facet_with`` is set."""
        # the rendered positions string (UrlDetails.positions) is a pure
        # driver-side view of the mask
        if positions_render:
            positions_mask = True
        # validate facet keys on the DRIVER, before any fan-out or
        # candidate enumeration — a typo'd key from a serve-loop request
        # must not crash partition actors mid-query
        for val in (facet, facet_with):
            if val is not None and val not in _FACET_KEYS:
                raise ValueError(
                    f"unknown facet key {val!r}; expected one of "
                    f"{_FACET_KEYS}"
                )
        cq = compile_query(
            query,
            expand=expand,
            expand_plural=expand_plural,
            expand_category=expand_category,
            expand_wordnum=expand_wordnum,
            expand_ngram_all=expand_ngram_all,
        )
        # a query with NO ranking terms: a bare repo: query first gains
        # the site:<repo> dummy keyword so the domain's documents can be
        # enumerated (QueryFactory.java:141-147 "Ensure we can enumerate
        # documents from a website"), then advice terms PROMOTE to
        # scored query terms (SearchQuery.promoteNonRankingTerms:218-226)
        if not cq.include and not cq.groups and cq.tree is None:
            if cq.repo is not None and not cq.advice:
                cq.advice.append(f"site:{cq.repo}")
            if cq.advice:
                cq.include = list(cq.advice)
                cq.advice = []

        # NSFW filter tiers (NsfwDomainFilter.isBlocked:64-74): tier 0
        # disables; a tier-T query blocks the union of every blocklist
        # at level <= T.  Blocklists are repo sets (the reference's
        # downloaded domain lists resolved to ids) folded into the
        # filter-spec domain rejection.
        if nsfw_tier and nsfw_blocklists:
            blocked = sorted(
                {
                    r
                    for t, lst in nsfw_blocklists.items()
                    if nsfw_tier >= int(t)
                    for r in lst
                }
            )
            if blocked:
                fs = dict(filter_spec or {})
                fs["repos_exclude"] = sorted(
                    set(fs.get("repos_exclude", [])) | set(blocked)
                )
                filter_spec = fs

        # qs= token in the query string wins over the call parameter
        # (QueryParser's QsTerm lands in the spec the same way); validate
        # on the driver, before any fan-out
        strategy = (cq.query_strategy or query_strategy or "AUTO").upper()
        if strategy not in QUERY_STRATEGIES:
            raise ValueError(
                f"unknown query strategy {strategy!r}; expected one of "
                f"{QUERY_STRATEGIES}"
            )
        # set:<name> token: resolve the user search set and fold it into
        # the filter-spec repo restriction (SearchSetsService semantics:
        # NONE/blank = any set, unknown name = error)
        if cq.search_set and cq.search_set != "NONE":
            sets = search_sets or {}
            if cq.search_set not in sets:
                raise ValueError(f"Unknown search set {cq.search_set!r}")
            set_repos = list(sets[cq.search_set])
            fs = dict(filter_spec or {})
            if "repos" in fs:
                # both a spec repo list and a set: both must hold
                fs["repos"] = sorted(set(fs["repos"]) & set(set_repos))
            else:
                fs["repos"] = set_repos
            filter_spec = fs

        domain_range = None
        if cq.repo is not None:
            ent = self._registry.get(cq.repo)
            if ent is None:
                return _empty_search_result(count_only, facet, facet_with)
            dom, rank, _part = ent
            domain_range = idcodec.domain_id_range(int(rank), int(dom))

        plan = {
            "include_ids": cq.include_ids,
            "exclude_ids": cq.exclude_ids,
            "advice_ids": cq.advice_ids,
            "priority_ids": cq.priority_ids,
            "group_ids": cq.group_ids(),
            "phrase_ids": cq.phrase_ids(),
            "tree": cq.tree_ids(),
            "domain_range": domain_range,
            "lang": cq.lang,
            "size_gt": cq.size_gt,
            "size_lt": cq.size_lt,
            "meta_limits": cq.meta_limits,
            "first_position_weight": first_position_weight,
            "proximity_weight": proximity_weight,
            "proximity_all_weight": proximity_all_weight,
            "heading_bonus_weight": heading_bonus_weight,
            "positions_mask": positions_mask,
            # per-result OR of non-SYNTHETIC query-keyword flag bytes
            # (the keywordScores surface the result clusterer reads)
            "collect_flags": collect_flags,
            # REQUIRE_FIELD_* flag-presence filtering (qs= token /
            # meetsQueryStrategyRequirements)
            "query_strategy": strategy,
            "verbatim_weight": verbatim_weight,
            "verbatim_tag_weight": verbatim_tag_weight,
            "flags_weight": flags_weight,
            "head_tf_weight": head_tf_weight,
            "rank_bonus_weight": rank_bonus_weight,
            "document_bonus_weight": document_bonus_weight,
            "normalize_score": normalize_score,
            "multiplicative_priority": multiplicative_priority,
            "temporal_bias": temporal_bias,
            "ascending": normalize_score,  # normalize => lower is better
            "budget_s": budget_s,
            # block-max pruned execution (exact; requires a v10+ index
            # with blk_* side columns — silently exhaustive otherwise)
            "pruned": pruned,
            # combined results+facets in one fan-out; forces exhaustive
            # candidates partition-side (pruned disabled there)
            "facet_with": facet_with,
            # ranking-factor breakdown (DebugRankingFactors analog):
            # fx_* score-component + documentParam columns on each result
            "explain": explain,
            # partitions return enough headroom for pagination
            # (IndexClient.executeQueries sort + sublist, :162-173)
            "k": k + offset,
        }
        if filter_spec:
            # user-defined search-filter spec composed ONTO the query
            # (SearchFilterSpec/SearchFilterParser analog,
            # code/functions/search-query/.../searchfilter/): required
            # terms join the conjunction (scored like query terms),
            # excluded terms reject, promoted terms boost like ?terms,
            # and a repo list restricts candidates to the union of those
            # domains' combined-id ranges.
            plan["include_ids"] = plan["include_ids"] + [
                hash_nearly_ascii(t) for t in filter_spec.get("require", [])
            ]
            plan["exclude_ids"] = plan["exclude_ids"] + [
                hash_nearly_ascii(t) for t in filter_spec.get("exclude", [])
            ]
            promote = filter_spec.get("promote", [])
            plan["priority_ids"] = plan["priority_ids"] + [
                hash_nearly_ascii(t) for t in promote
            ]
            amounts = filter_spec.get("promote_amounts")
            if amounts:
                # aligned with "promote": each term's promotion weight
                plan["priority_weight_by_id"] = {
                    **(plan.get("priority_weight_by_id") or {}),
                    **{
                        hash_nearly_ascii(t): float(a)
                        for t, a in zip(promote, amounts)
                    },
                }
            repos = filter_spec.get("repos")
            if repos is not None:
                ranges = []
                for r in repos:
                    ent = self._registry.get(r)
                    if ent is not None:
                        dom, rank, _part = ent
                        ranges.append(
                            idcodec.domain_id_range(int(rank), int(dom))
                        )
                if not ranges:
                    return _empty_search_result(
                        count_only, facet, facet_with
                    )
                plan["domain_ranges"] = ranges
            repos_ex = filter_spec.get("repos_exclude")
            if repos_ex:
                # domainsExclude: reject the union of those repos' ranges
                ex_ranges = []
                for r in repos_ex:
                    ent = self._registry.get(r)
                    if ent is not None:
                        dom, rank, _part = ent
                        ex_ranges.append(
                            idcodec.domain_id_range(int(rank), int(dom))
                        )
                if ex_ranges:
                    plan["domain_ranges_exclude"] = ex_ranges
            promo_repos = filter_spec.get("promote_repos")
            if promo_repos:
                # domainsPromote: exact repo names join the
                # priority-domain set (?org: uses prefixes; specs list
                # full names)
                plan["priority_domains"] = sorted(
                    {
                        int(self._registry[r][0])
                        for r in promo_repos
                        if r in self._registry
                    }
                )

        if cq.priority_orgs:
            plan["priority_domains"] = sorted(
                set(plan.get("priority_domains") or [])
                | {
                    d
                    for r, (d, _rk, _p) in self._registry.items()
                    if any(r.startswith(o) for o in cq.priority_orgs)
                }
            )
        if flags_weight > 0:
            pmissing = [
                t
                for t in set(plan["include_ids"])
                if t not in self._prio_df_cache
            ]
            if pmissing:
                pdfs = self._call("local_prio_df", pmissing)
                for t in pmissing:
                    self._prio_df_cache[t] = sum(d.get(t, 0) for d in pdfs)
            plan["prio_df"] = {
                t: self._prio_df_cache[t] for t in plan["include_ids"]
            }

        # ngram segmentation (QueryExpansion.createSegments / NgramLexicon
        # analog, ST2): when the corpus actually contains an identifier
        # joining a WINDOW of adjacent query terms (df > 0 for any of
        # a_b/ab/a-b/a.b forms), replace each term of the window with an
        # OR-group over [term, joined-variants] so `parse tree` also
        # matches parse_tree and `fast table scan` matches
        # fast_table_scan.  Windows probe longest-first (the reference
        # scans segment lengths 2..min(10, n); we cap probes at 4)
        if expand and len(cq.include) >= 2:
            inc = cq.include
            windows: list[tuple[str, ...]] = []
            for win_len in range(min(4, len(inc)), 1, -1):
                for i in range(len(inc) - win_len + 1):
                    windows.append(tuple(inc[i : i + win_len]))
            cands = {
                w: [s.join(w) for s in ("_", "", "-", ".")] for w in windows
            }
            cand_terms = sorted({t for v in cands.values() for t in v})
            cand_ids = {t: hash_nearly_ascii(t) for t in cand_terms}
            probe_missing = [
                i for i in cand_ids.values() if i not in self._df_cache
            ]
            if probe_missing:
                dfs0 = self._call("local_df", probe_missing)
                for i in probe_missing:
                    self._df_cache[i] = sum(d.get(i, 0) for d in dfs0)
            joined_df = {t: self._df_cache[i] for t, i in cand_ids.items()}
            consumed: set[str] = set()
            for w, variants in cands.items():
                live = [v for v in variants if joined_df.get(v, 0) > 0]
                if not live or any(t in consumed for t in w):
                    continue
                consumed.update(w)
                for t in w:
                    plan["group_ids"].append(
                        [hash_nearly_ascii(t)]
                        + [hash_nearly_ascii(v) for v in live]
                    )
            if consumed:
                keep_ids = [
                    i
                    for t, i in zip(cq.include, cq.include_ids)
                    if t not in consumed
                ]
                # preserve ids appended by filter_spec 'require' (they
                # are not part of cq.include and no window consumed them)
                extra = set(plan["include_ids"]) - set(cq.include_ids)
                plan["include_ids"] = keep_ids + [
                    i for i in plan["include_ids"] if i in extra
                ]

        # phase 1: global df = sum of per-partition dfs (driver-cached —
        # dfs are immutable for an open chain, so warm terms skip the
        # fan-out entirely)
        all_ids = (
            plan["include_ids"]
            + plan["exclude_ids"]
            + plan["priority_ids"]
            + [t for g in plan["group_ids"] for t in g]
            + [t for p in plan["phrase_ids"] for t in p]
            + (tree_words(plan["tree"]) if plan["tree"] is not None else [])
        )
        missing = [t for t in set(all_ids) if t not in self._df_cache]
        if missing:
            dfs = self._call("local_df", missing)
            for t in missing:
                self._df_cache[t] = sum(d.get(t, 0) for d in dfs)
        global_df = {t: self._df_cache[t] for t in all_ids}

        # phase 2: scatter, merge per-partition (2k+8)-deep results
        if count_only:
            plan["count_only"] = True
            counts = self._call("search", plan, global_df, self.total_docs)
            total = sum(int(r.get("match_count", 0)) for r in counts)
            return pa.table({"n": pa.array([total], pa.int64())})
        if facet is not None:
            # facet counting: per-partition (key, count) partials summed on
            # the driver (domain ids never leave as raw candidates), repo
            # keys resolved to names via the broadcast registry; ordering
            # is n DESC then key ASC, truncated to facet_k.
            plan["facet"] = facet
            partials = self._call("search", plan, global_df, self.total_docs)
            return self._merge_facet_partials(partials, facet, facet_k)
        results = self._call("search", plan, global_df, self.total_docs)
        ids = np.concatenate(
            [np.asarray(r["combined_id"], dtype=np.int64) for r in results]
        )
        scores = np.concatenate(
            [np.asarray(r["score_r"], dtype=np.float64) for r in results]
        )
        deco_cols = ["repo", "path", "title", "description", "data_hash"]
        if positions_mask:
            deco_cols.append("positions_mask")
        if collect_flags:
            deco_cols.append("flags_or")
        deco = {col: sum((r[col] for r in results), []) for col in deco_cols}
        if explain:
            # empty partitions short-circuit before _package and carry no
            # fx keys — but also no combined_ids, so .get stays aligned
            for nm in FX_SCORE_COLS + FX_PARAM_COLS:
                deco[nm] = sum((r.get(nm, []) for r in results), [])
        ordinals = idcodec.get_ordinal(ids)
        order = np.lexsort((ordinals, scores if normalize_score else -scores))

        keep: list[int] = []
        seen_hashes: set[str] = set()
        domain_counts: dict[int, int] = {}
        domains = idcodec.get_domain_id(ids)
        for j in order:
            j = int(j)
            if dedup_by_hash:
                h = deco["data_hash"][j]
                if h in seen_hashes:
                    continue
            if domain_cap is not None:
                d = int(domains[j])
                if domain_counts.get(d, 0) >= domain_cap:
                    continue
            keep.append(j)
            if dedup_by_hash:
                seen_hashes.add(deco["data_hash"][j])
            if domain_cap is not None:
                domain_counts[d] = domain_counts.get(d, 0) + 1
            if len(keep) == offset + k:
                break
        keep = keep[offset:]

        out_cols: dict[str, list] = {}
        if decorate:
            for col in ("repo", "path", "title", "description", "data_hash"):
                out_cols[col] = [deco[col][j] for j in keep]
        if positions_mask:
            out_cols["positions_mask"] = [
                int(deco["positions_mask"][j]) for j in keep
            ]
        if collect_flags:
            out_cols["flags_or"] = [int(deco["flags_or"][j]) for j in keep]
        if positions_render:
            # braille punch-card view of the mask (UrlDetails.positions,
            # SearchOperator.createDetails:252 printBits(mask, 64))
            from ..functions.bbpc import print_bits

            out_cols["positions"] = [
                print_bits(int(deco["positions_mask"][j])) for j in keep
            ]
        if explain:
            for nm in FX_SCORE_COLS:
                out_cols[nm] = [float(deco[nm][j]) for j in keep]
            for nm in FX_PARAM_COLS:
                out_cols[nm] = [int(deco[nm][j]) for j in keep]
        res = _result_table(
            [int(ids[j]) for j in keep],
            [float(scores[j]) for j in keep],
            out_cols or None,
        )
        if facet_with is not None:
            return res, self._merge_facet_partials(
                results, facet_with, facet_k
            )
        return res

    def count(self, query: str, **kw) -> int:
        """Total matching documents (no scoring, exhaustive candidates)."""
        return int(self.search(query, count_only=True, **kw)["n"][0].as_py())

    def search_clustered(
        self,
        query: str,
        k: int = 100,
        domain_cap: int = 5,
        total: int = 25,
        score_limit_cap: float = 4.0,
        **kw,
    ) -> pa.Table:
        """Search-service result post-processing: the full
        retrieve → deduplicate → cluster-by-domain display pipeline.

        Faithful to SearchOperator.getResultsFromQuery
        (code/services-application/search-service/.../SearchOperator
        .java:191-215) with the reference's defaultLimits
        (resultsTotal=100, resultsByDomain=5), UrlDeduplicator
        (results/UrlDeduplicator.java:29-68) and
        SearchResultClusterer.byDomain + the ClusteredUrlDetails
        sibling prune (SearchResultClusterer.java:38-52,
        ClusteredUrlDetails.java:29-66):

        * retention order — the reference pre-sorts by an https/raw-IP
          preference before deduplicating; the code corpus has no URL
          scheme, so retention order equals presentation order (score
          ascending under normalized scoring, then combined id);
        * superficial dedup — first sighting of a (path, title) pair
          survives, later ones are removed (Objects.hash(path, title)
          set membership, deduplicateOnSuperficialHash);
        * content-hash dedup — exact sha256 stand-in for the EasyLSH
          near-match walk (dataHash here IS the exact content hash,
          mirroring the engine-wide D2 contract);
        * per-domain cap — the count increments for every result that
          reaches the check, kept or not (adjustOrPutValue semantics);
        * clustering — results grouped by repo; cluster order is the
          best member's presentation order; at most ``total`` clusters;
        * sibling prune — a non-first member survives iff its
          normalized score exceeds min(score_limit_cap, best * 1.25)
          (i.e. it is NOT a near-tie of the cluster's best) or one of
          its non-SYNTHETIC query keywords carries a protecting
          WordFlag.  The protecting set is Title | Subjects | UrlPath |
          UrlDomain: the reference also lists ExternalLink, but that
          flag's bit (1 << 8) overflows the byte-wide flags field in
          Java exactly as it does here, so the check can never fire.

        Returns one row per displayed member:
        (cluster_rank, member_rank, repo, doc_id, score_r), member_rank
        1 being the cluster's "first" result.
        """
        from ..functions.metadata import WordFlags

        protect = int(
            WordFlags.TITLE
            | WordFlags.SUBJECTS
            | WordFlags.URL_PATH
            | WordFlags.URL_DOMAIN
        )
        # site-focused queries: the reference lifts the per-domain cap
        # (QueryFactory.java:170-175 sets resultsByDomain=resultsTotal
        # when a site: domain is present) and the clusterer degrades to
        # noOp — one cluster per result (SearchResultClusterer.
        # selectStrategy:19-24)
        no_cluster = compile_query(query).repo is not None
        if no_cluster:
            domain_cap = k
        tbl = self.search(
            query,
            k=k,
            normalize_score=True,
            decorate=True,
            collect_flags=True,
            **kw,
        )
        if tbl.num_rows == 0:
            # covers the early-return empty shapes too (repo: miss /
            # empty filter_spec repo set), which carry no deco columns
            return _cluster_table([])
        paths = tbl["path"].to_pylist()
        titles = tbl["title"].to_pylist()
        hashes = tbl["data_hash"].to_pylist()
        repos = tbl["repo"].to_pylist()
        doc_ids = tbl["doc_id"].to_pylist()
        scores = tbl["score_r"].to_pylist()
        flags = tbl["flags_or"].to_pylist()

        # UrlDeduplicator, in the reference's exact check order: each
        # check registers its key the moment a result REACHES it, so a
        # result dropped late still blocks/advances the earlier sets
        seen_urls: set[tuple[str, str]] = set()
        seen_hashes: set[str] = set()
        dom_count: dict[str, int] = {}
        kept: list[int] = []
        for i in range(tbl.num_rows):
            url_key = (paths[i], titles[i])
            if url_key in seen_urls:
                continue
            seen_urls.add(url_key)
            if hashes[i] in seen_hashes:
                continue
            seen_hashes.add(hashes[i])
            c = dom_count.get(repos[i], 0) + 1
            dom_count[repos[i]] = c
            if c > domain_cap:
                continue
            kept.append(i)
        kept = kept[:k]  # .limit(resultsTotal) — no-op unless dedup grew

        if no_cluster:
            # noOp strategy: every kept result is its own cluster, in
            # presentation order (ClusteredUrlDetails(onlyFirst)) — noOp
            # ignores the cluster total (SearchResultClusterer:27-34)
            return _cluster_table(
                [
                    (ci, 1, repos[i], doc_ids[i], scores[i])
                    for ci, i in enumerate(kept, start=1)
                ]
            )

        # byDomain clustering: first-occurrence order of repos IS the
        # best-member order because ``kept`` is presentation-sorted
        clusters: dict[str, list[int]] = {}
        repo_order: list[str] = []
        for i in kept:
            if repos[i] not in clusters:
                clusters[repos[i]] = []
                repo_order.append(repos[i])
            clusters[repos[i]].append(i)

        rows: list[tuple[int, int, str, int, float]] = []
        for crank, r in enumerate(repo_order[:total], start=1):
            members = clusters[r]
            best = scores[members[0]]
            score_limit = min(score_limit_cap, best * 1.25)
            shown = [members[0]]
            for i in members[1:]:
                if scores[i] > score_limit or (flags[i] & protect):
                    shown.append(i)
            for mrank, i in enumerate(shown, start=1):
                rows.append((crank, mrank, r, doc_ids[i], scores[i]))

        return _cluster_table(rows)

    def crosstalk(self, domain_a: str, domain_b: str, k: int = 100) -> pa.Table:
        """Bidirectional link search between two domains — the crosstalk
        view (SearchCrosstalkService.crosstalk:66-84: doLinkSearch A->B
        and B->A over the links: keyword index).  One row per
        (direction, result document), direction in {a_to_b, b_to_a}."""
        a2b = self.search(f"repo:{domain_a} links:{domain_b}", k=k)
        b2a = self.search(f"repo:{domain_b} links:{domain_a}", k=k)
        return pa.table(
            {
                "direction": pa.array(
                    ["a_to_b"] * a2b.num_rows + ["b_to_a"] * b2a.num_rows,
                    pa.string(),
                ),
                "doc_id": pa.concat_arrays(
                    [
                        a2b["doc_id"].combine_chunks(),
                        b2a["doc_id"].combine_chunks(),
                    ]
                ),
                "score_r": pa.concat_arrays(
                    [
                        a2b["score_r"].combine_chunks(),
                        b2a["score_r"].combine_chunks(),
                    ]
                ),
            }
        )

    def subscription_feed(
        self, repos: list[str], k: int = 100
    ) -> pa.Table:
        """Newest-segment documents of the subscribed domains — the
        front page's "new from your subscriptions" data read
        (SearchFrontPageService:59-80 over the
        SearchSiteSubscriptionService cookie set; the RSS-fetch side is
        out of scope per the north rule, the INDEX side of "recently
        indexed" is the newest delta segment's document set).

        Reads ONLY the newest segment's journal, column-pruned to the
        display fields with the repo filter pushed into the scan.
        Returns (repo, doc_id, path, title), doc-id ordered, LIMIT k."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        newest = self.segment_dirs[-1]
        t = pads.dataset(os.path.join(newest, "journal")).to_table(
            columns=["repo", "combined_id", "path", "title"],
            filter=pc.field("repo").isin(pa.array(sorted(repos))),
        )
        ords = idcodec.get_ordinal(
            t["combined_id"].to_numpy(zero_copy_only=False)
        )
        order = np.argsort(ords)[:k]
        t = t.take(pa.array(order))
        return pa.table(
            {
                "repo": t["repo"],
                "doc_id": pa.array(ords[order], pa.int64()),
                "path": t["path"],
                "title": t["title"],
            }
        )

    def _merge_facet_partials(
        self, partials: list[dict], facet: str, facet_k: int
    ) -> pa.Table:
        """Sum per-partition (key, count) facet partials, resolve repo
        names via the registry, order n DESC then key ASC, cut to k."""
        agg: dict = {}
        for r in partials:
            for key, c in zip(
                r.get("facet_keys", ()), r.get("facet_counts", ())
            ):
                agg[key] = agg.get(key, 0) + int(c)
        if facet == "repo":
            inv = self._repo_by_dom
            named = [(inv.get(int(d), str(d)), n) for d, n in agg.items()]
        else:
            named = list(agg.items())
        named.sort(key=lambda kv: (-kv[1], kv[0]))
        return _facet_table(facet, named[: max(0, facet_k)])

    def search_with_facets(
        self,
        query: str,
        by: str = "repo",
        k: int = 10,
        facet_k: int = 20,
        **kw,
    ) -> tuple[pa.Table, pa.Table]:
        """Top-k results AND full-match-set facet counts from ONE fan-out
        (the reference's count-while-collecting shape generalized): each
        partition piggybacks its (key, count) facet partial on the top-k
        pass, so the candidate enumeration happens once instead of twice.
        Identical to calling search() + facets() separately (pytest);
        block-max pruning is disabled for the call since facets need the
        exhaustive candidate set."""
        return self.search(query, k=k, facet_with=by, facet_k=facet_k, **kw)

    def facets(self, query: str, by: str = "repo", k: int = 20, **kw) -> pa.Table:
        """Counts of ALL matching documents grouped by a per-doc key
        (``repo``, ``year`` or ``lang``) — the per-domain result counting of
        IndexQueryExecution:159-178 generalized to a full-match-set
        facet.  Exhaustive candidates, no scoring; exact over delta
        chains (tombstoned docs are already filtered at decode).

        Scale note: partials are pre-aggregated (key, count) pairs, so
        the driver merge is O(#distinct keys) — the same order as the
        driver-held domain registry, not the match count.  ``year`` and
        ``lang`` key spaces are trivially small."""
        return self.search(query, facet=by, facet_k=k, **kw)

    def search_many(
        self,
        queries: list[str | tuple[str, dict]],
        max_in_flight: int = 8,
    ) -> list[pa.Table]:
        """Serve a batch of queries with up to ``max_in_flight`` queries
        in flight at once (the reference's maxSimultaneousQueries=8
        semaphore, IndexQueryExecution.java:55-56).

        Each query still runs the exact serial ``search`` path — results
        are identical by construction — but while one query's driver-side
        merge or df round-trip is in progress, the partition actors are
        already working the next query's fan-out, so the pool never sits
        idle between queries.  Each element is either a query string or a
        ``(query, kwargs)`` tuple; results come back in input order."""
        from concurrent.futures import ThreadPoolExecutor

        def one(q):
            if isinstance(q, str):
                return self.search(q)
            s, kw = q
            return self.search(s, **kw)

        if max_in_flight <= 1 or len(queries) <= 1:
            return [one(q) for q in queries]
        with ThreadPoolExecutor(max_workers=max_in_flight) as ex:
            return list(ex.map(one, queries))

    def shutdown(self):
        if self.use_actors:
            import ray

            for rs in self._replica_sets:
                for s in rs:
                    ray.kill(s)
        self.searchers = []
        self._replica_sets = []


_FACET_KEYS = ("repo", "year", "lang")


def _empty_search_result(
    count_only: bool, facet: str | None, facet_with: str | None
):
    """The zero-match result in whatever shape the call asked for —
    shared by every early-return site in IndexSearch.search."""
    if facet is not None:
        return _facet_table(facet, [])
    if facet_with is not None:
        return _result_table([], [], None), _facet_table(facet_with, [])
    if count_only:
        return pa.table({"n": pa.array([0], pa.int64())})
    return _result_table([], [], None)


def _facet_table(by: str, rows: list[tuple]) -> pa.Table:
    """(key, n) rows -> the facet result table; ``repo``/``lang`` keys
    are strings, ``year`` is int64."""
    key_col = (
        pa.array([r[0] for r in rows], pa.string())
        if by in ("repo", "lang")
        else pa.array([int(r[0]) for r in rows], pa.int64())
    )
    return pa.table(
        {by: key_col, "n": pa.array([int(r[1]) for r in rows], pa.int64())}
    )


def _cluster_table(rows) -> pa.Table:
    """(cluster_rank, member_rank, repo, doc_id, score_r) rows -> the
    clustered-display result table (shared by the byDomain, noOp and
    empty paths of IndexSearch.search_clustered)."""
    return pa.table(
        {
            "cluster_rank": pa.array([r[0] for r in rows], pa.int64()),
            "member_rank": pa.array([r[1] for r in rows], pa.int64()),
            "repo": pa.array([r[2] for r in rows], pa.string()),
            "doc_id": pa.array([r[3] for r in rows], pa.int64()),
            "score_r": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def _result_table(
    ids: list[int], scores: list[float], deco: dict | None
) -> pa.Table:
    ords = [int(i) & idcodec.DOCORD_MASK for i in ids]
    cols = {
        "doc_id": pa.array(ords, pa.int64()),
        "combined_id": pa.array(ids, pa.int64()),
        "score_r": pa.array(scores, pa.float64()),
    }
    if deco is not None:
        for col in ("repo", "path", "title", "description", "data_hash"):
            if col in deco:
                cols[col] = pa.array(deco[col], pa.string())
        if "positions_mask" in deco:
            cols["positions_mask"] = pa.array(deco["positions_mask"], pa.int64())
        if "flags_or" in deco:
            cols["flags_or"] = pa.array(deco["flags_or"], pa.int64())
        if "positions" in deco:
            cols["positions"] = pa.array(deco["positions"], pa.string())
        for col in FX_SCORE_COLS:
            if col in deco:
                cols[col] = pa.array(deco[col], pa.float64())
        for col in FX_PARAM_COLS:
            if col in deco:
                cols[col] = pa.array(deco[col], pa.int64())
    return pa.table(cols)
