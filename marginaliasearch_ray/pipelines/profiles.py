"""Search-filter specs and named search profiles.

Reference: the user-extension filter system of the search-query
function — SearchFilterParser (code/functions/search-query/java/nu/
marginalia/functions/searchquery/searchfilter/SearchFilterParser.java:
21-310) parses declarative XML filter specs (terms-require/-exclude/
-promote, domains-include/-exclude/-promote, search-set, year/size/
quality/rank limits, temporal-bias, query-strategy) with hard count
constraints; SearchProfile (services-application/search-service/.../
SearchProfile.java:8-48) maps UI filter ids to the built-in specs
shipped as resources/filters/*.xml.

The built-in profile XML payloads below reproduce the reference's
filter resources verbatim (they are behavior-defining data, like the
BM25 constants): filters whose required keywords exist on this corpus
(generator:docs / generator:wiki) filter for real; the others
(special:tilde, category:food, …) parse and apply faithfully and
simply match nothing here, exactly as they would on an index without
those keywords.  Note small-web.xml carries a ``type`` limit the
reference parser itself never reads (parseSpecificationLimit only
extracts year/size/quality/rank) — replicated: unknown limit params
are ignored.

``apply_spec`` translates a parsed spec into IndexSearch.search
arguments: require terms join the query string (colon keywords route
through the certified advice-prefix parsing; plain words become scored
conjunction terms via the filter-spec require path), excludes/promotes
hash literally through filter_spec, domain lists map to combined-id
range retains/rejects, search-set names resolve through a caller-
provided ``search_sets`` mapping (the reference resolves them against
its SearchSetsService), limits map to the meta/size filters, temporal
bias enables the document-bonus family, and query-strategy passes
through.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

MAX_TERM_COUNT = 6
MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT = 4
MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT = 25
MAX_WILDCARD_DOMAIN_COUNT = 4
MAX_SPECIFIC_DOMAIN_COUNT = 25
MAX_PROMOTE_DOMAIN_COUNT = 6


class SearchFilterParserException(ValueError):
    pass


@dataclass
class SearchFilterSpec:
    user_id: str = "SYSTEM"
    identifier: str = ""
    domains_include: list[str] = field(default_factory=list)
    domains_exclude: list[str] = field(default_factory=list)
    domains_promote: list[tuple[str, float]] = field(default_factory=list)
    search_set: str = "NONE"
    terms_require: list[str] = field(default_factory=list)
    terms_exclude: list[str] = field(default_factory=list)
    terms_promote: list[tuple[str, float]] = field(default_factory=list)
    # each limit: (op, value) with op in {"=", "<", ">"} or None
    year: tuple[str, int] | None = None
    size: tuple[str, int] | None = None
    quality: tuple[str, int] | None = None
    rank: tuple[str, int] | None = None
    temporal_bias: str = "NONE"
    query_strategy: str = "AUTO"


_OP = {"eq": "=", "lt": "<", "gt": ">"}


def _content_list(root, tag: str) -> list[str]:
    """Whitespace-split, lowercased tag contents
    (extractContentList:305-314)."""
    out: list[str] = []
    for el in root.iter(tag):
        for item in (el.text or "").split():
            if item.strip():
                out.append(item.lower())
    return out


def _promote_list(root, tag: str) -> list[tuple[str, float]]:
    out: list[tuple[str, float]] = []
    for el in root.iter(tag):
        amt = float(el.get("amount", "1"))
        for item in (el.text or "").split():
            if item.strip():
                out.append((item.lower(), amt))
    return out


def parse_filter(
    xml_text: str, user_id: str = "SYSTEM", identifier: str = ""
) -> SearchFilterSpec:
    """SearchFilterParser.parse (:142-256), including the validation
    constraints and the search-set/domains-include exclusivity rule."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as ex:
        raise SearchFilterParserException(f"Technical parser error: {ex}")
    if root.tag != "filter":
        # ElementTree parses ONE document element; a non-filter root is
        # the "missing filter tag" case
        raise SearchFilterParserException("Missing filter tag")

    spec = SearchFilterSpec(user_id=user_id, identifier=identifier)
    spec.domains_include = _content_list(root, "domains-include")
    spec.domains_exclude = _content_list(root, "domains-exclude")
    spec.domains_promote = _promote_list(root, "domains-promote")
    spec.terms_require = _content_list(root, "terms-require")
    spec.terms_exclude = _content_list(root, "terms-exclude")
    spec.terms_promote = _promote_list(root, "terms-promote")

    sets = [el for el in root.iter("search-set")]
    if len(sets) > 1:
        raise SearchFilterParserException("Multiple search-set tags")
    if sets:
        spec.search_set = (sets[0].text or "").strip() or "NONE"
    if spec.search_set != "NONE" and spec.domains_include:
        raise SearchFilterParserException(
            "Search set identifier and domainLists can not both be specified"
        )

    for el in root.iter("limit"):
        param = el.get("param", "")
        typ = el.get("type", "none")
        if param not in ("year", "size", "quality", "rank"):
            continue  # the reference only reads these four (incl. 'type')
        if typ == "none":
            continue
        if typ not in _OP:
            raise SearchFilterParserException(f"Unknown limit type {typ!r}")
        setattr(spec, param, (_OP[typ], int(el.get("value", "0"))))

    biases = [el for el in root.iter("temporal-bias")]
    if len(biases) > 1:
        raise SearchFilterParserException("Expected 0 or 1 temporal-bias tags")
    if biases:
        val = (biases[0].text or "").strip().upper()
        if val not in ("RECENT", "OLD", "NONE"):
            raise SearchFilterParserException("Unknown temporal bias value")
        spec.temporal_bias = val

    qs = [el for el in root.iter("query-strategy")]
    if len(qs) > 1:
        raise SearchFilterParserException(
            "Expected 0 or 1 query-strategy tags"
        )
    if qs:
        from .query import QUERY_STRATEGIES

        val = (qs[0].text or "").strip().upper()
        if val not in QUERY_STRATEGIES:
            raise SearchFilterParserException("Unknown query strategy value")
        spec.query_strategy = val

    validate_constraints(spec)
    return spec


def validate_constraints(spec: SearchFilterSpec) -> None:
    """validateConstraints (:258-279)."""
    if len(spec.terms_require) > MAX_TERM_COUNT:
        raise SearchFilterParserException(
            f"Too many term requirements, will allow at most {MAX_TERM_COUNT}"
        )
    if len(spec.terms_exclude) > MAX_TERM_COUNT:
        raise SearchFilterParserException(
            f"Too many term exclusions, will allow at most {MAX_TERM_COUNT}"
        )
    if len(spec.terms_promote) > MAX_TERM_COUNT:
        raise SearchFilterParserException(
            f"Too many weighted terms, will allow at most {MAX_TERM_COUNT}"
        )
    if len(spec.domains_promote) > MAX_PROMOTE_DOMAIN_COUNT:
        raise SearchFilterParserException(
            "Too many promoted domains, will allow at most "
            f"{MAX_PROMOTE_DOMAIN_COUNT}"
        )

    def wild(lst):
        return sum(1 for d in lst if d.startswith("*."))

    def spec_(lst):
        return sum(1 for d in lst if not d.startswith("*."))

    if wild(spec.domains_exclude) > MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT:
        raise SearchFilterParserException(
            "Too many wildcard domain exclusions, will allow at most "
            f"{MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT}"
        )
    if spec_(spec.domains_exclude) > MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT:
        raise SearchFilterParserException(
            "Too many domain exclusions, will allow at most "
            f"{MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT}"
        )
    if wild(spec.domains_include) > MAX_WILDCARD_DOMAIN_COUNT:
        raise SearchFilterParserException(
            "Too many wildcard domain requirements, will allow at most "
            f"{MAX_WILDCARD_DOMAIN_COUNT}"
        )
    if spec_(spec.domains_include) > MAX_SPECIFIC_DOMAIN_COUNT:
        raise SearchFilterParserException(
            "Too many domain requirements, will allow at most "
            f"{MAX_SPECIFIC_DOMAIN_COUNT}"
        )


def render_to_xml(spec: SearchFilterSpec) -> str:
    """renderToXml (:51-127) — the parse round-trip surface."""
    lines = ['<?xml version="1.0"?>', "<filter>"]
    if spec.terms_require:
        lines.append("\t<terms-require>")
        lines.extend(f"\t\t{t}" for t in spec.terms_require)
        lines.append("\t</terms-require>")
    if spec.terms_exclude:
        lines.append("\t<terms-exclude>")
        lines.extend(f"\t\t{t}" for t in spec.terms_exclude)
        lines.append("\t</terms-exclude>")
    for t, amt in spec.terms_promote:
        lines.append(f'\t<terms-promote amount="{amt:.1f}">{t}</terms-promote>')
    if spec.domains_include:
        lines.append("\t<domains-include>")
        lines.extend(f"\t\t{d}" for d in spec.domains_include)
        lines.append("\t</domains-include>")
    if spec.domains_exclude:
        lines.append("\t<domains-exclude>")
        lines.extend(f"\t\t{d}" for d in spec.domains_exclude)
        lines.append("\t</domains-exclude>")
    for d, amt in spec.domains_promote:
        lines.append(
            f'\t<domains-promote amount="{amt:.1f}">{d}</domains-promote>'
        )
    rev_op = {"=": "eq", "<": "lt", ">": "gt"}
    for nm in ("size", "year", "quality", "rank"):
        lim = getattr(spec, nm)
        if lim is not None:
            lines.append(
                f'\t<limit param="{nm}" type="{rev_op[lim[0]]}"'
                f' value="{lim[1]}" />'
            )
    if spec.search_set not in ("", "NONE"):
        lines.append(f"\t<search-set>{spec.search_set}</search-set>")
    if spec.temporal_bias not in ("", "NONE"):
        lines.append(
            f"\t<temporal-bias>{spec.temporal_bias}</temporal-bias>"
        )
    if spec.query_strategy != "AUTO":
        lines.append(
            f"\t<query-strategy>{spec.query_strategy}</query-strategy>"
        )
    lines.append("</filter>")
    return "\n".join(lines) + "\n"


# Built-in profile filters: filterId (SearchProfile.java:8-22) -> the
# verbatim resources/filters/*.xml payload
PROFILE_FILTERS: dict[str, str] = {
    "default": '<?xml version="1.0"?>\n<filter>\n'
               "    <search-set>POPULAR</search-set>\n</filter>",
    "corpo": '<?xml version="1.0"?>\n<filter>\n</filter>',
    "modern": '<?xml version="1.0"?>\n<filter>\n'
              "    <search-set>SMALLWEB</search-set>\n"
              '    <limit param="size" type="lt" value="500"/>\n'
              '    <limit param="type" type="lt" value="5" />\n'
              '    <limit param="year" type="gt" value="2015"/>\n</filter>',
    "blogosphere": '<?xml version="1.0"?>\n<filter>\n'
                   "    <search-set>BLOGS</search-set>\n</filter>",
    "vintage": '<?xml version="1.0"?>\n<filter>\n'
               '    <terms-promote amount="1">format:html123</terms-promote>\n'
               '    <terms-promote amount="1">js:false</terms-promote>\n'
               "    <temporal-bias>OLD</temporal-bias>\n"
               '    <limit param="year" type="lt" value="2003"/>\n</filter>',
    "tilde": '<?xml version="1.0"?>\n<filter>\n'
             "    <terms-require>special:tilde</terms-require>\n</filter>",
    "academia": '<?xml version="1.0"?>\n<filter>\n'
                "    <terms-require>special:academia</terms-require>\n"
                "</filter>",
    "plain-text": '<?xml version="1.0"?>\n<filter>\n'
                  "    <terms-require>format:plain</terms-require>\n"
                  "</filter>",
    "food": '<?xml version="1.0"?>\n<filter>\n'
            "    <terms-require>category:food</terms-require>\n"
            "    <terms-exclude>special:ads</terms-exclude>\n</filter>",
    "forum": '<?xml version="1.0"?>\n<filter>\n'
             "    <terms-require>generator:forum</terms-require>\n</filter>",
    "wiki": '<?xml version="1.0"?>\n<filter>\n'
            "    <terms-require>generator:wiki</terms-require>\n</filter>",
    "docs": '<?xml version="1.0"?>\n<filter>\n'
            "    <terms-require>generator:docs</terms-require>\n</filter>",
}


def get_search_profile(param: str | None) -> str:
    """SearchProfile.getSearchProfile (:35-47): unknown / null ids fall
    back to NO_FILTER ('corpo')."""
    if param in PROFILE_FILTERS:
        return param
    return "corpo"


def apply_spec(
    index,
    query: str,
    spec: SearchFilterSpec,
    *,
    search_sets: dict[str, list[str]] | None = None,
    **kw,
):
    """Compose a parsed spec onto a query and run it.

    ``search_sets``: search-set name -> repo list (the SearchSetsService
    resolution the reference does index-side).  An unresolvable set name
    raises — a filter naming a set the deployment doesn't have is a
    config error, not an empty result.

    Require-term routing: terms with an advice prefix (generator:,
    format:, …) ride the parser's advisory path — required but
    unscored, exactly the reference's require().  Other colon keywords
    (special:/category:) and plain words join the scored conjunction
    (the engine-wide filter-spec require contract certified by
    bm25_filter_spec); the candidate set is identical either way, and
    for keywords the corpus does not carry the two are fully
    indistinguishable."""
    q = query
    fs: dict = {}
    for t in spec.terms_require:
        if ":" in t:
            # colon keywords ride the certified advice-prefix parsing
            q += f" {t}"
        else:
            fs.setdefault("require", []).append(t)
    if spec.terms_exclude:
        fs["exclude"] = list(spec.terms_exclude)
    if spec.terms_promote:
        fs["promote"] = [t for t, _amt in spec.terms_promote]
    if spec.domains_include:
        fs["repos"] = _expand_domains(index, spec.domains_include)
    if spec.domains_exclude:
        fs["repos_exclude"] = _expand_domains(index, spec.domains_exclude)
    if spec.domains_promote:
        fs["promote_repos"] = [d for d, _amt in spec.domains_promote]
    if spec.search_set != "NONE":
        sets = search_sets or {}
        if spec.search_set not in sets:
            raise ValueError(
                f"unresolvable search set {spec.search_set!r}; "
                f"known: {sorted(sets)}"
            )
        fs["repos"] = list(sets[spec.search_set])

    # every limit rides the certified query-token path (year</size</q<…)
    for nm in ("year", "quality", "rank", "size"):
        lim = getattr(spec, nm)
        if lim is not None:
            if nm == "size" and lim[0] == "=":
                raise ValueError("size limit supports lt/gt only")
            q += f" {'q' if nm == 'quality' else nm}{lim[0]}{lim[1]}"
    if spec.temporal_bias in ("RECENT", "OLD"):
        kw.setdefault("temporal_bias", spec.temporal_bias.lower())
        kw.setdefault("document_bonus_weight", 1.0)
    if spec.query_strategy != "AUTO":
        kw.setdefault("query_strategy", spec.query_strategy)
    if fs:
        kw["filter_spec"] = fs
    return index.search(q, **kw)


def _expand_domains(index, domains: list[str]) -> list[str]:
    """Exact names pass through; a ``*.org`` wildcard matches every
    registry repo whose org part equals the suffix (the reference's
    subdomain wildcard, mapped to the org/repo naming of this corpus)."""
    out: list[str] = []
    known = list(getattr(index, "_registry", {}) or {})
    for d in domains:
        if d.startswith("*."):
            suffix = d[2:]
            out.extend(
                r for r in known if r.split("/", 1)[0] == suffix
            )
        else:
            out.append(d)
    return out


class FilterStore:
    """Per-(user, name) saved-filter store — SearchFilterStore
    (searchfilter/SearchFilterStore.java:23-180) with the SEARCH_FILTER
    table replaced by a directory of XML files (one per user/name,
    atomically replaced on save; the reference's REPLACE INTO).

    Semantics preserved: ``get_filter`` returns the PARSED spec or None
    (an unparseable stored definition reads as absent, like the
    reference's logged-and-empty path); ``get_filter_definition``
    returns the raw XML; saves go through the parser first so an
    invalid filter never lands; ``load_default_configs`` seeds the
    SYSTEM user with every built-in profile payload."""

    SYSTEM_USER_ID = "SYSTEM"

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, user_id: str, name: str) -> str:
        import hashlib
        import os

        key = hashlib.sha256(f"{user_id}\x00{name}".encode()).hexdigest()[:24]
        return os.path.join(self.root, f"{key}.xml")

    def _meta_path(self, user_id: str) -> str:
        import hashlib
        import os

        key = hashlib.sha256(user_id.encode()).hexdigest()[:24]
        return os.path.join(self.root, f"user_{key}.names")

    def save_filter(self, user_id: str, name: str, xml: str) -> None:
        import os

        parse_filter(xml, user_id=user_id, identifier=name)  # validate
        tmp = self._path(user_id, name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(xml)
        os.replace(tmp, self._path(user_id, name))
        names = set(self.get_filter_ids(user_id))
        if name not in names:
            names.add(name)
            tmp = self._meta_path(user_id) + ".tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(sorted(names)))
            os.replace(tmp, self._meta_path(user_id))

    def get_filter_definition(self, user_id: str, name: str) -> str | None:
        import os

        p = self._path(user_id, name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    def get_filter(self, user_id: str, name: str) -> SearchFilterSpec | None:
        xml = self.get_filter_definition(user_id, name)
        if xml is None:
            return None
        try:
            return parse_filter(xml, user_id=user_id, identifier=name)
        except SearchFilterParserException:
            return None  # stored-but-unparseable reads as absent

    def get_filter_ids(self, user_id: str) -> list[str]:
        import os

        p = self._meta_path(user_id)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [ln for ln in f.read().splitlines() if ln]

    def load_default_configs(self) -> None:
        """Seed the SYSTEM user with the built-in profiles
        (loadDefaultConfigs:34-54)."""
        for pid, xml in PROFILE_FILTERS.items():
            self.save_filter(self.SYSTEM_USER_ID, pid, xml)


def search_with_profile(
    index,
    query: str,
    profile: str,
    *,
    search_sets: dict[str, list[str]] | None = None,
    **kw,
):
    """SearchProfile lookup + filter application in one call — the
    doSearch(userParams.asFilterSpec()) path for built-in profiles."""
    spec = parse_filter(
        PROFILE_FILTERS[get_search_profile(profile)],
        identifier=get_search_profile(profile),
    )
    return apply_spec(index, query, spec, search_sets=search_sets, **kw)
