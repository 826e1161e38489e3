"""Website adjacencies: co-citation domain similarity + the
similar-domains read API.

Re-expresses the reference's adjacency export process and the service
that reads its output (all paths under ``/root/reference/code/``):

- ``processes/export-task-process/java/nu/marginalia/adjacencies/
  AdjacenciesData.java:38-81`` — for every link (source, dest) the
  dest's *incident-source vector* ``dToS[dest] = {dest} ∪ {sources}``
  (``createBitmapWithSelf``), kept only while its cardinality stays
  below 10 000 (``isEligible:77-81`` — the hub cap), plus the inverted
  ``sToD[source] = {source} ∪ {dests}`` map used for candidate
  generation (``getCandidates:24-36``).
- ``WebsiteAdjacenciesCalculator.java:65-125`` — for every domain whose
  vector has cardinality >= 10 (``cardinalityExceeds`` is ``>=``,
  ``SparseBitVector.java:139-141``), scan the candidates sharing at
  least one member, drop candidates below ``cardMin = max(2,
  (int)(0.01 * |vec|))``, gate on the unweighted cosine ``|a∩b| /
  sqrt(|a|) / sqrt(|b|) > 0.1`` (:69-74), score with the weighted
  cosine ``Σ_{v∈a∩b} w[v] / sqrt(Σ_{v∈a} w[v] · Σ_{v∈b} w[v]) > 0.1``
  where ``w[v] = 1/ln(2 + |dToS[v]|)`` for eligible dests and 0
  otherwise (``AdjacenciesData.getWeights:102-115``,
  ``SparseBitVector.weightedProduct:163-198`` / ``mulAndSum:250-256``),
  and keep the 128 highest-valued neighbours (:118-121).
- ``AdjacenciesLoader.java:35-94`` — the output contract: rows
  (DOMAIN_ID, NEIGHBOR_ID, RELATEDNESS) swapped in as one atomic table
  (TMP + rename), both directions present when both qualify (the
  cardMin filter is asymmetric).
- ``DomainAliases.java:27-39`` — edge endpoints are de-aliased before
  vectors are built; aliased ids never become query domains.
- ``functions/domain-info/java/nu/marginalia/functions/domains/
  SimilarDomainsService.java`` — the read side: relatedness stored as
  ``Math.round(100 * value)`` keyed on the unordered index pair when
  `` > 0.1`` (:109-118), rank displayed as ``Math.round(100 *
  (1 - RANK))`` (:145), ``getSimilarDomains:240-311`` (sort relatedness
  desc / id asc, LIMIT, then drop >32-char names and the
  ``shouldRemove`` rows), ``getLinkingDomains:350-427`` (rank desc /
  relatedness desc / linkiness desc / id asc), link direction via
  ``SimilarDomain.LinkType.find`` (``SimilarDomain.java:44-54`` —
  FOWARD [sic] = this domain links out, BACKWARD = linked from).

Ray-Data-first decomposition: the quadratic candidate scan becomes a
*by-member pair decomposition* — a member (source) contained in the
vectors of k dests contributes partial rows for its k·(k-1)/2 unordered
dest pairs, so ``|a∩b|`` and the weighted product arrive from ONE
``groupby(member)`` + pair fan-out + ``groupby(pair)`` sum, with no
per-domain Python scan and no all-pairs materialization.  This is
exactly the candidate structure the reference exploits (``sToD`` IS the
by-member inverted map); total pair-partial volume is
``Σ_v |sToD[v]|²`` versus the reference's per-domain candidate scans —
the same skew profile.  Like the reference, a super-hub *source* is
unbounded (only dest in-cardinality is capped); ``max_member_fanout``
adds an optional beyond-reference degrade (skip the member's pair
fan-out) with ``strict_exact`` raising loudly instead, mirroring
``textops.STOP_SHINGLE_DF``.  Per-domain cardinalities / weights /
norms are the domain-cardinality small side, broadcast via ``ray.put``
as aligned sorted arrays (the same in-RAM-domain-table assumption the
reference's one-process calculator makes, and that ``ranking.py``
documents); every per-batch lookup is a vectorized ``searchsorted``.

Determinism divergence (documented): Java's top-128 cut and the two
service sorts break exact-value ties in hash-iteration order; both this
module and the SQL oracles pin ties to neighbour-name ascending on the
6-decimal-rounded value.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_VECTOR_CARDINALITY = 10_000  # AdjacenciesData.isEligible:77-81
MIN_QUERY_CARDINALITY = 10  # WebsiteAdjacenciesCalculator.java:87
SIMILARITY_THRESHOLD = 0.1  # WebsiteAdjacenciesCalculator.java:108-110
MAX_NEIGHBORS = 128  # WebsiteAdjacenciesCalculator.java:118-121
MAX_NAME_LENGTH = 32  # SimilarDomainsService.java:286,402


def _lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray,
            default: float = 0.0) -> np.ndarray:
    """Vectorized dict lookup: ``keys`` sorted, returns ``vals`` aligned
    with ``probe`` (``default`` where absent)."""
    if len(keys) == 0:
        return np.full(len(probe), default, dtype=vals.dtype)
    pos = np.searchsorted(keys, probe)
    pos = np.minimum(pos, len(keys) - 1)
    hit = keys[pos] == probe
    out = np.full(len(probe), default, dtype=vals.dtype)
    out[hit] = vals[pos[hit]]
    return out


def domain_neighbors(
    links,
    *,
    aliases: dict[str, str] | None = None,
    min_card: int = MIN_QUERY_CARDINALITY,
    max_card: int = MAX_VECTOR_CARDINALITY,
    threshold: float = SIMILARITY_THRESHOLD,
    top_n: int = MAX_NEIGHBORS,
    max_member_fanout: int | None = None,
    strict_exact: bool = False,
):
    """The EC_DOMAIN_NEIGHBORS_2 table as a Dataset: rows
    ``(domain, neighbor, relatedness)`` — for each query domain with an
    incident-source vector of >= ``min_card`` members, its up-to-
    ``top_n`` co-citation-cosine neighbours above ``threshold``.

    ``links``: Dataset or pyarrow Table with ``src``/``dst`` string
    columns (e.g. ``ranking.link_edges`` output; ``weight`` is ignored
    — the reference's bitmaps are set-semantics).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    if isinstance(links, pa.Table):
        links = ray.data.from_arrow(links)
    aliases = dict(aliases or {})
    alias_ref = ray.put(aliases)

    def _member_rows(batch: pa.Table) -> pa.Table:
        al = ray.get(alias_ref)
        src = batch["src"].combine_chunks() if isinstance(
            batch["src"], pa.ChunkedArray) else batch["src"]
        dst = batch["dst"].combine_chunks() if isinstance(
            batch["dst"], pa.ChunkedArray) else batch["dst"]
        if al:  # DomainAliases.deAlias on both endpoints
            src = pa.array(
                [al.get(v, v) for v in src.to_pylist()], pa.string())
            dst = pa.array(
                [al.get(v, v) for v in dst.to_pylist()], pa.string())
        keep = pc.invert(pc.equal(src, dst))  # de-aliased self-links drop
        s = src.filter(keep)
        d = dst.filter(keep)
        # member rows: every (dest, source) edge plus the dest-self row
        return pa.table(
            {
                "dom": pa.concat_arrays([d, d]),
                "member": pa.concat_arrays([s, d]),
            }
        )

    mem = (
        links.select_columns(["src", "dst"])
        .map_batches(_member_rows, batch_format="pyarrow")
        .groupby(["dom", "member"])
        .count()  # distinct (dom, member): bitmap set semantics
        .select_columns(["dom", "member"])
        # consumed three times below (cardinality rollup, weight+norm
        # rollup, pair fan-out) — cache the distinct shuffle once
        # instead of re-running the links scan + groupby per consumer
        .materialize()
    )

    # per-domain cardinality / eligibility / weight / norm — the
    # domain-cardinality small side, broadcast as sorted aligned arrays
    # (the reference holds the same tables in its calculator's RAM)
    card_rows = mem.groupby("dom").count().take_all()
    card_keys = np.array(sorted(str(r["dom"]) for r in card_rows))
    cmap = {str(r["dom"]): int(r["count()"]) for r in card_rows}
    card_vals = np.array([cmap[k] for k in card_keys], dtype=np.int64)
    elig = card_vals < max_card
    w_vals = np.where(elig, 1.0 / np.log(2 + card_vals), 0.0)
    side_ref = ray.put((card_keys, card_vals, elig, w_vals))

    def _with_weight(batch: pa.Table) -> pa.Table:
        keys, _cards, el, wv = ray.get(side_ref)
        doms = np.asarray(batch["dom"].to_pylist(), dtype=object)
        mems = np.asarray(batch["member"].to_pylist(), dtype=object)
        dom_elig = _lookup(keys, el.astype(np.float64), doms) > 0.0
        sub_doms = doms[dom_elig]
        sub_mems = mems[dom_elig]
        wt = _lookup(keys, wv, sub_mems)  # ineligible member -> 0.0
        return pa.table(
            {
                "dom": pa.array(sub_doms.tolist(), pa.string()),
                "member": pa.array(sub_mems.tolist(), pa.string()),
                "wt": pa.array(wt, pa.float64()),
            }
        )

    # cached too: consumed by the norm rollup and again by the pair
    # fan-out below
    mem_w = mem.map_batches(
        _with_weight, batch_format="pyarrow"
    ).materialize()
    norm_rows = mem_w.groupby("dom").aggregate(
        Sum("wt", alias_name="nrm")
    ).take_all()
    nmap = {str(r["dom"]): float(r["nrm"]) for r in norm_rows}
    norm_vals = np.array([nmap.get(k, 0.0) for k in card_keys])
    side2_ref = ray.put((card_keys, card_vals, norm_vals))

    empty_pairs = pa.table(
        {
            "da": pa.array([], pa.string()),
            "db": pa.array([], pa.string()),
            "wt": pa.array([], pa.float64()),
        }
    )

    def _pair_partials(group: pa.Table) -> pa.Table:
        # rows are distinct (dom, member): doms are already unique
        doms = np.sort(np.asarray(group["dom"].to_pylist(), dtype=object))
        n = len(doms)
        if n < 2:
            return empty_pairs
        if max_member_fanout is not None and n > max_member_fanout:
            member = group["member"][0].as_py()
            if strict_exact:
                raise RuntimeError(
                    f"member {member!r} is contained in {n} vectors "
                    f"(> max_member_fanout={max_member_fanout}); exact "
                    "adjacency would fan out O(n^2) pairs here. Raise "
                    "the cap or accept the degraded mode."
                )
            return empty_pairs  # degrade: drop this hub's contributions
        wt = float(group["wt"][0].as_py())
        i, j = np.triu_indices(n, k=1)
        return pa.table(
            {
                "da": pa.array(doms[i].tolist(), pa.string()),
                "db": pa.array(doms[j].tolist(), pa.string()),
                "wt": pa.array(np.full(len(i), wt), pa.float64()),
            }
        )

    pairs = (
        mem_w.groupby("member")
        .map_groups(_pair_partials, batch_format="pyarrow")
        .groupby(["da", "db"])
        .aggregate(Count(alias_name="andc"), Sum("wt", alias_name="wprod"))
    )

    def _score(batch: pa.Table) -> pa.Table:
        keys, cards, norms = ray.get(side2_ref)
        da = np.asarray(batch["da"].to_pylist(), dtype=object)
        db = np.asarray(batch["db"].to_pylist(), dtype=object)
        andc = batch["andc"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        wprod = batch["wprod"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        ca = _lookup(keys, cards.astype(np.float64), da)
        cb = _lookup(keys, cards.astype(np.float64), db)
        na = _lookup(keys, norms, da)
        nb = _lookup(keys, norms, db)
        # weighted cosine — the same expression shape as
        # expensiveCosineSimilarity (one sqrt over the norm product)
        val = wprod / np.sqrt(na * nb)
        out_d, out_n, out_v = [], [], []
        for q, t, cq, ct in ((da, db, ca, cb), (db, da, cb, ca)):
            keep = (
                (cq >= min_card)
                # Java cardMin: max(2, (int)(0.01 * card)) — truncating
                & (ct >= np.maximum(2, (0.01 * cq).astype(np.int64)))
                # cheap gate, same division order as cosineSimilarity
                & ((andc / np.sqrt(cq)) / np.sqrt(ct) > threshold)
                & (val > threshold)
            )
            out_d.append(q[keep])
            out_n.append(t[keep])
            out_v.append(val[keep])
        return pa.table(
            {
                "domain": pa.array(
                    np.concatenate(out_d).tolist(), pa.string()),
                "neighbor": pa.array(
                    np.concatenate(out_n).tolist(), pa.string()),
                "relatedness": pa.array(
                    np.concatenate(out_v), pa.float64()),
            }
        )

    scored = pairs.map_batches(_score, batch_format="pyarrow")

    def _topn(group: pa.Table) -> pa.Table:
        if group.num_rows <= top_n:
            return group
        vals = np.round(group["relatedness"].to_numpy(), 6)
        names = np.asarray(group["neighbor"].to_pylist(), dtype=object)
        order = np.lexsort((names, -vals))  # value desc, name asc tie pin
        return group.take(order[:top_n])

    return scored.groupby("domain").map_groups(_topn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimilarDomainsService read API (driver-side over the small neighbor
# table + domain link graph, mirroring the reference service's in-RAM
# maps)


def _as_table(obj, empty_schema: dict) -> pa.Table:
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        batches = list(obj.iter_batches(batch_format="pyarrow"))
        if not batches:
            return pa.table(empty_schema)
        return pa.concat_tables(batches)
    return obj


def _relatedness_map(neighbors: pa.Table) -> dict[tuple[str, str], float]:
    """(lower, higher) name pair -> Math.round(100 * value), stored only
    when > 0.1 (SimilarDomainsService.java:109-118; Java Math.round is
    floor(x + 0.5) on the positive axis)."""
    rel: dict[tuple[str, str], float] = {}
    for d, n, v in zip(
        neighbors["domain"].to_pylist(),
        neighbors["neighbor"].to_pylist(),
        neighbors["relatedness"].to_pylist(),
    ):
        r = float(math.floor(100.0 * float(v) + 0.5))
        if r > 0.1:
            rel[(min(d, n), max(d, n))] = r
    return rel


def _bidirectional_neighbors(
    neighbors: pa.Table, domain: str, rel: dict
) -> list[str]:
    """Every domain adjacent to ``domain`` in the stored neighbor table
    (either direction), ordered by stored relatedness DESC / name ASC —
    the candidate list shared by the similar-domains service and the
    similar-cosine browse."""
    adj: set[str] = set()
    for d, n in zip(
        neighbors["domain"].to_pylist(), neighbors["neighbor"].to_pylist()
    ):
        if d == domain:
            adj.add(n)
        elif n == domain:
            adj.add(d)
    return sorted(
        adj,
        key=lambda n: (-rel.get((min(domain, n), max(domain, n)), 0.0), n),
    )


def _link_sets(links: pa.Table, domain: str) -> tuple[set, set]:
    """(dtos, stod): domains this domain links TO (getLinksFromDomain)
    and domains linking to it (getLinksToDomain)."""
    src = links["src"].to_pylist()
    dst = links["dst"].to_pylist()
    dtos = {d for s, d in zip(src, dst) if s == domain}
    stod = {s for s, d in zip(src, dst) if d == domain}
    return dtos, stod


def _link_type(n: str, dtos: set, stod: set) -> str:
    # SimilarDomain.LinkType.find — note the reference spells FOWARD
    if n in dtos and n in stod:
        return "BIDIRECTIONAL"
    if n in dtos:
        return "FOWARD"
    if n in stod:
        return "BACKWARD"
    return "NONE"


def _svc_rank(n: str, ranks: dict[str, float] | None) -> float:
    """Math.round(100 * (1 - RANK)) — SimilarDomainsService.java:145;
    missing repos display 0 like the service's no-entry default."""
    rank01 = (ranks or {}).get(n)
    if rank01 is None:
        return 0.0
    return float(math.floor(100.0 * (1.0 - rank01) + 0.5))


def _decorate(
    names: list[str],
    rel: dict[tuple[str, str], float],
    domain: str,
    dtos: set,
    stod: set,
    ranks: dict[str, float] | None,
    indexed: set | None,
    active: set | None,
    max_name_len: int,
) -> pa.Table:
    rows = []
    for n in names:
        if len(n) > max_name_len:  # :286 — skipped, does NOT refill
            continue
        r = rel.get((min(domain, n), max(domain, n)), 0.0)
        lt = _link_type(n, dtos, stod)
        is_idx = indexed is None or n in indexed
        is_act = active is None or n in active
        # shouldRemove:313-328 (applied AFTER the limit)
        if not (is_idx and is_act) and r <= 50:
            continue
        if lt == "NONE" and r <= 25:
            continue
        rows.append(
            (n, f"http://{n}/", r, _svc_rank(n, ranks), is_idx, is_act, lt)
        )
    return pa.table(
        {
            "neighbor": pa.array([r[0] for r in rows], pa.string()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "relatedness": pa.array([r[2] for r in rows], pa.float64()),
            "rank": pa.array([r[3] for r in rows], pa.float64()),
            "indexed": pa.array([r[4] for r in rows], pa.bool_()),
            "active": pa.array([r[5] for r in rows], pa.bool_()),
            "link_type": pa.array([r[6] for r in rows], pa.string()),
        }
    )


_EMPTY_NEIGHBORS = {
    "domain": pa.array([], pa.string()),
    "neighbor": pa.array([], pa.string()),
    "relatedness": pa.array([], pa.float64()),
}
_EMPTY_LINKS = {
    "src": pa.array([], pa.string()),
    "dst": pa.array([], pa.string()),
}


def similar_domains(
    neighbors,
    links,
    domain: str,
    count: int = 25,
    *,
    ranks: dict[str, float] | None = None,
    indexed: set | None = None,
    active: set | None = None,
    max_name_len: int = MAX_NAME_LENGTH,
) -> pa.Table:
    """SimilarDomainsService.getSimilarDomains:240-311 — the stored
    neighbours of ``domain`` (bidirectional adjacency over the
    EC_DOMAIN_NEIGHBORS_2 rows), sorted by stored relatedness desc /
    name asc, LIMIT ``count``, then decorated and filtered (name
    length, shouldRemove).  ``ranks``: repo -> rank01 in [0,1], lower
    is better (the EC_DOMAIN.RANK column)."""
    neighbors = _as_table(neighbors, _EMPTY_NEIGHBORS)
    links = _as_table(links, _EMPTY_LINKS)
    rel = _relatedness_map(neighbors)
    ordered = _bidirectional_neighbors(neighbors, domain, rel)[
        : max(count, 0)
    ]
    dtos, stod = _link_sets(links, domain)
    return _decorate(
        ordered, rel, domain, dtos, stod, ranks, indexed, active,
        max_name_len,
    )


def linking_domains(
    neighbors,
    links,
    domain: str,
    count: int = 25,
    *,
    ranks: dict[str, float] | None = None,
    indexed: set | None = None,
    active: set | None = None,
    max_name_len: int = MAX_NAME_LENGTH,
) -> pa.Table:
    """SimilarDomainsService.getLinkingDomains:350-427 — every domain
    directly linked with ``domain`` (either direction), sorted by rank
    desc / relatedness desc / linkiness desc / name asc, LIMIT
    ``count``, then decorated and filtered like similar_domains."""
    neighbors = _as_table(neighbors, _EMPTY_NEIGHBORS)
    links = _as_table(links, _EMPTY_LINKS)
    rel = _relatedness_map(neighbors)
    dtos, stod = _link_sets(links, domain)
    cand = sorted(dtos | stod)
    ordered = sorted(
        cand,
        key=lambda n: (
            -_svc_rank(n, ranks),
            -rel.get((min(domain, n), max(domain, n)), 0.0),
            -((n in dtos) + (n in stod)),
            n,
        ),
    )[: max(count, 0)]
    return _decorate(
        ordered, rel, domain, dtos, stod, ranks, indexed, active,
        max_name_len,
    )
