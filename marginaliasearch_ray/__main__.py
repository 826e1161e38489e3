"""CLI entrypoint — the `ray job submit` surface of the engine.

On a real cluster each command is the job's driver script:

    ray job submit --working-dir . -- python -m marginaliasearch_ray \
        build --corpus s3://bucket/corpus/ --out s3://bucket/index_v1 \
        --num-parts 512

    ray job submit ... -- python -m marginaliasearch_ray \
        delta --corpus .../fresh_docs/ --prior .../index_v1 \
        --out .../delta_0001
    ray job submit ... -- python -m marginaliasearch_ray \
        compact --segment .../index_v1 --segment .../delta_0001 \
        --out .../index_v2
    ray job submit ... -- python -m marginaliasearch_ray \
        query --index .../index_v1 --index .../delta_0001 "customer merge"

Ray session ownership: this module OWNS a session (it is a job driver,
like bench.py) — `ray.init(address=...)` connects to the cluster the
job runs on (`auto` inside `ray job submit`, `local` standalone).  The
library modules it calls never init Ray themselves.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(args) -> bool:
    """Init Ray if no session exists; returns True when WE own it (an
    in-process caller with a live session keeps theirs untouched)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    if args.num_cpus is not None:
        kwargs["num_cpus"] = args.num_cpus
    ray.init(address=args.address, **kwargs)
    return True


def _build_cfg(args):
    from .pipelines.build_index import BuildConfig

    kw = {}
    for f in ("num_parts", "num_buckets", "num_salts", "hot_df_threshold",
              "posting_block"):
        v = getattr(args, f, None)
        if v is not None:
            kw[f] = v
    if getattr(args, "salted", False):
        kw["premerge_salted"] = True
    if getattr(args, "anchor_regions", False):
        kw["anchor_regions"] = True
    if getattr(args, "link_texts", None):
        kw["anchor_regions"] = True
        kw["link_texts_dir"] = args.link_texts
    return BuildConfig(**kw)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="marginaliasearch_ray")
    p.add_argument("--address", default=None,
                   help="ray address (default: auto/local per env)")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def _common(sp):
        sp.add_argument("--num-parts", type=int, default=None)
        sp.add_argument("--num-buckets", type=int, default=None)
        sp.add_argument("--num-salts", type=int, default=None)
        sp.add_argument("--hot-df-threshold", type=int, default=None)
        sp.add_argument("--posting-block", type=int, default=None)
        sp.add_argument("--salted", action="store_true",
                        help="salted pre-merge for hot terms")

    b = sub.add_parser("build", help="full index build")
    b.add_argument("--corpus", required=True,
                   help="parquet path/dir of (repo,path,commit,lang,content)")
    b.add_argument("--out", required=True)
    b.add_argument("--anchor-regions", action="store_true",
                   help="index URL words + link texts in virtual position "
                        "regions after the body (DocumentPositionMapper)")
    b.add_argument("--link-texts",
                   help="(repo,path,text,cnt) parquet of anchor texts; "
                        "implies --anchor-regions")
    _common(b)

    d = sub.add_parser("delta", help="incremental delta segment")
    d.add_argument("--corpus", required=True, help="new/updated docs parquet")
    d.add_argument("--prior", action="append", required=True,
                   help="prior segment dir (repeat, oldest first)")
    d.add_argument("--out", required=True)
    _common(d)

    c = sub.add_parser("compact", help="fold a segment chain into one")
    c.add_argument("--segment", action="append", required=True,
                   help="segment dir (repeat, oldest first)")
    c.add_argument("--out", required=True)
    c.add_argument("--blob-merge", action="store_true",
                   help="blob-level fold (strip + k-way blob merge; the "
                        "journal is never re-encoded)")
    _common(c)

    tc = sub.add_parser(
        "transcode",
        help="migrate a segment's positions codec (varint <-> legacy "
             "Elias gamma); every codec-independent file hardlinks",
    )
    tc.add_argument("--segment", required=True)
    tc.add_argument("--out", required=True)
    tc.add_argument("--codec", choices=["varint", "gamma"], default="gamma")

    dl = sub.add_parser(
        "delete", help="tombstone-only delta: physically purge documents"
    )
    dl.add_argument("--prior", action="append", required=True,
                    help="prior segment dir (repeat, oldest first)")
    dl.add_argument("--out", required=True)
    dl.add_argument("--repo", action="append", default=[],
                    help="purge EVERY document of this repo (repeat)")
    dl.add_argument("--path", action="append", default=[],
                    help="purge one document as repo:path (repeat)")
    dl.add_argument("--allow-empty", action="store_true",
                    help="permit a spec that matches no documents "
                         "(default: error loudly — a typo'd takedown "
                         "must not read as done)")

    mt = sub.add_parser(
        "maintain",
        help="tiered chain maintenance: fold the oldest segments, rebase "
             "the newer deltas, optionally republish the pointer",
    )
    mt.add_argument("--segment", action="append", default=None,
                    help="segment dir (repeat, oldest first)")
    mt.add_argument("--chain", default=None,
                    help="pointer file (read AND republished on fold)")
    mt.add_argument("--out-root", required=True)
    mt.add_argument("--max-segments", type=int, default=4)
    mt.add_argument("--max-tombstone-frac", type=float, default=0.25)
    mt.add_argument("--fold-path", choices=["auto", "blob", "rebuild"],
                    default="auto",
                    help="auto: blobs iff the fold is delete-only "
                         "(the measured fast path per fold type)")
    _common(mt)

    pub = sub.add_parser(
        "publish", help="atomically flip the CURRENT serving chain pointer"
    )
    pub.add_argument("--segment", action="append", required=True,
                     help="segment dir (repeat, oldest first)")
    pub.add_argument("--chain", required=True, help="pointer file path")

    vf = sub.add_parser(
        "verify",
        help="fsck a segment or chain against its committed manifests",
    )
    vf.add_argument("--segment", action="append", default=None,
                    help="segment dir (repeat for a chain, oldest first)")
    vf.add_argument("--chain", default=None, help="pointer file")
    vf.add_argument("--deep", action="store_true",
                    help="recompute the journal sha256-XOR rollups "
                         "(distributed) and compare")
    vf.add_argument("--vecstore", default=None,
                    help="fsck an incremental vector store dir instead "
                         "of an index segment (Ray-free)")

    st = sub.add_parser(
        "stats",
        help="print a segment's / chain's recorded build metrics + "
             "lineage (Ray-free: reads only the committed manifests)",
    )
    st.add_argument("--segment", action="append", default=None,
                    help="segment dir (repeat for a chain, oldest first)")
    st.add_argument("--chain", default=None, help="pointer file")

    q = sub.add_parser("query", help="search a segment chain")
    q.add_argument("--index", action="append", default=None,
                   help="segment dir (repeat, oldest first)")
    q.add_argument("--chain", default=None,
                   help="pointer file published by `publish`")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--decorate", action="store_true")
    q.add_argument("--pruned", action="store_true")
    q.add_argument("--count", action="store_true",
                   help="print the total match count instead of top-k")
    q.add_argument("--facet", choices=["repo", "year", "lang"], default=None,
                   help="print full-match-set counts grouped by this key "
                        "instead of top-k")
    q.add_argument("--facet-k", type=int, default=20)
    q.add_argument("--explain", action="store_true",
                   help="add per-result ranking-factor columns (fx_*) — "
                        "the DebugRankingFactors breakdown")
    q.add_argument("--batch", default=None, metavar="FILE",
                   help="serve newline-delimited queries from FILE "
                        "concurrently (8 in flight) instead of one "
                        "positional query")
    q.add_argument("--clustered", action="store_true",
                   help="search-service display pipeline: URL dedup + "
                        "by-domain clusters with the sibling prune "
                        "(SearchOperator.doSearch post-processing)")
    q.add_argument("--profile", default=None,
                   help="named search profile (docs/wiki/vintage/modern/"
                        "...; unknown ids fall back to no-filter like the "
                        "reference)")
    q.add_argument("--search-set", action="append", default=[],
                   metavar="NAME=repo1,repo2",
                   help="resolve a profile's search-set name to a repo "
                        "list (repeatable)")
    q.add_argument("--positions", action="store_true",
                   help="add the positions mask and its braille "
                        "punch-card rendering (UrlDetails.positions)")
    q.add_argument("query", nargs="?", default=None)

    srv = sub.add_parser(
        "serve",
        help="long-running query loop: one query per stdin line (plain "
             "text or {\"query\":..., \"k\":..., \"count\":...,"
             " \"facet\":..., \"clustered\":...} JSON), "
             "NDJSON results on stdout; follows chain-pointer flips "
             "between queries (StatefulIndex switch analog)",
    )
    srv.add_argument("--chain", required=True, help="pointer file")
    srv.add_argument("-k", type=int, default=10)
    srv.add_argument("--decorate", action="store_true")

    vs = sub.add_parser(
        "vecstore",
        help="incrementally-maintained embedding store "
             "(build / append / topk / compact)",
    )
    vs.add_argument("action", choices=["build", "append", "topk", "compact"])
    vs.add_argument("--store", required=True, help="store directory")
    vs.add_argument("--embeddings", default=None,
                    help="parquet with (vec_id, embedding) — input for "
                         "build/append, query-vector source for topk")
    vs.add_argument("--kind", choices=["ivf", "lsh"], default="ivf")
    vs.add_argument("--n-centroids", type=int, default=16)
    vs.add_argument("--n-planes", type=int, default=8)
    vs.add_argument("--vec-id", type=int, default=0,
                    help="topk: query vector id looked up in --embeddings")
    vs.add_argument("-k", type=int, default=10)
    vs.add_argument("--nprobe", type=int, default=4)

    cl = sub.add_parser(
        "classify",
        help="document classification (classifier-net / NSFW-filter "
             "analog): train a single-hidden-layer model from labeled "
             "documents, or score a corpus with a saved model",
    )
    cl.add_argument("action", choices=["train", "score"])
    cl.add_argument("--documents", required=True,
                    help="parquet with (doc_id, text)")
    cl.add_argument("--vocab", required=True,
                    help="vocabulary file: one term per line, 'a_b' for "
                         "bigrams, # comments (ClassifierVocabulary "
                         "format)")
    cl.add_argument("--model", required=True,
                    help="model parquet (output for train, input for "
                         "score)")
    cl.add_argument("--labels", default=None,
                    help="train: parquet with (doc_id, label 0/1)")
    cl.add_argument("--epochs", type=int, default=2000)
    cl.add_argument("--lr", type=float, default=0.01)
    cl.add_argument("--hidden", type=int, default=None,
                    help="hidden layer size (default #samples/#vocab)")
    cl.add_argument("--threshold", type=float, default=0.5)
    cl.add_argument("--out", default=None,
                    help="score: write (doc_id, score, flagged) parquet "
                         "here instead of NDJSON on stdout")

    rk = sub.add_parser(
        "rank",
        help="domain ranking over the corpus link graph (PageRank / "
             "personalized PageRank; the SearchSetsService recalculate "
             "analog) — NDJSON (repo, pr, pos, rank_scaled) on stdout",
    )
    rk.add_argument("--documents", required=True,
                    help="parquet with (doc_id, source, n_chars)")
    rk.add_argument("--influence", action="append", default=None,
                    help="personalization seed repo (repeat)")
    rk.add_argument("--weighted", action="store_true",
                    help="use link multiplicities as edge weights")
    rk.add_argument("--invert", action="store_true",
                    help="rank over the inverted link graph")
    rk.add_argument("--depth", type=int, default=100,
                    help="keep the top N ranked repos")
    rk.add_argument("--iters", type=int, default=100)
    rk.add_argument("--tolerance", type=float, default=1e-4,
                    help="0 = run exactly --iters iterations")
    rk.add_argument("--max-meaningful-rank", type=int, default=50_000,
                    help="DomainRankings position scale denominator")
    rk.add_argument("--search-set", default=None, metavar="FILE",
                    help="also write the top repos, one per line, as a "
                         "RankingSearchSet usable via query filter specs")

    aj = sub.add_parser(
        "adjacency",
        help="co-citation domain similarity over the corpus link graph "
             "(the adjacencies export process + SimilarDomainsService): "
             "NDJSON neighbor rows on stdout",
    )
    aj.add_argument("action", choices=["neighbors", "similar", "linking"])
    aj.add_argument("--documents", required=True,
                    help="parquet with (doc_id, source, n_chars)")
    aj.add_argument("--domain", default=None,
                    help="similar/linking: the subject repo")
    aj.add_argument("--count", type=int, default=25,
                    help="similar/linking: result limit")
    aj.add_argument("--min-card", type=int, default=10,
                    help="minimum incident-source cardinality for a "
                         "query domain (reference: 10)")
    aj.add_argument("--threshold", type=float, default=0.1,
                    help="cosine similarity gate (reference: 0.1)")
    aj.add_argument("--top-n", type=int, default=128,
                    help="neighbors kept per domain (reference: 128)")
    aj.add_argument("--out", default=None,
                    help="neighbors: write the table as parquet here "
                         "instead of NDJSON on stdout")

    sp = sub.add_parser(
        "spell",
        help="spell correction (the assistant SpellChecker / SymSpell "
             "analog): build a symmetric-delete index from the corpus "
             "or correct words against a saved one",
    )
    sp.add_argument("action", choices=["build", "correct"])
    sp.add_argument("--index", required=True,
                    help="index path prefix (two parquet files)")
    sp.add_argument("--documents", default=None,
                    help="build: parquet with a text column")
    sp.add_argument("words", nargs="*",
                    help="correct: words to look up")

    sg = sub.add_parser(
        "suggest",
        help="typeahead suggestions (the assistant Suggestions / "
             "PrefixSearchStructure analog): build a prefix index "
             "from the corpus or complete prefixes against a saved one",
    )
    sg.add_argument("action", choices=["build", "complete"])
    sg.add_argument("--index", required=True,
                    help="index path prefix (one parquet file)")
    sg.add_argument("--documents", default=None,
                    help="build: parquet with a text column")
    sg.add_argument("--k", type=int, default=10)
    sg.add_argument("prefixes", nargs="*",
                    help="complete: prefixes to look up (t:term for "
                         "term search within multi-word entries)")

    br = sub.add_parser(
        "browse",
        help="domain browse (random-websites analog): seeded random "
             "exploration or similar-cosine neighbors of a domain",
    )
    br.add_argument("action", choices=["random", "similar"])
    br.add_argument("--documents", default=None,
                    help="random: parquet with a source column")
    br.add_argument("--neighbors", default=None,
                    help="similar: parquet with domain/neighbor/"
                         "relatedness columns (adjacency output)")
    br.add_argument("--domain", default=None,
                    help="similar: the subject domain")
    br.add_argument("--store", default=None,
                    help="similar: blob store; neighbors must have an "
                         "entry (the screenshot-require join)")
    br.add_argument("--k", type=int, default=10)
    br.add_argument("--seed", type=int, default=0)
    br.add_argument("--exclude", action="append", default=[],
                    help="blacklisted domain (repeatable)")

    fv = sub.add_parser(
        "favicon",
        help="domain blob store (favicon/screenshot serving analog): "
             "bulk-build from the corpus or point-look-up domains",
    )
    fv.add_argument("action", choices=["build", "get"])
    fv.add_argument("--store", required=True,
                    help="blob-store parquet path")
    fv.add_argument("--documents", default=None,
                    help="build: parquet with a source column")
    fv.add_argument("domains", nargs="*",
                    help="get: domains to look up")

    ma = sub.add_parser(
        "math",
        help="math expression eval + unit conversion (the assistant "
             "math function): math eval EXPR... | math convert V FROM TO",
    )
    ma.add_argument("action", choices=["eval", "convert"])
    ma.add_argument("operands", nargs="*",
                    help="eval: expressions; convert: VALUE FROM TO")

    di = sub.add_parser(
        "domaininfo",
        help="per-domain info cards (the DomainInformationService "
             "analog): page counts, link counts, rank display value",
    )
    di.add_argument("--documents", required=True,
                    help="parquet with doc_id/source/text/n_chars columns")
    di.add_argument("--parts", type=int, default=4,
                    help="node-affinity modulus (index partition count)")
    di.add_argument("--depth", type=int, default=None,
                    help="PageRank ranking depth (default: all domains)")
    di.add_argument("domains", nargs="*",
                    help="domains to print (default: every domain)")

    # parse_known_args + leftover routing: argparse binds a trailing
    # nargs="*" positional at the FIRST positional chunk (the bare
    # subcommand action), so lookup words given after --flags land in
    # the unrecognized bucket — route them back to the list argument.
    args, extra = p.parse_known_args(argv)
    cmd_ = getattr(args, "cmd", None)
    act_ = getattr(args, "action", None)
    if cmd_ == "spell" and act_ == "correct":
        trailing = "words"
    elif cmd_ == "suggest" and act_ == "complete":
        trailing = "prefixes"
    elif cmd_ == "favicon" and act_ == "get":
        trailing = "domains"
    elif cmd_ in ("domaininfo", "math"):  # every action takes operands
        trailing = "domains" if cmd_ == "domaininfo" else "operands"
    else:
        trailing = None
    if extra and trailing and not any(a.startswith("-") for a in extra):
        setattr(args, trailing, [*getattr(args, trailing), *extra])
    elif extra:
        # build-style actions take no lookup operands: keep argparse's
        # hard error so stray positionals stay loud
        p.error(f"unrecognized arguments: {' '.join(extra)}")
    if args.cmd == "publish":  # pure file op — no Ray session needed
        from .state import manifest as mf

        print(json.dumps({
            "chain": mf.publish_chain(args.segment, args.chain),
            "segments": [str(s) for s in args.segment],
        }))
        return 0
    if args.cmd == "favicon" and args.action == "get":
        # pure file op — pruned point reads, no Ray session needed
        from .pipelines import blobstore as bs_

        store = bs_.DomainBlobStore(args.store)
        for d in args.domains:
            hit = store.get(d)
            if hit is None:
                print(json.dumps({"domain": d, "found": False}))
            else:
                ct, data = hit
                print(json.dumps({
                    "domain": d, "found": True, "content_type": ct,
                    "n_bytes": len(data), "data_hex": data.hex(),
                }))
        return 0
    if args.cmd == "math":  # pure scalar service — no Ray session needed
        from .functions import matheval as me

        if args.action == "eval":
            for e in args.operands:
                try:
                    print(json.dumps(
                        {"expr": e, "result": me.eval_math_formatted(e)}
                    ))
                except me.MathEvalError as ex:  # IllegalArgumentException
                    print(json.dumps({"expr": e, "error": str(ex)}))
        else:
            if len(args.operands) != 3:
                p.error("math convert needs VALUE FROM_UNIT TO_UNIT")
            v, f, t = args.operands
            print(json.dumps(
                {"value": v, "from": f, "to": t,
                 "result": me.convert_unit(v, f, t)}
            ))
        return 0
    if args.cmd == "stats":  # pure file op — no Ray session needed
        from .state import manifest as mf
        from .state.verify import _rebase

        if bool(args.segment) == bool(args.chain):
            p.error("stats needs exactly one of --segment/--chain")
        dirs = args.segment or mf.read_chain(args.chain)
        out = []
        for d in dirs:
            seg: dict = {"segment": os.path.abspath(d)}
            if not mf.is_committed(d, "root"):
                seg["error"] = "root manifest missing (unfinished segment)"
                out.append(seg)
                continue
            root = mf.read_manifest(d, "root")
            # manifests record build-time abspaths; rebase onto the
            # segment's CURRENT location so a relocated/rsynced chain
            # reports real sizes (verify.py's relocation rule)
            recorded_root = os.path.abspath(root.get("out_dir", d))
            actual_root = os.path.abspath(d)
            seg["n_docs"] = root.get("n_docs")
            seg["num_parts"] = root.get("num_parts")
            phases: dict = {}
            for ph in ("journal", "stats", "forward", "reverse", "prio",
                       "delta"):
                if not mf.is_committed(d, ph):
                    continue
                m = mf.read_manifest(d, ph)
                e: dict = {"seconds": m.get("seconds")}
                if "per_part_lineage" in m:
                    e["per_part_docs"] = {
                        k: v.get("docs")
                        for k, v in m["per_part_lineage"].items()
                    }
                for k in ("per_part_postings", "per_part_docs",
                          "tombstones", "prior_dirs", "compacted_from"):
                    if k in m and k not in e:
                        e[k] = m[k]
                if "hot_terms" in m:
                    ht = m["hot_terms"]
                    e["n_hot_terms"] = len(ht) if isinstance(ht, list) else ht
                if "files" in m:
                    rebased = [
                        _rebase(f, recorded_root, actual_root)
                        for f in m["files"]
                    ]
                    e["n_files"] = len(rebased)
                    e["bytes"] = sum(
                        os.path.getsize(f)
                        for f in rebased
                        if os.path.exists(f)
                    )
                    missing = sum(1 for f in rebased if not os.path.exists(f))
                    if missing:
                        e["missing_files"] = missing
                phases[ph] = e
            seg["phases"] = phases
            out.append(seg)
        print(json.dumps(out))
        return 0
    if args.cmd == "verify" and args.vecstore:
        if args.segment or args.chain or args.deep:
            p.error("--vecstore stands alone (no --segment/--chain/--deep)")
        from .state.verify import verify_vector_store

        res = verify_vector_store(args.vecstore)
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    if args.cmd == "verify" and not args.deep:
        # shallow fsck is manifest + pyarrow metadata only — it must run
        # on a recovery box with no reachable cluster (only --deep's
        # distributed journal rollup needs ray.data)
        from .state import manifest as mf
        from .state.verify import verify_chain, verify_segment

        if bool(args.segment) == bool(args.chain):
            p.error("verify needs exactly one of --segment/--chain")
        dirs = args.segment or mf.read_chain(args.chain)
        res = (
            verify_chain(dirs, deep=False)
            if len(dirs) > 1 or args.chain
            else verify_segment(dirs[0], deep=False)
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    owns_ray = _init_ray(args)
    import ray
    import ray.data as rd

    try:
        if args.cmd == "build":
            from .pipelines.build_index import build_index

            root = build_index(
                rd.read_parquet(args.corpus), args.out, _build_cfg(args)
            )
            print(json.dumps(root))
        elif args.cmd == "delta":
            from .pipelines.delta import build_delta_index

            man = build_delta_index(
                rd.read_parquet(args.corpus), args.prior, args.out,
                _build_cfg(args),
            )
            print(json.dumps(man))
        elif args.cmd == "compact":
            from .pipelines.delta import compact_segments

            root = compact_segments(
                args.segment, args.out, _build_cfg(args),
                blob_merge=args.blob_merge,
            )
            print(json.dumps(root))
        elif args.cmd == "transcode":
            from .pipelines.transcode import transcode_positions

            root = transcode_positions(args.segment, args.out, args.codec)
            print(json.dumps(root))
        elif args.cmd == "delete":
            from .pipelines.delta import build_delete_delta

            pairs = []
            for spec in args.path:
                repo, _, path = spec.partition(":")
                if not path:
                    p.error(f"--path must be repo:path, got {spec!r}")
                pairs.append((repo, path))
            man = build_delete_delta(
                args.prior, args.out, repos=args.repo or None,
                paths=pairs or None, allow_empty=args.allow_empty,
            )
            print(json.dumps(man))
        elif args.cmd == "verify":
            from .state import manifest as mf
            from .state.verify import verify_chain, verify_segment

            if bool(args.segment) == bool(args.chain):
                p.error("verify needs exactly one of --segment/--chain")
            dirs = args.segment or mf.read_chain(args.chain)
            res = (
                verify_chain(dirs, deep=args.deep)
                if len(dirs) > 1 or args.chain
                else verify_segment(dirs[0], deep=args.deep)
            )
            print(json.dumps(res))
            return 0 if res["ok"] else 1
        elif args.cmd == "maintain":
            from .pipelines.delta import maintain_chain
            from .state import manifest as mf

            if bool(args.segment) == bool(args.chain):
                p.error("maintain needs exactly one of --segment/--chain")
            dirs = args.segment or mf.read_chain(args.chain)
            new_chain = maintain_chain(
                dirs, args.out_root, _build_cfg(args),
                max_segments=args.max_segments,
                max_tombstone_frac=args.max_tombstone_frac,
                blob_merge={"auto": "auto", "blob": True, "rebuild": False}[
                    args.fold_path
                ],
                chain_path=args.chain,
            )
            import os as _os

            print(json.dumps({
                "chain": new_chain,
                "folded": new_chain
                != [_os.path.abspath(d) for d in dirs],
            }))
        elif args.cmd == "serve":
            from .pipelines.query import IndexSearch

            s = IndexSearch.from_chain(args.chain, use_actors=True)
            for line in sys.stdin:
                line = line.strip()
                if not line:
                    continue
                req = (
                    json.loads(line)
                    if line.startswith("{")
                    else {"query": line}
                )
                # pick up a published pointer flip before answering
                if s.maybe_reload():
                    print(
                        json.dumps(
                            {"event": "reloaded",
                             "segments": s.segment_dirs}
                        ),
                        flush=True,
                    )
                try:
                    if req.get("count"):
                        out = {"query": req["query"],
                               "n": s.count(req["query"])}
                    elif req.get("facet"):
                        t = s.facets(
                            req["query"],
                            by=req["facet"],
                            k=int(req.get("facet_k", 20)),
                        )
                        out = {"query": req["query"],
                               "facets": t.to_pylist()}
                    elif req.get("clustered"):
                        t = s.search_clustered(
                            req["query"],
                            k=int(req.get("k", 100)),
                            total=int(req.get("total", 25)),
                        )
                        out = {"query": req["query"],
                               "clusters": t.to_pylist()}
                    elif req.get("profile"):
                        from .pipelines import profiles as pf

                        t = pf.search_with_profile(
                            s,
                            req["query"],
                            req["profile"],
                            search_sets=req.get("search_sets"),
                            k=int(req.get("k", args.k)),
                        )
                        out = {"query": req["query"],
                               "results": t.to_pylist()}
                    else:
                        t = s.search(
                            req["query"],
                            k=int(req.get("k", args.k)),
                            decorate=bool(
                                req.get("decorate", args.decorate)
                            ),
                            explain=bool(req.get("explain", False)),
                        )
                        out = {"query": req["query"],
                               "results": t.to_pylist()}
                except (ValueError, KeyError) as ex:
                    # a malformed request must not kill the long-running
                    # serve loop — reply with an error line instead
                    out = {"query": req.get("query"),
                           "error": f"{type(ex).__name__}: {ex}"}
                print(json.dumps(out), flush=True)
            s.shutdown()

        elif args.cmd == "vecstore":
            from .pipelines import similarity as sim

            if args.action == "build":
                if not args.embeddings:
                    p.error("vecstore build needs --embeddings")
                meta = sim.build_vector_store(
                    args.embeddings, args.store, kind=args.kind,
                    n_centroids=args.n_centroids, n_planes=args.n_planes,
                )
                print(json.dumps(meta))
            elif args.action == "append":
                if not args.embeddings:
                    p.error("vecstore append needs --embeddings")
                print(json.dumps(
                    sim.append_vector_store(args.store, args.embeddings)
                ))
            elif args.action == "compact":
                print(json.dumps(sim.compact_vector_store(args.store)))
            else:  # topk
                if not args.embeddings:
                    p.error("vecstore topk needs --embeddings for the "
                            "query vector")
                import numpy as np
                import pyarrow.parquet as pq_

                t = pq_.read_table(
                    args.embeddings, columns=["vec_id", "embedding"],
                    filters=[("vec_id", "==", args.vec_id)],
                )
                if t.num_rows == 0:
                    p.error(
                        f"vec_id {args.vec_id} not found in "
                        f"{args.embeddings}"
                    )
                qv = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
                res = sim.vector_store_topk(
                    args.store, qv, k=args.k, nprobe=args.nprobe
                )
                for row in res.take_all():
                    print(json.dumps(row))

        elif args.cmd == "classify":
            import ray.data

            from .functions.classifier import BinaryClassifierModel
            from .pipelines import classify as clf

            with open(args.vocab) as f:
                vocab = [
                    ln.strip() for ln in f
                    if ln.strip() and not ln.strip().startswith("#")
                ]
            ds = ray.data.read_parquet(
                args.documents, columns=["doc_id", "text"]
            )
            feat = clf.featurize(ds, vocab)
            if args.action == "train":
                if not args.labels:
                    p.error("classify train needs --labels")
                import pyarrow.parquet as pq_

                labels = {
                    int(r["doc_id"]): float(r["label"])
                    for r in pq_.read_table(
                        args.labels, columns=["doc_id", "label"]
                    ).to_pylist()
                }
                rows = [r for r in feat.sort("doc_id").take_all()
                        if int(r["doc_id"]) in labels]
                import pyarrow as pa_

                labeled = pa_.table(
                    {
                        "features": pa_.array(
                            [r["features"] for r in rows],
                            pa_.list_(pa_.int64()),
                        ),
                        "counts": pa_.array(
                            [r["counts"] for r in rows],
                            pa_.list_(pa_.int64()),
                        ),
                        "label": pa_.array(
                            [labels[int(r["doc_id"])] for r in rows],
                            pa_.float64(),
                        ),
                    }
                )
                model = clf.train_classifier(
                    labeled, len(vocab), m_hidden=args.hidden,
                    epochs=args.epochs, lr=args.lr,
                )
                model.save(args.model)
                print(json.dumps({
                    "model": args.model, "samples": labeled.num_rows,
                    "vocab": len(vocab), "hidden": model.m_hidden,
                }))
            else:  # score
                model = BinaryClassifierModel.load(args.model)
                scored = clf.classify(feat, model, threshold=args.threshold)
                if args.out:
                    scored.write_parquet(args.out)
                    print(json.dumps({"out": args.out}))
                else:
                    for row in scored.sort("doc_id").take_all():
                        print(json.dumps({
                            "doc_id": int(row["doc_id"]),
                            "score": float(row["score"]),
                            "flagged": int(row["flagged"]),
                        }))

        elif args.cmd == "rank":
            import ray.data

            from .pipelines import ranking

            ds = ray.data.read_parquet(
                args.documents, columns=["doc_id", "source", "n_chars"]
            )
            repos = ranking.corpus_repos(ds)
            edges = ranking.link_edges(ds, repos, invert=args.invert)
            scores = ranking.pagerank(
                edges, repos,
                max_iterations=args.iters, tolerance=args.tolerance,
                influence=args.influence, weighted=args.weighted,
            )
            rows = ranking.rank_positions(repos, scores, args.depth)
            for repo, pr, pos in rows:
                print(json.dumps({
                    "repo": repo, "pr": pr, "pos": pos,
                    "rank_scaled": ranking.scale_rank(
                        pos, args.max_meaningful_rank
                    ),
                }))
            if args.search_set:
                with open(args.search_set, "w") as f:
                    for repo in sorted(r for r, _s, _p in rows):
                        f.write(repo + "\n")

        elif args.cmd == "spell":
            from .pipelines import spell as sp_

            if args.action == "build":
                if not args.documents:
                    p.error("spell build needs --documents")
                import ray.data

                docs = ray.data.read_parquet(
                    args.documents, columns=["text"]
                )
                idx = sp_.SpellIndex.build(sp_.spell_dictionary(docs))
                idx.save(args.index)
                print(json.dumps({
                    "index": args.index, "words": len(idx.words),
                    "keys": len(idx.keys),
                }))
            else:  # correct — pure file op, SpellChecker.correct shape
                idx = sp_.SpellIndex.load(args.index)
                for w in args.words:
                    print(json.dumps({
                        "input": w,
                        "suggestions": [
                            {"term": t, "cnt": c, "dist": d}
                            for t, c, d in idx.correct(w)
                        ],
                    }))

        elif args.cmd == "suggest":
            from .pipelines import suggest as sg_

            if args.action == "build":
                if not args.documents:
                    p.error("suggest build needs --documents")
                import ray.data

                docs = ray.data.read_parquet(
                    args.documents, columns=["text"]
                )
                idx = sg_.SuggestIndex.build(
                    sg_.suggest_dictionary(docs)
                )
                idx.save(args.index)
                print(json.dumps({
                    "index": args.index,
                    "rows": len(idx.prefixes),
                }))
            else:  # complete — pure file op, getSuggestions shape
                idx = sg_.SuggestIndex.load(args.index)
                for q in args.prefixes:
                    print(json.dumps({
                        "input": q,
                        "suggestions": [
                            {"word": w, "score": s}
                            for w, s in idx.suggest(q, args.k)
                        ],
                    }))

        elif args.cmd == "browse":
            import pyarrow.parquet as pq_

            from .pipelines import browse as br_

            if args.action == "random":
                if not args.documents:
                    p.error("browse random needs --documents")
                import ray.data

                docs = ray.data.read_parquet(
                    args.documents, columns=["source"]
                )
                t = br_.random_browse(
                    [str(d) for d in docs.unique("source")],
                    args.k, args.seed, exclude=args.exclude,
                )
            else:
                if not (args.neighbors and args.domain):
                    p.error("browse similar needs --neighbors --domain")
                has = None
                if args.store:
                    from .pipelines import blobstore as bs_

                    has = bs_.DomainBlobStore(args.store).has
                t = br_.similar_browse(
                    pq_.read_table(args.neighbors), args.domain,
                    args.k, has=has, exclude=args.exclude,
                )
            for i in range(len(t)):
                print(json.dumps(
                    {n: t[n][i].as_py() for n in t.column_names}
                ))

        elif args.cmd == "favicon":  # build (get returned earlier)
            import ray.data

            from .pipelines import blobstore as bs_

            if not args.documents:
                p.error("favicon build needs --documents")
            docs = ray.data.read_parquet(
                args.documents, columns=["source"]
            )
            n = bs_.build_favicon_store(docs, args.store)
            print(json.dumps({"store": args.store, "rows": n}))

        elif args.cmd == "domaininfo":
            import ray.data

            from .pipelines import domaininfo as di_
            from .pipelines import ranking as rk_

            docs = ray.data.read_parquet(
                args.documents,
                columns=["doc_id", "source", "text", "n_chars"],
            )
            depth = args.depth
            if depth is None:
                depth = rk_.MAX_MEANINGFUL_RANK
            info = di_.domain_info(
                docs, num_parts=args.parts, rank_depth=depth
            )
            if args.domains:
                for d in args.domains:
                    row = di_.domain_info_for(info, d)
                    print(json.dumps(row if row is not None
                                     else {"domain": d, "error": "unknown"}))
            else:  # full table: one pass, not a per-domain lookup loop
                cols = {n: info[n].to_pylist() for n in info.column_names}
                for i in range(len(info)):
                    print(json.dumps({n: cols[n][i] for n in cols}))

        elif args.cmd == "adjacency":
            import pyarrow as pa_
            import ray.data

            from .pipelines import adjacencies, ranking

            ds = ray.data.read_parquet(
                args.documents, columns=["doc_id", "source", "n_chars"]
            )
            edges = ranking.link_edges(ds)
            nbr = adjacencies.domain_neighbors(
                edges, min_card=args.min_card,
                threshold=args.threshold, top_n=args.top_n,
            )
            if args.action == "neighbors":
                if args.out:
                    nbr.write_parquet(args.out)
                    print(json.dumps({"out": args.out}))
                else:
                    for row in nbr.sort(
                        ["domain", "neighbor"]
                    ).take_all():
                        print(json.dumps({
                            "domain": row["domain"],
                            "neighbor": row["neighbor"],
                            "relatedness": round(
                                float(row["relatedness"]), 6
                            ),
                        }))
            else:
                if not args.domain:
                    p.error(f"adjacency {args.action} needs --domain")
                fn = (adjacencies.similar_domains
                      if args.action == "similar"
                      else adjacencies.linking_domains)
                t = fn(nbr, edges, args.domain, args.count)
                for i in range(t.num_rows):
                    print(json.dumps(
                        {c: t[c][i].as_py() for c in t.column_names}
                    ))

        elif args.cmd == "query":
            from .pipelines.query import IndexSearch

            if bool(args.index) == bool(args.chain):
                p.error("query needs exactly one of --index/--chain")
            if args.chain:
                s = IndexSearch.from_chain(args.chain, use_actors=True)
            else:
                s = IndexSearch(
                    args.index if len(args.index) > 1 else args.index[0],
                    use_actors=True,
                )
            if bool(args.batch) == bool(args.query):
                p.error("query needs exactly one of --batch/positional query")
            if args.facet and (args.count or args.batch):
                p.error("--facet cannot be combined with --count or --batch")
            if args.clustered and (
                args.count or args.batch or args.facet or args.explain
                or args.profile or args.positions
            ):
                p.error("--clustered takes a single plain query")
            if args.positions and (args.count or args.batch or args.facet
                                   or args.profile):
                p.error("--positions applies to the plain query path")
            if args.batch:
                with open(args.batch) as f:
                    batch = [ln.strip() for ln in f if ln.strip()]
                kw = {"k": args.k, "decorate": args.decorate,
                      "pruned": args.pruned, "count_only": args.count}
                tables = s.search_many([(qr, kw) for qr in batch])
                for qr, t in zip(batch, tables):
                    if args.count:
                        print(json.dumps(
                            {"query": qr, "n": t["n"][0].as_py()}
                        ))
                    else:
                        print(json.dumps(
                            {"query": qr, "results": t.to_pylist()}
                        ))
            elif args.count:
                print(json.dumps({"n": s.count(args.query)}))
            elif args.facet:
                t = s.facets(args.query, by=args.facet, k=args.facet_k)
                for row in t.to_pylist():
                    print(json.dumps(row))
            elif args.clustered:
                t = s.search_clustered(args.query)
                for row in t.to_pylist():
                    print(json.dumps(row))
            elif args.profile:
                from .pipelines import profiles as pf

                sets = {}
                for spec in args.search_set:
                    name, _, repos_csv = spec.partition("=")
                    sets[name.upper()] = [
                        r for r in repos_csv.split(",") if r
                    ]
                t = pf.search_with_profile(
                    s, args.query, args.profile, search_sets=sets,
                    k=args.k, decorate=args.decorate, pruned=args.pruned,
                )
                for row in t.to_pylist():
                    print(json.dumps(row))
            else:
                t = s.search(
                    args.query, k=args.k, decorate=args.decorate,
                    pruned=args.pruned, explain=args.explain,
                    positions_render=args.positions,
                )
                for row in t.to_pylist():
                    print(json.dumps(row))
            s.shutdown()
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
