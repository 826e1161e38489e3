"""marginaliasearch_ray — a Ray-Data-native inverted-index build and BM25
query engine over Parquet tables of source-code repositories.

Architecture is idiomatic Ray Data (Dataset -> map_batches over Arrow
batches, actor pools for stateful stages, groupby shuffles for the wide
steps).  The reference (FLOSSBoxIN/MarginaliaSearch, read-only snapshot at
/root/reference) contributes the data model, wire encodings, scoring
formulas and test discipline — cited per-module as file:line — not the
execution engine.

Layout:
  functions/   pure, vectorizable kernels (hashing, codecs, bit packing,
               token admission, BM25 math)
  sources/     corpus generation/adaptation (synthetic source-code corpus,
               documents-table adapter)
  stages/      map_batches / groupby stage implementations (tokenize,
               doc-id assignment, forward index, reverse index, merge)
  state/       broadcast state + segment manifests (lineage, resumability)
  pipelines/   end-to-end pipelines (index build, query serving, text ops,
               similarity search, multimodal plumbing)
"""

__version__ = "0.1.0"

# Ray 2.49 hash-shuffle schema-broadcast race workaround (see _rayfix):
# without it, a join whose sequence leads with an empty block can
# finalize empty partitions as zero-column tables and abort.
from . import _rayfix as _rayfix_mod  # noqa: E402

_rayfix_mod.apply()
