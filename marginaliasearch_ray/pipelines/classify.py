"""Distributed document classification — the NSFW-filter function
re-expressed over Ray Data (nsfw/document/NsfwDocumentFilter.java wraps
the classifier-net model; NsfwDocumentModelTrainer.java +
BinaryClassifierTrainer.java:216-243 train it from labeled samples).

Decomposition for 100 TB:
- featurization is a stateless ``map_batches`` pass (vocabulary is
  broadcast once; each doc leaves as a sparse (indices, counts) pair);
- training runs on the DRIVER over the labeled sample set, exactly like
  the reference (per-sample sequential SGD is inherently ordered; the
  labeled set is orders of magnitude smaller than the corpus);
- inference is a stateful actor-pool stage: weights are shipped once
  per actor via the broadcast object store, every batch is one dense
  scatter + two matmuls (functions/classifier.predict_batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.classifier import (
    BinaryClassifierModel,
    Vocabulary,
    activation_from_count,
)


def featurize(
    ds,
    vocab_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(id, features list<int>, counts list<int>) per document — the
    ClassifierVocabulary.countedFeatures pass as a distributed stage.
    Actor-pool: the O(V) unigram/bigram Vocabulary dicts are built once
    per actor in __init__, not once per batch."""

    class _Featurize:
        def __init__(self, terms: list[str]):
            self.vocab = Vocabulary(terms)

        def __call__(self, batch: pa.Table) -> pa.Table:
            feats = []
            counts = []
            for text in batch[text_col].to_pylist():
                k, c = self.vocab.counted_features(text)
                feats.append(k.tolist())
                counts.append(c.tolist())
            return pa.table(
                {
                    id_col: batch[id_col],
                    "features": pa.array(feats, pa.list_(pa.int64())),
                    "counts": pa.array(counts, pa.list_(pa.int64())),
                }
            )

    return ds.map_batches(
        _Featurize,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={"terms": vocab_terms},
    )


class _Classifier:
    """Actor-pool inference stage: model deserialized once per actor
    (__init__), batches scored with one dense scatter + two matmuls."""

    def __init__(self, weights: dict, threshold: float):
        m = BinaryClassifierModel(
            int(weights["n_inputs"]), int(weights["m_hidden"]),
            weights["mode"],
        )
        m.w1 = np.asarray(weights["w1"], dtype=np.float64)
        m.b1 = np.asarray(weights["b1"], dtype=np.float64)
        m.w2 = np.asarray(weights["w2"], dtype=np.float64)
        m.b2 = float(weights["b2"])
        self.model = m
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = batch["features"].to_pylist()
        if self.model.mode == "counted":
            acts = [
                activation_from_count(np.asarray(c, dtype=np.int64))
                for c in batch["counts"].to_pylist()
            ]
        else:
            acts = None
        y = self.model.predict_batch(feats, acts)
        out = {n: batch[n] for n in batch.column_names
               if n not in ("features", "counts")}
        out["score"] = pa.array(np.round(y, 6), pa.float64())
        # activationThreshold = 0.5, NsfwDocumentFilter.java:28
        out["flagged"] = pa.array(
            (y > self.threshold).astype(np.int64), pa.int64()
        )
        return pa.table(out)


def classify(
    featurized_ds,
    model: BinaryClassifierModel,
    threshold: float = 0.5,
    concurrency: int | tuple = (1, 8),
    batch_size: int = 1024,
):
    """Score every featurized document: (id cols..., score, flagged).
    ``batch_size`` bounds the dense (B, n_inputs) scatter per batch;
    ``concurrency`` sizes the actor pool (autoscaling range default)."""
    weights = {
        "n_inputs": model.n_inputs,
        "m_hidden": model.m_hidden,
        "mode": model.mode,
        "w1": model.w1,
        "b1": model.b1,
        "w2": model.w2,
        "b2": model.b2,
    }
    return featurized_ds.map_batches(
        _Classifier,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"weights": weights, "threshold": threshold},
    )


def train_classifier(
    featurized_labeled: pa.Table,
    vocab_size: int,
    m_hidden: int | None = None,
    mode: str = "counted",
    epochs: int = 2000,
    lr: float = 0.01,
    label_col: str = "label",
) -> BinaryClassifierModel:
    """Driver-side training over a (features, counts, label) sample
    table — BinaryClassifierTrainer.train:216-243 (hidden size defaults
    to #samples / vocab size, floor 1; 2000 epochs at lr 0.01 with the
    x0.98/100-epoch decay).  Sample ORDER is the table's row order (the
    SGD is sequential, so order is part of the contract)."""
    n = featurized_labeled.num_rows
    if m_hidden is None:
        m_hidden = max(1, n // max(1, vocab_size))
    model = BinaryClassifierModel.for_training(vocab_size, m_hidden, mode)
    samples = []
    for row in featurized_labeled.to_pylist():
        x = np.asarray(row["features"], dtype=np.int64)
        act = (
            activation_from_count(np.asarray(row["counts"], dtype=np.int64))
            if mode == "counted"
            else None
        )
        if len(x) == 0:
            continue  # trainer drops featureless samples
        samples.append((float(row[label_col]), x, act))
    model.train(samples, epochs=epochs, lr=lr)
    return model
