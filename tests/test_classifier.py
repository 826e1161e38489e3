"""classifier-net parity: JavaRandom bit-exactness, vocabulary
featurization (ClassifierVocabulary.java), the single-hidden-layer
model's forward/backward passes against a naive scalar twin
(BinaryClassifierModel.java:87-368), and the distributed featurize +
actor-pool classify pipeline (NsfwDocumentFilter analog)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.classifier import (
    BinaryClassifierModel,
    JavaRandom,
    Vocabulary,
    activation_from_count,
    trim_term,
)


def test_java_random_known_vectors():
    # first draws of java.util.Random(42) — standard published values
    # for the spec'd 48-bit LCG + polar nextGaussian
    assert JavaRandom(42).next_double() == pytest.approx(
        0.7275636800328681, abs=1e-15
    )
    assert JavaRandom(42).next_gaussian() == pytest.approx(
        1.1419053154730547, abs=1e-12
    )
    # pairing: the polar method caches its second variate
    r = JavaRandom(7)
    g = [r.next_gaussian() for _ in range(4)]
    r2 = JavaRandom(7)
    assert [r2.next_gaussian() for _ in range(4)] == g
    assert len(set(g)) == 4


def test_vocabulary_featurization():
    v = Vocabulary(["fast", "table", "scan", "fast_table"])
    # unigrams + the (prev, cur) bigram; counts accumulate
    k, c = v.counted_features("fast table scan fast table")
    feats = dict(zip(k.tolist(), c.tolist()))
    assert feats == {0: 2, 1: 2, 2: 1, 3: 2}
    # binary mode: distinct indices only
    assert v.features("fast table scan fast").tolist() == [0, 1, 2, 3]
    # trimming strips non-alphanumeric edges (trimTerm:232-255)
    assert trim_term("**fast!?") == "fast"
    assert trim_term("--") == ""
    k2, _ = v.counted_features("**fast** (table)")
    assert set(k2.tolist()) == {0, 1, 3}  # bigram survives trimming
    # multiple sentences: prevTerm resets between them
    k3, _ = v.counted_features("fast", "table")
    assert set(k3.tolist()) == {0, 1}
    assert v.counted_features("nothing known")[0].tolist() == []
    # activation curve (ClassifierSample.activationFromCount comment)
    acts = activation_from_count(np.array([1, 2, 3, 4]))
    assert np.allclose(acts, [0.2928932, 0.5, 0.6464466, 0.75], atol=1e-6)


def _scalar_twin_train(model_init, samples, lr):
    """Naive per-index transliteration of trainSample:233-368, run on a
    COPY of the model's weights; returns (w1, b1, w2, b2, losses)."""
    w1 = model_init.w1.copy()
    b1 = model_init.b1.copy()
    w2 = model_init.w2.copy()
    b2 = float(model_init.b2)
    M = model_init.m_hidden
    losses = []
    for y0, x, act in samples:
        z1 = b1.copy()
        for i in range(M):
            for t, xi in enumerate(x):
                z1[i] += w1[i, xi] * (1.0 if act is None else act[t])
        a = np.array([max(0.0, z1[i]) for i in range(M)])
        z2 = b2
        for i in range(M):
            z2 += a[i] * w2[i]
        y = 1.0 / (1.0 + math.exp(-z2))
        eps = 1e-14
        yc = min(max(y, eps), 1 - eps)
        losses.append(-y0 * math.log(yc) - (1 - y0) * math.log(1 - yc))
        dl_dz2 = y - y0
        for i in range(M):
            dldz1 = dl_dz2 * w2[i] * (1.0 if z1[i] > 0 else 0.0)
            for t, xi in enumerate(x):
                w1[i, xi] -= lr * dldz1 * (1.0 if act is None else act[t])
            b1[i] -= lr * dldz1
        for i in range(M):
            w2[i] -= lr * dl_dz2 * a[i]
        b2 -= lr * dl_dz2
    return w1, b1, w2, b2, losses


@pytest.mark.parametrize("mode", ["binary", "counted"])
def test_train_sample_matches_scalar_twin(mode):
    n, m = 9, 4
    rng = np.random.default_rng(5)
    samples = []
    for _ in range(25):
        k = rng.integers(1, 5)
        x = np.sort(rng.choice(n, size=k, replace=False))
        act = (
            activation_from_count(rng.integers(1, 6, size=k))
            if mode == "counted"
            else None
        )
        samples.append((float(rng.integers(0, 2)), x, act))

    model = BinaryClassifierModel.for_training(n, m, mode)
    twin_w1, twin_b1, twin_w2, twin_b2, twin_losses = _scalar_twin_train(
        model, samples, 0.05
    )
    losses = [
        model.train_sample(y0, x, act if mode == "counted" else None, 0.05)
        for y0, x, act in samples
    ]
    assert np.allclose(losses, twin_losses, atol=1e-12)
    assert np.allclose(model.w1, twin_w1, atol=1e-12)
    assert np.allclose(model.b1, twin_b1, atol=1e-12)
    assert np.allclose(model.w2, twin_w2, atol=1e-12)
    assert model.b2 == pytest.approx(twin_b2, abs=1e-12)


@pytest.mark.parametrize("mode", ["binary", "counted"])
def test_duplicate_feature_indices(mode):
    """The public API accepts raw index lists with duplicates: the Java
    loop accumulates once per OCCURRENCE.  A fancy-indexed `w1[:, x] -=`
    would silently drop duplicates (buffered scatter); ufunc .at must
    match the scalar twin, and predict_one == predict_batch."""
    n, m = 7, 3
    rng = np.random.default_rng(11)
    samples = []
    for _ in range(15):
        k = int(rng.integers(2, 6))
        x = np.sort(rng.choice(n, size=k, replace=True))  # dups likely
        act = (
            activation_from_count(rng.integers(1, 6, size=k))
            if mode == "counted"
            else None
        )
        samples.append((float(rng.integers(0, 2)), x, act))
    assert any(len(np.unique(x)) < len(x) for _, x, _ in samples)

    model = BinaryClassifierModel.for_training(n, m, mode)
    twin_w1, twin_b1, twin_w2, twin_b2, twin_losses = _scalar_twin_train(
        model, samples, 0.05
    )
    losses = [
        model.train_sample(y0, x, act if mode == "counted" else None, 0.05)
        for y0, x, act in samples
    ]
    assert np.allclose(losses, twin_losses, atol=1e-12)
    assert np.allclose(model.w1, twin_w1, atol=1e-12)
    assert np.allclose(model.b1, twin_b1, atol=1e-12)
    assert np.allclose(model.w2, twin_w2, atol=1e-12)

    # inference parity on duplicate indices
    feats = [x for _, x, _ in samples]
    acts = [a for _, _, a in samples] if mode == "counted" else None
    ys = model.predict_batch(feats, acts)
    for r, (_, x, a) in enumerate(samples):
        one = model.predict_one(x, a if mode == "counted" else None)
        assert ys[r] == pytest.approx(one, abs=1e-12)


def test_training_converges_and_batch_parity(tmp_path):
    """Separable synthetic task: feature 0 => positive, feature 1 =>
    negative.  Training drives the loss down and classifies the training
    set perfectly; predict_batch equals per-row predict_one; save/load
    round-trips."""
    v = Vocabulary(["good", "bad", "noise"])
    texts = [
        ("good good noise", 1.0), ("good", 1.0), ("noise good", 1.0),
        ("bad noise", 0.0), ("bad bad", 0.0), ("noise bad", 0.0),
    ] * 4
    samples = []
    for text, y in texts:
        k, c = v.counted_features(text)
        samples.append((y, k, activation_from_count(c)))
    model = BinaryClassifierModel.for_training(3, 3, "counted")
    losses = model.train(samples, epochs=400, lr=0.05)
    assert losses[-1] < 0.1 * losses[0]
    preds = [model.predict_one(x, a) for _, x, a in samples]
    assert all(
        (p > 0.5) == (y > 0.5) for p, (y, _, _) in zip(preds, samples)
    )
    feats = [x for _, x, _ in samples]
    acts = [a for _, _, a in samples]
    batch = model.predict_batch(feats, acts)
    assert np.allclose(batch, preds, atol=1e-12)
    # empty feature rows score 0 (NsfwDocumentFilter:66-67)
    assert model.predict_batch([np.array([], dtype=np.int64)], [[]])[0] == 0.0

    path = str(tmp_path / "model.parquet")
    model.save(path)
    loaded = BinaryClassifierModel.load(path)
    assert np.allclose(loaded.predict_batch(feats, acts), batch, atol=0)
    assert loaded.mode == "counted" and loaded.b2 == model.b2


def test_distributed_classify_pipeline(ray_session):
    """featurize -> train on the driver -> actor-pool classify: the
    distributed scores equal the local model's, and the learned filter
    separates the planted label ('alpha' docs positive)."""
    import ray.data

    from marginaliasearch_ray.pipelines import classify

    vocab = ["alpha", "beta", "gamma", "alpha_beta"]
    rng = np.random.default_rng(17)
    texts, labels = [], []
    for i in range(120):
        pos = bool(i % 2)
        words = ["alpha" if pos else "beta"] * int(rng.integers(1, 4))
        words += ["gamma"] * int(rng.integers(0, 3))
        rng.shuffle(words)
        texts.append(" ".join(words))
        labels.append(1.0 if pos else 0.0)
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    feat_ds = classify.featurize(
        ray.data.from_arrow(docs).repartition(5), vocab
    )
    feat = feat_ds.sort("doc_id").to_pandas()
    labeled = pa.table(
        {
            "features": pa.array(
                [list(map(int, f)) for f in feat["features"]],
                pa.list_(pa.int64()),
            ),
            "counts": pa.array(
                [list(map(int, c)) for c in feat["counts"]],
                pa.list_(pa.int64()),
            ),
            "label": pa.array(labels, pa.float64()),
        }
    )
    model = classify.train_classifier(
        labeled, len(vocab), m_hidden=3, epochs=300, lr=0.05
    )
    scored = classify.classify(feat_ds, model).sort("doc_id").to_pandas()
    assert (scored["flagged"] == np.array(labels, dtype=np.int64)).all()
    # distributed forward pass == local forward pass
    local = model.predict_batch(
        [np.asarray(f, dtype=np.int64) for f in feat["features"]],
        [activation_from_count(np.asarray(c)) for c in feat["counts"]],
    )
    assert np.allclose(scored["score"], np.round(local, 6), atol=0)
