"""Single-hidden-layer binary classifier + vocabulary featurization —
the reference's classifier-net library (code/libraries/classifier-net/
java/nu/marginalia/classifier/): ReLU hidden layer, sigmoid output,
binary-cross-entropy loss with per-sample SGD, He/Glorot init from
java.util.Random(451), and the unigram+bigram vocabulary featurizer the
NSFW document filter consumes (nsfw/document/NsfwDocumentFilter.java).

The model math (BinaryClassifierModel.java:27-117):

    z1[i] = w1[i][j] * x[j] + b1[i];   a = relu(z1)
    z2    = w2[i] * a[i] + b2;         y = sigmoid(z2)

Input activation is either BINARY (feature present -> 1) or COUNTED
(act = 1 - 2^(-count/2), ClassifierSample.activationFromCount:18-31).

Training (trainSample:233-301): per-sample SGD on clamped BCE, hidden
updates before output updates within a sample, sequential over the
sample list; train(:217-225) decays lr by 0.98 every 100 epochs.
Weight init (initializeWeights:472-488): w1 ~ N(0, 2/N) (He for ReLU),
w2 ~ N(0, 2/(M+1)) (Glorot), drawn sequentially from Random(451);
biases zero.  ``JavaRandom`` reproduces java.util.Random bit-exactly
(the LCG and polar-method nextGaussian are specified in its javadoc),
so a model built here has the same initial weights as the reference's.
"""

from __future__ import annotations

import math

import numpy as np

_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D
_ADD = 0xB


class JavaRandom:
    """Bit-exact java.util.Random: 48-bit LCG (the javadoc specifies
    next(), nextDouble() and the Marsaglia-polar nextGaussian())."""

    def __init__(self, seed: int):
        self._seed = (seed ^ _MULT) & _MASK48
        self._have_g = False
        self._g = 0.0

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULT + _ADD) & _MASK48
        return self._seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (1.0 / (1 << 53))

    def next_gaussian(self) -> float:
        if self._have_g:
            self._have_g = False
            return self._g
        while True:
            v1 = 2.0 * self.next_double() - 1.0
            v2 = 2.0 * self.next_double() - 1.0
            s = v1 * v1 + v2 * v2
            if 0.0 < s < 1.0:
                break
        mult = math.sqrt(-2.0 * math.log(s) / s)
        self._g = v2 * mult
        self._have_g = True
        return v1 * mult


def trim_term(term: str) -> str:
    """ClassifierVocabulary.trimTerm:232-255 — strip non-alphanumeric
    characters from both ends (Java isAlphabetic/isDigit ~ str.isalnum
    for the corpus's character range)."""
    start, end = 0, len(term)
    while start < end and not term[start].isalnum():
        start += 1
    while end > start and not term[end - 1].isalnum():
        end -= 1
    return term[start:end]


class Vocabulary:
    """Unigram + bigram ("a_b") feature vocabulary
    (ClassifierVocabulary.java:29-140).  Feature extraction lowercases,
    whitespace-splits, edge-trims each term, and matches unigrams plus
    (prev, cur) bigrams; BINARY mode yields distinct indices, COUNTED
    mode (index, count) pairs.  Indices are emitted SORTED (Java's
    insertion-ordered sets are order-unspecified contracts; sorted order
    makes the SQL oracle replicable and the float sums deterministic)."""

    def __init__(self, terms: list[str]):
        self.terms = list(terms)
        self.unigram: dict[str, int] = {}
        self.bigram: dict[tuple[str, str], int] = {}
        for i, t in enumerate(self.terms):
            if "_" in t:
                a, b = t.split("_", 1)
                self.bigram[(a, b)] = i
            else:
                self.unigram[t] = i

    def __len__(self) -> int:
        return len(self.terms)

    def counted_features(self, *texts: str) -> tuple[np.ndarray, np.ndarray]:
        counts: dict[int, int] = {}
        for text in texts:
            prev = None
            for raw in text.lower().split():
                term = trim_term(raw)
                idx = self.unigram.get(term)
                if idx is not None:
                    counts[idx] = counts.get(idx, 0) + 1
                if prev is not None:
                    bidx = self.bigram.get((prev, term))
                    if bidx is not None:
                        counts[bidx] = counts.get(bidx, 0) + 1
                prev = term
        keys = np.array(sorted(counts), dtype=np.int64)
        return keys, np.array([counts[k] for k in keys], dtype=np.int64)

    def features(self, *texts: str) -> np.ndarray:
        return self.counted_features(*texts)[0]


def activation_from_count(counts: np.ndarray) -> np.ndarray:
    """act = 1 - 2^(-count/2) (ClassifierSample.activationFromCount)."""
    return 1.0 - np.power(2.0, -np.asarray(counts, dtype=np.float64) / 2.0)


class BinaryClassifierModel:
    """Vectorized replica of BinaryClassifierModel.java — the scalar
    per-sample loops collapse to numpy over the hidden dimension
    (training) and over whole batches (inference)."""

    def __init__(self, n_inputs: int, m_hidden: int, mode: str = "counted"):
        if mode not in ("binary", "counted"):
            raise ValueError(mode)
        self.n_inputs = n_inputs
        self.m_hidden = m_hidden
        self.mode = mode
        self.w1 = np.zeros((m_hidden, n_inputs), dtype=np.float64)
        self.b1 = np.zeros(m_hidden, dtype=np.float64)
        self.w2 = np.zeros(m_hidden, dtype=np.float64)
        self.b2 = 0.0

    @classmethod
    def for_training(
        cls, n_inputs: int, m_hidden: int, mode: str = "counted",
        seed: int = 451,
    ) -> "BinaryClassifierModel":
        """initializeWeights:472-488 — sequential Random(451) Gaussians,
        row-major w1 with He scale, then w2 with Glorot scale."""
        m = cls(n_inputs, m_hidden, mode)
        rng = JavaRandom(seed)
        hidden_scale = math.sqrt(2.0 / n_inputs)
        for i in range(m_hidden):
            for j in range(n_inputs):
                m.w1[i, j] = rng.next_gaussian() * hidden_scale
        out_scale = math.sqrt(2.0 / (m_hidden + 1))
        for i in range(m_hidden):
            m.w2[i] = rng.next_gaussian() * out_scale
        return m

    # -- inference ---------------------------------------------------

    def predict_one(self, x: np.ndarray, act: np.ndarray | None = None):
        if len(x) == 0:
            # NsfwDocumentFilter.isNsfw:66-67 — no features, no signal
            return 0.0
        if act is None:
            z1 = self.b1 + self.w1[:, x].sum(axis=1)
        else:
            z1 = self.b1 + self.w1[:, x] @ act
        a = np.maximum(z1, 0.0)
        return float(1.0 / (1.0 + np.exp(-(a @ self.w2 + self.b2))))

    def predict_batch(self, feats: list, acts: list | None = None):
        """Batch forward pass: scatter the sparse features into a dense
        (B, N) activation block, one matmul per layer.  Vocabulary sizes
        are small (hundreds-thousands); bound batch size upstream so
        B x N fits the worker heap."""
        b = len(feats)
        x = np.zeros((b, self.n_inputs), dtype=np.float64)
        empty = np.zeros(b, dtype=bool)
        for r, f in enumerate(feats):
            f = np.asarray(f, dtype=np.int64)
            if len(f) == 0:
                empty[r] = True
            elif acts is None:
                # accumulate (not assign): duplicate feature indices
                # must contribute once each, as predict_one's
                # w1[:, x].sum does (vocabulary output is deduplicated,
                # but the public API accepts raw index lists)
                np.add.at(x[r], f, 1.0)
            else:
                np.add.at(x[r], f, np.asarray(acts[r], dtype=np.float64))
        a = np.maximum(x @ self.w1.T + self.b1, 0.0)
        y = 1.0 / (1.0 + np.exp(-(a @ self.w2 + self.b2)))
        y[empty] = 0.0
        return y

    # -- training ----------------------------------------------------

    def train_sample(self, y0: float, x: np.ndarray,
                     act: np.ndarray | None, lr: float) -> float:
        """trainSample:233-301 / :312-368, vectorized over hidden units;
        update order preserved (w1+b1 from the pre-update w2, then
        w2+b2 from the cached hidden activations)."""
        x = np.asarray(x, dtype=np.int64)
        if act is None:
            z1 = self.b1 + self.w1[:, x].sum(axis=1)
        else:
            z1 = self.b1 + self.w1[:, x] @ act
        a = np.maximum(z1, 0.0)
        z2 = float(a @ self.w2 + self.b2)
        y = 1.0 / (1.0 + math.exp(-z2))

        eps = 1e-14
        yc = min(max(y, eps), 1.0 - eps)
        loss = -y0 * math.log(yc) - (1.0 - y0) * math.log(1.0 - yc)

        dl_dz2 = y - y0
        dl_dz1 = dl_dz2 * self.w2 * (z1 > 0.0)  # relu'
        # ufunc .at accumulates per OCCURRENCE of an index — the Java
        # loop subtracts once per occurrence, while a fancy-indexed
        # `w1[:, x] -= ...` would silently drop duplicates (buffered
        # scatter, last write wins); w1.T is a view, so this writes w1
        if act is None:
            np.subtract.at(self.w1.T, x, lr * dl_dz1)
        else:
            np.subtract.at(self.w1.T, x, lr * np.outer(act, dl_dz1))
        self.b1 -= lr * dl_dz1
        self.w2 -= lr * dl_dz2 * a
        self.b2 -= lr * dl_dz2
        return loss

    def training_epoch(self, samples: list, lr: float) -> float:
        total = 0.0
        for y0, x, act in samples:
            total += self.train_sample(
                y0, x, act if self.mode == "counted" else None, lr
            )
        return total

    def train(self, samples: list, epochs: int = 2000,
              lr: float = 0.01) -> list[float]:
        """train:217-225 (BinaryClassifierTrainer defaults: 2000 epochs,
        lr 0.01): lr decays x0.98 every 100 epochs.  Returns per-epoch
        total losses."""
        losses = []
        for i in range(epochs):
            losses.append(self.training_epoch(samples, lr))
            if i > 0 and i % 100 == 0:
                lr *= 0.98
        return losses

    # -- persistence (parquet instead of the reference's Slop table) --

    def save(self, path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "w1": pa.array([row.tolist() for row in self.w1],
                               pa.list_(pa.float64())),
                "b1": pa.array(self.b1.tolist(), pa.float64()),
                "w2": pa.array(self.w2.tolist(), pa.float64()),
            }
        )
        t = t.replace_schema_metadata(
            {
                "b2": repr(self.b2),
                "mode": self.mode,
                "n_inputs": str(self.n_inputs),
            }
        )
        pq.write_table(t, path)

    @classmethod
    def load(cls, path: str) -> "BinaryClassifierModel":
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        md = {k.decode(): v.decode() for k, v in t.schema.metadata.items()}
        m = cls(int(md["n_inputs"]), t.num_rows, md["mode"])
        m.w1 = np.array([list(r) for r in t["w1"].to_pylist()],
                        dtype=np.float64)
        m.b1 = np.asarray(t["b1"].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        m.w2 = np.asarray(t["w2"].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        m.b2 = float(md["b2"])
        return m
