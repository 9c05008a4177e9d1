"""Round-10 additions: complete-recall SimHash (bands="auto"), the
composed IVF-PQ serving path, and semantic keep/drop dedup.  Each is
checked against an independent driver-side Python recomputation (the
DuckDB hash gate is scripts/check_oracle.py + the driver); the deeper
architecture tests live in tests/test_operators.py (auto-band
pigeonhole property) and tests/test_vector_functions.py (trained
residual-PQ quality).
"""

import numpy as np
import pandas as pd
import pytest

from vector_db_ingestor_spark.queries import PROBE_64, QUERIES, _ivfpq_params


def test_semantic_dedup_known_components(spark):
    """keep/drop verdicts on a corpus with KNOWN component structure:
    two chained near-dup groups plus singletons.  The chain case
    matters — a-b and b-c over threshold with a-c possibly under it
    must still collapse into ONE cluster (connected components, not
    pairwise grouping), and only the min id survives."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.dedup import embedding_near_dups
    from vector_db_ingestor_spark.operators.dedup import dedup_clusters

    dim = EMBEDDING_DIM
    base_a = [1.0 if i % 7 == 0 else 0.1 for i in range(dim)]
    base_b = [1.0 if i % 5 == 0 else -0.1 for i in range(dim)]

    def nudge(v, eps, seed):
        # deterministic small rotation: chained members stay >= 0.9
        # cosine to their neighbor
        return [x + eps * ((seed * (i + 1)) % 3 - 1) * 0.01 for i, x in enumerate(v)]

    rows = [
        (0, base_a),
        (1, nudge(base_a, 1.0, 2)),
        (2, nudge(nudge(base_a, 1.0, 2), 1.0, 3)),  # chains through 1
        (10, base_b),
        (11, nudge(base_b, 1.0, 5)),
        (20, [(-1.0) ** i * (1.0 + 0.01 * i) for i in range(dim)]),  # singleton
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    pairs = embedding_near_dups(emb, threshold=0.9, dim=dim, n_bits=4)
    clusters = dedup_clusters(pairs, emb, id_col="vec_id")
    got = {
        r["vec_id"]: (r["cluster_id"], r["vec_id"] == r["cluster_id"])
        for r in clusters.selectExpr(
            "vec_id", "cluster_id"
        ).collect()
    }
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)  # reached via the chain
    assert got[10] == (10, True)
    assert got[11] == (10, False)
    assert got[20] == (20, True)


def test_semantic_dedup_verdict_shape_on_fixtures(spark, sf_dir):
    """Fixture-level contract: exactly one keep per cluster, every
    cluster_id is a member's min id, and drops exist (the embedding
    channel finds near-dups the fixtures are built to contain)."""
    pdf = QUERIES["q_dedup_semantic"](spark, sf_dir).toPandas()
    assert set(pdf.columns) == {"vec_id", "cluster_id", "keep"}
    grp = pdf.groupby("cluster_id")
    assert (grp["keep"].sum() == 1).all()
    assert (grp["vec_id"].min() == [c for c, _ in grp]).all()
    assert (~pdf["keep"]).sum() > 0
    assert pdf["keep"].sum() < len(pdf)


def test_ivfpq_matches_python_recompute_on_fixtures(spark, sf_dir):
    """q_ann_ivfpq's top-10 equals a from-scratch numpy replay of
    routing (rounded cosine argmax), residual PQ encode (rounded
    reduced-L2 argmin), and literal-table ADC over the fixture
    embeddings — independent of both Spark expressions and the DuckDB
    oracle."""
    from vector_db_ingestor_spark.operators.similarity import (
        ivf_shortlist,
        pq_adc_tables,
    )

    cents, cbs, m, _ = _ivfpq_params()
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.array(pdf["embedding"].tolist(), dtype=float)
    ids = pdf["vec_id"].to_numpy()
    C = np.array(cents)
    q = np.array(PROBE_64)
    dsub = V.shape[1] // m

    sims = np.round(
        (V @ C.T)
        / (np.linalg.norm(V, axis=1, keepdims=True) * np.linalg.norm(C, axis=1)),
        6,
    )
    cid = np.argmax(sims, axis=1)
    short = ivf_shortlist(cents, PROBE_64, 4)
    mask = np.isin(cid, short)
    Vs, cs, ids_s = V[mask], cid[mask], ids[mask]

    R = Vs - C[cs]
    codes = []
    for s in range(m):
        cb = np.array(cbs[s])
        sub = R[:, s * dsub:(s + 1) * dsub]
        d = np.round(-2 * sub @ cb.T + (cb * cb).sum(1), 6)
        codes.append(np.argmin(d, axis=1))
    tabs = np.array(pq_adc_tables(PROBE_64, cbs))
    score = np.round(
        (C[cs] @ q) + sum(tabs[s][codes[s]] for s in range(m)), 6
    )
    order = np.lexsort((ids_s, -score))
    want = [(int(ids_s[i]), int(cs[i]), float(score[i])) for i in order[:10]]

    got = [
        (r["vec_id"], r["cid"], r["score"])
        for r in QUERIES["q_ann_ivfpq"](spark, sf_dir).collect()
    ]
    assert got == pytest.approx(want)


def test_simhash_auto_query_is_superset_of_banded_default(spark, sf_dir):
    """On the fixtures, the complete-recall key must contain every pair
    the partial-recall 4-band key emits (same Hamming filter, strictly
    more candidate coverage) and strictly more — the gap IS the
    documented 4-band recall loss at max_hamming=10."""
    auto = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in QUERIES["q_dedup_simhash_auto"](spark, sf_dir).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    }
    assert banded < auto


def test_lm_score_matches_python_recompute(spark, sf_dir):
    """q_text_lm_score vs a from-scratch Python bigram LM over the same
    fixtures: identical tokenization, add-alpha smoothing, micro-nat
    integer encoding, and per-doc averaging — independent of both the
    Spark expressions and the DuckDB oracle.  Python's round() is
    banker's, so the micro-nat step uses Decimal HALF_UP to match the
    engines' half-away rounding (oracle-parity rule)."""
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from vector_db_ingestor_spark.queries import _LM_ALPHA, QUERIES

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = {
        r.doc_id: re.split(r"\s+", r.text.strip().lower())
        for r in pdf.itertuples()
    }
    docs = {d: w for d, w in docs.items() if len(w) >= 2}
    c2, c1, vocab = Counter(), Counter(), set()
    for w in docs.values():
        vocab.update(w)
        for x, y in zip(w, w[1:]):
            c2[(x, y)] += 1
            c1[x] += 1
    a, V = _LM_ALPHA, len(vocab)
    import math

    def micro(p):
        return int(
            Decimal(repr(-math.log(p) * 1e6)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    want = {}
    for d, w in docs.items():
        mns = [
            micro((c2[(x, y)] + a) / (c1[x] + a * V)) for x, y in zip(w, w[1:])
        ]
        n = len(mns)
        want[d] = (
            n,
            float(
                Decimal(repr(sum(mns) / (n * 1e6))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in QUERIES["q_text_lm_score"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d
    # the signal discriminates: fixture corpus spans a real nll range
    vals = [v for _, v in got.values()]
    assert max(vals) - min(vals) > 0.1
