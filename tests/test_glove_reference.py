"""Pure-numpy full-batch replica of the distributed GloVe trainer.

The strongest semantic tooth for H5 (SURVEY.md §5.3): the distributed
pipeline (Arrow-batched gradient kernel with in-batch partial
aggregation → cogrouped fused merge+AdaGrad step) must compute the
SAME full-batch AdaGrad dynamics as a ~40-line sequential numpy
implementation driven from the same co-occurrence matrix and the same
seeded init. Any error in the merge (double-counted partials, wrong
mean normalization, stale-parameter reads, accumulator-update order)
diverges within an iteration or two; summation-order float noise stays
around 1e-12 over 8 iterations — asserted at 1e-9.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_glove_spark.glove import Glove
from spark_glove_spark.glove.trainer import (
    GloveConfig,
    build_cooccurrence,
    build_vocabulary,
)

CFG = dict(dim=6, window=4, min_count=2, iterations=8, seed=11, blocks=2)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "red green blue red green red"),
        (1, "blue blue green red yellow green"),
        (2, "yellow red red green blue yellow"),
        (3, "green yellow blue blue red green"),
        (4, "red blue yellow green green blue"),
        (5, "blue green red yellow red blue"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _numpy_reference(X: np.ndarray, ids: list[int], cfg: GloveConfig):
    """Sequential full-batch AdaGrad with per-word MEAN gradients —
    the semantics trainer.py implements distributively."""
    dim, eta = cfg.dim, cfg.eta
    n = len(ids)
    pos = {wid: k for k, wid in enumerate(ids)}
    W = np.zeros((n, dim))
    WC = np.zeros((n, dim))
    for wid in ids:
        rng = np.random.default_rng([cfg.seed, int(wid)])
        vecs = (rng.random((2, dim)) - 0.5) / dim
        W[pos[wid]], WC[pos[wid]] = vecs[0], vecs[1]
    b = np.zeros(n)
    bc = np.zeros(n)
    GW = np.ones((n, dim))
    GWC = np.ones((n, dim))
    gb = np.ones(n)
    gbc = np.ones(n)

    ii = np.array([pos[int(i)] for i in X[:, 0]], dtype=int)
    jj = np.array([pos[int(j)] for j in X[:, 1]], dtype=int)
    logx, fx = X[:, 3], X[:, 4]

    losses = []
    for _ in range(cfg.iterations):
        diff = (W[ii] * WC[jj]).sum(axis=1) + b[ii] + bc[jj] - logx
        fd = fx * diff
        losses.append(0.5 * float((fd * diff).sum()))

        def mean_grads(idx, gvec, gbias):
            dv = np.zeros((n, gvec.shape[1]))
            db = np.zeros(n)
            dn = np.zeros(n)
            np.add.at(dv, idx, gvec)
            np.add.at(db, idx, gbias)
            np.add.at(dn, idx, 1)
            m = dn > 0
            dv[m] /= dn[m, None]
            db[m] /= dn[m]
            return dv, db, m

        dW, dB, mi = mean_grads(ii, fd[:, None] * WC[jj], fd)
        dWC, dBC, mj = mean_grads(jj, fd[:, None] * W[ii], fd)
        # synchronous step: all gradients from pre-step parameters
        W[mi] -= eta * dW[mi] / np.sqrt(GW[mi])
        GW[mi] += dW[mi] ** 2
        b[mi] -= eta * dB[mi] / np.sqrt(gb[mi])
        gb[mi] += dB[mi] ** 2
        WC[mj] -= eta * dWC[mj] / np.sqrt(GWC[mj])
        GWC[mj] += dWC[mj] ** 2
        bc[mj] -= eta * dBC[mj] / np.sqrt(gbc[mj])
        gbc[mj] += dBC[mj] ** 2

    vectors = {wid: W[pos[wid]] + WC[pos[wid]] for wid in ids}
    return losses, vectors


def test_distributed_fit_matches_numpy_reference(spark, corpus):
    cfg = GloveConfig(**CFG)
    vocab = build_vocabulary(corpus, cfg)
    x = build_cooccurrence(corpus, vocab, cfg).toPandas()
    assert len(x) > 10, "fixture corpus produced a degenerate X"
    ids = [r.id for r in vocab.select("id").collect()]

    ref_losses, ref_vectors = _numpy_reference(
        x[["i", "j", "x", "logx", "fx"]].to_numpy(), ids, cfg
    )

    model = Glove(**CFG).fit(corpus)
    assert len(model.losses) == cfg.iterations
    np.testing.assert_allclose(model.losses, ref_losses, rtol=1e-9)

    got = {r.id: np.array(r.vector) for r in model.vectors.collect()}
    assert set(got) == set(ref_vectors)
    for wid in ids:
        np.testing.assert_allclose(
            got[wid], ref_vectors[wid], atol=1e-9,
            err_msg=f"vector mismatch for word id {wid}",
        )
