"""int8 quantization: retrieval-quality property.

The Spark-side quantization arithmetic is fully oracle-checked
(h16_int8_quant); this pins the PROPERTY that makes it usable for
similarity search — top-k neighbors computed on reconstructed int8
vectors agree with exact float top-k (high recall, tiny MSE).
Pure-numpy replica of the exact same floor(x/scale + 0.5) kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.stack(t["embedding"].to_numpy()).astype("float64")


def _quantize(x):
    scale = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
    q = np.floor(x / scale[:, None] + 0.5)
    return q, scale


def test_int8_codes_in_range():
    x = _load()
    q, _ = _quantize(x)
    assert q.max() <= 127 and q.min() >= -127


def test_reconstruction_mse_small():
    x = _load()
    q, scale = _quantize(x)
    recon = q * scale[:, None]
    mse = ((x - recon) ** 2).mean()
    # unit-norm 64-d vectors: per-dim magnitude ~1/8, int8 grid error
    # bounded by (scale/2)^2 per dim
    assert mse < 1e-5


def test_quantized_topk_recall():
    x = _load()
    q, scale = _quantize(x)
    recon = q * scale[:, None]
    probes = x[:20]
    exact = np.argsort(-(probes @ x.T), axis=1)[:, 1:11]
    approx = np.argsort(-(probes @ recon.T), axis=1)[:, 1:11]
    overlap = np.mean(
        [len(set(e) & set(a)) / 10.0 for e, a in zip(exact, approx)]
    )
    assert overlap >= 0.8, overlap


def test_ppm_decode_roundtrip():
    """decode_media really parses P6 bytes: handcrafted 2x1 image."""
    from spark_glove_spark.operators.multimodal import decode_media

    img = decode_media(b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252]), "image")
    assert img.shape == (1, 2, 3)
    assert img.tolist() == [[[1, 2, 3], [250, 251, 252]]]


def test_ppm_synth_matches_closed_form():
    from spark_glove_spark.operators.multimodal import decode_media, synth_ppm

    img = decode_media(synth_ppm(11), "image")
    assert img.shape == (8, 8, 3)
    flat = img.reshape(-1)
    assert all(int(flat[i]) == (11 * 7 + i * 13) % 256 for i in range(192))


def test_compressed_formats_still_raise():
    import pytest

    from spark_glove_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n....", "image")


def test_wav_decode_roundtrip():
    from spark_glove_spark.operators.multimodal import decode_wav, synth_wav

    s = decode_wav(synth_wav(5))
    assert len(s) == 64
    assert all(
        int(s[i]) == ((5 * 31 + i * 17) % 65536) - 32768 for i in range(64)
    )


def test_wav_rejects_non_riff():
    import pytest

    from spark_glove_spark.operators.multimodal import decode_wav

    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x04...mp3 bytes...")


def test_quantized_knn_recall_vs_exact(spark):
    """The declared two-stage query (int8 candidate scan -> exact
    re-rank) must recover >= 0.9 of the exact h15 top-10."""
    from spark_glove_spark import api

    sf = SF
    exact = api.REGISTRY["h15_knn_bruteforce"].fn(spark, sf).collect()
    approx = api.REGISTRY["h16_quantized_knn"].fn(spark, sf).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in approx:
        ap.setdefault(r["probe_id"], set()).add(r["vec_id"])
    assert set(ex) == set(ap)
    recall = sum(len(ex[p] & ap[p]) for p in ex) / sum(len(ex[p]) for p in ex)
    assert recall >= 0.9, recall


def _recall_vs_exact(spark, qname, sf):
    from spark_glove_spark import api

    exact = api.REGISTRY["h15_knn_bruteforce"].fn(spark, sf).collect()
    approx = api.REGISTRY[qname].fn(spark, sf).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in approx:
        ap.setdefault(r["probe_id"], set()).add(r["vec_id"])
    return sum(len(ex[p] & ap.get(p, set())) for p in ex) / sum(
        len(ex[p]) for p in ex
    )


def test_pq_ann_recall_vs_exact(spark):
    """Product quantization (8 subspaces x 16 centroids, ADC scoring,
    exact re-rank of 100 survivors) must recover >= 0.7 of the exact
    h15 top-10 (VERDICT r3 item 6; measured 0.88 at sf0.001 AND
    sf0.01 after the re-rank depth went 30 -> 100; depth 30 measured
    only 0.48/0.58)."""
    recall = _recall_vs_exact(spark, "h16_pq_ann", SF)
    assert recall >= 0.7, recall


def test_lsh_multitable_recall_vs_exact(spark):
    """Multi-table LSH (4 planes x 3 tables, 1-bit multiprobe) must
    recover >= 0.85 of the exact top-10 at sf0.001 (deterministic
    seeded hyperplanes: measured 0.94 here, 0.80 at sf0.01 — vs
    0.48/0.50 for the single-table budget point)."""
    recall = _recall_vs_exact(spark, "h16_lsh_multitable", SF)
    assert recall >= 0.85, recall


def test_opq_ann_recall_matches_plain_pq_on_isotropic_fixture(spark):
    """Parametric OPQ (PCA + eigenvalue allocation, re-rank depth 30)
    must at least match plain PQ@30's measured floor. On this
    near-isotropic fixture the rotation is a provable no-op (subspace
    variances are already balanced), so parity IS the expected
    result — the test guards the machinery (rotation preserves dots,
    allocation covers all dims) rather than a lift."""
    recall = _recall_vs_exact(spark, "h16_opq_ann", SF)
    assert recall >= 0.4, recall


def test_ivfpq_persisted_equals_inmemory_and_prunes_partitions(spark, tmp_path):
    """The composed IVF-PQ index (VERDICT r10 item 4) must (a) store
    codes ONLY — no float vectors in the inverted lists, that's the
    32x memory point; (b) prune its code scan to the wanted lists via
    a PARTITION filter; and (c) answer probes IDENTICALLY to the
    in-memory ivfpq_knn composition at the same seed (shared
    quantizers + shared _ivfpq_score tail make this exact, not
    approximate)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from spark_glove_spark.operators.ann import (
        ivfpq_build_index,
        ivfpq_knn,
        ivfpq_probe_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    ivfpq_build_index(e, str(tmp_path), n_lists=10, m=8, ksub=16, seed=42)
    dirs = glob.glob(os.path.join(str(tmp_path), "lists", "list_id=*"))
    assert len(dirs) == 10
    part = glob.glob(
        os.path.join(str(tmp_path), "lists", "**", "*.parquet"), recursive=True
    )[0]
    names = set(pq.read_schema(part).names)
    assert "codes" in names and "embedding" not in names, names
    got = ivfpq_probe_index(
        spark, str(tmp_path), e, probes, k=10, n_probe=3, shortlist=100
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the plan has TWO parquet scans (pruned code lists + the corpus
    # re-rank fetch); the LISTS scan must carry the list_id partition
    # predicate
    pruned = [
        c[:300]
        for c in plan.split("PartitionFilters")[1:]
        if "list_id" in c[:300] and ("IN" in c[:300] or "In(" in c[:300])
    ]
    assert pruned, plan
    mem = ivfpq_knn(
        e, probes, k=10, n_lists=10, m=8, ksub=16, n_probe=3,
        shortlist=100, seed=42,
    )
    key = lambda df: sorted(  # noqa: E731
        (r["probe_id"], r["vec_id"], r["label"], r["cos"])
        for r in df.collect()
    )
    assert key(got) == key(mem)


def test_ivfpq_persisted_recall_vs_exact(spark):
    """The declared composed-index query must recover >= 0.55 of the
    exact h15 top-10 at sf0.001 (measured 0.62 here, 0.72 at sf0.01
    with residual encoding — deterministic: seeded quantizers over the
    hash-ordered sample; n_probe=3 of 10 lists bounds the candidate
    budget to ~30% of the corpus, and ADC@shortlist-100 then exact
    re-rank recovers what the pruning kept — recall is n_probe-bound
    on this fixture, not ADC-bound)."""
    recall = _recall_vs_exact(spark, "h16_ivfpq_persisted", SF)
    assert recall >= 0.55, recall
