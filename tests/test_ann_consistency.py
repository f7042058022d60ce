"""ANN variants (LSH q51, IVF q54) must agree with brute force (q50) on
every score they return, and their shapes must be bounded as designed."""

from __future__ import annotations

from docling_api_spark.operators.similarity import N_QUERIES, TOP_K, _scored_pairs
from docling_api_spark.plans import all_queries

QUERIES = all_queries()


def test_ivf_scores_agree_with_brute_force(spark, sf_dir):
    exact = {
        (r["q_vec"], r["n_vec"]): r["cosine"]
        for r in _scored_pairs(spark, sf_dir).collect()
    }
    ivf = QUERIES["q54_ann_ivf"].fn(spark, sf_dir).collect()
    assert 0 < len(ivf) <= N_QUERIES * TOP_K
    for r in ivf:
        assert (r["q_vec"], r["n_vec"]) in exact
        assert abs(r["cosine"] - exact[(r["q_vec"], r["n_vec"])]) < 1e-12

    # per-query row_number is contiguous from 1
    by_q: dict[int, list[int]] = {}
    for r in ivf:
        by_q.setdefault(r["q_vec"], []).append(r["rn"])
    for rns in by_q.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_ivf_invariant_under_corpus_order(spark, sf_dir, tmp_path):
    """q54's oracle relies on deterministic centroid init: the per-label
    mean goes through exact DECIMAL sums, so shuffling and repartitioning
    the embeddings corpus must not move a single cell assignment or change
    any returned cosine bit. Protects the oracle from partition-order
    nondeterminism at higher sf."""
    from pyspark.sql import functions as F

    baseline = QUERIES["q54_ann_ivf"].fn(spark, sf_dir).collect()

    perturbed_dir = tmp_path / "perturbed"
    perturbed_dir.mkdir()
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy(F.rand(seed=42))
        .repartition(7)
        .write.parquet(str(perturbed_dir / "embeddings.parquet"))
    )
    perturbed = QUERIES["q54_ann_ivf"].fn(spark, str(perturbed_dir)).collect()

    def key(rows):
        return sorted(tuple(r) for r in rows)

    assert key(perturbed) == key(baseline)


def test_lsh_scores_agree_with_brute_force(spark, sf_dir):
    exact = {
        (r["q_vec"], r["n_vec"]): r["cosine"]
        for r in _scored_pairs(spark, sf_dir).collect()
    }
    lsh = QUERIES["q51_ann_lsh"].fn(spark, sf_dir).collect()
    assert len(lsh) <= N_QUERIES * TOP_K
    for r in lsh:
        assert abs(r["cosine"] - exact[(r["q_vec"], r["n_vec"])]) < 1e-12


def test_drift_bit_identical_under_corpus_order(spark, sf_dir, tmp_path):
    """q55/q79's whole correctness argument is that DECIMAL element sums
    make the centroid independent of partial-aggregation order: shuffling
    and repartitioning the corpus must not change a single output BIT of
    either query (no tolerance — exact tuple equality on the doubles)."""
    from pyspark.sql import functions as F

    base55 = QUERIES["q55_embedding_drift"].fn(spark, sf_dir).collect()
    base79 = QUERIES["q79_embedding_outliers"].fn(spark, sf_dir).collect()

    perturbed_dir = tmp_path / "perturbed"
    perturbed_dir.mkdir()
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy(F.rand(seed=7))
        .repartition(11)
        .write.parquet(str(perturbed_dir / "embeddings.parquet"))
    )
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(5)
        .write.parquet(str(perturbed_dir / "documents.parquet"))
    )

    def key(rows):
        return sorted(tuple(r) for r in rows)

    assert key(QUERIES["q55_embedding_drift"].fn(spark, str(perturbed_dir)).collect()) == key(base55)
    assert key(QUERIES["q79_embedding_outliers"].fn(spark, str(perturbed_dir)).collect()) == key(base79)
