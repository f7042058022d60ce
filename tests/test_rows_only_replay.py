"""Independent replay pins for queries that previously had no
sf-parameterized check (q23 sketches, q43 xxhash twin, and the r11
hash-graded flips q72 conversion + q80 media stub — the bit-stability
pins stay).
The remaining rows-only entries (q118_approx, q171, q240) and the
r11-flipped q257 already have sf_dir-parameterized replay tests in
test_round4_ops / test_round4b_ops / test_round4d_ops.

Run the whole rows-only family at the driver's bench scale with:

    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 python -m pytest \
        tests/test_rows_only_replay.py \
        tests/test_round4_ops.py::test_approx_equidepth_matches_exact_within_tolerance \
        tests/test_round4b_ops.py::test_hll_rollup_tracks_exact_distincts \
        tests/test_round4b_ops.py::test_debounce_matches_brute_force \
        tests/test_round4d_ops.py::test_q240_compression_matches_zlib \
        tests/test_round4d_ops.py::test_q246_isotonic_matches_python_pava \
        tests/test_round4d_ops.py::test_q251_lcs_matches_python_dp \
        tests/test_round4d_ops.py::test_q257_dtw_matches_python_dp -q
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from docling_api_spark.plans import all_queries

QS = all_queries()


# ---------------------------------------------------------------------------
# q23 — approximate aggregates: rank/cardinality error bounds vs exact
# ---------------------------------------------------------------------------
def test_q23_approx_aggs_within_error_bounds(spark, sf_dir, oracle_con):
    """The sketches are engine-specific but their error is contractual:
    approx_count_distinct uses HLL++ with default rsd=0.05 (assert within
    15% of the exact distinct count — 3 sigma), and percentile_approx
    with default accuracy=10000 has rank error <= 1/10000 (assert the
    realized rank of the returned element within 2% of target, slack for
    tied values). n is exact and must match exactly."""
    rows = {r["event_type"]: r for r in QS["q23_approx_aggs"].fn(spark, sf_dir).collect()}
    exact = {
        r[0]: (r[1], r[2])
        for r in oracle_con.sql(
            "SELECT event_type, COUNT(DISTINCT user_id), COUNT(*)"
            " FROM events GROUP BY 1"
        ).fetchall()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        ex_users, ex_n = exact[et]
        assert r["n"] == ex_n, et
        assert abs(r["approx_users"] - ex_users) <= max(3, 0.15 * ex_users), et
        for col, target in (("p50_value", 0.50), ("p95_value", 0.95)):
            frac_le, frac_lt = oracle_con.sql(
                f"SELECT AVG(CASE WHEN value <= {r[col]} THEN 1.0 ELSE 0.0 END),"
                f"       AVG(CASE WHEN value <  {r[col]} THEN 1.0 ELSE 0.0 END)"
                f" FROM events WHERE event_type = '{et}'"
            ).fetchall()[0]
            # the target rank must fall inside the returned element's rank
            # span (plus rank-error slack): percentile_approx returns an
            # actual column element
            assert frac_lt - 0.02 <= target <= frac_le + 0.02, (et, col, frac_lt, frac_le)


# ---------------------------------------------------------------------------
# q43 xxhash64 twin — exact-jaccard replay + recall parity with the md5 run
# ---------------------------------------------------------------------------
def test_q43_xxh_verified_pairs_replay_and_recall(spark, sf_dir):
    """The output is the CANDIDATE set with exact-Jaccard verification
    attached (no threshold filter), so low-similarity band collisions
    legitimately differ between hash families. Two pins instead:
    (1) every pair the xxh twin reports carries the true 3-gram-shingle
    n_common/jaccard — recomputed here in pure python from the texts;
    (2) the high-similarity pairs (jaccard >= 0.8, the regime LSH is
    designed to recall) must be identical between the production xxh
    family and the oracle-checked md5 family — a recall gap surfaces
    here."""
    md5 = [tuple(r) for r in QS["q43_minhash_lsh"].fn(spark, sf_dir).collect()]
    xxh = [tuple(r) for r in QS["q43_minhash_lsh_xxh"].fn(spark, sf_dir).collect()]
    assert len(xxh) > 0

    ids = {d for a, b, *_ in xxh for d in (a, b)}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F_col_in("doc_id", ids))
        .select("doc_id", "text")
        .collect()
    }

    def shingles(text: str) -> set:
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for doc_a, doc_b, n_common, jaccard in xxh:
        sa, sb = shingles(texts[doc_a]), shingles(texts[doc_b])
        inter = len(sa & sb)
        assert n_common == inter, (doc_a, doc_b)
        expect = inter / (len(sa) + len(sb) - inter)
        assert math.isclose(jaccard, expect, rel_tol=1e-12), (doc_a, doc_b)

    hi_md5 = {(a, b) for a, b, _, j in md5 if j >= 0.8}
    hi_xxh = {(a, b) for a, b, _, j in xxh if j >= 0.8}
    assert hi_md5 == hi_xxh


def F_col_in(col: str, values: set):
    from pyspark.sql import functions as F

    return F.col(col).isin(*values)


# ---------------------------------------------------------------------------
# q72 — conversion pipeline invariants + bit-stable determinism
# ---------------------------------------------------------------------------
def test_q72_conversion_invariants_and_determinism(spark, sf_dir):
    rows1 = sorted(map(tuple, QS["q72_conversion_pipeline"].fn(spark, sf_dir).collect()))
    rows2 = sorted(map(tuple, QS["q72_conversion_pipeline"].fn(spark, sf_dir).collect()))
    assert rows1 == rows2, "conversion output is not deterministic"
    assert len(rows1) > 0
    for path, fmt, filename, md_len, n_images, error, ok in rows1:
        assert ok == (error is None)
        if ok:
            assert md_len is not None and md_len > 0, (path, fmt)
        else:
            assert md_len is None, (path, fmt)


# ---------------------------------------------------------------------------
# q80 — media feature stub replayed in pure python/numpy from the raw bytes
# ---------------------------------------------------------------------------
def test_q80_features_match_python_replay(spark, sf_dir):
    """The stub path is a pure function of the media bytes (byte-histogram
    Simpson index + md5-seeded embedding); recompute it outside Spark from
    the same corpus and compare value-for-value — EXACT equality since the
    r11 flip to transcendental-free arithmetic (the property the q80
    oracle's bit-replay rests on). (Pillow absent in this sandbox, and
    the synthetic corpus is undecodable text bytes anyway, so the stub
    path is the one that runs.)"""
    from docling_api_spark.operators.multimodal import _media_corpus

    out = {r["doc_id"]: r for r in QS["q80_media_features"].fn(spark, sf_dir).collect()}
    src = _media_corpus(spark, sf_dir).select(
        "doc_id", "media", "meta.kind", "meta.width", "meta.height"
    ).collect()
    assert len(out) == len(src) > 0
    for doc_id, media, kind, width, height in map(tuple, src):
        raw = bytes(media)
        vals = np.frombuffer(raw, dtype=np.uint8)
        counts = np.bincount(vals, minlength=256)
        n = max(len(vals), 1)
        ss = int((counts.astype(np.int64) ** 2).sum())
        digest = hashlib.md5(raw).digest()
        r = out[doc_id]
        assert r["kind"] == kind and r["n_bytes"] == len(raw)
        assert r["aspect"] == width / height
        assert r["simpson"] == ss / (n * n), doc_id
        for i in range(8):
            expect = int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
            assert r[f"f{i}"] == expect, (doc_id, i)
