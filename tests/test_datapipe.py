"""Semantics tests for the curation-pass operators (operators/datapipe.py)
on constructed corpora — the oracle parity sweep checks cross-engine
equality; these pin that the operators do the RIGHT thing."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_api_spark.plans import all_queries

QUERIES = all_queries()


def write_documents(path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, path / "documents.parquet")


def words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_paragraph_dedup_identity_when_all_chunks_unique(spark, tmp_path):
    a = words("alpha", 45)  # 3 chunks (20+20+5), all unique
    b = words("beta", 25)
    write_documents(tmp_path, [(1, a, "en", "s"), (2, b, "en", "s")])
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q97_paragraph_dedup"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_chunks"] == 3 and rows[1]["n_kept"] == 3
    assert rows[1]["rebuilt_md5"] == hashlib.md5(a.encode()).hexdigest()
    assert rows[2]["rebuilt_md5"] == hashlib.md5(b.encode()).hexdigest()


def test_paragraph_dedup_drops_repeated_chunk_globally(spark, tmp_path):
    shared = words("common", 20)
    tail = words("tailb", 20)
    write_documents(
        tmp_path,
        [(1, shared + " " + words("taila", 20), "en", "s"),
         (2, shared + " " + tail, "en", "s")],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q97_paragraph_dedup"].fn(spark, str(tmp_path)).collect()
    }
    # doc 1 (lower id) keeps the shared chunk; doc 2 loses it but keeps its tail
    assert rows[1]["n_kept"] == 2
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["rebuilt_md5"] == hashlib.md5(tail.encode()).hexdigest()


def test_repetition_filter_keeps_diverse_drops_spam(spark, tmp_path):
    diverse = words("w", 60)  # 60 distinct words
    spam = " ".join(["buy now"] * 30)  # top word 50%, top bigram ~50%
    write_documents(tmp_path, [(1, diverse, "en", "s"), (2, spam, "en", "s")])
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q68_repetition_filter"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False
    assert rows[2]["n_distinct"] == 2  # 'buy', 'now'
    assert rows[2]["top_word_n"] == 30


def test_temperature_mix_is_deterministic_and_flattens_shares(spark, tmp_path):
    # heavily skewed corpus: 400 docs from 'big', 20 from 'small'
    rows_in = [(i, words("t", 5, start=i), "en", "big") for i in range(400)]
    rows_in += [(1000 + i, words("u", 5, start=i), "en", "small") for i in range(20)]
    write_documents(tmp_path, rows_in)
    got1 = QUERIES["q95_temperature_mix"].fn(spark, str(tmp_path)).collect()
    got2 = QUERIES["q95_temperature_mix"].fn(spark, str(tmp_path)).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))  # deterministic
    by_source = {"big": 0, "small": 0}
    for r in got1:
        by_source[r["source"]] += 1
    # temperature 0.5 oversamples the rare source relative to its raw share:
    # sample share of 'small' must exceed its corpus share (20/420 ≈ 4.8%)
    assert by_source["small"] / len(got1) > 20 / 420
    # and the big source still dominates absolutely
    assert by_source["big"] > by_source["small"]


def test_contamination_flags_only_real_overlap(spark, tmp_path):
    bench_text = words("shared", 8) + " " + words("benchonly", 8)
    clean = words("clean", 16)
    dirty = words("shared", 8) + " " + words("dirtytail", 8)
    write_documents(
        tmp_path,
        # doc_id 0 ≡ 0 mod 97 → the benchmark slice
        [(0, bench_text, "en", "s"), (1, clean, "en", "s"), (2, dirty, "en", "s")],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q69_contamination_check"].fn(spark, str(tmp_path)).collect()
    }
    assert 0 not in rows  # benchmark docs are excluded from the report
    assert rows[1]["contaminated"] is False and rows[1]["n_contaminated"] == 0
    assert rows[2]["contaminated"] is True and rows[2]["n_contaminated"] == 1


def test_pii_redaction_counts_and_scrubs(spark, tmp_path):
    write_documents(tmp_path, [(7, "hello world", "en", "s")])
    r = QUERIES["q67_pii_redaction"].fn(spark, str(tmp_path)).collect()[0].asDict()
    assert r["n_emails"] == 1 and r["n_phones"] == 1
    expected = "hello world contact [EMAIL] or [PHONE]"
    assert r["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
