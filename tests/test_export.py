"""Output-format export seam (reference OutputFormat taxonomy) + health probes."""

from __future__ import annotations

import base64
import json

import pytest

from docling_api_spark.pipeline.convert import convert_documents
from docling_api_spark.pipeline.export import export_results
from docling_api_spark.session import liveness, readiness, readiness_status
from docling_api_spark.sources.binaryfiles import read_documents

PNG = b"\x89PNG\r\n\x1a\n" + b"\x01" * 8


@pytest.fixture()
def converted(spark, tmp_path):
    (tmp_path / "notes.md").write_bytes(b"# Title\n\nsome *emphasis* here")
    (tmp_path / "photo.png").write_bytes(PNG)
    (tmp_path / "bad.xyz").write_bytes(b"unrecognized")
    return convert_documents(read_documents(spark, str(tmp_path)))


def test_markdown_export_is_identity(converted):
    rows = {r["filename"]: r for r in export_results(converted, "md").collect()}
    assert rows["notes"]["content"].startswith("# Title")
    assert rows["bad.xyz"]["content"] is None and rows["bad.xyz"]["error"]


def test_text_export_strips_markup(converted):
    rows = {r["filename"]: r for r in export_results(converted, "text").collect()}
    assert "#" not in rows["notes"]["content"]
    assert "*" not in rows["notes"]["content"]
    assert "emphasis" in rows["notes"]["content"]


def test_doctags_export_wraps_and_tags(converted):
    rows = {r["filename"]: r for r in export_results(converted, "doctags").collect()}
    assert rows["notes"]["content"].startswith("<doc>")
    assert rows["notes"]["content"].endswith("</doc>")


def test_json_export_base64_images_and_null_omission(converted):
    rows = {r["filename"]: r for r in export_results(converted, "json").collect()}
    photo = json.loads(rows["photo"]["content"])
    assert base64.b64decode(photo["images"][0]["image"]) == PNG
    assert "error" not in photo  # nulls omitted, reference exclude_unset
    bad = json.loads(rows["bad.xyz"]["content"])
    assert "markdown" not in bad and bad["error"]


def test_unknown_format_rejected(converted):
    with pytest.raises(ValueError, match="unknown output format"):
        export_results(converted, "pdf")


def test_health_probes(spark):
    assert liveness(spark) is True
    assert readiness(spark) is True


def test_readiness_status_ok_and_degraded(spark):
    assert readiness_status(spark, timeout=30.0) == {
        "status": "ok",
        "scheduler": "ok",
    }
    # a hung scheduler degrades after the timeout instead of wedging: zero
    # timeout guarantees the probe future cannot complete in time
    out = readiness_status(spark, max_retries=0, timeout=0.0)
    assert out["status"] == "degraded"
    assert "unreachable" in out["scheduler"]
