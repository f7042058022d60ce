"""Result-export formats (reference OutputFormat taxonomy, utils.py:20-24:
MARKDOWN | JSON | TEXT | DOCTAGS).

The conversion stage always produces markdown + images; export is a
projection over that result — all Catalyst built-ins (`to_json`,
`regexp_replace`, `base64`), no UDF. Binary image payloads are base64'd
only here, at the serving edge (the reference base64s inside the pipeline,
service.py:128 — keeping bytes binary until export avoids the 4/3 size
inflation through every shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OUTPUT_FORMATS = ("md", "json", "text", "doctags")


def _markdown_to_text(md: Column) -> Column:
    """Cheap markdown→plain-text: strip emphasis/heading/table markup."""
    out = F.regexp_replace(md, r"(?m)^#{1,6}\s*", "")
    out = F.regexp_replace(out, r"[*_`]", "")
    out = F.regexp_replace(out, r"(?m)^\|", "")
    out = F.regexp_replace(out, r"\|", " ")
    out = F.regexp_replace(out, r"(?m)^-{3,}.*$", "")
    return F.regexp_replace(out, r"[ \t]+", " ")


def _markdown_to_doctags(md: Column) -> Column:
    """Minimal doctags rendering: wrap the document and mark image refs.

    A real doctags export needs the full layout tree (docling backend);
    this stub keeps the output-format seam exercised end to end.
    """
    tagged = F.regexp_replace(md, r"<!-- image -->", "<image/>")
    return F.concat(F.lit("<doc>"), tagged, F.lit("</doc>"))


def export_results(converted: DataFrame, output_format: str = "md") -> DataFrame:
    """Project CONVERSION_OUTPUT rows into the requested output format.

    Returns (path, filename, content, error); `content` is the rendered
    document (null on error rows), images ride inside the JSON rendering
    base64-encoded and are dropped from the scalar renderings.
    """
    if output_format not in OUTPUT_FORMATS:
        raise ValueError(
            f"unknown output format {output_format!r}; expected one of {OUTPUT_FORMATS}"
        )
    md = F.col("markdown")
    if output_format == "md":
        content = md
    elif output_format == "text":
        content = _markdown_to_text(md)
    elif output_format == "doctags":
        content = F.when(md.isNotNull(), _markdown_to_doctags(md))
    else:  # json: full result incl. base64 images, nulls omitted
        content = F.to_json(
            F.struct(
                F.col("filename"),
                md.alias("markdown"),
                F.transform(
                    F.col("images"),
                    lambda i: F.struct(
                        i["type"].alias("type"),
                        i["filename"].alias("filename"),
                        F.base64(i["image"]).alias("image"),
                    ),
                ).alias("images"),
                F.col("error"),
            ),
            {"ignoreNullFields": "true"},
        )
    return converted.select("path", "filename", content.alias("content"), "error")
