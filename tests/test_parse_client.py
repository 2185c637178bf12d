"""Injectable parse-client seam (operators/parse.py analyze_with_client):
client path ≡ expression path, retry policy, stub fidelity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators.parse import (
    ParseClientError,
    analysis_text_units,
    analyze_with_client,
    route_blobs,
    stub_parse_client,
)


@pytest.fixture()
def blobs(spark):
    rows = [
        ("mem://a.txt", "alpha beta\ngamma"),
        ("mem://b.md", "# title\n\nbody text"),
        ("mem://c.pdf", "pdf line one\npdf line two\n\nsecond para"),
        ("mem://d.docx", "single line no newline"),
    ]
    return spark.createDataFrame(rows, "document_url string, content string")


def _proj(routed):
    units = analysis_text_units(F.col("analysis"))
    return (routed.select("document_url", "route",
                          F.size(units).alias("n_units"),
                          F.element_at(units, 1).alias("first_unit"))
            .orderBy("document_url"))


def test_client_path_equals_expression_path(spark, blobs):
    """route_blobs with the stub client must reproduce the expression
    path bit-for-bit on every route, including the analyze route the
    client actually serves."""
    expr = _proj(route_blobs(blobs)).collect()
    client = _proj(route_blobs(blobs, parse_client=stub_parse_client)
                   ).collect()
    assert list(map(tuple, expr)) == list(map(tuple, client))


def test_parse_client_retries_transient_and_succeeds(spark, blobs, tmp_path):
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    def flaky(texts):
        import hashlib
        import os as _os
        key = hashlib.md5("||".join(texts).encode()).hexdigest()
        m = _os.path.join(marker_dir, key)
        if not _os.path.exists(m):
            open(m, "w").close()
            raise ParseClientError(429, "throttled")
        return stub_parse_client(texts)

    analyzed = analyze_with_client(
        blobs.filter(F.col("document_url").endswith(".pdf")), flaky,
        retry_delay_s=0.0)
    got = analyzed.select(F.col("analysis")["lines"].alias("ln")).first()
    assert got["ln"] == ["pdf line one", "pdf line two", "second para"]


def test_parse_client_nonretryable_propagates(spark, blobs):
    def denied(texts):
        raise ParseClientError(403, "forbidden")

    with pytest.raises(Exception) as ei:
        analyze_with_client(blobs, denied, retry_delay_s=0.0).collect()
    assert "403" in str(ei.value)


def test_parse_client_batch_size_mismatch_raises(spark, blobs):
    def short(texts):
        return stub_parse_client(texts)[:-1]

    with pytest.raises(Exception) as ei:
        analyze_with_client(blobs, short).collect()
    assert "parse client returned" in str(ei.value)
