"""HTTP framing tests for the batch-predict endpoint (serving_http).

The endpoint test runs only where fastapi is installed (importorskip) —
this container ships without it, so the default run exercises the
import-gate path; environments with fastapi get the full TestClient
roundtrip against the same records predict_csv returns.
"""

from __future__ import annotations

import importlib.util

import pytest

from nyc_yellow_taxi_trip_data_pipeline_spark.operators import serving_http

HAS_FASTAPI = importlib.util.find_spec("fastapi") is not None


@pytest.mark.skipif(HAS_FASTAPI, reason="fastapi installed; gate cannot fire")
def test_create_app_import_gated_without_fastapi():
    with pytest.raises(ImportError, match="requires fastapi"):
        serving_http.create_app(spark=None, model=None)


@pytest.mark.skipif(not HAS_FASTAPI, reason="fastapi not installed")
def test_predict_endpoint_matches_predict_csv(spark, tmp_path):
    from fastapi.testclient import TestClient

    from nyc_yellow_taxi_trip_data_pipeline_spark.ml.pipeline import FeatureSpec, train
    from nyc_yellow_taxi_trip_data_pipeline_spark.operators.serving import predict_csv

    spec = FeatureSpec(
        label="total_amount",
        numeric=("trip_distance", "fare_amount"),
        categorical=(),
        num_trees=5,
        max_depth=3,
    )
    rows = [
        (float(d), 3.0 + 2.5 * d, 3.0 + 2.5 * d + 1.0) for d in range(1, 101)
    ]
    df = spark.createDataFrame(
        rows, "trip_distance double, fare_amount double, total_amount double"
    )
    model, _, _ = train(df, spec)

    csv_path = tmp_path / "upload.csv"
    csv_path.write_text(
        "trip_distance,fare_amount,total_amount\n"
        + "\n".join(f"{d}.0,{3.0 + 2.5 * d},{4.0 + 2.5 * d}" for d in range(1, 6))
    )

    app = serving_http.create_app(spark, model, label="total_amount")
    with TestClient(app) as client:
        resp = client.post(
            "/predict/",
            files={"file": ("upload.csv", csv_path.read_bytes(), "text/csv")},
        )
    assert resp.status_code == 200
    got = resp.json()
    want = [
        r.asDict()
        for r in predict_csv(spark, model, str(csv_path), label="total_amount")
        .collect()
    ]
    assert got == want
