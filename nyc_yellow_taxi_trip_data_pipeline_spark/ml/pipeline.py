"""The 5-stage regression pipeline (SURVEY.md §2.11, reference sparkML.py).

StringIndexer -> OneHotEncoder -> VectorAssembler -> StandardScaler ->
RandomForestRegressor, parameterized by a FeatureSpec instead of the
reference's hard-coded column lists (sparkML.py:75-95), plus evaluation
(RMSE/MAE/R², sparkML.py:105-112), feature importances (sparkML.py:161-167)
and model persistence (sparkML.py:170-171).

Scale notes: tree-ensemble fit is the one stage whose results depend on
partition layout (vote ties, feature binning) — metrics are asserted as
bounds, never exact-matched (SURVEY.md §5.4). MLflow logging is optional
(import-gated) as the reference hard-requires it (sparkML.py:8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    OneHotEncoder,
    OneHotEncoderModel,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class FeatureSpec:
    """Feature layout for the pipeline. ``categorical`` columns go through
    index+one-hot (handleInvalid='keep' like the reference StringIndexer,
    sparkML.py:75); ``numeric`` columns feed the assembler directly."""

    label: str
    numeric: tuple[str, ...]
    categorical: tuple[str, ...] = field(default_factory=tuple)
    num_trees: int = 100
    max_depth: int = 10
    seed: int = 42


def build_pipeline(spec: FeatureSpec) -> Pipeline:
    stages = []
    encoded = []
    for c in spec.categorical:
        stages.append(
            StringIndexer(
                inputCol=c, outputCol=f"{c}_index", handleInvalid="keep"
            )
        )
        stages.append(
            OneHotEncoder(inputCol=f"{c}_index", outputCol=f"{c}_encoded")
        )
        encoded.append(f"{c}_encoded")
    stages.append(
        VectorAssembler(
            inputCols=list(spec.numeric) + encoded,
            outputCol="assembled_features",
            handleInvalid="keep",
        )
    )
    stages.append(
        StandardScaler(inputCol="assembled_features", outputCol="features")
    )
    stages.append(
        RandomForestRegressor(
            featuresCol="features",
            labelCol=spec.label,
            numTrees=spec.num_trees,
            maxDepth=spec.max_depth,
            seed=spec.seed,
        )
    )
    return Pipeline(stages=stages)


def train(
    df: DataFrame, spec: FeatureSpec, train_fraction: float = 0.8
) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """Seeded 80/20 split (reference sparkML.py:91) + fit."""
    train_df, test_df = df.randomSplit(
        [train_fraction, 1 - train_fraction], seed=spec.seed
    )
    model = build_pipeline(spec).fit(train_df)
    return model, train_df, test_df


def evaluate(
    model: PipelineModel, df: DataFrame, label: str
) -> dict[str, float]:
    """RMSE / MAE / R² in one transform pass (the reference re-runs the
    transform for each metric via three evaluator calls on the same
    uncached frame, sparkML.py:105-112)."""
    predictions = model.transform(df).select(label, "prediction").cache()
    try:
        metrics = {}
        for metric in ("rmse", "mae", "r2"):
            evaluator = RegressionEvaluator(
                labelCol=label, predictionCol="prediction", metricName=metric
            )
            metrics[metric] = evaluator.evaluate(predictions)
        return metrics
    finally:
        predictions.unpersist()


def feature_importances(model: PipelineModel) -> list[tuple[str, float]]:
    """(feature, importance) sorted descending (reference sparkML.py:161-167).
    One-hot columns report as their encoded block names."""
    assembler = next(s for s in model.stages if isinstance(s, VectorAssembler))
    encoders = [s for s in model.stages if isinstance(s, OneHotEncoderModel)]
    rf = model.stages[-1]
    names = assembler.getInputCols()
    importances = rf.featureImportances
    # Slot sizes: numeric inputs take 1 slot; each one-hot block takes its
    # encoder's output size (categorySizes with dropLast).
    block_sizes = {
        enc.getOutputCol(): int(enc.categorySizes[0]) - (1 if enc.getDropLast() else 0)
        for enc in encoders
    }
    per_input: dict[str, float] = {}
    slot = 0
    for name in names:
        size = block_sizes.get(name, 1)
        per_input[name] = float(sum(importances[slot + j] for j in range(size)))
        slot += size
    return sorted(per_input.items(), key=lambda kv: (-kv[1], kv[0]))


def try_log_mlflow(
    model: PipelineModel, metrics: dict[str, float], params: dict[str, str]
) -> bool:
    """Optional MLflow logging (reference sparkML.py:98-151). Returns False
    when mlflow is not installed — never a hard dependency."""
    try:
        import mlflow
        import mlflow.spark
    except ImportError:
        return False
    with mlflow.start_run():
        mlflow.log_params(params)
        mlflow.log_metrics(metrics)
        mlflow.spark.log_model(model, "model")
    return True
