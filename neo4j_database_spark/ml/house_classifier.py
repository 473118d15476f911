"""House classifier: RandomForest over graph-neighbor features.

Spark ML replacement for the reference's sklearn pipeline
(train_fix.py:68-101 + ml_model.pyc): the 16-dim neighbor-house count
matrix (graph/features.py) feeds a seed-pinned RandomForest; training,
persistence, and single-row serving all stay on Spark (SURVEY.md §2.7
M1-M6, S7).

Scale: feature extraction is the distributed part (one edge-table
aggregation); the fit itself is tree ensemble training on the collected
feature matrix — one row per *person*, millions at most, exactly the
regime Spark ML's RandomForest distributes over.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_database_spark.graph.features import feature_columns, feature_matrix
from neo4j_database_spark.graph.model import GraphModel

SEED = 42
MIN_CONNECTIONS = 3  # reference trains on persons with total > 2 (train_fix.py:80)


@dataclass
class TrainResult:
    model: PipelineModel
    accuracy: float
    feature_importances: dict[str, float]
    n_train: int
    n_test: int


def training_frame(g: GraphModel) -> DataFrame:
    """M1 + P7: feature matrix restricted to connected persons with a
    known house label."""
    return feature_matrix(g, min_total=MIN_CONNECTIONS).filter(
        F.col("house").isNotNull()
    )


def build_pipeline() -> Pipeline:
    """VectorAssembler + label indexer + seed-pinned RandomForest
    (M3: n_estimators=50, max_depth=5, seed=42 — train_fix.py:88)."""
    assembler = VectorAssembler(
        inputCols=feature_columns(), outputCol="features"
    )
    indexer = StringIndexer(
        inputCol="house", outputCol="label", handleInvalid="keep"
    )
    rf = RandomForestClassifier(
        numTrees=50, maxDepth=5, seed=SEED, labelCol="label"
    )
    return Pipeline(stages=[assembler, indexer, rf])


def train(g: GraphModel) -> TrainResult:
    """M2-M6: 80/20 split, fit, held-out accuracy, importances."""
    data = training_frame(g)
    train_df, test_df = data.randomSplit([0.8, 0.2], seed=SEED)
    model = build_pipeline().fit(train_df)
    preds = model.transform(test_df)
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    )
    accuracy = float(evaluator.evaluate(preds)) if test_df.count() else float("nan")
    rf_model = model.stages[-1]
    importances = dict(
        zip(feature_columns(), [float(x) for x in rf_model.featureImportances])
    )
    return TrainResult(
        model=model,
        accuracy=accuracy,
        feature_importances=importances,
        n_train=train_df.count(),
        n_test=test_df.count(),
    )


def save(model: PipelineModel, path: str) -> None:
    """S7 sink: Spark-native persistence replaces pickle."""
    model.write().overwrite().save(path)


def load(spark, path: str) -> PipelineModel:
    return PipelineModel.load(path)


def predict_one(model: PipelineModel, g: GraphModel, name: str) -> str:
    """M5: single-person serving — build the 1-row feature frame from the
    live graph (the reference rebuilds it from Cypher counts,
    app.py:82-97) and score it."""
    row = feature_matrix(g).filter(F.col("name") == name)
    pred = model.transform(row).select("prediction").first()
    if pred is None:
        raise KeyError(f"person {name!r} not found")
    labels = model.stages[1].labelsArray[0]
    idx = int(pred["prediction"])
    return labels[idx] if idx < len(labels) else "Unknown"
