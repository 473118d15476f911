"""Survival model behind the reference's ``/predict_survival`` endpoint.

The reference (app.py:137-180) loads ``survival_model.pkl`` +
``survival_encoder.pkl`` at startup and serves
``POST /predict_survival {friends, enemies, family, house}`` →
``{'alive': bool}`` from features
``[friends_count, enemy_count, fam_count, house_code]``. The artifacts
were never shipped and no training script exists in the repo, so the
endpoint 500s as checked in. This module supplies the missing half
natively instead of replicating the 500: the same-shaped model is
trained FROM THE GRAPH with Spark ML — per-person degree counts by
relationship family (graph/queries.survival_features ≡ the reference's
len(friends)/len(enemies)/len(family) request fields) plus the indexed
house, labeled by the stored ``alive`` property — and served with the
reference's exact request semantics, including the unknown-house
fallback to the encoder's first class (app.py:168-171).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, functions as F

from neo4j_database_spark.graph.model import GraphModel
from neo4j_database_spark.graph.queries import survival_features

FEATURES = ["friends_count", "enemy_count", "fam_count", "house_code"]


def survival_training_frame(g: GraphModel) -> DataFrame:
    """(friends_count, enemy_count, fam_count, house, alive) per person —
    the endpoint's feature contract joined with the stored label. One
    conditional aggregation over sym_edges + one broadcast-sized join."""
    feats = survival_features(g).select(
        "name",
        F.col("n_friends").cast("double").alias("friends_count"),
        F.col("n_enemies").cast("double").alias("enemy_count"),
        F.col("n_family").cast("double").alias("fam_count"),
    )
    people = g.persons.select(
        "name",
        F.coalesce(F.col("house"), F.lit("Unknown")).alias("house"),
        F.col("alive").cast("int").alias("label"),
    )
    return feats.join(people, "name")


@dataclass
class SurvivalModel:
    model: PipelineModel
    houses: list[str]  # StringIndexer classes, index order = house_code
    # captured at train time: SparkSession.getActiveSession() is
    # thread-local and returns None from a serving/worker thread, which
    # would turn a valid scoring request into an AttributeError
    spark: "SparkSession | None" = None


def train_survival(g: GraphModel, seed: int = 7) -> SurvivalModel:
    """StringIndexer(house) + RandomForest on the 4-feature vector.

    The house indexer is fit over the training frame (the reference's
    LabelEncoder fit); ``handleInvalid='error'`` is fine because serving
    applies the reference's fallback BEFORE the transform.
    """
    train = survival_training_frame(g)
    indexer = StringIndexer(
        inputCol="house", outputCol="house_code", stringOrderType="alphabetAsc"
    )
    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features")
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="label", numTrees=50, seed=seed
    )
    model = Pipeline(stages=[indexer, assembler, rf]).fit(train)
    houses = list(model.stages[0].labels)
    return SurvivalModel(
        model=model, houses=houses, spark=train.sparkSession
    )


def predict_survival(
    sm: SurvivalModel,
    friends: list[str],
    enemies: list[str],
    family: list[str],
    house: str,
) -> bool:
    """Single-request scoring with the reference's exact semantics
    (app.py:156-177): features are the LIST LENGTHS of the request
    arrays; an unknown house falls back to the encoder's first class."""
    if house not in sm.houses:
        house = sm.houses[0]  # app.py:170 'Gryffindor' fallback analog
    from pyspark.sql import SparkSession

    # train-time capture first: getActiveSession() is thread-local and
    # None on serving threads that never created a session
    spark = sm.spark or SparkSession.getActiveSession()
    row = spark.createDataFrame(
        [(float(len(friends)), float(len(enemies)), float(len(family)), house)],
        "friends_count double, enemy_count double, fam_count double, house string",
    )
    pred = sm.model.transform(row).select("prediction").first()[0]
    return bool(int(pred))
