"""ML pipeline tests — threshold/sanity checks in the reference's own
style (AUC-tolerance, not value hashes; SURVEY §5/§6)."""

import numpy as np
import pyspark.sql.functions as F

from big_data_analytics_project_spark.ml.intent import run_intent_pipeline, undersample
from big_data_analytics_project_spark.ml.online import OnlineIntentModel
from big_data_analytics_project_spark.ml.recommend import run_als_pipeline


def test_intent_pipeline_end_to_end(spark, sf_dir):
    m = run_intent_pipeline(spark, sf_dir)
    assert 0.0 <= m.auc <= 1.0
    assert 0.0 <= m.f1 <= 1.0
    assert m.n_train > 0 and m.n_test > 0


def test_undersample_balances(spark, sf_dir):
    from big_data_analytics_project_spark.ml.intent import build_feature_table

    feats = build_feature_table(spark, sf_dir)
    bal = undersample(feats)
    counts = dict(
        bal.groupBy("label").count().rdd.map(lambda r: (r["label"], r["count"])).collect()
    )
    if 0 in counts and 1 in counts and counts[1] < feats.count():
        ratio = counts[0] / counts[1]
        assert 0.3 < ratio < 3.0  # Bernoulli-approximate 1:1 (SURVEY §7.2.7)


def test_online_model_cold_start_then_learns():
    model = OnlineIntentModel(update_every=50)
    rng = np.random.default_rng(42)
    # separable synthetic: label 1 iff view_count high
    x = rng.normal(size=(500, 4))
    y = (x[:, 0] > 0).astype(int)
    x[:, 0] += y * 3  # make it easy
    p0 = model.predict_proba(x[:5])
    assert not model.fitted and p0.shape == (5,)  # heuristic path
    for i in range(0, 500, 50):
        model.observe(x[i : i + 50], y[i : i + 50])
    assert model.fitted and model.n_updates >= 5
    acc = ((model.predict_proba(x) >= 0.5).astype(int) == y).mean()
    assert acc > 0.8


def test_online_model_pickle_roundtrip(tmp_path):
    model = OnlineIntentModel()
    x = np.ones((120, 4))
    y = np.ones(120, dtype=int)
    model.observe(x, y)
    p = str(tmp_path / "m.pkl")
    model.save(p)
    loaded = OnlineIntentModel.load(p)
    assert loaded.fitted == model.fitted
    assert np.allclose(loaded.weights, model.weights)


def test_als_pipeline(spark, sf_dir):
    out = run_als_pipeline(spark, sf_dir, k=10)
    assert 0.0 <= out["recall_at_k"] <= 1.0
    assert out["n_users"] > 0
