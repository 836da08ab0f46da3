"""Reference-API facade: the fever_multi_agent / test_connection call
shapes, backed by Spark."""

from __future__ import annotations

import json

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.facade import Engine


def test_connection_smokes(spark):
    eng = Engine(spark, SF_SMOKE)
    assert eng.test_connection()
    assert eng.test_vector_search(k=5)


def test_embedding_and_retrieval(spark):
    eng = Engine(spark, SF_SMOKE)
    v = eng.get_embedding("some claim text")
    assert len(v) == 64 and v == eng.get_embedding("some claim text")
    docs = eng.retrieve_from_vectordb("some claim text", top_k=5)
    assert len(docs) == 5 and all(isinstance(d, str) and d for d in docs)


def test_run_fever_pipeline_shape(spark):
    eng = Engine(spark, SF_SMOKE)
    out = eng.run_fever_pipeline("the sky is green", k=5)
    assert set(out) == {"claim", "docs", "answers", "judged", "final"}
    assert len(out["docs"]) == 5 and len(out["answers"]) == 3
    assert out["judged"] in ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")
    assert out["final"] == f"Verdict: {out['judged']}"
    strong = eng.run_fever_pipeline("the sky is green", editor_strength="strong")
    assert strong["final"] == strong["final"].upper()


def test_claims_io_and_eval(spark, tmp_path):
    eng = Engine(spark, SF_SMOKE)
    p = tmp_path / "claims.jsonl"
    with open(p, "w") as f:
        for i in range(8):
            f.write(json.dumps({"id": i, "claim": f"c{i}", "label": "SUPPORTS"}) + "\n")
    claims = eng.load_claims_from_jsonl(str(p), limit=3)
    assert len(claims) == 3 and claims[0]["label"] == "SUPPORTS"
    results = [
        {"label": "SUPPORTS", "final": "Verdict: SUPPORTS"},
        {"label": "REFUTES", "final": "Verdict: SUPPORTS"},
    ]
    assert eng.evaluate_predictions(results) == 0.5
    assert eng.evaluate_predictions([]) == 0.0
