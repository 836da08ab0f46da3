"""Real-model embedding adapter seam (functions/embed.embed_with_model):
contract-tested with an injected fake model — sentence-transformers is
not in this container, so the seam is proven with the same ``encode``
surface the real model exposes (reference fever_multi_agent.py:49-56).

The fake model/loader are built INSIDE each test (closures): cloudpickle
ships them by value to executor workers, exactly how a user would inject
a custom loader from a notebook.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_ORACLE
from vector_db_setup_spark.functions import embed
from vector_db_setup_spark.sources.registry import load_table

DIM = 6


def _ref_encode(texts):
    """Driver-side reference of the fake model's deterministic output."""
    return np.asarray(
        [
            [
                float((len(t) * (i + 1) + sum(map(ord, t[:3]))) % 97)
                for i in range(DIM)
            ]
            for t in texts
        ],
        dtype=np.float64,
    )


def _make_loader():
    """Build a picklable-by-value loader (closure, not module global)."""

    def loader():
        class FakeSentenceModel:
            def encode(self, texts):
                return np.asarray(
                    [
                        [
                            float(
                                (len(t) * (i + 1) + sum(map(ord, t[:3]))) % 97
                            )
                            for i in range(6)
                        ]
                        for t in texts
                    ],
                    dtype=np.float64,
                )

        return FakeSentenceModel()

    return loader


def test_embed_with_model_contract(spark):
    d = load_table(spark, SF_ORACLE, "documents").filter("doc_id < 30")
    out = embed.embed_with_model(d, _make_loader(), text_col="text")
    rows = out.select("doc_id", "text", "embedding").collect()
    assert len(rows) == 30
    for r in rows:
        want = _ref_encode([r["text"]])[0]
        assert r["embedding"] == pytest.approx(list(want))
    # schema: input columns preserved + array<double> appended
    assert out.schema[-1].simpleString() == "embedding:array<double>"
    assert [f.name for f in out.schema.fields[:-1]] == [
        f.name for f in d.schema.fields
    ]


def test_embed_with_model_batching_equivalent(spark):
    d = load_table(spark, SF_ORACLE, "documents").filter("doc_id < 25")
    a = {
        r["doc_id"]: r["embedding"]
        for r in embed.embed_with_model(d, _make_loader()).collect()
    }
    b = {
        r["doc_id"]: r["embedding"]
        for r in embed.embed_with_model(
            d, _make_loader(), batch_rows=4
        ).collect()
    }
    assert a == b


def test_model_loads_once_per_process():
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return object()

    embed._MODEL_CACHE.pop("k1", None)
    m1 = embed._get_or_load("k1", loader)
    m2 = embed._get_or_load("k1", loader)
    assert m1 is m2
    assert calls["n"] == 1
    embed._MODEL_CACHE.pop("k1", None)


def test_adapter_feeds_knn_like_hash_embedder(spark):
    """Swapping embedders must not change the downstream plan contract:
    the adapter's output drives the same KNN operator."""
    from vector_db_setup_spark.operators.knn import knn_topk

    d = load_table(spark, SF_ORACLE, "documents").filter("doc_id < 50")
    emb = embed.embed_with_model(d, _make_loader())
    qv = _ref_encode(["probe text"])[0]
    top = knn_topk(
        emb, "embedding", list(qv), k=3, metric="l2", id_col="doc_id"
    ).collect()
    assert len(top) == 3
    assert top[0]["distance"] <= top[-1]["distance"]


def test_sentence_transformer_loader_raises_cleanly():
    loader = embed.sentence_transformer_loader()
    with pytest.raises(ImportError, match="sentence-transformers"):
        loader()


def test_two_model_names_do_not_alias(spark):
    """Two loaders from one factory share a __qualname__ — the cache must
    key on something per-model (ADVICE r2, embed.py:68). Embed the same
    rows with two different fake 'models' in one session; the outputs
    must differ (the second call must NOT reuse the first model)."""
    d = load_table(spark, SF_ORACLE, "documents").filter("doc_id < 10")

    def factory(scale):
        def loader():
            class M:
                def encode(self, texts):
                    return np.asarray(
                        [[scale * (i + 1.0) for i in range(3)] for _ in texts]
                    )

            return M()

        return loader

    a = embed.embed_with_model(d, factory(1.0)).select("embedding").first()[0]
    b = embed.embed_with_model(d, factory(2.0)).select("embedding").first()[0]
    assert a == [1.0, 2.0, 3.0]
    assert b == [2.0, 4.0, 6.0]


def test_sentence_transformer_loader_cache_keys_distinct():
    la = embed.sentence_transformer_loader("model-a")
    lb = embed.sentence_transformer_loader("model-b")
    assert la.cache_key != lb.cache_key


# ---------------------------------------------------------------------------
# Real serialized model through the seam (VERDICT r4 item 2): a numpy
# TF-IDF + random-projection encoder FIT from the corpus by a Spark
# job, SAVED to an .npz artifact, and LOADED per executor process via
# numpy_encoder_loader — real learned state and a real deserialization
# cost, not an injected fake.
# ---------------------------------------------------------------------------


def test_real_numpy_encoder_through_seam(spark, tmp_path):
    from vector_db_setup_spark.functions.np_encoder import (
        TfidfProjectionEncoder,
        fit_encoder,
        numpy_encoder_loader,
    )

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    enc = fit_encoder(docs, vocab_size=512, dim=16, seed=7)
    art = str(tmp_path / "encoder.npz")
    enc.save(art)

    # artifact round-trip preserves learned state exactly
    enc2 = TfidfProjectionEncoder.load(art)
    assert enc2.vocab == enc.vocab
    np.testing.assert_array_equal(enc2.idf, enc.idf)
    np.testing.assert_array_equal(enc2.proj, enc.proj)

    # executor-side load counting: the loader appends its pid to a file
    # before deserializing (local mode: all workers share the local FS)
    count_file = str(tmp_path / "loads.txt")
    base = numpy_encoder_loader(art)

    def counting_loader():
        import os

        with open(count_file, "a") as f:
            f.write(f"{os.getpid()}\n")
        return base()

    out = embed.embed_with_model(
        docs.repartition(8),
        counting_loader,
        cache_key=base.cache_key,
        out_col="embedding",
    ).collect()

    # contract: one normalized dim-16 vector per doc, deterministic,
    # and equal to the driver-side encode of the same text
    assert len(out) == docs.count()
    by_id = {r["doc_id"]: r["embedding"] for r in out}
    sample = sorted(by_id)[:5]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(docs.doc_id.isin([int(s) for s in sample])).collect()
    }
    for did in sample:
        want = enc.encode([texts[did]])[0]
        np.testing.assert_allclose(by_id[did], want, rtol=0, atol=1e-12)
        n = np.linalg.norm(by_id[did])
        assert n == 0 or abs(n - 1.0) < 1e-9

    # load-once-per-process: 8 partitions ran, but each worker pid
    # deserialized the artifact at most once (module-level cache)
    with open(count_file) as f:
        pids = [ln.strip() for ln in f if ln.strip()]
    assert len(pids) >= 1
    assert len(pids) == len(set(pids)), (
        f"artifact reloaded within a worker process: {pids}"
    )

    # cache-key reuse: a SECOND pass with a fresh loader instance but
    # the same cache_key must not reload in still-alive workers — the
    # load count can only grow by NEW pids (fresh worker processes),
    # never by a repeated pid
    out2 = embed.embed_with_model(
        docs.repartition(4),
        counting_loader,
        cache_key=base.cache_key,
    ).collect()
    assert len(out2) == len(out)
    with open(count_file) as f:
        pids2 = [ln.strip() for ln in f if ln.strip()]
    assert len(pids2) == len(set(pids2)), (
        f"same cache_key reloaded in a live worker: {pids2}"
    )


def test_real_numpy_encoder_semantics(spark):
    """The learned model is a real encoder, not noise: token-overlapping
    texts embed closer (cosine) than disjoint ones, and the projection
    preserves that ordering deterministically under the fixed seed."""
    from vector_db_setup_spark.functions.np_encoder import fit_encoder

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    enc = fit_encoder(docs, vocab_size=512, dim=32, seed=7)
    a = "the data model trains on the search query system data model"
    b = "the data model trains on a search query system data index"
    c = "zebra violin quantum marmalade bicycle umbrella"
    va, vb, vc = enc.encode([a, b, c])
    assert va @ vb > va @ vc
    # deterministic across a refit with the same seed & corpus
    enc_again = fit_encoder(docs, vocab_size=512, dim=32, seed=7)
    np.testing.assert_array_equal(enc.encode([a]), enc_again.encode([a]))
