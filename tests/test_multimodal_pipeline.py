"""Multimodal plumbing, FEVER pipeline stages, JSONL source/sink."""

from __future__ import annotations

import json

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.multimodal.columns import (
    attach_fake_binary,
    decode_image,
    extract_image_features,
    sample_video_frames,
)
from vector_db_setup_spark.operators.pipeline import (
    evaluate,
    fever_pipeline,
    make_claims,
)
from vector_db_setup_spark.sources.jsonl import (
    read_claims,
    write_results_json,
    write_results_single_file,
)
from vector_db_setup_spark.sources.registry import load_table


def test_binary_column_plumbing(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(20)
    with_bin = attach_fake_binary(d)
    row = with_bin.select("img", "img_meta").first()
    assert isinstance(row["img"], (bytes, bytearray)) and len(row["img"]) == 16
    assert row["img_meta"]["mime"] == "image/fake"
    feats = extract_image_features(with_bin).collect()
    assert len(feats) == 20
    for f in feats:
        assert f["n_bytes"] == 16
        assert 0.0 <= f["mean_byte"] <= 255.0
        assert sum(f["histogram"]) == 16


def test_decode_stub_contract():
    from vector_db_setup_spark.multimodal.columns import _pil

    img = decode_image(b"\x10" * 16, real=False)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    # deterministic in the payload
    assert (decode_image(b"\x10" * 16, real=False) == img).all()
    if _pil() is None:
        # capability probe absent: real=True must raise the
        # missing-dependency error, and auto (None) must pick the fake
        with pytest.raises(NotImplementedError):
            decode_image(b"\x10" * 16, real=True)
        assert (decode_image(b"\x10" * 16) == img).all()
    else:
        # PIL present: real=True on garbage bytes is a CODEC error
        # (unidentifiable image), never a silent fake fallback
        with pytest.raises(Exception):
            decode_image(b"\x10" * 16, real=True)


def test_decode_image_real_pil_roundtrip():
    """Real-codec path contract (skip-marked where PIL is absent):
    PNG-encode a known array, decode through the SAME entry point the
    fake path uses, require exact pixels back."""
    from vector_db_setup_spark.multimodal.columns import _pil

    Image = _pil()
    if Image is None:
        pytest.skip("PIL not installed in this container")
    import io

    want = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = io.BytesIO()
    Image.fromarray(want, "RGB").save(buf, format="PNG")
    got = decode_image(buf.getvalue(), real=True)
    assert got.dtype == np.uint8 and (got == want).all()
    # auto mode picks the real codec when the library is present
    assert (decode_image(buf.getvalue()) == want).all()


def test_video_stub_raises():
    with pytest.raises(NotImplementedError):
        sample_video_frames(None)


def test_fever_pipeline_shape(spark):
    out = fever_pipeline(spark, SF_SMOKE, n_claims=5, k=3)
    rows = out.collect()
    assert len(rows) == 5
    labels = {"SUPPORTS", "REFUTES", "NOT ENOUGH INFO"}
    for r in rows:
        assert r["judged"] in labels
        assert r["final"].startswith("Verdict: ")
    acc = evaluate(out).first()
    assert acc["total"] == 5 and 0.0 <= acc["accuracy"] <= 1.0


def test_jsonl_roundtrip(spark, tmp_path):
    src = tmp_path / "claims.jsonl"
    with open(src, "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "claim": f"claim {i}", "label": "SUPPORTS"}) + "\n")
        # missing fields → null via schema (reference .get() semantics)
        f.write(json.dumps({"id": 99}) + "\n")
    df = read_claims(spark, str(src), limit=5)
    assert df.count() == 5
    all_df = read_claims(spark, str(src))
    assert all_df.filter("claim IS NULL").count() == 1

    out_dir = tmp_path / "out"
    write_results_json(all_df, str(out_dir))
    back = spark.read.json(str(out_dir))
    assert back.count() == 11

    golden = tmp_path / "golden.json"
    write_results_single_file(df, str(golden))
    data = json.loads(golden.read_text())
    assert len(data) == 5 and set(data[0]) == {"id", "claim", "label"}


def test_catalog_probe(spark):
    from vector_db_setup_spark.sources.registry import register_views, table_exists

    register_views(spark, SF_SMOKE)
    assert table_exists(spark, "documents")
    assert not table_exists(spark, "no_such_table")


def test_ingest_jsonl_to_partitioned_parquet(spark, tmp_path):
    import json as _json

    from vector_db_setup_spark.sources.ingest import ingest
    from vector_db_setup_spark.sources.jsonl import CLAIMS_SCHEMA

    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        for i in range(20):
            f.write(
                _json.dumps(
                    {"id": i, "claim": f"c{i}", "label": ["SUPPORTS", "REFUTES"][i % 2]}
                )
                + "\n"
            )
    dest = str(tmp_path / "out")
    back = ingest(
        spark, str(src), dest, fmt="json", schema=CLAIMS_SCHEMA,
        partition_by=["label"], repartition=2,
    )
    assert back.count() == 20
    assert set(back.columns) == {"id", "claim", "label"}
    # partitioned layout prunes on the partition key
    import glob

    assert glob.glob(f"{dest}/label=SUPPORTS/*.parquet")


def test_results_records_reference_shape(spark, tmp_path):
    import json as _json

    from vector_db_setup_spark.operators.pipeline import results_records
    from vector_db_setup_spark.sources.jsonl import write_results_single_file

    out = results_records(spark, SF_SMOKE, n_claims=3, k=5)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["docs"]) == 5 and len(r["answers"]) == 3
        assert r["judged"] in ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")
    golden = tmp_path / "fever_results.json"
    write_results_single_file(out, str(golden))
    data = _json.loads(golden.read_text())
    # exact reference record shape (fever_results.json keys + claim_id)
    assert set(data[0]) == {
        "claim_id", "claim", "docs", "answers", "judged", "final", "label",
    }


def test_assert_dim(spark):
    from vector_db_setup_spark.functions.vector import assert_dim
    from vector_db_setup_spark.sources.registry import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert_dim(emb, "embedding", 64)  # fixtures are 64-d
    with pytest.raises(ValueError, match="must be 768-dimensional"):
        assert_dim(emb, "embedding", 768)


def test_resize_images_contract(spark):
    from vector_db_setup_spark.multimodal.columns import resize_images

    d = load_table(spark, SF_SMOKE, "documents").limit(12)
    out = resize_images(attach_fake_binary(d), out_h=4, out_w=3).collect()
    assert len(out) == 12
    for r in out:
        assert (r["out_h"], r["out_w"]) == (4, 3)
        assert 0.0 <= r["mean_px"] <= 255.0
    # deterministic: same payloads → same means across runs
    again = resize_images(attach_fake_binary(d), out_h=4, out_w=3).collect()
    assert sorted((r["doc_id"], r["mean_px"]) for r in out) == sorted(
        (r["doc_id"], r["mean_px"]) for r in again
    )


def test_resize_matches_local_numpy(spark):
    from vector_db_setup_spark.multimodal.columns import decode_image, resize_images

    d = load_table(spark, SF_SMOKE, "documents").limit(5)
    with_bin = attach_fake_binary(d)
    payloads = {r["doc_id"]: bytes(r["img"]) for r in with_bin.select("doc_id", "img").collect()}
    got = {r["doc_id"]: r["mean_px"] for r in resize_images(with_bin, 4, 4).collect()}
    for doc_id, payload in payloads.items():
        arr = decode_image(payload, real=False)
        h, w = arr.shape[:2]
        ri = (np.arange(4) * h) // 4
        ci = (np.arange(4) * w) // 4
        assert got[doc_id] == pytest.approx(float(arr[ri][:, ci].mean()))


def test_audio_features_contract(spark):
    from vector_db_setup_spark.multimodal.columns import (
        _soundfile,
        decode_audio,
        extract_audio_features,
    )

    if _soundfile() is None:
        # non-WAV payload + no codec: real=True names the dependency
        with pytest.raises(NotImplementedError):
            decode_audio(b"xx", real=True)
    d = load_table(spark, SF_SMOKE, "documents").limit(10)
    out = extract_audio_features(attach_fake_binary(d)).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_samples"] == 16
        assert 0.0 <= r["rms"] <= 1.0
        assert 0 <= r["zero_crossings"] < 16


def test_decode_image_empty_payload():
    arr = decode_image(b"", real=False)
    assert arr.shape == (1, 1, 3)
    assert (arr == 0).all()


def _make_wav(samples: np.ndarray, channels: int = 1, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_audio_real_wav_runs_in_container():
    """The REAL audio decode path for PCM16 WAV needs only the stdlib
    `wave` module, so it runs (not skips) in this container: a known
    waveform must round-trip exactly through the same entry point the
    fake path uses, auto mode must pick it (RIFF magic), and stereo
    must mono-average."""
    from vector_db_setup_spark.multimodal.columns import decode_audio

    want = np.array([0, 16384, -16384, 32767, -32768], dtype=np.int16)
    wav = decode_audio(_make_wav(want), real=True)
    assert wav.dtype == np.float32
    assert np.allclose(wav, want.astype(np.float32) / 32768.0)
    # auto mode: RIFF magic routes to the real decoder
    assert np.allclose(decode_audio(_make_wav(want)), wav)
    # stereo -> mono average
    stereo = np.array([100, 300, -200, -400], dtype=np.int16)  # L,R,L,R
    got = decode_audio(_make_wav(stereo, channels=2), real=True)
    assert np.allclose(got, np.array([200.0, -300.0], dtype=np.float32) / 32768.0)
    # unsupported depth names the way out
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x7f\xff")
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_audio(buf.getvalue(), real=True)
    # a non-RIFF payload in explicit fake mode stays the fake contract
    fake = decode_audio(b"\x00\xff", real=False)
    assert fake.dtype == np.float32 and len(fake) == 2


def test_decode_audio_real_soundfile_roundtrip():
    """soundfile-backed decode (skip-marked where absent): same entry
    point, same [-1,1] float32 contract."""
    from vector_db_setup_spark.multimodal.columns import _soundfile, decode_audio

    sf = _soundfile()
    if sf is None:
        pytest.skip("soundfile not installed in this container")
    import io

    want = (np.arange(16, dtype=np.float32) - 8) / 8.0
    buf = io.BytesIO()
    sf.write(buf, want, 8000, format="WAV", subtype="FLOAT")
    got = decode_audio(buf.getvalue(), real=True)
    assert got.dtype == np.float32 and np.allclose(got, want)


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from vector_db_setup_spark.sources.csv import (
        CORRUPT_COL,
        read_csv,
        write_csv,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", 1.25), (3, "gamma", -2.0)], schema
    )
    path = str(tmp_path / "csv_rt")
    write_csv(df, path)
    back = read_csv(spark, path, schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # limit pushes into the scan
    assert read_csv(spark, path, schema, limit=2).count() == 2

    # quarantine: a malformed row lands in _corrupt_record, not an error
    bad = tmp_path / "bad.csv"
    bad.write_text("id,name,score\n1,ok,1.0\nnot_a_number,broken,xyz\n")
    got = read_csv(spark, str(bad), schema, keep_corrupt=True)
    rows = got.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r[CORRUPT_COL] is not None]
    clean = [r for r in rows if r[CORRUPT_COL] is None]
    assert len(corrupt) == 1 and len(clean) == 1
    assert clean[0]["id"] == 1


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.ingest import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(10_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(37).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 37
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    n = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_parquet_preserves_partitions_and_backup(spark, tmp_path):
    """ADVICE r2: a hive-partitioned layout must keep its partition
    columns through compaction (partition_by), and keep_backup must leave
    the pre-compaction copy on disk for verification."""
    import glob
    import os

    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.ingest import compact_parquet

    path = str(tmp_path / "part")
    spark.range(1_000).select(
        "id",
        (F.col("id") % 3).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(11).write.partitionBy("bucket").parquet(path)
    assert len(glob.glob(f"{path}/bucket=*/*.parquet")) > 3
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    compact_parquet(
        spark,
        path,
        target_file_bytes=10**9,
        partition_by=["bucket"],
        keep_backup=True,
    )
    # partition directories survive the rewrite
    assert sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]
    assert len(glob.glob(f"{path}/bucket=*/*.parquet")) == 3
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    back = path + "__compact_old"
    assert os.path.isdir(back)
    backup = sorted(tuple(r) for r in spark.read.parquet(back).collect())
    assert backup == before


def test_decode_audio_corrupt_riff_is_data_error():
    """A RIFF-magic payload that fails WAV decode must RAISE (data
    error), never silently fall back to the byte-fake — garbage
    features that look healthy are worse than a loud failure."""
    from vector_db_setup_spark.multimodal.columns import _soundfile, decode_audio

    if _soundfile() is not None:
        pytest.skip("soundfile present; stdlib path not reached")
    corrupt = b"RIFF" + b"\x00" * 8  # magic without a valid WAV body
    with pytest.raises((ValueError, NotImplementedError)):
        decode_audio(corrupt)  # auto mode routes real via the magic
    # explicit fake mode still decodes the bytes deterministically
    assert len(decode_audio(corrupt, real=False)) == 12


def test_ingest_orc_roundtrip(spark, tmp_path):
    """ORC is a generic-format path through the same ingest entry
    point (Spark ships the ORC datasource in-core like parquet) —
    pinned so a user landing ORC exports gets the same partitioned-
    parquet contract as json/csv."""
    from vector_db_setup_spark.sources.ingest import ingest

    src = str(tmp_path / "orc_in")
    spark.range(100).selectExpr(
        "id", "id % 4 AS grp", "md5(cast(id AS string)) AS payload"
    ).write.orc(src)
    dest = str(tmp_path / "out")
    back = ingest(
        spark, src, dest, fmt="orc", partition_by=["grp"], repartition=2
    )
    assert back.count() == 100
    cols = ["id", "grp", "payload"]
    want = sorted(tuple(r) for r in spark.read.orc(src).select(*cols).collect())
    # partitionBy moves the partition column to the end on read-back;
    # compare by name-aligned projection
    assert sorted(tuple(r) for r in back.select(*cols).collect()) == want
    import glob

    assert glob.glob(f"{dest}/grp=1/*.parquet")
