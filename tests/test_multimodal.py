"""Tests for the multimodal column conventions (operators/multimodal.py):
binary payload attachment, the Arrow-batched decode plumbing (fake decoder +
the NotImplementedError gate on the real-decode branch), and frame sampling.
The decode step itself is stubbed (no imaging libs in the container); what's
asserted here is the Spark-side contract — schemas, UDF signatures, Arrow
batch shapes, and agreement between the JVM and mapInPandas decode paths."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from dbt_decodable_spark.operators import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "tiny"),
        (2, "a somewhat longer document body with more characters"),
        (3, "naïve café — multibyte utf-8 ✓"),  # n_bytes > n_chars
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("n_chars", F.length("text"))


class TestAttachBinaryPayload:
    def test_payload_is_binary_with_mime(self, docs):
        out = multimodal.attach_binary_payload(docs, "text")
        schema = dict(out.dtypes)
        assert schema["payload"] == "binary"
        assert schema["mime"] == "string"
        rows = {r["doc_id"]: r for r in out.collect()}
        assert bytes(rows[1]["payload"]) == b"tiny"
        assert rows[3]["mime"] == "text/plain"
        # utf-8 payload of multibyte text is longer than its char count
        assert len(bytes(rows[3]["payload"])) > rows[3]["n_chars"]


class TestDecodeImageMetaPandas:
    def test_fake_decode_matches_jvm_path(self, docs):
        """The mapInPandas decoder and the pure-JVM fake_decode_meta must
        agree — same metadata out of both plumbing variants."""
        payloads = multimodal.attach_binary_payload(docs, "text")
        via_pandas = {
            tuple(r)
            for r in multimodal.decode_image_meta_pandas(payloads).select(
                "doc_id", "n_bytes", "fake_width", "fake_height"
            ).collect()
        }
        via_jvm = {
            tuple(r)
            for r in multimodal.fake_decode_meta(payloads).select(
                "doc_id", "n_bytes", "fake_width", "fake_height"
            ).collect()
        }
        assert via_pandas == via_jvm

    def test_output_schema_contract(self, docs):
        out = multimodal.decode_image_meta_pandas(
            multimodal.attach_binary_payload(docs, "text")
        )
        assert dict(out.dtypes) == {
            "doc_id": "bigint",
            "n_bytes": "bigint",
            "mime": "string",
            "fake_width": "int",
            "fake_height": "int",
        }

    def test_real_decode_branch_is_gated(self, docs):
        """use_fake=False must surface the documented NotImplementedError
        (wrapped by Spark as a PythonException at action time)."""
        out = multimodal.decode_image_meta_pandas(
            multimodal.attach_binary_payload(docs, "text"), use_fake=False
        )
        with pytest.raises(PythonException, match="NotImplementedError"):
            out.collect()


class TestExtractFeatures:
    def test_byte_histogram_is_exact(self, docs, spark):
        import numpy as np

        payloads = multimodal.attach_binary_payload(docs, "text")
        out = {r["doc_id"]: r["features"] for r in
               multimodal.extract_features_pandas(payloads, n_bins=16).collect()}
        raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
        for doc_id, payload in raw.items():
            arr = np.frombuffer(payload, dtype="uint8")
            expect = np.bincount(arr >> 4, minlength=16)[:16].astype("float64")
            expect = (expect / expect.sum()).astype("float32")
            assert np.allclose(out[doc_id], expect), doc_id
            assert abs(sum(out[doc_id]) - 1.0) < 1e-5  # L1-normalized

    def test_features_shape_matches_embedding_contract(self, docs):
        payloads = multimodal.attach_binary_payload(docs, "text")
        out = multimodal.extract_features_pandas(payloads, n_bins=8)
        assert dict(out.dtypes) == {"doc_id": "bigint", "features": "array<float>"}
        assert all(len(r["features"]) == 8 for r in out.collect())


class TestResize:
    def test_fake_resize_pads_and_truncates(self, docs):
        payloads = multimodal.attach_binary_payload(docs, "text")
        out = {r["doc_id"]: r for r in
               multimodal.resize_image_pandas(payloads, 4, 3).collect()}
        for r in out.values():
            assert len(bytes(r["payload"])) == 12
            assert (r["width"], r["height"]) == (4, 3)
        assert bytes(out[1]["payload"]) == b"tiny" + b"\0" * 8  # padded

    def test_real_resize_branch_is_gated(self, docs):
        out = multimodal.resize_image_pandas(
            multimodal.attach_binary_payload(docs, "text"), 4, 3, use_fake=False
        )
        with pytest.raises(PythonException, match="NotImplementedError"):
            out.collect()


class TestFrameSample:
    def test_keeps_every_nth_frame(self, spark):
        frames = spark.range(0, 100).select(
            F.lit(7).alias("doc_id"),
            F.col("id").alias("frame_no"),
            F.col("id").cast("string").cast("binary").alias("payload"),
        )
        kept = multimodal.frame_sample(frames, every_nth=10)
        assert sorted(r["frame_no"] for r in kept.collect()) == list(range(0, 100, 10))

    def test_sampling_is_a_plain_filter(self, spark):
        # partition-prunable: the plan must stay a Filter over the scan, with
        # no shuffle/exchange introduced by the sampler
        frames = spark.range(0, 100).select(
            F.col("id").alias("frame_no"), F.lit(b"x").alias("payload")
        )
        plan = multimodal.frame_sample(frames)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
