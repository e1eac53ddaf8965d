package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val payloads =
    Multimodal.attachPayload(Tables(spark, sf).documents, "doc_id", "text")

  test("decode stub is deterministic and consistent with byte length") {
    val metas = Multimodal.decodePartitions(payloads, spark).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.width == (m.n_bytes % 1024) + 1)
      assert(m.height == (m.n_bytes / 1024) + 1)
      assert(m.channels == 3 && m.features.length == 8)
      assert(m.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("frame sampling covers the payload with the right frame count") {
    val checked = Multimodal.sampleFrames(payloads, frameBytes = 64, stride = 2)
      .join(payloads, "doc_id")
      .select(size(col("frames")).as("n_frames"),
        (floor((length(col("payload")) - 1) / 128) + 1).as("expected"))
      .filter(col("n_frames") =!= col("expected"))
    assert(checked.count() == 0)
  }
}
