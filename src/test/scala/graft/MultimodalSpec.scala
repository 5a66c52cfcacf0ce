package graft

import graft.pipeline.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("fromText builds binary media rows with metadata struct") {
    val docs = Seq((1L, "hello world", "srcA"), (2L, "abc", "srcB"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.fromText(docs, "doc_id", "text", "source")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "content", "meta"))
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("content").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(r(1).getStruct(2).getAs[Long]("n_bytes") == 3L)
  }

  test("extractFeatures is deterministic and distributed") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, "hello world", "srcA"), (2L, "abc", "srcB"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.fromText(docs, "doc_id", "text", "source").repartition(4)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1(0).n_bytes == 11L && f1(0).feature.length == 8)
    assert(f1(0).width >= 16 && f1(0).height >= 16)
  }

  test("sampleFrames emits per-frame rows") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, "0123456789abcdef0123456789abcdef", "v")).toDF("doc_id", "text", "source")
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(docs, "doc_id", "text", "source"), frames = 4).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Int]("frame")).sorted.toSeq == Seq(0, 1, 2, 3))
  }
}
