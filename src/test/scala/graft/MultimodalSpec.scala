package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (q41/q42/q62): the decode kernel is a declared
  * stub, so the checkable claims are structural — the two decode
  * implementations agree, resize math preserves aspect ratio, frame
  * sampling covers exactly the expected indices.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q62 batch-kernel decode is row-identical to q41 column-expression decode") {
    val batch = SparkEntry.queries("q62_mm_batch_decode")(spark, sf)
      .select("doc_id", "n_bytes", "width", "height", "format")
      .collect().map(_.toSeq).toSeq
    val column = SparkEntry.queries("q41_mm_decode")(spark, sf)
      .select("doc_id", "n_bytes", "width", "height", "format")
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(batch === column)
  }

  test("q41 resize fits 224x224 and preserves aspect ratio") {
    val rows = SparkEntry.queries("q41_mm_decode")(spark, sf)
      .select("width", "height", "resized_w", "resized_h").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(rw, rh) === 224)
      assert(rw <= 224 && rh <= 224 && rw >= 1 && rh >= 1)
      // integer-truncated proportionality of the scaled short side
      if (w >= h) assert(rh === h * 224 / w) else assert(rw === w * 224 / h)
    }
  }

  test("q42 samples every 4th frame of every document with frames") {
    val perDoc = SparkEntry.queries("q42_mm_frames")(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"),
        max(col("frame_idx")).cast("long").as("max_idx"),
        min(col("frame_idx")).cast("long").as("min_idx"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("min_idx") === 0L)
      assert(r.getAs[Long]("max_idx") % 4 === 0L)
      assert(r.getAs[Long]("n_sampled") === r.getAs[Long]("max_idx") / 4 + 1)
    }
  }
}
