package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Deterministic stand-in for a native media decode kernel.
  *
  * Real image/audio codecs are absent from this container (build
  * brief §multimodal): this object fakes the KERNEL only — header
  * parse → (width, height, format) — as a pure function of the
  * payload bytes, while every caller keeps the exact shape a
  * libjpeg/ffmpeg binding would need:
  *
  *  - [[decode]] is the per-item kernel signature (payload in, typed
  *    metadata out);
  *  - [[decodeBatch]] is the batch entry point — real codecs amortize
  *    native-call / scratch-buffer setup across a batch, so the Spark
  *    side must deliver items in batches, not one virtual call per
  *    row. `graft.queries.MultimodalQueries.q62` drives it via
  *    `mapPartitions` + `grouped(BatchSize)`, the Scala analog of a
  *    pandas-batched UDF.
  *
  * The fake arithmetic mirrors the column-expression path in q41
  * bit-for-bit (same xxhash64 seed and mod/shift scheme), so the two
  * independent implementations can be asserted identical — the
  * strongest check a stub admits.
  */
object DecodeStub {

  /** Typed decode result — the schema a real header parse yields. */
  final case class Decoded(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, format: String)

  val Formats: IndexedSeq[String] = IndexedSeq("jpeg", "png", "webp")

  /** Batches a real codec would want; also bounds scratch memory. */
  val BatchSize = 64

  private def floorMod(a: Long, b: Long): Long = java.lang.Math.floorMod(a, b)

  /** Per-item kernel: parse payload "header" → metadata. */
  def decode(docId: Long, payload: Array[Byte]): Decoded = {
    val h = XXH64.hashUnsafeBytes(payload, Platform.BYTE_ARRAY_OFFSET,
      payload.length, 42L)
    val width = (floorMod(h, 1920L) + 32L).toInt
    val height = (floorMod(h >> 16, 1080L) + 32L).toInt
    val fmt = Formats(floorMod(h >> 32, 3L).toInt)
    Decoded(docId, payload.length, width, height, fmt)
  }

  /** Batch kernel entry point: where a native binding would set up
    * scratch buffers once and decode the whole batch. The stub just
    * maps, but the call shape (and its per-batch, not per-row,
    * amortization point) is the contract q62 tests.
    */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Decoded] =
    batch.map { case (id, payload) => decode(id, payload) }
}
