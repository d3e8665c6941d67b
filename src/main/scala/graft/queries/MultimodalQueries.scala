package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{ImageGen, ImageIoCodec, Multimodal}
import graft.queries.QueryHelpers._

/** Multimodal decode on REAL image bytes: deterministic grayscale PNGs are
  * synthesized per document, decoded by the pure-JVM [[ImageIoCodec]]
  * (javax.imageio — header-only metadata, full-pixel features), and the
  * decode results are hash-checked against DuckDB computing the SAME values
  * from the generation arithmetic (PNG is lossless, so decoded pixels ==
  * generated pixels — the lexicon-twin pattern applied to pixels).
  *
  * The earlier q32/q41 keep the StubCodec path (audio/video have no pure-JVM
  * decoder); these queries prove the SEAM carries a real codec unchanged. */
private[graft] object MultimodalQueries extends QueryBook {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    "q300_imageio_roundtrip" -> ((s, dir) => {
      // PNG encode → javax.imageio decode round trip, per document:
      // dimensions come from the HEADER-ONLY metadata pass and the
      // luminance sum from the full pixel decode; both must equal the
      // closed forms DuckDB derives from doc_id. Generation and pixel
      // decode share one executor-side pass (no payload shuffle — at
      // 100 TB the bytes never leave the partition that decoded them);
      // only the slim (doc_id, lum) manifest joins the metadata.
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (32 + id % 97).toInt
          val h = (32 + (id * 31) % 97).toInt
          val png = ImageGen.gradientPng(w, h)
          (id, png, "image", ImageIoCodec.luminanceSum(id, png))
        }).toDF("doc_id", "payload", "kind", "lum")
        .localCheckpoint() // one generation+decode pass feeds both sides
      val meta = Multimodal.decodeMeta(
        media.select("doc_id", "payload", "kind"), ImageIoCodec).toDF()
      meta.join(media.select("doc_id", "lum"), Seq("doc_id"))
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("lum").as("pixel_sum"),
          (col("n_bytes") > 57L).as("png_valid")) // 57 B = minimal PNG
    }),

    "q301_imageio_histogram" -> ((s, dir) => {
      // Full-pixel feature extraction through the codec seam: the
      // 16-bucket luminance histogram of each decoded PNG, reported as
      // its modal bucket (argmax, ties to the lowest index — argmax is
      // invariant under the feature's L2 normalization). DuckDB
      // recomputes the histogram from the generation lattice
      // (x + y over w×h), so a single mis-decoded pixel flips the gate.
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (32 + id % 97).toInt
          val h = (32 + (id * 31) % 97).toInt
          val png = ImageGen.gradientPng(w, h)
          val emb = ImageIoCodec.encodeFeature(id, png, "image", 16).embedding
          var best = 0
          var i = 1
          while (i < emb.length) { if (emb(i) > emb(best)) best = i; i += 1 }
          (id, best.toLong, (w.toLong * h) )
        }).toDF("doc_id", "modal_bucket", "n_pixels")
    }),
  )

  val oracleSql: ListMap[String, String] = ListMap(

    "q300_imageio_roundtrip" ->
      """WITH d AS (SELECT doc_id,
        |   32 + doc_id % 97 AS w, 32 + (doc_id * 31) % 97 AS h
        |  FROM documents)
        |SELECT doc_id, w AS width, h AS height,
        | CAST(1 AS BIGINT) AS n_frames,
        | h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS pixel_sum,
        | TRUE AS png_valid
        |FROM d""".stripMargin,

    "q301_imageio_histogram" ->
      """WITH d AS (SELECT doc_id,
        |   32 + doc_id % 97 AS w, 32 + (doc_id * 31) % 97 AS h
        |  FROM documents),
        |px AS (SELECT d.doc_id, (x.range + y.range) // 16 AS b,
        |   d.w * d.h AS np
        |  FROM d JOIN range(128) x ON x.range < d.w
        |   JOIN range(128) y ON y.range < d.h),
        |c AS (SELECT doc_id, b, np, count(*) AS n FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(b AS BIGINT) AS modal_bucket,
        | CAST(np AS BIGINT) AS n_pixels
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY n DESC, b ASC) = 1""".stripMargin,
  )
}
