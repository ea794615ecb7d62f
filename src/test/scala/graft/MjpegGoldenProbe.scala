package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop capture: prints the q154 scene rows as Scala tuple literals
  * for [[graft.multimodal.Multimodal.q154Golden]] (not part of the spec
  * suite — run via Test/runMain). */
object MjpegGoldenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = multimodal.Multimodal.q154MjpegScenes(spark, "").collect()
    rows.foreach { r =>
      println(s"""    (${r.getLong(0)}L, ${r.getLong(1)}L, ${r.getLong(2)}L, ${r.getLong(3)}L, "${r.getString(4)}"),""")
    }
    // also print per-frame hamming diagnostics so the noise margins are visible
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ds = spark.createDataset(multimodal.Multimodal.MjpegFixture.records)(
      org.apache.spark.sql.Encoders.product[multimodal.MediaRecord])
    val frames = multimodal.Multimodal.videoFrameBands(ds, multimodal.Multimodal.MjpegVideoCodec)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val hamming = (0 until 4).map(m =>
      bit_count(col(s"b$m").bitwiseXOR(lag(col(s"b$m"), 1).over(w))).cast("long"))
      .reduce(_ + _)
    frames.withColumn("ham", hamming)
      .select("doc_id", "frame_idx", "ham").orderBy("doc_id", "frame_idx")
      .collect().foreach(r => println(s"HAM doc=${r.getLong(0)} f=${r.getLong(1)} h=${if (r.isNullAt(2)) "-" else r.getLong(2)}"))
    spark.stop()
  }
}
