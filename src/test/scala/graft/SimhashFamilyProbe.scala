package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop diagnostic: cross-family SimHash agreement vs exact Jaccard. */
object SimhashFamilyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val exact = dedup.Dedup.q30NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def sh(): Map[(Long, Long), Long] =
      dedup.Dedup.q32Simhash(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rep = sh(); Caches.drain()
    spark.conf.set("spark.graft.replayableHashes", "false")
    val fast = sh(); Caches.drain()
    println(s"RESULT rep=${rep.size} fast=${fast.size} common=${(rep.keySet intersect fast.keySet).size}")
    exact.toSeq.sortBy(-_._2).take(20).foreach { case (p, j) =>
      println(s"RESULT jac=$j pair=$p repHam=${rep.get(p)} fastHam=${fast.get(p)}")
    }
    spark.stop()
  }
}
