package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Single-JVM microbench: token-capture ([[JsonLineFields]]) vs
  * `mapper.readTree` over jsondoc-shaped lines, alternating blocks so
  * host drift hits both arms equally. Not a test — run on demand:
  * `Test/runMain graft.sources.JsonParseBench [rows] [reps]`. */
object JsonParseBench {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(200000)
    val reps = args.lift(1).map(_.toInt).getOrElse(7)
    val mapper = new ObjectMapper()
    val rnd = new java.util.Random(42)
    // postings-shaped: 5 fields, long-ish positions string (q242 profile)
    val postings = Array.tabulate(rows) { i =>
      val pos = (0 until 3 + rnd.nextInt(8)).map(_ => rnd.nextInt(500)).mkString(",")
      s"""{"term":"term${rnd.nextInt(5000)}","doc_id":${rnd.nextInt(100000)},"tf":${1 + rnd.nextInt(9)},"dl":${20 + rnd.nextInt(400)},"positions":"$pos"}"""
    }
    // docs-shaped: wide-ish row, 3 of 8 fields needed (the pruned-scan case)
    val docs = Array.tabulate(rows) { i =>
      s"""{"doc_id":$i,"url":"https://example.com/p/$i","lang":"en","text":"${"lorem ipsum dolor sit amet " * 4}","quality":${rnd.nextDouble()},"tokens":${rnd.nextInt(900)},"source":"cc","ts":${1700000000L + i}}"""
    }
    def benchTree(lines: Array[String]): (Double, Long) = {
      val t0 = System.nanoTime(); var sink = 0L
      lines.foreach { l =>
        val n = mapper.readTree(l)
        val v = n.get("doc_id"); if (v != null) sink += v.asLong()
      }
      ((System.nanoTime() - t0) / 1e6, sink)
    }
    def benchCapture(lf: JsonLineFields, lines: Array[String]): (Double, Long) = {
      val t0 = System.nanoTime(); var sink = 0L
      lines.foreach { l =>
        lf.parse(l)
        val v = lf.get("doc_id"); if (v != null) sink += v.asLong()
      }
      ((System.nanoTime() - t0) / 1e6, sink)
    }
    val lfPost = new JsonLineFields(Seq("term", "doc_id", "tf", "dl", "positions"), mapper)
    val lfDocs = new JsonLineFields(Seq("doc_id", "lang", "quality"), mapper)
    for (r <- 1 to reps) {
      val (a, sa) = benchTree(postings)
      val (b, sb) = benchCapture(lfPost, postings)
      val (c, sc) = benchTree(docs)
      val (d, sd) = benchCapture(lfDocs, docs)
      require(sa == sb && sc == sd, "capture/readTree disagree")
      println(f"rep $r postings: readTree $a%8.1f ms  capture $b%8.1f ms (${a / b}%.2fx) | docs(3of8): readTree $c%8.1f ms  capture $d%8.1f ms (${c / d}%.2fx)")
    }
  }
}
