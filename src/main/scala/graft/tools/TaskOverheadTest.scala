package graft.tools
object TaskOverheadTest {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.fromEnv("overhead")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    // warm
    spark.range(100000).repartition(32).agg(count(lit(1))).collect()
    (1 to 3).foreach { i =>
      time(s"range->32part agg run$i") {
        spark.range(100000).repartition(32).agg(count(lit(1))).collect()
      }
    }
    val docs = "/root/testdata/sf0.1/documents.parquet"
    spark.read.parquet(docs).count()
    (1 to 3).foreach { i =>
      time(s"docs scan+count run$i") { spark.read.parquet(docs).count() }
    }
    (1 to 3).foreach { i =>
      time(s"docs repart32 tokenize agg run$i") {
        val d = spark.read.parquet(docs).repartition(32)
        d.select(sum(size(split(lower(trim(col("text"))), "\\s+")))).collect()
      }
    }
    (1 to 3).foreach { i =>
      time(s"docs repart32 shingle+sha run$i") {
        val d = spark.read.parquet(docs).repartition(32)
        val toks = split(lower(trim(col("text"))), "\\s+")
        val sh = transform(sequence(lit(1), greatest(size(toks) - lit(2), lit(1))),
          x => sha2(array_join(slice(toks, x, lit(3)), " "), 256))
        d.select(sum(size(array_distinct(sh)))).collect()
      }
    }
    spark.stop()
  }
}
