package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_ngram_pairs phase timings (not a test). */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs0.count())
    DedupOps.ngramJaccardPairs(docs0, "text", "doc_id",
      groupCol = "source", n = 3, minJaccard = 0.2).count()
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (_ <- 1 to 2) {
      t("full")(DedupOps.ngramJaccardPairs(docs0, "text", "doc_id",
        groupCol = "source", n = 3, minJaccard = 0.2).count())
      val d = docs0.select(col("doc_id").as("__id"),
        col("source").as("__g"),
        graft.functions.HashedShingles(col("text"), 3).as("__sh"))
      t("shingle-only")(d.agg(sum(size(col("__sh")))).collect()(0).getLong(0))
      val ex = d.select(col("__id"), size(col("__sh")).as("__sz"),
        col("__g"), explode(col("__sh")).as("__s"))
      t("explode")(ex.count())
      val wf = ex.withColumn("__f", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__s"), col("__g"))))
      t("window")(wf.count())
      val cold = wf.filter(col("__f") <= 64)
      val pj = cold.as("a").join(cold.as("b"),
        col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id") &&
          col("a.__g") === col("b.__g"))
        .select(col("a.__id").as("id_a"), col("a.__sz").as("sz_a"),
          col("b.__id").as("id_b"), col("b.__sz").as("sz_b"))
      t("cold-pairjoin")(pj.count())
      t("cold-pair-groupBy")(pj.groupBy("id_a", "sz_a", "id_b", "sz_b")
        .agg(count(lit(1))).count())
      val cached = wf.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("probe-hot-empty") {
        if (cached.filter(col("__f") > 64).isEmpty) 0L else 1L
      }
      val coldC = cached.filter(col("__f") <= 64)
      val pjC = coldC.as("a").join(coldC.as("b"),
        col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id") &&
          col("a.__g") === col("b.__g"))
        .select(col("a.__id").as("id_a"), col("a.__sz").as("sz_a"),
          col("b.__id").as("id_b"), col("b.__sz").as("sz_b"))
      val scored = pjC.groupBy("id_a", "sz_a", "id_b", "sz_b")
        .agg(count(lit(1)).as("__c"))
        .withColumn("jaccard",
          col("__c") / (col("sz_a") + col("sz_b") - col("__c")))
        .filter(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))
      t("cold-only-full")(scored.count())
      t("cold-only-full-2nd")(scored.count())
      cached.unpersist()
    }
    spark.stop()
  }
}
