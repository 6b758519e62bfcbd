package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, per-partition scoring, top-k via window.
  *    Correct at any corpus size as long as the QUERY side is small;
  *    cost is one corpus scan per batch of queries.
  *  - [[lshTopK]]: the scale path — deterministic random-hyperplane
  *    buckets shrink the candidate set ~2^bits-fold before scoring;
  *    recall traded via `bits` (an IVF-style coarse quantizer built
  *    from seeded hyperplanes instead of k-means centroids, so it
  *    needs no training pass).
  *
  * Dot products use `zip_with` + `aggregate` — built-in higher-order
  * functions, evaluated per-row without UDF serialization overhead.
  */
object SimilarityOps {

  /** Cosine similarity of two float-array columns — native codegen'd
    * expression ([[graft.functions.CosineSimilarity]]); bit-identical
    * to [[cosineComposable]] but stays inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Reference implementation from built-in higher-order functions
    * (zip_with + aggregate). Kept as the portable/comparison form.
    */
  def cosineComposable(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Deterministic pseudo-random hyperplane sign bucket: `bits` signs,
    * each from the dot product with a hash-derived ±1 hyperplane.
    * Same-direction vectors collide with high probability. Native
    * single-pass expression ([[graft.functions.HyperplaneBucket]]).
    */
  def hyperplaneBucket(vec: Column, bits: Int = 8): Column =
    graft.functions.HyperplaneBucket(vec, bits)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries (qid, vector) — small enough to broadcast
    * @param corpus  (id, vector) — arbitrarily large
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qidCol: String = "qid", idCol: String = "id",
      vecCol: String = "vec"): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("__qid"),
      col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(q) // broadcast-nested-loop: one corpus scan
      .filter(col("__qid") =!= col("__id"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy("__qid")
      .orderBy(col("cos").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("qid"), col("rank"),
        col("__id").as("neighbor_id"), col("cos"))
  }

  /** IVF-style approximate top-k: a coarse quantizer partitions the
    * corpus into `nlist` cells, and each query scores only the
    * `nprobe` cells whose centroids it is closest to.
    *
    * Training-free and deterministic: the centroids are the first
    * `nlist` corpus vectors by id — for near-random high-dimensional
    * data this quantizes comparably to k-means while needing no
    * training pass and no RNG (re-runnable, oracle-friendly). The
    * cell assignment is one broadcast-centroids pass over the corpus
    * (per-row argmax, `max_by`), the probe is a shuffle join on the
    * cell id — candidate volume is ~`nprobe/nlist` of the corpus.
    * At 100 TB the assignment is a cached/materialized index table in
    * practice; here it is recomputed per call for self-containment.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      qidCol: String = "qid", idCol: String = "id",
      vecCol: String = "vec",
      refineIterations: Int = 0): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
    val centroids =
      if (refineIterations <= 0)
        broadcast(c.orderBy("__id").limit(nlist)
          .select(col("__id").as("__cid"), col("__cv").as("__cent")))
      else broadcast(kmeansCentroids(c, nlist, refineIterations))
    val assigned = c.crossJoin(centroids)
      .withColumn("__sim", cosine(col("__cv"), col("__cent")))
      .groupBy("__id")
      .agg(max_by(col("__cid"), col("__sim")).as("__cid"),
        first(col("__cv")).as("__cv"))
    val qw = Window.partitionBy("__qid").orderBy(
      col("__qsim").desc, col("__cid").asc)
    val probes = broadcast(
      queries.select(col(qidCol).as("__qid"), col(vecCol).as("__qv"))
        .crossJoin(centroids)
        .withColumn("__qsim", cosine(col("__qv"), col("__cent")))
        .withColumn("__prank", row_number().over(qw))
        .filter(col("__prank") <= nprobe)
        .select(col("__qid"), col("__qv"), col("__cid")))
    val w = Window.partitionBy("__qid")
      .orderBy(col("cos").desc, col("__id").asc)
    assigned.join(probes, "__cid")
      .filter(col("__qid") =!= col("__id"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("qid"), col("rank"),
        col("__id").as("neighbor_id"), col("cos"))
  }

  /** Build a PERSISTED IVF index over `corpus` as a pair of lake
    * tables under `indexPath` — the build-once/probe-many form of
    * [[ivfTopK]], which recomputes the cell assignment on every call:
    *
    *  - `<indexPath>/centroids` — (cell, centroid), `nlist` rows; its
    *    log-derived size makes probe-time joins auto-broadcast.
    *  - `<indexPath>/assignments` — (id, vec, cell) PARTITIONED BY
    *    cell, so a probe's `cell IN (...)` filter prunes to exactly
    *    the probed cells' files at planning time.
    *
    * At 100 TB this is the difference between "ANN query = one corpus
    * scan + assignment shuffle, every time" and "ANN query = read
    * ~nprobe/nlist of the corpus, nothing else": the expensive
    * assignment pass happens once per index build, rides lake ACID
    * (rebuilds are atomic overwrites, readers never see a half-built
    * index), and the probe path is pure partition-pruned scan + one
    * broadcast join.
    */
  def buildIvfIndex(
      corpus: DataFrame, indexPath: String,
      nlist: Int = 16, refineIterations: Int = 0,
      idCol: String = "id", vecCol: String = "vec"): Unit = {
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
    val centroids =
      if (refineIterations <= 0)
        broadcast(c.orderBy("__id").limit(nlist)
          .select(col("__id").as("__cid"), col("__cv").as("__cent")))
      else broadcast(kmeansCentroids(c, nlist, refineIterations))
    // canonical nullable array<float>: schema enforcement must see
    // the same type on every rebuild regardless of the source frame's
    // containsNull flag. The two index tables are independent, so
    // their writes (each a full stage/adopt/commit cycle) run
    // CONCURRENTLY — on a fused build+probe path the commits are a
    // measurable fraction of build wall-clock.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val centroidWrite = Future {
      graft.lake.LakeWriter.write(
        centroids.select(col("__cid").cast("long").as("cell"),
          col("__cent").cast("array<float>").as("centroid")),
        s"$indexPath/centroids", mode = "overwrite",
        operation = "BUILD IVF INDEX")
    }
    val assigned = c.crossJoin(centroids)
      .withColumn("__sim", cosine(col("__cv"), col("__cent")))
      .groupBy("__id")
      .agg(max_by(col("__cid"), col("__sim")).as("cell"),
        first(col("__cv")).as("vec"))
      .select(col("__id").as("id"),
        col("vec").cast("array<float>").as("vec"),
        col("cell").cast("long").as("cell"))
    graft.lake.LakeWriter.write(assigned, s"$indexPath/assignments",
      mode = "overwrite", partitionBy = Seq("cell"),
      operation = "BUILD IVF INDEX")
    Await.result(centroidWrite, Duration.Inf)
    ()
  }

  /** Probe a [[buildIvfIndex]] index: per query, rank the centroids,
    * take the top `nprobe` cells, scan ONLY those cells' partitions
    * (static `isin` pruning — the probed-cell set is ≤ nlist, driver
    * metadata-sized regardless of query count) and score candidates.
    */
  def ivfIndexTopK(
      queries: DataFrame, indexPath: String, k: Int, nprobe: Int = 4,
      qidCol: String = "qid", vecCol: String = "vec"): DataFrame = {
    val spark = queries.sparkSession
    val centroids = broadcast(
      graft.lake.LakeTable.forPath(spark, s"$indexPath/centroids").toDF
        .select(col("cell").as("__cid"), col("centroid").as("__cent")))
    val qw = Window.partitionBy("__qid").orderBy(
      col("__qsim").desc, col("__cid").asc)
    val probes = broadcast(
      queries.select(col(qidCol).as("__qid"), col(vecCol).as("__qv"))
        .crossJoin(centroids)
        .withColumn("__qsim", cosine(col("__qv"), col("__cent")))
        .withColumn("__prank", row_number().over(qw))
        .filter(col("__prank") <= nprobe)
        .select(col("__qid"), col("__qv"), col("__cid")))
    val probedCells = probes.select(col("__cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    val candidates = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").toDF
      .filter(col("cell").isin(probedCells.toSeq: _*))
    val w = Window.partitionBy("__qid")
      .orderBy(col("cos").desc, col("id").asc)
    candidates.join(probes, candidates("cell") === probes("__cid"))
      .filter(col("__qid") =!= col("id"))
      .withColumn("cos", round(cosine(col("__qv"), col("vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("qid"), col("rank"),
        col("id").as("neighbor_id"), col("cos"))
  }

  /** Sampled, deterministic k-means centroids for [[ivfTopK]]'s
    * `refineIterations` option. First-n-by-id centroids are fine for
    * near-random embeddings, but on CLUSTERED real-world data they can
    * all land inside one cluster: cell assignment then rides on noise
    * dot-products, a perturbed query probes different cells than its
    * source, and recall collapses. This path fixes that without RNG
    * (same corpus → same centroids, re-runnable and oracle-friendly):
    *
    *  1. sample ~8·nlist candidates by xxhash64(id) order — the
    *     deterministic stand-in for k-means||'s random oversampling;
    *  2. greedy farthest-point seeding over the candidates (driver
    *     side: the sample is metadata-sized) — one seed per real
    *     cluster with high probability;
    *  3. `iters` distributed Lloyd steps: broadcast-assign (one corpus
    *     pass, max_by argmax), per-dimension mean via posexplode +
    *     partial-aggregating groupBy. Empty cells keep their previous
    *     centroid. Per step: one corpus scan + a shuffle of
    *     nlist × dims rows — nothing driver-sized but the centroids.
    */
  private[graft] def kmeansCentroids(
      c: DataFrame, nlist: Int, iters: Int): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val sample = c.withColumn("__h", xxhash64(col("__id")))
      .orderBy("__h").limit(math.max(8 * nlist, 64))
      .select("__cv").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "kmeansCentroids: empty corpus")
    def cosv(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    while (chosen.size < nlist && chosen.size < sample.length) {
      chosen += sample.minBy(v => chosen.map(cosv(v, _)).max)
    }
    var cents: Seq[(Long, Seq[Double])] =
      chosen.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    (1 to iters).foreach { _ =>
      val cdf = broadcast(cents.toDF("__cid", "__cent")
        .withColumn("__centf",
          transform(col("__cent"), x => x.cast("float"))))
      val updated = c.crossJoin(cdf)
        .withColumn("__sim", cosine(col("__cv"), col("__centf")))
        .groupBy("__id")
        .agg(max_by(col("__cid"), col("__sim")).as("__cid"),
          first(col("__cv")).as("__cv"))
        .select(col("__cid"), posexplode(col("__cv")))
        .toDF("__cid", "__pos", "__x")
        .groupBy("__cid", "__pos").agg(avg("__x").as("__m"))
        .groupBy("__cid")
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("__cent"))
        .as[(Long, Seq[Double])].collect().toMap
      cents = cents.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, old))
      }
    }
    cents.toDF("__cid", "__cent")
      .select(col("__cid"),
        transform(col("__cent"), x => x.cast("float")).as("__cent"))
  }

  /** Approximate top-k: score only within the query's hyperplane
    * bucket, plus (multi-probe) the `bits` adjacent buckets at Hamming
    * distance 1 — near-boundary neighbors usually differ in exactly one
    * sign, so probing them recovers most of the recall lost to
    * quantization at the cost of bits+1 small probes per query (the
    * corpus is still bucketed once).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 6,
      qidCol: String = "qid", idCol: String = "id",
      vecCol: String = "vec", multiProbe: Boolean = true): DataFrame = {
    val base = queries.select(col(qidCol).as("__qid"), col(vecCol).as("__qv"))
      .withColumn("__base", hyperplaneBucket(col("__qv"), bits))
    val probed =
      if (!multiProbe) base.withColumn("__bucket", col("__base"))
      else base.withColumn("__bucket", explode(array(
        col("__base") +: (0 until bits).map(i =>
          col("__base").bitwiseXOR(lit(1L << i))): _*)))
    val q = broadcast(probed.drop("__base"))
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
      .withColumn("__bucket", hyperplaneBucket(col("__cv"), bits))
    val scored = c.join(q, "__bucket")
      .filter(col("__qid") =!= col("__id"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy("__qid")
      .orderBy(col("cos").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("qid"), col("rank"),
        col("__id").as("neighbor_id"), col("cos"))
  }
}
