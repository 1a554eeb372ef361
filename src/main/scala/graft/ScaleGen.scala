package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor rehearsal data generator: tiles a driver testdata
  * directory R× into a larger synthetic scale factor, following the
  * driver's own observed scaling law between sf0.01 and sf0.1:
  *
  *  - TPC-H tables scale linearly in rows with a FIXED date range
  *    (replicas get disjoint key ranges: custkey/orderkey/partkey/
  *    suppkey offset by replica·span, FK columns remapped together so
  *    referential integrity holds per replica);
  *  - `events` densifies inside the SAME 30-day span (10× rows, 10×
  *    users, same 5 channels — exactly what sf0.01→sf0.1 does), with
  *    a sub-millisecond deterministic jitter per replica so replicas
  *    do not collide on identical timestamps while every ≥1 s time
  *    bin's population scales by exactly R;
  *  - `documents` scale linearly with a deterministic per-replica
  *    token perturbation (~40% of tokens get a replica suffix chosen
  *    by xxhash64(token, r)): WITHIN a replica, identical texts stay
  *    identical (exact/near-dup structure preserved), while ACROSS
  *    replicas 5-gram shingle Jaccard collapses to ~0.08 — pure
  *    tiling would instead make every doc a member of an R-clique of
  *    near-dups, growing pair density by R² and unfairly inflating
  *    the dedup family's scaling exponent;
  *  - `embeddings` scale at the driver's own sublinear rate (4× per
  *    10× sf: 500→2000 between sf0.01 and sf0.1) via per-replica
  *    orthogonal transforms (seeded dimension permutation + sign
  *    flips): norms and within-replica cluster geometry are EXACTLY
  *    preserved, replica subspaces are decorrelated, so ANN index
  *    build/probe costs scale honestly.
  *
  * Dev tool for SCALING.md — never part of the driver contract.
  * Usage: runMain graft.ScaleGen <inDir> <outDir> [replicas=10] [embReplicas=4]
  */
object ScaleGen {

  /** 0..r-1 replica fan-out column. */
  private def fan(df: DataFrame, r: Int): DataFrame =
    df.withColumn("__r", explode(array((0 until r).map(i => lit(i.toLong)): _*)))

  private def keySpan(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(Runtime.getRuntime.availableProcessors, 32))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10,
      if (args.length > 3) args(3).toInt else 4)
    spark.stop()
  }

  def run(spark: SparkSession, inDir: String, outDir: String,
          replicas: Int, embReplicas: Int): Unit = {

    // output split count grows with the tiling factor, exactly as a
    // real ingest layout would: a fixed file count would cap SCAN
    // parallelism at the base SF's task count and masquerade as a
    // super-linear operator in the exponent measurements (round-13
    // lesson: 4-file documents made map-only quality scans read as
    // exponent ~1.1 — 10x work on the same 4 tasks)
    def save(df: DataFrame, name: String, baseParts: Int): Unit = {
      val parts = baseParts * math.max(1, replicas / 2)
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows ($parts files)")
    }

    // fixed dimension tables: copy as-is (TPC-H keeps them SF-invariant)
    save(Tables.region(spark, inDir), "region", 1)
    save(Tables.nation(spark, inDir), "nation", 1)

    val cust = Tables.customer(spark, inDir)
    val ord = Tables.orders(spark, inDir)
    val prt = Tables.part(spark, inDir)
    val supp = Tables.supplier(spark, inDir)
    val li = Tables.lineitem(spark, inDir)
    val spanC = keySpan(cust, "c_custkey")
    val spanO = keySpan(ord, "o_orderkey")
    val spanP = keySpan(prt, "p_partkey")
    val spanS = keySpan(supp, "s_suppkey")

    save(fan(cust, replicas)
      .withColumn("c_custkey", col("c_custkey") + col("__r") * spanC)
      .drop("__r"), "customer", 2)
    save(fan(supp, replicas)
      .withColumn("s_suppkey", col("s_suppkey") + col("__r") * spanS)
      .drop("__r"), "supplier", 1)
    save(fan(prt, replicas)
      .withColumn("p_partkey", col("p_partkey") + col("__r") * spanP)
      .drop("__r"), "part", 2)
    save(fan(ord, replicas)
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * spanO)
      .withColumn("o_custkey", col("o_custkey") + col("__r") * spanC)
      .drop("__r"), "orders", 4)
    save(fan(li, replicas)
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * spanO)
      .withColumn("l_partkey", col("l_partkey") + col("__r") * spanP)
      .withColumn("l_suppkey", col("l_suppkey") + col("__r") * spanS)
      .drop("__r"), "lineitem", 16)

    // events: densify in place — same span, same channels, R× users.
    // Jitter stays under 1 ms so second-and-coarser bins scale exactly.
    val ev = Tables.events(spark, inDir)
    val spanE = keySpan(ev, "event_id")
    val spanU = keySpan(ev, "user_id")
    val evFan = fan(ev, replicas)
    val jittered = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanosAsLong: ts is Long nanoseconds — jitter in integer nanos
        val jitterNs = col("__r") * lit(101000L) +
          pmod(xxhash64(col("event_id"), col("__r")), lit(899000L))
        evFan.withColumn("ts",
          when(col("__r") === 0L, col("ts")).otherwise(col("ts") + jitterNs))
      case _ =>
        val jitterUs = col("__r") * lit(101L) +
          pmod(xxhash64(col("event_id"), col("__r")), lit(899L))
        evFan.withColumn("ts",
          when(col("__r") === 0L, col("ts"))
            .otherwise(timestamp_micros(unix_micros(col("ts").cast("timestamp")) + jitterUs)))
    }
    save(jittered
      .withColumn("event_id", col("event_id") + col("__r") * spanE)
      .withColumn("user_id", col("user_id") + col("__r") * spanU)
      .drop("__r"), "events", 8)

    // documents: replica 0 byte-identical; replicas >0 perturb ~50% of
    // tokens deterministically by (token, r) so same-replica duplicate
    // pairs survive and cross-replica near-dup pairs do not (5-gram
    // shingle survival ≈ 0.5⁵ ≈ 3%, far under every minhash band bar).
    val docs = Tables.documents(spark, inDir)
    val spanD = keySpan(docs, "doc_id")
    val perturbed = fan(docs, replicas)
      .withColumn("text",
        when(col("__r") === 0L, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "), t =>
              when(t =!= "" && pmod(xxhash64(t, col("__r")), lit(2L)) === 0L,
                concat(t, lit("~"), col("__r"))).otherwise(t)),
            " ")))
      .withColumn("n_chars", length(col("text")))
      .withColumn("doc_id", col("doc_id") + col("__r") * spanD)
      .drop("__r")
    save(perturbed, "documents", 4)

    // embeddings: driver law is ~4× per decade; per-replica orthogonal
    // transform (dimension permutation + sign flips) keeps unit norms
    // and within-replica geometry, decorrelates replicas.
    val emb = Tables.embeddings(spark, inDir)
    val spanV = keySpan(emb, "vec_id")
    val dims = emb.select(size(col("embedding"))).head.getInt(0)
    val replicaDfs = (0 until embReplicas).map { r =>
      val base = emb.withColumn("vec_id", col("vec_id") + lit(r.toLong * spanV))
      if (r == 0) base
      else {
        val rng = new scala.util.Random(0x5ca1e000L + r)
        val perm = rng.shuffle((0 until dims).toVector)
        val sign = Vector.fill(dims)(if (rng.nextBoolean()) 1.0f else -1.0f)
        base.withColumn("embedding",
          array((0 until dims).map(j =>
            element_at(col("embedding"), perm(j) + 1) * lit(sign(j))): _*)
            .cast("array<float>"))
      }
    }
    save(replicaDfs.reduce(_ unionAll _), "embeddings", 2)
  }
}
