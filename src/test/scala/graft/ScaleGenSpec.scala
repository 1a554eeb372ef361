package graft

import org.apache.spark.sql.functions._

/** Invariants of the SCALING.md rehearsal generator (graft.ScaleGen),
  * pinned at sf0.001 with R=2 so a drifted generator cannot silently
  * invalidate the measured scaling exponents:
  *
  *  - linear tables tile exactly R× with R× distinct keys and intact
  *    per-replica referential integrity (no orphan FKs);
  *  - events keep the source's time span (±1 ms jitter bound) and
  *    every 1-hour bin's population scales by exactly R;
  *  - documents: replica 0 is byte-identical, and same-replica
  *    duplicate structure survives while cross-replica token overlap
  *    collapses below near-dup thresholds;
  *  - embeddings keep unit norms bitwise-closely (orthogonal
  *    transform) and exact within-replica pairwise dot products.
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.run(spark, sfDir, dir, 2, 2)
    dir
  }

  "ScaleGen" should "tile linear tables R times with disjoint key ranges and intact FKs" in {
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    val src = Tables.lineitem(spark, sfDir)
    li.count() shouldBe src.count() * 2
    ord.select(countDistinct(col("o_orderkey"))).head.getLong(0) shouldBe
      Tables.orders(spark, sfDir).count() * 2
    // no orphan lineitems: every l_orderkey resolves
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count() shouldBe 0L
  }

  it should "densify events in the same span with exact per-hour-bin scaling" in {
    val ev = spark.read.parquet(s"$outDir/events.parquet")
    val src = Tables.events(spark, sfDir)
    ev.count() shouldBe src.count() * 2
    def bins(df: org.apache.spark.sql.DataFrame) = {
      val t = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => unix_micros(col("ts").cast("timestamp"))
      }
      df.select((t / lit(3600000000L)).cast("long").as("h"))
        .groupBy("h").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val sb = bins(src)
    val ob = bins(ev)
    ob.keySet shouldBe sb.keySet // jitter never crosses an hour bin
    sb.foreach { case (h, n) => ob(h) shouldBe n * 2 }
  }

  it should "preserve same-replica duplicate structure and break cross-replica near-dups" in {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val src = Tables.documents(spark, sfDir)
    val spanD = src.agg(max(col("doc_id"))).head.getLong(0) + 1
    docs.count() shouldBe src.count() * 2
    // replica 0 byte-identical
    val r0 = docs.filter(col("doc_id") < spanD).select("doc_id", "text", "n_chars")
    r0.exceptAll(src.select("doc_id", "text", "n_chars")).count() shouldBe 0L
    // same-replica duplicates: replica-1 exact-dup group count equals source's
    def dupGroups(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().filter(col("count") > 1).count()
    dupGroups(docs.filter(col("doc_id") >= spanD)) shouldBe dupGroups(src)
    // cross-replica 5-gram shingle Jaccard collapses: the shingle is
    // the minhash near-dup unit, and the same source doc's two
    // replicas must land far below every banding threshold
    val sz = (c: org.apache.spark.sql.Column) => org.apache.spark.sql.functions.size(c)
    val tok = docs
      .withColumn("base", pmod(col("doc_id"), lit(spanD)))
      .withColumn("rep", (col("doc_id") / lit(spanD)).cast("int"))
      .withColumn("toks", split(col("text"), " "))
      .filter(sz(col("toks")) >= 5)
      .select(col("base"), col("rep"),
        array_distinct(transform(sequence(lit(0), sz(col("toks")) - 5),
          i => array_join(slice(col("toks"), i + 1, lit(5)), " "))).as("sh"))
    val pairs = tok.filter(col("rep") === 0).as("a")
      .join(tok.filter(col("rep") === 1).as("b"), col("a.base") === col("b.base"))
      .select((sz(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        sz(array_union(col("a.sh"), col("b.sh")))).as("jac"))
    // repetitive one-token docs survive all-or-nothing (they are
    // already mutual near-dup cliques inside the source corpus), so
    // bound the BULK, not the max: mean collapses and the ≥0.7 tail —
    // the minhash banding region — stays a corner case
    val row = pairs.agg(avg(col("jac")),
      avg(when(col("jac") >= 0.7, 1.0).otherwise(0.0))).head
    row.getDouble(0) should be < 0.15
    row.getDouble(1) should be < 0.05
  }

  it should "apply an exactly orthogonal transform to embedding replicas" in {
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val src = Tables.embeddings(spark, sfDir)
    val spanV = src.agg(max(col("vec_id"))).head.getLong(0) + 1
    emb.count() shouldBe src.count() * 2
    // permutation + sign flip re-orders exact float values: the sorted
    // |component| multiset must be BITWISE identical to the source's
    val absSorted = array_sort(transform(col("embedding"), x => abs(x)))
    val r1 = emb.filter(col("vec_id") >= spanV)
      .select(pmod(col("vec_id"), lit(spanV)).as("id"), absSorted.as("m1"))
    val s0 = src.select(col("vec_id").as("id"), absSorted.as("m0"))
    r1.join(s0, "id").filter(col("m1") =!= col("m0")).count() shouldBe 0L
  }
}
