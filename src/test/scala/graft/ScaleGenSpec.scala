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

  it should "bound jitter under 1 ms with disjoint per-replica ranges at the default R" in {
    // the bin-scaling invariant's arithmetic, pinned at R=10 (the
    // default the rehearsals run with) without a full generation: max
    // jitter < 1 ms, and each replica's [min, max] range is disjoint
    // from every other's so same-event replicas can never collide
    import spark.implicits._
    val grid = (0L until 10L).flatMap(r => (0L until 2000L).map(e => (r, e))).toDF("r", "e")
    val j = grid.select(col("r"), ScaleGen.jitterNs(col("r"), col("e")).as("j"))
    j.agg(max(col("j"))).head.getLong(0) should be < 1000000L // < 1 ms in nanos
    val ranges = j.groupBy(col("r")).agg(min(col("j")).as("lo"), max(col("j")).as("hi"))
      .orderBy(col("r")).collect().map(row => (row.getLong(1), row.getLong(2)))
    ranges.sliding(2).foreach { case Array((_, hiPrev), (loNext, _)) =>
      loNext should be > hiPrev
    }
    // micros twin: same bounds in µs
    val ju = grid.select(col("r"), ScaleGen.jitterUs(col("r"), col("e")).as("j"))
    ju.agg(max(col("j"))).head.getLong(0) should be < 1000L
  }

  it should "refuse replica counts past the documented jitter bound" in {
    // the <1 ms / disjoint-range invariant holds only for R ≤ 200:
    // run() must fail loudly, not silently break bin scaling
    an[IllegalArgumentException] should be thrownBy
      ScaleGen.run(spark, sfDir, "/tmp/never_written", 201, 1, docsOnly = true)
    an[IllegalArgumentException] should be thrownBy
      ScaleGen.run(spark, sfDir, "/tmp/never_written", 0, 1, docsOnly = true)
  }

  it should "prepend one shared template block to ~30% of documents under boiler mode" in {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_boiler").toString
    ScaleGen.run(spark, sfDir, dir, 2, 1, docsOnly = true, boilerHot = true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val boiled = docs.filter(col("text").startsWith(ScaleGen.BoilerTemplate))
    val frac = boiled.count().toDouble / docs.count()
    frac should be (0.3 +- 0.08) // deterministic hash split
    // n_chars re-stamped to the injected length
    boiled.filter(
      org.apache.spark.sql.functions.length(col("text")).cast("long") =!= col("n_chars")
    ).count() shouldBe 0L
    // the template is 40 words: the hot-shingle head every boiled doc shares
    ScaleGen.BoilerTemplate.split(" ").length shouldBe 40
  }

  it should "generate only documents+embeddings with a ~30% hot source under docs-only skew mode" in {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_skew").toString
    ScaleGen.run(spark, sfDir, dir, 2, 2, docsOnly = true, skewHot = true)
    // docs-only: the TPC-H/events tables are not written
    new java.io.File(s"$dir/lineitem.parquet").exists() shouldBe false
    new java.io.File(s"$dir/events.parquet").exists() shouldBe false
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() shouldBe Tables.documents(spark, sfDir).count() * 2
    // the hot source holds the ~30% re-labeled share PLUS its organic
    // share — strictly above 25%, far above any uniform source's
    val total = docs.count().toDouble
    val top = docs.groupBy("source").count().orderBy(col("count").desc).head
    top.getLong(1) / total should be > 0.25
    // deterministic: same flag, same rows relabeled
    val docs2dir = java.nio.file.Files.createTempDirectory("scalegen_skew2").toString
    ScaleGen.run(spark, sfDir, docs2dir, 2, 2, docsOnly = true, skewHot = true)
    spark.read.parquet(s"$docs2dir/documents.parquet")
      .select("doc_id", "source").exceptAll(docs.select("doc_id", "source"))
      .count() shouldBe 0L
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
