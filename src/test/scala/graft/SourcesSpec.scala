package graft

import java.nio.file.Files

import graft.sources.BinarySegments
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  "BinarySegments" should "round-trip gzipped big-endian float64 blobs with reconstructed timestamps" in {
    val dir = Files.createTempDirectory("graft-blobs").toFile
    val a = Array(1.5, -2.25, 3.125, 64.0)
    val b = Array(0.0, 42.0)
    BinarySegments.writeBlob(s"$dir/ch_a_0.bin.gz", a)
    BinarySegments.writeBlob(s"$dir/ch_b_0.bin.gz", b)

    // range index: channel a @ 250 Hz from t=1_000_000, channel b @ 1 Hz from 0
    val index = Seq(
      ("a", "ch_a_0.bin.gz", 1000000L, 250.0),
      ("b", "ch_b_0.bin.gz", 0L, 1.0)
    ).toDF("channel", "file", "start_us", "rate")

    val got = BinarySegments
      .read(spark, dir.toString, index)
      .orderBy("channel", "t")
      .as[(String, Long, Double)]
      .collect()
      .toList

    // period = round(1e6/rate): 4000 µs for a, 1e6 µs for b
    got shouldBe List(
      ("a", 1000000L, 1.5),
      ("a", 1004000L, -2.25),
      ("a", 1008000L, 3.125),
      ("a", 1012000L, 64.0),
      ("b", 0L, 0.0),
      ("b", 1000000L, 42.0)
    )
  }

  it should "feed decoded rows into the standard trim operator" in {
    val dir = Files.createTempDirectory("graft-blobs2").toFile
    BinarySegments.writeBlob(s"$dir/c.gz", (1 to 100).map(_.toDouble).toArray)
    val index = Seq(("c", "c.gz", 0L, 1000.0)).toDF("channel", "file", "start_us", "rate")
    val ts = BinarySegments.read(spark, dir.toString, index)
    // trim to [10ms, 20ms) -> samples 10..19 (period 1000 µs)
    val trimmed = graft.operators.Timeseries.rangeQuery(ts, Seq("c"), 10000L, 20000L)
    trimmed.count() shouldBe 10L
    trimmed.agg(min("v"), max("v")).as[(Double, Double)].head() shouldBe ((11.0, 20.0))
  }

  it should "decode only blobs and samples overlapping a range query" in {
    val dir = Files.createTempDirectory("graft-blobs3").toFile
    // two real blobs at 1 kHz (period 1000 µs): A covers [0, 100ms),
    // B covers [100ms, 200ms); B lives in a channel/time-bucket
    // subdirectory and is indexed by its relative path
    BinarySegments.writeBlob(s"$dir/a.gz", (0 until 100).map(_.toDouble).toArray)
    Files.createDirectories(new java.io.File(dir, "c/2024").toPath)
    BinarySegments.writeBlob(s"$dir/c/2024/a.gz", (100 until 200).map(_.toDouble).toArray)
    // a third indexed blob OUTSIDE the range that is not even valid
    // gzip: if the scan touched it, the query would throw — proof the
    // index pre-filter prunes the file before any bytes are read
    Files.write(new java.io.File(dir, "poison.gz").toPath, Array[Byte](1, 2, 3, 4))
    val index = Seq(
      ("c", "a.gz", 0L, 99000L, 1000.0),
      // same basename as a.gz in a subdirectory: relative-path matching
      // must keep the two apart
      ("c", "c/2024/a.gz", 100000L, 199000L, 1000.0),
      ("c", "poison.gz", 1000000L, 1099000L, 1000.0)
    ).toDF("channel", "file", "start_us", "end_us", "rate")

    val got = BinarySegments
      .readRange(spark, dir.toString, index, 50000L, 150000L)
      .orderBy("t")
      .as[(String, Long, Double)]
      .collect()
      .toList
    // samples 50..99 from A (trailing half decoded after a skipped
    // prefix) and 100..149 from B (decode early-stops mid-blob)
    got.map(_._3) shouldBe (50 until 150).map(_.toDouble).toList
    got.head shouldBe (("c", 50000L, 50.0))
    got.last shouldBe (("c", 149000L, 149.0))

    // disjoint range: nothing decoded, empty result, still no poison
    BinarySegments.readRange(spark, dir.toString, index, 300000L, 400000L).count() shouldBe 0L

    // plan shape: the binaryFile scan is column-pruned to metadata
    // (path) — blob CONTENT never enters the plan (bytes are opened
    // executor-side per matched file), and the index join is a
    // broadcast; nothing about the file set is collected to the driver
    val plan = BinarySegments
      .readRange(spark, dir.toString, index, 50000L, 150000L)
      .queryExecution
      .executedPlan
      .toString
    plan should include("BroadcastHashJoin")
    plan should not include "content"
  }

  "TsLayout" should "prune partitions for channel/time range queries and match the flat-scan result" in {
    import graft.sources.TsLayout
    val dir = Files.createTempDirectory("graft-layout").toFile.toString
    val ts = Tables.ts(spark, sfDir).select("channel", "t", "v")
    TsLayout.write(ts, dir, bucketUs = TsLayout.DayUs)

    val layout = TsLayout.read(spark, dir)
    val start = 1704412800000000L
    val end = 1705708800000000L
    val q = TsLayout.rangeQuery(layout, Seq("click", "error"), start, end)

    // partition pruning visible in the plan: only matching dirs scanned
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PartitionFilters:")
    plan should include("p_channel")

    // result equality against the flat scan
    val expected = graft.operators.Timeseries
      .rangeQuery(ts, Seq("click", "error"), start, end)
      .select("channel", "t", "v")
    q.count() shouldBe expected.count()
    q.exceptAll(expected).count() shouldBe 0L
  }

  "SegmentSink" should "emit reference-vocabulary segments split at gaps and the point cap" in {
    import graft.sources.SegmentSink
    // downsample-shaped rows: channel a has a 3-bucket run then a gap
    // then a 2-bucket run; cap = 2 points per segment
    val down = Seq(
      ("a", 0L, 1.0, 2.0),
      ("a", 1L, 3.0, 4.0),
      ("a", 2L, 5.0, 6.0),
      ("a", 5L, 7.0, 8.0),
      ("a", 6L, 9.0, 10.0),
      ("b", 10L, -1.0, 1.0)
    ).toDF("channel", "bucket", "vmin", "vmax")
    val segs = SegmentSink
      .toSegments(spark, down, pixelUs = 1000L, maxPointsPerSegment = 2)
      .collect()
      .sortBy(s => (s.source, s.startTs))
    segs.map(s => (s.source, s.startTs, s.nrPoints, s.data)) shouldBe Array(
      ("a", 0L, 2, Seq(1.0, 2.0, 3.0, 4.0)),
      ("a", 2000L, 1, Seq(5.0, 6.0)),
      ("a", 5000L, 2, Seq(7.0, 8.0, 9.0, 10.0)),
      ("b", 10000L, 1, Seq(-1.0, 1.0))
    )
    segs.foreach { s =>
      s.isMinMax shouldBe true
      s.samplePeriod shouldBe 1000.0
      s.requestedSamplePeriod shouldBe 1000L
      s.segmentType shouldBe "continuous"
      s.data.length shouldBe s.nrPoints * 2
    }
    // composes directly with the batch downsample path on real data
    val real = SegmentSink
      .toSegments(
        spark,
        graft.operators.Timeseries.downsample(Tables.ts(spark, sfDir), 3600000000L),
        3600000000L
      )
      .collect()
    real should not be empty
    real.map(_.nrPoints).sum.toLong shouldBe
      graft.operators.Timeseries.downsample(Tables.ts(spark, sfDir), 3600000000L).count()
  }

  "BlobStore" should "refuse a (channel, day) group that overflows the 1 Hz day grid" in {
    // 86,401 events in one day would collide with the next day's
    // sample 0 — storeFor must fail loudly, not emit duplicate ts
    import spark.implicits._
    val dayNs = graft.sources.BlobStore.DayUs * 1000L
    val n = graft.sources.BlobStore.DayUs / graft.sources.BlobStore.PeriodUs + 1
    val dir = Files.createTempDirectory("graft-overflow").toString
    (0L until n)
      .map(i => (i, 100L * dayNs + i, 0L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    // the guard now fires inside the executor task that writes the
    // blob, so Spark surfaces it wrapped — match on the message
    val e = intercept[Exception] {
      graft.sources.BlobStore.storeFor(spark, dir)
    }
    e.getMessage should include("exceeds")
  }

  it should "build the store distributed and serve reads by partition-path pruning" in {
    import graft.sources.BlobStore
    val (root, index) = BlobStore.storeFor(spark, sfDir)

    // hive-partitioned layout on disk: channel=<ch>/bucket=<day>/data.bin
    val chDirs = new java.io.File(root).listFiles().filter(_.isDirectory)
    chDirs should not be empty
    chDirs.foreach(_.getName should startWith("channel="))
    chDirs.head.listFiles().head.getName should startWith("bucket=")

    // the build is one (channel, bucket)-keyed exchange feeding the
    // blob-writing mapPartitions — no data-row collect exists: the
    // returned relation IS the index, one row per blob
    val buildPlan = BlobStore
      .buildStore(
        Tables.ts(spark, sfDir).select($"channel", $"t", $"v", $"event_id"),
        Files.createTempDirectory("graft-blob-plan").toString
      )
      .queryExecution
      .executedPlan
      .toString
    buildPlan should include("hashpartitioning(channel")
    val nGroups = Tables
      .ts(spark, sfDir)
      .select($"channel", expr(s"t div ${BlobStore.DayUs}"))
      .distinct()
      .count()
    index.length.toLong shouldBe nGroups

    // the read prunes by partition path: the day predicate appears as
    // a PartitionFilter, not a data filter, and no file list is
    // collected to the driver
    val q = graft.sources.BinarySegments.readRangePartitioned(
      spark,
      root,
      index.toDF("channel", "bucket", "start_us", "end_us", "rate"),
      graft.operators.Timeseries.RangeStartUs,
      graft.operators.Timeseries.RangeEndUs,
      BlobStore.DayUs
    )
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PartitionFilters:")
    plan should include("bucket")
  }

  it should "never open partitions outside the queried range" in {
    import graft.sources.{BinarySegments, BlobStore}
    val root = Files.createTempDirectory("graft-blob-poison").toFile
    // a valid 1 kHz blob in bucket 0 and POISON bytes (not gzip) in
    // bucket 5: if partition pruning ever touched bucket 5's bytes the
    // query would throw
    Files.createDirectories(new java.io.File(root, "channel=c/bucket=0").toPath)
    Files.createDirectories(new java.io.File(root, "channel=c/bucket=5").toPath)
    BinarySegments.writeBlob(
      s"$root/channel=c/bucket=0/data.bin",
      (0 until 100).map(_.toDouble).toArray
    )
    Files.write(
      new java.io.File(root, "channel=c/bucket=5/data.bin").toPath,
      Array[Byte](1, 2, 3, 4)
    )
    val bucketUs = 100000L // 100 ms buckets (1 kHz × 100 samples)
    val index = Seq(
      ("c", 0L, 0L, 99000L, 1000.0),
      ("c", 5L, 500000L, 599000L, 1000.0)
    ).toDF("channel", "bucket", "start_us", "end_us", "rate")
    val got = BinarySegments
      .readRangePartitioned(spark, root.toString, index, 50000L, 100000L, bucketUs)
      .orderBy("t")
      .as[(String, Long, Double)]
      .collect()
    got.map(_._3).toList shouldBe (50 until 100).map(_.toDouble).toList
  }

  "TsLayout.compact" should "collapse fragmented partitions to single files with identical content" in {
    import graft.sources.TsLayout
    import spark.implicits._
    val src = Files.createTempDirectory("graft-frag").toFile.getAbsolutePath
    val dst = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    // fragment: three append passes, each scattering every partition
    // across 4 writer tasks — the streaming-ingest small-files shape
    val day = TsLayout.DayUs
    (0 until 3).foreach { pass =>
      val ts = (0 until 400).map { i =>
        ("c" + (i % 2), (i % 4).toLong * day + i.toLong * 1000L + pass, (i + pass).toDouble)
      }.toDF("channel", "t", "v")
      ts.withColumn("p_channel", col("channel"))
        .withColumn("p_bucket", floor(col("t") / lit(day.toDouble)).cast("long"))
        .repartition(4)
        .write
        .partitionBy("p_channel", "p_bucket")
        .mode("append")
        .parquet(src)
    }
    // give the fragmented layout a marker like write() would
    val marker = new java.io.File(src, "_graft_bucket_us")
    Files.writeString(marker.toPath, day.toString)

    def partFiles(root: String): Map[String, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root))
        .filter(f => f.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath.stripPrefix(root))
        .view.mapValues(_.size).toMap
    }
    val before = partFiles(src)
    before.values.max should be >= 3 // genuinely fragmented

    TsLayout.compact(spark, src, dst)

    val after = partFiles(dst)
    after.keySet.map(_.replace(dst, "")) shouldBe before.keySet.map(_.replace(src, ""))
    after.values.foreach(_ shouldBe 1) // one file per partition dir
    // content identical
    val a = TsLayout.read(spark, src).select("channel", "t", "v")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = TsLayout.read(spark, dst).select("channel", "t", "v")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    b shouldBe a
    // the marker survives, so rule-derived pruning still works
    TsLayout.markerWidth(dst, spark.sessionState.newHadoopConf()) shouldBe Some(day)
  }

  "EmbLayout.compact" should "collapse fragmented bucket dirs to single files, content and marker intact" in {
    import graft.sources.EmbLayout
    import graft.operators.Similarity
    import spark.implicits._
    val src = Files.createTempDirectory("graft-emb-frag").toFile.getAbsolutePath
    val dst = Files.createTempDirectory("graft-emb-compact").toFile.getAbsolutePath
    val hp = Similarity.hyperplanes(EmbLayout.Planes, 8)
    // fragment: three append passes, each scattering every bucket
    // across 4 writer tasks — the streaming-ingest small-files shape
    (0 until 3).foreach { pass =>
      val emb = (0 until 120).map { i =>
        val id = pass * 1000L + i
        (id, (0 until 8).map(d => math.sin(id * 0.7 + d)))
      }.toDF("vec_id", "embedding")
      emb
        .withColumn("p_bucket", Similarity.hyperplaneBucket(col("embedding"), hp))
        .repartition(4)
        .write
        .partitionBy("p_bucket")
        .mode("append")
        .parquet(src)
    }
    Files.writeString(new java.io.File(src, "_graft_planes").toPath, EmbLayout.Planes.toString)

    def partFiles(root: String): Map[String, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root))
        .filter(f => f.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath.stripPrefix(root))
        .view.mapValues(_.size).toMap
    }
    val before = partFiles(src)
    before.values.max should be >= 3 // genuinely fragmented

    EmbLayout.compact(spark, src, dst)

    val after = partFiles(dst)
    after.keySet shouldBe before.keySet
    after.values.foreach(_ shouldBe 1) // one file per bucket dir
    val a = EmbLayout.read(spark, src).selectExpr("vec_id", "p_bucket", "embedding")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = EmbLayout.read(spark, dst).selectExpr("vec_id", "p_bucket", "embedding")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    b shouldBe a
    // the plane-set marker survives, so probe geometry still resolves
    EmbLayout.markerPlanes(dst, spark.sessionState.newHadoopConf()) shouldBe Some(EmbLayout.Planes)
  }

  "EmbLayout.write" should "record the plane marker and serve probes with the layout's own geometry" in {
    import graft.sources.EmbLayout
    import spark.implicits._
    val path = Files.createTempDirectory("graft-emb-marker").toFile.getAbsolutePath
    val emb = (0 until 64).map { i =>
      (i.toLong, (0 until 8).map(d => math.cos(i * 1.3 + d)))
    }.toDF("vec_id", "embedding")
    EmbLayout.write(emb, path, planes = 5, dim = 8)
    EmbLayout.markerPlanes(path, spark.sessionState.newHadoopConf()) shouldBe Some(5)
  }

  "readCsv/readJson" should "load secondary formats" in {
    val dir = Files.createTempDirectory("graft-ing").toFile
    Files.writeString(new java.io.File(dir, "x.csv").toPath, "channel,t,v\na,1,2.5\nb,2,3.5\n")
    Files.writeString(new java.io.File(dir, "x.json").toPath, """{"channel":"a","t":1,"v":2.5}""" + "\n")
    BinarySegments.readCsv(spark, s"$dir/x.csv").count() shouldBe 2L
    BinarySegments.readJson(spark, s"$dir/x.json").select("channel", "t", "v").count() shouldBe 1L
  }

  "compact self-overwrite guards" should "refuse identical, nested and parent destinations" in {
    import graft.sources.{EmbLayout, TsLayout}
    val src = Files.createTempDirectory("graft-guard").toFile.getAbsolutePath
    // same path
    an[IllegalArgumentException] should be thrownBy TsLayout.compact(spark, src, src)
    an[IllegalArgumentException] should be thrownBy EmbLayout.compact(spark, src, src)
    // destination nested under the source
    an[IllegalArgumentException] should be thrownBy
      TsLayout.compact(spark, src, src + "/inner")
    // source nested under the destination: overwriting the parent
    // deletes the child layout being read — must refuse too
    an[IllegalArgumentException] should be thrownBy
      TsLayout.compact(spark, src + "/inner", src)
    an[IllegalArgumentException] should be thrownBy
      EmbLayout.compact(spark, src + "/inner", src)
    // trailing-slash alias of the same path must not slip through the
    // canonicalization
    an[IllegalArgumentException] should be thrownBy
      TsLayout.compact(spark, src, src + "/")
  }
}
