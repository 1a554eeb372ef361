package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at the
  * SPARK_GRAFT_SF_DIR scale factor.
  *
  * A full untimed warmup pass runs first at sf0.001 so the timed pass
  * measures steady-state execution (codegen compilation, parquet
  * reader + shuffle machinery initialization, and JIT otherwise land
  * on whichever query happens to run first and distort it by seconds).
  *
  * Noise defenses (a one-sample bench is not defensible evidence):
  *  - each query is timed SPARK_GRAFT_BENCH_REPS times (default 3) and
  *    reports the per-query MINIMUM — the run least polluted by page
  *    cache misses, GC pauses, or co-tenant load;
  *  - the cache is cleared and a GC is requested between reps, so the
  *    MEMORY_AND_DISK persists inside the dedup/embedding queries never
  *    accumulate across queries and every rep pays (or re-warms) the
  *    same cache state;
  *  - driver heap is pinned by build.sbt's javaOptions (-Xmx from
  *    SPARK_DRIVER_MEM, default 8g) rather than inherited ambience.
  *  - the JSON carries the box's BOOT ID plus TWO fixed calibration
  *    stamps: a single-thread splitmix loop (calib_sec — cross-boot
  *    speed) and the same loop run on all cpus threads at once
  *    (calib_par_sec — parallel throughput). Same-code totals have
  *    measured 15-25% swings across VM boots and ~2× inflation under
  *    co-tenant load that leaves calib_sec NORMAL (rounds 4 and 6);
  *    a record is trustworthy only when boot_id matches and
  *    calib_par_sec ≈ calib_sec (quiet box).
  */
object Bench {

  private def splitmixLoop(): Long = {
    var x = 0x9e3779b97f4a7c15L
    var acc = 0L
    var i = 0L
    while (i < 400000000L) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    acc
  }

  /** Fixed single-thread splitmix64 workload (~1 s): a pure-CPU yard
    * stick for cross-boot comparisons.
    */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    val acc = splitmixLoop()
    val sec = (System.nanoTime() - t0) / 1e9
    if (acc == 42L) Console.err.println("calibration sentinel") // defeat DCE
    sec
  }

  /** The SAME splitmix workload run simultaneously on `n` threads —
    * wall time until the slowest finishes. On a quiet box with ≥ n
    * free cores this ≈ calib_sec; co-tenant load steals parallel
    * throughput that a single-thread probe cannot see (rounds 4 and 6
    * both recorded ~2× query inflation at a NORMAL calib_sec), so
    * calib_par ≫ calib_sec flags a contended record.
    */
  private def calibratePar(n: Int): Double = {
    val accs = new java.util.concurrent.atomic.AtomicLong(0L)
    val threads = (0 until n).map { _ =>
      val th = new Thread(() => { accs.addAndGet(splitmixLoop()): Unit })
      th.setDaemon(true)
      th
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    if (accs.get() == 42L) Console.err.println("calibration sentinel") // defeat DCE
    sec
  }

  private def bootId(): String =
    try {
      val p = java.nio.file.Paths.get("/proc/sys/kernel/random/boot_id")
      new String(java.nio.file.Files.readAllBytes(p)).trim
    } catch { case _: Throwable => "unknown" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(math.min(Runtime.getRuntime.availableProcessors, 32))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Execute the ACTUAL physical plan: df.count() would wrap the plan
    // in a count aggregate, letting Catalyst eliminate the output sorts
    // and prune computed columns — measuring a cheaper plan than Verify
    // runs. toRdd materializes every row of the plan as-is.
    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit = {
      fn(spark, dir).queryExecution.toRdd.count(): Unit
    }

    // optional focus set for profiling single queries
    // (SPARK_GRAFT_BENCH_ONLY=dedup_clusters,dedup_minhash)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }

    val warmupDir = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try execute(fn, warmupDir)
      catch { case _: Throwable => () }
    }

    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3).max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { execute(fn, sfDir); true }
          catch { case _: Throwable => false }
        // failed queries report -1 instead of masquerading as fast runs
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val calib = calibrate()
    val calibPar = calibratePar(cpus)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""boot_id":"${bootId()}","calib_sec":$calib,"calib_par_sec":$calibPar,""" +
        s""""calib_par_threads":$cpus}"""
    println(line)
    // the driver's artifact truncates to the last 2000 chars of stdout,
    // which loses most of the per-query record — persist the COMPLETE
    // line to a file too so cross-round comparisons can diff every query
    try {
      // default under target/ so the artifact never lands in the repo
      // root where it could be committed by accident — per-round
      // records are deliberate bench_full_r{N}.json copies
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
      )
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent): Unit
      java.nio.file.Files.writeString(out, line + "\n"): Unit
    }
    catch { case e: Throwable => Console.err.println(s"[bench] file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
