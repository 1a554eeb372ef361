package graft

import graft.operators.{Dedup, Filtering, TextAnalysis, Timeseries}
import graft.functions.Butterworth
import org.apache.spark.sql.functions._

/** Robustness at the edges: id-less sources, empty inputs, null text. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyTs =
    Seq.empty[(String, Long, Double)].toDF("channel", "t", "v")

  "operators needing a tie-break" should "accept id-less (blob-style) ts data" in {
    val ts = (0L until 300L).map(i => ("c", i * 1000L, math.sin(i / 7.0))).toDF("channel", "t", "v")
    Timeseries.resampleChunks(ts, 100).count() shouldBe 3L
    Timeseries.spikes(ts, 0.9).count() should be > 0L
    Timeseries.spikeWaveforms(spark, ts, 100, 10).count() shouldBe 30L
    Filtering
      .applyCascade(spark, ts, Butterworth.lowPass(2, 250.0, 20.0), padLength = 20, gapUs = 10000L)
      .count() shouldBe 300L
  }

  "timeseries operators" should "return empty results (not fail) on empty input" in {
    Timeseries.downsample(emptyTs, 1000L).count() shouldBe 0L
    Timeseries.contiguousSpans(emptyTs, 10L).count() shouldBe 0L
    Timeseries.resampleChunks(emptyTs, 10).count() shouldBe 0L
    Timeseries.spikes(emptyTs, 1.0).count() shouldBe 0L
    Timeseries.channelStats(emptyTs).count() shouldBe 0L
    Filtering
      .applyCascade(spark, emptyTs, Butterworth.lowPass(2, 250.0, 20.0), 20, 1000L)
      .count() shouldBe 0L
  }

  "text and dedup operators" should "tolerate null and empty text" in {
    val docs = Seq(
      (1L, "normal document with words"),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text")

    // no exceptions; null/empty rows degrade gracefully
    TextAnalysis.tokenCounts(docs).count() shouldBe 3L
    TextAnalysis.langId(docs).count() shouldBe 3L
    TextAnalysis.fingerprints(docs, 8, 4).filter($"doc_id" === 1L).count() should be > 0L
    Dedup.exact(docs).count() shouldBe 3L // null and '' are distinct groups
    // null-text docs contribute NO shingles and drop out of the
    // near-dup pipeline entirely — the same semantics as the DuckDB
    // oracle (string_split(NULL) unnests to zero rows), so Spark and
    // oracle agree by construction on corpora containing NULLs.
    // Empty text still participates (its shingle set is {''}).
    Dedup.minhashSignatures(docs, 3).select($"doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L)
    Dedup.minhashNearDups(docs).count() shouldBe 0L
  }

  "curation operators" should "tolerate null and empty text" in {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "reach me at a@b.co"),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))

    // null text → null counts and null hash (regexp/md5 null-propagate
    // identically in DuckDB), never an exception or a phantom zero
    val pii = Curation.piiScan(docs).orderBy("doc_id").collect()
    pii(0).getAs[Long]("n_email") shouldBe 1L
    pii(1).isNullAt(pii(1).fieldIndex("n_pii")) shouldBe true
    pii(1).isNullAt(pii(1).fieldIndex("redacted_md5")) shouldBe true
    pii(2).getAs[Long]("n_pii") shouldBe 0L
    // stratified sampling keys on doc_id, so null text still samples
    Curation.sampleStratified(docs, k = 5).count() shouldBe 3L
    // the manifest drops null docs (null quality fails the filter, as
    // the oracle's NULL comparison does) and keeps real survivors
    val mix = Curation.trainMix(docs, minQuality = 0.0).collect()
    mix.map(_.getAs[Long]("n_docs")).sum should be <= 2L
  }

  "round-5 text operators" should "tolerate null and empty text" in {
    import graft.operators.{Curation, Search}
    val docs = Seq(
      (1L, "normal document with words and words"),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))

    // repetition: null AND empty docs drop (no words), matching the
    // oracle's WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
    TextAnalysis.repetitionSignals(docs).select($"doc_id").as[Long].collect().toSet shouldBe
      Set(1L)
    // decontamination: null-text docs contribute no shingles on either
    // side and never throw
    Curation.decontaminate(docs, docs.filter($"doc_id" === 2L), w = 8).count() shouldBe 0L
    // bm25 drops null-text docs from the corpus stats and tf stream
    Search.bm25TopK(spark, docs, Seq("q" -> Seq("words")), k = 5).count() shouldBe 1L
  }

  "butterworth kernels" should "handle degenerate block sizes" in {
    val c = Butterworth.lowPass(4, 250.0, 20.0)
    Butterworth.filterBlock(c, Array.empty[Double], 10) shouldBe empty
    Butterworth.filterBlock(c, Array(1.0), 10).length shouldBe 1
    graft.functions.Winnow.fingerprints("", 8, 4) shouldBe empty
    graft.functions.Winnow.fingerprints("ab", 8, 4).length shouldBe 1
  }

  "round-8 grid operators" should "return empty results (not fail) on empty input" in {
    val e = emptyTs.withColumn("user_id", lit(0L)).withColumn("event_id", lit(0L))
    Timeseries.ewmaBaseline(e).count() shouldBe 0L
    Timeseries.haarSpectrum(e).count() shouldBe 0L
    Timeseries.grangerScreen(e).count() shouldBe 0L
    Timeseries.psiScreen(e).count() shouldBe 0L
    Timeseries.extremesScreen(e).count() shouldBe 0L
    Timeseries.cadenceDrift(e).count() shouldBe 0L
    Timeseries.changepoints(e).count() shouldBe 0L
    Timeseries.seasonalAnomalies(e).count() shouldBe 0L
    Timeseries.transitionMatrix(e).count() shouldBe 0L
  }

  it should "degrade gracefully on single-sample channels" in {
    val one = Seq(("solo", 1000L, 5.0, 0L, 0L)).toDF("channel", "t", "v", "user_id", "event_id")
    Timeseries.ewmaBaseline(one).count() shouldBe 1L // its own kernel
    Timeseries.haarSpectrum(one).count() shouldBe 0L // no pair at any level
    Timeseries.grangerScreen(one).count() shouldBe 0L // no lagged rows
    Timeseries.cadenceDrift(one).count() shouldBe 0L // no intervals
    Timeseries.transitionMatrix(one).count() shouldBe 0L // no transition
    // a single sample puts mid = t0 and EVERY event in the first half;
    // the empty-half guard drops the channel rather than emitting the
    // 0/0 = NaN proportions (Spark nulls the NaN, DuckDB errors on it)
    Timeseries.psiScreen(one).count() shouldBe 0L
    noException should be thrownBy Timeseries.changepoints(one).collect()
  }

  "round-8 corpus operators" should "tolerate null and empty text" in {
    import graft.operators.{Curation, Packing, Search, TextAnalysis}
    val docs = Seq(
      (1L, "normal words here", "s"),
      (2L, null.asInstanceOf[String], "s"),
      (3L, "", "s")
    ).toDF("doc_id", "text", "source")
    noException should be thrownBy TextAnalysis.oovRates(docs).collect()
    Curation.trainSplit(docs).select(sum($"n_docs")).as[Long].head() shouldBe 3L
    Packing.trainShards(docs, 100L).select(sum($"n_docs")).as[Long].head() shouldBe 3L
    Search.booleanSearch(spark, docs, Seq(("q", Seq("words"), Seq.empty))).count() shouldBe 1L
    Search.proximitySnippets(docs, "normal", "here", 5).count() shouldBe 1L
  }
}
