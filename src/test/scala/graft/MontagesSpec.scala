package graft

import graft.operators.{Montages, Timeseries}

class MontagesSpec extends SparkSpec {
  import spark.implicits._

  "MontageType tables" should "match the reference cardinalities and naming" in {
    // reference: server/Montage.scala:263-329
    Montages.BipolarAntPos.pairs should have size 18
    Montages.BipolarTransverse.pairs should have size 18
    Montages.ReferentialVsCz.pairs should have size 18
    Montages.ReferentialVsCz.pairs.map(_._2).toSet shouldBe Set("Cz")
    Montages.montageName("Fp1", "F7") shouldBe "Fp1<->F7"
    Montages.BipolarAntPos.names should contain("Fp1<->F7")
  }

  "montagePair" should "round-trip virtual channel names" in {
    Montages.montagePair("Fp1<->F7") shouldBe Right(("Fp1", Some("F7")))
    Montages.montagePair("Fp1") shouldBe Right(("Fp1", None))
    Montages.montagePair("a<->b<->c").isLeft shouldBe true
  }

  "validate" should "report exactly the missing channels" in {
    val have = Montages.ReferentialVsCz.distinctChannels - "Q1" - "Q2"
    Montages.validate(have, Montages.ReferentialVsCz) shouldBe Left(Set("Q1", "Q2"))
    Montages.validate(Montages.ReferentialVsCz.distinctChannels, Montages.ReferentialVsCz) shouldBe Right(())
    Montages.validate(Set.empty, Montages.NotMontaged) shouldBe Right(())
  }

  "virtualChannels" should "list montage channels with the overlapping time range" in {
    val catalog = Seq(
      ("Fp1", 0L, 100L),
      ("Cz", 50L, 150L),
      ("F3", 200L, 300L) // no overlap with Cz
    ).toDF("channel", "start", "end")
    val vc = Montages
      .virtualChannels(spark, catalog, Montages.Custom(Seq("Fp1" -> "Cz", "F3" -> "Cz")))
      .as[(String, Long, Long)]
      .collect()
      .toList
    vc shouldBe List(("Fp1<->Cz", 50L, 100L)) // F3<->Cz dropped: ranges disjoint
  }

  "virtualChannelCatalog" should "surface validation as a valid flag with rate and coverage" in {
    val catalog = Seq(
      ("Fp1", 0L, 100L, 11L),
      ("Cz", 50L, 150L, 21L),
      ("F3", 200L, 300L, 5L) // no overlap with Cz
    ).toDF("channel", "start", "end", "n_events")
    val vc = Montages
      .virtualChannelCatalog(
        spark,
        catalog,
        Montages.Custom(Seq("Fp1" -> "Cz", "F3" -> "Cz", "Fp1" -> "Nope"))
      )
      .orderBy("channel")
      .collect()
      .map(r => r.getAs[String]("channel") -> r)
      .toMap

    // disjoint spans: listed, invalid, metrics null
    vc("F3<->Cz").getAs[Boolean]("valid") shouldBe false
    vc("F3<->Cz").isNullAt(vc("F3<->Cz").fieldIndex("start")) shouldBe true
    // missing physical channel: listed, invalid
    vc("Fp1<->Nope").getAs[Boolean]("valid") shouldBe false
    // overlapping pair: window [50,100], 32 events, coverage 50/150
    val ok = vc("Fp1<->Cz")
    ok.getAs[Boolean]("valid") shouldBe true
    ok.getAs[Long]("start") shouldBe 50L
    ok.getAs[Long]("end") shouldBe 100L
    ok.getAs[Long]("n_events") shouldBe 32L
    ok.getAs[Double]("events_per_day") shouldBe (32.0 * 86400000000.0 / 50.0 +- 1e-6)
    ok.getAs[Double]("coverage") shouldBe (50.0 / 150.0 +- 1e-6)
  }

  "apply" should "produce one virtual stream per pair over synthetic EEG channels" in {
    val mt = Montages.Custom(Seq("Fp1" -> "Cz", "F3" -> "Cz"))
    val rows = for {
      ch <- Seq("Fp1", "F3", "Cz")
      t <- 0L until 10L
    } yield (ch, t, if (ch == "Cz") 1.0 else t.toDouble)
    val ts = rows.zipWithIndex
      .map { case ((c, t, v), i) => (c, t, v, 0L, i.toLong) }
      .toDF("channel", "t", "v", "user_id", "event_id")
    val out = Montages
      .apply(spark, ts, mt, bucketUs = 5L)
      .orderBy("channel", "bucket")
      .select("channel", "v")
      .as[(String, Double)]
      .collect()
      .toList
    // buckets [0,5) avg=2, [5,10) avg=7; Cz avg=1
    out shouldBe List(("F3<->Cz", 1.0), ("F3<->Cz", 6.0), ("Fp1<->Cz", 1.0), ("Fp1<->Cz", 6.0))
  }

  "namedMontageServe" should "dispatch per name and surface invalid/missing names as rows" in {
    // the buildMontage front door (reference server/Montage.scala:127-217):
    // names dispatch raw vs montaged; bad names become status rows, not errors
    val rows = for {
      ch <- Seq("Fp1", "Cz")
      t <- 0L until 10L
    } yield (ch, t, if (ch == "Cz") 1.0 else t.toDouble, 0L, t)
    val ts = rows.toDF("channel", "t", "v", "user_id", "event_id")
    val out = graft.operators.Timeseries
      .namedMontageServe(
        spark,
        ts,
        Seq("Fp1<->Cz", "Cz", "Fp1<->Nope", "x<->y<->z", "Ghost"),
        bucketUs = 5L
      )
      .collect()
      .map(r => r.getAs[String]("req_name") -> r)
      .toMap

    // valid montaged name: served, summarized over 2 buckets
    val m = out("Fp1<->Cz")
    m.getAs[String]("status") shouldBe "ok"
    m.getAs[String]("kind") shouldBe "montaged"
    m.getAs[Long]("n_buckets") shouldBe 2L
    // bucket avgs: Fp1 = 2, 7; Cz = 1 → diffs 1.0 + 6.0
    m.getAs[Double]("v_sum") shouldBe 7.0
    // bare name: raw serve of the physical channel
    val r = out("Cz")
    r.getAs[String]("status") shouldBe "ok"
    r.getAs[String]("kind") shouldBe "raw"
    r.getAs[Long]("n_buckets") shouldBe 2L
    r.getAs[Double]("v_sum") shouldBe 2.0
    // pair with an absent secondary: missing_channel row, NULL stats
    val miss = out("Fp1<->Nope")
    miss.getAs[String]("status") shouldBe "missing_channel"
    miss.getAs[String]("missing") shouldBe "Nope"
    miss.isNullAt(miss.fieldIndex("n_buckets")) shouldBe true
    // unparseable name (two separators): invalid_name row
    val bad = out("x<->y<->z")
    bad.getAs[String]("status") shouldBe "invalid_name"
    bad.isNullAt(bad.fieldIndex("kind")) shouldBe true
    // absent raw channel: missing_channel with the lead listed
    val g = out("Ghost")
    g.getAs[String]("status") shouldBe "missing_channel"
    g.getAs[String]("missing") shouldBe "Ghost"
  }

  // -------------------------------------------------------------------
  // The served validation-error contract, golden against the reference
  // (server/Error.scala:25-113, server/MontageValidationService.scala,
  // server/Montage.scala:35-76): exact names, reason strings, channel
  // lists, status codes, rendering and wire JSON.
  // -------------------------------------------------------------------

  "validateMontage" should "serve the reference's PackageCannotBeMontaged contract string-for-string" in {
    // a package missing Q1/Q2 cannot serve ReferentialVsCz
    val have = (Montages.ReferentialVsCz.distinctChannels -- Set("Q1", "Q2")).toList
    val err = Montages.validateMontage(have, Montages.ReferentialVsCz).swap.getOrElse(fail())
    err.name shouldBe "PackageCannotBeMontaged"
    // the reference interpolates mt.toJson — a JSON string WITH quotes
    err.reason shouldBe """This package is missing channels that are required for the "REFERENTIAL_VS_CZ" montage"""
    err.channelNames.toSet shouldBe Set("Q1", "Q2")
    err.statusCode shouldBe 400
    // reference TimeSeriesException.toString: s"$name: $reason: $channelNames"
    err.render shouldBe s"PackageCannotBeMontaged: ${err.reason}: ${err.channelNames}"
    // NotMontaged accepts any channel configuration (Montage.scala:43)
    Montages.validateMontage(Nil, Montages.NotMontaged) shouldBe Right(())
  }

  "validateAllMontages" should "check the union channel set and report against 'all montages'" in {
    // the MontageValidationService endpoint: a complete package passes
    Montages.validateAllMontages(Montages.allMontageChannelNames.toList) shouldBe Right(())
    // an empty package fails with the NotMontaged ("all montages") wording
    val err = Montages.validateAllMontages(List("Fp1")).swap.getOrElse(fail())
    err.reason shouldBe "This package is missing channels that are required for all montages"
    err.channelNames.toSet shouldBe (Montages.allMontageChannelNames - "Fp1")
  }

  "the error surface" should "quote every reference reason string exactly" in {
    val pmc = Montages.PackageMissingChannels(List("C3"), "N:package:abc")
    pmc.name shouldBe "PackageMissingChannels"
    pmc.reason shouldBe "Some of the requested channels do not exist in this package: N:package:abc"
    pmc.statusCode shouldBe 404

    Montages.RequestMissingChannels.reason shouldBe
      "The request did not have a 'channels' or a 'virtualChannels' key"
    Montages.RequestMissingChannels.statusCode shouldBe 400

    Montages.InvalidMontageName("a<->b<->c").reason shouldBe "Invalid montage name: a<->b<->c"

    val mis = Montages.MontageMisalignment("Fp1", "F7")
    mis.reason shouldBe
      "The lead channel did not correspond to the same file structure as the secondary channel"
    mis.channelNames shouldBe List("Fp1", "F7")
  }

  it should "emit the reference's TimeSeriesError wire JSON shape" in {
    val err = Montages.PackageCannotBeMontaged(List("Cz"), Montages.BipolarAntPos)
    err.json shouldBe
      """{"error":"PackageCannotBeMontaged","reason":"This package is missing channels that are required for the \"BIPOLAR_ANT_POS\" montage","channelNames":["Cz"]}"""
  }

  it should "escape control characters in interpolated input like spray-json" in {
    // packageId / montageName are user input: a control char must
    // yield VALID JSON (named escapes + \u00XX), matching the
    // reference's spray-json encoding discipline
    val err = Montages.InvalidMontageName("bad\nname\twith\u0001ctl")
    err.json should include("bad\\nname\\twith\\" + "u0001ctl")
    err.json should not include "\n"
    // sanity: the full line parses as JSON (spark's own parser)
    val parsed = spark.read.json(
      spark.createDataset(Seq(err.json))(org.apache.spark.sql.Encoders.STRING))
    parsed.select("reason").head.getString(0) should include("bad\nname")
  }

  "wireName" should "match the reference MontageTypeFormat encodings" in {
    Montages.wireName(Montages.NotMontaged) shouldBe "NOT_MONTAGED"
    Montages.wireName(Montages.BipolarAntPos) shouldBe "BIPOLAR_ANT_POS"
    Montages.wireName(Montages.BipolarTransverse) shouldBe "BIPOLAR_TRANSVERSE"
    Montages.wireName(Montages.ReferentialVsCz) shouldBe "REFERENTIAL_VS_CZ"
    Montages.wireName(Montages.Custom(Seq("a" -> "b"))) shouldBe "CUSTOM_MONTAGE"
  }
}
