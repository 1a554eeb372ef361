package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  "GraftExtensions" should "inject vec_dot and winnow into a session built with the extensions" in {
    // force the base session to exist first so we share its SparkContext.
    // spark.sql.extensions is a static conf read at SparkContext creation,
    // so inside an already-running JVM the equivalent builder hook is
    // withExtensions — production sessions set
    // spark.sql.extensions=graft.GraftExtensions instead.
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession
      .builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      ext.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0).getDouble(0) shouldBe 11.0
      val fps = ext.sql("SELECT winnow('abcdefghijklmnop', 4, 2) AS f").collect()(0).getSeq[Long](0)
      fps should not be empty
      fps.toSet shouldBe graft.functions.Winnow.fingerprints("abcdefghijklmnop", 4, 2).toSet
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
