package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit
import graft.domain.{DataGen, DomainConfig, GenSpec}

class PiiScrubSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("emails in the shopify feed are detected and redacted") {
    val payload = DataGen.shopifyPayload(spark, GenSpec(shopify = 100), DomainConfig())
    val stats = PiiScrub.stats(payload, "email")
    assert(stats.filter($"n_emails" =!= 1).count() == 0)

    val scrubbed = PiiScrub.scrubColumns(payload, Seq("email"))
    assert(scrubbed.filter($"email" =!= "[EMAIL]").count() == 0)
    assert(scrubbed.filter($"email".contains("@")).count() == 0)
  }

  test("urls, cards, phones redact with stable placeholders; clean text untouched") {
    val rows = Seq(
      "visit https://example.com/a?b=c now",
      "card 4242 4242 4242 4242 on file",
      "call +65 6123 4567 please",
      "reach me at a.b@x.io",
      "nothing sensitive here").toDF("text")
    val out = rows.select(PiiScrub.scrub($"text").as("t")).collect().map(_.getString(0))
    assert(out(0) == "visit [URL] now")
    assert(out(1) == "card [CARD] on file")
    assert(out(2) == "call [PHONE] please")
    assert(out(3) == "reach me at [EMAIL]")
    assert(out(4) == "nothing sensitive here")
  }

  test("contamination: flagged train docs genuinely share an 8-gram with eval") {
    val flagged = graft.queries.Dedup.contamination.run(spark, sfDir)
      .select($"train_doc").collect().map(_.getLong(0)).toSet
    if (flagged.nonEmpty) {
      val docs = graft.Tables.documents(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
      def grams(t: String) = t.split(" ").sliding(8).map(_.mkString(" ")).toSet
      val evalGrams = docs.values.filter(_._2 == "src0").flatMap(d => grams(d._1)).toSet
      flagged.foreach { d =>
        assert(docs(d)._2 != "src0")
        assert(grams(docs(d)._1).intersect(evalGrams).nonEmpty, s"doc $d flagged but no overlap")
      }
    }
  }
}
