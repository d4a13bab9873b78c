package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Country / region assignment (SURVEY §2.7 F1-F4).
  *
  * Three pieces, all re-expressed from the reference's when-chains:
  *  - pattern rules: case-insensitive regex over the buyer name
  *    (`silver_to_gold.py:285-302`, joor only);
  *  - weighted residual: a cascade of independent draws, one per branch —
  *    deliberately preserving the reference's compounding semantics
  *    (branch i fires with pᵢ of the residual population, so the
  *    comment-documented "percentages" in the reference are nominal, not
  *    actual — `silver_to_gold.py:304-329`);
  *  - region rollup: per-channel isin buckets
  *    (`silver_to_gold.py:345-353,416-425,487-495` — the lists genuinely
  *    differ per channel; preserved verbatim).
  */
object Geography {

  /** Joor B2B buyer-name patterns → country (`silver_to_gold.py:285-302`). */
  val joorPatterns: Seq[(String, String)] = Seq(
    "(?i).*(UK|Britain|London|Manchester|Birmingham).*" -> "United Kingdom",
    "(?i).*(Canada|Toronto|Vancouver|Montreal).*" -> "Canada",
    "(?i).*(Germany|Berlin|Munich|Hamburg).*" -> "Germany",
    "(?i).*(France|Paris|Lyon|Marseille).*" -> "France",
    "(?i).*(Australia|Sydney|Melbourne|Brisbane).*" -> "Australia",
    "(?i).*(Japan|Tokyo|Osaka).*" -> "Japan",
    "(?i).*(Singapore|SG).*" -> "Singapore",
    "(?i).*(Italy|Milano|Rome).*" -> "Italy",
    "(?i).*(Spain|Madrid|Barcelona).*" -> "Spain",
    "(?i).*(Netherlands|Amsterdam).*" -> "Netherlands",
    "(?i).*(Brazil|Sao Paulo|Rio).*" -> "Brazil",
    "(?i).*(Mexico|Ciudad|Guadalajara).*" -> "Mexico",
    "(?i).*(South Africa|Cape Town|Johannesburg).*" -> "South Africa",
    "(?i).*(UAE|Dubai|Abu Dhabi).*" -> "United Arab Emirates",
    "(?i).*(Korea|Seoul).*" -> "South Korea",
    "(?i).*(China|Beijing|Shanghai).*" -> "China",
    "(?i).*(India|Mumbai|Delhi).*" -> "India",
    "(?i).*(Europe|EU).*" -> "Germany")

  /** Joor residual weights (`silver_to_gold.py:304-329`). */
  val joorResidual: Seq[(Double, String)] = Seq(
    0.35 -> "United States", 0.12 -> "United Kingdom", 0.08 -> "Germany",
    0.06 -> "Canada", 0.05 -> "France", 0.04 -> "Australia", 0.04 -> "Japan",
    0.03 -> "Italy", 0.03 -> "Netherlands", 0.03 -> "Spain",
    0.03 -> "South Korea", 0.02 -> "Brazil", 0.02 -> "Mexico",
    0.02 -> "Singapore", 0.02 -> "China", 0.02 -> "India",
    0.015 -> "South Africa", 0.015 -> "United Arab Emirates",
    0.01 -> "Sweden", 0.01 -> "Norway", 0.01 -> "Denmark",
    0.005 -> "Argentina", 0.005 -> "Chile", 0.005 -> "Egypt",
    0.005 -> "Nigeria")
  val joorResidualDefault = "United States"

  /** Shopify DTC residual weights (`silver_to_gold.py:373-399`). */
  val shopifyResidual: Seq[(Double, String)] = Seq(
    0.25 -> "United States", 0.15 -> "Singapore", 0.12 -> "United Kingdom",
    0.08 -> "Canada", 0.06 -> "Australia", 0.05 -> "Germany",
    0.04 -> "Malaysia", 0.04 -> "France", 0.03 -> "Japan",
    0.03 -> "Netherlands", 0.02 -> "Italy", 0.02 -> "Spain",
    0.02 -> "South Korea", 0.02 -> "Thailand", 0.015 -> "Brazil",
    0.015 -> "Mexico", 0.01 -> "Sweden", 0.01 -> "Norway",
    0.01 -> "Philippines", 0.01 -> "India", 0.005 -> "Indonesia",
    0.005 -> "Vietnam", 0.005 -> "United Arab Emirates",
    0.005 -> "South Africa", 0.005 -> "Argentina", 0.005 -> "Chile")
  val shopifyResidualDefault = "Other"

  /** TikTok livestream residual weights (`silver_to_gold.py:444-470`). */
  val tiktokResidual: Seq[(Double, String)] = Seq(
    0.20 -> "United States", 0.15 -> "Indonesia", 0.10 -> "Brazil",
    0.08 -> "Philippines", 0.07 -> "Vietnam", 0.06 -> "Thailand",
    0.05 -> "Malaysia", 0.05 -> "Singapore", 0.04 -> "India",
    0.03 -> "United Kingdom", 0.03 -> "Mexico", 0.02 -> "Germany",
    0.02 -> "Turkey", 0.02 -> "France", 0.02 -> "Egypt",
    0.015 -> "Canada", 0.015 -> "Australia", 0.01 -> "Nigeria",
    0.01 -> "South Korea", 0.01 -> "Japan", 0.005 -> "Argentina",
    0.005 -> "Colombia", 0.005 -> "South Africa", 0.005 -> "Bangladesh",
    0.005 -> "Pakistan", 0.005 -> "Morocco")
  val tiktokResidualDefault = "Other"

  /** Region buckets per channel (`silver_to_gold.py:345-353` joor,
    * `:416-425` shopify, `:487-495` tiktok).
    */
  val joorRegions: Seq[(Seq[String], String)] = Seq(
    Seq("United States", "Canada", "Mexico") -> "North America",
    Seq("Brazil", "Argentina", "Chile") -> "South America",
    Seq("United Kingdom", "Germany", "France", "Italy", "Spain",
      "Netherlands", "Sweden", "Norway", "Denmark") -> "Europe",
    Seq("China", "Japan", "South Korea", "Singapore", "India") -> "Asia",
    Seq("Australia") -> "Oceania",
    Seq("South Africa", "Egypt", "Nigeria") -> "Africa",
    Seq("United Arab Emirates") -> "Middle East")

  val shopifyRegions: Seq[(Seq[String], String)] = Seq(
    Seq("United States", "Canada", "Mexico") -> "North America",
    Seq("Brazil", "Argentina", "Chile") -> "South America",
    Seq("United Kingdom", "Germany", "France", "Italy", "Spain",
      "Netherlands", "Sweden", "Norway") -> "Europe",
    Seq("Singapore", "Malaysia", "Japan", "South Korea", "Thailand",
      "Philippines", "India", "Indonesia", "Vietnam") -> "Asia",
    Seq("Australia") -> "Oceania",
    Seq("South Africa") -> "Africa",
    Seq("United Arab Emirates") -> "Middle East")

  val tiktokRegions: Seq[(Seq[String], String)] = Seq(
    Seq("United States", "Canada", "Mexico") -> "North America",
    Seq("Brazil", "Argentina", "Colombia") -> "South America",
    Seq("United Kingdom", "Germany", "France", "Turkey") -> "Europe",
    Seq("Singapore", "Malaysia", "Indonesia", "Philippines", "Vietnam",
      "Thailand", "India", "South Korea", "Japan", "Bangladesh",
      "Pakistan") -> "Asia",
    Seq("Australia") -> "Oceania",
    Seq("South Africa", "Egypt", "Nigeria", "Morocco") -> "Africa")

  /** Build the country classifier: pattern rules first, then the weighted
    * residual cascade (one independent draw per branch — compounding like
    * the reference), then the default.
    */
  def country(
      buyer: Column,
      key: Column,
      cfg: DomainConfig,
      patterns: Seq[(String, String)],
      residual: Seq[(Double, String)],
      default: String): Column = {
    val withResidual = residual.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((p, c), i)) =>
        val cond = cfg.draw(key, s"country$i") < p
        Some(acc.fold(when(cond, c))(_.when(cond, c)))
    }
    val full = patterns.foldLeft(Option.empty[Column]) { case (acc, (re, c)) =>
      Some(acc.fold(when(buyer.rlike(re), c))(_.when(buyer.rlike(re), c)))
    } match {
      case Some(chain) =>
        residual.zipWithIndex.foldLeft(chain) { case (acc, ((p, c), i)) =>
          acc.when(cfg.draw(key, s"country$i") < p, c)
        }
      case None => withResidual.get
    }
    full.otherwise(default)
  }

  /** Region rollup over an assigned country column. */
  def region(country: Column, buckets: Seq[(Seq[String], String)]): Column =
    buckets.foldLeft(Option.empty[Column]) { case (acc, (cs, r)) =>
      val cond = country.isin(cs: _*)
      Some(acc.fold(when(cond, r))(_.when(cond, r)))
    }.get.otherwise("Other")
}
