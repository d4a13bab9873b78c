package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** COVERAGE.md gate-map generator (r9 verdict #6): the query → file:line →
  * gate table is emitted FROM `SparkEntry.registry` instead of being
  * hand-maintained — at 244 queries and growing, hand-edited maps drift as
  * a matter of when, not if. `sbt coverageMap` regenerates the section
  * between the BEGIN/END markers in COVERAGE.md; RegistrySpec re-derives
  * the same text and fails the build when the committed file is stale.
  *
  * Attribution: the module list below mirrors SparkEntry's composition
  * (the inline tail is computed by difference, so a query added to
  * SparkEntry but not registered through a module still appears); a
  * loud require guards the mirror against drifting from the registry.
  * Definition sites come from scanning src/main for the name literal —
  * names are part of the driver contract, so every Q carries its name as
  * a string literal at its construction site.
  */
object CoverageMap {

  private val begin = "<!-- BEGIN GENERATED GATE MAP (sbt coverageMap; pinned by RegistrySpec) -->"
  private val end = "<!-- END GENERATED GATE MAP -->"

  /** Mirrors SparkEntry.registry's composition, labels included. */
  private def modules: Seq[(String, Seq[graft.queries.Q])] = Seq(
    "ScansProjections" -> graft.queries.ScansProjections.queries,
    "Joins" -> graft.queries.Joins.queries,
    "Aggregations" -> graft.queries.Aggregations.queries,
    "Windows" -> graft.queries.Windows.queries,
    "AdvancedOps" -> graft.queries.AdvancedOps.queries,
    "Funnels" -> graft.queries.Funnels.queries,
    "Subqueries" -> graft.queries.Subqueries.queries,
    "Scalars" -> graft.queries.Scalars.queries,
    "CommerceKpi" -> graft.queries.CommerceKpi.queries,
    "TextAnalysis" -> graft.queries.TextAnalysis.queries,
    "TrainingPrep" -> graft.queries.TrainingPrep.queries,
    "Bpe" -> graft.queries.Bpe.queries,
    "Dedup" -> graft.queries.Dedup.queries,
    "Similarity" -> graft.queries.Similarity.queries,
    "Warehouse" -> graft.queries.Warehouse.queries,
    "Warehouse2" -> graft.queries.Warehouse2.queries,
    "Manifest" -> graft.queries.Manifest.queries,
    "MaterializedViews" -> graft.queries.MaterializedViews.queries,
    "Ml" -> graft.queries.Ml.queries,
    "Cdc" -> graft.queries.Cdc.queries,
    "Basket" -> graft.queries.Basket.queries,
  )

  /** module label per query name; SparkEntry's inline tail by difference. */
  private def moduleOf: Map[String, String] = {
    val viaModules = modules.flatMap { case (label, qs) => qs.map(_.name -> label) }
    val inline = graft.SparkEntry.registry.map(_.name)
      .filterNot(viaModules.map(_._1).toSet)
      .map(_ -> "SparkEntry (inline)")
    (viaModules ++ inline).toMap
  }

  /** `path:line` of the first construction-site occurrence of the query
    * name literal under src/main (Q-call lines preferred over mentions).
    */
  private def definitionSites(names: Seq[String], repoRoot: Path,
      srcRoot: Path): Map[String, String] = {
    val files = Files.walk(srcRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)
    val lines: Seq[(String, Int, String)] = files.flatMap { f =>
      Files.readAllLines(f).asScala.zipWithIndex.map { case (l, i) =>
        (repoRoot.relativize(f).toString, i + 1, l)
      }
    }
    names.map { n =>
      val lit = "\"" + n + "\""
      val hits = lines.filter(_._3.contains(lit))
      val best = hits.find(h => h._3.contains("Q(" + lit) ||
        h._3.contains("noOracle(" + lit)).orElse(hits.headOption)
      n -> best.map(h => s"${h._1}:${h._2}").getOrElse("—")
    }.toMap
  }

  /** The generated markdown block (markers included). Deterministic:
    * registry order, repo-relative paths.
    */
  def generated(repoRoot: Path = Paths.get(".")): String = {
    val registry = graft.SparkEntry.registry
    require(registry.map(_.name).distinct.size == registry.size,
      "duplicate query names in SparkEntry.registry")
    val mods = moduleOf
    val missing = modules.flatMap(_._2.map(_.name)).filterNot(registry.map(_.name).toSet)
    require(missing.isEmpty,
      s"CoverageMap.modules lists queries absent from SparkEntry.registry: $missing — " +
        "the mirror drifted; update CoverageMap.modules")
    val sites = definitionSites(registry.map(_.name),
      repoRoot.toAbsolutePath.normalize,
      repoRoot.resolve("src/main/scala/graft").toAbsolutePath.normalize)
    val rows = registry.map { q =>
      val gate = if (q.oracle.isDefined) "hash-exact SQL oracle" else "rows-only (not SQL-expressible)"
      s"| `${q.name}` | $gate | ${mods(q.name)} | `${sites(q.name)}` |"
    }
    val oracleN = registry.count(_.oracle.isDefined)
    (Seq(begin,
      "",
      "## Generated gate map — every driver-gated query",
      "",
      s"${registry.size} queries (${oracleN} SQL-oracled, ${registry.size - oracleN} rows-only),",
      "in registration order. Regenerate with `sbt coverageMap` after any",
      "registry change; RegistrySpec fails the build when this section is stale.",
      "",
      "| Query | Driver gate | Registered via | Defined at |",
      "|---|---|---|---|") ++ rows ++ Seq("", end)).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse("."))
    val covPath = root.resolve("COVERAGE.md")
    val block = generated(root)
    val cur = new String(Files.readAllBytes(covPath), "UTF-8")
    val out =
      if (cur.contains(begin) && cur.contains(end)) {
        val pre = cur.substring(0, cur.indexOf(begin))
        val post = cur.substring(cur.indexOf(end) + end.length)
        pre + block + post
      } else cur.stripSuffix("\n") + "\n\n" + block + "\n"
    Files.write(covPath, out.getBytes("UTF-8"))
    println(s"[coverageMap] wrote ${covPath.toAbsolutePath.normalize} " +
      s"(${graft.SparkEntry.registry.size} queries)")
  }
}
