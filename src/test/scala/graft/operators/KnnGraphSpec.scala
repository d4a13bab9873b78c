package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** Exactness gates for the e11 kNN graph (Lloyd-cell-blocked) and the
  * e12 graph-consuming diversity downsample, independent of the DuckDB
  * oracle: e11's neighborhoods must equal a brute-force in-cell top-3,
  * and e12's keep/drop roster must equal a driver-side connected-
  * components recompute over the thresholded graph.
  */
class KnnGraphSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val graph = graft.queries.Similarity.knnGraph.run(spark, sfDir)
    .select($"vec_id", $"rnk", $"neighbor_id", $"cosine")
    .as[(Long, Long, Long, Double)].collect()

  private lazy val cellOf: Map[Long, Int] =
    IvfIndex.indexQFor(spark, sfDir).assigned
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap

  private lazy val emb: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> v.toArray }.toMap

  test("e11 neighborhoods == brute-force top-3 within the vector's Lloyd cell") {
    val got = graph.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val expected = emb.keys.map { x =>
      val cands = emb.keys.filter(y => y != x && cellOf(y) == cellOf(x))
        .map(y => (y, cos(emb(x), emb(y)))).toSeq
        .sortBy { case (y, c) => (-c, y) }.take(3).map(_._1)
      x -> cands
    }.filter(_._2.nonEmpty).toMap
    assert(got.keySet == expected.keySet,
      s"roster diff: onlySpark=${got.keySet -- expected.keySet} " +
        s"onlyBrute=${expected.keySet -- got.keySet}")
    got.foreach { case (x, ns) => assert(ns == expected(x), s"vec $x: $ns vs ${expected(x)}") }
  }

  test("e11 pairs always share a cell and rnk is dense from 1") {
    graph.groupBy(_._1).foreach { case (x, rows) =>
      rows.foreach { case (_, _, n, _) => assert(cellOf(n) == cellOf(x)) }
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("e12 roster == driver connected-components over the >=0.40 graph") {
    val out = graft.queries.Similarity.graphDownsample.run(spark, sfDir)
      .select($"vec_id", $"cluster_id", $"is_kept")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == emb.size)
    out.foreach { case (v, c, k) => assert(k == (v == c)) }

    // brute-force closure: union-find over thresholded symmetric edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    graph.filter(_._4 >= 0.40).foreach { case (a, _, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = emb.keys.map(v => v -> find(v)).toMap
    out.foreach { case (v, c, _) =>
      assert(c == expected(v), s"vec $v cluster $c, brute ${expected(v)}")
    }
    val dropped = out.count(!_._3)
    assert(dropped > 0, "test corpus should contain semantic near-dup clusters")
  }
}
