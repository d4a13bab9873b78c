package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Dedup, Similarity, TextAnalysis}
import graft.operators.Multimodal

/** Semantic checks for the training-data operators (dedup, similarity,
  * text analysis, multimodal plumbing) beyond the DuckDB oracle parity
  * the driver checks.
  */
class LlmOpsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("exact dedup: groups partition the corpus, canonical is a member") {
    val docs = Tables.documents(spark, sfDir).count()
    val grouped = Dedup.exact.run(spark, sfDir)
    assert(grouped.agg(sum($"n_copies")).first.getLong(0) == docs)
    assert(grouped.filter($"n_copies" < 1).count() == 0)
  }

  test("jaccard pairs are symmetric-free, bounded, above threshold") {
    val pairs = Dedup.jaccard.run(spark, sfDir).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.35 && j <= 1.0)
    }
  }

  test("minhash estimate approximates true jaccard on LSH candidates") {
    val est = Dedup.minhashLsh.run(spark, sfDir)
      .select($"doc_a", $"doc_b", $"est_jaccard")
    val truth = Dedup.jaccard.run(spark, sfDir)
      .select($"doc_a", $"doc_b", $"jaccard")
    // every minhash-confirmed pair that the exact pass also scored should
    // agree within the 12-hash resolution (±2.5/12)
    val joined = est.join(truth, Seq("doc_a", "doc_b")).collect()
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("jaccard")) <= 2.5 / 12,
        s"pair ${r.getLong(0)}-${r.getLong(1)}")
    }
  }

  test("simhash near-dup pairs hamming ≤ 1 and fingerprints deterministic") {
    val p1 = Dedup.simhash.run(spark, sfDir)
    assert(p1.filter($"hamming" > 1).count() == 0)
    assert(p1.collect().toSet == Dedup.simhash.run(spark, sfDir).collect().toSet)
  }

  test("exact-substring dedup: removing d11's spans eliminates cross-doc duplicated spans") {
    // the ExactSubstr closure property: every cross-doc duplicated 8-gram
    // occurrence lies inside a removable span BY CONSTRUCTION, so pruning
    // the spans and re-measuring t19's duplicated fraction must land at
    // ~0 — the only possible residue is NEW 8-grams formed where a
    // removal joins previously-distant words (junction grams).
    val docs = Tables.documents(spark, sfDir)
    val spans = Dedup.removableSpans(spark, sfDir)

    // span sanity: 1-based, within doc bounds, disjoint after merge
    val lens = docs.select($"doc_id", size(split($"text", " ")).as("n_words"))
    assert(spans.join(lens, "doc_id")
      .filter($"span_start" < 1 || $"span_end" > $"n_words" ||
        $"span_start" > $"span_end").count() == 0, "span out of bounds")
    val overlaps = spans.alias("a").join(spans.alias("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.span_start" < $"b.span_start" &&
          $"b.span_start" <= $"a.span_end")
      .count()
    assert(overlaps == 0, s"merged spans must be disjoint, found $overlaps overlaps")

    // prune: drop every word position covered by a span, rebuild texts
    val words = docs
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", (col("pos") + 1).as("pos"), col("col").as("word"))
    val pruned = words.join(spans,
        words("doc_id") === spans("doc_id") &&
          $"pos" >= $"span_start" && $"pos" <= $"span_end", "left_anti")
      .groupBy($"doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"pos", $"word"))),
        x => x.getField("word")), " ").as("text"))

    def dupFraction(d: org.apache.spark.sql.DataFrame): Double = {
      val g = graft.queries.Ngrams.postings(d, n = 8, distinct = false, outCol = "g")
      val total = g.count()
      if (total == 0) 0.0
      else {
        val dup = g.groupBy($"g").agg(countDistinct($"doc_id").as("nd"))
          .filter($"nd" > 1).select($"g")
        g.join(dup, "g").count().toDouble / total
      }
    }
    val before = dupFraction(docs.select($"doc_id", $"text"))
    val after = dupFraction(pruned)
    assert(before >= 0.03, f"fixture too clean to exercise removal (before=$before%.4f)")
    assert(after <= 0.005,
      f"span removal left duplicated mass: before=$before%.4f after=$after%.4f")
  }

  test("cosine top-k: k per query, ranks contiguous, cosine within [-1,1]") {
    val topk = Similarity.cosineTopK.run(spark, sfDir).collect()
    val byQuery = topk.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      rs.foreach(r => assert(math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-12))
    }
  }

  test("sign-bucket ANN returns the exact best neighbor WITHIN the bucket") {
    // independent recomputation: brute-force all pairs driver-side, group
    // by sign bucket, argmax — must equal the distributed bucket-join plan
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def bucket(e: Array[Float]) =
      (0 until 4).map(i => (if (e(i) >= 0) 1 else 0) << i).sum
    def cosine(a: Array[Float], b: Array[Float]) = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.filter(_._1 < 32).flatMap { case (q, qe) =>
      val cands = vecs.filter(v => v._1 != q && bucket(v._2) == bucket(qe))
      if (cands.isEmpty) None
      else Some(q -> cands.map(v => (cosine(qe, v._2), -v._1))
        .max._2 * -1) // max cosine, tiebreak min neighbor_id
    }.toMap
    val ann = Similarity.annSignBucket.run(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(ann == expected)
  }

  test("token counts consistent with document length") {
    val bad = TextAnalysis.tokenCount.run(spark, sfDir)
      .filter($"ws_tokens" <= 0 || $"bpe_ish_tokens" < $"ws_tokens" - 1)
      .count()
    assert(bad == 0)
  }

  test("lang-id picks the max-scoring language deterministically") {
    val out = TextAnalysis.langId.run(spark, sfDir)
    assert(out.filter($"predicted_lang".isNull).count() == 0)
    assert(out.select("predicted_lang").distinct.count() >= 1)
  }

  test("sketch aggregates stay within their error bounds vs exact") {
    // the gated query emits the contract as booleans (the oracle pins
    // them TRUE); this re-checks them and the tighter 5% HLL bound on
    // the raw sketch values
    val rows = TextAnalysis.sketchStats.run(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_6pct"), s"HLL out of bound for ${r.getString(0)}")
      assert(r.getAs[Boolean]("p50_within_1pct_rank"))
      assert(r.getAs[Boolean]("p99_within_1pct_rank"))
      assert(r.getAs[Double]("p50_price") < r.getAs[Double]("p99_price"))
    }
    val raw = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .collect()
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL error ${math.abs(approx - exact) / exact} for ${r.getString(0)}")
    }
  }

  test("ngram stats: top bigrams ordered, doc_freq ≤ freq") {
    val rows = TextAnalysis.ngramStats.run(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("freq")).toSeq == rows.map(_.getAs[Long]("freq")).sortBy(-_).toSeq)
    rows.foreach(r => assert(r.getAs[Long]("doc_freq") <= r.getAs[Long]("freq")))
  }

  test("multimodal featurize: real header decode, batch plumbing, determinism") {
    val feats = Multimodal.featurize(spark, Multimodal.mediaTable(spark, sfDir))
    val rows = feats.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { f =>
      assert(f.feature.length == 8)
      assert(f.feature.forall(_ >= 0L))
      f.fmt match {
        case "bmp" =>
          // decoded dims come from the REAL BMP header, in the synth range
          assert(f.decoded_w >= 8 && f.decoded_w <= 32 && f.decoded_w % 8 == 0)
          assert(f.decoded_h >= 8 && f.decoded_h <= 24 && f.decoded_h % 8 == 0)
          // features are REAL pixel statistics: channel sums bounded by
          // 255·(pixel count), f6 = pixel count, min ≤ max
          val px = f.decoded_w.toLong * f.decoded_h
          assert(f.feature(6) == px)
          assert(Seq(0, 1, 2).forall(c => f.feature(c) <= 255L * px))
          assert(f.feature(4) <= f.feature(5))
        case "wav" =>
          assert(f.sample_rate == 16000)
          // 100..499 samples at 16kHz → 6..31 ms
          assert(f.duration_ms >= 6 && f.duration_ms <= 31)
          // f4 = sample count; crossings < n; max|s| ≤ 32768
          assert(f.feature(4) >= 100 && f.feature(4) < 500)
          assert(f.feature(1) < f.feature(4))
          assert(f.feature(3) <= 32768L)
        case "mp4" =>
          assert(f.frames_sampled == 16 || f.duration_ms / 33 < 16)
          assert(f.duration_ms > 0)
          // f4 = frame count; per-frame sums bounded by 32·255
          assert(f.feature(4) == f.duration_ms / 33)
          assert(f.feature(1) <= 32L * 255 && f.feature(2) <= f.feature(1))
      }
    }
    // deterministic across runs
    assert(rows.map(r => (r.media_id, r.feature.toSeq)).sortBy(_._1).toSeq ==
      Multimodal.featurize(spark, Multimodal.mediaTable(spark, sfDir))
        .collect().map(r => (r.media_id, r.feature.toSeq)).sortBy(_._1).toSeq)
  }

  test("BMP resize: header rewritten, pixels nearest-neighbor exact, padding correct") {
    val src = Multimodal.synthBmp(7L, 16, 24)
    val dst = Multimodal.resizeBmp(src, 8, 8)
    def le32(b: Array[Byte], o: Int) =
      java.nio.ByteBuffer.wrap(b, o, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(dst(0) == 'B' && dst(1) == 'M')
    assert(le32(dst, 18) == 8 && le32(dst, 22) == 8)
    assert(dst.length == 54 + 24 * 8) // 8px*3B = 24 per row, already 4-aligned
    // nearest-neighbor: dst pixel (x,y) == src pixel (x*16/8, y*24/8)
    val srcRow = (16 * 3 + 3) / 4 * 4
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
      val got = dst(54 + y * 24 + x * 3 + c)
      val want = src(54 + (y * 3) * srcRow + (x * 2) * 3 + c)
      assert(got == want, s"pixel ($x,$y) channel $c")
    }
  }

  test("WAV decimation: headers consistent, samples are every k-th of the source") {
    val src = Multimodal.synthWav(9L, 16000, 400)
    val dst = Multimodal.downsampleWav(src, 8000)
    def le32(b: Array[Byte], o: Int) =
      java.nio.ByteBuffer.wrap(b, o, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(le32(dst, 24) == 8000)      // sample rate
    assert(le32(dst, 28) == 16000)     // byte rate = rate * 2
    assert(le32(dst, 40) == 400)       // 200 samples * 2 bytes
    for (i <- 0 until 200; b <- 0 until 2)
      assert(dst(44 + i * 2 + b) == src(44 + (i * 2) * 2 + b), s"sample $i byte $b")
  }

  test("preprocess pipeline: every image lands at 8x8, every audio at 8 kHz") {
    val out = Multimodal.preprocessQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      r.getAs[String]("fmt") match {
        case "bmp" =>
          assert(r.getAs[Long]("decoded_w") == 8 && r.getAs[Long]("decoded_h") == 8)
        case "wav" =>
          assert(r.getAs[Long]("sample_rate") == 8000)
          // decimation halves the sample count at half the rate → duration preserved
          assert(r.getAs[Long]("duration_ms") >= 6 && r.getAs[Long]("duration_ms") <= 31)
        case "mp4" => assert(r.getAs[Long]("duration_ms") > 0) // pass-through
      }
    }
  }
}
