package graft

import graft.ext.similarity.SqKNN
import org.apache.spark.sql.functions._

class SqKNNSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def params = SqKNN.trainedRange(emb, "embedding")

  test("trained range brackets every value and the step spans it in 255 levels") {
    val p = params
    assert(p.s > 0.0)
    val (lo, hi) = (p.mn, p.mn + SqKNN.levels * p.s)
    val bounds = emb.agg(
        min(array_min($"embedding")).cast("double"),
        max(array_max($"embedding")).cast("double"))
      .as[(Double, Double)].head()
    assert(bounds._1 >= lo && bounds._2 <= hi + 1e-9)
  }

  test("codes are in [0, 255] and match the per-element floor(t + 0.5) rule") {
    val p = params
    val rows = emb
      .select($"vec_id", $"embedding", SqKNN.sqCodes($"embedding", p).as("codes"))
      .as[(Long, Seq[Float], Seq[Int])].collect()
    assert(rows.length == emb.count())
    rows.foreach { case (id, v, cs) =>
      assert(cs.length == v.length, s"vec $id")
      v.zip(cs).foreach { case (x, c) =>
        assert(c >= 0 && c <= SqKNN.levels, s"vec $id code $c")
        val expect = {
          val t = math.floor((x.toDouble - p.mn) / p.s + 0.5).toInt
          math.max(0, math.min(SqKNN.levels, t))
        }
        assert(c == expect, s"vec $id value $x: code $c != $expect")
      }
    }
  }

  test("quantization error per dimension is at most half a step") {
    val p = params
    val rows = emb
      .select($"embedding", SqKNN.sqCodes($"embedding", p).as("codes"))
      .as[(Seq[Float], Seq[Int])].collect()
    rows.foreach { case (v, cs) =>
      v.zip(cs).foreach { case (x, c) =>
        val recon = p.mn + c * p.s
        assert(math.abs(x.toDouble - recon) <= p.s / 2 + 1e-12,
          s"value $x recon $recon step ${p.s}")
      }
    }
  }

  test("a constant corpus degenerates to s = 0 and all-zero codes") {
    val const = Seq((0L, Seq.fill(8)(3.25f)), (1L, Seq.fill(8)(3.25f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val p = SqKNN.trainedRange(const, "embedding")
    assert(p.s == 0.0)
    val codes = const.select(SqKNN.sqCodes($"embedding", p).as("codes"))
      .as[Seq[Int]].collect()
    codes.foreach(cs => assert(cs.forall(_ == 0)))
  }

  test("ADC distance equals the squared distance to the SQ reconstruction") {
    // the defining ADC identity: the score of (q, x) depends on x only
    // through its codes and equals ||q - recon(x)||^2 with
    // recon_d = mn + c_d * s — verified against a plain-Scala
    // recomputation through the SAME expansion the expression uses
    // (qq - 2(mn*qsum + s*<q,c>) + xhat2), round-9 at the end
    val p = params
    val vecs = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val codes = emb.filter($"vec_id" < 40)
      .select($"vec_id", SqKNN.sqCodes($"embedding", p).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val got = SqKNN.adcTopK(
        emb.filter($"vec_id" < 40), emb.filter($"vec_id" < 3),
        "vec_id", "embedding", p, dim = 64, k = 10)
      .select($"query_id", $"neighbor_id", $"adc2")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nb, adc2) =>
      val qv = vecs(q)
      val cs = codes(nb)
      var qq = 0.0; var qsum = 0.0; var qc = 0.0
      qv.indices.foreach { i =>
        val x = qv(i).toDouble
        qq += x * x; qsum += x; qc += x * cs(i).toFloat.toDouble
      }
      var csum = 0.0; var csq = 0.0
      cs.foreach { c => val cd = c.toFloat.toDouble; csum += cd; csq += cd * cd }
      val xhat2 = p.mn * p.mn * 64 + 2.0 * p.mn * p.s * csum + p.s * p.s * csq
      val expect = graft.functions.PqEncode.round9(
        qq - 2.0 * (p.mn * qsum + p.s * qc) + xhat2)
      assert(adc2 == expect, s"($q, $nb): $adc2 != $expect")
      // and the expansion IS the reconstruction distance (to fp noise)
      val direct = qv.indices.map { i =>
        val dd = qv(i).toDouble - (p.mn + cs(i) * p.s); dd * dd }.sum
      assert(math.abs(adc2 - direct) < 1e-6, s"($q, $nb): $adc2 vs $direct")
    }
  }

  test("SQ top-k ranks by reconstruction distance with id tie-break") {
    val p = params
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val codes = emb.select($"vec_id", SqKNN.sqCodes($"embedding", p).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val got = SqKNN.adcTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", p, dim = 64, k = 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (0L until 5L).foreach { q =>
      val qv = vecs(q)
      val expect = vecs.keys.filter(_ != q).toSeq.map { nb =>
        val cs = codes(nb)
        val d = qv.indices.map { i =>
          val dd = qv(i).toDouble - (p.mn + cs(i) * p.s); dd * dd }.sum
        (graft.functions.PqEncode.round9(d), nb)
      }.sorted.take(5).map(_._2)
      assert(got(q) == expect, s"query $q: ${got(q)} != $expect")
    }
  }

  test("IVF-SQ with a full probe equals the exhaustive SQ-ADC scan") {
    // nprobe = K: routing prunes nothing, so the composition must
    // reproduce the exhaustive ranking exactly (the PqKNNSpec law
    // for the PQ composition, applied to SQ)
    val p = params
    val cents = graft.ext.similarity.IvfKNN
      .sampledCentroids(emb, "vec_id", "embedding", 16)
    val full = SqKNN.ivfsqTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", cents, p, dim = 64, k = 5, nprobe = 16)
      .select($"query_id", $"rank", $"neighbor_id", $"adc2")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val exhaustive = SqKNN.adcTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", p, dim = 64, k = 5)
      .select($"query_id", $"rank", $"neighbor_id", $"adc2")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(full.toSeq == exhaustive.toSeq)
  }

  test("IVF-SQ with a partial probe returns k ranked rows per query") {
    val p = params
    val cents = graft.ext.similarity.IvfKNN
      .sampledCentroids(emb, "vec_id", "embedding", 16)
    val got = SqKNN.ivfsqTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", cents, p, dim = 64, k = 5, nprobe = 4)
      .groupBy($"query_id").count().as[(Long, Long)].collect()
    assert(got.length == 5 && got.forall(_._2 == 5))
  }

  test("SQ recall vs exact L2 KNN: high on clustered embeddings") {
    // On CLUSTERED corpora (where neighbor gaps exceed the <= s/2
    // per-dimension quantization noise) the compressed ranking agrees
    // with the uncompressed L2 ranking — the regime ADC is for. On
    // near-orthogonal random vectors all pairwise distances
    // concentrate and sub-step noise scrambles the (meaningless)
    // ranking — the documented LSH/ANN caveat, not a bug.
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      m <- 0 until 25
    } yield (ci.toLong * 100 + m,
      c.map(x => x + 0.1f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val p = SqKNN.trainedRange(corpus, "embedding")
    val vecs = rows.toMap
    val queryIds = rows.map(_._1).filter(_ % 100 == 0)
    val exact = queryIds.map { q =>
      val qv = vecs(q)
      q -> vecs.keys.filter(_ != q).toSeq.map { nb =>
        val nv = vecs(nb)
        (qv.indices.map { i =>
          val dd = qv(i).toDouble - nv(i).toDouble; dd * dd }.sum, nb)
      }.sorted.take(5).map(_._2).toSet
    }.toMap
    val sq = SqKNN.adcTopK(corpus, corpus.filter($"vec_id" % 100 === 0),
        "vec_id", "embedding", p, dim = 64, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // keysIterator, not keys.map: mapping over the key SET would
    // dedupe equal per-query recall values before the sum
    val recall = exact.keysIterator.map(q =>
      (exact(q) & sq.getOrElse(q, Set.empty)).size.toDouble / 5).sum / exact.size
    assert(recall >= 0.9, s"clustered recall@5 $recall")

    // random corpus: every query still returns k ranked rows
    val counts = SqKNN.adcTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", params, dim = 64, k = 5)
      .groupBy($"query_id").count().as[(Long, Long)].collect()
    assert(counts.length == 5 && counts.forall(_._2 == 5))
  }
}
