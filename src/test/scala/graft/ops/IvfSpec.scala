package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF training is deterministic; cells partition the corpus") {
    val m1 = Ivf.train(embs, k = 16, iters = 3)
    val m2 = Ivf.train(embs, k = 16, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val assigned = Ivf.assign(embs, m1)
    assert(assigned.count() == embs.count())
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.length > 4, "corpus should spread over multiple cells")
  }

  test("IVF search recall vs brute force beats its scan fraction") {
    import spark.implicits._
    val m = Ivf.train(embs, k = 16, iters = 3)
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.topKByCosine(embs, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nprobe = 4
    val approx = Ivf.search(embs, queries, m, k = 10, nprobe = nprobe)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 = $mean%.3f at nprobe=$nprobe/16 cells")
    assert(mean >= 0.25, f"IVF recall too low: $mean%.3f")
  }

  test("recallAtK equals the hand-computed exact∩approx ratio per query") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 8)
    val got = Ann.recallAtK(embs, queries, k = 10, dim = 64)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val exact = Ann.topKByCosine(embs, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ann.lshTopK(embs, queries, 10, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = exact.toSeq.sortBy(_._1).map { case (q, truth) =>
      val h = approx.getOrElse(q, Set.empty).intersect(truth).size.toLong
      (q, truth.size.toLong, h, h.toDouble / truth.size)
    }
    assert(got == want)
    // uniform-random embeddings are LSH's worst case (no cluster
    // structure for the hyperplanes to exploit) — the harness exists
    // to MEASURE that honestly; only guard against a degenerate index
    // returning nothing at all
    assert(got.map(_._4).sum / got.size > 0.05, s"index returned ~nothing: $got")
  }

  test("IVF at recommendedK holds recall ≥ 0.9 at nprobe=k/4 on a 50k corpus") {
    // Evidence for the documented scaling rule (Ivf scaladoc: k ≈ √n,
    // nprobe 8-64): at the RECOMMENDED sizing the shape must deliver
    // real recall, not just beat its scan fraction. 50k vectors in 16d
    // from 100 seeded clusters (center + N(0, 0.05) noise — the
    // clustered geometry embeddings actually have; IVF on uniform
    // noise is meaningless by construction).
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(20260814)
    val centers = Array.fill(100)(Array.fill(dim)(rnd.nextGaussian()))
    val data = (0 until 50000).map { i =>
      val c = centers(i % 100)
      (i.toLong, c.toSeq.map(_ + rnd.nextGaussian() * 0.05))
    }
    val corpus = data.toDF("vec_id", "embedding")
      .repartition(8).persist()
    val n = corpus.count()
    val k = Ivf.recommendedK(n) // √50000 ≈ 224
    val nprobe = k / 4
    val m = Ivf.train(corpus, k = k, iters = 4)
    val queries = corpus.filter(col("vec_id") % 1000 === 0) // 50 spread queries
    val exact = Ann.topKByCosine(corpus, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ivf.search(corpus, queries, m, k = 10, nprobe = nprobe)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@10 = $mean%.3f at k=$k nprobe=$nprobe over $n vectors")
    corpus.unpersist(blocking = false)
    assert(mean >= 0.9, f"recall at the recommended sizing must hold: $mean%.3f")
  }

  test("embedding-cosine near-dup pairs find planted duplicates, skip the rest") {
    import spark.implicits._
    // plant near-dups: copy 5 vectors with tiny deterministic jitter
    val base = embs.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).as[(Long, Seq[Double])].collect()
    val planted = base.take(5).map { case (id, v) =>
      (id + 100000L, v.zipWithIndex.map { case (x, i) => x + 1e-4 * ((i % 3) - 1) })
    }
    val all = spark.createDataset((base ++ planted).toSeq)
      .toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDupPairs(all, threshold = 0.99, dim = 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (base(i)._1, base(i)._1 + 100000L)).toSet
    assert(pairs == expected, s"missing=${expected -- pairs} extra=${pairs -- expected}")
  }

  test("semantic decontamination flags embedding-close corpus rows, nothing else") {
    import spark.implicits._
    val base = embs.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).as[(Long, Seq[Double])].collect()
    // eval set: 3 originals. Corpus: everything else + 2 PLANTED
    // near-copies of eval vectors (cos≈1 → identical signatures in
    // every table → candidate generation cannot miss them).
    val evalSet = base.take(3)
    val planted = evalSet.take(2).map { case (id, v) =>
      (id + 500000L, v.map(_ * 1.0000001))
    }
    val corpus = base.drop(3) ++ planted
    val got = Dedup.semanticContaminatedIds(
        spark.createDataset(corpus.toSeq).toDF("vec_id", "embedding"),
        spark.createDataset(evalSet.toSeq).toDF("vec_id", "embedding"),
        threshold = 0.999, dim = 64)
      .as[Long].collect().toSet
    val plantedIds = planted.map(_._1).toSet
    assert(plantedIds.subsetOf(got),
      s"planted copies must flag: missing ${plantedIds -- got}")
    // at 0.999 nothing unplanted should be that close to an eval vector
    val brute = corpus.filter { case (_, v) =>
      evalSet.exists { case (_, e) =>
        val dot = v.zip(e).map { case (a, b) => a * b }.sum
        val cos = dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(e.map(x => x * x).sum))
        cos >= 0.999
      }
    }.map(_._1).toSet
    assert(got.subsetOf(brute), s"false positives: ${got -- brute}")
  }

  test("cosine near-dup recall at MODERATE similarity (multi-table tables)") {
    import spark.implicits._
    // plant 20 noisy copies at cos≈0.95 — the regime a single 8-bit
    // signature table catches only ~43% of (all-bits-equal requirement);
    // the 8-table config must find nearly all of them
    val rnd = new scala.util.Random(11)
    val base = embs.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).as[(Long, Seq[Double])].collect()
    val planted = base.take(20).map { case (id, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      // add gaussian noise at ~33% of the vector norm: cos ≈ 1/sqrt(1+0.33²) ≈ 0.95
      val noisy = v.map(x => x + rnd.nextGaussian() * 0.33 * norm / math.sqrt(v.length))
      (id + 100000L, noisy)
    }
    val all = spark.createDataset((base ++ planted).toSeq).toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDupPairs(all, threshold = 0.9, dim = 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // ground truth: which planted pairs actually cleared cos >= 0.9
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = base.take(20).zip(planted).collect {
      case ((id, v), (pid, pv)) if cos(v, pv) >= 0.9 => (id, pid)
    }.toSet
    assert(truth.size >= 10, s"planting failed: only ${truth.size} true pairs")
    val found = truth.intersect(pairs)
    info(s"moderate-similarity recall: ${found.size}/${truth.size}")
    assert(found.size.toDouble / truth.size >= 0.9,
      s"multi-table recall too low: ${found.size}/${truth.size}")
  }

  test("cosine near-dup: a planted mega-bucket is dropped bounded, small pairs survive") {
    import spark.implicits._
    // 600 IDENTICAL vectors — one hot cell per table, all over the
    // default 500 cap (the boilerplate-template scenario) — plus one
    // small planted pair in a different direction. The hot cell must
    // be DROPPED (its B² pair space never forms), the pair must
    // survive, and the observation must report the drop.
    val hot = (0L until 600L).map(i => (i, Seq.fill(64)(1.0)))
    val pairVec = (0 until 64).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val pair = Seq((9001L, pairVec), (9002L, pairVec))
    val all = spark.createDataset(hot ++ pair).toDF("vec_id", "embedding")
    val obs = new org.apache.spark.sql.Observation("cosine-cap")
    val got = Dedup.cosineNearDupPairs(all, threshold = 0.99, dim = 64,
        stats = Some(obs))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((9001L, 9002L)),
      s"hot cell must drop, planted pair must survive: $got")
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] >= 8L, // ≥ one per table
      s"dropped_buckets should count the hot cells: $m")
    // ≥ 600: the pair's signature may collide with the hot vector's in
    // some tables (making those cells 602) — the pair then survives via
    // its non-colliding tables, which the result assert above proves
    assert(m("max_bucket").asInstanceOf[Long] >= 600L, s"max_bucket: $m")
  }

  test("semanticContaminatedIds rejects an oversize eval set with the scale-path message") {
    val corpus = embs.limit(10)
    val ex = intercept[IllegalArgumentException] {
      Dedup.semanticContaminatedIds(corpus, embs, threshold = 0.999,
        dim = 64, maxBroadcastEval = 5L)
    }
    assert(ex.getMessage.contains("semanticContaminatedIds"), ex.getMessage)
    assert(ex.getMessage.contains("broadcast"), ex.getMessage)
    // and within the cap it proceeds (lazy frame constructs fine)
    Dedup.semanticContaminatedIds(embs.limit(10), embs.limit(3),
      threshold = 0.999, dim = 64, maxBroadcastEval = 5L)
  }
}
