package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ann.AnnForest
import graft.operators.{Dedup, KnnExact}

/** Property-based invariants (SURVEY §5.2) over ScalaCheck-generated
  * corpora. Generators are sampled with fixed seeds (no scalatest bridge
  * on the offline classpath), so failures are reproducible. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.choose(12, 60)
    dim <- Gen.choose(2, 8)
    rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f)))
  } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def samples(n: Int): Seq[List[(Long, List[Float])]] =
    (1 to n).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val asOfGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] = for {
    nl <- Gen.choose(5, 30)
    nr <- Gen.choose(0, 30)
    lrows <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    rrows <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
  } yield (
    lrows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    rrows.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t) })

  test("as-of: preserves left cardinality; matches are past-only, per-key, argmax (random data)") {
    import graft.operators.AsOfJoin
    (1 to 6).foreach { i =>
      val (l, r) = asOfGen(Gen.Parameters.default, Seed(i.toLong)).get
      val left = l.toDF("event_id", "k", "t")
      val right = r.toDF("ver", "rk", "rt")
      val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
        Seq("ver"), Seq("ver")).collect()
      assert(out.length === l.length, "as-of must emit exactly one row per left row")
      val rByVer = r.map { case (v, k, t) => v -> ((k, t)) }.toMap
      out.foreach { row =>
        val (eid, k, t) = (row.getAs[Long]("event_id"), row.getAs[Long]("k"), row.getAs[Long]("t"))
        val picked = Option(row.getAs[java.lang.Long]("ver")).map(_.toLong)
        // brute truth: latest rt <= t for the key, max ver on ties
        val elig = r.filter { case (_, rk, rt) => rk == k && rt <= t }
        val want = if (elig.isEmpty) None
          else Some(elig.maxBy { case (v, _, rt) => (rt, v) }._1)
        assert(picked === want, s"event $eid key $k t $t")
      }
    }
  }

  test("bucketed as-of ≡ plain as-of on random data, any bucket width") {
    import graft.operators.AsOfJoin
    (1 to 5).foreach { i =>
      val (l, r) = asOfGen(Gen.Parameters.default, Seed(100L + i)).get
      val left = l.toDF("event_id", "k", "t")
      val right = r.toDF("ver", "rk", "rt")
      val plain = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
          Seq("ver"), Seq("ver"))
        .collect().map(x => x.getAs[Long]("event_id") ->
          Option(x.getAs[java.lang.Long]("ver"))).toMap
      Seq(1L, 7L, 1000L).foreach { width =>
        val bucketed = AsOfJoin.asOfBucketed(left, right, "k", "rk", "t", "rt",
            Seq("ver"), Seq("ver"), bucketSeconds = width)
          .collect().map(x => x.getAs[Long]("event_id") ->
            Option(x.getAs[java.lang.Long]("ver"))).toMap
        assert(bucketed === plain, s"seed ${100 + i} width $width")
      }
    }
    // null keys group together in a window partition (asOf semantics) —
    // the bucketed boundary lookup must be null-SAFE to match
    val ln = Seq((1L, null.asInstanceOf[java.lang.Long], 100L))
      .toDF("event_id", "k", "t")
    val rn = Seq((7L, null.asInstanceOf[java.lang.Long], 5L))
      .toDF("ver", "rk", "rt")
    def pick(df: org.apache.spark.sql.DataFrame) =
      Option(df.collect().head.getAs[java.lang.Long]("ver"))
    assert(pick(AsOfJoin.asOf(ln, rn, "k", "rk", "t", "rt", Seq("ver"), Seq("ver")))
      === Some(7L))
    assert(pick(AsOfJoin.asOfBucketed(ln, rn, "k", "rk", "t", "rt",
      Seq("ver"), Seq("ver"), bucketSeconds = 10L)) === Some(7L))
  }

  test("maxsim: score bounded by |query bag|; self group attains the bound (random data)") {
    import graft.operators.MaxSim
    samples(4).foreach { rows =>
      val nonZero = rows.filter(_._2.exists(_ != 0f))
      val mv = nonZero.toDF("vec_id", "embedding")
        .select((col("vec_id") % 4).cast("long").as("gid"),
          col("vec_id").as("qt"), col("embedding").as("vec"))
      val corpus = mv.select(col("gid"), col("vec"))
      val queries = mv.filter(col("gid") === 0)
        .select(lit(0L).as("qid"), col("qt"), col("vec").as("qvec"))
      val nq = queries.count().toDouble
      if (nq > 0) {
        val sc = MaxSim.scores(corpus, queries).collect()
          .map(r => r.getAs[Long]("gid") -> r.getAs[Double]("maxsim")).toMap
        sc.values.foreach(v => assert(v <= nq + 1e-9))
        assert(math.abs(sc(0L) - nq) < 1e-9, "self group's every token matches itself")
      }
    }
  }

  test("exact kNN is invariant under input permutation") {
    samples(5).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val shuffled = new scala.util.Random(1).shuffle(rows).toDF("vec_id", "embedding")
      val a = KnnExact.searchById(df, 0L, 5).select("vec_id").as[Long].collect().toSeq
      val b = KnnExact.searchById(shuffled, 0L, 5).select("vec_id").as[Long].collect().toSeq
      assert(a === b)
    }
  }

  test("radius joins: subset-of-exact, monotone in the threshold, self always present") {
    samples(5).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val queries = df.limit(5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val model = AnnForest(numTrees = 10, maxLeafSize = 3, seed = 7L)
        .fit(df, "vec_id", "embedding")
      def pairsAt(r2: Double): (Set[(Long, Long)], Set[(Long, Long)]) = {
        val exact = KnnExact.radiusJoin(df, queries, r2)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val forest = model.radiusJoinBucketed(df, queries, r2)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        (exact, forest)
      }
      val (e1, f1) = pairsAt(4.0)
      val (e2, f2) = pairsAt(64.0)
      assert(f1.subsetOf(e1) && f2.subsetOf(e2)) // never invent a pair
      assert(e1.subsetOf(e2) && f1.subsetOf(f2)) // monotone in threshold
      // the self pair (dist 0) survives any threshold on both paths
      val qids = queries.select("query_id").as[Long].collect()
      qids.foreach { q => assert(e1.contains((q, q)) && f1.contains((q, q))) }
    }
  }

  test("ANN results: ids ⊆ corpus, |result| ≤ k, distances ascending") {
    samples(5).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val model = AnnForest(numTrees = 10, maxLeafSize = 3, seed = 7L)
        .fit(df, "vec_id", "embedding")
      val res = model.search(rows.head._2.toArray, 5)
      assert(res.length <= 5 && res.nonEmpty)
      assert(res.map(_._1).toSet.subsetOf(rows.map(_._1).toSet))
      assert(res.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("dedup is idempotent and keeps exactly the distinct vectors") {
    samples(5).foreach { rows =>
      val withDups = rows ++ rows.take(rows.size / 2)
      val df = withDups.zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val once = Dedup.exactVectors(df, "embedding", "vec_id")
      val twice = Dedup.exactVectors(once, "embedding", "vec_id")
      assert(once.count() === twice.count())
      assert(once.count() === rows.map(_._2).distinct.size)
    }
  }

  test("ANN recall >= 0.6 vs brute force on random corpora (forest defaults)") {
    samples(3).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val model = AnnForest(numTrees = 50, maxLeafSize = 5, seed = 11L)
        .fit(df, "vec_id", "embedding")
      val recalls = rows.take(10).map { case (qid, v) =>
        val truth = KnnExact.searchById(df, qid, 5).select("vec_id").as[Long].collect().toSet
        val got = model.search(v.toArray, 5).map(_._1).toSet
        got.intersect(truth).size.toDouble / truth.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.6, f"recall $mean%.2f")
    }
  }

  test("self-join ≡ two-sided bucketed join on random duplicate-heavy corpora") {
    samples(3).foreach { rows =>
      // duplicate ~half the vectors under fresh ids: oversized buckets +
      // zero-distance ties are exactly the regimes the pair-generation
      // and salt-block rewrites must not disturb
      val withDups = (rows ++ rows.take(rows.size / 2)).zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }
      val df = withDups.toDF("vec_id", "embedding")
      val model = AnnForest(numTrees = 8, maxLeafSize = 3, seed = 11L)
        .fit(df, "vec_id", "embedding")
      val qs = df.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val twoSided = model.knnJoinBucketed(df, qs, 4)
        .select("query_id", "neighbor_id", "dist", "rank")
      val self = model.knnSelfJoinBucketed(df, 4)
        .select("query_id", "neighbor_id", "dist", "rank")
      val blocked = model.knnSelfJoinBucketed(df, 4, saltBlocks = 2)
        .select("query_id", "neighbor_id", "dist", "rank")
      assert(twoSided.exceptAll(self).count() === 0)
      assert(self.exceptAll(twoSided).count() === 0)
      assert(blocked.exceptAll(self).count() === 0)
      assert(self.exceptAll(blocked).count() === 0)
    }
  }

  test("PQ refine with full-corpus shortlist ≡ exact brute force on random corpora") {
    // the exact re-rank is total when the shortlist is the whole corpus,
    // so the composition must equal brute force REGARDLESS of codebook
    // quality — the invariant that makes shortlist width a pure
    // recall/cost knob rather than a correctness parameter
    samples(4).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding").cache()
      val dim = rows.head._2.size
      val n = rows.size
      val pq = graft.ann.PqIndex(m = dim, seed = 7L).fit(df)
      val queries = df.filter($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val shortlist = pq.knnJoin(pq.encode(df).select("vec_id", "pq_code"), queries, n)
        .select("query_id", "neighbor_id")
      val refined = pq.refine(shortlist, df, queries, 5)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = KnnExact.knnBatch(df, queries, 5)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(refined === exact)
    }
  }

  test("PQ ADC results: ids ⊆ corpus, |result| ≤ k, dists ascending and ≥ 0") {
    samples(4).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val dim = rows.head._2.size
      val ids = rows.map(_._1).toSet
      val pq = graft.ann.PqIndex(m = dim, seed = 11L).fit(df)
      val queries = df.filter($"vec_id" < 2)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val res = pq.knnJoin(pq.encode(df).select("vec_id", "pq_code"), queries, 7)
        .collect()
      res.groupBy(_.getLong(0)).foreach { case (_, g) =>
        assert(g.length <= 7)
        val ds = g.sortBy(_.getInt(3)).map(_.getDouble(2))
        assert(ds.forall(_ >= 0.0))
        assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      }
      assert(res.map(_.getLong(1)).toSet.subsetOf(ids))
    }
  }

  test("salted join ≡ plain inner join on random data, any salt count") {
    samples(3).zip(Seq(1, 4, 16)).foreach { case (rows, salts) =>
      val large = rows.zipWithIndex
        .map { case ((id, _), i) => (id % 7, i.toLong) }.toDF("k", "payload")
      val small = (0L until 7L).map(k => (k, k * 10)).toDF("k", "v")
      val plain = large.join(small, "k")
        .select("k", "payload", "v").as[(Long, Long, Long)].collect().sorted.toSeq
      val salted = graft.operators.SkewJoin.saltedInnerJoin(large, small, "k", salts)
        .select("k", "payload", "v").as[(Long, Long, Long)].collect().sorted.toSeq
      assert(salted === plain)
    }
  }

  test("compactBuckets invariants on random corpora and thresholds") {
    import graft.ann.DistributedAnnForest
    samples(2).zip(Seq(4, 12)).foreach { case (rows, minRows) =>
      val df = rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
      val m = DistributedAnnForest(numTrees = 3, maxLeafSize = 2,
        maxDepth = 8, seed = 11L).fit(df)
      val c = m.compactBuckets(minBucketRows = minRows)
      val sizesOf = (mm: graft.ann.DistributedAnnModel) => mm.corpusBuckets
        .groupBy($"tree_id", $"leaf_id").count().collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val before = sizesOf(m); val after = sizesOf(c)
      // no row lost or duplicated; bucket count never grows
      assert(after.values.sum === before.values.sum)
      assert(after.size <= before.size)
      // routing ≡ storage: re-routing the corpus through the compacted
      // plane map reproduces the bucket table exactly
      val rerouted = c.assignLeaves(df, "vec_id", "embedding")
        .groupBy($"tree_id", $"leaf_id").count().collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(rerouted === after, s"minRows=$minRows")
      // no mergeable sibling pair survives: any remaining split node
      // with two LEAF children holds >= minRows rows beneath it
      c.planes.keys.foreach { case (t, p) =>
        val l = (t, 2 * p); val r = (t, 2 * p + 1)
        if (!c.planes.contains(l) && !c.planes.contains(r)) {
          val n = after.getOrElse(l, 0L) + after.getOrElse(r, 0L)
          assert(n >= minRows, s"node ($t,$p) should have merged ($n < $minRows)")
        }
      }
    }
  }

  test("funnel stage counts are monotonically non-increasing on random event logs") {
    import graft.operators.Funnel
    val gen = for {
      n <- Gen.choose(20, 120)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0L, 9L), Gen.choose(0, 1000), Gen.oneOf("a", "b", "c", "d")))
    } yield rows
    (1 to 3).flatMap(i => gen.apply(Gen.Parameters.default, Seed(100L + i))).foreach { rows =>
      val e = rows.toDF("user_id", "__s", "event_type")
        .select($"user_id",
          to_timestamp(lit("2026-01-01 00:00:00"))
            .plus(expr("make_interval(0,0,0,0,0,0,__s)")).as("ts"),
          $"event_type")
      val counts = Funnel.funnel(e, Seq("a", "b", "c", "d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val seq = Seq("a", "b", "c", "d").map(counts)
      assert(seq.sliding(2).forall(p => p(0) >= p(1)),
        s"funnel must shrink monotonically: $seq")
      // windowed funnel is a further restriction of the open one
      val win = Funnel.funnel(e, Seq("a", "b", "c", "d"),
          within = Some("INTERVAL 100 SECONDS"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Seq("a", "b", "c", "d").foreach(st =>
        assert(win(st) <= counts(st), s"windowed($st) must not exceed open"))
    }
  }

  test("TopKPerKey ≡ window top-k on random keys and k") {
    samples(3).zip(Seq(1, 3, 8)).foreach { case (rows, k) =>
      val df = rows.map { case (id, v) => (id % 5, v.head.toDouble, id) }
        .toDF("key", "score", "id")
      val viaHeap = graft.plans.TopKPerKey
        .perKey(df, Seq("key"), Seq("score", "id"), k)
        .as[(Long, Double, Long)].collect().sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("score"), col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .as[(Long, Double, Long)].collect().sorted.toSeq
      assert(viaHeap === viaWindow)
    }
  }

  test("rrfTopK ≡ corpus-wide-window RRF on random tie-heavy score tables") {
    import graft.operators.RankFusion
    import org.apache.spark.sql.expressions.Window
    val gen: Gen[(List[(Long, Double)], List[(Long, Double)])] = for {
      na <- Gen.choose(25, 120)
      nb <- Gen.choose(25, 120)
      // small integer score space -> heavy ties exercise the count-ahead
      // tiebreak exactly where the window's row_number is order-sensitive
      as <- Gen.listOfN(na, Gen.choose(0, 7))
      bs <- Gen.listOfN(nb, Gen.choose(0, 7))
    } yield (
      as.zipWithIndex.map { case (s, i) => (i.toLong, s.toDouble) },
      bs.zipWithIndex.map { case (s, i) => (i.toLong, s.toDouble) })
    (1 to 6).foreach { i =>
      val (al, bl) = gen(Gen.Parameters.default, Seed(300L + i)).get
      val a = al.toDF("doc_id", "s")
      val b = bl.toDF("doc_id", "cos")
      val k = 1 + i % 5
      val kRrf = 10
      val cand = kRrf + 2 * k + i  // tightest legal width (+jitter)
      val viaWindow = a
        .withColumn("ra", row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
        .join(b.withColumn("rb",
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))), "doc_id")
        .withColumn("rrf", round(
          lit(1.0) / (lit(kRrf) + col("ra")) + lit(1.0) / (lit(kRrf) + col("rb")), 6))
        .select(col("doc_id"), col("ra"), col("rb"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(k)
        .collect().toSeq
      val viaFusion = RankFusion.rrfTopK(a, "s", "ra", b, "cos", "rb",
        idCol = "doc_id", k = k, kRrf = kRrf, cand = cand)
        .collect().toSeq
      assert(viaFusion === viaWindow, s"seed ${300 + i} k=$k cand=$cand")
    }
  }

  test("dup-span removal: conservation, determinism, and single-copy survival (random corpora)") {
    import graft.operators.TextDedup
    // small vocabulary + short docs -> dense cross-doc segment repeats
    val docGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(4, 12)
      texts <- Gen.listOfN(n,
        Gen.choose(2, 10).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 5).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(500L + i)).get.toDF("doc_id", "text")
      val w = 1 + i % 3
      val out = TextDedup.removeDupSpans(docs, "doc_id", "text", window = w)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // conservation: kept <= total segments per doc; global kept-segment
      // count == number of DISTINCT segments in the corpus (exactly one
      // copy of every segment survives somewhere)
      out.values.foreach { case (nSeg, nKept, _) => assert(nKept <= nSeg && nKept >= 0) }
      val segs = docs.select(
          explode(org.apache.spark.sql.functions.transform(
            sequence(lit(0),
              greatest(ceil(size(split(lower(trim(col("text"))), "\\s+")) / lit(w.toDouble))
                .cast("int"), lit(1)) - 1),
            j => concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
              j * w + 1, lit(w))))).as("seg"))
      val distinctSegs = segs.distinct().count()
      assert(out.values.map(_._2).sum === distinctSegs,
        s"seed ${500 + i} w=$w: exactly one copy of each segment must survive")
      // determinism: a re-run picks the identical survivors (the
      // argmin is total-ordered, no tie nondeterminism to leak)
      val second = TextDedup.removeDupSpans(docs, "doc_id", "text", window = w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      out.foreach { case (id, (_, nKept, _)) =>
        assert(second(id) === nKept, s"seed ${500 + i} w=$w doc $id: determinism")
      }
    }
  }

  test("DSIR weights: permutation-invariant, target-doc-in-raw maximal on its own vocab (random data)") {
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docGen = for {
      n <- Gen.choose(6, 14)
      texts <- Gen.listOfN(n,
        Gen.listOfN(8, wordGen).map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 3).foreach { i =>
      val rows = docGen(Gen.Parameters.default, Seed(900L + i)).get
      val raw = rows.toDF("doc_id", "text")
      val target = rows.filter(_._1 % 3 == 0).toDF("doc_id", "text")
      val w1 = graft.operators.Dsir.importanceWeights(raw, target)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // permutation invariance: shuffled input, same weights
      val w2 = graft.operators.Dsir.importanceWeights(
          scala.util.Random.shuffle(rows).toDF("doc_id", "text"), target)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(w1 === w2, s"seed ${900 + i}: weights must not depend on row order")
      assert(w1.values.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("linearTopK: fused always in [0,1] for convex weights; top-1 at extremes is the leg argmax") {
    val rowGen = for {
      n <- Gen.choose(5, 25)
      a <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
      b <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield (a.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      b.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    (1 to 5).foreach { i =>
      val (ra, rb) = rowGen(Gen.Parameters.default, Seed(950L + i)).get
      val a = ra.toDF("id", "sa")
      val b = rb.toDF("id", "sb")
      val fused = graft.operators.RankFusion
        .linearTopK(a, "sa", b, "sb", "id", k = ra.size, weightA = 0.37)
        .collect().map(r => (r.getLong(0), r.getDouble(3)))
      assert(fused.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
        s"seed ${950 + i}: convex combination left [0,1]")
      // weightA = 1: the winner is leg a's argmax (smallest id on ties)
      val top = graft.operators.RankFusion
        .linearTopK(a, "sa", b, "sb", "id", k = 1, weightA = 1.0)
        .head().getLong(0)
      val best = ra.map(_._2).max
      assert(ra.filter(_._2 == best).map(_._1).min === top, s"seed ${950 + i}")
    }
  }

  test("phrase tf ≡ naive sliding-window count on random low-alphabet corpora") {
    // a 3-letter alphabet makes overlapping and repeated-term matches
    // common — exactly the cases the (doc, start) offset-witness trick
    // must get right; the brute truth is a driver-side window scan
    val gen = for {
      nDocs <- Gen.choose(4, 12)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(1, 14).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c"))))
      plen <- Gen.choose(1, 3)
      phrase <- Gen.listOfN(plen, Gen.oneOf("a", "b", "c"))
    } yield (docs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" ")) }, phrase)
    (1 to 8).foreach { i =>
      val (rows, phrase) = gen(Gen.Parameters.default, Seed(7000L + i)).get
      val docs = rows.toDF("doc_id", "text")
      val got = graft.operators.Bm25.phraseScore(docs, phrase)
        .select($"doc_id", $"phrase_tf").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = rows.map { case (id, text) =>
        val toks = text.split("\\s+").toSeq
        id -> toks.indices.count(s =>
          s + phrase.length <= toks.length &&
            toks.slice(s, s + phrase.length) == phrase)
      }.filter(_._2 > 0).toMap
      assert(got === want.map { case (k, v) => (k, v.toLong) },
        s"seed ${7000 + i} phrase ${phrase.mkString(" ")}")
    }
  }

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(3, 15)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 40)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("chunking: lossless coverage — stride prefixes + last chunk rebuild every doc (random)") {
    import graft.operators.Chunking
    (1 to 8).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(8000L + i)).get
      val w = 3 + i % 6
      val s = 1 + (i * 3) % w
      val chunks = Chunking.chunk(docs.toDF("doc_id", "text"),
          window = w, stride = s)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
        .groupBy(_._1).map { case (id, cs) => id ->
          cs.sortBy(_._2).map(_._3).toList }
      docs.foreach { case (id, text) =>
        val ch = chunks(id)
        val rebuilt = (ch.init.map(_.split(" ").take(s).toSeq) :+
          ch.last.split(" ").toSeq).flatten.mkString(" ")
        assert(rebuilt === text, s"seed ${8000 + i} doc $id w=$w s=$s")
        // no chunk exceeds the window; only the last may be short
        val sizes = ch.map(_.split(" ").length)
        assert(sizes.forall(_ <= w) && sizes.init.forall(_ == w),
          s"seed ${8000 + i} doc $id sizes $sizes")
      }
    }
  }

  test("count store: random add/remove interleavings equal the fresh fit (random)") {
    import graft.operators.{NbClassifier, NbStore}
    (1 to 4).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(9000L + i)).get
        .map { case (id, t) => (id, t, s"c${id % 3}") }
      val (a, b) = docs.splitAt(docs.length / 2)
      val gone = docs.filter(_._1 % 3 == 1)
      val live = docs.filterNot(_._1 % 3 == 1)
      val name = s"prop_nb_$i"
      NbStore.initStore(a.toDF("doc_id", "text", "label"), name, buckets = 2)
      NbStore.appendDocs(b.toDF("doc_id", "text", "label"), name, buckets = 2)
      NbStore.removeDocs(gone.toDF("doc_id", "text", "label"), name, buckets = 2)
      NbStore.initStore(live.toDF("doc_id", "text", "label"),
        s"${name}_f", buckets = 2)
      for (t <- Seq("_counts", "_class")) {
        val m = spark.table(name + t); val f = spark.table(s"${name}_f" + t)
        assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
          s"seed ${9000 + i} table $t")
      }
    }
  }

  test("LM store: random add/remove interleavings equal the fresh count (random)") {
    import graft.operators.LmStore
    (1 to 3).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(9400L + i)).get
      val (a, b) = docs.splitAt(docs.length / 2)
      val gone = docs.filter(_._1 % 3 == 2)
      val live = docs.filterNot(_._1 % 3 == 2)
      val name = s"prop_lm_$i"
      LmStore.initStore(a.toDF("doc_id", "text"), name, buckets = 2)
      LmStore.appendDocs(b.toDF("doc_id", "text"), name, buckets = 2)
      LmStore.removeDocs(gone.toDF("doc_id", "text"), name, buckets = 2)
      LmStore.initStore(live.toDF("doc_id", "text"), s"${name}_f", buckets = 2)
      for (t <- Seq("_tri", "_bi", "_uni")) {
        val m = spark.table(name + t); val f = spark.table(s"${name}_f" + t)
        assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
          s"seed ${9400 + i} table $t")
      }
    }
  }

  test("stupid backoff: self-training never backs off — tri_frac is 1.0 on random corpora") {
    import graft.operators.UnigramLm
    (1 to 5).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(9200L + i)).get
        .filter(_._2.split(" ").length >= 3)
      if (docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val fr = UnigramLm.trigramStupidBackoff(df, df).collect()
        assert(fr.nonEmpty && fr.forall(_.getDouble(2) === 1.0),
          s"seed ${9200 + i}: a self-trained model backed off")
      }
    }
  }

  test("collocations: margins sum to T and every PMI recomputes from raw counts (random)") {
    import graft.operators.TextAnalysis
    (1 to 5).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(9300L + i)).get
      val df = docs.toDF("doc_id", "text")
      val got = TextAnalysis.collocations(df, "text", minCount = 1L, topK = 1000)
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      // raw truth recomputed in Scala
      val bigrams = docs.flatMap { case (_, t) =>
        val ws = t.split(" ").toSeq; ws.zip(ws.drop(1)) }
      val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tTot = bigrams.size.toLong
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(bc.values.sum === tTot)
      got.foreach { case (pair, (cb, pmi)) =>
        assert(cb === bc(pair), s"seed ${9300 + i} count $pair")
        val want = BigDecimal(math.log(
          cb.toDouble * tTot / (c1(pair._1).toDouble * c2(pair._2))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(pmi === want, s"seed ${9300 + i} pmi $pair")
      }
    }
  }

  test("range join: binned equals naive on random instances incl. empty and touching intervals") {
    import graft.operators.RangeJoin
    val rjGen = for {
      np <- Gen.choose(5, 60)
      ni <- Gen.choose(1, 30)
      ps <- Gen.listOfN(np, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 120L)))
      is <- Gen.listOfN(ni, for {
        k <- Gen.choose(0L, 2L)
        st <- Gen.choose(0L, 120L)
        len <- Gen.choose(0L, 40L) // 0 ⇒ empty interval
      } yield (k, st, st + len))
    } yield (ps, is)
    (1 to 8).foreach { i =>
      val (ps, is) = rjGen(Gen.Parameters.default, Seed(9100L + i)).get
      val pts = ps.zipWithIndex.map { case ((k, p), j) => (k, j.toLong, p) }
        .toDF("k", "pid", "p")
      val iv = is.zipWithIndex.map { case ((k, s, e), j) => (k, j.toLong, s, e) }
        .toDF("k", "ivid", "s", "e")
      val w = 1L + i * 7 % 30
      val binned = RangeJoin.pointInInterval(pts, iv, "p", "s", "e", w, Seq("k"))
        .select($"pid", $"ivid").as[(Long, Long)].collect().toSet
      val naive = pts.join(iv, "k").filter($"p" >= $"s" && $"p" < $"e")
        .select($"pid", $"ivid").as[(Long, Long)].collect().toSet
      assert(binned === naive, s"seed ${9100 + i} w=$w")
    }
  }

  test("range rewrite RULE: armed SQL equals dormant SQL on random instances and shapes") {
    import graft.plans.RangeJoinRewrite
    val shapes = Seq("p >= s AND p < e", "p > s AND p <= e",
      "s <= p AND e > p", "p >= s AND p <= e")
    val gen = for {
      np <- Gen.choose(5, 50)
      ni <- Gen.choose(1, 25)
      ps <- Gen.listOfN(np, Gen.choose(-60L, 120L))
      is <- Gen.listOfN(ni, for {
        st <- Gen.choose(-60L, 120L)
        len <- Gen.choose(-10L, 40L) // negatives ⇒ reversed bounds
      } yield (st, st + len))
    } yield (ps, is)
    RangeJoinRewrite.install(spark)
    (1 to 8).foreach { i =>
      val (ps, is) = gen(Gen.Parameters.default, Seed(9200L + i)).get
      ps.zipWithIndex.map { case (p, j) => (j.toLong, p) }
        .toDF("pid", "p").createOrReplaceTempView("prop_rr_pts")
      is.zipWithIndex.map { case ((s, e), j) => (j.toLong, s, e) }
        .toDF("ivid", "s", "e").createOrReplaceTempView("prop_rr_ivs")
      val sql = s"SELECT pid, ivid FROM prop_rr_pts JOIN prop_rr_ivs ON ${shapes(i % 4)}"
      val dormant = spark.sql(sql).as[(Long, Long)].collect().toSet
      spark.conf.set(RangeJoinRewrite.BIN_CONF, (1L + i * 5 % 23).toString)
      try {
        val df = spark.sql(sql)
        assert(df.queryExecution.sparkPlan.toString.contains("__graft_bin"),
          s"seed ${9200 + i}: rule did not fire")
        assert(df.as[(Long, Long)].collect().toSet === dormant,
          s"seed ${9200 + i} shape ${shapes(i % 4)}")
      } finally spark.conf.unset(RangeJoinRewrite.BIN_CONF)
    }
  }

  test("z-curve: dominance monotone — x1<=x2 and y1<=y2 implies z1<=z2 (random)") {
    import graft.operators.ZOrder
    val pairGen = Gen.listOfN(400,
      Gen.zip(Gen.choose(0L, 500000L), Gen.choose(0L, 500000L),
        Gen.choose(0L, 500000L), Gen.choose(0L, 500000L)))
    val rows = pairGen(Gen.Parameters.default, Seed(9300L)).get
      .map { case (a, b, c, d) =>
        // force dominance: second point = first + nonneg deltas
        (math.min(a, 500000L), math.min(b, 500000L),
          math.min(a + c % 100000L, 500000L), math.min(b + d % 100000L, 500000L))
      }
    val df = rows.zipWithIndex.map { case ((x1, y1, x2, y2), i) =>
      (i.toLong, x1, y1, x2, y2) }.toDF("i", "x1", "y1", "x2", "y2")
    val bad = df.select(
        ZOrder.zvalue2($"x1", 0L, 500000L, $"y1", 0L, 500000L, 16).as("z1"),
        ZOrder.zvalue2($"x2", 0L, 500000L, $"y2", 0L, 500000L, 16).as("z2"))
      .filter($"z1" > $"z2").count()
    assert(bad === 0L)
  }

  test("hilbert: bijection + unit-step adjacency on full grids across bit widths") {
    import graft.operators.ZOrder
    for (bits <- Seq(2, 3, 4, 6)) {
      val side = 1L << bits
      val n = side * side
      val grid = spark.range(0, n)
        .select(($"id" % side).as("x"), ($"id" / side).cast("long").as("y"))
      val walk = ZOrder.withHilbert(grid, $"x", $"y", bits, "d")
        .select($"d", $"x", $"y").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      assert(walk.map(_._1).toSeq === (0L until n), s"bits=$bits bijection")
      walk.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1L, s"bits=$bits jump")
      }
    }
  }
}
