package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer: the Sennrich et al. worked example, tie determinism,
  * encode consistency, and the distributed fit == local fit. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // classic corpus: low x5, lower x2, newest x6, widest x3
  private val classic = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fitLocal reproduces the paper's merge sequence with lexicographic ties") {
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 tie -> (e,s);
    // round 2: (es,t)=9, (t,</w>)=9 tie -> (es,t); round 3: (est,</w>)=9
    val merges = Bpe.fitLocal(classic, numMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
  }

  test("encodeWord applies merges in order; unseen word degrades to chars") {
    val merges = Bpe.fitLocal(classic, numMerges = 5)
    // merge 4: max among (l,o)=7, (w,e)... after 3 merges:
    //   low: l o w </w> x5/x2-prefix; lower: l o w e r </w>
    //   newest: n e w est</w>; widest: w i d est</w>
    // (l,o)=7 is the unique max -> ("l","o"); then (lo,w)=7 -> merge 5
    assert(merges(3) === (("l", "o")))
    assert(merges(4) === (("lo", "w")))
    // lowest: e+s -> es; es+t -> est; est+</w> -> est</w>; l+o -> lo;
    // lo+w -> low  ==>  ["low", "est</w>"]
    assert(Bpe.encodeWord("lowest", merges.toIndexedSeq).toSeq ===
      Seq("low", "est" + Bpe.EndOfWord))
    assert(Bpe.encodeWord("xyz", merges.toIndexedSeq).toSeq ===
      Seq("x", "y", "z", Bpe.EndOfWord))
  }

  test("distributed fit over a DataFrame equals fitLocal on the histogram") {
    val rows = classic.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val docs = rows.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val viaDf = Bpe.fit(docs, "text", numMerges = 5)
    val viaLocal = Bpe.fitLocal(classic, numMerges = 5)
    assert(viaDf === viaLocal)
  }

  test("more merges never increase a doc's segment count (monotone compression)") {
    val docs = sources.Tables.documents(spark, sf0001).limit(40)
    val m10 = Bpe.fit(docs, "text", numMerges = 10)
    val m40 = Bpe.fit(docs, "text", numMerges = 40)
    // prefix property: a longer training run extends the shorter one
    assert(m40.take(10) === m10)
    val counts = docs.select(
        Bpe.segmentCount(col("text"), m10).as("c10"),
        Bpe.segmentCount(col("text"), m40).as("c40"))
      .collect()
    counts.foreach(r => assert(r.getLong(1) <= r.getLong(0),
      "extra merges can only merge further"))
  }

  test("merge table save/load round-trips in training order") {
    val merges = Bpe.fitLocal(classic, numMerges = 5)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/m"
    Bpe.save(spark, merges, path)
    assert(Bpe.load(spark, path) === merges)
  }

  test("vocab: contiguous ids, unk=0, base symbols before merge products, deterministic") {
    val v = BpeAssets.vocab
    assert(v.map(_._2) === v.indices.map(_.toLong), "ids are contiguous from 0")
    assert(v.head === ((Bpe.Unk, 0L)))
    assert(v.map(_._1).distinct.size === v.size, "tokens unique")
    // every base char + EndOfWord is present before any merge product
    val nBase = 1 + (BpeAssets.baseChars :+ Bpe.EndOfWord).distinct.size
    val (base, products) = v.splitAt(nBase)
    assert(base.map(_._1).toSet ===
      (BpeAssets.baseChars :+ Bpe.EndOfWord).toSet + Bpe.Unk)
    products.foreach { case (t, _) =>
      assert(BpeAssets.merges.exists { case (a, b) => a + b == t }, t)
    }
    // rebuild = same table (pure function of the committed constants)
    assert(Bpe.vocab(BpeAssets.merges, BpeAssets.baseChars) === v)
  }

  test("encodeIds/decodeIds round-trip in-vocab text; unknown symbols hit unk=0") {
    val docs = sources.Tables.documents(spark, sf0001).limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
        Bpe.encodeIds(col("text"), BpeAssets.merges, BpeAssets.vocabMap).as("ids"))
      .collect()
    rows.foreach { r =>
      val normalized = r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Bpe.decodeIds(r.getSeq[Long](2), BpeAssets.vocab) === normalized,
        s"doc ${r.getLong(0)}")
    }
    // a character outside the committed alphabet ('z' and 'x' may be
    // absent) degrades to unk id 0, never a crash or a silent drop
    val ids = spark.sql("SELECT 1").select(
        Bpe.encodeIds(lit("qéz"), BpeAssets.merges, BpeAssets.vocabMap).as("ids"))
      .head().getSeq[Long](0)
    assert(ids.length === 4, "q, é, z, </w>")
    assert(ids.contains(0L), "unseen char maps to unk")
  }

  test("vocab: colliding merge products keep the earlier id (first-wins)") {
    // (a,bc) and (ab,c) both spell "abc" — the second must not mint a
    // new id or shift later ids
    val merges = Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"), ("c", "d"))
    val v = Bpe.vocab(merges, Seq("a", "b", "c", "d"))
    assert(v.map(_._2) === v.indices.map(_.toLong), "ids stay contiguous")
    assert(v.count(_._1 == "abc") === 1, "one id for the collided product")
    val ofToken = v.toMap
    // products appear in merge order: bc, abc, ab, (abc skipped), cd
    assert(ofToken("bc") < ofToken("abc"))
    assert(ofToken("abc") < ofToken("ab"))
    assert(ofToken("ab") < ofToken("cd"))
  }

  test("vocab save/load round-trips in id order") {
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/v"
    Bpe.saveVocab(spark, BpeAssets.vocab, path)
    assert(Bpe.loadVocab(spark, path) === BpeAssets.vocab)
  }

  test("segment concatenation round-trips the word (no characters lost)") {
    val docs = sources.Tables.documents(spark, sf0001).limit(50)
    val merges = Bpe.fit(docs, "text", numMerges = 30)
    val segs = docs.select(col("doc_id"), col("text"),
        Bpe.segments(col("text"), merges).as("seg"))
      .collect()
    segs.foreach { r =>
      val words = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val rebuilt = r.getString(2).split('|')
        .map(_.replace(" ", "").stripSuffix(Bpe.EndOfWord))
      assert(rebuilt.toSeq === words.toSeq, s"doc ${r.getLong(0)}")
    }
    // fewer-or-equal segments than characters, more-or-equal than words
    val counts = docs.select(
        Bpe.segmentCount(col("text"), merges).as("n_bpe"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_words"),
        length(col("text")).as("n_chars"))
      .collect()
    counts.foreach { r =>
      assert(r.getLong(0) >= r.getInt(1).toLong, "at least one segment per word")
      assert(r.getLong(0) <= r.getInt(2).toLong + r.getInt(1).toLong,
        "bounded by chars + eow")
    }
  }
}
