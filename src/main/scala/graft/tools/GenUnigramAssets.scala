package graft.tools

/** One-off generator for [[graft.PieceAssets]]: trains the committed
  * unigram-LM piece vocabulary (Kudo 2018 EM over the sf0.01 documents
  * corpus) and prints the Scala constant source — (piece, fixed-point
  * cost) pairs sorted lexicographically, ids implicit (0 = unk, then
  * 1..n in sort order). Committed constants are the canonical asset:
  * q-queries and the DuckDB oracles both derive from them, so token
  * ids are stable across scale factors and rounds. Re-run + re-commit
  * only when deliberately retraining. */
object GenUnigramAssets {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fit = graft.operators.UnigramTokenizer.fit(docs, "text",
      vocabSize = 80, seedSize = 400, emIters = 2, maxPieceLen = 6)
    val costs = graft.operators.UnigramTokenizer.toCosts(fit.pieces)
      .sortBy(_._1)
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"; case '"' => "\\\""; case c => c.toString
    }
    println(s"  // ${costs.size} pieces; EM trajectories: " +
      fit.likelihoodTrajectories.map(t =>
        t.map(v => f"$v%.1f").mkString("[", ", ", "]")).mkString(" "))
    println("  val pieces: Seq[(String, Long)] = Seq(")
    println(costs.map { case (s, c) => s"""    ("${esc(s)}", ${c}L)""" }
      .mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
