package graft

/** The COMMITTED unigram-LM tokenizer asset: a piece vocabulary with
  * fixed-point Viterbi costs (`round(−1e6·ln p)`), trained once on the
  * sf0.01 `documents` corpus via `tools.GenUnigramAssets`
  * ([[operators.UnigramTokenizer.fitLocal]]: substring seeding → EM →
  * 20%-per-round pruning to 80 pieces, all tie-breaks lexicographic).
  * Same train-once/serve-many contract as [[BpeAssets]]: token ids must
  * be stable across runs and scale factors, so the constants here are
  * the canonical asset — `q179_maxmatch_ids` and its DuckDB oracle both
  * derive from THIS table, and `q180_unigram_ids`/`q181_tokenizer_gates`
  * serve Viterbi from the same costs. Ids: 0 = `<unk>`, then 1..n over
  * the lexicographically sorted pieces.
  *
  * Integer costs are the cross-engine trick: the oracle replays
  * segmentation decisions in exact BIGINT arithmetic, so no float
  * rounding can flip a tie between Spark and DuckDB.
  *
  * Text contract (same boundary the CSV source documents): corpus
  * text is BMP, ASCII-whitespace-delimited. Outside it the engines'
  * string models legitimately diverge — Java walks UTF-16 code units
  * where DuckDB's substr counts code points (an astral char would be
  * two unks vs one), Java's `\\s` includes \\x0B where RE2's does
  * not, and Java `trim` strips all chars ≤ 0x20 vs SQL trim's
  * spaces. The committed alphabet is ASCII, so every out-of-contract
  * char lands on the unk path in BOTH engines for BMP inputs. */
object PieceAssets {
  // 80 pieces; EM trajectories: [-147101.9, -98542.4] [-97201.2, -96727.5] [-96603.1, -96595.4] [-96595.3, -96595.3] [-96595.3, -96595.3] [-96595.3, -96595.3] [-96595.3, -96595.3] [-96595.3, -96595.3]
  val pieces: Seq[(String, Long)] = Seq(
    ("a", 3463567L),
    ("ab", 20723266L),
    ("abl", 20723266L),
    ("able", 20723266L),
    ("ag", 20723266L),
    ("agg", 3439984L),
    ("al", 20723266L),
    ("all", 20723266L),
    ("alu", 20723266L),
    ("alue", 20723266L),
    ("am", 20723266L),
    ("an", 20723266L),
    ("ar", 20723266L),
    ("ark", 20723266L),
    ("art", 20723266L),
    ("as", 20723266L),
    ("ash", 20723266L),
    ("ast", 20723266L),
    ("at", 20723266L),
    ("ata", 20723266L),
    ("atch", 20723266L),
    ("b", 20723266L),
    ("ba", 20723266L),
    ("bat", 20723266L),
    ("batc", 20723266L),
    ("batch", 3400806L),
    ("bi", 20723266L),
    ("big", 3468123L),
    ("ble", 20723266L),
    ("c", 20723266L),
    ("can", 20723266L),
    ("column", 3404013L),
    ("custom", 3404013L),
    ("d", 20723266L),
    ("data", 3432245L),
    ("dup", 6985393L),
    ("e", 20723266L),
    ("er", 3404013L),
    ("f", 20723266L),
    ("fast", 3493558L),
    ("filter", 3405084L),
    ("g", 20723266L),
    ("group", 3465843L),
    ("h", 20723266L),
    ("hash", 3390190L),
    ("i", 20723266L),
    ("j", 20723266L),
    ("join", 3372398L),
    ("k", 20723266L),
    ("key", 3445549L),
    ("l", 20723266L),
    ("line", 3430045L),
    ("m", 20723266L),
    ("merge", 3421292L),
    ("n", 20723266L),
    ("o", 20723266L),
    ("order", 3427849L),
    ("p", 20723266L),
    ("part", 3465843L),
    ("q", 20723266L),
    ("query", 3473847L),
    ("r", 20723266L),
    ("row", 3394423L),
    ("s", 20723266L),
    ("scan", 3401874L),
    ("slow", 3421292L),
    ("small", 3410458L),
    ("sort", 3472700L),
    ("spark", 3463567L),
    ("stream", 3454518L),
    ("t", 20723266L),
    ("table", 3432245L),
    ("the", 3510087L),
    ("u", 20723266L),
    ("v", 20723266L),
    ("value", 3444433L),
    ("vector", 3427849L),
    ("w", 20723266L),
    ("window", 3456772L),
    ("y", 20723266L)
  )

  val MaxPieceLen = 6

  /** piece → fixed-point cost. */
  val costs: Map[String, Long] = pieces.toMap

  /** piece → token id (0 reserved for unk; pieces are committed in
    * lexicographic order, ids follow it). */
  val ids: Map[String, Long] =
    pieces.map(_._1).zipWithIndex.map { case (p, i) => p -> (i + 1L) }.toMap

  private def sq(s: String) = s.replace("'", "''")

  private def pieceValues: String =
    pieces.map(_._1).zipWithIndex
      .map { case (p, i) => s"('${sq(p)}',${i + 1})" }
      .mkString(",")

  /** DuckDB oracle for `q179_maxmatch_ids`, GENERATED from the
    * committed piece table so query and oracle cannot drift. MaxMatch
    * is single-successor (each step consumes exactly the longest
    * matching piece, or one `<unk>` character), so the recursive CTE
    * carries one state row per in-flight word — linear, where
    * Viterbi's lattice would need an exponential path set (which is
    * why the Viterbi face is gate-checked instead, q181). The longest
    * match is found without aggregation: one equality LEFT JOIN per
    * length 6..1 against the VALUES table (a long prefix join can
    * only hit when that exact string is a piece), then COALESCE picks
    * the longest hit; no hit consumes one unk char. */
  def maxMatchOracleSql: String = {
    val joins = (MaxPieceLen to 1 by -1).map(l =>
      s"LEFT JOIN pieces p$l ON p$l.piece = substr(s.rem, 1, $l)").mkString("\n    ")
    val chosen = (MaxPieceLen to 1 by -1).map(l => s"p$l.piece").mkString(", ")
    val chosenId = (MaxPieceLen to 1 by -1).map(l => s"p$l.token_id").mkString(", ")
    s"""WITH RECURSIVE
       |pieces(piece, token_id) AS (VALUES $pieceValues),
       |toks AS (
       |  SELECT doc_id, ord, w FROM (
       |    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS ord
       |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents)
       |  ) WHERE w <> ''
       |),
       |steps(doc_id, ord, k, token_id, rem) AS (
       |  SELECT doc_id, ord, 0, CAST(NULL AS BIGINT), w FROM toks
       |  UNION ALL
       |  SELECT s.doc_id, s.ord, s.k + 1,
       |    CAST(coalesce($chosenId, 0) AS BIGINT),
       |    CASE WHEN coalesce($chosen) IS NULL THEN substr(s.rem, 2)
       |         ELSE substr(s.rem, length(coalesce($chosen)) + 1) END
       |  FROM steps s
       |    $joins
       |  WHERE s.rem <> ''
       |)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord, k) - 1 AS BIGINT) AS pos,
       |  token_id
       |FROM steps WHERE k >= 1
       |ORDER BY doc_id, pos""".stripMargin
  }
}
