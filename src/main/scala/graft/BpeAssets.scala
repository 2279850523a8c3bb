package graft

/** The COMMITTED tokenizer asset: a BPE merge table (40 merges, trained
  * once on the sf0.01 `documents` corpus via `tools.GenBpeAssets` —
  * deterministic: pair-count argmax with lexicographic tie-break, see
  * `operators.Bpe.fitLocal`) plus the base character alphabet of that
  * corpus. Token IDS must be stable across runs and scale factors —
  * retraining per query would re-number the vocabulary whenever the
  * corpus slice changes, which is useless as training data — so the
  * constants here are the canonical asset: `q119_bpe_token_ids` and its
  * DuckDB oracle both derive from THIS table (the oracle SQL is
  * generated from these constants at registration time, the committed-
  * asset analog of the reference's train-once/serve-many tokenizer
  * split). BpeSpec pins that `Bpe.save`/`load` round-trips the table
  * and that ids decode back to the original text. */
object BpeAssets {
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("o", "r"),
    ("s", "t"),
    ("h", "</w>"),
    ("a", "t"),
    ("l", "u"),
    ("i", "n"),
    ("a", "</w>"),
    ("g", "</w>"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("t", "</w>"),
    ("i", "n</w>"),
    ("j", "o"),
    ("jo", "in</w>"),
    ("a", "s"),
    ("as", "h</w>"),
    ("h", "ash</w>"),
    ("r", "ow</w>"),
    ("at", "c"),
    ("atc", "h</w>"),
    ("b", "atch</w>"),
    ("a", "n</w>"),
    ("c", "an</w>"),
    ("s", "can</w>"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n</w>"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "m"),
    ("custom", "er</w>")
  )

  val baseChars: Seq[String] = Seq(
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l",
    "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "y"
  )

  /** Contiguous-id vocabulary over the committed table: 0 = `<unk>`,
    * then sorted base symbols, then merge products in training order. */
  val vocab: Seq[(String, Long)] = operators.Bpe.vocab(merges, baseChars)

  val vocabMap: Map[String, Long] = vocab.toMap

  /** DuckDB oracle for `q119_bpe_token_ids`, GENERATED from the
    * committed constants so query and oracle cannot drift. The
    * recursive CTE replays encodeWord exactly: per merge rank, merge
    * the LEFTMOST occurrence of the pair until none remains, then
    * advance rank. Leftmost-iterated equals Bpe's single greedy pass
    * because merging (a,b) → "ab" can never create a new adjacent
    * (a,b) instance (the product differs from both halves), so the set
    * of merge sites is fixed up front in both formulations. Symbols are
    * kept space-joined with sentinel spaces at both ends; a pair
    * occurrence is the substring ' a b ' and its replacement ' ab '
    * restores the shared boundary spaces. */
  def tokenIdsOracleSql: String = {
    def sq(s: String) = s.replace("'", "''")
    val mvals = merges.zipWithIndex
      .map { case ((l, r), i) => s"($i,'${sq(l)}','${sq(r)}')" }.mkString(",")
    val vvals = vocab
      .map { case (t, i) => s"('${sq(t)}',$i)" }.mkString(",")
    val nm = merges.size
    s"""WITH RECURSIVE
       |merges(merge_rank, lsym, rsym) AS (VALUES $mvals),
       |vocab(token, token_id) AS (VALUES $vvals),
       |toks AS (
       |  SELECT doc_id, ord, w FROM (
       |    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS ord
       |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents)
       |  ) WHERE w <> ''
       |),
       |steps(doc_id, ord, s, r) AS (
       |  SELECT doc_id, ord,
       |    ' ' || array_to_string(list_transform(range(1, length(w)+1), i -> w[i]), ' ') || ' </w> ',
       |    0
       |  FROM toks
       |  UNION ALL
       |  SELECT doc_id, ord,
       |    CASE WHEN pos > 0
       |      THEN substr(s, 1, pos-1) || ' ' || lsym || rsym || ' ' || substr(s, pos + length(' '||lsym||' '||rsym||' '))
       |      ELSE s END,
       |    CASE WHEN pos > 0 THEN r ELSE r + 1 END
       |  FROM (
       |    SELECT st.doc_id, st.ord, st.s, st.r, m.lsym, m.rsym,
       |           position(' '||m.lsym||' '||m.rsym||' ' IN st.s) AS pos
       |    FROM steps st JOIN merges m ON m.merge_rank = st.r
       |    WHERE st.r < $nm
       |  )
       |),
       |syms AS (
       |  SELECT doc_id, ord, unnest(sl) AS sym, generate_subscripts(sl, 1) AS spos
       |  FROM (SELECT doc_id, ord, list_filter(string_split(trim(s), ' '), x -> x <> '') AS sl
       |        FROM steps WHERE r = $nm)
       |)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord, spos) - 1 AS BIGINT) AS pos,
       |  CAST(coalesce(v.token_id, 0) AS BIGINT) AS token_id
       |FROM syms LEFT JOIN vocab v ON v.token = syms.sym
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** DuckDB oracle for `q126_bpe_token_freq`: the id stream of
    * [[tokenIdsOracleSql]] regrouped into per-token corpus frequencies,
    * joined back to the committed vocab VALUES, top-`limit` with a
    * total-order tiebreak. */
  def tokenFreqOracleSql(limit: Int): String = {
    def sq(s: String) = s.replace("'", "''")
    val vvals = vocab.map { case (t, i) => s"('${sq(t)}',$i)" }.mkString(",")
    s"""SELECT f.token_id, v.token, f.freq
       |FROM (SELECT token_id, count(*)::BIGINT AS freq
       |      FROM ($tokenIdsOracleSql) ids GROUP BY token_id) f
       |JOIN (VALUES $vvals) v(token, token_id) ON v.token_id = f.token_id
       |ORDER BY f.freq DESC, f.token_id LIMIT $limit""".stripMargin
  }

  /** DuckDB oracle for `q124_pack_token_ids`: the token-id stream of
    * [[tokenIdsOracleSql]] regrouped into fixed-`chunkLen` training
    * chunks per document, each summarized by exact integers (token
    * count + a position-weighted checksum Σ (pos_in_chunk+1)·token_id
    * — order-sensitive, so a permuted chunk cannot hash-match). */
  def packedOracleSql(chunkLen: Int): String =
    s"""SELECT doc_id, pos // $chunkLen AS chunk_idx,
       |  count(*)::BIGINT AS n_tokens,
       |  sum((pos % $chunkLen + 1) * token_id)::BIGINT AS checksum
       |FROM ($tokenIdsOracleSql) ids
       |GROUP BY doc_id, pos // $chunkLen
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB oracle for `q159_stride_chunks`: OVERLAPPING chunks —
    * chunk k covers positions [k·stride, k·stride + chunkLen); a token
    * belongs to every such window. kmin uses all-positive arithmetic
    * (CASE under chunkLen, truncating division above) so DuckDB's
    * floor `//` and Spark's truncating `div` agree. range() is
    * end-exclusive where Spark's sequence() is inclusive — hence the
    * `+ 1`. */
  def stridedOracleSql(chunkLen: Int, stride: Int): String =
    s"""SELECT doc_id, k AS chunk_idx, count(*)::BIGINT AS n_tokens,
       |  sum((pos - k*$stride + 1) * token_id)::BIGINT AS checksum
       |FROM (
       |  SELECT doc_id, pos, token_id,
       |    unnest(range(CASE WHEN pos < $chunkLen THEN 0
       |      ELSE (pos - $chunkLen + $stride)//$stride END,
       |      pos//$stride + 1)) AS k
       |  FROM ($tokenIdsOracleSql) ids) e
       |GROUP BY doc_id, k ORDER BY doc_id, chunk_idx""".stripMargin
}
