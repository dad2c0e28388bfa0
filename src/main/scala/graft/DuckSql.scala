package graft

/**
 * Generators for the DuckDB oracle SQL registered in [[SparkEntry.oracleSql]].
 *
 * These describe the SAME semantics as the Spark operators in `graft.operators`,
 * expressed as a single DuckDB CTE chain per query (the reference materializes one
 * temp table per stage instead; py_duckdb/similarity_join/join/jaccard_join.py).
 *
 * All threshold arithmetic is CAST AS DOUBLE with the exact operand order of the
 * Spark side, so borderline `>=` comparisons evaluate identically (IEEE754 doubles
 * on both engines; see the float-sensitivity note in the reference's test.ipynb
 * cell 23).
 */
object DuckSql {

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** Tokenizer CTE body → rows (id, len, token). Mirrors graft.operators.QGramsTokenizer
    * (reference template: py_duckdb/similarity_join/tokenizers/__init__.py:11-26). */
  def qgramsTokens(table: String, key: String, value: String, q: Int, set: Boolean = true): String = {
    val inner =
      s"list_transform(generate_series(1, len($value) + ${q - 1}), x -> " +
      s"substring(concat(repeat('#', ${q - 1}), lower($value), repeat('#', ${q - 1})), x, $q))"
    val tks = if (set) s"list_distinct($inner)" else inner
    s"SELECT $key AS id, len(tks) AS len, lower(unnest(tks)) AS token " +
    s"FROM (SELECT $key, $tks AS tks FROM $table)"
  }

  /** Tokenizer CTE body for delimiter splitting. Mirrors graft.operators.DelimiterTokenizer
    * (reference template: tokenizers/__init__.py:29-43). `sepClass` is the regex
    * character class, e.g. `[\t\n\r ]`. */
  def delimTokens(table: String, key: String, value: String, sepClass: String, set: Boolean = true): String = {
    val inner = s"list_filter(str_split_regex($value, '$sepClass'), x -> trim(x) != '')"
    val tks = if (set) s"list_distinct($inner)" else inner
    s"SELECT $key AS id, len(tks) AS len, lower(unnest(tks)) AS token " +
    s"FROM (SELECT $key, $tks AS tks FROM $table)"
  }

  val wsClass = "[\t\n\r ]"

  /** Filtered self-join pipeline over a tokens CTE (reference jaccard_join.py:111-188). */
  def selfJoin(tokensSql: String, keyAttr: String, t: Double,
               lPfx: String = "l_", rPfx: String = "r_"): String = {
    val T = d(t); val T1 = d(1 + t)
    s"""WITH tokens AS ($tokensSql),
dfreq AS (SELECT token, count(*) AS df FROM tokens GROUP BY token),
tkdf AS (
  SELECT id, len, tokens.token AS token,
         row_number() OVER (PARTITION BY id ORDER BY df, tokens.token) AS pos,
         concat(len, '_', id) AS l_id
  FROM tokens, dfreq WHERE tokens.token = dfreq.token),
cand AS (
  SELECT L.id AS lid, R.id AS rid,
         MAX(L.pos) AS lmaxpos, MAX(R.pos) AS rmaxpos, count(*) AS pfxoverlap
  FROM tkdf L, tkdf R
  WHERE L.l_id < R.l_id AND L.token = R.token
    AND L.len >= (R.len * $T)
    AND L.len - L.pos + 1 >= (L.len * 2 * $T / $T1)
    AND R.len - R.pos + 1 >= (R.len * $T)
    AND LEAST((L.len - L.pos + 1), (R.len - R.pos + 1)) >= ((L.len + R.len) * $T / $T1)
  GROUP BY L.id, R.id)
SELECT L.id AS $lPfx$keyAttr, R.id AS $rPfx$keyAttr
FROM tkdf L, tkdf R, cand c
WHERE c.lid = L.id AND c.rid = R.id AND L.token = R.token
  AND L.pos >= c.lmaxpos AND R.pos >= c.rmaxpos
GROUP BY L.id, R.id, L.len, R.len, c.pfxoverlap
HAVING count(*) + c.pfxoverlap - 1 >= ((L.len + R.len) * $T / $T1)"""
  }

  /** Brute-force self-join (reference jaccard_join.py:190-201). */
  def bruteSelf(tokensSql: String, keyAttr: String, t: Double,
                lPfx: String = "l_", rPfx: String = "r_"): String = {
    val T = d(t); val T1 = d(1 + t)
    s"""WITH tokens AS ($tokensSql)
SELECT L.id AS $lPfx$keyAttr, R.id AS $rPfx$keyAttr
FROM tokens L, tokens R
WHERE L.token = R.token AND L.id < R.id
GROUP BY L.id, L.len, R.id, R.len
HAVING count(*) >= ((L.len + R.len) * $T / $T1)"""
  }

  /**
   * Filtered R×S pipeline (reference jaccard_join.py:235-405). The widow
   * placeholder is computed in-query from the table cardinalities; the
   * indexing-side choice (`lIsIndexing`) is data-dependent in the engine
   * (widow-prefix counts, jaccard_join.py:341-353) and must be pinned here to the
   * value observed on the verification dataset, because it decides the OUTPUT
   * COLUMN PREFIXES.
   */
  def rsJoin(lTokensSql: String, rTokensSql: String,
             lCountSql: String, rCountSql: String,
             lKeyAttr: String, rKeyAttr: String, t: Double,
             lIsIndexing: Boolean,
             lPfx: String = "l_", rPfx: String = "r_"): String = {
    val T = d(t); val T1 = d(1 + t)
    val ph = s"(($lCountSql) * ($rCountSql) + 1)"
    val (rTk, sTk) = if (lIsIndexing) ("l_tkdf", "r_tkdf") else ("r_tkdf", "l_tkdf")
    val (rOutPfx, sOutPfx) = if (lIsIndexing) (lPfx, rPfx) else (rPfx, lPfx)
    s"""WITH l_tokens AS ($lTokensSql),
r_tokens AS ($rTokensSql),
l_dfreq AS (SELECT token, count(*) AS df FROM l_tokens GROUP BY token),
r_dfreq AS (SELECT token, count(*) AS df FROM r_tokens GROUP BY token),
dfreq AS (
  SELECT coalesce(l_dfreq.token, r_dfreq.token) AS token,
         coalesce(l_dfreq.df * r_dfreq.df, $ph) AS df
  FROM l_dfreq FULL OUTER JOIN r_dfreq ON l_dfreq.token = r_dfreq.token),
l_tkdf AS (
  SELECT id, len, l_tokens.token AS token, df,
         row_number() OVER (PARTITION BY id ORDER BY df, l_tokens.token) AS pos
  FROM l_tokens, dfreq WHERE l_tokens.token = dfreq.token),
r_tkdf AS (
  SELECT id, len, r_tokens.token AS token, df,
         row_number() OVER (PARTITION BY id ORDER BY df, r_tokens.token) AS pos
  FROM r_tokens, dfreq WHERE r_tokens.token = dfreq.token),
rpfx AS (SELECT * FROM $rTk WHERE len - pos + 1 >= (len * 2 * $T / $T1)),
spfx AS (SELECT * FROM $sTk WHERE len - pos + 1 >= (len * $T)),
cand AS (
  SELECT Rp.id AS rid, Sp.id AS sid,
         MAX(Rp.pos) AS rmaxpos, MAX(Sp.pos) AS smaxpos, count(*) AS pfxoverlap
  FROM rpfx Rp, spfx Sp
  WHERE Rp.token = Sp.token
    AND Rp.len >= (Sp.len * $T)
    AND Sp.len >= (Rp.len * $T)
    AND LEAST((Rp.len - Rp.pos + 1), (Sp.len - Sp.pos + 1)) >= ((Rp.len + Sp.len) * $T / $T1)
  GROUP BY Rp.id, Sp.id)
SELECT R.id AS $rOutPfx$lKeyAttr, S.id AS $sOutPfx$rKeyAttr
FROM $rTk R, $sTk S, cand c
WHERE c.rid = R.id AND c.sid = S.id AND R.token = S.token
  AND R.pos >= c.rmaxpos AND S.pos >= c.smaxpos
GROUP BY R.id, S.id, R.len, S.len, c.pfxoverlap
HAVING count(*) + c.pfxoverlap - 1 >= ((R.len + S.len) * $T / $T1)"""
  }

  /** Brute-force R×S (reference jaccard_join.py:407-420). */
  def bruteRs(lTokensSql: String, rTokensSql: String,
              lKeyAttr: String, rKeyAttr: String, t: Double,
              lPfx: String = "l_", rPfx: String = "r_"): String = {
    val T = d(t); val T1 = d(1 + t)
    s"""WITH l_tokens AS ($lTokensSql),
r_tokens AS ($rTokensSql)
SELECT L.id AS $lPfx$lKeyAttr, R.id AS $rPfx$rKeyAttr
FROM l_tokens L, r_tokens R
WHERE L.token = R.token
GROUP BY L.id, L.len, R.id, R.len
HAVING count(*) >= ((L.len + R.len) * $T / $T1)"""
  }

  /** E1 confusion-matrix counts: one-pass tp/fp/fn over the symmetric full-outer
    * join (reference similarity_join/__init__.py:15-42). `gtSql`/`sjSql` must
    * produce pair tables with columns (gk1, gk2) / (sk1, sk2). */
  def evalCounts(gtSql: String, sjSql: String): String =
    s"""WITH gt AS ($gtSql),
sj AS ($sjSql),
cm AS (
  SELECT gt.gk1, gt.gk2, sj.sk1, sj.sk2
  FROM gt FULL OUTER JOIN sj
    ON (gt.gk1 = sj.sk1 AND gt.gk2 = sj.sk2) OR (gt.gk1 = sj.sk2 AND gt.gk2 = sj.sk1))
SELECT coalesce(sum(CASE WHEN sk1 IS NOT NULL AND sk2 IS NOT NULL THEN 1 END), 0)::BIGINT AS tp,
       coalesce(sum(CASE WHEN gk1 IS NULL THEN 1 END), 0)::BIGINT AS fp,
       coalesce(sum(CASE WHEN sk1 IS NULL THEN 1 END), 0)::BIGINT AS fn
FROM cm"""
}
