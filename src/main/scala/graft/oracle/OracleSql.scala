package graft.oracle

import graft.geo.{Geofences, Geohash}
import graft.sources.SyntheticTrips

/** DuckDB-side mirror of the Spark engine's query semantics, generated
  * programmatically from the SAME constants the Spark side uses
  * ([[SyntheticTrips]] anchors, [[Geofences]] cell lists, [[Geohash]]
  * index formula). Every arithmetic term is emitted in the exact
  * evaluation order of the Spark expressions so the driver's DuckDB
  * oracle hash-matches bit-for-bit (doubles included).
  *
  * Geohash in SQL uses the same direct index formula as
  * [[Geohash.encode]] (Geohash.scala:32-49): floor-scaled lat/lon
  * indexes, Morton bit-interleave (lon first), base-32. The
  * interleave is expressed with the standard bit-spread identity
  * (x | x<<16 ... & 0x5555...), which equals the loop in
  * Geohash.interleave for any index that fits 32 bits.
  */
object OracleSql {

  // ---- bit-spread (Morton) helpers -------------------------------------

  private val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** SQL column chain computing spread(col): bit i → bit 2i. Returns
    * (cte columns text, final column name). */
  private def spreadCols(src: String, out: String): Seq[String] = {
    var cur = src
    spreadSteps.zipWithIndex.map { case ((sh, mask), i) =>
      val name = if (i == spreadSteps.size - 1) out else s"${out}_$i"
      val t = s"(($cur | ($cur << $sh)) & $mask) AS $name"
      cur = name
      t
    }
  }

  /** floor-scaled index with clamp — mirrors Geohash.index. */
  private def idxExpr(v: String, off: String, span: String,
      bits: Int): String = {
    val n = 1L << bits
    s"LEAST(GREATEST(CAST(FLOOR((($v + $off) / $span) * $n.0) AS BIGINT), 0), ${n - 1})"
  }

  private val Alpha = Geohash.Alphabet

  /** base-32 string of `code` at `precision` chars. */
  private def base32Expr(code: String, precision: Int): String =
    (0 until precision).map { k =>
      val sh = 5 * (precision - 1 - k)
      s"substring('$Alpha', CAST((($code >> $sh) & 31) AS INT) + 1, 1)"
    }.mkString(" || ")

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  private def dblList(xs: Seq[Double]): String =
    xs.map(_.toString).mkString("[", ", ", "]")

  // ---- synthetic trip derivation (mirror of SyntheticTrips.derive) -----

  import SyntheticTrips._

  private def anchorPick(anchors: IndexedSeq[Anchor], idx: String,
      low: Anchor => Double, span: Anchor => Double, u: String): String =
    s"${dblList(anchors.map(low))}[CAST($idx + 1 AS INT)] + " +
      s"${dblList(anchors.map(span))}[CAST($idx + 1 AS INT)] * $u"

  /** CTEs deriving the trip-event table from `events`, then filtering
    * to valid NYC trips (operators F1/F2/F3) and attaching
    * pickup geohash-6 and dropoff geohash-7 (prefix property gives
    * every coarser precision by substring). Ends with CTE `nyc`. */
  def validNycTripsCtes: String = {
    // precision 6: 15 lon bits + 15 lat bits, lat at even positions
    // precision 7: 18 lon bits + 17 lat bits, lon at even positions
    val pLon = spreadCols("plon_i", "plon_s")
    val pLat = spreadCols("plat_i", "plat_s")
    val dLon = spreadCols("dlon_i", "dlon_s")
    val dLat = spreadCols("dlat_i", "dlat_s")
    val spread = (pLon ++ pLat ++ dLon ++ dLat).mkString(",\n    ")
    s"""WITH raw AS (
  SELECT event_id AS uid FROM events
), trip AS (
  SELECT
    uid AS trip_id,
    CASE WHEN uid % 25 = 1 THEN 'watermark' ELSE 'trip' END AS type,
    CASE WHEN uid % 97 = 0 THEN 95.0 ELSE
      ${anchorPick(pickupAnchors, "(uid * 2654435761) % 21", _.latLow, _.latSpan, "(CAST((uid * 31) % 97 AS DOUBLE) / 97.0)")}
    END AS pickup_lat,
    CASE WHEN uid % 97 = 0 THEN 200.0 ELSE
      ${anchorPick(pickupAnchors, "(uid * 2654435761) % 21", _.lonLow, _.lonSpan, "(CAST((uid * 37) % 89 AS DOUBLE) / 89.0)")}
    END AS pickup_lon,
    CASE WHEN (uid * 40503) % 100 < 15 THEN
      ${anchorPick(jfkAnchors, "(uid * 97) % 8", _.latLow, _.latSpan, "(CAST((uid * 41) % 83 AS DOUBLE) / 83.0)")}
    WHEN (uid * 40503) % 100 < 30 THEN
      ${anchorPick(lgaAnchors, "(uid * 97) % 10", _.latLow, _.latSpan, "(CAST((uid * 41) % 83 AS DOUBLE) / 83.0)")}
    ELSE
      ${anchorPick(nycDropAnchors, "(uid * 97) % 20", _.latLow, _.latSpan, "(CAST((uid * 41) % 83 AS DOUBLE) / 83.0)")}
    END AS dropoff_lat,
    CASE WHEN (uid * 40503) % 100 < 15 THEN
      ${anchorPick(jfkAnchors, "(uid * 97) % 8", _.lonLow, _.lonSpan, "(CAST((uid * 43) % 79 AS DOUBLE) / 79.0)")}
    WHEN (uid * 40503) % 100 < 30 THEN
      ${anchorPick(lgaAnchors, "(uid * 97) % 10", _.lonLow, _.lonSpan, "(CAST((uid * 43) % 79 AS DOUBLE) / 79.0)")}
    ELSE
      ${anchorPick(nycDropAnchors, "(uid * 97) % 20", _.lonLow, _.lonSpan, "(CAST((uid * 43) % 79 AS DOUBLE) / 79.0)")}
    END AS dropoff_lon,
    CAST((uid * 53) % 10000 AS DOUBLE) / 100.0 AS total_amount,
    ($T0Millis + (uid * 262147) % ${NWindows * WindowMillis}) - 60000 - (uid * 104729) % 5400000 AS pickup_ms,
    $T0Millis + (uid * 262147) % ${NWindows * WindowMillis} AS dropoff_ms
  FROM raw
), valid AS (
  SELECT * FROM trip
  WHERE type = 'trip'
    AND abs(pickup_lat) <= 90.0 AND abs(pickup_lon) <= 180.0
    AND abs(dropoff_lat) <= 90.0 AND abs(dropoff_lon) <= 180.0
), gidx AS (
  SELECT *,
    ${idxExpr("pickup_lon", "180.0", "360.0", 15)} AS plon_i,
    ${idxExpr("pickup_lat", "90.0", "180.0", 15)} AS plat_i,
    ${idxExpr("dropoff_lon", "180.0", "360.0", 18)} AS dlon_i,
    ${idxExpr("dropoff_lat", "90.0", "180.0", 17)} AS dlat_i
  FROM valid
), gspread AS (
  SELECT *,
    $spread
  FROM gidx
), ghash AS (
  SELECT *,
    ${base32Expr("((plon_s << 1) | plat_s)", 6)} AS pickup_gh6,
    ${base32Expr("(dlon_s | (dlat_s << 1))", 7)} AS dropoff_gh7
  FROM gspread
), nyc AS (
  SELECT * FROM ghash
  WHERE substring(pickup_gh6, 1, 4) IN ${sqlList(Geofences.nycCells)}
    AND substring(dropoff_gh7, 1, 4) IN ${sqlList(Geofences.nycCells)}
)"""
  }

  /** Q1 — pickup hot spots (mirror of TaxiQueries.q1PickupHotspots). */
  def q1PickupHotspots: String =
    s"""$validNycTripsCtes
SELECT pickup_gh6 AS location,
       COUNT(*) AS pickup_count,
       (dropoff_ms // 600000 + 1) * 600000 - 1 AS timestamp
FROM nyc
GROUP BY pickup_gh6, dropoff_ms // 600000
HAVING COUNT(*) >= 2"""

  /** Q2 — airport trip durations (mirror of
    * TaxiQueries.q2AirportDurations; JFK precedence, floored integer
    * minutes, HAVING count > 1, avg = double(sum)/count). */
  def q2AirportDurations: String = {
    val jfk6 = Geofences.jfkCells.filter(_.length == 6)
    val lga6 = Geofences.lgaCells.filter(_.length == 6)
    val lga7 = Geofences.lgaCells.filter(_.length == 7)
    s"""$validNycTripsCtes
, classified AS (
  SELECT *,
    CASE WHEN substring(dropoff_gh7, 1, 6) IN ${sqlList(jfk6)} THEN 'JFK'
         WHEN substring(dropoff_gh7, 1, 6) IN ${sqlList(lga6)}
           OR dropoff_gh7 IN ${sqlList(lga7)} THEN 'LGA'
    END AS airport_code,
    CAST(FLOOR((dropoff_ms - pickup_ms) / 60000) AS BIGINT) AS duration_min
  FROM nyc
)
SELECT pickup_gh6 AS location,
       airport_code,
       CAST(SUM(duration_min) AS BIGINT) AS sum_trip_duration,
       CAST(SUM(duration_min) AS DOUBLE) / COUNT(*) AS avg_trip_duration,
       (dropoff_ms // 600000 + 1) * 600000 - 1 AS timestamp
FROM classified
WHERE airport_code IS NOT NULL
GROUP BY pickup_gh6, airport_code, dropoff_ms // 600000
HAVING COUNT(*) > 1"""
  }

  /** Mirror of [[graft.operators.EventsQueries.hourlyTypeStats]]:
    * 1-hour tumbling windows on the native events table. DuckDB's
    * `epoch_ns(ts) // 1e6` matches Spark's ts_ms for every on-disk
    * timestamp representation the driver has shipped (nanos-as-long
    * and TIMESTAMP(MICROS) — see [[graft.operators.EventsQueries
    * .withTsMs]]). AVG is written as SUM/COUNT to mirror Spark's
    * Average (sum ÷ count at finish). */
  def eventsHourlyTypeStats: String =
    """WITH e AS (
  SELECT event_type, value,
         (epoch_ns(ts) // 1000000) // 3600000 AS win
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       SUM(value) AS sum_value,
       SUM(value) / COUNT(*) AS avg_value,
       (win + 1) * 3600000 - 1 AS timestamp
FROM e
GROUP BY event_type, win
HAVING COUNT(*) >= 2"""

  // ---- LLM-pipeline operator mirrors -----------------------------------

  import graft.operators.Dedup

  /** DuckDB fold computing the same 60-bit digest as
    * [[graft.operators.Dedup.digest60]]: first 15 hex chars of MD5,
    * base-16. */
  private def digest60Sql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr(md5($e), 1, 15), ''), " +
      s"c -> strpos('0123456789abcdef', c) - 1)), (a, b) -> a * 16 + b)"

  /** Mirror of [[graft.operators.Dedup.exactDedup]]. */
  def dedupExact: String =
    """SELECT doc_id,
       md5(text) AS content_hash,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       COUNT(*) OVER (PARTITION BY md5(text)) AS dup_group_size,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents"""

  /** Shared CTEs: tokens → distinct 3-word shingles → distinct 60-bit
    * shingle digests (mirror of [[graft.operators.Dedup.shingleHashes]]). */
  private def shingleCtes: String =
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM d WHERE len(w) >= 3
), h AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
           x -> ${digest60Sql("x")})) AS hashes
  FROM s
)"""

  /** Mirror of [[graft.operators.Dedup.exactNgramDecontam]] (q233):
    * the 13-token gram CTEs (exactly the 3-gram shingle pipeline at
    * n = 13), the benchmark's distinct digests, one membership join,
    * short/clean corpus docs carried with zero counts. */
  /** The q233/q235/q236 shared n-gram digest CTEs (d, s, h →
    * h(doc_id, gs)). */
  private def ngramCtes(n: Int): String = {
    val gram = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - ${n - 2}),
           i -> $gram)) AS shingles
  FROM d WHERE len(w) >= $n
), h AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
           x -> ${digest60Sql("x")})) AS gs
  FROM s
)"""
  }

  /** Mirror of [[graft.operators.Dedup.gramDupHistogram]] (q235):
    * exact df per gram digest, integer-threshold buckets, BIGINT
    * casts on the sums (DuckDB's SUM over BIGINT widens to
    * HUGEINT). */
  def gramDupHistogram: String =
    s"""${ngramCtes(graft.operators.Dedup.ExactDecontamN)}
, dfq AS (
  SELECT g, COUNT(*) AS df FROM (
    SELECT unnest(gs) AS g FROM h) GROUP BY g
)
SELECT CASE WHEN df = 1 THEN '1'
            WHEN df <= 3 THEN '2-3'
            WHEN df <= 7 THEN '4-7'
            WHEN df <= 15 THEN '8-15'
            ELSE '16+' END AS bucket,
       COUNT(*) AS n_grams,
       CAST(SUM(df) AS BIGINT) AS n_occurrences
FROM dfq
GROUP BY 1"""

  /** Mirror of [[graft.operators.Dedup.topDuplicatedGrams]] (q236):
    * (df DESC, g ASC) top-k off the same df frame. */
  def topDuplicatedGrams: String =
    s"""${ngramCtes(graft.operators.Dedup.ExactDecontamN)}
, dfq AS (
  SELECT gram, COUNT(*) AS df FROM (
    SELECT unnest(gs) AS gram FROM h) GROUP BY gram
)
SELECT gram, df, rank FROM (
  SELECT gram, df,
         CAST(row_number() OVER (ORDER BY df DESC, gram ASC) AS BIGINT)
           AS rank
  FROM dfq)
WHERE rank <= ${graft.operators.Dedup.MemAuditTopK}"""

  def exactNgramDecontam: String = {
    val n = graft.operators.Dedup.ExactDecontamN
    s"""${ngramCtes(n)}
, bench AS MATERIALIZED (
  SELECT DISTINCT unnest(gs) AS g FROM h WHERE doc_id < 20
), cg AS (
  SELECT doc_id, unnest(gs) AS g FROM h WHERE doc_id >= 20
), shared AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM cg JOIN bench USING (g) GROUP BY doc_id
), sizes AS (
  SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams
  FROM h WHERE doc_id >= 20
)
SELECT b.doc_id,
       COALESCE(sizes.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       COALESCE(shared.n_shared, CAST(0 AS BIGINT)) AS n_shared,
       COALESCE(shared.n_shared, CAST(0 AS BIGINT)) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) b
LEFT JOIN sizes USING (doc_id)
LEFT JOIN shared USING (doc_id)"""
  }

  /** Mirror of [[graft.operators.Dedup.ngramNovelty]] (q137): same
    * shingle CTEs, first-occurrence min on the hash key, novel
    * counts off the reduced frame, exact-long division. */
  def ngramNovelty: String =
    s"""$shingleCtes
, e AS (
  SELECT doc_id, unnest(hashes) AS hsh FROM h
), fd AS (
  SELECT hsh, MIN(doc_id) AS first_doc FROM e GROUP BY hsh
), nv AS (
  SELECT first_doc AS doc_id, COUNT(*) AS n_novel
  FROM fd GROUP BY first_doc
), base AS (
  SELECT doc_id, CAST(len(hashes) AS BIGINT) AS n_shingles FROM h
)
SELECT b.doc_id, b.n_shingles,
       COALESCE(nv.n_novel, 0) AS n_novel,
       CAST(COALESCE(nv.n_novel, 0) AS DOUBLE) / b.n_shingles
         AS novelty_rate
FROM base b LEFT JOIN nv USING (doc_id)"""

  /** Mirror of [[graft.operators.Dedup.charNgramHashes]]: distinct
    * sampled character n-gram digests (width [[Dedup.NGramChars]],
    * stride [[Dedup.NGramStride]] — the interpolated constants below
    * are the single source of truth). */
  private def ngramCtes: String = {
    val n = Dedup.NGramChars
    val s = Dedup.NGramStride
    val b = Dedup.WinnowBase
    val m = Dedup.P
    // polynomial gram hash — same fold the winnow mirror uses (the
    // Spark side computes it with one rolling pass; per-position
    // from-scratch folds give identical values)
    s"""WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= $n
), h AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, length(text) - $n + 1, $s),
           i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, ${n + 1}),
               j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) AS BIGINT))),
             (a, c) -> (a * $b + c) % $m))) AS hashes
  FROM d
)"""
  }

  /** Shared CTEs of the q261/q262 CDC mirrors — the same polynomial
    * window hash as [[ngramCtes]] at stride 1, the cut-set identity,
    * and per-chunk digests. Yields CTE `chunks` = (doc_id,
    * chunk_idx, start, n_chars, digest). */
  private def cdcCtes: String = {
    val k = Dedup.CdcK
    val b = Dedup.WinnowBase
    val m = Dedup.P
    val cm = Dedup.CdcMod
    s"""WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= $k
), h AS (
  SELECT doc_id, text,
    list_transform(range(0, length(text) - $k + 1),
      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, ${k + 1}),
          j -> CAST(ord(substr(text, CAST(i + j AS INT), 1))
            AS BIGINT))),
        (a, c) -> (a * $b + c) % $m)) AS hs
  FROM d
), cu AS (
  SELECT doc_id, text,
    list_sort(list_distinct(
      [CAST(0 AS BIGINT)] ||
      list_transform(list_filter(range(0, len(hs)),
        i -> hs[i + 1] % $cm = 0), i -> CAST(i + $k AS BIGINT)) ||
      [CAST(length(text) AS BIGINT)])) AS cuts
  FROM h
), ch AS (
  SELECT doc_id, r.i - 1 AS chunk_idx, cuts[r.i] AS s,
         cuts[r.i + 1] AS e, text
  FROM cu, LATERAL (SELECT unnest(range(1, len(cuts))) AS i) r
), chunks AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         s AS "start", e - s AS n_chars,
         md5(substr(text, CAST(s + 1 AS INT), CAST(e - s AS INT)))
           AS digest
  FROM ch
)"""
  }

  /** Mirror of [[graft.operators.Dedup.cdcChunks]] (q261). */
  def cdcChunks: String =
    s"""$cdcCtes
SELECT doc_id, chunk_idx, "start", n_chars, digest FROM chunks"""

  /** Mirror of [[graft.operators.Dedup.cdcDedupStats]] (q262). */
  def cdcDedupStats: String =
    s"""$cdcCtes
SELECT digest, CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MAX(n_chars) AS n_chars,
       (CAST(COUNT(*) AS BIGINT) - 1) * MAX(n_chars) AS saved_chars
FROM chunks GROUP BY digest HAVING COUNT(*) >= 2"""

  /** Mirror of [[graft.operators.Dedup.withinDocParagraphDedup]]
    * (q286): same paragraph split, planted first-paragraph repeat,
    * first-occurrence filter, ordered rebuild. */
  def withinDocParagraphDedup: String = {
    val p = Dedup.ParaWords
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), p0 AS (
  SELECT doc_id,
    list_transform(range(0, (len(w) + ${p - 1}) // $p),
      i -> array_to_string(list_slice(w, $p * i + 1,
        LEAST($p * i + $p, len(w))), ' ')) AS paras0
  FROM d
), pp AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN list_append(paras0, paras0[1]) ELSE paras0 END AS paras
  FROM p0
), k AS (
  SELECT doc_id, paras,
    list_filter(range(0, len(paras)),
      i -> NOT list_contains(list_slice(paras, 1, CAST(i AS INT)),
             paras[CAST(i + 1 AS INT)])) AS kept
  FROM pp
), c AS (
  SELECT doc_id, paras, kept,
    COALESCE(array_to_string(list_transform(kept,
      i -> paras[CAST(i + 1 AS INT)]), ' '), '') AS clean
  FROM k
)
SELECT doc_id, CAST(len(paras) AS BIGINT) AS n_paras,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(paras) - len(kept) AS BIGINT) AS n_dropped,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       md5(clean) AS clean_md5
FROM c"""
  }

  /** Mirror of [[graft.operators.Dedup.sourceContamination]]
    * (q287): the q233 mirror joined to sources and rolled up. */
  def sourceContamination: String =
    s"""WITH scr AS ($exactNgramDecontam
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN scr.contaminated THEN 1 ELSE 0 END)
         AS BIGINT) AS n_contaminated,
       CAST(SUM(scr.n_shared) AS BIGINT) AS n_shared_grams,
       CAST(SUM(CASE WHEN scr.contaminated THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*) AS contamination_rate
FROM scr JOIN documents d USING (doc_id)
GROUP BY d.source"""

  /** Mirror of [[graft.operators.Dedup.dedupConsensus]] (q288):
    * the five family mirrors full-outer-joined on the pair key. */
  def dedupConsensus: String =
    s"""WITH m AS (SELECT DISTINCT doc_a, doc_b FROM ($dedupMinhash)),
ng AS (SELECT DISTINCT doc_a, doc_b FROM ($dedupNgram)),
wn AS (SELECT DISTINCT doc_a, doc_b FROM ($dedupWinnow)),
sh AS (SELECT DISTINCT doc_a, doc_b FROM ($simhashDups)),
cc AS (SELECT DISTINCT doc_a, doc_b FROM ($cdcNearDups)),
keys AS (
  SELECT doc_a, doc_b FROM m
  UNION SELECT doc_a, doc_b FROM ng
  UNION SELECT doc_a, doc_b FROM wn
  UNION SELECT doc_a, doc_b FROM sh
  UNION SELECT doc_a, doc_b FROM cc
)
SELECT k.doc_a, k.doc_b,
       m.doc_a IS NOT NULL AS minhash,
       ng.doc_a IS NOT NULL AS ngram,
       wn.doc_a IS NOT NULL AS winnow,
       sh.doc_a IS NOT NULL AS simhash,
       cc.doc_a IS NOT NULL AS cdc,
       CAST(CASE WHEN m.doc_a IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN ng.doc_a IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN wn.doc_a IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN sh.doc_a IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN cc.doc_a IS NOT NULL THEN 1 ELSE 0 END
         AS BIGINT) AS n_methods
FROM keys k
LEFT JOIN m ON m.doc_a = k.doc_a AND m.doc_b = k.doc_b
LEFT JOIN ng ON ng.doc_a = k.doc_a AND ng.doc_b = k.doc_b
LEFT JOIN wn ON wn.doc_a = k.doc_a AND wn.doc_b = k.doc_b
LEFT JOIN sh ON sh.doc_a = k.doc_a AND sh.doc_b = k.doc_b
LEFT JOIN cc ON cc.doc_a = k.doc_a AND cc.doc_b = k.doc_b"""

  /** Mirror of [[graft.operators.Dedup.cdcNearDups]] (q277): same
    * chunk digests, bounded-bucket candidates, exact chunk-set
    * Jaccard. */
  def cdcNearDups: String = {
    val cap = Dedup.CdcPairMaxBucket
    val thr = Dedup.CdcJaccard
    s"""$cdcCtes, cd AS (
  SELECT DISTINCT doc_id, digest FROM chunks
), bkt AS (
  SELECT digest FROM cd GROUP BY digest
  HAVING COUNT(*) BETWEEN 2 AND $cap
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cd a JOIN bkt USING (digest)
  JOIN cd b ON a.digest = b.digest AND a.doc_id < b.doc_id
), sets AS (
  SELECT doc_id, list_distinct(list(digest)) AS cs
  FROM cd GROUP BY doc_id
), j AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(len(list_intersect(sa.cs, sb.cs)) AS DOUBLE) /
           (len(sa.cs) + len(sb.cs) -
            len(list_intersect(sa.cs, sb.cs))) AS cjaccard
  FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
            JOIN sets sb ON cand.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, cjaccard FROM j WHERE cjaccard >= $thr"""
  }

  /** Mirror of [[graft.operators.Dedup.minhashNearDups]] — identical
    * permutation constants ([[Dedup.perms]]), banding and Jaccard cut. */
  def dedupMinhash: String = minhashPipeline(shingleCtes)

  /** Mirror of [[graft.operators.Dedup.incrementalNearDups]]: in an
    * append-only corpus a pair involves a new doc iff its larger id
    * is in the new batch, so the oracle is the full pair set filtered
    * on doc_b. */
  def incrementalDedup: String =
    s"""SELECT * FROM ($dedupMinhash)
WHERE doc_b >= ${graft.operators.Dedup.IncrementalFrom}"""

  /** Mirror of [[graft.operators.Dedup.ngramNearDups]] (q18). */
  def dedupNgram: String = minhashPipeline(ngramCtes)

  /** Mirror of [[graft.operators.Dedup.containmentPairs]] (q98):
    * same shingle digests, same bounded-bucket candidate rule
    * (shared shingle with doc frequency in [2, ContainMaxBucket]),
    * exact intersection on the full hash sets, C = |A∩B|/min. */
  def containmentDedup: String = {
    val cap = Dedup.ContainMaxBucket
    val thr = Dedup.ContainmentThreshold
    s"""$shingleCtes, ex AS (
  SELECT doc_id, unnest(hashes) AS sh FROM h
), bkt AS (
  SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND $cap
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN bkt USING (sh)
  JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
), c AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(len(sa.hashes) AS BIGINT) AS n_a,
         CAST(len(sb.hashes) AS BIGINT) AS n_b,
         CAST(len(list_intersect(sa.hashes, sb.hashes)) AS BIGINT)
           AS n_shared
  FROM cand JOIN h sa ON cand.doc_a = sa.doc_id
            JOIN h sb ON cand.doc_b = sb.doc_id
)
SELECT *, CAST(n_shared AS DOUBLE) / LEAST(n_a, n_b) AS containment
FROM c WHERE CAST(n_shared AS DOUBLE) / LEAST(n_a, n_b) >= $thr"""
  }

  /** Mirror of [[graft.operators.Graph.pageRank]] (q99): identical
    * edge construction (distinct co-purchase pairs, symmetric,
    * custkey·2 / suppkey·2+1 node encoding), the same
    * [[graft.operators.Graph.PageRankIters]] unrolled iterations of
    * rₖ₊₁(v) = (1−d)/N + d·Σ rₖ(u)/deg(u), with the (1−d) complement
    * interpolated from the SAME Scala double Spark multiplies by. */
  def pageRank: String = {
    import graft.operators.Graph.{Damping, OneMinusDamping, PageRankIters}
    // MATERIALIZED throughout (r17): edges/deg/n are referenced by
    // EVERY unrolled iteration — un-materialized, DuckDB re-inlines
    // the lineitem⋈orders DISTINCT once per reference (the q104
    // mirror's 2^k lesson; at the sf1 rung this one timed out where
    // q104's materialized twin passed in seconds)
    def iterCte(k: Int): String =
      s"""r${k + 1} AS MATERIALIZED (
  SELECT e.dst AS node,
         $OneMinusDamping / n.n + $Damping * SUM(r$k.rank / dg.deg) AS rank
  FROM edges e
  JOIN r$k ON e.src = r$k.node
  JOIN deg dg ON e.src = dg.src, n
  GROUP BY e.dst, n.n
)"""
    val iters = (0 until PageRankIters).map(iterCte).mkString(", ")
    s"""WITH co AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM co
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM co
), deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), n AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg
), r0 AS MATERIALIZED (
  SELECT src AS node, 1.0 / n.n AS rank FROM deg, n
), $iters
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       node // 2 AS key,
       round(rank, ${graft.operators.Graph.RankRoundDigits}) AS rank
FROM r$PageRankIters"""
  }

  /** Mirror of [[graft.operators.Graph.hostQualityWeights]] (q104):
    * directed customer→supplier edges, [[graft.operators.Graph.DirectedIters]]
    * unrolled iterations of the dangling-mass update
    * rₖ₊₁ = (1−d)/N + d·(Σ rₖ/deg + Dₖ/N) with Dₖ the summed rank of
    * the out-degree-0 sinks, supplier hosts densely indexed by
    * row_number, and the Knuth-hash document→host assignment
    * ([[graft.operators.Sampling.mixedSql]]). Output ranks rounded to
    * [[graft.operators.Graph.RankRoundDigits]] in BOTH engines —
    * chained-iteration double summation is order-sensitive and the
    * rounding pins the compare (same contract as q99). */
  def hostQualityWeights: String = {
    import graft.operators.Graph.{Damping, DirectedIters, OneMinusDamping, RankRoundDigits}
    // r_k feeds BOTH the dangling sum and the contribution join —
    // every CTE here is MATERIALIZED or DuckDB's inlining doubles the
    // plan per unrolled iteration (2^k base-table scans blew the
    // open-file limit at k = 10)
    def iterCte(k: Int): String =
      s"""d$k AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r$k JOIN dang USING (node)
), c$k AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank / dg.deg) AS mass
  FROM edges e
  JOIN r$k r ON e.src = r.node
  JOIN deg dg ON e.src = dg.src
  GROUP BY e.dst
), r${k + 1} AS MATERIALIZED (
  SELECT nodes.node,
         $OneMinusDamping / n.n + $Damping *
           (COALESCE(c.mass, 0.0) + d.dm / n.n) AS rank
  FROM nodes CROSS JOIN n CROSS JOIN d$k d
  LEFT JOIN c$k c ON nodes.node = c.node
)"""
    val iters = (0 until DirectedIters).map(iterCte).mkString(", ")
    s"""WITH co AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM co
), deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
), n AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
), dang AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM deg)
), r0 AS (
  SELECT node, 1.0 / n.n AS rank FROM nodes, n
), $iters, hosts AS (
  SELECT node // 2 AS host_key,
         round(rank, $RankRoundDigits) AS host_rank
  FROM r$DirectedIters WHERE node % 2 = 1
), hidx AS (
  SELECT host_key,
         CAST(row_number() OVER (ORDER BY host_key) - 1 AS BIGINT) AS idx
  FROM hosts
), h AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS h FROM hosts
)
SELECT d.doc_id, hi.host_key, ho.host_rank
FROM (SELECT doc_id, ${graft.operators.Sampling.mixedSql("doc_id")} % h.h AS idx
      FROM documents, h) d
JOIN hidx hi USING (idx)
JOIN hosts ho USING (host_key)"""
  }

  /** Mirror of [[graft.operators.Graph.personalizedPageRank]] (q195)
    * over the SYMMETRIC co-purchase graph: same unrolled-iteration
    * shape as q104's mirror (MATERIALIZED per-round dm/contrib CTEs),
    * with the restart and dangling mass returned to the arithmetic
    * seed set (node % 2 = 0 AND custkey % PprSeedMod = 0) instead of
    * to every node; final rank rounded to the shared digits. */
  def personalizedPageRank: String = {
    import graft.operators.Graph.{Damping, OneMinusDamping, PprIters,
      PprSeedMod, RankRoundDigits}
    val seed = s"(nodes.node % 2 = 0 AND (nodes.node // 2) % $PprSeedMod = 0)"
    def iterCte(k: Int): String =
      s"""d$k AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r$k JOIN dang USING (node)
), c$k AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank / dg.deg) AS mass
  FROM edges e
  JOIN r$k r ON e.src = r.node
  JOIN deg dg ON e.src = dg.src
  GROUP BY e.dst
), r${k + 1} AS MATERIALIZED (
  SELECT nodes.node,
         CASE WHEN $seed THEN $OneMinusDamping / ns.ns ELSE 0.0 END
           + $Damping * (COALESCE(c.mass, 0.0) +
             CASE WHEN $seed THEN d.dm / ns.ns ELSE 0.0 END) AS rank
  FROM nodes CROSS JOIN ns CROSS JOIN d$k d
  LEFT JOIN c$k c ON nodes.node = c.node
)"""
    val iters = (0 until PprIters).map(iterCte).mkString(", ")
    s"""WITH co AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM co
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM co
), deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
), ns AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM nodes
  WHERE node % 2 = 0 AND (node // 2) % $PprSeedMod = 0
), dang AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM deg)
), r0 AS (
  SELECT nodes.node,
         CASE WHEN $seed THEN 1.0 / ns.ns ELSE 0.0 END AS rank
  FROM nodes CROSS JOIN ns
), $iters
SELECT nodes.node,
       nodes.node % 2 = 0 AND (nodes.node // 2) % $PprSeedMod = 0
         AS is_seed,
       round(r.rank, $RankRoundDigits) AS rank
FROM nodes JOIN r$PprIters r USING (node)"""
  }

  /** Mirror of [[graft.operators.Bpe.mergeTable]] (q100): the same
    * [[graft.operators.Bpe.NumMerges]] training steps unrolled —
    * per step, weighted adjacent-pair counts over the current vocab
    * symbol sequences, argmax with the (c DESC, l, r) tiebreak, and
    * the identical greedy left-to-right merge fold. */
  def bpeMerges: String = {
    val k = graft.operators.Bpe.NumMerges
    val sel = (0 until k).map { i =>
      s"SELECT $i AS step, l AS left_sym, r AS right_sym, merged, " +
        s"c AS pair_count FROM b$i"
    }.mkString("\nUNION ALL\n")
    "WITH " + bpeCtes(k) + "\n" + sel
  }

  /** Mirror of [[graft.operators.Bpe.trainAndCount]] (q101): the
    * trained vocabulary's FINAL symbol sequences (m_k) joined back to
    * the corpus word stream, token counts summed per document —
    * exactly the broadcast word→count apply the Spark side runs. */
  def bpeSegmentCounts: String = {
    val k = graft.operators.Bpe.NumMerges
    s"""WITH ${bpeCtes(k, includeFinalApply = true)}
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(m.syms)) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) d
JOIN m$k m ON d.word = m.word
WHERE len(d.word) > 0
GROUP BY d.doc_id"""
  }

  /** Shared CTE chain of the BPE mirrors: vocabulary m0, then per
    * step i the weighted pair counts p_i, the argmax b_i, and (for
    * i < steps−1, or through m_steps when `includeFinalApply`) the
    * merged vocabulary m_{i+1} under the identical greedy fold. */
  private def bpeCtes(steps: Int,
      includeFinalApply: Boolean = false): String = {
    def fold(bl: String, br: String, merged: String): String =
      s"""list_reduce(
    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $bl AND x[1] = $br
                THEN list_append(acc[:len(acc)-1], $merged)
                ELSE list_append(acc, x[1]) END)"""
    val ctes = Seq.newBuilder[String]
    // MATERIALIZED (r17): each m_i is referenced twice (by p_i and by
    // m_{i+1}); without materialization DuckDB re-inlines the chain,
    // recomputing m0's word unnest 2^steps times — harmless at
    // sf0.01, a disk-filling spill at the sf1 rung. Same discipline
    // as [[bpeBatchedCtes]]; results are identical.
    ctes += """m0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0
  GROUP BY word
)"""
    (0 until steps).foreach { i =>
      ctes += s"""p$i AS (
  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, syms[i] AS l, syms[i+1] AS r
    FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM m$i))
  GROUP BY l, r
), b$i AS MATERIALIZED (
  SELECT l, r, l || r AS merged, c FROM p$i ORDER BY c DESC, l, r LIMIT 1
)"""
      // LEFT JOIN ON TRUE + NULL-guarded CASE: when training exhausts
      // before NumMerges steps, b_i is EMPTY — a plain cross join
      // would empty every later m and the q101 oracle would return 0
      // rows while Spark still counts tokens under the fewer learned
      // merges; the guard passes the prior symbols through unchanged
      // (exactly what an exhausted serial trainer does)
      if (i < steps - 1 || includeFinalApply)
        ctes += s"""m${i + 1} AS MATERIALIZED (
  SELECT word, cnt,
         CASE WHEN b.l IS NULL THEN syms
              ELSE ${fold("b.l", "b.r", "b.merged")} END AS syms
  FROM m$i LEFT JOIN b$i b ON TRUE
)"""
    }
    ctes.result().mkString(",\n")
  }

  /** Mirror of [[graft.operators.Bpe.batchedMergeTable]] (q312):
    * the batched trainer's fixed-round shape unrolled — per round a
    * weighted pair count over the current vocab, the rank-ordered
    * candidate prefix (row_number over the SAME (c DESC, l, r)
    * tiebreak, capped at 4×batchSize like the Spark collect), a
    * GREEDY accept chain (each link picks the lowest-rank candidate
    * that neither repeats an accepted rank nor conflicts under the
    * exact invariance condition: r = accepted.l, l = accepted.r, or
    * either symbol equals an accepted merge), and the batch applied
    * as a sequence of NULL-guarded merge folds in acceptance order.
    * Greedy-scan ≡ iterated-argmin: a candidate skipped against a
    * smaller accepted set still conflicts against every superset, so
    * "lowest non-conflicting rank after the previous acceptance" is
    * exactly the sequential scan's next accept. */
  def bpeBatchedMerges: String = {
    val rounds = graft.operators.Bpe.BatchedRounds
    val sel = (0 until rounds).map { i =>
      s"SELECT $i AS b, rn, l, r, merged, c FROM acc${i}_${graft.operators.Bpe.BatchedBatchSize}"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeBatchedCtes()}
, allacc AS ($sel)
SELECT CAST(row_number() OVER (ORDER BY b, rn) - 1 AS INTEGER)
         AS step,
       l AS left_sym, r AS right_sym, merged, c AS pair_count
FROM allacc"""
  }

  /** Mirror of [[graft.operators.Bpe.batchedTrainAndCount]] (q313):
    * the batched-trained vocabulary's final symbol sequences joined
    * back to the corpus word stream — the q101 apply under the q312
    * merges. */
  def bpeBatchedSegmentCounts: String = {
    val rounds = graft.operators.Bpe.BatchedRounds
    s"""WITH ${bpeBatchedCtes()}
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(m.syms)) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) d
JOIN vb$rounds m ON d.word = m.word
WHERE len(d.word) > 0
GROUP BY d.doc_id"""
  }

  /** Shared CTE chain of the batched-BPE mirrors: vocabulary vb0,
    * then per round i the pair counts pb_i, ranked candidate prefix
    * cand_i, the greedy accept chain acc_i_1..acc_i_B, the per-slot
    * acceptances sel_i_k (ORDER BY rn OFFSET k — acceptance order IS
    * ascending rank, see [[bpeBatchedMerges]]), and the folded
    * vocabulary vb_{i+1} = vb_i_f_B. */
  private def bpeBatchedCtes(): String = {
    val rounds = graft.operators.Bpe.BatchedRounds
    val bs = graft.operators.Bpe.BatchedBatchSize
    val prefix = bs * 4
    def fold(bl: String, br: String, merged: String): String =
      s"""list_reduce(
    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $bl AND x[1] = $br
                THEN list_append(acc[:len(acc)-1], $merged)
                ELSE list_append(acc, x[1]) END)"""
    val ctes = Seq.newBuilder[String]
    ctes += """vb0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0
  GROUP BY word
)"""
    (0 until rounds).foreach { i =>
      ctes += s"""cand$i AS MATERIALIZED (
  SELECT l, r, c, rn FROM (
    SELECT l, r, c,
           row_number() OVER (ORDER BY c DESC, l, r) AS rn
    FROM (
      SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
        SELECT cnt, syms[j] AS l, syms[j+1] AS r
        FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS j
              FROM vb$i))
      GROUP BY l, r))
  WHERE rn <= $prefix
)"""
      ctes += s"""acc${i}_1 AS MATERIALIZED (
  SELECT rn, l, r, l || r AS merged, c FROM cand$i ORDER BY rn LIMIT 1
)"""
      (2 to bs).foreach { k =>
        ctes += s"""acc${i}_$k AS MATERIALIZED (
  SELECT * FROM acc${i}_${k - 1}
  UNION ALL
  SELECT * FROM (
    SELECT c2.rn, c2.l, c2.r, c2.l || c2.r AS merged, c2.c
    FROM cand$i c2
    WHERE c2.rn NOT IN (SELECT rn FROM acc${i}_${k - 1})
      AND NOT EXISTS (
        SELECT 1 FROM acc${i}_${k - 1} a
        WHERE c2.r = a.l OR c2.l = a.r
           OR c2.l = a.merged OR c2.r = a.merged)
    ORDER BY c2.rn LIMIT 1)
)"""
      }
      (1 to bs).foreach { k =>
        ctes += s"""sel${i}_$k AS (
  SELECT l, r, merged FROM acc${i}_$bs
  ORDER BY rn LIMIT 1 OFFSET ${k - 1}
)"""
        val src = if (k == 1) s"vb$i" else s"vb${i}_f${k - 1}"
        val tgt = if (k == bs) s"vb${i + 1}" else s"vb${i}_f$k"
        // round-final vocab is read twice (next round's pair count +
        // next fold chain): materialize to keep the plan linear (r17)
        val mat = if (k == bs) " MATERIALIZED" else ""
        ctes += s"""$tgt AS$mat (
  SELECT word, cnt,
         CASE WHEN s.l IS NULL THEN syms
              ELSE ${fold("s.l", "s.r", "s.merged")} END AS syms
  FROM $src LEFT JOIN sel${i}_$k s ON TRUE
)"""
      }
    }
    ctes.result().mkString(",\n")
  }

  /** Mirror of [[graft.operators.WordPiece.mergeTable]] (q328): the
    * batched-BPE CTE chain with LIKELIHOOD scoring — per round the
    * pair counts AND the symbol unit counts, candidates ranked by
    * score = c / (u(l)·u(r)) (same double arithmetic as the Spark
    * side: exact BIGINTs cast to DOUBLE, one multiply, one divide),
    * the greedy accept chain under BLANKET symbol disjointness
    * (WordPiece's stricter invariance — the denominator moves when
    * any shared symbol's unit count drops), and the batch folds in
    * acceptance order. */
  def wordPieceMerges: String = {
    val rounds = graft.operators.WordPiece.Rounds
    val sel = (0 until rounds).map { i =>
      s"SELECT $i AS b, rn, l, r, merged, c, score FROM accw${i}_${graft.operators.WordPiece.BatchSize}"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${wordPieceCtes()}
, allaccw AS ($sel)
SELECT CAST(row_number() OVER (ORDER BY b, rn) - 1 AS INTEGER)
         AS step,
       l AS left_sym, r AS right_sym, merged, c AS pair_count, score
FROM allaccw"""
  }

  /** Mirror of [[graft.operators.WordPiece.trainAndCount]] (q329):
    * the WordPiece-trained vocabulary's final symbol sequences
    * joined back to the corpus word stream — the q101/q313 apply
    * under the q328 merges. */
  def wordPieceSegmentCounts: String = {
    val rounds = graft.operators.WordPiece.Rounds
    s"""WITH ${wordPieceCtes()}
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(m.syms)) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) d
JOIN vw$rounds m ON d.word = m.word
WHERE len(d.word) > 0
GROUP BY d.doc_id"""
  }

  /** Shared CTE chain of the WordPiece mirrors — [[bpeBatchedCtes]]
    * with a unit-count CTE per round, score-ordered candidate ranks,
    * and the blanket-disjointness accept filter. */
  private def wordPieceCtes(): String = {
    val rounds = graft.operators.WordPiece.Rounds
    val bs = graft.operators.WordPiece.BatchSize
    val prefix = bs * 4
    def fold(bl: String, br: String, merged: String): String =
      s"""list_reduce(
    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $bl AND x[1] = $br
                THEN list_append(acc[:len(acc)-1], $merged)
                ELSE list_append(acc, x[1]) END)"""
    val ctes = Seq.newBuilder[String]
    ctes += """vw0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0
  GROUP BY word
)"""
    (0 until rounds).foreach { i =>
      ctes += s"""uw$i AS MATERIALIZED (
  SELECT s, CAST(SUM(cnt) AS BIGINT) AS u FROM (
    SELECT cnt, unnest(syms) AS s FROM vw$i)
  GROUP BY s
)"""
      ctes += s"""candw$i AS MATERIALIZED (
  SELECT l, r, c, score, rn FROM (
    SELECT l, r, c, score,
           row_number() OVER (ORDER BY score DESC, l, r) AS rn
    FROM (
      SELECT p.l, p.r, p.c,
             CAST(p.c AS DOUBLE) /
               (CAST(ul.u AS DOUBLE) * CAST(ur.u AS DOUBLE)) AS score
      FROM (
        SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
          SELECT cnt, syms[j] AS l, syms[j+1] AS r
          FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS j
                FROM vw$i))
        GROUP BY l, r) p
      JOIN uw$i ul ON p.l = ul.s
      JOIN uw$i ur ON p.r = ur.s))
  WHERE rn <= $prefix
)"""
      ctes += s"""accw${i}_1 AS MATERIALIZED (
  SELECT rn, l, r, l || r AS merged, c, score FROM candw$i
  ORDER BY rn LIMIT 1
)"""
      (2 to bs).foreach { k =>
        ctes += s"""accw${i}_$k AS MATERIALIZED (
  SELECT * FROM accw${i}_${k - 1}
  UNION ALL
  SELECT * FROM (
    SELECT c2.rn, c2.l, c2.r, c2.l || c2.r AS merged, c2.c, c2.score
    FROM candw$i c2
    WHERE c2.rn NOT IN (SELECT rn FROM accw${i}_${k - 1})
      AND NOT EXISTS (
        SELECT 1 FROM accw${i}_${k - 1} a
        WHERE c2.l IN (a.l, a.r, a.merged)
           OR c2.r IN (a.l, a.r, a.merged))
    ORDER BY c2.rn LIMIT 1)
)"""
      }
      (1 to bs).foreach { k =>
        ctes += s"""selw${i}_$k AS (
  SELECT l, r, merged FROM accw${i}_$bs
  ORDER BY rn LIMIT 1 OFFSET ${k - 1}
)"""
        val src = if (k == 1) s"vw$i" else s"vw${i}_f${k - 1}"
        val tgt = if (k == bs) s"vw${i + 1}" else s"vw${i}_f$k"
        // round-final vocab is read twice (unit count + pair count of
        // the next round): materialize to keep the plan linear (r17)
        val mat = if (k == bs) " MATERIALIZED" else ""
        ctes += s"""$tgt AS$mat (
  SELECT word, cnt,
         CASE WHEN s.l IS NULL THEN syms
              ELSE ${fold("s.l", "s.r", "s.merged")} END AS syms
  FROM $src LEFT JOIN selw${i}_$k s ON TRUE
)"""
      }
    }
    ctes.result().mkString(",\n")
  }

  /** Mirror of [[graft.operators.Dedup.sourceSimilarity]] (q95):
    * same shingle digests and permutation constants; the per-source
    * MIN over per-doc signature coordinates equals the union-set min
    * (MIN is associative), pair agreement summed per coordinate. */
  def sourceSimilarity: String = {
    val sigCols = Dedup.perms.map { case (a, b) =>
      s"list_min(list_transform(hashes, x -> ($a * (x % ${Dedup.P}) + $b) % ${Dedup.P}))"
    }.mkString("[", ",\n           ", "]")
    s"""WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM d WHERE len(w) >= 3
), h AS (
  SELECT doc_id, source,
         list_distinct(list_transform(shingles,
           x -> ${digest60Sql("x")})) AS hashes
  FROM s
), sig AS (
  SELECT doc_id, source, $sigCols AS m FROM h
), e AS (
  SELECT source, j, m[j + 1] AS v
  FROM sig, (SELECT unnest(range(${Dedup.NumHashes})) AS j)
), sm AS (
  SELECT source, j, MIN(v) AS mv FROM e GROUP BY source, j
), pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM sm a JOIN sm b ON a.j = b.j AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_agree,
       CAST(n_agree AS DOUBLE) / ${Dedup.NumHashes} AS jaccard_est
FROM pair"""
  }

  /** Shared LSH mirror over any CTE chain ending in
    * `h(doc_id, hashes)`. */
  /** The shared candidate chain of the MinHash pipelines: signature,
    * bands and the distinct (doc_a < doc_b) bucket pairs. */
  private def minhashCandCtes(ctes: String): String = {
    val sigCols = Dedup.perms.map { case (a, b) =>
      s"list_min(list_transform(hashes, x -> ($a * (x % ${Dedup.P}) + $b) % ${Dedup.P}))"
    }.mkString("[", ",\n           ", "]")
    s"""$ctes
, sig AS (
  SELECT doc_id, hashes,
         $sigCols AS m
  FROM h
), bands AS (
  SELECT doc_id, band, m[2*band+1] AS k1, m[2*band+2] AS k2
  FROM sig, (SELECT unnest(range(${Dedup.NumBands})) AS band)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""
  }

  private def minhashPipeline(ctes: String): String =
    s"""${minhashCandCtes(ctes)}
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
         len(list_distinct(list_concat(x.hashes, y.hashes))) AS jaccard
FROM cand c
JOIN h x ON x.doc_id = c.doc_a
JOIN h y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
        len(list_distinct(list_concat(x.hashes, y.hashes))) >= ${Dedup.JaccardThreshold}"""

  /** Mirror of [[graft.operators.Dedup.crossSourceDups]] (q311):
    * the q5 pair chain, verified pairs source-attributed and rolled
    * per unordered source pair. */
  def crossSourceDups: String =
    s"""${minhashCandCtes(shingleCtes)}
, ver AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN h x ON x.doc_id = c.doc_a
  JOIN h y ON y.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
          len(list_distinct(list_concat(x.hashes, y.hashes)))
        >= ${graft.operators.Dedup.JaccardThreshold}
), srcmap AS (SELECT doc_id, source FROM documents)
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ver
JOIN srcmap a ON a.doc_id = ver.doc_a
JOIN srcmap b ON b.doc_id = ver.doc_b
GROUP BY 1, 2"""

  /** Mirror of [[graft.operators.Dedup.dupRateAudit]] (q216): the
    * full q5 candidate chain, the same masked-mix pair sample, exact
    * verification of the sample only, and the extrapolated count. */
  def dupRateAudit: String = {
    import graft.operators.Dedup.AuditSampleDen
    val K = graft.operators.Sampling.HashMult
    s"""${minhashCandCtes(shingleCtes)}
, smp AS (
  SELECT doc_a, doc_b FROM cand
  WHERE ((((doc_a % 1048576) * 31 + doc_b % 1048576) * $K)
          // 1048576) % $AuditSampleDen = 0
), ver AS (
  SELECT s.doc_a, s.doc_b
  FROM smp s
  JOIN h x ON x.doc_id = s.doc_a
  JOIN h y ON y.doc_id = s.doc_b
  WHERE CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
          len(list_distinct(list_concat(x.hashes, y.hashes)))
        >= ${Dedup.JaccardThreshold}
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM smp) AS n_sampled,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ver) AS n_dup_sampled,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ver) * $AuditSampleDen
         AS est_dup_pairs,
       CAST((SELECT COUNT(*) FROM smp) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
         AS sampled_frac"""
  }

  /** Mirror of [[graft.operators.Dedup.ophNearDups]] (q114): the
    * one-permutation signature replayed exactly — per-bin minima of
    * the single permuted hash, rotation densification as a k-term
    * COALESCE with the j·C offsets — then the SAME band join and
    * exact-Jaccard verify as the classic pipeline. */
  def ophDedup: String = {
    val k = Dedup.NumHashes
    val (a, b) = Dedup.perms.head
    val p = Dedup.P
    val c = Dedup.OphC
    val pivotCols = (0 until k).map(i =>
      s"MIN(CASE WHEN bin = $i THEN mn END) AS s$i").mkString(",\n         ")
    val densCols = (0 until k).map { i =>
      val terms = (0 until k).map { j =>
        if (j == 0) s"s$i" else s"s${(i + j) % k} + ${j.toLong * c}"
      }.mkString(", ")
      s"COALESCE($terms, 0) AS d$i"
    }.mkString(",\n         ")
    val sigList = (0 until k).map(i => s"d$i").mkString("[", ", ", "]")
    s"""$shingleCtes
, ex AS (
  SELECT doc_id, ($a * (x % $p) + $b) % $p AS hh
  FROM (SELECT doc_id, unnest(hashes) AS x FROM h)
), binmin AS (
  SELECT doc_id, CAST(hh % $k AS INT) AS bin, MIN(hh) AS mn
  FROM ex GROUP BY doc_id, bin
), piv AS (
  SELECT doc_id,
         $pivotCols
  FROM binmin GROUP BY doc_id
), dens AS (
  SELECT doc_id,
         $densCols
  FROM piv
), sig AS (
  SELECT doc_id, $sigList AS m FROM dens
), bands AS (
  SELECT doc_id, band, m[2*band+1] AS k1, m[2*band+2] AS k2
  FROM sig, (SELECT unnest(range(${Dedup.NumBands})) AS band)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
         len(list_distinct(list_concat(x.hashes, y.hashes))) AS jaccard
FROM cand c
JOIN h x ON x.doc_id = c.doc_a
JOIN h y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE) /
        len(list_distinct(list_concat(x.hashes, y.hashes))) >= ${Dedup.JaccardThreshold}"""
  }

  /** Mirror of [[graft.operators.Dedup.weightedMinhashNearDups]]
    * (q116): the ICWS draw chain replayed per (doc, term, perm) —
    * identical uniform arithmetic ((a·x+b) mod P over the term
    * digest), −ln(u·u) Gammas, the floor/exp sample statistic in the
    * kernel's operation order — argmin by (a, term) per permutation,
    * the q5 banding over sample structs, and the EXACT integer
    * weighted-Jaccard verify (Σmin/Σmax via a per-pair term outer
    * union — bit-deterministic, no FP mirror risk). */
  def weightedMinhashDedup: String = {
    val pat = graft.operators.TextAnalysis.WordPattern
    val p = Dedup.P
    val k = Dedup.IcwsNumPerms
    val pp1 = s"${p + 1}.0"
    val permRows = (0 until k).map { perm =>
      val ps = (0 until 5).map(j => Dedup.icwsParams(perm * 5 + j))
      s"($perm, " + ps.map { case (a, b) => s"$a, $b" }.mkString(", ") + ")"
    }.mkString(",\n    ")
    def uExpr(aj: String, bj: String) =
      s"(($aj * x + $bj) % $p + 1) / $pp1"
    val pivotCols = (0 until k).map(i =>
      s"MAX(CASE WHEN perm = $i THEN struct_pack(h := h, t := t) END) AS s$i")
      .mkString(",\n         ")
    val bandCte = (0 until Dedup.NumBands).map { j =>
      s"SELECT doc_id, $j AS band, s${2 * j} AS k1, s${2 * j + 1} AS k2 FROM piv"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '$pat') AS toks
  FROM documents
), bgu AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i + 1])) AS term
  FROM tok
), tft AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM bgu GROUP BY doc_id, term
), tf AS MATERIALIZED (
  SELECT doc_id, h, CAST(SUM(tf) AS BIGINT) AS tf FROM (
    SELECT doc_id, ${digest60Sql("term")} AS h, tf FROM tft)
  GROUP BY doc_id, h
), el AS MATERIALIZED (
  SELECT doc_id, h, tf,
         h % $p AS x,
         ln(CAST(tf AS DOUBLE)) AS lnw
  FROM tf
), pc(perm, a1, b1, a2, b2, a3, b3, a4, b4, a5, b5) AS (
  VALUES
    $permRows
), draw AS MATERIALIZED (
  SELECT doc_id, perm, h,
         FLOOR(lnw / r + beta) AS t,
         c / (exp(r * (FLOOR(lnw / r + beta) - beta)) * exp(r)) AS a
  FROM (
    SELECT doc_id, perm, h, lnw,
           -ln((${uExpr("a1", "b1")}) * (${uExpr("a2", "b2")})) AS r,
           -ln((${uExpr("a3", "b3")}) * (${uExpr("a4", "b4")})) AS c,
           ${uExpr("a5", "b5")} AS beta
    FROM el, pc)
), samp AS MATERIALIZED (
  SELECT doc_id, perm, h, CAST(t AS BIGINT) AS t FROM (
    SELECT doc_id, perm, h, t,
           row_number() OVER (PARTITION BY doc_id, perm
             ORDER BY a ASC, h ASC) AS rn
    FROM draw) WHERE rn = 1
), piv AS MATERIALIZED (
  SELECT doc_id,
         $pivotCols
  FROM samp GROUP BY doc_id
), bands AS MATERIALIZED (
  $bandCte
), cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pt AS (
  SELECT doc_a, doc_b, h,
         CAST(MAX(CASE WHEN side = 0 THEN tf ELSE 0 END) AS BIGINT) AS ta,
         CAST(MAX(CASE WHEN side = 1 THEN tf ELSE 0 END) AS BIGINT) AS tb
  FROM (
    SELECT c.doc_a, c.doc_b, f.h, f.tf, 0 AS side
    FROM cand c JOIN tf f ON f.doc_id = c.doc_a
    UNION ALL
    SELECT c.doc_a, c.doc_b, f.h, f.tf, 1 AS side
    FROM cand c JOIN tf f ON f.doc_id = c.doc_b
  ) GROUP BY 1, 2, 3
), wj AS (
  SELECT doc_a, doc_b,
         CAST(CAST(SUM(LEAST(ta, tb)) AS BIGINT) AS DOUBLE) /
           CAST(SUM(GREATEST(ta, tb)) AS BIGINT) AS wjaccard
  FROM pt GROUP BY 1, 2
)
SELECT doc_a, doc_b, wjaccard FROM wj
WHERE wjaccard >= ${Dedup.WeightedJaccardThreshold}"""
  }

  /** Mirror of [[graft.operators.Dedup.winnowNearDups]] (q26): each
    * gram's polynomial hash recomputed as a from-scratch left fold
    * ((a·B + ord(char)) mod M — the same residue the Spark kernel
    * maintains incrementally), window minima via list slicing
    * (1-based inclusive on both ends, same elements as the kernel's
    * windows), distinct fingerprints, doc-frequency-capped exact
    * shared-fingerprint candidates, Jaccard cut. */
  /** Shared winnow-fingerprint CTE chain (`d` → `h` → `f(doc_id,
    * fps)`), used by both the winnow dedup and the contamination
    * mirror. */
  private def winnowFpCtes: String = {
    val k = Dedup.WinnowK
    val w = Dedup.WinnowW
    val b = Dedup.WinnowBase
    val m = Dedup.P
    s"""WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= ${k + w - 1}
), h AS (
  SELECT doc_id,
         list_transform(range(0, length(text) - $k + 1),
           i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, ${k + 1}),
               j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) AS BIGINT))),
             (a, c) -> (a * $b + c) % $m)) AS hs
  FROM d
), f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(hs) - $w + 1),
           i -> list_min(hs[CAST(i + 1 AS INT):CAST(i + $w AS INT)]))) AS fps
  FROM h
)"""
  }

  def dedupWinnow: String = {
    s"""$winnowFpCtes, ex AS (
  SELECT doc_id, unnest(fps) AS fp FROM f
), rare AS (
  SELECT ex.doc_id, ex.fp
  FROM ex JOIN (
    SELECT fp FROM ex GROUP BY fp HAVING COUNT(*) <= ${Dedup.MaxFingerprintDf}
  ) r USING (fp)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.fps, y.fps)) AS DOUBLE) /
         len(list_distinct(list_concat(x.fps, y.fps))) AS jaccard
FROM cand c
JOIN f x ON x.doc_id = c.doc_a
JOIN f y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.fps, y.fps)) AS DOUBLE) /
        len(list_distinct(list_concat(x.fps, y.fps))) >= ${Dedup.WinnowJaccard}"""
  }

  import graft.operators.TextAnalysis

  /** Mirror of [[TextAnalysis.textStats]]. */
  def textStats: String = {
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    s"""WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    len(list_distinct(w)) AS n_distinct_tokens,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(w, t -> CAST(length(t) AS BIGINT))),
      (a, b) -> a + b) AS sum_token_chars,
    len(list_filter(w, t -> list_contains($stops, t))) AS n_stopwords,
    length(text) AS n_chars,
    CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
    ${digest60Sql("text")} AS fingerprint
  FROM d
), ratios AS (
  SELECT *,
    CAST(sum_token_chars AS DOUBLE) / n_tokens AS avg_token_len,
    CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
    CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio
  FROM base
)
SELECT * EXCLUDE (distinct_ratio),
       LEAST(n_tokens / 50.0, 1.0) * distinct_ratio *
         (1.0 - 0.5 * stopword_ratio) AS quality_score
FROM ratios"""
  }

  /** Mirror of [[graft.operators.Pipeline.chatTemplate]] (q303):
    * the ChatML render and the loss-mask token accounting rebuilt
    * from the same word-quarter arithmetic. */
  def chatTemplate: String = {
    val nl = "chr(10)"
    val sys = "'You are a helpful assistant.'"
    def turn(role: String, txt: String): String =
      s"'<|im_start|>$role' || $nl || $txt || '<|im_end|>' || $nl"
    def toks(x: String): String =
      s"CASE WHEN length($x) = 0 THEN 0 ELSE len(string_split($x, ' ')) END"
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
), s AS (
  SELECT doc_id, n, n >= 4 AS two,
    CASE WHEN n >= 4
         THEN array_to_string(list_slice(w, 1, n // 4), ' ')
         ELSE array_to_string(list_slice(w, 1,
           CAST(ceil(n / 2.0) AS INT)), ' ') END AS u1,
    CASE WHEN n >= 4
         THEN array_to_string(list_slice(w, n // 4 + 1, n // 2), ' ')
         ELSE array_to_string(list_slice(w,
           CAST(ceil(n / 2.0) AS INT) + 1, n), ' ') END AS a1,
    CASE WHEN n >= 4
         THEN array_to_string(list_slice(w, n // 2 + 1, 3 * n // 4), ' ')
         ELSE '' END AS u2,
    CASE WHEN n >= 4
         THEN array_to_string(list_slice(w, 3 * n // 4 + 1, n), ' ')
         ELSE '' END AS a2
  FROM d
), r AS (
  SELECT doc_id, two,
    ${turn("system", sys)} || ${turn("user", "u1")} ||
      ${turn("assistant", "a1")} ||
      CASE WHEN two
           THEN ${turn("user", "u2")} || ${turn("assistant", "a2")}
           ELSE '' END AS rendered,
    CAST(${toks(sys)} + ${toks("u1")} + ${toks("u2")} AS BIGINT)
      AS n_tokens_prompt,
    CAST(${toks("a1")} + ${toks("a2")} AS BIGINT) AS n_tokens_loss
  FROM s
)
SELECT doc_id,
       CASE WHEN two THEN 4 ELSE 2 END AS n_turns,
       CASE WHEN two THEN 10 ELSE 6 END AS n_control,
       n_tokens_prompt, n_tokens_loss,
       CAST(n_tokens_loss AS DOUBLE) /
         greatest(n_tokens_prompt + n_tokens_loss, 1) AS loss_frac,
       CAST(length(rendered) AS BIGINT) AS n_chars,
       md5(rendered) AS template_md5
FROM r"""
  }

  /** Mirror of [[graft.operators.Pipeline.preferencePairs]] (q304):
    * the q6 quality expression, ordered-list argmax/argmin with the
    * distinct-pair tie-breaks. */
  def preferencePairs: String = {
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    val g = graft.operators.Pipeline.PromptGroups
    s"""WITH d AS (
  SELECT doc_id, doc_id % $g AS prompt_id,
         string_split(text, ' ') AS w
  FROM documents
), s AS (
  SELECT doc_id, prompt_id,
         LEAST(len(w) / 50.0, 1.0) *
           (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) *
           (1.0 - 0.5 * (CAST(len(list_filter(w,
              t -> list_contains($stops, t))) AS DOUBLE) / len(w)))
           AS q
  FROM d
)
SELECT prompt_id,
       (list(doc_id ORDER BY q DESC, doc_id ASC))[1] AS chosen_id,
       (list(doc_id ORDER BY q ASC, doc_id DESC))[1] AS rejected_id,
       max(q) AS chosen_q, min(q) AS rejected_q,
       max(q) - min(q) AS margin,
       CAST(COUNT(*) AS BIGINT) AS n_candidates
FROM s GROUP BY prompt_id HAVING COUNT(*) >= 2"""
  }

  /** Mirror of [[graft.operators.Sampling.curriculumOrder]] (q177):
    * the q6 quality-score expression, per-source (quality DESC, id
    * ASC) rank, global position by row_number over (src_rank,
    * source) — the serial twin of the range-partitioned q57 pass. */
  def curriculumOrder: String = {
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    s"""WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id, source,
         LEAST(len(w) / 50.0, 1.0) *
           (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) *
           (1.0 - 0.5 * (CAST(len(list_filter(w,
              t -> list_contains($stops, t))) AS DOUBLE) / len(w)))
           AS quality_score
  FROM d
), r AS (
  SELECT doc_id, source, quality_score,
         CAST(row_number() OVER (PARTITION BY source
           ORDER BY quality_score DESC, doc_id ASC) AS BIGINT)
           AS src_rank
  FROM s
)
SELECT doc_id, source, quality_score, src_rank,
       CAST(row_number() OVER (ORDER BY src_rank, source) - 1 AS BIGINT)
         AS position
FROM r"""
  }

  /** Mirror of [[graft.operators.Sampling.paretoFront]] (q133): the
    * same per-n_chars max-quality reduction and strictly-increasing
    * running-max frontier scan (the all-pairs NOT-EXISTS dominance
    * DEFINITION is spec-pinned equal on the fixture — SamplingSpec —
    * and would be quadratic here); quality_score is the q6
    * hash-graded expression tree, multiplication order (A·B)·C
    * preserved. */
  def paretoFront: String = {
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    s"""WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         string_split(text, ' ') AS w
  FROM documents
), s AS (
  SELECT doc_id, n_chars,
    LEAST(len(w) / 50.0, 1.0)
      * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
      * (1.0 - 0.5 * (CAST(len(list_filter(w,
            t -> list_contains($stops, t))) AS DOUBLE) / len(w)))
      AS quality_score
  FROM d
), px AS (
  SELECT n_chars, MAX(quality_score) AS ymax FROM s GROUP BY n_chars
), f AS (
  SELECT n_chars, ymax,
         MAX(ymax) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM px
)
SELECT s.doc_id, s.n_chars, s.quality_score
FROM s JOIN f ON s.n_chars = f.n_chars AND s.quality_score = f.ymax
WHERE f.prevmax IS NULL OR f.ymax > f.prevmax"""
  }

  /** Mirror of
    * [[graft.operators.TextAnalysis.sourceConcentration]] (q169):
    * exact token sums, identical share ratios, the ordered
    * list_reduce fold for HHI. */
  def sourceConcentration: String =
    """WITH s AS (
  SELECT source,
         CAST(SUM(CAST(CEIL(length(text) / 4.0) AS BIGINT))
           AS BIGINT) AS tokens
  FROM documents GROUP BY source
), t AS (
  SELECT *, CAST(SUM(tokens) OVER () AS BIGINT) AS total FROM s
), sh AS (
  SELECT source, tokens,
         CAST(tokens AS DOUBLE) / total AS share
  FROM t
), h AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(share * share ORDER BY source)),
           (a, b) -> a + b) AS hhi
  FROM sh
)
SELECT sh.source, sh.tokens, sh.share, h.hhi FROM sh, h"""

  /** Mirror of [[graft.operators.TextAnalysis.vocabGrowth]] (q135):
    * row_number states the total order the q57 prefix-sum operator
    * computes without a single-reducer window; bucket arithmetic,
    * first-occurrence min, and the constant-size running sums are
    * identical; DuckDB window SUM over BIGINT widens to HUGEINT →
    * cast back. */
  def vocabGrowth: String = {
    val b = TextAnalysis.VocabGrowthBuckets
    s"""WITH idx AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
  FROM documents
), nn AS (SELECT COUNT(*) AS n FROM documents
), db AS (
  SELECT doc_id, (idx * $b // n) + 1 AS bucket FROM idx, nn
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), ft AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
), nt AS (
  SELECT db.bucket, COUNT(*) AS new_types
  FROM ft JOIN db ON ft.first_doc = db.doc_id GROUP BY db.bucket
), nd AS (
  SELECT bucket, COUNT(*) AS n_docs FROM db GROUP BY bucket
)
SELECT nd.bucket,
  CAST(SUM(nd.n_docs) OVER (ORDER BY nd.bucket
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
  COALESCE(nt.new_types, 0) AS new_types,
  CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY nd.bucket
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
FROM nd LEFT JOIN nt USING (bucket)"""
  }

  /** Mirror of [[TextAnalysis.qualityFilter]] (q94): identical ratio
    * expression trees to [[textStats]]'s, the same symbol-character
    * regex (ASCII classes so Java and RE2 agree), and the same
    * first-failing-rule CASE precedence. */
  def qualityFilter: String = {
    import TextAnalysis._
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    s"""WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(w, t -> CAST(length(t) AS BIGINT))),
      (a, b) -> a + b) AS DOUBLE) / len(w) AS avg_token_len,
    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
      AS DOUBLE) / length(text) AS symbol_ratio,
    CAST(len(list_filter(w, t -> list_contains($stops, t)))
      AS DOUBLE) / len(w) AS stopword_ratio,
    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio
  FROM d
), v AS (
  SELECT *,
    CASE WHEN n_tokens < $MinTokens THEN 'too_short'
         WHEN n_tokens > $MaxTokens THEN 'too_long'
         WHEN avg_token_len < $MinAvgTokenLen
           OR avg_token_len > $MaxAvgTokenLen THEN 'odd_token_len'
         WHEN symbol_ratio > $MaxSymbolRatio THEN 'symbolic'
         WHEN stopword_ratio < $MinStopwordRatio THEN 'low_stopword'
         WHEN distinct_ratio < $MinDistinctRatio THEN 'repetitive'
         ELSE 'none' END AS reject_reason
  FROM base
)
SELECT *, reject_reason = 'none' AS kept FROM v"""
  }

  /** Mirror of [[TextAnalysis.targetLmScore]] (q97): same bigram
    * construction, identical interpolated-probability expression tree
    * (the 1−λ weight is interpolated from the SAME Scala double, so
    * both engines multiply by the identical constant), Σ n·ln p per
    * doc. */
  def targetLmScore: String =
    s"""$targetLmCtes
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       -SUM(n * logp) / SUM(n) AS cross_entropy,
       exp(-SUM(n * logp) / SUM(n)) AS ppl
FROM j GROUP BY doc_id"""

  /** The shared q97 LM CTE chain (`d0` → … → `j`, per-(doc, bigram)
    * n·logp) — single source for the per-doc mirror
    * ([[targetLmScore]]) and the per-domain DoReMi aggregation
    * ([[doremiWeights]]). */
  private def targetLmCtes: String = {
    import TextAnalysis.{LmLambda, TargetLmSource}
    val oneMinus = 1 - LmLambda // the exact double Spark multiplies by
    s"""WITH d0 AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), d AS (
  SELECT * FROM d0 WHERE len(w) >= 2
), bg0 AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w)),
           i -> {'w1': w[i], 'w2': w[i + 1]})) AS b
  FROM d
), bg AS (
  SELECT doc_id, source, b.w1 AS w1, b.w2 AS w2 FROM bg0
), tc1 AS (
  SELECT t, COUNT(*) AS c1 FROM (
    SELECT unnest(w) AS t FROM d WHERE source = '$TargetLmSource')
  GROUP BY t
), tc2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bg
  WHERE source = '$TargetLmSource' GROUP BY w1, w2
), st AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM tc1
), j AS (
  SELECT db.doc_id, db.n,
         ln($LmLambda * (CASE WHEN a.c1 IS NOT NULL AND c.c2 IS NOT NULL
               THEN CAST(c.c2 AS DOUBLE) / a.c1 ELSE 0.0 END)
            + $oneMinus * (CAST(COALESCE(b.c1, 0) + 1 AS DOUBLE) /
                (st.n_tok + st.v + 1))) AS logp
  FROM (SELECT doc_id, w1, w2, COUNT(*) AS n FROM bg
        GROUP BY doc_id, w1, w2) db
  LEFT JOIN tc2 c ON db.w1 = c.w1 AND db.w2 = c.w2
  LEFT JOIN tc1 a ON db.w1 = a.t
  LEFT JOIN tc1 b ON db.w2 = b.t, st
)"""
  }

  /** Mirror of [[graft.operators.Sampling.doremiWeights]] (q179):
    * the q97 chain aggregated per doc then per source with the same
    * n_bigrams·cross_entropy product tree, excess clipped by the
    * same greatest(0, ·), the identical η/smoothing Scala doubles
    * interpolated, and the |S|-row softmax absorbed by %.9g. */
  def doremiWeights: String = {
    import graft.operators.Sampling.{DoremiEta, DoremiSmoothing}
    import TextAnalysis.TargetLmSource
    val oneMinusC = 1 - DoremiSmoothing // the exact Spark double
    s"""$targetLmCtes, q97 AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         -SUM(n * logp) / SUM(n) AS cross_entropy
  FROM j GROUP BY doc_id
), src AS MATERIALIZED (
  SELECT dd.source, COUNT(*) AS n_docs,
         CAST(SUM(q.n_bigrams) AS BIGINT) AS n_bigrams,
         SUM(q.n_bigrams * q.cross_entropy) / SUM(q.n_bigrams) AS loss
  FROM q97 q JOIN documents dd ON q.doc_id = dd.doc_id
  GROUP BY dd.source
), ref AS (
  SELECT loss AS ref_loss FROM src WHERE source = '$TargetLmSource'
), ex AS (
  SELECT source, n_docs, n_bigrams, loss, excess,
         exp($DoremiEta * excess) AS ew
  FROM (
    SELECT s.source, s.n_docs, s.n_bigrams, s.loss,
           CASE WHEN s.source = '$TargetLmSource' THEN 0.0
                ELSE greatest(0.0, s.loss - r.ref_loss) END AS excess
    FROM src s, ref r)
), zz AS (
  SELECT list_reduce(list_prepend(0.0, list(ew ORDER BY source)),
           (a, b) -> a + b) AS z,
         CAST(COUNT(*) AS BIGINT) AS n_src FROM ex
)
SELECT source, n_docs, n_bigrams, loss, excess,
       $oneMinusC * ew / zz.z + $DoremiSmoothing / zz.n_src AS weight
FROM ex, zz"""
  }

  /** Mirror of [[TextAnalysis.nbQualityFilter]] (q107): same
    * WordPattern tokenization, same labeled-source lists, identical
    * Laplace expression trees (ln of a double division with the
    * +1/+|V| integer arithmetic inside the cast), per-doc
    * Σ tf·Δlogp absorbed by the compare's %.9g, margin = prior_diff
    * + ll_sum in the same addition order. */
  /** The shared NB model CTE chain (`lab` → … → `dflt`) — single
    * source for the batch mirror ([[nbQuality]]) and the streamed
    * serve-side mirror ([[nbQualityStreamed]]). */
  private def nbModelCtes: String = {
    val pat = graft.operators.TextAnalysis.WordPattern
    val pos = graft.operators.TextAnalysis.NbPosSources
      .map(s => s"'$s'").mkString(", ")
    val neg = graft.operators.TextAnalysis.NbNegSources
      .map(s => s"'$s'").mkString(", ")
    s"""WITH lab AS (
  SELECT doc_id, text,
         CASE WHEN source IN ($pos) THEN 1
              WHEN source IN ($neg) THEN 0 END AS label
  FROM documents
), tok AS (
  SELECT doc_id, label,
         unnest(regexp_extract_all(lower(text), '$pat')) AS term
  FROM lab
), tf AS (
  SELECT doc_id, label, term, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, label, term
), vstat AS (
  SELECT term,
         CAST(SUM(CASE WHEN label = 1 THEN tf ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(SUM(CASE WHEN label = 0 THEN tf ELSE 0 END) AS BIGINT)
           AS n_neg
  FROM tf WHERE label IS NOT NULL GROUP BY term
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS tot_pos,
         CAST(SUM(n_neg) AS BIGINT) AS tot_neg,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM vstat
), pri AS (
  SELECT ln(CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*)) -
         ln(CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*)) AS prior_diff
  FROM lab WHERE label IS NOT NULL
), model AS (
  SELECT term,
         ln(CAST(n_pos + 1 AS DOUBLE) / (tot_pos + v)) -
         ln(CAST(n_neg + 1 AS DOUBLE) / (tot_neg + v)) AS lpdiff
  FROM vstat, tot
), dflt AS (
  SELECT ln(1.0 / (tot_pos + v)) - ln(1.0 / (tot_neg + v)) AS lpdiff0
  FROM tot
)"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.nbCalibration]]
    * (q151): the q107 margin derivation as a subquery, the same
    * (margin, doc_id) ntile order, exact counts + one fixed-order
    * division. */
  def nbCalibration: String = {
    import graft.operators.TextAnalysis.{CalibrationBins, NbNegSources, NbPosSources}
    val pos = sqlList(NbPosSources)
    val neg = sqlList(NbNegSources)
    s"""WITH s AS MATERIALIZED (
  SELECT doc_id, margin FROM ($nbQuality)
), lbl AS (
  SELECT doc_id,
         CASE WHEN source IN $pos THEN 1
              WHEN source IN $neg THEN 0 END AS label
  FROM documents
), j AS (
  SELECT s.doc_id, s.margin, lbl.label
  FROM s JOIN lbl USING (doc_id)
  WHERE lbl.label IS NOT NULL
), b AS (
  SELECT *, CAST(ntile($CalibrationBins) OVER (ORDER BY margin ASC,
    doc_id ASC) AS BIGINT) AS bin
  FROM j
)
SELECT bin, COUNT(*) AS n_docs,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       CAST(CAST(SUM(label) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS frac_pos,
       MIN(margin) AS min_margin, MAX(margin) AS max_margin
FROM b GROUP BY bin"""
  }

  def nbQuality: String =
    s"""$nbModelCtes
, scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tok,
         SUM(CAST(tf.tf AS DOUBLE) * COALESCE(m.lpdiff, d.lpdiff0))
           AS ll_sum
  FROM tf LEFT JOIN model m USING (term) CROSS JOIN dflt d
  GROUP BY tf.doc_id
)
SELECT s.doc_id, s.n_tok,
       p.prior_diff + s.ll_sum AS margin,
       p.prior_diff + s.ll_sum > 0 AS keep
FROM scored s CROSS JOIN pri p"""

  /** Mirror of the STREAMED serve-side scorer
    * ([[graft.streaming.StreamingQuality.nbScore]], graded q118):
    * same model CTEs, but the per-doc margin is the ORDERED per-token
    * left fold the streaming column evaluates (token sequence order,
    * not tf grouping) — mirrored with a map lookup inside
    * list_reduce so the fold order is bit-identical. */
  def nbQualityStreamed: String = {
    val pat = graft.operators.TextAnalysis.WordPattern
    s"""$nbModelCtes
, mdl AS MATERIALIZED (
  SELECT map_from_entries(list(struct_pack(k := term, v := lpdiff)))
    AS mp
  FROM model
), toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '$pat') AS w
  FROM documents
)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tok,
       p.prior_diff + list_reduce(list_prepend(0.0,
         list_transform(t.w,
           x -> COALESCE(map_extract(mdl.mp, x)[1], d.lpdiff0))),
         (a, b) -> a + b) AS margin,
       p.prior_diff + list_reduce(list_prepend(0.0,
         list_transform(t.w,
           x -> COALESCE(map_extract(mdl.mp, x)[1], d.lpdiff0))),
         (a, b) -> a + b) > 0 AS keep
FROM toks t, mdl, pri p, dflt d"""
  }

  /** The per-language score column list of the q7 mirror. */
  private def langScoreColsSql: String =
    TextAnalysis.langProfiles.map { case (code, words) =>
      val lst = sqlList(words).replace("(", "[").replace(")", "]")
      s"CAST(len(list_filter(w, t -> list_contains($lst, t))) AS DOUBLE) " +
        s"/ len(w) AS score_$code"
    }.mkString(",\n    ")

  /** The winner CASE of the q7 mirror (profile-order tie
    * precedence). */
  private def langGuessSql: String = {
    val codes = TextAnalysis.langProfiles.map(_._1)
    codes.init.zipWithIndex.map { case (code, i) =>
      val cond = codes.drop(i + 1)
        .map(c => s"score_$code >= score_$c").mkString(" AND ")
      s"WHEN $cond THEN '$code'"
    }.mkString("CASE ", " ", s" ELSE '${codes.last}' END")
  }

  /** Mirror of [[TextAnalysis.langId]] (profile-order tie precedence). */
  def langId: String = {
    val codes = TextAnalysis.langProfiles.map(_._1)
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), scored AS (
  SELECT doc_id,
    $langScoreColsSql
  FROM d
)
SELECT doc_id, ${codes.map(c => s"score_$c").mkString(", ")},
       $langGuessSql AS lang_guess
FROM scored"""
  }

  /** Mirror of [[TextAnalysis.tokenizerFertility]] (q263): the q7
    * guess and the q24 token counts re-derived, exact integer sums,
    * one fixed-order division per ratio. */
  def tokenizerFertility: String = {
    val pat = TextAnalysis.TokenPattern
    s"""WITH d AS (
  SELECT doc_id, text, source, string_split(text, ' ') AS w
  FROM documents
), scored AS (
  SELECT doc_id, text, w, source,
    $langScoreColsSql
  FROM d
), g AS (
  SELECT $langGuessSql AS lang, source,
         CAST(len(w) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(lower(text), '$pat'))
           AS BIGINT) AS tok,
         CAST(length(text) AS BIGINT) AS chars
  FROM scored
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS n_words,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(SUM(tok) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)
         AS fertility,
       CAST(SUM(chars) AS DOUBLE) / CAST(SUM(tok) AS DOUBLE)
         AS chars_per_token
FROM g GROUP BY lang, source"""
  }

  /** Mirror of [[graft.operators.Sampling.ucbAllocation]] (q208):
    * exact-LONG reward sums, single-division mean, the same
    * √(c·ln N/n) bonus chain, struct-max arm pick. */
  def ucbAllocation: String = {
    import graft.operators.Sampling.UcbC
    val lst = sqlList(TextAnalysis.stopwords)
      .replace("(", "[").replace(")", "]")
    s"""WITH d AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '),
           t -> list_contains($lst, t))) AS BIGINT) AS sw,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
  FROM documents
), stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(sw) AS BIGINT) AS sw, CAST(SUM(tk) AS BIGINT) AS tk
  FROM d GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM stats
), scored AS (
  SELECT source, n_docs, sw, tk,
         CAST(sw AS DOUBLE) / CAST(tk AS DOUBLE) AS mean_reward,
         sqrt($UcbC * ln(CAST(n_total AS DOUBLE))
           / CAST(n_docs AS DOUBLE)) AS bonus,
         CAST(sw AS DOUBLE) / CAST(tk AS DOUBLE)
           + sqrt($UcbC * ln(CAST(n_total AS DOUBLE))
               / CAST(n_docs AS DOUBLE)) AS ucb
  FROM stats CROSS JOIN tot
), best AS (
  SELECT ucb AS bu, source AS bs FROM scored
  QUALIFY row_number() OVER (ORDER BY ucb DESC, source DESC) = 1
)
SELECT source, n_docs, sw, tk, mean_reward, bonus, ucb,
       (ucb = best.bu AND source = best.bs) AS chosen
FROM scored CROSS JOIN best"""
  }

  /** Mirror of [[graft.operators.Sampling.lengthBucketAudit]]
    * (q218): the same regex token count, integer CASE bucket ladder,
    * exact-LONG masses and fixed-order waste divisions. */
  def lengthBucketAudit: String = {
    import graft.operators.Sampling.LengthBuckets
    import graft.operators.TextAnalysis.TokenPattern
    val ladder = LengthBuckets.init.map(b =>
      s"WHEN n_tok <= $b THEN CAST($b AS BIGINT)")
      .mkString("CASE ", " ", s" ELSE CAST(${LengthBuckets.last} " +
        "AS BIGINT) END")
    s"""WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$TokenPattern'))
              AS BIGINT) AS n_tok
  FROM documents
), b AS (
  SELECT doc_id, n_tok, $ladder AS bucket_len FROM t
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g_docs,
         CAST(SUM(n_tok) AS BIGINT) AS g_tokens,
         CAST(MAX(n_tok) AS BIGINT) AS g_max
  FROM b
)
SELECT bucket_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) AS BIGINT) * bucket_len AS padded_tokens,
       1.0 - CAST(SUM(n_tok) AS DOUBLE)
         / CAST(CAST(COUNT(*) AS BIGINT) * bucket_len AS DOUBLE)
         AS waste_frac,
       g.g_max,
       1.0 - CAST(g.g_tokens AS DOUBLE)
         / CAST(g.g_docs * g.g_max AS DOUBLE) AS global_waste_frac
FROM b CROSS JOIN g
GROUP BY bucket_len, g.g_max, g.g_docs, g.g_tokens"""
  }

  /** Mirror of [[TextAnalysis.zipfFit]] (q221): same top-V rank
    * pick, rank-ordered moment folds, identical closed-form
    * slope/r² chains. */
  def zipfFit: String = {
    import graft.operators.TextAnalysis.ZipfTopRanks
    def fold(e: String): String =
      s"list_reduce(list_prepend(0.0, list($e ORDER BY rn)), " +
        "(a, b) -> a + b)"
    s"""WITH rc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY term
), rk AS (
  SELECT rn, ln(CAST(rn AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM (
    SELECT c, CAST(row_number() OVER (ORDER BY c DESC, term ASC)
               AS BIGINT) AS rn
    FROM rc
  ) WHERE rn <= $ZipfTopRanks
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ${fold("x")} AS sx, ${fold("y")} AS sy,
         ${fold("x * y")} AS sxy, ${fold("x * x")} AS sxx,
         ${fold("y * y")} AS syy
  FROM rk
), f AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
           ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
  FROM m
)
SELECT n AS n_ranks, slope, r2,
       (slope <= -0.5 AND slope >= -2.0) AS zipf_like
FROM f"""
  }

  /** Mirror of [[TextAnalysis.sourceJsd]] (q220): same top-V vocab
    * pick, dense smoothed grid, term-ordered vectors and the
    * fixed-length sequential JSD fold. */
  def sourceJsd: String = {
    import graft.operators.TextAnalysis.JsdVocab
    s"""WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) AS term
  FROM documents
), vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS c FROM t GROUP BY term
  ) QUALIFY row_number() OVER (ORDER BY c DESC, term ASC)
      <= $JsdVocab
), counts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM t JOIN vocab USING (term) GROUP BY source, term
), grid AS (
  SELECT s.source, v.term, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN vocab v
  LEFT JOIN counts c ON c.source = s.source AND c.term = v.term
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM grid
  GROUP BY source
), vs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vn FROM vocab
), vecs AS (
  SELECT g.source,
         list(CAST(g.c + 1 AS DOUBLE) / CAST(t.tot + vs.vn
              AS DOUBLE) ORDER BY g.term) AS pv
  FROM grid g JOIN tot t USING (source) CROSS JOIN vs
  GROUP BY g.source, t.tot, vs.vn
)
SELECT a.source AS source_a, b.source AS source_b,
       list_reduce(list_prepend(0.0,
         list_transform(range(1, len(a.pv) + 1), i ->
           a.pv[i] * ln(a.pv[i] / ((a.pv[i] + b.pv[i]) / 2.0)) +
           b.pv[i] * ln(b.pv[i] / ((a.pv[i] + b.pv[i]) / 2.0)))),
         (x, y) -> x + y) / 2.0 AS jsd
FROM vecs a JOIN vecs b ON a.source < b.source"""
  }

  /** Mirror of [[TextAnalysis.vocabRichness]] (q217): the same two
    * exact-LONG rollups and the same single-formula estimates with
    * the zero-doubleton CASE. */
  def vocabRichness: String =
    """WITH tc AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY source, term
), st AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v_obs,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM tc GROUP BY source
)
SELECT source, n_tokens, v_obs, n1, n2,
       CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS p_unseen,
       CAST(v_obs AS DOUBLE) +
         CASE WHEN n2 > 0
           THEN CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                / (2.0 * CAST(n2 AS DOUBLE))
           ELSE CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE) / 2.0
         END AS chao1
FROM st"""

  /** Mirror of [[TextAnalysis.luhnCardScrub]] (q211) over the
    * [[TextAnalysis.withSyntheticCards]] corpus: same Knuth-mix
    * planted digits, same maximal-run + length-16 candidates, the
    * identical 16-step Luhn integer chain, and the same
    * boundary-anchored double-pass regexp_replace fold over
    * validated runs (`(^|[^0-9])run([^0-9]|$)` — only occurrences
    * that are maximal digit runs are redacted; see the operator
    * scaladoc for why the pass runs twice). */
  def luhnCardScrub: String = {
    import graft.operators.Sampling.HashMult
    val luhn =
      """list_reduce(list_prepend(0, list_transform(range(1, 17), i ->
        |  CASE WHEN (17 - i) % 2 = 0 THEN
        |    CASE WHEN CAST(substring(r, i, 1) AS INT) * 2 > 9
        |      THEN CAST(substring(r, i, 1) AS INT) * 2 - 9
        |      ELSE CAST(substring(r, i, 1) AS INT) * 2 END
        |  ELSE CAST(substring(r, i, 1) AS INT) END)),
        |  (a, b) -> a + b) % 10 = 0""".stripMargin
    s"""WITH synth AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0 THEN ' card ' ||
           lpad(CAST(((doc_id % 2147483648) * $HashMult) % 100000000
                  AS VARCHAR),
                8, '0') ||
           lpad(CAST((doc_id * 97) % 100000000 AS VARCHAR), 8, '0')
         ELSE '' END AS text
  FROM documents
), c AS (
  SELECT doc_id, text,
         list_filter(regexp_extract_all(text, '[0-9]+'),
           r -> len(r) = 16) AS cands
  FROM synth
), v AS (
  SELECT doc_id, text, cands,
         list_filter(cands, r -> $luhn) AS valid
  FROM c
)
SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
       CAST(len(valid) AS BIGINT) AS n_valid,
       list_reduce(list_prepend(text, valid),
         (acc, r) -> regexp_replace(
           regexp_replace(acc, '(^|[^0-9])' || r || '([^0-9]|${"$"})',
             '\\1<CARD>\\2', 'g'),
           '(^|[^0-9])' || r || '([^0-9]|${"$"})',
           '\\1<CARD>\\2', 'g')) AS clean_text
FROM v"""
  }

  /** Mirror of [[TextAnalysis.codeSwitchAudit]] (q207): the same
    * paragraph split, per-paragraph stopword-profile guess CASE, and
    * (cnt DESC, lang ASC) modal pick. */
  def codeSwitchAudit: String = {
    import graft.operators.Dedup.{ParaWords => P}
    val scoreOf = TextAnalysis.langProfiles.map { case (code, words) =>
      val lst = sqlList(words).replace("(", "[").replace(")", "]")
      code -> (s"(CAST(len(list_filter(pw, t -> " +
        s"list_contains($lst, t))) AS DOUBLE) / len(pw))")
    }.toMap
    val codes = TextAnalysis.langProfiles.map(_._1)
    val guess = codes.init.zipWithIndex.map { case (code, i) =>
      val cond = codes.drop(i + 1)
        .map(c => s"${scoreOf(code)} >= ${scoreOf(c)}").mkString(" AND ")
      s"WHEN $cond THEN '$code'"
    }.mkString("CASE ", " ", s" ELSE '${codes.last}' END")
    s"""WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id, w, (len(w) + ${P - 1}) // $P AS n_paras FROM b
), p AS (
  SELECT doc_id,
         string_split(array_to_string(
           list_slice(w, $P * i + 1, $P * i + $P), ' '), ' ') AS pw
  FROM base, LATERAL (SELECT unnest(range(0, n_paras)) AS i) t
), votes AS (
  SELECT doc_id, ($guess) AS plang, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM p GROUP BY doc_id, ($guess)
), modal AS (
  SELECT doc_id, plang AS modal_lang, cnt AS n_modal
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY doc_id
    ORDER BY cnt DESC, plang ASC) = 1
), tot AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_paras
  FROM votes GROUP BY doc_id
)
SELECT m.doc_id, t.n_paras, m.modal_lang, m.n_modal,
       t.n_paras - m.n_modal AS n_other,
       t.n_paras - m.n_modal > 0 AS is_mixed
FROM modal m JOIN tot t USING (doc_id)"""
  }

  /** Mirror of [[TextAnalysis.simhashDups]]:
    * [[TextAnalysis.SimHashBits]]-bit SimHash (60),
    * [[TextAnalysis.SimBands]]×[[TextAnalysis.BandBits]]-bit bands
    * (4×15), exact popcount cut at [[TextAnalysis.HammingMax]]. */
  def simhashDups: String = {
    val simTerms = (0 until TextAnalysis.SimHashBits).map { b =>
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(hs, x -> ((x >> $b) % 2) * 2 - 1)), " +
        s"(a, b) -> a + b) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" +\n      ")
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), h AS (
  SELECT doc_id,
         list_transform(w, t -> ${digest60Sql("t")}) AS hs
  FROM d
), sim AS (
  SELECT doc_id,
    $simTerms AS simhash
  FROM h
), bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (${TextAnalysis.BandBits} * band)) % ${1 << TextAnalysis.BandBits} AS key
  FROM sim, (SELECT unnest(range(${TextAnalysis.SimBands})) AS band)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3
)
SELECT * FROM pairs WHERE hamming <= ${TextAnalysis.HammingMax}"""
  }

  import graft.operators.SimilarityParams

  /** Sequential left-fold double sum — the DuckDB twin of
    * Similarity.fsum (summation order must match for bit-exact
    * doubles). */
  private def fsumSql(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (a, b) -> a + b)"

  private def embCtes: String =
    s"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(${fsumSql("list_transform(v, x -> x * x)")}) AS nrm
  FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn
  FROM n WHERE vec_id < ${SimilarityParams.NumQueryVectors}
)"""

  private def dotSql(a: String, b: String): String =
    fsumSql(s"list_transform(range(1, ${SimilarityParams.Dim + 1}), " +
      s"i -> $a[i] * $b[i])")

  /** Mirror of [[graft.operators.Similarity.bruteForceTopK]]. */
  def annBruteForce: String =
    s"""$embCtes
, p AS (
  SELECT query_id, vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM q, n
  WHERE vec_id <> query_id
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= ${SimilarityParams.TopK}"""

  /** Mirror of [[graft.operators.Similarity.lshTopK]] — identical
    * hyperplane matrix ([[SimilarityParams.planes]]) and banding. */
  def annLsh: String = annLshProbed(0)

  /** Multi-probe variant (q45): identical pipeline, but each query
    * band additionally probes every key within Hamming distance ≤
    * `multiProbe` of its own — the query-side-only recall knob
    * ([[graft.operators.Similarity.lshCandidates]]); the corpus CTE
    * is untouched. */
  def annLshMultiProbe: String = annLshProbed(1)

  /** SQL for one top-k-banding LSH band key of `vcol` (band `j`) —
    * the DuckDB twin of [[Similarity.bandKeysArray]]'s element `j`:
    * same hyperplanes, same sign rule, same bit packing. */
  private def lshKeyExpr(vcol: String, j: Int): String = {
    import SimilarityParams._
    (0 until BitsPerBand).map { t =>
      val p = planes(j * BitsPerBand + t)
      val lst = p.mkString("[", ", ", "]")
      s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
    }.mkString("(", " + ", ")")
  }

  /** UNION ALL over all top-k bands of `src`: (id cols, vcol, band,
    * key) — the banding CTE body shared by the LSH ranking oracles. */
  private def lshBandCte(src: String, id: String, vcol: String): String =
    (0 until SimilarityParams.NumBands).map { j =>
      s"SELECT $id, $vcol, $j AS band, ${lshKeyExpr(vcol, j)} AS key FROM $src"
    }.mkString("\n  UNION ALL\n  ")

  private def annLshProbed(multiProbe: Int): String = {
    import SimilarityParams._
    def bandCte(src: String, id: String, vcol: String): String =
      lshBandCte(src, id, vcol)
    // same flip-mask set as the Spark side: all masks of ≤ multiProbe
    // bits over the band width
    val flips = (0 until (1 << BitsPerBand))
      .filter(m => Integer.bitCount(m) <= multiProbe)
    val probeCte =
      if (multiProbe <= 0) ""
      else s""", qbp AS (
  SELECT query_id, qv, qn, band, xor(key, m) AS key
  FROM qb, (SELECT unnest(${flips.mkString("[", ", ", "]")}) AS m)
)"""
    val qSrc = if (multiProbe <= 0) "qb" else "qbp"
    s"""$embCtes
, qb AS (
  ${bandCte("q", "query_id, qn", "qv")}
), cb AS (
  ${bandCte("n", "vec_id, nrm", "v")}
)$probeCte, cand AS (
  SELECT query_id, qv, qn, vec_id, v, nrm
  FROM $qSrc JOIN cb USING (band, key)
  WHERE vec_id <> query_id
  GROUP BY ALL
), p AS (
  SELECT query_id, vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM cand
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.retrievalMetrics]] over
    * the graded pair (run = LSH top-k, ideal = brute-force top-k):
    * the two ranking oracles nest as derived tables, and every metric
    * is a single division of exact integers (recall = hits/|ideal|,
    * rr = 1/first-relevant-rank) — order-independent, so no float
    * summation concerns. */
  def retrievalMetrics: String =
    s"""WITH runq AS (
  SELECT query_id, neighbor_id, rank FROM (
$annLsh
  )
), idealq AS (
  SELECT query_id, neighbor_id, rank FROM (
$annBruteForce
  )
), hits AS (
  SELECT r.query_id,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         MIN(r.rank) AS first_hit
  FROM runq r JOIN idealq i
    ON r.query_id = i.query_id AND r.neighbor_id = i.neighbor_id
  GROUP BY r.query_id
), perq AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ideal
  FROM idealq GROUP BY query_id
)
SELECT p.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
         / CAST(p.n_ideal AS DOUBLE) AS recall,
       COALESCE(1.0 / CAST(h.first_hit AS DOUBLE), 0.0) AS rr
FROM perq p LEFT JOIN hits h ON p.query_id = h.query_id"""

  /** Mirror of [[graft.operators.Similarity.ndcgMetrics]] over the
    * graded (LSH run, brute ideal) pair — the gain expression is the
    * identical 1/(ln(r+1)/ln 2) float tree; the ≤ k-term per-query
    * sums are unordered in both engines, absorbed by the checker's
    * 9-significant-digit canonicalization. */
  def ndcgMetrics: String = {
    def gain(c: String) = s"1.0 / (ln(CAST($c AS DOUBLE) + 1.0) / ln(2.0))"
    s"""WITH runq AS (
  SELECT query_id, neighbor_id, rank FROM (
$annLsh
  )
), idealq AS (
  SELECT query_id, neighbor_id, rank FROM (
$annBruteForce
  )
), dcg AS (
  SELECT r.query_id, SUM(${gain("r.rank")}) AS dcg
  FROM runq r JOIN idealq i
    ON r.query_id = i.query_id AND r.neighbor_id = i.neighbor_id
  GROUP BY r.query_id
), idcg AS (
  SELECT query_id, SUM(${gain("rank")}) AS idcg
  FROM idealq GROUP BY query_id
)
SELECT i.query_id, COALESCE(d.dcg, 0.0) AS dcg, i.idcg,
       COALESCE(d.dcg, 0.0) / i.idcg AS ndcg
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id"""
  }

  /** The k-means cell CTE chain shared by [[annIvf]] and
    * [[semDedup]]: Lloyd training unrolled to
    * [[Similarity.KMeansIters]] iteration CTEs over the deterministic
    * sample, then nearest-cell corpus assignment (`corpus_cells`:
    * vec_id → cell). Bit-exactness with the driver-side trainer
    * ([[Similarity.trainCentroids]]): dot products/norms are the same
    * sequential 0.0-seeded folds, cell means fold members in
    * ascending vec_id order (`list(v ORDER BY vec_id)`) and divide by
    * the count, assignment ties break to the lowest centroid id, and
    * an emptied cell keeps its previous centroid (LEFT JOIN +
    * NULL-guarded CASE). */
  private def ivfCellCtes: String = {
    import graft.operators.Similarity.{KMeansIters, NumCentroids, TrainSample}
    import SimilarityParams.Dim
    val meanExpr =
      s"list_transform(range(1, ${Dim + 1}), i -> " +
        s"list_reduce(list_prepend(0.0, list_transform(g.vs, w -> w[i])), " +
        s"(a, b) -> a + b) / CAST(g.cnt AS DOUBLE))"
    def normExpr(cv: String) =
      s"sqrt(${fsumSql(s"list_transform($cv, x -> x * x)")})"
    val lloyd = (1 to KMeansIters).map { k =>
      s""", a$k AS (
  SELECT s.vec_id, s.v, s.nrm, c.centroid_id,
         row_number() OVER (PARTITION BY s.vec_id ORDER BY
           ${dotSql("s.v", "c.cv")} / (s.nrm * c.cnorm) DESC,
           c.centroid_id ASC) AS rnk
  FROM samp s, c${k - 1} c
), g$k AS (
  SELECT centroid_id, list(v ORDER BY vec_id) AS vs, COUNT(*) AS cnt
  FROM a$k WHERE rnk = 1 GROUP BY centroid_id
), cm$k AS (
  SELECT p.centroid_id,
         CASE WHEN g.cnt IS NULL THEN p.cv ELSE $meanExpr END AS cv
  FROM c${k - 1} p LEFT JOIN g$k g USING (centroid_id)
), c$k AS (
  SELECT centroid_id, cv, ${normExpr("cv")} AS cnorm FROM cm$k
)"""
    }.mkString
    s"""$embCtes
, samp AS (
  SELECT vec_id, v, nrm FROM n WHERE vec_id < $TrainSample
), c0 AS (
  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnorm
  FROM n WHERE vec_id < $NumCentroids
)$lloyd
, cents AS (
  SELECT centroid_id, cv, cnorm FROM c$KMeansIters
), corpus_assign AS (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY
           ${dotSql("v", "cv")} / (nrm * cnorm) DESC,
           centroid_id ASC) AS c_rank
  FROM n, cents
), corpus_cells AS (
  SELECT vec_id, centroid_id AS cell FROM corpus_assign WHERE c_rank = 1
)"""
  }

  /** Mirror of [[graft.operators.Similarity.ivfTopK]] — the shared
    * [[ivfCellCtes]] cell chain, then NProbe query probing and exact
    * cosine over the probed cells only. */
  def annIvf: String = {
    import graft.operators.Similarity.NProbe
    import SimilarityParams.TopK
    s"""$ivfCellCtes
, query_assign AS (
  SELECT query_id, centroid_id,
         row_number() OVER (PARTITION BY query_id ORDER BY
           ${dotSql("qv", "cv")} / (qn * cnorm) DESC,
           centroid_id ASC) AS c_rank
  FROM q, cents
), query_cells AS (
  SELECT query_id, centroid_id AS cell FROM query_assign
  WHERE c_rank <= $NProbe
), cand AS (
  SELECT query_id, vec_id
  FROM query_cells JOIN corpus_cells USING (cell)
  WHERE vec_id <> query_id
  GROUP BY 1, 2
), p AS (
  SELECT query_id, vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM cand JOIN q USING (query_id) JOIN n USING (vec_id)
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.semDedup]] — the shared
    * [[ivfCellCtes]] cell chain, within-cell lower-id pairwise
    * cosine (identical dot/norm folds), MAX per victim (order-free
    * over identical doubles), keep iff no lower-id cell-mate above
    * the threshold. */
  def semDedup: String = {
    import graft.operators.Similarity.NearDupCosine
    s"""$ivfCellCtes
, wc AS (
  SELECT n.vec_id, n.v, n.nrm, c.cell
  FROM n JOIN corpus_cells c USING (vec_id)
), p AS (
  SELECT b.vec_id AS vec_id,
         ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
  FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id < b.vec_id
), m AS (
  SELECT vec_id, MAX(cos) AS max_lower_cos FROM p GROUP BY vec_id
)
SELECT w.vec_id, w.cell,
       COALESCE(m.max_lower_cos, -2.0) AS max_lower_cos,
       COALESCE(m.max_lower_cos, -2.0) <= $NearDupCosine AS kept
FROM wc w LEFT JOIN m USING (vec_id)"""
  }

  /** Mirror of [[graft.operators.Similarity.ivfCorpusCells]] (q103):
    * the shared [[ivfCellCtes]] chain projected to the corpus→cell
    * assignment. Since round 9 the Spark side trains the codebook
    * with the DISTRIBUTED minibatch trainer
    * ([[graft.operators.Similarity.trainCentroidsDistributed]]) —
    * bit-identical to the driver Lloyd twin this CTE chain unrolls
    * (assignment rule, ascending-vec_id member folds, emptied-cell
    * carry; SimilaritySpec pins the equality), so ONE mirror grades
    * both trainers and the distributed path is what q20/q93/q103 all
    * run. */
  def ivfCells: String =
    s"""$ivfCellCtes
SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM corpus_cells"""

  /** Mirror of [[graft.operators.Pipeline.mergeApplyDerived]] (q171)
    * — the adversarial CLOSURE oracle: the merge of v1 with the
    * v1→v2 CDC batch must reproduce v2 exactly, so the oracle
    * rebuilds v2 directly from the documents table. Any drift in the
    * Spark side's diff classification, CDC translation, bucket
    * routing, cold-bucket passthrough, or merge arithmetic breaks
    * the row hash against this direct derivation. */
  def mergeApply: String = {
    import graft.operators.Pipeline.{DiffChangedMod, DiffRemovedMod,
      MergeBuckets}
    s"""SELECT doc_id, doc_id % $MergeBuckets AS bucket,
       CASE WHEN doc_id % 10 = $DiffChangedMod THEN text || ' v2'
            ELSE text END AS text
FROM documents WHERE doc_id % 10 <> $DiffRemovedMod"""
  }

  /** Mirror of [[graft.operators.Dedup.setSimJoin]] (q192): same
    * shingle-hash CTEs as q137's mirror, same
    * rarity order (df ASC, tok ASC), same prefix bound
    * rn ≤ sz − ceil(τ·sz) + 1 (identical IEEE τ·sz in both engines),
    * same length filter and candidate-bounded verify join; jaccard
    * repeats the operator's literal expression order. */
  def setSimJoin: String = setSimJoinSql(dfCap = None)

  /** Mirror of [[graft.operators.Dedup.setSimJoinCapped]] (q227):
    * the q192 pipeline with the prefix additionally filtered to
    * df ≤ [[graft.operators.Dedup.SetJoinDfCap]] — the oracle
    * carries the cap so the gate grades the capped CONTRACT, and
    * would catch the day a natural corpus crosses it. */
  def setSimJoinCapped: String =
    setSimJoinSql(dfCap = Some(graft.operators.Dedup.SetJoinDfCap))

  private def setSimJoinSql(dfCap: Option[Long]): String = {
    val tau = graft.operators.Dedup.SetJoinTau
    val capPred = dfCap.map(c => s" AND d.df <= $c").getOrElse("")
    s"""$shingleCtes
, toks AS MATERIALIZED (
  SELECT doc_id, unnest(hashes) AS tok FROM h
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok
), ranked AS (
  SELECT t.doc_id, t.tok, d.df,
         row_number() OVER (PARTITION BY t.doc_id
           ORDER BY d.df ASC, t.tok ASC) AS rn,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS sz
  FROM toks t JOIN dfreq d USING (tok)
), prefix AS (
  SELECT doc_id, tok, sz FROM ranked d
  WHERE rn <= sz - ceil($tau * sz) + 1$capPred
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sz AS sz_a, b.sz AS sz_b
  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
  WHERE least(a.sz, b.sz) >= $tau * greatest(a.sz, b.sz)
), i AS (
  SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b, COUNT(*) AS inter
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b, c.sz_a, c.sz_b
)
SELECT doc_a, doc_b, inter,
       CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
FROM i
WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= $tau"""
  }

  /** Mirror of [[graft.operators.Pipeline.timeTravelDerived]] (q188)
    * — the q171 closure discipline extended one version deeper: the
    * as-of-2 reconstruction from v1 + the two-batch CDC log must
    * reproduce v3 exactly, so the oracle rebuilds v3 directly from
    * the documents table. Any drift in the latest-op-per-key window,
    * the cross-version interactions (changed-then-deleted,
    * added-then-changed), or the CDC derivation breaks the hash. */
  def timeTravel: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffChangedMod,
      DiffRemovedMod}
    s"""SELECT doc_id,
       CASE WHEN doc_id % 10 = $DiffAddedMod THEN text || ' v3'
            ELSE text END AS text
FROM documents
WHERE doc_id % 10 <> $DiffRemovedMod AND doc_id % 10 <> $DiffChangedMod"""
  }

  /** Mirror of [[graft.operators.Pipeline.spanCorrupt]] (q238):
    * identical aligned-block mask arithmetic, ordinal fold, sentinel
    * concatenation; DuckDB's NULL from array_to_string on the empty
    * targets list coalesced to Spark's ''. */
  def spanCorrupt: String = {
    import graft.operators.Sampling.HashMult
    import graft.operators.Pipeline.{CorruptBlock, CorruptDen}
    val mask = s"(((((doc_id & 2147483647) * 97 + b) & 2147483647) * $HashMult) " +
      s"// 1048576) % $CorruptDen = 0"
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), c AS (
  SELECT doc_id, w,
         CAST(ceil(len(w) / $CorruptBlock.0) AS INT) AS nb
  FROM d
), f AS (
  SELECT doc_id, w, nb,
         list_transform(range(0, nb), b -> $mask) AS flags
  FROM c
), o AS (
  SELECT doc_id, w, nb, flags,
         list_transform(range(0, nb), b ->
           len(list_filter(list_slice(flags, 1, b), x -> x))) AS ord
  FROM f
)
SELECT doc_id,
  COALESCE(array_to_string(list_transform(range(0, nb), b ->
    CASE WHEN flags[b + 1]
         THEN '<extra_id_' || CAST(ord[b + 1] AS VARCHAR) || '>'
         ELSE COALESCE(array_to_string(list_slice(w,
           b * $CorruptBlock + 1, b * $CorruptBlock + $CorruptBlock),
           ' '), '') END), ' '), '') AS input_text,
  COALESCE(array_to_string(list_transform(
    list_filter(range(0, nb), b -> flags[b + 1]), b ->
    '<extra_id_' || CAST(ord[b + 1] AS VARCHAR) || '> ' ||
    COALESCE(array_to_string(list_slice(w, b * $CorruptBlock + 1,
      b * $CorruptBlock + $CorruptBlock), ' '), '')), ' '), '')
    AS targets_text,
  CAST(len(list_filter(flags, x -> x)) AS BIGINT) AS n_masked_blocks
FROM o"""
  }

  /** Mirror of [[graft.operators.Pipeline.fimTransform]] (q234):
    * the same masked Knuth-mix selection and cut points, LEAST/
    * GREATEST ordering, 1-based inclusive slices, and the PSM
    * sentinel concatenation. */
  def fimTransform: String = {
    import graft.operators.Sampling.HashMult
    import graft.operators.Pipeline.{FimPrefixTok, FimSuffixTok,
      FimMiddleTok}
    s"""WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT doc_id, text, w, n,
         ((doc_id & 2147483647) * $HashMult) // 1048576 AS mixA,
         ((((doc_id & 2147483647) * 31 + 7) & 2147483647) * $HashMult) // 1048576
           AS mixB
  FROM d
), s AS (
  SELECT doc_id, text, w, n,
         mixA % 2 = 0 AND n >= 3 AS fim,
         LEAST(mixA % (n + 1), mixB % (n + 1)) AS a,
         GREATEST(mixA % (n + 1), mixB % (n + 1)) AS b
  FROM c
)
SELECT doc_id, fim,
       CASE WHEN fim THEN a ELSE n END AS n_prefix,
       CASE WHEN fim THEN b - a ELSE CAST(0 AS BIGINT) END AS n_middle,
       CASE WHEN fim THEN n - b ELSE CAST(0 AS BIGINT) END AS n_suffix,
       CASE WHEN fim THEN
         '$FimPrefixTok ' ||
         COALESCE(array_to_string(list_slice(w, 1, a), ' '), '') ||
         ' $FimSuffixTok ' ||
         COALESCE(array_to_string(list_slice(w, b + 1, n), ' '), '') ||
         ' $FimMiddleTok ' ||
         COALESCE(array_to_string(list_slice(w, a + 1, b), ' '), '')
       ELSE text END AS text
FROM s"""
  }

  /** Mirror of [[graft.operators.Pipeline.schemaEvolutionDerived]]
    * (q224): the q188 closure extended across the add-column
    * boundary — the final frame rebuilt directly from the documents
    * arithmetic, where ONLY the added-then-changed class (last
    * upserted at version 2, the commit that added `lang`) carries
    * the tag and every pre-boundary row reads the NULL add-default. */
  def schemaEvolution: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffChangedMod,
      DiffRemovedMod}
    s"""SELECT doc_id,
       CASE WHEN doc_id % 10 = $DiffAddedMod THEN text || ' v3'
            ELSE text END AS text,
       CASE WHEN doc_id % 10 = $DiffAddedMod THEN
              CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END
            ELSE CAST(NULL AS VARCHAR) END AS lang
FROM documents
WHERE doc_id % 10 <> $DiffRemovedMod AND doc_id % 10 <> $DiffChangedMod"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.logRegQualityFilter]]
    * (q231): the full-batch GD recurrence unrolled as
    * [[graft.operators.TextAnalysis.LogRegIters]] weight CTE pairs —
    * each gradient a 5-LONG exact sum over the quantized per-doc
    * contributions (floor(g·2^20 + 0.5)), each weight update the
    * identical fixed-order double chain — then the corpus scored by
    * the final margin. Every arithmetic step mirrors the Spark
    * operator's association order, so weights and margins are
    * bit-identical. */
  def logRegQuality: String = {
    val wf = s"w${TextAnalysis.LogRegIters}"
    s"""$logRegCtes
SELECT f.doc_id, f.y, ${logRegMarginSql(wf)} AS margin,
       ${logRegMarginSql(wf)} >= 0.0 AS keep
FROM f, $wf"""
  }

  /** Mirror of
    * [[graft.operators.TextAnalysis.gradientInfluenceTopK]] (q232):
    * the q231 training CTEs, then the reference gradient as the same
    * exact-long quantized sums over the curated slice, then the
    * factored alignment score (p−y)·⟨ĝ, x⟩ ranked (influence DESC,
    * doc_id ASC) top-k. */
  def gradientInfluence: String = {
    import graft.operators.TextAnalysis.{LogRegIters, InfluenceTopK,
      InfluenceRefSource}
    val wf = s"w$LogRegIters"
    val score = s"(1.0 / (1.0 + exp(-(${logRegMarginSql(wf)}))) - y)" +
      s" * (gv.hb + gv.h1 * f1 + gv.h2 * f2 + gv.h3 * f3 + " +
      "gv.h4 * f4)"
    s"""$logRegCtes
, gref AS MATERIALIZED (
  SELECT COUNT(*) AS m,
         ${logRegGradSql(wf, "1.0")} AS gb,
         ${logRegGradSql(wf, "f1")} AS g1,
         ${logRegGradSql(wf, "f2")} AS g2,
         ${logRegGradSql(wf, "f3")} AS g3,
         ${logRegGradSql(wf, "f4")} AS g4
  FROM f, $wf
  WHERE f.source = '$InfluenceRefSource'
), gv AS (
  SELECT (CAST(gb AS DOUBLE) / 1048576.0) / m AS hb,
         (CAST(g1 AS DOUBLE) / 1048576.0) / m AS h1,
         (CAST(g2 AS DOUBLE) / 1048576.0) / m AS h2,
         (CAST(g3 AS DOUBLE) / 1048576.0) / m AS h3,
         (CAST(g4 AS DOUBLE) / 1048576.0) / m AS h4
  FROM gref
), scored AS (
  SELECT f.doc_id, $score AS influence
  FROM f, $wf, gv
)
SELECT doc_id, influence, rank FROM (
  SELECT doc_id, influence,
         CAST(row_number() OVER (ORDER BY influence DESC, doc_id ASC)
           AS BIGINT) AS rank
  FROM scored)
WHERE rank <= $InfluenceTopK"""
  }

  private def logRegMarginSql(w: String) =
    s"$w.b + $w.w1 * f1 + $w.w2 * f2 + $w.w3 * f3 + $w.w4 * f4"

  private def logRegGradSql(w: String, x: String) =
    s"SUM(CAST(floor((1.0 / (1.0 + exp(-(${logRegMarginSql(w)}))) " +
      s"- y) * $x * 1048576.0 + 0.5) AS BIGINT))"

  /** The q231/q232 shared prefix: feature CTEs + the unrolled GD
    * weight recurrence. */
  private def logRegCtes: String = {
    import graft.operators.TextAnalysis.{LogRegIters, LogRegLr}
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    val iters = (1 to LogRegIters).map { t =>
      val wp = s"w${t - 1}"
      s""", g$t AS MATERIALIZED (
  SELECT COUNT(*) AS n,
         ${logRegGradSql(wp, "1.0")} AS gb,
         ${logRegGradSql(wp, "f1")} AS g1,
         ${logRegGradSql(wp, "f2")} AS g2,
         ${logRegGradSql(wp, "f3")} AS g3,
         ${logRegGradSql(wp, "f4")} AS g4
  FROM f, $wp
), w$t AS (
  SELECT
    $wp.b - $LogRegLr * ((CAST(g.gb AS DOUBLE) / 1048576.0) / g.n) AS b,
    $wp.w1 - $LogRegLr * ((CAST(g.g1 AS DOUBLE) / 1048576.0) / g.n) AS w1,
    $wp.w2 - $LogRegLr * ((CAST(g.g2 AS DOUBLE) / 1048576.0) / g.n) AS w2,
    $wp.w3 - $LogRegLr * ((CAST(g.g3 AS DOUBLE) / 1048576.0) / g.n) AS w3,
    $wp.w4 - $LogRegLr * ((CAST(g.g4 AS DOUBLE) / 1048576.0) / g.n) AS w4
  FROM $wp, g$t g
)"""
    }.mkString
    s"""WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id, source,
    len(w) AS n_tokens,
    len(list_distinct(w)) AS n_distinct,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(w, t -> CAST(length(t) AS BIGINT))),
      (a, b) -> a + b) AS sum_token_chars,
    len(list_filter(w, t -> list_contains($stops, t))) AS n_stop
  FROM d
), f AS MATERIALIZED (
  SELECT doc_id, source,
    CASE WHEN n_tokens >= 16 AND n_stop * 8 >= n_tokens
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
    LEAST(CAST(n_tokens AS DOUBLE) / 256.0, 1.0) AS f1,
    CAST(sum_token_chars AS DOUBLE) / n_tokens / 8.0 AS f2,
    CAST(n_stop AS DOUBLE) / n_tokens AS f3,
    CAST(n_distinct AS DOUBLE) / n_tokens AS f4
  FROM base
), w0 AS (
  SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4
)$iters"""
  }

  /** Mirror of the STREAMING schema-evolution merge (q230,
    * [[graft.operators.Pipeline.mergeApplyTableEvolved]]): the q224
    * closure — the maintained table after both schema epochs must be
    * the evolved v3 — plus the merge's bucket column. */
  def schemaEvolutionMerge: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffChangedMod,
      DiffRemovedMod, MergeBuckets}
    s"""SELECT doc_id, doc_id % $MergeBuckets AS bucket,
       CASE WHEN doc_id % 10 = $DiffAddedMod THEN text || ' v3'
            ELSE text END AS text,
       CASE WHEN doc_id % 10 = $DiffAddedMod THEN
              CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END
            ELSE CAST(NULL AS VARCHAR) END AS lang
FROM documents
WHERE doc_id % 10 <> $DiffRemovedMod AND doc_id % 10 <> $DiffChangedMod"""
  }

  /** Mirror of the q245 respec closure
    * ([[graft.operators.Pipeline.mergeApplyTableRespec]]): content
    * is v3 (the q171/q188 closure discipline); a row's physical
    * home follows the lazy-migration rule — batch 2's keys are the
    * docs whose v2/v3 rows differ (ChangedMod deletes, AddedMod
    * upserts), the spec-0 buckets THOSE keys live in migrate WHOLE
    * (co-resident rows ride the copy-on-write rewrite into spec 1 at
    * doc_id % 8), every other row stays in its spec-0 bucket. */
  def partitionEvolution: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffChangedMod,
      DiffRemovedMod, RespecBuckets}
    val b0 = RespecBuckets(0)
    val b1 = RespecBuckets(1)
    s"""WITH t0 AS (
  SELECT DISTINCT doc_id % $b0 AS b FROM documents
  WHERE doc_id % 10 = $DiffChangedMod OR doc_id % 10 = $DiffAddedMod
), v3 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = $DiffAddedMod THEN text || ' v3'
              ELSE text END AS text
  FROM documents
  WHERE doc_id % 10 <> $DiffRemovedMod
    AND doc_id % 10 <> $DiffChangedMod
)
SELECT doc_id,
       CAST(CASE WHEN doc_id % $b0 IN (SELECT b FROM t0)
                 THEN 1 ELSE 0 END AS BIGINT) AS spec,
       CAST(CASE WHEN doc_id % $b0 IN (SELECT b FROM t0)
                 THEN doc_id % $b1 ELSE doc_id % $b0 END AS BIGINT)
         AS bucket,
       text
FROM v3"""
  }

  /** Mirror of [[graft.operators.Pipeline.vacuumDerived]] (q215):
    * checkpoint = v2 rebuilt directly from the documents arithmetic
    * (version 0, op 'base'), retained tail = the v2→v3 CDC rows
    * (ChangedMod deletes, AddedMod upserts with the v3 text) —
    * the q171/q188 closure discipline. */
  def vacuumCompact: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffChangedMod,
      DiffRemovedMod}
    s"""SELECT CAST(0 AS BIGINT) AS version, doc_id,
       'base' AS op,
       md5(CASE WHEN doc_id % 10 = $DiffChangedMod
            THEN text || ' v2' ELSE text END) AS content
FROM documents WHERE doc_id % 10 <> $DiffRemovedMod
UNION ALL
SELECT CAST(2 AS BIGINT) AS version, doc_id, 'delete' AS op,
       md5('') AS content
FROM documents WHERE doc_id % 10 = $DiffChangedMod
UNION ALL
SELECT CAST(2 AS BIGINT) AS version, doc_id, 'upsert' AS op,
       md5(text || ' v3') AS content
FROM documents WHERE doc_id % 10 = $DiffAddedMod"""
  }

  /** Mirror of [[graft.operators.Layout.ringPlacement]] (q190): the
    * ring tables are the SAME Scala-computed literals both engines
    * inline ([[graft.operators.Layout.ringPoints]]); only the
    * per-key hash and the successor probe (first point ≥ h, wrap to
    * the ring head) run in-engine. both engines return 0 on no
    * match, and the wrap folds it to index 1 (NULLIF on the DuckDB
    * side, since list[0] is NULL there rather than an error). */
  def ringPlacement: String = {
    import graft.operators.Layout.{RingVnodes, ShardsAfter, ShardsBefore}
    val K = graft.operators.Sampling.HashMult
    def arrs(k: Int): (String, String) = {
      val pts = graft.operators.Layout.ringPoints(k, RingVnodes)
      (pts.map(_._1).mkString("[", ", ", "]"),
        pts.map(_._2).mkString("[", ", ", "]"))
    }
    val (ptsA, shA) = arrs(ShardsBefore)
    val (ptsB, shB) = arrs(ShardsAfter)
    s"""WITH k AS (
  SELECT doc_id,
         (((doc_id % 1048576) * $K) // 1048576) % 1048576 AS h
  FROM documents
), a AS (
  SELECT doc_id, h,
         CAST(($shA)[COALESCE(NULLIF(list_position(
           list_transform($ptsA, p -> p >= h), true), 0), 1)] AS BIGINT)
           AS ring_a,
         CAST(($shB)[COALESCE(NULLIF(list_position(
           list_transform($ptsB, p -> p >= h), true), 0), 1)] AS BIGINT)
           AS ring_b
  FROM k
)
SELECT doc_id, h, ring_a, ring_b, ring_a <> ring_b AS moved FROM a"""
  }

  /** Mirror of [[graft.operators.Layout.shardPlacement]] (q174):
    * identical double-Knuth rendezvous weights (overflow-safe BIGINT
    * arithmetic), first-max shard pick via list_position, modulo
    * contrast columns. */
  def shardPlacement: String = {
    import graft.operators.Layout.{ShardsBefore, ShardsAfter}
    val K = graft.operators.Sampling.HashMult
    def w(s: Int): String =
      s"(((((((doc_id % 1048576) * $K) // 1048576) % 1048576) + " +
        s"${s * 31 + 1}) * $K) // 1048576) % 1048576"
    def hs(k: Int): String =
      (0 until k).map(w).mkString("[", ", ", "]")
    s"""WITH p AS (
  SELECT doc_id, ${hs(ShardsBefore)} AS h16, ${hs(ShardsAfter)} AS h17
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(list_position(h16, list_aggregate(h16, 'max')) - 1
           AS BIGINT) AS shard_a,
         CAST(list_position(h17, list_aggregate(h17, 'max')) - 1
           AS BIGINT) AS shard_b,
         doc_id % $ShardsBefore AS mod_a,
         doc_id % $ShardsAfter AS mod_b
  FROM p
)
SELECT doc_id, shard_a, shard_b, mod_a, mod_b,
       shard_a <> shard_b AS moved,
       mod_a <> mod_b AS mod_moved
FROM s"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.normalizedDedup]]
    * (q175): identical lowercase/strip/collapse normalization (the
    * regex classes are deliberately shared Java-regex/RE2 syntax;
    * DuckDB needs the explicit 'g' flag Spark implies), md5 digests,
    * min-id canonicals under both keys. */
  def normalizedDedup: String =
    s"""WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents
), h AS (
  SELECT doc_id, md5(text) AS raw_hash, md5(norm) AS norm_hash,
         text <> norm AS changed
  FROM n
)
SELECT doc_id, changed,
       doc_id <> MIN(doc_id) OVER (PARTITION BY raw_hash) AS dup_raw,
       doc_id <> MIN(doc_id) OVER (PARTITION BY norm_hash) AS dup_norm,
       (doc_id <> MIN(doc_id) OVER (PARTITION BY norm_hash)) AND NOT
         (doc_id <> MIN(doc_id) OVER (PARTITION BY raw_hash)) AS unlocked
FROM h"""

  /** Mirror of [[graft.operators.TextAnalysis.vocabCoverage]] (q176):
    * type counts, (cnt DESC, word ASC) rank, per-k conditional sums,
    * coverage as the same double division. */
  def vocabCoverage: String = {
    val ks = graft.operators.TextAnalysis.CoverageKs.mkString("[", ", ", "]")
    s"""WITH t AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0
  GROUP BY word
), r AS (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
  FROM t
), ks AS (
  SELECT CAST(unnest($ks) AS BIGINT) AS k
)
SELECT k,
       CAST(SUM(CASE WHEN rnk <= k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_types_kept,
       CAST(SUM(CASE WHEN rnk <= k THEN cnt ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN rnk <= k THEN cnt ELSE 0 END) AS DOUBLE) /
         CAST(SUM(cnt) AS DOUBLE) AS coverage
FROM r, ks GROUP BY k"""
  }

  /** Shared CTE prefix of the unigram-LM mirrors (q172/q173): the
    * trainable distinct-word vocabulary, the substring seed
    * inventory, its single-character coverage set, and the seed
    * model m0 (logp = round(ln(cnt/total), 9) — the pre-rounded
    * score grid both engines walk). */
  private def unigramBaseCtes: String = {
    import graft.operators.Unigram.{MaxPieceLen, MaxWordLen}
    s"""WITH w AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) >= 1 AND len(word) <= $MaxWordLen
  GROUP BY word
), seed AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT w.cnt AS cnt,
           unnest(flatten(list_transform(range(1, len(word) + 1),
             i -> list_transform(
               range(1, least($MaxPieceLen, len(word) - i + 1) + 1),
               l -> substr(word, i, l))))) AS piece
    FROM w)
  GROUP BY piece
), chars AS (
  SELECT piece FROM seed WHERE len(piece) = 1
), m0 AS MATERIALIZED (
  SELECT piece,
         round(ln(CAST(s.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)), 9)
           AS logp
  FROM seed s, (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM seed) t
)"""
  }

  /** One Viterbi-EM pass unrolled: DP positions 1..MaxWordLen (per
    * position, one branch per last-piece length joined against the
    * model; (score DESC, len ASC) rank = the kernel's strict-> /
    * shortest-last tie rule), then the backtrace walk emitting the
    * best path's pieces, then piece counts weighted by word count.
    * Produces `<tag>cnt(piece, cnt)` and `<tag>toks(word, n_toks)`. */
  private def unigramPassCtes(tag: String, m: String): String = {
    import graft.operators.Unigram.{MaxPieceLen, MaxWordLen}
    val dps = (1 to MaxWordLen).map { i =>
      val branches = (1 to math.min(MaxPieceLen, i)).map { l =>
        val j = i - l
        val scoreExpr = if (j == 0) "m.logp" else "d.score + m.logp"
        val dpJoin = if (j == 0) ""
        else s"\n    JOIN ${tag}dp$j d ON d.word = w.word"
        s"""    SELECT w.word, $scoreExpr AS score, $l AS len
    FROM w$dpJoin
    JOIN $m m ON m.piece = substr(w.word, ${j + 1}, $l)
    WHERE len(w.word) >= $i"""
      }.mkString("\n    UNION ALL\n")
      s""", ${tag}dp$i AS MATERIALIZED (
  SELECT word, score, len FROM (
    SELECT word, score, len,
           row_number() OVER (PARTITION BY word
             ORDER BY score DESC, len ASC) AS rnk
    FROM (
$branches)) WHERE rnk = 1
)"""
    }.mkString
    val dpall = (1 to MaxWordLen).map { i =>
      s"  SELECT word, $i AS pos, len FROM ${tag}dp$i"
    }.mkString("\n  UNION ALL\n")
    val bts = (1 to MaxWordLen).map { s =>
      s""", ${tag}bt$s AS (
  SELECT b.word, b.pos - d.len AS pos,
         substr(b.word, b.pos - d.len + 1, d.len) AS piece
  FROM ${tag}bt${s - 1} b
  JOIN ${tag}dpall d ON d.word = b.word AND d.pos = b.pos
  WHERE b.pos > 0
)"""
    }.mkString
    val pieceUnion = (1 to MaxWordLen).map { s =>
      s"    SELECT word, piece FROM ${tag}bt$s"
    }.mkString("\n    UNION ALL\n")
    s"""$dps
, ${tag}dpall AS MATERIALIZED (
$dpall
), ${tag}bt0 AS (
  SELECT word, len(word) AS pos FROM w
)$bts
, ${tag}pieces AS MATERIALIZED (
  SELECT word, piece FROM (
$pieceUnion)
), ${tag}cnt AS MATERIALIZED (
  SELECT p.piece, CAST(SUM(w.cnt) AS BIGINT) AS cnt
  FROM ${tag}pieces p JOIN w ON w.word = p.word
  GROUP BY p.piece
), ${tag}toks AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM ${tag}pieces GROUP BY word
)"""
  }

  /** Prune `<tag>cnt` to the vocabulary budget with the coverage
    * floor (single chars re-enter at count 1), then emit the model
    * `<mname>(piece, logp)` over the pruned vocabulary. */
  private def unigramVocabCtes(tag: String, mname: String): String = {
    import graft.operators.Unigram.VocabTarget
    s""", ${tag}kept AS (
  SELECT piece, cnt FROM (
    SELECT piece, cnt, row_number() OVER
             (ORDER BY cnt DESC, piece ASC) AS rnk
    FROM ${tag}cnt) WHERE rnk <= $VocabTarget
), ${tag}vocab AS MATERIALIZED (
  SELECT piece, cnt FROM ${tag}kept
  UNION ALL
  SELECT c.piece, COALESCE(t.cnt, CAST(1 AS BIGINT)) AS cnt
  FROM chars c LEFT JOIN ${tag}cnt t ON t.piece = c.piece
  WHERE c.piece NOT IN (SELECT piece FROM ${tag}kept)
), $mname AS MATERIALIZED (
  SELECT piece,
         round(ln(CAST(v.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)), 9)
           AS logp
  FROM ${tag}vocab v,
       (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM ${tag}vocab) t
)"""
  }

  /** Mirror of [[graft.operators.Unigram.modelTable]] (q172): seed →
    * Viterbi-E/M → prune → Viterbi-E/M → prune, final (piece, cnt,
    * logp). */
  def unigramModel: String =
    s"""$unigramBaseCtes${unigramPassCtes("v1", "m0")}${
      unigramVocabCtes("v1", "m1")}${unigramPassCtes("v2", "m1")}${
      unigramVocabCtes("v2", "mf")}
SELECT v.piece, v.cnt,
       round(ln(CAST(v.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)), 9)
         AS logp
FROM v2vocab v,
     (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v2vocab) t"""

  /** Mirror of [[graft.operators.Unigram.segmentCounts]] (q173): the
    * full training chain, one apply pass under the final model, then
    * per-document word/token counts with the per-character fallback
    * for words beyond the training length guard. */
  def unigramSegment: String =
    s"""$unigramBaseCtes${unigramPassCtes("v1", "m0")}${
      unigramVocabCtes("v1", "m1")}${unigramPassCtes("v2", "m1")}${
      unigramVocabCtes("v2", "mf")}${unigramPassCtes("ap", "mf")}
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN t.n_toks IS NOT NULL THEN t.n_toks
                     ELSE len(d.word) END) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) d
LEFT JOIN aptoks t ON t.word = d.word
WHERE len(d.word) > 0
GROUP BY d.doc_id"""

  /** Greedy longest-match-first unroll under model `m` (q193 —
    * mirror of [[org.apache.spark.sql.graft.UnigramOps.greedy]]):
    * per step, the branch union probes piece lengths 1..MaxPieceLen
    * at the word's cursor and the (len DESC) rank keeps the longest
    * hit; a word emits one token per step until the cursor reaches
    * its end (per-char coverage makes a hit certain). Produces
    * `gtoks(word, n_toks)`. */
  private def greedyPassCtes(m: String): String = {
    import graft.operators.Unigram.{MaxPieceLen, MaxWordLen}
    val steps = (1 to MaxWordLen).map { s =>
      val branches = (1 to MaxPieceLen).map { l =>
        s"""    SELECT g.word, g.pos, $l AS len
    FROM g${s - 1} g
    JOIN $m m ON m.piece = substr(g.word, g.pos + 1, $l)
    WHERE g.pos + $l <= len(g.word)"""
      }.mkString("\n    UNION ALL\n")
      s""", gc$s AS MATERIALIZED (
  SELECT word, pos, len FROM (
    SELECT word, pos, len,
           row_number() OVER (PARTITION BY word
             ORDER BY len DESC) AS rnk
    FROM (
$branches)) WHERE rnk = 1
), g$s AS MATERIALIZED (
  SELECT word, pos + len AS pos FROM gc$s
  WHERE pos + len < len(word)
)"""
    }.mkString
    val tokUnion = (1 to MaxWordLen).map(s =>
      s"    SELECT word FROM gc$s").mkString("\n    UNION ALL\n")
    s""", g0 AS (
  SELECT word, 0 AS pos FROM w
)$steps
, gtoks AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_toks FROM (
$tokUnion) GROUP BY word
)"""
  }

  /** Mirror of [[graft.operators.Unigram.greedyCounts]] (q193): the
    * full q172 training chain, the greedy unroll under the final
    * model, then the q173 per-document rollup with the per-character
    * long-word fallback. */
  def greedySegment: String =
    s"""$unigramBaseCtes${unigramPassCtes("v1", "m0")}${
      unigramVocabCtes("v1", "m1")}${unigramPassCtes("v2", "m1")}${
      unigramVocabCtes("v2", "mf")}${greedyPassCtes("mf")}
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN t.n_toks IS NOT NULL THEN t.n_toks
                     ELSE len(d.word) END) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) d
LEFT JOIN gtoks t ON t.word = d.word
WHERE len(d.word) > 0
GROUP BY d.doc_id"""

  /** Generic Lloyd unroll over a member CTE `s_<tag>(mid, mv, mnrm)`
    * — the parameterized form of the [[ivfCellCtes]] chain, reused at
    * BOTH levels of the q170 coarse-fine hierarchy (fine codebook
    * over the corpus sample, coarse codebook over the fine
    * centroids). Init = first k members by mid; per iteration:
    * (cos DESC, centroid ASC) assignment, ascending-mid member fold,
    * emptied-cell carry. Produces `c_<tag><iters>(centroid_id, cv,
    * cnorm)` — bit-exact with [[graft.operators.Similarity
    * .trainCentroids]] run over the same members in mid order. */
  private def lloydCtes(tag: String, iters: Int, k: Int): String = {
    import SimilarityParams.Dim
    val meanExpr =
      s"list_transform(range(1, ${Dim + 1}), i -> " +
        s"list_reduce(list_prepend(0.0, list_transform(g.vs, w -> w[i])), " +
        s"(a, b) -> a + b) / CAST(g.cnt AS DOUBLE))"
    def normExpr(cv: String) =
      s"sqrt(${fsumSql(s"list_transform($cv, x -> x * x)")})"
    val init = s""", c_${tag}0 AS (
  SELECT mid AS centroid_id, mv AS cv, mnrm AS cnorm
  FROM s_$tag WHERE mid < $k
)"""
    val its = (1 to iters).map { t =>
      s""", a_$tag$t AS (
  SELECT s.mid, s.mv, s.mnrm, c.centroid_id,
         row_number() OVER (PARTITION BY s.mid ORDER BY
           ${dotSql("s.mv", "c.cv")} / (s.mnrm * c.cnorm) DESC,
           c.centroid_id ASC) AS rnk
  FROM s_$tag s, c_$tag${t - 1} c
), g_$tag$t AS (
  SELECT centroid_id, list(mv ORDER BY mid) AS vs, COUNT(*) AS cnt
  FROM a_$tag$t WHERE rnk = 1 GROUP BY centroid_id
), cm_$tag$t AS (
  SELECT p.centroid_id,
         CASE WHEN g.cnt IS NULL THEN p.cv ELSE $meanExpr END AS cv
  FROM c_$tag${t - 1} p LEFT JOIN g_$tag$t g USING (centroid_id)
), c_$tag$t AS (
  SELECT centroid_id, cv, ${normExpr("cv")} AS cnorm FROM cm_$tag$t
)"""
    }.mkString
    init + its
  }

  /** Mirror of [[graft.operators.Similarity.ivfCorpusCellsCoarse]] at
    * the graded (k=[[graft.operators.Similarity.CoarseFineK]],
    * g=[[graft.operators.Similarity.CoarseFineGroups]]) point (q170):
    * fine Lloyd over the corpus sample, coarse Lloyd over the FINE
    * CENTROIDS (both through [[lloydCtes]] — member order =
    * centroid_id, exactly the driver twin's fine-slot order), fine→
    * group ownership by (cos DESC, coarse ASC), then the TWO-STAGE
    * corpus argmin: stage 1 ranks only the NON-EMPTY groups (the
    * kernel drops empty groups from its baked arrays), stage 2 is
    * exact within the picked group with ties to the lowest fine id. */
  def coarseFineCells: String =
    s"""$coarseFineCtes
SELECT vec_id, CAST(centroid_id AS BIGINT) AS cell FROM stage2"""

  /** The shared CTE chain of the coarse-fine family (q170 cells,
    * q185 retrieval): both Lloyd levels, fine→group ownership, live
    * groups, and the two-stage corpus argmin, ending at `stage2`. */
  private def coarseFineCtes: String = {
    import graft.operators.Similarity.{CoarseFineK, CoarseFineGroups,
      KMeansIters, TrainSample}
    s"""$embCtes
, s_f AS (
  SELECT vec_id AS mid, v AS mv, nrm AS mnrm FROM n
  WHERE vec_id < $TrainSample
)${lloydCtes("f", KMeansIters, CoarseFineK)}
, fcents AS (
  SELECT centroid_id, cv, cnorm FROM c_f$KMeansIters
), s_c AS (
  SELECT centroid_id AS mid, cv AS mv, cnorm AS mnrm FROM fcents
)${lloydCtes("c", KMeansIters, CoarseFineGroups)}
, ccents AS (
  SELECT centroid_id AS coarse_id, cv, cnorm FROM c_c$KMeansIters
), fine_group AS (
  SELECT centroid_id, coarse_id FROM (
    SELECT f.centroid_id, c.coarse_id,
           row_number() OVER (PARTITION BY f.centroid_id ORDER BY
             ${dotSql("f.cv", "c.cv")} / (f.cnorm * c.cnorm) DESC,
             c.coarse_id ASC) AS rnk
    FROM fcents f, ccents c) WHERE rnk = 1
), live AS (
  SELECT DISTINCT coarse_id FROM fine_group
), stage1 AS (
  SELECT vec_id, coarse_id FROM (
    SELECT nn.vec_id, c.coarse_id,
           row_number() OVER (PARTITION BY nn.vec_id ORDER BY
             ${dotSql("nn.v", "c.cv")} / (nn.nrm * c.cnorm) DESC,
             c.coarse_id ASC) AS rnk
    FROM n nn, ccents c JOIN live USING (coarse_id)) WHERE rnk = 1
), stage2 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT s.vec_id, f.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id ORDER BY
             ${dotSql("nn.v", "f.cv")} / (nn.nrm * f.cnorm) DESC,
             f.centroid_id ASC) AS rnk
    FROM stage1 s
    JOIN n nn ON nn.vec_id = s.vec_id
    JOIN fine_group fg ON fg.coarse_id = s.coarse_id
    JOIN fcents f ON f.centroid_id = fg.centroid_id) WHERE rnk = 1
)"""
  }

  /** Mirror of [[graft.operators.Similarity.ivfTopKCoarse]] (q185) —
    * END-TO-END retrieval through the coarse-fine path: corpus cells
    * from the shared [[coarseFineCtes]] two-stage argmin; the query
    * probe is the UNION of (a) the query's NProbe exact-nearest fine
    * cells (rank over ALL fine centroids, (cos DESC, id ASC)) and
    * (b) every fine cell owned by the query's CoarseProbeGroups
    * nearest LIVE coarse groups; candidates dedup, exact-cosine
    * re-rank, q20's top-k rule. */
  def coarseFineSearch: String = {
    import graft.operators.Similarity.{NProbe, CoarseProbeGroups}
    import SimilarityParams.TopK
    s"""$coarseFineCtes
, corp AS (
  SELECT vec_id, centroid_id AS cell FROM stage2
), qx AS (
  SELECT query_id, centroid_id AS cell FROM (
    SELECT q.query_id, f.centroid_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             ${dotSql("q.qv", "f.cv")} / (q.qn * f.cnorm) DESC,
             f.centroid_id ASC) AS rnk
    FROM q, fcents f) WHERE rnk <= $NProbe
), qg AS (
  SELECT query_id, coarse_id FROM (
    SELECT q.query_id, c.coarse_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             ${dotSql("q.qv", "c.cv")} / (q.qn * c.cnorm) DESC,
             c.coarse_id ASC) AS rnk
    FROM q, ccents c JOIN live USING (coarse_id))
  WHERE rnk <= $CoarseProbeGroups
), qgc AS (
  SELECT qg.query_id, fg.centroid_id AS cell
  FROM qg JOIN fine_group fg USING (coarse_id)
), probe AS (
  SELECT query_id, cell FROM qx
  UNION
  SELECT query_id, cell FROM qgc
), cand AS (
  SELECT query_id, vec_id
  FROM probe JOIN corp USING (cell)
  WHERE vec_id <> query_id
  GROUP BY 1, 2
), p AS (
  SELECT query_id, vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM cand JOIN q USING (query_id) JOIN n USING (vec_id)
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.cellProfile]] (q125):
    * the shared [[ivfCellCtes]] assignment joined back to the
    * centroid table, per-member squared distance as the same
    * ascending-dimension sequential fold, one k-group aggregation. */
  def cellProfile: String = {
    import SimilarityParams.Dim
    val d2 = fsumSql(s"list_transform(range(1, ${Dim + 1}), " +
      "i -> (nv.v[i] - ct.cv[i]) * (nv.v[i] - ct.cv[i]))")
    s"""$ivfCellCtes
, prof AS (
  SELECT CAST(cc.cell AS BIGINT) AS cell,
         COUNT(*) AS n_members,
         SUM($d2) AS inertia,
         SUM(nv.nrm) / COUNT(*) AS mean_norm
  FROM corpus_cells cc
  JOIN n nv ON nv.vec_id = cc.vec_id
  JOIN cents ct ON ct.centroid_id = cc.cell
  GROUP BY 1
)
SELECT cell, n_members, inertia, mean_norm FROM prof"""
  }

  /** Mirror of [[graft.operators.Similarity.cellBalancedSample]]
    * (q108): the shared [[ivfCellCtes]] assignment, the q32-family
    * Knuth-hash band, and a per-cell row_number quota — integer
    * arithmetic end to end. */
  def cellBalance: String = {
    import graft.operators.Similarity.ClusterQuota
    s"""$ivfCellCtes
, hb AS (
  SELECT vec_id, CAST(cell AS BIGINT) AS cell,
         ${graft.operators.Sampling.mixedSql("vec_id")} % 1048576 AS h
  FROM corpus_cells
), rk AS (
  SELECT vec_id, cell,
         CAST(row_number() OVER (PARTITION BY cell
           ORDER BY h ASC, vec_id ASC) AS BIGINT) AS rn
  FROM hb
)
SELECT vec_id, cell, rn FROM rk WHERE rn <= $ClusterQuota"""
  }

  /** Mirror of [[graft.operators.Similarity.pqTopK]] (q106): per
    * subspace, the L2 Lloyd chain unrolled (assignment by
    * (squared-dist ASC, centroid_id ASC) row_number — the kernel's
    * strict-less/lowest-id rule; member means fold in ascending
    * vec_id order; emptied cells carry), then corpus codes, the
    * approximate norm sqrt(Σ‖c‖²) with left-associated addition, ADC
    * scores as Σ dot(q_m, cent(code_m)) — numerically identical to
    * the Spark side's per-query table lookups, which precompute the
    * SAME dot from the same doubles — and the exact full-dim re-rank
    * of the per-query PqPoolK pool. */
  def annPq: String = {
    import graft.operators.Similarity.{KMeansIters, PqK, PqPoolK, PqSubDim, PqSubspaces, TrainSample}
    import SimilarityParams.TopK
    def lo(m: Int): Int = m * PqSubDim
    def subExpr(src: String, m: Int): String =
      s"$src[${lo(m) + 1}:${lo(m) + PqSubDim}]"
    def l2Sql(a: String, b: String): String =
      fsumSql(s"list_transform(range(1, ${PqSubDim + 1}), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))")
    def dotSub(a: String, b: String): String =
      fsumSql(s"list_transform(range(1, ${PqSubDim + 1}), " +
        s"i -> $a[i] * $b[i])")
    val meanExpr =
      s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
        s"list_reduce(list_prepend(0.0, list_transform(g.vs, w -> w[i])), " +
        s"(a, b) -> a + b) / CAST(g.cnt AS DOUBLE))"
    def subspaceCtes(m: Int): String = {
      val lloyd = (1 to KMeansIters).map { k =>
        s""", pa${m}_$k AS (
  SELECT s.vec_id, s.v, c.centroid_id,
         row_number() OVER (PARTITION BY s.vec_id ORDER BY
           ${l2Sql("s.v", "c.cv")} ASC, c.centroid_id ASC) AS rnk
  FROM samp$m s, pc${m}_${k - 1} c
), pg${m}_$k AS (
  SELECT centroid_id, list(v ORDER BY vec_id) AS vs, COUNT(*) AS cnt
  FROM pa${m}_$k WHERE rnk = 1 GROUP BY centroid_id
), pc${m}_$k AS (
  SELECT p.centroid_id,
         CASE WHEN g.cnt IS NULL THEN p.cv ELSE $meanExpr END AS cv
  FROM pc${m}_${k - 1} p LEFT JOIN pg${m}_$k g USING (centroid_id)
)"""
      }.mkString
      s""", samp$m AS (
  SELECT vec_id, ${subExpr("v", m)} AS v FROM n WHERE vec_id < $TrainSample
), pc${m}_0 AS (
  SELECT vec_id AS centroid_id, v AS cv FROM samp$m WHERE vec_id < $PqK
)$lloyd
, pcents$m AS (
  SELECT centroid_id, cv,
         ${fsumSql("list_transform(cv, x -> x * x)")} AS cn2
  FROM pc${m}_$KMeansIters
), code$m AS (
  SELECT vec_id, centroid_id AS code, cn2 FROM (
    SELECT n.vec_id, c.centroid_id, c.cn2,
           row_number() OVER (PARTITION BY n.vec_id ORDER BY
             ${l2Sql(subExpr("n.v", m), "c.cv")} ASC,
             c.centroid_id ASC) AS rnk
    FROM n, pcents$m c) WHERE rnk = 1
)"""
    }
    val subs = (0 until PqSubspaces).map(subspaceCtes).mkString
    val codeJoins = (0 until PqSubspaces).map(m =>
      s"JOIN code$m c$m USING (vec_id)").mkString("\n  ")
    val anorm = (0 until PqSubspaces).map(m => s"c$m.cn2").mkString(" + ")
    val adot = (0 until PqSubspaces).map(m =>
      dotSub(subExpr("q.qv", m), s"v$m.cv")).mkString(" + ")
    val centJoins = (0 until PqSubspaces).map(m =>
      s"JOIN pcents$m v$m ON cd.code$m = v$m.centroid_id").mkString("\n  ")
    val codeCols = (0 until PqSubspaces).map(m =>
      s"c$m.code AS code$m").mkString(", ")
    s"""$embCtes$subs
, coded AS (
  SELECT n.vec_id, $codeCols, sqrt($anorm) AS anorm
  FROM n
  $codeJoins
), adc AS (
  SELECT q.query_id, cd.vec_id,
         ($adot) / (q.qn * cd.anorm) AS acos
  FROM q, coded cd
  $centJoins
  WHERE cd.vec_id <> q.query_id
), pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY acos DESC, vec_id ASC) AS pr
    FROM adc) WHERE pr <= $PqPoolK
), pf AS (
  SELECT p.query_id, p.vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM pool p
  JOIN q ON p.query_id = q.query_id
  JOIN n ON p.vec_id = n.vec_id
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM pf
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.mrlRerankTopK]] (q96):
    * the truncated-prefix norm/dot use the same sequential folds over
    * the sliced list, stage-1 pool membership by (ct DESC, vec_id
    * ASC) row_number, stage-2 full-dim cosine re-rank. */
  def mrlRerank: String = {
    import SimilarityParams.{NumQueryVectors, TopK}
    import graft.operators.Similarity.{MrlPoolK, TruncDim}
    val dotT = fsumSql(s"list_transform(range(1, ${TruncDim + 1}), " +
      "i -> qvt[i] * vt[i])")
    val dotF = dotSql("qv", "v")
    s"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n0 AS (
  SELECT vec_id, v,
         sqrt(${fsumSql("list_transform(v, x -> x * x)")}) AS nrm,
         v[1:$TruncDim] AS vt
  FROM e
), n2 AS (
  SELECT vec_id, v, nrm, vt,
         sqrt(${fsumSql("list_transform(vt, x -> x * x)")}) AS nt
  FROM n0
), q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn, vt AS qvt, nt AS qnt
  FROM n2 WHERE vec_id < $NumQueryVectors
), pt AS (
  SELECT query_id, vec_id, $dotT / (qnt * nt) AS ct
  FROM q, n2 WHERE vec_id <> query_id
), pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY ct DESC, vec_id ASC) AS pr
    FROM pt) WHERE pr <= $MrlPoolK
), pf AS (
  SELECT p.query_id, p.vec_id, $dotF / (qn * nrm) AS cosine
  FROM pool p
  JOIN q ON p.query_id = q.query_id
  JOIN n2 ON p.vec_id = n2.vec_id
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM pf
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.embeddingNearDups]] —
    * the wider near-dup banding (DedupNumBands × DedupBitsPerBand). */
  def embedNearDups: String = {
    import SimilarityParams._
    def keyExpr(vcol: String, j: Int): String =
      (0 until DedupBitsPerBand).map { t =>
        val lst = dedupPlanes(j * DedupBitsPerBand + t)
          .mkString("[", ", ", "]")
        s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandCte = (0 until DedupNumBands).map { j =>
      s"SELECT vec_id, v, nrm, $j AS band, ${keyExpr("v", j)} AS key FROM n"
    }.mkString("\n  UNION ALL\n  ")
    s"""$embCtes
, bands AS (
  $bandCte
), cand AS (
  SELECT a.vec_id AS vec_a, a.v AS qv, a.nrm AS qn,
         b.vec_id AS vec_b, b.v AS v2, b.nrm AS n2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
  GROUP BY ALL
), p AS (
  SELECT vec_a, vec_b,
         ${dotSql("qv", "v2")} / (qn * n2) AS cosine
  FROM cand
)
SELECT vec_a, vec_b, cosine FROM p
WHERE cosine >= ${graft.operators.Similarity.NearDupCosine}"""
  }

  /** Mirror of [[graft.operators.Similarity.semanticContamination]]
    * (q219): the q12 band construction split cross-set — benchmark
    * bands × corpus bands, exact cosine verify. */
  def semanticContamination: String = {
    import SimilarityParams._
    import graft.operators.Similarity.{SemDecontamBenchBelow,
      SemDecontamCosine}
    def keyExpr(vcol: String, j: Int): String =
      (0 until DedupBitsPerBand).map { t =>
        val lst = dedupPlanes(j * DedupBitsPerBand + t)
          .mkString("[", ", ", "]")
        s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandCte = (0 until DedupNumBands).map { j =>
      s"SELECT vec_id, v, nrm, $j AS band, ${keyExpr("v", j)} AS key FROM n"
    }.mkString("\n  UNION ALL\n  ")
    s"""$embCtes
, bands AS (
  $bandCte
), cand AS (
  SELECT b.vec_id AS corpus_vec, b.v AS cv, b.nrm AS cn,
         a.vec_id AS bench_vec, a.v AS qv, a.nrm AS qn
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key
   AND a.vec_id < $SemDecontamBenchBelow
   AND b.vec_id >= $SemDecontamBenchBelow
  GROUP BY ALL
), p AS (
  SELECT corpus_vec, bench_vec,
         ${dotSql("qv", "cv")} / (qn * cn) AS cosine
  FROM cand
)
SELECT corpus_vec, bench_vec, cosine FROM p
WHERE cosine >= $SemDecontamCosine"""
  }

  /** Mirror of [[graft.operators.Similarity.pcaWhiten]] (q115): the
    * sample moments replayed with the SAME two-level ordered fold
    * (per-bucket ascending-vec_id member folds, ascending-bucket
    * outer fold), the covariance entries in the same sm/n − μᵣμ꜀
    * form, [[graft.operators.Similarity.PcaIters]] power iterations
    * per component from the e_k start with Rayleigh eigenvalue and
    * rank-1 deflation — every double operation in the driver
    * trainer's order, so u/λ are bit-identical — then the row-local
    * whitened projection rounded to 12 decimals in both engines. */
  def pcaWhiten: String = {
    import SimilarityParams.Dim
    import graft.operators.Similarity.{PcaDim, PcaIters, PcaBuckets, TrainSample}
    val D = Dim
    val D2 = D * D
    def zeros(k: Int) = Seq.fill(k)("0.0").mkString("[", ", ", "]")
    def vecAdd(k: Int) =
      s"(acc, x) -> list_transform(range(1, ${k + 1}), i -> acc[i] + x[i])"
    def matvec(m: String, u: String) =
      s"list_transform(range(1, ${D + 1}), r -> " +
        fsumSql(s"list_transform(range(1, ${D + 1}), " +
          s"c -> $m[(r-1)*$D + c] * $u[c])") + ")"
    val comps = (0 until PcaDim).map { k =>
      val e = (0 until D).map(i => if (i == k) "1.0" else "0.0")
        .mkString("[", ", ", "]")
      val iters = (1 to PcaIters).map { t =>
        s""", w${k}_$t AS MATERIALIZED (
  SELECT ${matvec("m", "u")} AS w FROM cm$k, u${k}_${t - 1}
), u${k}_$t AS MATERIALIZED (
  SELECT list_transform(w, x -> x / nr) AS u FROM (
    SELECT w, sqrt(${fsumSql(s"list_transform(w, x -> x * x)")}) AS nr
    FROM w${k}_$t)
)"""
      }.mkString
      s""", u${k}_0 AS MATERIALIZED (
  SELECT $e AS u
)$iters
, fin$k AS MATERIALIZED (
  SELECT u, ${fsumSql(s"list_transform(range(1, ${D + 1}), i -> u[i] * w[i])")} AS lam
  FROM (SELECT u, ${matvec("m", "u")} AS w FROM cm$k, u${k}_$PcaIters)
), cm${k + 1} AS MATERIALIZED (
  SELECT list_transform(range(1, ${D2 + 1}),
    i -> m[i] - lam * u[(i-1)//$D + 1] * u[(i-1)%$D + 1]) AS m
  FROM cm$k, fin$k
)"""
    }.mkString
    val outCols = (0 until PcaDim).map { k =>
      s"round((${fsumSql(s"list_transform(range(1, ${D + 1}), i -> n.v[i] * f$k.u[i])")} - " +
        s"${fsumSql(s"list_transform(range(1, ${D + 1}), i -> mu.mu[i] * f$k.u[i])")}) * " +
        s"(1.0/sqrt(f$k.lam)), 12) AS p${k + 1}"
    }.mkString(",\n       ")
    val finJoins = (0 until PcaDim).map(k => s"fin$k f$k").mkString(", ")
    s"""$embCtes
, smp AS MATERIALIZED (
  SELECT vec_id, v FROM n WHERE vec_id < $TrainSample
), bf AS MATERIALIZED (
  SELECT vec_id % $PcaBuckets AS b, COUNT(*) AS cnt,
         list_sort(list(struct_pack(vid := vec_id, vv := v))) AS mv
  FROM smp GROUP BY 1
), bsum AS MATERIALIZED (
  SELECT b, cnt,
         list_reduce(list_prepend(${zeros(D)},
           list_transform(mv, m -> m.vv)), ${vecAdd(D)}) AS sv,
         list_reduce(list_prepend(${zeros(D2)},
           list_transform(mv, m -> flatten(list_transform(m.vv,
             x -> list_transform(m.vv, y -> x * y))))), ${vecAdd(D2)}) AS sm
  FROM bf
), tot AS MATERIALIZED (
  SELECT CAST(SUM(cnt) AS BIGINT) AS nn,
         list_reduce(list_prepend(${zeros(D)}, list(sv ORDER BY b)),
           ${vecAdd(D)}) AS sv,
         list_reduce(list_prepend(${zeros(D2)}, list(sm ORDER BY b)),
           ${vecAdd(D2)}) AS sm
  FROM bsum
), mu AS MATERIALIZED (
  SELECT list_transform(range(1, ${D + 1}), i -> sv[i] / nn) AS mu, nn
  FROM tot
), cm0 AS MATERIALIZED (
  SELECT list_transform(range(1, ${D2 + 1}),
    i -> t.sm[i] / t.nn - mu.mu[(i-1)//$D + 1] * mu.mu[(i-1)%$D + 1]) AS m
  FROM tot t, mu
)$comps
SELECT n.vec_id,
       $outCols
FROM n, mu, $finJoins"""
  }

  /** Mirror of [[graft.operators.Similarity.graphSearchTopK]] (q124):
    * the q112 graph SQL embedded as the edges CTE (its own nested
    * WITH — shadowed names are scoped to the subquery) UNIONed with
    * the deterministic long-range spoke layer (dense rank by vec_id,
    * integer ⌊j·N/S⌋ stride arithmetic — exact, no FP), the MIN-id
    * entry beam, and each hop unrolled as expand → exact-cosine
    * score → (cos DESC, node ASC) beam cut, finishing with the
    * self-excluded top-k of the final beam. */
  /** One unrolled walk hop (shared by q124's flat walk and q186's
    * per-level walks): candidates = carry ∪ edge expansion, exact
    * cosine, (cos DESC, node ASC) beam cut. `p` prefixes the CTE
    * names; `from` names the hop-0 beam CTE. */
  private def walkHopCtes(p: String, edges: String, from: String,
      hops: Int, beamWidth: Int): String =
    (1 to hops).map { t =>
      val prev = if (t == 1) from else s"${p}beam${t - 1}"
      s""", ${p}cand$t AS (
  SELECT DISTINCT query_id, node FROM (
    SELECT query_id, node FROM $prev
    UNION ALL
    SELECT b.query_id, e.neighbor_id AS node
    FROM $prev b JOIN $edges e ON e.src = b.node)
), ${p}sc$t AS MATERIALIZED (
  SELECT c.query_id, c.node,
         ${dotSql("qq.qv", "nv.v")} / (qq.qn * nv.nrm) AS cos
  FROM ${p}cand$t c
  JOIN q qq ON qq.query_id = c.query_id
  JOIN n nv ON nv.vec_id = c.node
), ${p}beam$t AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT query_id, node,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, node ASC) AS rn
    FROM ${p}sc$t) WHERE rn <= $beamWidth
)"""
    }.mkString

  def graphSearch: String = {
    import SimilarityParams._
    import graft.operators.Similarity.{GraphSearchBeam, GraphSearchHops,
      LongRangeSpokes}
    val hopCtes = {
      // keep the historical un-prefixed CTE names (cand1/sc1/beam1…)
      walkHopCtes("", "edges", "beam0", GraphSearchHops,
        GraphSearchBeam)
    }
    s"""$embCtes
, rk AS MATERIALIZED (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS r,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn
  FROM n
), spokes AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr
  FROM rk a
  CROSS JOIN (SELECT unnest(range(1, $LongRangeSpokes)) AS j) js
  JOIN rk b ON b.r = (a.r + (js.j * a.nn) // $LongRangeSpokes) % a.nn
  WHERE a.vec_id <> b.vec_id
), edges AS MATERIALIZED (
  SELECT src, neighbor_id FROM ($knnGraph)
  UNION ALL
  SELECT src, nbr AS neighbor_id FROM spokes
), mn AS (
  SELECT MIN(vec_id) AS m FROM n
), beam0 AS (
  SELECT query_id, m AS node FROM q, mn
)$hopCtes
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT s.query_id, s.node AS neighbor_id, s.cos AS cosine,
         CAST(row_number() OVER (PARTITION BY s.query_id
           ORDER BY s.cos DESC, s.node ASC) AS BIGINT) AS rank
  FROM sc$GraphSearchHops s
  JOIN beam$GraphSearchHops b
    ON b.query_id = s.query_id AND b.node = s.node
  WHERE s.node <> s.query_id)
WHERE rank <= $TopK"""
  }

  /** Serving-graph edge CTEs over an arbitrary node CTE `src`
    * (vec_id, v, nrm): banded k-NN top-k edges ∪ rank-space
    * long-range spokes — the q124 graph, parameterized so q186 can
    * build it per LEVEL. Emits `${p}edges(src, neighbor_id)`. */
  private def servingEdgeCtes(p: String, src: String): String = {
    import SimilarityParams._
    import graft.operators.Similarity.{KnnGraphK, LongRangeSpokes}
    def keyExpr(vcol: String, j: Int): String =
      (0 until DedupBitsPerBand).map { t =>
        val lst = dedupPlanes(j * DedupBitsPerBand + t)
          .mkString("[", ", ", "]")
        s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandCte = (0 until DedupNumBands).map { j =>
      s"SELECT vec_id, v, nrm, $j AS band, ${keyExpr("v", j)} AS key FROM $src"
    }.mkString("\n  UNION ALL\n  ")
    s""", ${p}bands AS (
  $bandCte
), ${p}kcand AS (
  SELECT a.vec_id AS src, a.v AS kv, a.nrm AS kn,
         b.vec_id AS dst, b.v AS v2, b.nrm AS n2
  FROM ${p}bands a JOIN ${p}bands b
    ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id
  GROUP BY ALL
), ${p}kedge AS (
  SELECT src, dst AS neighbor_id FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY
             ${dotSql("kv", "v2")} / (kn * n2) DESC, dst ASC) AS rank
    FROM ${p}kcand) WHERE rank <= $KnnGraphK
), ${p}rk AS MATERIALIZED (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS r,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn
  FROM $src
), ${p}spokes AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr
  FROM ${p}rk a
  CROSS JOIN (SELECT unnest(range(1, $LongRangeSpokes)) AS j) js
  JOIN ${p}rk b ON b.r = (a.r + (js.j * a.nn) // $LongRangeSpokes) % a.nn
  WHERE a.vec_id <> b.vec_id
), ${p}edges AS MATERIALIZED (
  SELECT src, neighbor_id FROM ${p}kedge
  UNION ALL
  SELECT src, nbr AS neighbor_id FROM ${p}spokes
)"""
  }

  /** Mirror of [[graft.operators.Similarity.layeredGraphSearchTopK]]
    * (q186): layer membership by rank stride over the full node set,
    * per-level serving edges via [[servingEdgeCtes]], the upper walk
    * unrolled from the sparse layer's minimum node, the DESCEND (the
    * upper beam is hop 0 of the base walk), and q124's final top-k
    * rule over the base walk's last scored beam. */
  def layeredSearch: String = {
    import SimilarityParams._
    import graft.operators.Similarity.{GraphSearchBeam, LayerStride,
      LayerHopsUpper, LayerHopsBase}
    s"""$embCtes
, lrk AS MATERIALIZED (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS r
  FROM n
), un AS MATERIALIZED (
  SELECT n.vec_id, n.v, n.nrm
  FROM n JOIN lrk USING (vec_id)
  WHERE lrk.r % $LayerStride = 0
)${servingEdgeCtes("u", "un")}
, umn AS (
  SELECT MIN(vec_id) AS m FROM un
), ubeam0 AS (
  SELECT query_id, m AS node FROM q, umn
)${walkHopCtes("u", "uedges", "ubeam0", LayerHopsUpper,
      GraphSearchBeam)}${servingEdgeCtes("b", "n")}
, bbeam0 AS (
  SELECT query_id, node FROM ubeam$LayerHopsUpper
)${walkHopCtes("b", "bedges", "bbeam0", LayerHopsBase,
      GraphSearchBeam)}
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT s.query_id, s.node AS neighbor_id, s.cos AS cosine,
         CAST(row_number() OVER (PARTITION BY s.query_id
           ORDER BY s.cos DESC, s.node ASC) AS BIGINT) AS rank
  FROM bsc$LayerHopsBase s
  JOIN bbeam$LayerHopsBase b
    ON b.query_id = s.query_id AND b.node = s.node
  WHERE s.node <> s.query_id)
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.layeredGraphSearchTopK3]]
    * (q225): q186's pattern with one more level unrolled — level-2
    * membership by rank stride² over the full node set, level-1 by
    * stride, per-level serving edges via [[servingEdgeCtes]], the
    * top walk from level 2's minimum node, two DESCENDS (each upper
    * beam is hop 0 of the next level's walk), and q124's final
    * top-k rule over the base walk's last scored beam. */
  def layeredSearch3: String = {
    import SimilarityParams._
    import graft.operators.Similarity.{GraphSearchBeam, Layer3Stride,
      LayerHopsUpper, LayerHopsBase}
    val stride2 = Layer3Stride.toLong * Layer3Stride
    s"""$embCtes
, lrk AS MATERIALIZED (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS r
  FROM n
), tn AS MATERIALIZED (
  SELECT n.vec_id, n.v, n.nrm
  FROM n JOIN lrk USING (vec_id)
  WHERE lrk.r % $stride2 = 0
), un AS MATERIALIZED (
  SELECT n.vec_id, n.v, n.nrm
  FROM n JOIN lrk USING (vec_id)
  WHERE lrk.r % $Layer3Stride = 0
)${servingEdgeCtes("t", "tn")}
, tmn AS (
  SELECT MIN(vec_id) AS m FROM tn
), tbeam0 AS (
  SELECT query_id, m AS node FROM q, tmn
)${walkHopCtes("t", "tedges", "tbeam0", LayerHopsUpper,
      GraphSearchBeam)}${servingEdgeCtes("u", "un")}
, ubeam0 AS (
  SELECT query_id, node FROM tbeam$LayerHopsUpper
)${walkHopCtes("u", "uedges", "ubeam0", LayerHopsUpper,
      GraphSearchBeam)}${servingEdgeCtes("b", "n")}
, bbeam0 AS (
  SELECT query_id, node FROM ubeam$LayerHopsUpper
)${walkHopCtes("b", "bedges", "bbeam0", LayerHopsBase,
      GraphSearchBeam)}
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT s.query_id, s.node AS neighbor_id, s.cos AS cosine,
         CAST(row_number() OVER (PARTITION BY s.query_id
           ORDER BY s.cos DESC, s.node ASC) AS BIGINT) AS rank
  FROM bsc$LayerHopsBase s
  JOIN bbeam$LayerHopsBase b
    ON b.query_id = s.query_id AND b.node = s.node
  WHERE s.node <> s.query_id)
WHERE rank <= $TopK"""
  }

  /** Mirror of the streaming incremental k-NN graph (q123,
    * [[graft.streaming.StreamingKnnGraph]]): with the deterministic
    * vec_id % 3 arrival waves, the as-of candidate rule is
    * wave(dst) ≤ wave(src) — replayed over the TOP-K banding (the
    * index's [[graft.operators.Similarity.bandKeysArray]] planes),
    * exact cosine, per-src (cosine DESC, dst ASC) top-k. */
  def knnStream: String = {
    import SimilarityParams._
    import graft.operators.Similarity.KnnGraphK
    s"""$embCtes
, bands AS MATERIALIZED (
  ${lshBandCte("n", "vec_id", "v")}
), cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key
   AND a.vec_id <> b.vec_id
   AND b.vec_id % 3 <= a.vec_id % 3
  GROUP BY ALL
), p AS (
  SELECT c.src, c.dst,
         ${dotSql("x.v", "y.v")} / (x.nrm * y.nrm) AS cosine
  FROM cand c
  JOIN n x ON x.vec_id = c.src
  JOIN n y ON y.vec_id = c.dst
), r AS (
  SELECT src, dst AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY src
           ORDER BY cosine DESC, dst ASC) AS BIGINT) AS rank
  FROM p
)
SELECT src, neighbor_id, rank, cosine FROM r
WHERE rank <= $KnnGraphK"""
  }

  /** Mirror of [[graft.operators.Similarity.binaryHammingTopK]]
    * (q121): the same sign packing (bit 63 as the signed constant —
    * the sum of distinct signed powers equals the Spark kernel's OR
    * accumulation exactly), xor+popcount Hamming, (hamming ASC, id
    * ASC) pool, exact cosine re-rank. Integer distances — no FP
    * mirror risk before the final cosine. */
  def binaryHamming: String = {
    import SimilarityParams._
    import graft.operators.Similarity.HammingPoolK
    val packExpr = (0 until Dim).map { i =>
      val pow =
        if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"CASE WHEN v[${i + 1}] >= 0.0 THEN $pow ELSE 0 END"
    }.mkString("(", " + ", ")")
    s"""$embCtes
, codes AS MATERIALIZED (
  SELECT vec_id, v, nrm, CAST($packExpr AS BIGINT) AS code FROM n
), qc AS (
  SELECT vec_id AS query_id, code AS qcode FROM codes
  WHERE vec_id < $NumQueryVectors
), ham AS (
  SELECT qc.query_id, c.vec_id,
         CAST(bit_count(xor(qc.qcode, c.code)) AS BIGINT) AS hamming
  FROM qc, codes c
  WHERE c.vec_id <> qc.query_id
), pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY hamming ASC, vec_id ASC) AS pr
    FROM ham) WHERE pr <= $HammingPoolK
), pf AS (
  SELECT p.query_id, p.vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM pool p
  JOIN q ON p.query_id = q.query_id
  JOIN n ON p.vec_id = n.vec_id
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM pf
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.mineAlignedPairs]]
    * (q119): label-parity corpus split, CROSS-side band-collision
    * candidates under the near-dup banding, exact cosine, both
    * directions' top-k neighborhood averages by (cosine DESC, id
    * ASC) rank, the ratio margin, and the per-x best match at the
    * acceptance cut. */
  def mineAlignedPairs: String = {
    import SimilarityParams._
    import graft.operators.Similarity.{MineK, MineMargin}
    def keyExpr(vcol: String, j: Int): String =
      (0 until DedupBitsPerBand).map { t =>
        val lst = dedupPlanes(j * DedupBitsPerBand + t)
          .mkString("[", ", ", "]")
        s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
      }.mkString("(", " + ", ")")
    def bandCte(src: String): String = (0 until DedupNumBands).map { j =>
      s"SELECT vec_id, v, nrm, $j AS band, ${keyExpr("v", j)} AS key FROM $src"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, label, v,
         sqrt(${fsumSql("list_transform(v, x -> x * x)")}) AS nrm
  FROM e
), nx AS (SELECT vec_id, v, nrm FROM n WHERE label % 2 = 0
), ny AS (SELECT vec_id, v, nrm FROM n WHERE label % 2 = 1
), bandsx AS MATERIALIZED (
  ${bandCte("nx")}
), bandsy AS MATERIALIZED (
  ${bandCte("ny")}
), cand AS MATERIALIZED (
  SELECT a.vec_id AS x_id, a.v AS qv, a.nrm AS qn,
         b.vec_id AS y_id, b.v AS v2, b.nrm AS n2
  FROM bandsx a JOIN bandsy b
    ON a.band = b.band AND a.key = b.key
  GROUP BY ALL
), p AS MATERIALIZED (
  SELECT x_id, y_id,
         ${dotSql("qv", "v2")} / (qn * n2) AS cosine
  FROM cand
), ax AS (
  SELECT x_id, AVG(cosine) AS avg_x FROM (
    SELECT x_id, cosine, row_number() OVER (PARTITION BY x_id
      ORDER BY cosine DESC, y_id ASC) AS rn FROM p)
  WHERE rn <= $MineK GROUP BY x_id
), ay AS (
  SELECT y_id, AVG(cosine) AS avg_y FROM (
    SELECT y_id, cosine, row_number() OVER (PARTITION BY y_id
      ORDER BY cosine DESC, x_id ASC) AS rn FROM p)
  WHERE rn <= $MineK GROUP BY y_id
), m AS (
  SELECT p.x_id, p.y_id, p.cosine,
         p.cosine / ((ax.avg_x + ay.avg_y) / 2.0) AS margin
  FROM p JOIN ax ON p.x_id = ax.x_id JOIN ay ON p.y_id = ay.y_id
), best AS (
  SELECT x_id, y_id, cosine, margin FROM (
    SELECT x_id, y_id, cosine, margin,
           row_number() OVER (PARTITION BY x_id
             ORDER BY margin DESC, y_id ASC) AS rn
    FROM m) WHERE rn = 1
)
SELECT x_id, y_id, cosine, margin FROM best
WHERE margin >= $MineMargin"""
  }

  /** Mirror of [[graft.operators.Similarity.knnGraph]] (q112): the
    * same near-dup banding generates candidates in BOTH directions
    * (a.vec_id <> b.vec_id), exact cosine, row_number top-k per src
    * with the (cosine DESC, dst ASC) total order the TopKPerGroup
    * operator is spec-pinned equal to. */
  def knnGraph: String = {
    import SimilarityParams._
    def keyExpr(vcol: String, j: Int): String =
      (0 until DedupBitsPerBand).map { t =>
        val lst = dedupPlanes(j * DedupBitsPerBand + t)
          .mkString("[", ", ", "]")
        s"CASE WHEN ${fsumSql(s"list_transform(range(1, ${Dim + 1}), i -> $lst[i] * $vcol[i])")} >= 0.0 THEN ${1 << t} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandCte = (0 until DedupNumBands).map { j =>
      s"SELECT vec_id, v, nrm, $j AS band, ${keyExpr("v", j)} AS key FROM n"
    }.mkString("\n  UNION ALL\n  ")
    s"""$embCtes
, bands AS (
  $bandCte
), cand AS (
  SELECT a.vec_id AS src, a.v AS qv, a.nrm AS qn,
         b.vec_id AS dst, b.v AS v2, b.nrm AS n2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id
  GROUP BY ALL
), p AS (
  SELECT src, dst,
         ${dotSql("qv", "v2")} / (qn * n2) AS cosine
  FROM cand
), r AS (
  SELECT src, dst AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY src
           ORDER BY cosine DESC, dst ASC) AS BIGINT) AS rank
  FROM p
)
SELECT src, neighbor_id, rank, cosine FROM r
WHERE rank <= ${graft.operators.Similarity.KnnGraphK}"""
  }

  /** Mirror of [[graft.operators.Similarity.nnDescentGraph]] (q201):
    * the same rank-space hashed init spokes, then
    * [[graft.operators.Similarity.NnDescentRounds]] UNROLLED rounds
    * (the q195 discipline) of undirected closure →
    * neighbors-of-neighbors union → exact-cosine top-k. Each round's
    * CTEs are MATERIALIZED so DuckDB evaluates the round boundary
    * once, like Spark's per-round persist. */
  def nnDescentGraph: String = {
    import graft.operators.Sampling.HashMult
    import graft.operators.Similarity.{KnnGraphK, NnDescentInitK,
      NnDescentRankMask, NnDescentRounds}
    val roundCtes = (1 to NnDescentRounds).map { i =>
      val prev = if (i == 1) "init" else s"e${i - 1}"
      s"""und$i AS MATERIALIZED (
  SELECT src, dst FROM $prev UNION SELECT dst, src FROM $prev
), cand$i AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM und$i
    UNION ALL
    SELECT a.src, b.dst FROM und$i a JOIN und$i b ON a.dst = b.src
  ) WHERE src <> dst
), p$i AS (
  SELECT c.src, c.dst,
         ${dotSql("va.v", "vb.v")} / (va.nrm * vb.nrm) AS cosine
  FROM cand$i c JOIN n va ON va.vec_id = c.src
                JOIN n vb ON vb.vec_id = c.dst
), e$i AS MATERIALIZED (
  SELECT src, dst, cosine,
         CAST(row_number() OVER (PARTITION BY src
           ORDER BY cosine DESC, dst ASC) AS BIGINT) AS rank
  FROM p$i
  QUALIFY rank <= $KnnGraphK
)"""
    }.mkString(", ")
    s"""$embCtes
, ranked AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS r
  FROM n
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM n
), spokes AS (
  SELECT vec_id,
         ((((r % $NnDescentRankMask) * 8 + t.j) * $HashMult)
           // 1048576 + r) % nn AS tr
  FROM ranked CROSS JOIN tot,
       LATERAL (SELECT unnest(range(0, $NnDescentInitK)) AS j) t
), init AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM spokes a JOIN ranked b ON b.r = a.tr
  WHERE a.vec_id <> b.vec_id
), $roundCtes
SELECT src, dst AS neighbor_id, rank, cosine
FROM e$NnDescentRounds"""
  }

  /** Mirror of [[graft.operators.Graph.adamicAdar]] (q202) over the
    * [[knnGraph]] edges: same undirected closure, 2-hop candidate
    * build, anti-join edge exclusion, and v-ordered 1/ln(deg)
    * fold. */
  def adamicAdar: String = {
    import graft.operators.Graph.AdamicAdarMinCommon
    s"""WITH g0 AS MATERIALIZED (
$knnGraph
), und AS MATERIALIZED (
  SELECT src, neighbor_id AS dst FROM g0
  UNION
  SELECT neighbor_id AS src, src AS dst FROM g0
), deg AS (
  SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
  FROM und GROUP BY src
), hop2 AS (
  SELECT a.src AS u, b.dst AS w, a.dst AS v
  FROM und a JOIN und b ON a.dst = b.src AND a.src < b.dst
), nonedge AS (
  SELECT u, w, v FROM hop2
  ANTI JOIN und ON hop2.u = und.src AND hop2.w = und.dst
)
SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn_count,
       list_reduce(list_prepend(0.0,
         list(1.0 / ln(CAST(deg AS DOUBLE)) ORDER BY v)),
         (a, b) -> a + b) AS aa_score
FROM nonedge JOIN deg USING (v)
GROUP BY u, w
HAVING COUNT(*) >= $AdamicAdarMinCommon"""
  }

  /** Mirror of [[graft.operators.Similarity.jlProject]] (q205): the
    * SAME Scala-generated ±1 sign rows inlined as list literals (the
    * dedupPlanes discipline), the same sequential-fold dot and the
    * single √k division. */
  def jlProject: String = {
    import graft.operators.Similarity.{JlOutDim, jlSigns}
    val cols = (0 until JlOutDim).map { j =>
      val s = jlSigns(j).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"${fsumSql(s"list_transform(range(1, ${SimilarityParams.Dim + 1}), " +
        s"i -> $s[i] * v[i])")} / ${math.sqrt(JlOutDim.toDouble)} " +
        s"AS p${j + 1}"
    }.mkString(",\n       ")
    s"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
       $cols
FROM e"""
  }

  /** Mirror of [[graft.operators.Similarity.rocchioDenseTopK]]
    * (q210): exact-cosine feedback at depth k, neighbor-ordered
    * element-wise centroid fold, α/β mix, and the re-ranked top-k. */
  def rocchioDenseTopK: String = {
    import graft.operators.Similarity.{RocchioAlpha, RocchioBeta,
      RocchioFbK}
    import graft.operators.SimilarityParams.TopK
    val dim = SimilarityParams.Dim
    s"""$embCtes
, p0 AS (
  SELECT query_id, vec_id,
         ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM q, n
  WHERE vec_id <> query_id
), fb AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM p0
  ) WHERE rank <= $RocchioFbK
), cent0 AS (
  SELECT f.query_id,
         list(n.v ORDER BY f.neighbor_id) AS fvs,
         CAST(COUNT(*) AS BIGINT) AS nf
  FROM fb f JOIN n ON n.vec_id = f.neighbor_id
  GROUP BY f.query_id
), cent AS (
  SELECT query_id,
         list_transform(range(1, ${dim + 1}), i ->
           list_reduce(list_prepend(0.0,
             list_transform(fvs, x -> x[i])), (a, b) -> a + b)
           / nf) AS c
  FROM cent0
), adj AS (
  SELECT q.query_id,
         list_transform(range(1, ${dim + 1}), i ->
           $RocchioAlpha * q.qv[i] + $RocchioBeta * c.c[i]) AS qv
  FROM q JOIN cent c USING (query_id)
), adjn AS (
  SELECT query_id, qv,
         sqrt(${fsumSql("list_transform(qv, x -> x * x)")}) AS qn
  FROM adj
), p AS (
  SELECT a.query_id, n.vec_id,
         ${dotSql("a.qv", "n.v")} / (a.qn * n.nrm) AS cosine
  FROM adjn a, n
  WHERE n.vec_id <> a.query_id
), r AS (
  SELECT query_id, vec_id AS neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, cosine FROM r
WHERE rank <= $TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.labelDisagreement]]
    * (q203) over the [[knnGraph]] edges: per-src neighbor-label
    * votes, modal pick by (cnt DESC, label ASC), suspect = own label
    * differs. */
  def labelDisagreement: String =
    s"""WITH g0 AS MATERIALIZED (
$knnGraph
), lab AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
), votes AS (
  SELECT g0.src, lab.label AS nbr_label,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g0 JOIN lab ON lab.vec_id = g0.neighbor_id
  GROUP BY g0.src, lab.label
), tot AS (
  SELECT src, CAST(SUM(cnt) AS BIGINT) AS n_nbrs
  FROM votes GROUP BY src
), modal AS (
  SELECT src, nbr_label AS modal_label, cnt AS modal_count
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY src
    ORDER BY cnt DESC, nbr_label ASC) = 1
)
SELECT m.src AS vec_id, lab.label, m.modal_label, m.modal_count,
       t.n_nbrs, lab.label <> m.modal_label AS suspect
FROM modal m JOIN tot t ON t.src = m.src
             JOIN lab ON lab.vec_id = m.src"""

  /** Mirror of [[graft.operators.Graph.triangleCounts]] (q132): the
    * oracle enumerates triangles from the DEFINITION (id-ordered
    * u<v<w over the mutual undirected edge set — one triangle per
    * 3-clique) while Spark runs the degree-ordered orientation; the
    * two enumerate the same triangle SET, so per-node counts match
    * exactly. lcc repeats the operator's literal/operand order
    * (2.0·T first, then ÷ deg·(deg−1)) rounded to the shared
    * [[graft.operators.Graph.RankRoundDigits]]. */
  def triangleCounts: String = {
    import graft.operators.Graph.RankRoundDigits
    s"""WITH g AS MATERIALIZED (
  SELECT src, neighbor_id FROM ($knnGraph)
), e AS MATERIALIZED (
  SELECT a.src AS u, a.neighbor_id AS v
  FROM g a JOIN g b
    ON a.src = b.neighbor_id AND a.neighbor_id = b.src
  WHERE a.src < a.neighbor_id
  GROUP BY ALL
), deg AS (
  SELECT node_id, COUNT(*) AS degree FROM (
    SELECT u AS node_id FROM e UNION ALL SELECT v AS node_id FROM e)
  GROUP BY node_id
), t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), tc AS (
  SELECT node_id, COUNT(*) AS triangles FROM (
    SELECT a AS node_id FROM t
    UNION ALL SELECT b AS node_id FROM t
    UNION ALL SELECT c AS node_id FROM t)
  GROUP BY node_id
)
SELECT d.node_id, d.degree,
       COALESCE(tc.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN round(2.0 * COALESCE(tc.triangles, 0)
                   / (d.degree * (d.degree - 1)), $RankRoundDigits)
            ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN tc USING (node_id)"""
  }

  /** Mirror of [[graft.operators.Graph.hits]] (q144): the same
    * unnormalized integer HITS unrolled iteration-for-iteration —
    * every score is an exact BIGINT, so the compare needs no
    * rounding. */
  def hits: String = {
    import graft.operators.Graph.HitsIters
    val iters = (1 to HitsIters).map { k =>
      s""", a$k AS MATERIALIZED (
  SELECT nodes.node, COALESCE(s.auth, 0) AS auth
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS auth
    FROM edges e JOIN h${k - 1} h ON e.src = h.node
    GROUP BY e.dst) s USING (node)
), h$k AS MATERIALIZED (
  SELECT nodes.node, COALESCE(s.hub, 0) AS hub
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS hub
    FROM edges e JOIN a$k a ON e.dst = a.node
    GROUP BY e.src) s USING (node)
)"""
    }.mkString
    s"""WITH co AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM co
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
), h0 AS (
  SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes
)$iters
SELECT h.node, h.hub, a.auth
FROM h$HitsIters h JOIN a$HitsIters a USING (node)"""
  }

  /** Mirror of [[graft.operators.Graph.degreeProfile]] (q148): same
    * mutual edge set, |V|-bounded rank, and the ORDERED log-term
    * fold (list(ORDER BY rk) + list_reduce ≡ Spark's sort_array +
    * sequential aggregate); the degree-capped NULL case uses the
    * identical logsum > 0 guard. */
  def degreeProfile: String = {
    import graft.operators.Graph.HillK
    s"""WITH g AS MATERIALIZED (
  SELECT src, neighbor_id FROM ($knnGraph)
), e AS MATERIALIZED (
  SELECT a.src AS u, a.neighbor_id AS v
  FROM g a JOIN g b
    ON a.src = b.neighbor_id AND a.neighbor_id = b.src
  WHERE a.src < a.neighbor_id
  GROUP BY ALL
), deg AS (
  SELECT node_id, COUNT(*) AS degree FROM (
    SELECT u AS node_id FROM e UNION ALL SELECT v AS node_id FROM e)
  GROUP BY node_id
), t AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM(degree) AS BIGINT) // 2 AS n_edges,
         MIN(degree) AS min_degree,
         MAX(degree) AS max_degree
  FROM deg
), tk AS (
  SELECT degree, rk FROM (
    SELECT degree, row_number() OVER (ORDER BY degree DESC,
      node_id ASC) AS rk
    FROM deg) WHERE rk <= $HillK
), hl AS (
  SELECT CAST(len(lst) AS BIGINT) AS hill_k,
         lst[-1] AS dk,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(lst,
             d -> ln(CAST(d AS DOUBLE) / lst[-1]))),
           (a, b) -> a + b) AS logsum
  FROM (SELECT list(degree ORDER BY rk) AS lst FROM tk)
)
SELECT t.n_nodes, t.n_edges, t.min_degree, t.max_degree,
       hl.hill_k, hl.dk,
       CASE WHEN hl.logsum > 0.0
            THEN CAST(1.0 AS DOUBLE) + hl.hill_k / hl.logsum
            ELSE NULL END AS hill_alpha
FROM t, hl"""
  }

  /** Mirror of [[graft.operators.Graph.kCore]] (q141): the peel loop
    * unrolled round-for-round ([[graft.operators.Graph.KCoreRounds]]
    * CTE stages over the same mutual edge set — the q99/q103 unroll
    * discipline); identical k threshold and final within-core degree
    * count. */
  /** Mirror of [[graft.operators.Graph.labelPropagation]] (q189):
    * the same mutual edge set as q132's oracle, the vote rounds
    * unrolled CTE-for-round (q99/q141 discipline) — per round a
    * (node, label) count off the bidirectional adjacency, the winner
    * by (n DESC, label ASC) row_number, non-voters carried by the
    * left join's COALESCE. */
  def labelPropagation: String = {
    import graft.operators.Graph.LabelPropRounds
    s"""$lpaCtes
SELECT node_id, label FROM lab$LabelPropRounds"""
  }

  /** The shared LPA chain (q189/q194): mutual edge set `e`,
    * bidirectional adjacency `adj`, vote rounds unrolled to
    * `lab<rounds>`. */
  private def lpaCtes: String = {
    import graft.operators.Graph.LabelPropRounds
    val rounds = (1 to LabelPropRounds).map { r =>
      s""", cnt$r AS (
  SELECT adj.node, l.label, COUNT(*) AS n
  FROM adj JOIN lab${r - 1} l ON l.node_id = adj.nbr
  GROUP BY adj.node, l.label
), best$r AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
             ORDER BY n DESC, label ASC) AS rn
    FROM cnt$r) WHERE rn = 1
), lab$r AS MATERIALIZED (
  SELECT l.node_id, COALESCE(b.label, l.label) AS label
  FROM lab${r - 1} l LEFT JOIN best$r b ON b.node = l.node_id
)"""
    }.mkString
    s"""WITH g AS MATERIALIZED (
  SELECT src, neighbor_id FROM ($knnGraph)
), e AS MATERIALIZED (
  SELECT a.src AS u, a.neighbor_id AS v
  FROM g a JOIN g b
    ON a.src = b.neighbor_id AND a.neighbor_id = b.src
  WHERE a.src < a.neighbor_id
  GROUP BY ALL
), adj AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM e
  UNION ALL SELECT v AS node, u AS nbr FROM e
), lab0 AS (
  SELECT vec_id AS node_id, vec_id AS label FROM embeddings
)$rounds"""
  }

  /** Mirror of [[graft.operators.Graph.modularity]] (q194): the same
    * LPA chain, then exact-BIGINT intra-edge / degree-mass / size
    * aggregates and the fixed-order Q_c double formula (i/m −
    * (d/2m)² with the operator's literal operand order — no rounding
    * step). */
  def modularity: String = {
    import graft.operators.Graph.LabelPropRounds
    val lab = s"lab$LabelPropRounds"
    s"""$lpaCtes
, mtot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e
), intra AS (
  SELECT lu.label, CAST(COUNT(*) AS BIGINT) AS intra_edges
  FROM e
  JOIN $lab lu ON lu.node_id = e.u
  JOIN $lab lv ON lv.node_id = e.v
  WHERE lu.label = lv.label
  GROUP BY lu.label
), degm AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS deg_sum
  FROM (SELECT u AS node_id FROM e
        UNION ALL SELECT v AS node_id FROM e) d
  JOIN $lab l ON l.node_id = d.node_id
  GROUP BY l.label
), sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM $lab GROUP BY label
)
SELECT s.label, s.n_nodes,
       COALESCE(i.intra_edges, CAST(0 AS BIGINT)) AS intra_edges,
       COALESCE(d.deg_sum, CAST(0 AS BIGINT)) AS deg_sum,
       CAST(COALESCE(i.intra_edges, 0) AS DOUBLE) / m.m
         - (CAST(COALESCE(d.deg_sum, 0) AS DOUBLE) / (2.0 * m.m))
           * (CAST(COALESCE(d.deg_sum, 0) AS DOUBLE) / (2.0 * m.m))
         AS q_c
FROM sizes s
LEFT JOIN degm d USING (label)
LEFT JOIN intra i USING (label)
CROSS JOIN mtot m"""
  }

  def kCore: String = {
    import graft.operators.Graph.{KCoreK, KCoreRounds}
    val rounds = (1 to KCoreRounds).map { r =>
      val prev = s"e${r - 1}"
      s""", d$r AS (
  SELECT node_id, COUNT(*) AS degree FROM (
    SELECT u AS node_id FROM $prev
    UNION ALL SELECT v AS node_id FROM $prev)
  GROUP BY node_id
), k$r AS (
  SELECT node_id FROM d$r WHERE degree >= $KCoreK
), e$r AS MATERIALIZED (
  SELECT p.u, p.v FROM $prev p
  JOIN k$r a ON p.u = a.node_id
  JOIN k$r b ON p.v = b.node_id
)"""
    }.mkString
    s"""WITH g AS MATERIALIZED (
  SELECT src, neighbor_id FROM ($knnGraph)
), e0 AS MATERIALIZED (
  SELECT a.src AS u, a.neighbor_id AS v
  FROM g a JOIN g b
    ON a.src = b.neighbor_id AND a.neighbor_id = b.src
  WHERE a.src < a.neighbor_id
  GROUP BY ALL
)$rounds
SELECT node_id, COUNT(*) AS core_degree FROM (
  SELECT u AS node_id FROM e$KCoreRounds
  UNION ALL SELECT v AS node_id FROM e$KCoreRounds)
GROUP BY node_id"""
  }

  /** Mirror of [[graft.operators.Multimodal.multimodalMeta]] (q21):
    * the same deterministic media derivation (magic header by
    * doc_id % 4 ++ UTF-8 text), mime by the same header→mime map the
    * sniffer implements, and the frame sampling arithmetic of
    * [[graft.operators.Multimodal.sampleFrames]] (chunks of
    * MetaFrameBytes, keep every MetaFrameStride-th, last chunk
    * ragged). */
  def multimodalMeta: String = {
    import graft.operators.Multimodal.{MetaFrameBytes, MetaFrameStride}
    s"""WITH m AS (
  SELECT doc_id AS media_id,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'image' WHEN 1 THEN 'image'
      WHEN 2 THEN 'audio' ELSE 'video' END AS kind,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 4 ELSE 3
      END + octet_length(encode(text)) AS n_bytes
  FROM documents
), frames AS (
  SELECT *, CAST(CEIL(n_bytes / $MetaFrameBytes.0) AS BIGINT) AS n_frames
  FROM m
), fidx AS (
  SELECT media_id, mime, n_frames, n_bytes,
         unnest(range(0, n_frames)) AS i
  FROM frames
), f AS (
  SELECT media_id, mime,
    CASE WHEN i = n_frames - 1 THEN n_bytes - $MetaFrameBytes * i
         ELSE $MetaFrameBytes END AS frame_bytes
  FROM fidx WHERE i % $MetaFrameStride = 0
), agg AS (
  SELECT media_id, mime,
         COUNT(*) AS n_frames_sampled,
         CAST(SUM(frame_bytes) AS BIGINT) AS sampled_bytes
  FROM f GROUP BY media_id, mime
)
SELECT m.media_id, m.kind, CAST(m.n_bytes AS BIGINT) AS n_bytes,
       agg.mime, agg.n_frames_sampled, agg.sampled_bytes
FROM m JOIN agg USING (media_id)"""
  }

  /** Mirror of [[graft.operators.RelationalQueries.ordersByNation]]. */
  def ordersByNation: String =
    """SELECT n_name, o_orderpriority,
       COUNT(*) AS n_orders,
       SUM(o_totalprice) AS sum_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderpriority"""

  /** Mirror of [[graft.operators.RelationalQueries.topUsers]]. */
  def topUsers: String =
    """WITH g AS (
  SELECT user_id, COUNT(*) AS n_events, SUM(value) AS sum_value
  FROM events GROUP BY user_id
), r AS (
  SELECT *, CAST(row_number() OVER (
    ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank
  FROM g
)
SELECT user_id, n_events, sum_value, rank FROM r WHERE rank <= 20"""

  /** Mirror of [[graft.operators.RelationalQueries.userSessions]]:
    * gaps-and-islands reconstruction of Spark's session_window —
    * a new session starts when the gap to the previous event is
    * >= the 2-hour timeout; session end = last event + timeout. */
  def userSessions: String =
    """WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000000 AS ms, value FROM events
), o AS (
  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                   OR ms - lag(ms) OVER w >= 7200000
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       MIN(ms) AS session_start_ms,
       MAX(ms) + 7200000 AS session_end_ms,
       COUNT(*) AS n_events,
       SUM(value) AS sum_value
FROM s GROUP BY user_id, sid"""

  /** Mirror of [[graft.operators.GlobalIndex.budgetPack]] (q155):
    * the single-reducer `SUM OVER (ORDER BY)` running sum the
    * distributed prefix-sum operator avoids — same greedy order
    * (density DESC, doc_id), same inclusive cumulative, same budget
    * cut; quality tree and token estimate are the q6/q133
    * expressions. */
  def budgetPack: String = {
    val stops = sqlList(TextAnalysis.stopwords).replace("(", "[")
      .replace(")", "]")
    val budget = graft.operators.GlobalIndex.PackBudgetTokens
    s"""WITH d0 AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
    CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_tokens,
    LEAST(len(w) / 50.0, 1.0)
      * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
      * (1.0 - 0.5 * (CAST(len(list_filter(w,
            t -> list_contains($stops, t))) AS DOUBLE) / len(w)))
      AS quality_score
  FROM d0
), dn AS (
  SELECT doc_id, est_tokens,
         quality_score / est_tokens AS density
  FROM s
), c AS (
  SELECT *,
    CAST(SUM(est_tokens) OVER (ORDER BY density DESC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM dn
)
SELECT doc_id, est_tokens, density, cum_tokens
FROM c WHERE cum_tokens <= $budget"""
  }

  /** Mirror of [[graft.operators.Profiling.psiDrift]] (q154):
    * integer bin arithmetic, exact counts, identical smoothing and
    * term order, row-sequential cumulative. */
  def psiDrift: String = {
    val b = graft.operators.Profiling.PsiBins
    s"""WITH k AS (
  SELECT (MAX(n_chars) // $b) + 1 AS w,
         (MIN(doc_id) + MAX(doc_id)) // 2 AS split
  FROM documents
), bn AS (
  SELECT LEAST(n_chars // k.w, ${b - 1}) AS bin,
         doc_id <= k.split AS ref
  FROM documents, k
), c AS (
  SELECT bin,
         CAST(SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(SUM(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT)
           AS n_cur
  FROM bn GROUP BY bin
), t AS (
  SELECT *,
    CAST(SUM(n_ref) OVER () AS BIGINT) AS tot_ref,
    CAST(SUM(n_cur) OVER () AS BIGINT) AS tot_cur
  FROM c
), p AS (
  SELECT bin, n_ref, n_cur,
    CAST(n_ref + 1 AS DOUBLE) / (tot_ref + $b) AS p_ref,
    CAST(n_cur + 1 AS DOUBLE) / (tot_cur + $b) AS p_cur
  FROM t
), tm AS (
  SELECT *, (p_ref - p_cur) * ln(p_ref / p_cur) AS term FROM p
)
SELECT bin, n_ref, n_cur, p_ref, p_cur, term,
       SUM(term) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
         AS cum_psi
FROM tm"""
  }

  /** Closure-property oracle of
    * [[graft.operators.EventsQueries.pointInTimeJoin]] (q161): the
    * PIT enrichment against the event stream's OWN dimension must
    * reproduce each event's directly computed attribute — computed
    * here with NO dimension machinery at all, so any structural
    * drift in the SCD2 + PIT pipeline mismatches. */
  def pitJoinClosure: String =
    """SELECT user_id, event_id,
       epoch_ns(ts) // 1000000 AS ts_ms,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS tier
FROM events"""

  /** Mirror of [[graft.operators.EventsQueries.hourlyAcf]] (q160):
    * same hourly frame, lag explode/join, exact integer moments and
    * the identical expanded-form expression. */
  def hourlyAcf: String = {
    val maxLag = graft.operators.EventsQueries.AcfMaxLag
    s"""WITH h AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000) // 3600000 AS hour_id,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, hour_id
), t AS (
  SELECT event_type, COUNT(*) AS n_h,
         CAST(SUM(n_events) AS BIGINT) AS sx,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sq
  FROM h GROUP BY event_type
), lags AS (
  SELECT unnest(range(1, ${maxLag + 1})) AS lag
), p AS (
  SELECT a.event_type, l.lag,
         COUNT(*) AS n_pairs,
         CAST(SUM(a.n_events * b.n_events) AS BIGINT) AS sxy,
         CAST(SUM(a.n_events) AS BIGINT) AS sa,
         CAST(SUM(b.n_events) AS BIGINT) AS sb
  FROM h a CROSS JOIN lags l
  JOIN h b ON b.event_type = a.event_type
          AND b.hour_id = a.hour_id + l.lag
  GROUP BY a.event_type, l.lag
)
SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, p.n_pairs,
  ((CAST(p.sxy AS DOUBLE)
     - (CAST(t.sx AS DOUBLE) / t.n_h) * (p.sa + p.sb)
     + p.n_pairs * ((CAST(t.sx AS DOUBLE) / t.n_h)
                    * (CAST(t.sx AS DOUBLE) / t.n_h)))
   / (CAST(t.sq AS DOUBLE)
     - t.n_h * ((CAST(t.sx AS DOUBLE) / t.n_h)
                * (CAST(t.sx AS DOUBLE) / t.n_h)))) AS acf
FROM p JOIN t USING (event_type)"""
  }

  /** Mirror of [[graft.operators.EventsQueries.benfordScreen]]
    * (q159): same string-derived first digit over exact cents, the
    * identical Scala-computed expectation literals (CAST to
    * DOUBLE), term order and sequential cumulative. */
  def benfordScreen: String = {
    val cases = (1 to 9).map(d =>
      s"WHEN digit = $d THEN CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE)")
      .mkString("\n           ")
    s"""WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
), dg AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
    AS digit
  FROM c WHERE cents > 0
), n AS (
  SELECT digit, COUNT(*) AS n FROM dg GROUP BY digit
), t AS (
  SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS total,
    CASE $cases END AS expected_frac
  FROM n
), tm AS (
  SELECT *,
    CAST(n AS DOUBLE) / total AS observed_frac,
    (n - expected_frac * total) * (n - expected_frac * total)
      / (expected_frac * total) AS term
  FROM t
)
SELECT digit, n, observed_frac, expected_frac, term,
       SUM(term) OVER (ORDER BY digit ROWS UNBOUNDED PRECEDING)
         AS cum_chi2
FROM tm"""
  }

  /** Mirror of [[graft.operators.EventsQueries.bootstrapCiMean]]
    * (q158): the same shifted-hash replica membership, exact-cents
    * conditional sums, ordered replica-mean band. */
  def bootstrapCiMean: String = {
    import graft.operators.EventsQueries.BootstrapB
    import graft.operators.Sampling.HashMult
    val b = BootstrapB
    def keep(r: Int) =
      s"(((event_id * $HashMult) // 1048576 + $r * 7919) % 1000) < 500"
    val sums = (0 until b).flatMap { r =>
      Seq(
        s"CAST(SUM(CASE WHEN ${keep(r)} THEN cents ELSE 0 END) AS BIGINT) AS s_$r",
        s"CAST(SUM(CASE WHEN ${keep(r)} THEN 1 ELSE 0 END) AS BIGINT) AS n_$r")
    }.mkString(",\n         ")
    val meanList = (0 until b)
      .map(r => s"CAST(s_$r AS DOUBLE) / n_$r / 100.0")
      .mkString("[", ", ", "]")
    s"""WITH e AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT COUNT(*) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS s_all,
         $sums
  FROM e
), m AS (
  SELECT n_events,
         CAST(s_all AS DOUBLE) / n_events / 100.0 AS mean_value,
         list_sort($meanList) AS ms
  FROM w
)
SELECT n_events, mean_value,
       ms[1] AS ci_lo, ms[${b - 1}] AS ci_hi,
       CAST($b AS BIGINT) AS n_replicas
FROM m"""
  }

  /** Mirror of [[graft.operators.EventsQueries.dailyMixEntropy]]
    * (q168): same declared type list, same guarded terms, the
    * identical left-to-right addition order. */
  def dailyMixEntropy: String = {
    import graft.operators.EventsQueries.MixTypes
    val counts = MixTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS c_$t")
      .mkString(",\n         ")
    def term(t: String) =
      s"""CASE WHEN c_$t > 0
          THEN -((CAST(c_$t AS DOUBLE) / n)
                 * ln(CAST(c_$t AS DOUBLE) / n))
          ELSE 0.0 END"""
    val h = MixTypes.map(term).mkString("(", "\n      + ", ")")
    val lnK = math.log(MixTypes.size)
    s"""WITH d AS (
  SELECT (epoch_ns(ts) // 1000000) // 86400000 AS day,
         COUNT(*) AS n,
         $counts
  FROM events GROUP BY day
), e AS (
  SELECT *, $h AS h_nats FROM d
)
SELECT *, h_nats / CAST($lnK AS DOUBLE) AS evenness FROM e"""
  }

  /** Mirror of [[graft.operators.EventsQueries.cohortLtv]] (q167):
    * same cohort/bucket arithmetic, exact cents, row-sequential
    * cumulative, fixed LTV operand order. */
  def cohortLtv: String = {
    val wk = graft.operators.EventsQueries.CohortWeekMs
    s"""WITH w AS (
  SELECT user_id, event_type,
         (epoch_ns(ts) // 1000000) // $wk AS week,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), c AS (
  SELECT user_id, MIN(week) AS cohort_week
  FROM w WHERE event_type = 'signup' GROUP BY user_id
), sz AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM c
  GROUP BY cohort_week
), r AS (
  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
         COUNT(*) AS n_purchases,
         CAST(SUM(w.cents) AS BIGINT) AS week_cents
  FROM w JOIN c USING (user_id)
  WHERE w.event_type = 'purchase' AND w.week - c.cohort_week >= 0
  GROUP BY c.cohort_week, w.week - c.cohort_week
), m AS (
  SELECT r.*, sz.cohort_size,
    CAST(SUM(r.week_cents) OVER (PARTITION BY r.cohort_week
      ORDER BY r.week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum_cents
  FROM r JOIN sz USING (cohort_week)
)
SELECT cohort_week, week_offset, cohort_size, n_purchases,
       week_cents,
       CAST(cum_cents AS DOUBLE) / cohort_size / 100.0
         AS ltv_per_user
FROM m"""
  }

  /** Mirror of [[graft.operators.EventsQueries.giniLorenz]] (q166):
    * exact integer rank moments, identical decile arithmetic and
    * Gini operand order. */
  def giniLorenz: String =
    """WITH r AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), k AS (
  SELECT *,
    CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS i
  FROM r
), t AS (
  SELECT *,
    CAST(MAX(i) OVER () AS BIGINT) AS n,
    CAST(SUM(cents) OVER () AS BIGINT) AS s,
    i * cents AS ix,
    ((i - 1) * 10) // (CAST(MAX(i) OVER () AS BIGINT)) + 1 AS decile
  FROM k
), d AS (
  SELECT decile, COUNT(*) AS n_users,
         CAST(SUM(cents) AS BIGINT) AS dc,
         MAX(n) AS n, MAX(s) AS s,
         CAST(SUM(ix) AS BIGINT) AS six
  FROM t GROUP BY decile
), g AS (
  SELECT *,
    CAST(SUM(six) OVER () AS BIGINT) AS six_all,
    CAST(SUM(dc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
      AS BIGINT) AS cum
  FROM d
)
SELECT decile, n_users,
       CAST(dc AS DOUBLE) / s AS decile_share,
       CAST(cum AS DOUBLE) / s AS cum_share,
       (2.0 * CAST(six_all AS DOUBLE)) / CAST(n * s AS DOUBLE)
         - CAST(n + 1 AS DOUBLE) / n AS gini
FROM g"""

  /** Mirror of [[graft.operators.EventsQueries.ksTest]] (q165):
    * integer cross-multiplied ECDF gaps, one exact ratio, shared
    * asymptotic coefficient. */
  def ksTest: String = {
    import graft.operators.EventsQueries.KsC95
    s"""WITH o AS (
  SELECT ${graft.operators.Sampling.mixedSql("user_id")} % 2 AS arm,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), v AS (
  SELECT cents,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM o GROUP BY cents
), c AS (
  SELECT *,
    CAST(SUM(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
      AS BIGINT) AS cumA,
    CAST(SUM(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
      AS BIGINT) AS cumB,
    CAST(SUM(ca) OVER () AS BIGINT) AS na,
    CAST(SUM(cb) OVER () AS BIGINT) AS nb
  FROM v
), g AS (
  SELECT MAX(abs(cumA * nb - cumB * na)) AS max_gap,
         MAX(na) AS na, MAX(nb) AS nb
  FROM c
)
SELECT na, nb,
       CAST(max_gap AS DOUBLE) / (na * nb) AS d,
       CAST($KsC95 AS DOUBLE)
         * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)) AS crit,
       CAST(max_gap AS DOUBLE) / (na * nb)
         > CAST($KsC95 AS DOUBLE)
           * sqrt(CAST(na + nb AS DOUBLE) / (na * nb))
         AS significant
FROM g"""
  }

  /** Mirror of [[graft.operators.EventsQueries.mannWhitney]]
    * (q164): the doubled-rank integer arithmetic, the same
    * tie-corrected variance operand order, the shared z line. */
  def mannWhitney: String = {
    import graft.operators.EventsQueries.WilsonZ
    s"""WITH o AS (
  SELECT ${graft.operators.Sampling.mixedSql("user_id")} % 2 AS arm,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), v AS (
  SELECT cents, COUNT(*) AS t,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ta
  FROM o GROUP BY cents
), b AS (
  SELECT *, COALESCE(SUM(t) OVER (ORDER BY cents
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM v
), a AS (
  SELECT CAST(SUM(ta) AS BIGINT) AS na,
         CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(ta * (2 * below + t + 1)) AS BIGINT) AS r2a,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM b
), s AS (
  SELECT na, n - na AS nb, n, r2a, ties FROM a
), m AS (
  SELECT na, nb,
    (CAST(r2a AS DOUBLE) - CAST(na * (na + 1) AS DOUBLE)) / 2.0
      AS u_a,
    CAST(na AS DOUBLE) * nb / 2.0 AS mu_u,
    sqrt(CAST(na AS DOUBLE) * nb / 12.0
      * (CAST(n + 1 AS DOUBLE)
         - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))
      AS sigma_u
  FROM s
)
SELECT na, nb, u_a, mu_u, sigma_u,
       CASE WHEN sigma_u > 0.0 THEN (u_a - mu_u) / sigma_u
            ELSE 0.0 END AS z,
       abs(CASE WHEN sigma_u > 0.0 THEN (u_a - mu_u) / sigma_u
                ELSE 0.0 END) > CAST($WilsonZ AS DOUBLE)
         AS significant
FROM m"""
  }

  /** Mirror of [[graft.operators.EventsQueries.conversionWilson]]
    * (q163): identical center/half-width operand order under the
    * shared z literal (CAST to DOUBLE — DECIMAL widening). */
  def conversionWilson: String = {
    val z = graft.operators.EventsQueries.WilsonZ
    s"""WITH d AS (
  SELECT (epoch_ns(ts) // 1000000) // 86400000 AS day,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           END) AS BIGINT) AS k
  FROM events GROUP BY day
), w AS (
  SELECT *, CAST(k AS DOUBLE) / n AS p_hat,
         CAST($z AS DOUBLE) AS z
  FROM d
), c AS (
  SELECT *,
    (p_hat + z * z / (2.0 * n)) / (1.0 + z * z / n) AS center,
    z * sqrt(p_hat * (1.0 - p_hat) / n
             + z * z / (4.0 * n * n)) / (1.0 + z * z / n) AS half
  FROM w
)
SELECT day, n, k, p_hat,
       center - half AS wilson_lo, center + half AS wilson_hi,
       p_hat - z * sqrt(p_hat * (1.0 - p_hat) / n) AS wald_lo,
       p_hat + z * sqrt(p_hat * (1.0 - p_hat) / n) AS wald_hi
FROM c"""
  }

  /** Mirror of [[graft.operators.EventsQueries.sprtDaily]] (q157):
    * the same per-unit log-increments computed from the shared
    * p0/p1 literals, the row-sequential running LLR, prefix
    * extremes, and the identical decision CASE. */
  def sprtDaily: String = {
    import graft.operators.EventsQueries.{SprtBound, SprtP0, SprtP1}
    val incPos = math.log(SprtP1 / SprtP0)
    val incNeg = math.log((1 - SprtP1) / (1 - SprtP0))
    s"""WITH d AS (
  SELECT (epoch_ns(ts) // 1000000) // 86400000 AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           END) AS BIGINT) AS n_purchases
  FROM events GROUP BY day
), r AS (
  SELECT *,
    SUM(n_purchases * CAST($incPos AS DOUBLE)
        + (n_events - n_purchases) * CAST($incNeg AS DOUBLE))
      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS llr
  FROM d
), x AS (
  SELECT *,
    MAX(llr) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS hi,
    MIN(llr) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS lo
  FROM r
)
SELECT day, n_events, n_purchases, llr,
  CASE WHEN hi > $SprtBound AND lo < -$SprtBound THEN
         CASE WHEN hi + lo >= 0 THEN 'accept_h1'
              ELSE 'accept_h0' END
       WHEN hi > $SprtBound THEN 'accept_h1'
       WHEN lo < -$SprtBound THEN 'accept_h0'
       ELSE 'continue' END AS decision
FROM x"""
  }

  /** Mirror of [[graft.operators.EventsQueries.kaplanMeier]]
    * (q152): same day buckets, censor rule, reverse-cumulative risk
    * set, guarded ln-prefix product (the zero-factor guard is the
    * portability fix — Spark log(0) is NULL, DuckDB −inf). */
  def kaplanMeier: String = {
    import graft.operators.EventsQueries.KmCensorDays
    s"""WITH e AS (
  SELECT user_id, (epoch_ns(ts) // 1000000) // 86400000 AS day
  FROM events
), u AS (
  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
  FROM e GROUP BY user_id
), mx AS (
  SELECT MAX(day) AS max_day FROM e
), lf AS (
  SELECT last_day - first_day AS t,
         last_day <= max_day - $KmCensorDays AS churned
  FROM u, mx
), bt AS (
  SELECT t,
         CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
           AS d,
         CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
           AS c
  FROM lf GROUP BY t
), rk AS (
  SELECT *,
    CAST(SUM(d + c) OVER (ORDER BY t
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      AS n_risk
  FROM bt
), fc AS (
  SELECT *, 1.0 - CAST(d AS DOUBLE) / n_risk AS factor FROM rk
), ln_ AS (
  SELECT *,
    CASE WHEN factor > 0.0 THEN ln(factor) ELSE 0.0 END AS lnf,
    CASE WHEN factor = 0.0 THEN 1 ELSE 0 END AS z
  FROM fc
), pr AS (
  SELECT *,
    SUM(lnf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum,
    SUM(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zeros
  FROM ln_
)
SELECT t AS t_days, n_risk, d AS n_churned, c AS n_censored,
       CASE WHEN zeros > 0 THEN 0.0 ELSE exp(lnsum) END AS survival
FROM pr"""
  }

  /** Mirror of [[graft.operators.EventsQueries.cusumAnomalies]]
    * (q150): same exact-integer moments, the same closed-form
    * prefix-min identity under explicit ROWS frames, shared κ/h
    * literals. */
  def cusumAnomalies: String = {
    import graft.operators.EventsQueries.{CusumH, CusumK}
    """WITH h AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000) // 3600000 AS hour_id,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, hour_id
), st AS (
  SELECT event_type, COUNT(*) AS n_h,
         CAST(SUM(n_events) AS BIGINT) AS sx,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sq
  FROM h GROUP BY event_type
), mu AS (
  SELECT event_type,
         CAST(sx AS DOUBLE) / n_h AS mu,
         sqrt(CAST(n_h * sq - sx * sx AS DOUBLE)) / n_h AS sigma
  FROM st
), dv AS (
  SELECT h.event_type, h.hour_id, h.n_events, mu.sigma,
         h.n_events - (mu.mu + """ + CusumK + """ * mu.sigma) AS dev
  FROM h JOIN mu USING (event_type)
), pr AS (
  SELECT *,
    SUM(dev) OVER (PARTITION BY event_type ORDER BY hour_id
      ROWS UNBOUNDED PRECEDING) AS p
  FROM dv
), cs AS (
  SELECT *,
    p - LEAST(MIN(p) OVER (PARTITION BY event_type ORDER BY hour_id
      ROWS UNBOUNDED PRECEDING), 0.0) AS cusum
  FROM pr
)
SELECT event_type, hour_id, n_events, cusum,
       cusum > """ + CusumH + """ * sigma AS alarm
FROM cs"""
  }

  /** Mirror of [[graft.operators.EventsQueries.pageHinkley]]
    * (q259): the same hourly/σ CTEs as q150, then the explicit
    * running mean (exact running LONG sum over the ordered row
    * index), prefix sum and prefix min of the deviations. */
  def pageHinkley: String = {
    import graft.operators.EventsQueries.{PhDelta, PhLambda}
    """WITH h AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000) // 3600000 AS hour_id,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, hour_id
), st AS (
  SELECT event_type, COUNT(*) AS n_h,
         CAST(SUM(n_events) AS BIGINT) AS sx,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sq
  FROM h GROUP BY event_type
), mu AS (
  SELECT event_type,
         sqrt(CAST(n_h * sq - sx * sx AS DOUBLE)) / n_h AS sigma
  FROM st
), o AS (
  SELECT h.event_type, h.hour_id, h.n_events, mu.sigma,
         CAST(row_number() OVER (PARTITION BY h.event_type
           ORDER BY h.hour_id) AS BIGINT) AS i,
         CAST(SUM(h.n_events) OVER (PARTITION BY h.event_type
           ORDER BY h.hour_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS rsum
  FROM h JOIN mu USING (event_type)
), dv AS (
  SELECT *,
         CAST(n_events AS DOUBLE) - CAST(rsum AS DOUBLE) / i -
           """ + PhDelta + """ * sigma AS dev
  FROM o
), pm AS (
  SELECT *,
    SUM(dev) OVER (PARTITION BY event_type ORDER BY hour_id
      ROWS UNBOUNDED PRECEDING) AS m
  FROM dv
), px AS (
  SELECT *,
    m - MIN(m) OVER (PARTITION BY event_type ORDER BY hour_id
      ROWS UNBOUNDED PRECEDING) AS ph
  FROM pm
)
SELECT event_type, hour_id, n_events, ph,
       ph > """ + PhLambda + """ * sigma AS alarm
FROM px"""
  }

  /** Mirror of [[graft.streaming.StreamingPageHinkley.monitor]]
    * (q260): the batch q259 derivation restricted to CLOSED hours —
    * each type's final observed hour is still open in state (the
    * q156 emission contract). */
  def pageHinkleyClosed: String =
    s"""WITH allhours AS (
  SELECT * FROM ($pageHinkley)
), mx AS (
  SELECT event_type, MAX(hour_id) AS mh
  FROM allhours GROUP BY event_type
)
SELECT f.event_type, f.hour_id, f.n_events, f.ph, f.alarm
FROM allhours f JOIN mx USING (event_type)
WHERE f.hour_id < mx.mh"""

  /** Mirror of [[graft.streaming.StreamingCusum.monitor]] (q156):
    * the batch q150 derivation restricted to CLOSED hours — each
    * type's final observed hour is still open in state (the q143
    * emission contract). */
  def cusumClosed: String =
    s"""WITH allhours AS (
  SELECT * FROM ($cusumAnomalies)
), mx AS (
  SELECT event_type, MAX(hour_id) AS mh
  FROM allhours GROUP BY event_type
)
SELECT f.event_type, f.hour_id, f.n_events, f.cusum, f.alarm
FROM allhours f JOIN mx USING (event_type)
WHERE f.hour_id < mx.mh"""

  /** Mirror of [[graft.operators.EventsQueries.hourlySeasonality]]
    * (q147): integer epoch-hour buckets, exact cents sums, identical
    * mean/index operand order. */
  def hourlySeasonality: String =
    """WITH e AS (
  SELECT event_type,
         ((epoch_ns(ts) // 1000000) // 3600000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT event_type, hour, COUNT(*) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sc
  FROM e GROUP BY event_type, hour
), t AS (
  SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS tn,
         CAST(SUM(sc) AS BIGINT) AS tc
  FROM h GROUP BY event_type
)
SELECT h.event_type, h.hour, h.n_events,
       CAST(h.sc AS DOUBLE) / h.n_events / 100.0 AS mean_value,
       (CAST(h.sc AS DOUBLE) / h.n_events)
         / (CAST(t.tc AS DOUBLE) / t.tn) AS seasonal_idx
FROM h JOIN t USING (event_type)"""

  /** Mirror of [[graft.operators.EventsQueries.mannKendallTrend]]
    * (q199): the same daily-cents collapse, LONG sign/variance
    * arithmetic, sorted-list explicit median, and CASE trend
    * labels. */
  def mannKendallTrend: String = {
    import graft.operators.EventsQueries.MkZCrit
    s"""WITH daily AS (
  SELECT event_type, (epoch_ns(ts) // 1000000) // 86400000 AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, (epoch_ns(ts) // 1000000) // 86400000
), pairs AS (
  SELECT a.event_type,
         CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn,
         CAST(b.cents - a.cents AS DOUBLE) /
           CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
), per_type AS (
  SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
         list(slope ORDER BY slope) AS slopes
  FROM pairs GROUP BY event_type
), nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
), ties AS (
  SELECT event_type,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, cents)
  GROUP BY event_type
), j AS (
  SELECT p.event_type, p.s_stat, p.slopes, n.n_days, t.tie_term,
         CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
           - t.tie_term AS DOUBLE) / 18.0 AS var_s,
         CAST(len(p.slopes) AS BIGINT) AS n_pairs
  FROM per_type p JOIN nd n USING (event_type)
       JOIN ties t USING (event_type)
), z AS (
  SELECT *,
         CASE WHEN var_s <= 0.0 THEN 0.0
              WHEN s_stat > 0
                THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
              WHEN s_stat < 0
                THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
              ELSE 0.0 END AS zv,
         CASE WHEN n_pairs % 2 = 1
                THEN slopes[CAST((n_pairs + 1) // 2 AS INT)]
              ELSE (slopes[CAST(n_pairs // 2 AS INT)] +
                    slopes[CAST(n_pairs // 2 AS INT) + 1]) / 2.0
              END AS theil_sen
  FROM j
)
SELECT event_type, n_days, n_pairs, s_stat, var_s, zv AS z,
       theil_sen,
       CASE WHEN zv >= $MkZCrit THEN 'increasing'
            WHEN zv <= -$MkZCrit THEN 'decreasing'
            ELSE 'none' END AS trend
FROM z"""
  }

  /** Mirror of [[graft.operators.EventsQueries.changepoint]] (q204):
    * same daily collapse, exact-LONG prefix sums, fixed-order SSE
    * doubles, and (cost, t) argmin pick. */
  def changepoint: String = {
    import graft.operators.EventsQueries.ChangepointGainFrac
    s"""WITH daily AS (
  SELECT event_type, (epoch_ns(ts) // 1000000) // 86400000 AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, (epoch_ns(ts) // 1000000) // 86400000
), cum AS (
  SELECT event_type, d, cents,
         CAST(row_number() OVER w AS BIGINT) AS t,
         CAST(SUM(cents) OVER w AS BIGINT) AS s,
         CAST(SUM(cents * cents) OVER w AS BIGINT) AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), totals AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sn,
         CAST(SUM(cents * cents) AS BIGINT) AS ssn
  FROM daily GROUP BY event_type
), cand AS (
  SELECT c.event_type, c.t, c.d, tt.n,
         (CAST(c.ss AS DOUBLE)
            - CAST(c.s AS DOUBLE) * CAST(c.s AS DOUBLE)
              / CAST(c.t AS DOUBLE))
         + (CAST(tt.ssn - c.ss AS DOUBLE)
            - CAST(tt.sn - c.s AS DOUBLE) * CAST(tt.sn - c.s AS DOUBLE)
              / CAST(tt.n - c.t AS DOUBLE)) AS cost,
         CAST(tt.ssn AS DOUBLE)
           - CAST(tt.sn AS DOUBLE) * CAST(tt.sn AS DOUBLE)
             / CAST(tt.n AS DOUBLE) AS cost_nosplit
  FROM cum c JOIN totals tt USING (event_type)
  WHERE c.t < tt.n
), best AS (
  SELECT event_type, n AS n_days, t AS split_t, d AS split_day,
         cost_nosplit, cost AS cost_split
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY event_type
    ORDER BY cost ASC, t ASC) = 1
)
SELECT event_type, n_days, split_t, split_day, cost_nosplit,
       cost_split, cost_nosplit - cost_split AS gain,
       (cost_nosplit - cost_split) > $ChangepointGainFrac * cost_nosplit
         AS significant
FROM best"""
  }

  /** Mirror of [[graft.operators.EventsQueries.conformalIntervals]]
    * (q212): same daily collapse, calibration split, exact integer
    * rank pick on the ordered residual list, and holdout coverage
    * count. */
  def conformalIntervals: String = {
    import graft.operators.EventsQueries.{ConformalCalDays,
      ConformalCovDen, ConformalCovNum}
    s"""WITH daily AS (
  SELECT event_type, (epoch_ns(ts) // 1000000) // 86400000 AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, (epoch_ns(ts) // 1000000) // 86400000
), d0 AS (
  SELECT event_type, MIN(d) AS d0 FROM daily GROUP BY event_type
), j AS (
  SELECT daily.*, d0.d0 FROM daily JOIN d0 USING (event_type)
), cal AS (
  SELECT * FROM j WHERE d < d0 + $ConformalCalDays
), tst AS (
  SELECT * FROM j WHERE d >= d0 + $ConformalCalDays
), mu AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
         CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM cal GROUP BY event_type
), qh AS (
  SELECT c.event_type, m.n_cal, m.mu,
         least(m.n_cal,
           ((m.n_cal + 1) * $ConformalCovNum + ${ConformalCovDen - 1})
             // $ConformalCovDen) AS k,
         list_sort(list(abs(CAST(c.cents AS DOUBLE) - m.mu)))[
           CAST(least(m.n_cal,
             ((m.n_cal + 1) * $ConformalCovNum + ${ConformalCovDen - 1})
               // $ConformalCovDen) AS INT)] AS q_hat
  FROM cal c JOIN mu m USING (event_type)
  GROUP BY c.event_type, m.n_cal, m.mu
)
SELECT t.event_type, q.n_cal, q.mu, q.q_hat,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN abs(CAST(t.cents AS DOUBLE) - q.mu)
                  <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(SUM(CASE WHEN abs(CAST(t.cents AS DOUBLE) - q.mu)
                  <= q.q_hat THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM tst t JOIN qh q USING (event_type)
GROUP BY t.event_type, q.n_cal, q.mu, q.q_hat"""
  }

  /** Mirror of [[graft.operators.RelationalQueries.rfmSegments]]
    * (q149): exact integer metrics, the same ntile total orders
    * (both engines use the ANSI first-buckets-take-the-remainder
    * rule), identical code arithmetic. */
  def rfmSegments: String =
    """WITH pc AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_date,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), mx AS (
  SELECT MAX(o_orderdate) AS max_date FROM orders
), b AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_date, max_date) AS BIGINT)
           AS recency_days,
         n_orders,
         CAST(cents AS DOUBLE) / 100.0 AS monetary,
         CAST(ntile(5) OVER (ORDER BY last_date ASC, o_custkey ASC)
           AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY n_orders ASC, o_custkey ASC)
           AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY cents ASC, o_custkey ASC)
           AS BIGINT) AS m_score
  FROM pc, mx
)
SELECT o_custkey, recency_days, n_orders, monetary,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM b"""

  /** Mirror of [[graft.operators.RelationalQueries.frequentItemPairs]]
    * (q146): identical basket build, support floor, lift operand
    * order, and (support DESC, ia, ib) rank. */
  def frequentItemPairs: String = {
    import graft.operators.RelationalQueries.{BasketMinSupport, BasketTopK}
    s"""WITH baskets AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
), pairs AS (
  SELECT a.item AS ia, b.item AS ib, COUNT(*) AS support
  FROM baskets a JOIN baskets b
    ON a.oid = b.oid AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= $BasketMinSupport
), items AS (
  SELECT item, COUNT(*) AS ic FROM baskets GROUP BY item
), nb AS (
  SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n_baskets FROM baskets
), l AS (
  SELECT p.ia, p.ib, p.support,
         CAST(nb.n_baskets AS DOUBLE) * p.support / ca.ic / cb.ic
           AS lift
  FROM pairs p
  JOIN items ca ON p.ia = ca.item
  JOIN items cb ON p.ib = cb.item
  CROSS JOIN nb
), r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY support DESC, ia ASC,
    ib ASC) AS BIGINT) AS rank
  FROM l
)
SELECT ia, ib, support, lift, rank FROM r WHERE rank <= $BasketTopK"""
  }

  /** Mirror of [[graft.operators.EventsQueries.conversionChiSq]]
    * (q145): exact integer cells, then the identical fixed-order
    * double expression for expected cells and the four (O−E)²/E
    * terms; the critical value is the shared
    * [[graft.operators.EventsQueries.ChiSqCrit]] literal. */
  def conversionChiSq: String = {
    import graft.operators.EventsQueries.ChiSqCrit
    s"""WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY user_id
), a AS (
  SELECT ${graft.operators.Sampling.mixedSql("user_id")} % 2 AS arm,
         conv
  FROM u
), c AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
  FROM a
), e AS (
  SELECT *,
    CAST(c0 AS DOUBLE) / n0 AS cvr0,
    CAST(c1 AS DOUBLE) / n1 AS cvr1,
    CAST(n0 AS DOUBLE) * (c0 + c1) / (n0 + n1) AS e0c,
    CAST(n0 AS DOUBLE) * (n0 + n1 - c0 - c1) / (n0 + n1) AS e0n,
    CAST(n1 AS DOUBLE) * (c0 + c1) / (n0 + n1) AS e1c,
    CAST(n1 AS DOUBLE) * (n0 + n1 - c0 - c1) / (n0 + n1) AS e1n
  FROM c
), x AS (
  SELECT n0, c0, n1, c1, cvr0, cvr1,
    (CASE WHEN e0c > 0.0
          THEN (c0 - e0c) * (c0 - e0c) / e0c ELSE 0.0 END
      + CASE WHEN e0n > 0.0
             THEN (n0 - c0 - e0n) * (n0 - c0 - e0n) / e0n
             ELSE 0.0 END
      + CASE WHEN e1c > 0.0
             THEN (c1 - e1c) * (c1 - e1c) / e1c ELSE 0.0 END
      + CASE WHEN e1n > 0.0
             THEN (n1 - c1 - e1n) * (n1 - c1 - e1n) / e1n
             ELSE 0.0 END) AS chi2
  FROM e
)
SELECT *, chi2 > $ChiSqCrit AS significant FROM x"""
  }

  /** Mirror of [[graft.operators.EventsQueries.sessionPaths]]
    * (q142): the q15 gap rule as gaps-and-islands, string_agg with
    * an explicit ORDER BY ≡ Spark's sort_array path build, identical
    * (count DESC, path ASC) rank order. */
  def sessionPaths: String = {
    import graft.operators.EventsQueries.{SessionGapMs, SessionPathsK}
    s"""WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000000 AS ms
  FROM events
), o AS (
  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                   OR ms - lag(ms) OVER w >= $SessionGapMs
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), p AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ms, event_id) AS path
  FROM s GROUP BY user_id, sid
), c AS (
  SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
), r AS (
  SELECT path, n_sessions,
         CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC)
           AS BIGINT) AS rank
  FROM c
)
SELECT path, n_sessions, rank FROM r WHERE rank <= $SessionPathsK"""
  }

  /** Mirror of [[graft.operators.EventsQueries.attributionCredits]]
    * (q140): the same forward-frame IGNORE NULLS next-purchase
    * assignment (both CASE columns go non-null at the same first
    * purchase row), identical tie order, and CAST-to-DOUBLE weight
    * literals (a bare 1.0 would be DECIMAL — the known widening
    * footgun). */
  def attributionCredits: String = {
    val win = graft.operators.EventsQueries.AttributionWindowMs
    s"""WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000000 AS ms
  FROM events
), m AS (
  SELECT *,
    first_value(CASE WHEN event_type = 'purchase' THEN ms END
      IGNORE NULLS) OVER w AS pts,
    first_value(CASE WHEN event_type = 'purchase' THEN event_id END
      IGNORE NULLS) OVER w AS pid
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), t AS (
  SELECT * FROM m
  WHERE event_type IN ('click', 'view') AND pid IS NOT NULL
    AND pts - ms <= $win
), r AS (
  SELECT user_id, event_id AS touch_id, event_type AS channel,
         pid AS purchase_id,
         CAST(row_number() OVER (PARTITION BY user_id, pid
           ORDER BY ms, event_id) AS BIGINT) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, pid) AS k_touches
  FROM t
)
SELECT user_id, touch_id, channel, purchase_id, pos, k_touches,
       CASE WHEN k_touches = 1 THEN CAST(1.0 AS DOUBLE)
            WHEN k_touches = 2 THEN CAST(0.5 AS DOUBLE)
            WHEN pos = 1 THEN CAST(0.4 AS DOUBLE)
            WHEN pos = k_touches THEN CAST(0.4 AS DOUBLE)
            ELSE CAST(0.2 AS DOUBLE) / (k_touches - 2) END AS credit
FROM r"""
  }

  /** Mirror of [[graft.operators.EventsQueries.markovTransitions]]
    * (q139): identical lead() pairing under the (ms, event_id)
    * total order; probabilities are exact-long divisions. */
  def markovTransitions: String =
    """WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000000 AS ms
  FROM events
), p AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY ms, event_id) AS next_type
  FROM e
), c AS (
  SELECT event_type, next_type, COUNT(*) AS n_transitions
  FROM p WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), t AS (
  SELECT event_type, CAST(SUM(n_transitions) AS BIGINT) AS row_total
  FROM c GROUP BY event_type
)
SELECT c.event_type, c.next_type, c.n_transitions,
       CAST(c.n_transitions AS DOUBLE) / t.row_total AS p
FROM c JOIN t USING (event_type)"""

  /** Mirror of [[graft.operators.EventsQueries.cupedLift]] (q138):
    * exact cents integers, exact integer moments (SUM → HUGEINT →
    * cast back), θ and arm means as the IDENTICAL fixed-order double
    * expressions — no rounding step needed. */
  def cupedLift: String =
    s"""WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000000 AS ms,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), sp AS (
  SELECT (MIN(ms) + MAX(ms)) // 2 AS split_ms FROM e
), u AS (
  SELECT user_id,
         ${graft.operators.Sampling.mixedSql("user_id")} % 2 AS arm,
         CAST(SUM(CASE WHEN ms < split_ms THEN cents ELSE 0 END)
           AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ms >= split_ms THEN cents ELSE 0 END)
           AS BIGINT) AS y
  FROM e, sp GROUP BY user_id, arm
), g AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM u
), t AS (
  SELECT n, sx,
         (CAST(sxy AS DOUBLE) * n
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(sxx AS DOUBLE) * n
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
  FROM g
), a AS (
  SELECT arm, COUNT(*) AS n_users,
         CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay
  FROM u GROUP BY arm
)
SELECT a.arm, a.n_users,
       CAST(a.ay AS DOUBLE) / a.n_users / 100.0 AS mean_y,
       CAST(a.ay AS DOUBLE) / a.n_users / 100.0
         - t.theta * (CAST(a.ax AS DOUBLE) / a.n_users / 100.0
                      - CAST(t.sx AS DOUBLE) / t.n / 100.0)
         AS mean_y_cuped,
       t.theta
FROM a, t"""

  /** Mirror of [[graft.operators.EventsQueries.scd2Dimension]]
    * (q134): the identical gaps-and-islands derivation — null-safe
    * lag compare (IS DISTINCT FROM ≡ Spark's not(<=>)), running-sum
    * run ids over the (ms, event_id) total order, (user, run)
    * aggregation, lead() close-out. run_id stays internal in both
    * engines. */
  def scd2Dimension: String =
    """WITH t AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ms,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS tier
  FROM events
), c AS (
  SELECT *, CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier
                 THEN 1 ELSE 0 END AS chg
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
), r AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
    ROWS UNBOUNDED PRECEDING) AS run_id
  FROM c
), g AS (
  SELECT user_id, run_id, MIN(tier) AS tier,
         MIN(ms) AS valid_from_ms, COUNT(*) AS n_events
  FROM r GROUP BY user_id, run_id
)
SELECT user_id, tier, valid_from_ms,
       lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to_ms,
       n_events,
       (lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY run_id)
         IS NULL) AS is_current
FROM g"""

  /** Closure oracle of [[graft.streaming.StreamingScd2.serveFetch]]
    * (q162): the pre-event dimension state IS the previous event's
    * attribute — a plain lag window, no state machinery. */
  def serveFetchClosure: String =
    """SELECT user_id, event_id,
       epoch_ns(ts) // 1000000 AS ts_ms,
       COALESCE(
         lag(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4)
           OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts) // 1000000, event_id),
         -1) AS prev_tier
FROM events"""

  /** Mirror of [[graft.streaming.StreamingScd2.dimension]] (q143):
    * the batch q134 derivation restricted to its CLOSED rows — the
    * streaming operator's emission contract (open rows live in
    * state, not in the append stream). */
  def scd2Closed: String =
    s"""SELECT user_id, tier, valid_from_ms, valid_to_ms, n_events
FROM ($scd2Dimension)
WHERE valid_to_ms IS NOT NULL"""

  /** Mirror of [[graft.operators.RelationalQueries.rangeJoinNearby]]
    * — DuckDB's IEJoin runs the inequality join directly; the
    * bucket-and-refine plan must produce the identical match set. */
  def rangeJoinNearby: String =
    """WITH e AS (
  SELECT event_id, event_type, epoch_ns(ts) // 1000000 AS ms FROM events
), p AS (
  SELECT event_id, ms FROM e WHERE event_type = 'purchase'
), c AS (
  SELECT ms FROM e WHERE event_type = 'click'
)
SELECT p.event_id, COUNT(c.ms) AS n_nearby
FROM p LEFT JOIN c ON c.ms >= p.ms - 300000 AND c.ms < p.ms
GROUP BY p.event_id"""

  /** Mirror of [[graft.operators.Sampling.neymanSample]] (q136):
    * exact-integer stratum moments (SUM widened to HUGEINT → cast
    * back), one sqrt per stratum on the identical integer, the
    * cross-stratum weight total as the ordered list_reduce fold
    * (≡ Spark's sort_array + sequential aggregate), FLOOR allocation
    * with the same literal order, Knuth-hash rank selection. */
  def neymanSample: String = {
    import graft.operators.Sampling
    s"""WITH b AS (
  SELECT lang, source, doc_id, CAST(n_chars AS BIGINT) AS x,
         ${Sampling.mixedSql("doc_id")} AS h
  FROM documents
), st AS (
  SELECT lang, source,
         COUNT(*) AS nh,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sq
  FROM b GROUP BY lang, source
), sw AS (
  SELECT lang, source,
         sqrt(CAST(nh * sq - sx * sx AS DOUBLE)) AS w
  FROM st
), tot AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(w ORDER BY lang, source)), (a, c) -> a + c) AS big_w
  FROM sw
), al AS (
  SELECT lang, source,
         CAST(FLOOR(${Sampling.NeymanBudget}.0 * w / big_w) AS BIGINT)
           AS alloc
  FROM sw, tot
), r AS (
  SELECT b.doc_id, b.lang, b.source, al.alloc,
         row_number() OVER (PARTITION BY b.lang, b.source
           ORDER BY b.h, b.doc_id) AS rk
  FROM b JOIN al USING (lang, source)
)
SELECT doc_id, lang, source, alloc FROM r WHERE rk <= alloc"""
  }

  /** Mirror of [[graft.operators.Sampling.trainSplit]] — identical
    * Knuth-hash integer arithmetic (high-bit extraction via `//`). */
  def trainSplit: String = {
    import graft.operators.Sampling._
    val b = s"${mixedSql("doc_id")} % 1000"
    s"""SELECT doc_id,
       $b AS bucket,
       CASE WHEN $b < $TrainPerMille THEN 'train'
            WHEN $b < $ValPerMille THEN 'validation'
            ELSE 'test' END AS split
FROM documents"""
  }

  /** Mirror of [[graft.operators.Sampling.quotaSample]] (grouped by
    * `lang`, quota 50). */
  def quotaSample: String = {
    import graft.operators.Sampling._
    s"""WITH h AS (
  SELECT doc_id, lang, ${mixedSql("doc_id")} % 1048576 AS h FROM documents
), r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rn
  FROM h
)
SELECT doc_id, lang, h, rn FROM r WHERE rn <= 50"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.tfidfTopTerms]]: same
    * tokenization (lowercase ASCII letter runs), same tf/df/N
    * aggregations, tfidf = tf · ln(N/df) with identical operand
    * order, rank tie-broken by term. */
  def tfidfTopTerms: String = {
    val k = graft.operators.TextAnalysis.TfidfTopK
    val pat = graft.operators.TextAnalysis.WordPattern
    s"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), idf AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, idf.df,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df) AS tfidf
  FROM tf JOIN idf USING (term) CROSS JOIN n
), r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= $k"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.bm25TopDocs]]: same
    * tokenization, the same one-pass tf/dl facts (expressed here as
    * two CTEs over the same extraction), identical operand order in
    * the idf and saturation terms (every int operand cast to DOUBLE
    * before the arithmetic so both engines compute the same float
    * expression), rank tie-broken by doc_id. The BM25 constants are
    * interpolated from the operator's own k1/b values. */
  def bm25TopDocs: String =
    bm25Body(graft.operators.TextAnalysis.Bm25TopK)

  /** The BM25 pipeline with a caller-chosen pool size `k` — the q83
    * oracle uses [[graft.operators.TextAnalysis.Bm25TopK]]; the q84
    * hybrid oracle embeds a [[SimilarityParams.RrfPoolK]]-deep pool
    * as a derived table. */
  private def bm25Body(k: Int): String = {
    import graft.operators.TextAnalysis.{Bm25B, Bm25K1, Bm25Query, WordPattern}
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '$WordPattern')) AS term
  FROM documents
), dl AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$WordPattern'))
              AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ($terms) GROUP BY doc_id, term
), idf AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(idf.df AS DOUBLE)
                   + 0.5) / (CAST(idf.df AS DOUBLE) + 0.5))
         * (CAST(tf.tf AS DOUBLE) * ${Bm25K1 + 1.0})
         / (CAST(tf.tf AS DOUBLE)
            + $Bm25K1 * (${1.0 - Bm25B}
                         + $Bm25B * CAST(dl.dl AS DOUBLE) / n.avgdl))
           AS c
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
       CROSS JOIN stats n
), scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         SUM(c) AS score
  FROM contrib GROUP BY doc_id
), r AS (
  SELECT doc_id, n_terms_hit, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, n_terms_hit, score, rank FROM r WHERE rank <= $k"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.prfExpandedTopDocs]]
    * (q209): base retrieval as the embedded q83 pipeline at feedback
    * depth, doc_id-ordered feedback fold, idf-damped expansion pick
    * (w DESC, term ASC), then the full BM25 re-run over the expanded
    * vocabulary AS A TABLE. */
  def prfExpandedTopDocs: String = {
    import graft.operators.TextAnalysis.{Bm25B, Bm25K1, Bm25Query,
      Bm25TopK, PrfFbDocs, PrfFbTerms, WordPattern}
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH fb AS (
  SELECT doc_id FROM (
${bm25Body(PrfFbDocs)}
  )
), tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '$WordPattern')) AS term
  FROM documents
), dl AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$WordPattern'))
              AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
), tfall AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), fbtf AS (
  SELECT t.doc_id, t.term, t.tf, dl.dl
  FROM tfall t JOIN fb USING (doc_id) JOIN dl USING (doc_id)
  WHERE t.term NOT IN ($terms)
), wraw AS (
  SELECT term,
         list_reduce(list_prepend(0.0,
           list(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)
                ORDER BY doc_id)),
           (a, b) -> a + b) AS fbw
  FROM fbtf GROUP BY term
), dfc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tfall WHERE term IN (SELECT term FROM wraw)
  GROUP BY term
), expansion AS (
  SELECT term FROM (
    SELECT w.term,
           ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)
                     + 0.5) / (CAST(d.df AS DOUBLE) + 0.5)) * w.fbw
             AS w
    FROM wraw w JOIN dfc d USING (term) CROSS JOIN stats n
  )
  QUALIFY row_number() OVER (ORDER BY w DESC, term ASC)
    <= $PrfFbTerms
), qterms AS (
  SELECT term FROM expansion
  UNION
  SELECT unnest([$terms]) AS term
), tf2 AS (
  SELECT t.doc_id, t.term, t.tf, dl.dl
  FROM tfall t JOIN qterms USING (term) JOIN dl USING (doc_id)
), df2 AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf2 GROUP BY term
), contrib AS (
  SELECT tf2.doc_id,
         ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(df2.df AS DOUBLE)
                   + 0.5) / (CAST(df2.df AS DOUBLE) + 0.5))
         * (CAST(tf2.tf AS DOUBLE) * ${Bm25K1 + 1.0})
         / (CAST(tf2.tf AS DOUBLE)
            + $Bm25K1 * (${1.0 - Bm25B}
                         + $Bm25B * CAST(tf2.dl AS DOUBLE) / n.avgdl))
           AS c
  FROM tf2 JOIN df2 USING (term) CROSS JOIN stats n
), scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         SUM(c) AS score
  FROM contrib GROUP BY doc_id
), r AS (
  SELECT doc_id, n_terms_hit, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, n_terms_hit, score, rank FROM r
WHERE rank <= $Bm25TopK"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.bm25TopDocsMulti]]
    * (q89): the query set as a VALUES table, tf filtered to the UNION
    * vocabulary, df/N/avgdl shared across queries (they are corpus
    * properties), contribs fanned out per (query, term), top-k
    * PARTITIONed by query. */
  /** Mirror of [[graft.operators.TextAnalysis.ragDedupContexts]]
    * (q285): the q89 candidates, the q5 pair mirror for demotion,
    * dense re-rank, the q284 budget rule. */
  def ragDedupContexts: String = {
    val budget = TextAnalysis.RagContextBudget
    val pat = TextAnalysis.TokenPattern
    s"""WITH ranked AS ($bm25TopDocsMulti
), prs AS (
  SELECT doc_a, doc_b FROM ($dedupMinhash)
), sym AS (
  SELECT doc_a, doc_b FROM prs
  UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM prs
), dem AS (
  SELECT DISTINCT c.query_id, c.doc_id
  FROM ranked c
  JOIN sym ON c.doc_id = sym.doc_b
  JOIN ranked h ON h.query_id = c.query_id
    AND h.doc_id = sym.doc_a AND h.rank < c.rank
), surv AS (
  SELECT r.* FROM ranked r
  LEFT JOIN dem ON dem.query_id = r.query_id
    AND dem.doc_id = r.doc_id
  WHERE dem.doc_id IS NULL
), tk AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$pat'))
           AS BIGINT) AS n_tok
  FROM documents
), fin AS (
  SELECT s.query_id,
         CAST(row_number() OVER (PARTITION BY s.query_id
           ORDER BY s.rank) AS BIGINT) AS new_rank,
         s.rank AS orig_rank, s.doc_id, s.score, tk.n_tok,
         CAST(SUM(tk.n_tok) OVER (PARTITION BY s.query_id
           ORDER BY s.rank ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM surv s JOIN tk USING (doc_id)
)
SELECT query_id, new_rank, orig_rank, doc_id, score, n_tok,
       cum_tokens, cum_tokens <= $budget AS included
FROM fin"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.ragContexts]] (q284):
    * the q89 mirror wrapped with the doc-token join and the
    * per-query prefix-budget rule. */
  def ragContexts: String = {
    val budget = TextAnalysis.RagContextBudget
    val pat = TextAnalysis.TokenPattern
    s"""WITH ranked AS ($bm25TopDocsMulti
), tk AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$pat'))
           AS BIGINT) AS n_tok
  FROM documents
)
SELECT r.query_id, r.rank, r.doc_id, r.score, tk.n_tok,
       CAST(SUM(tk.n_tok) OVER (PARTITION BY r.query_id
         ORDER BY r.rank ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens,
       CAST(SUM(tk.n_tok) OVER (PARTITION BY r.query_id
         ORDER BY r.rank ROWS UNBOUNDED PRECEDING) AS BIGINT)
         <= $budget AS included
FROM ranked r JOIN tk USING (doc_id)"""
  }

  def bm25TopDocsMulti: String = {
    import graft.operators.TextAnalysis.{Bm25B, Bm25K1, Bm25QuerySet, Bm25TopK, WordPattern}
    val vocab = Bm25QuerySet.flatMap(_._2).distinct
    val terms = vocab.map(t => s"'$t'").mkString(", ")
    val qvals = Bm25QuerySet.flatMap { case (qid, ts) =>
      ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
    }.mkString(",\n         ")
    s"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '$WordPattern')) AS term
  FROM documents
), dl AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '$WordPattern'))
              AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
), qt(query_id, term) AS (
  VALUES $qvals
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ($terms) GROUP BY doc_id, term
), idf AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT qt.query_id, tf.doc_id,
         ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(idf.df AS DOUBLE)
                   + 0.5) / (CAST(idf.df AS DOUBLE) + 0.5))
         * (CAST(tf.tf AS DOUBLE) * ${Bm25K1 + 1.0})
         / (CAST(tf.tf AS DOUBLE)
            + $Bm25K1 * (${1.0 - Bm25B}
                         + $Bm25B * CAST(dl.dl AS DOUBLE) / n.avgdl))
           AS c
  FROM tf JOIN idf USING (term) JOIN qt USING (term)
       JOIN dl USING (doc_id)
       CROSS JOIN stats n
), scored AS (
  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         SUM(c) AS score
  FROM contrib GROUP BY query_id, doc_id
), r AS (
  SELECT query_id, doc_id, n_terms_hit, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, doc_id, n_terms_hit, score, rank FROM r
WHERE rank <= $Bm25TopK"""
  }

  /** Mirror of [[graft.operators.Similarity.hybridRrf]]: the same
    * BM25 pool ([[bm25Body]] at [[SimilarityParams.RrfPoolK]]), the
    * same single-query dense cosine pool (sequential-fold dot, rank
    * tie-broken by vec_id), and the RRF sum with the sparse term
    * FIRST so the two-term double addition is order-identical. Docs
    * missing from a pool carry rank 0 and contribute 0.0. */
  def hybridRrf: String = {
    import SimilarityParams.{RrfK, RrfPoolK, RrfQueryVecId, RrfTopK}
    val rrfK = RrfK.toDouble
    s"""$embCtes
, sparse AS (
  SELECT doc_id, rank AS rank_sparse FROM (
${bm25Body(RrfPoolK)}
  )
), qd AS (
  SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = $RrfQueryVecId
), pd AS (
  SELECT vec_id, ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM n, qd
  WHERE vec_id <> $RrfQueryVecId
), rd AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC)
              AS BIGINT) AS rank_dense
  FROM pd
), dense AS (
  SELECT doc_id, rank_dense FROM rd WHERE rank_dense <= $RrfPoolK
), fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(s.rank_sparse, 0) AS BIGINT) AS rank_sparse,
         CAST(COALESCE(d.rank_dense, 0) AS BIGINT) AS rank_dense,
         COALESCE(1.0 / ($rrfK + CAST(s.rank_sparse AS DOUBLE)), 0.0)
         + COALESCE(1.0 / ($rrfK + CAST(d.rank_dense AS DOUBLE)), 0.0)
           AS rrf_score
  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
), rr AS (
  SELECT doc_id, rank_sparse, rank_dense, rrf_score,
         CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
              AS BIGINT) AS rank
  FROM fused
)
SELECT doc_id, rank_sparse, rank_dense, rrf_score, rank FROM rr
WHERE rank <= $RrfTopK"""
  }

  /** Mirror of [[graft.operators.Similarity.hybridRrfIndexed]] (q87):
    * identical fusion to [[hybridRrf]], but the dense pool ranks only
    * the query's LSH candidate set (same planes/banding as the
    * persisted index — [[lshBandCte]]), mirroring the index-probe
    * plan's semantics exactly: rank_dense is the rank WITHIN the
    * probed candidates. */
  def hybridRrfIndexed: String = {
    import SimilarityParams.{RrfK, RrfPoolK, RrfQueryVecId, RrfTopK}
    val rrfK = RrfK.toDouble
    s"""$embCtes
, sparse AS (
  SELECT doc_id, rank AS rank_sparse FROM (
${bm25Body(RrfPoolK)}
  )
), qd AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn
  FROM n WHERE vec_id = $RrfQueryVecId
), qb AS (
  ${lshBandCte("qd", "query_id, qn", "qv")}
), cb AS (
  ${lshBandCte("n", "vec_id, nrm", "v")}
), cand AS (
  SELECT query_id, qv, qn, vec_id, v, nrm
  FROM qb JOIN cb USING (band, key)
  WHERE vec_id <> query_id
  GROUP BY ALL
), pd AS (
  SELECT vec_id, ${dotSql("qv", "v")} / (qn * nrm) AS cosine
  FROM cand
), rd AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC)
              AS BIGINT) AS rank_dense
  FROM pd
), dense AS (
  SELECT doc_id, rank_dense FROM rd WHERE rank_dense <= $RrfPoolK
), fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(s.rank_sparse, 0) AS BIGINT) AS rank_sparse,
         CAST(COALESCE(d.rank_dense, 0) AS BIGINT) AS rank_dense,
         COALESCE(1.0 / ($rrfK + CAST(s.rank_sparse AS DOUBLE)), 0.0)
         + COALESCE(1.0 / ($rrfK + CAST(d.rank_dense AS DOUBLE)), 0.0)
           AS rrf_score
  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
), rr AS (
  SELECT doc_id, rank_sparse, rank_dense, rrf_score,
         CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
              AS BIGINT) AS rank
  FROM fused
)
SELECT doc_id, rank_sparse, rank_dense, rrf_score, rank FROM rr
WHERE rank <= $RrfTopK"""
  }

  /** Mirror of [[graft.operators.RelationalQueries.propsStats]] —
    * JSON `$$.k` extraction; DuckDB SUM(BIGINT) returns HUGEINT, so
    * cast back to BIGINT. */
  def propsStats: String =
    """WITH j AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       COUNT(DISTINCT k) AS n_distinct_k
FROM j GROUP BY event_type"""

  /** Mirror of [[graft.operators.RelationalQueries.docsPivot]] —
    * conditional-aggregation form of the PIVOT (FILTER counts are 0
    * for absent combos, matching the Spark side's coalesce). */
  def docsPivot: String = {
    val cols = graft.operators.RelationalQueries.PivotLangs.map { l =>
      s"COUNT(*) FILTER (lang = '$l') AS n_$l"
    }.mkString(",\n       ")
    s"""SELECT source,
       $cols
FROM documents GROUP BY source"""
  }

  /** Mirror of [[graft.operators.RelationalQueries.langScoresUnpivot]]
    * — UNION ALL form of the UNPIVOT over the langId scores. */
  def langScoresUnpivot: String = {
    val arms = graft.operators.TextAnalysis.langProfiles.map { case (c, _) =>
      s"SELECT doc_id, '$c' AS lang_code, score_$c AS score FROM li"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH li AS ($langId)
$arms"""
  }

  /** Mirror of [[graft.operators.RelationalQueries.rollingUserStats]]. */
  def rollingUserStats: String =
    """WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ts_ms, value
  FROM events
)
SELECT user_id, event_id, ts_ms, value,
       SUM(value) OVER seq AS rolling_sum,
       AVG(value) OVER seq AS rolling_avg,
       CAST(ntile(4) OVER byv AS BIGINT) AS quartile,
       percent_rank() OVER byv AS pct_rank
FROM e
WINDOW seq AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
       byv AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)"""

  /** Mirror of [[graft.operators.Dedup.benchmarkContamination]] —
    * the winnow-fingerprint CTE is the q26 chain verbatim; corpus
    * fingerprint lists are distinct per doc and the benchmark set is
    * distinct, so the post-join COUNT(*) equals the distinct
    * shared-fingerprint count. */
  def benchmarkContamination: String =
    s"""$winnowFpCtes, bset AS (
  SELECT DISTINCT unnest(fps) AS g FROM f WHERE doc_id < 20
), corpus AS (
  SELECT doc_id, fps FROM f WHERE doc_id >= 20
), e AS (
  SELECT doc_id, unnest(fps) AS g FROM corpus
), s AS (
  SELECT e.doc_id, COUNT(*) AS n_shared
  FROM e JOIN bset USING (g) GROUP BY e.doc_id
)
SELECT c.doc_id,
       CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       len(c.fps) AS n_fps,
       CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / len(c.fps)
         AS frac_shared
FROM corpus c LEFT JOIN s ON c.doc_id = s.doc_id"""

  /** Mirror of [[graft.operators.Dedup.dedupClusters]] over the
    * minhash pairs (q5's oracle embedded verbatim): reachability via
    * a recursive CTE — every label reachable from a node includes the
    * component minimum, so MIN over reached labels = the canonical
    * id, exactly what the iterative min-propagation converges to. */
  def dedupClusters: String =
    s"""WITH RECURSIVE hp AS (
  SELECT doc_a, doc_b FROM ($dedupMinhash)
), e AS (
  SELECT doc_a AS a, doc_b AS b FROM hp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM hp
), r AS (
  SELECT a AS node, a AS label FROM e
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a
), c AS (
  SELECT node, MIN(label) AS canonical_id FROM r GROUP BY node
)
SELECT node AS doc_id, canonical_id,
       CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         AS cluster_size
FROM c"""

  /** Mirror of [[graft.operators.Dedup.qualityCanonical]] (q109):
    * the recursive-CTE cluster labels and the q94 funnel verdict
    * joined onto every document, per-cluster retention by
    * (kept DESC, n_tokens DESC, doc_id ASC). */
  def qualityCanonical: String =
    s"""WITH cl AS (SELECT doc_id, canonical_id FROM ($dedupClusters)),
qf AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, kept
       FROM ($qualityFilter)),
m AS (
  SELECT d.doc_id,
         COALESCE(cl.canonical_id, d.doc_id) AS cluster,
         qf.n_tokens, qf.kept
  FROM documents d
  LEFT JOIN cl ON d.doc_id = cl.doc_id
  JOIN qf ON d.doc_id = qf.doc_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster
    ORDER BY kept DESC, n_tokens DESC, doc_id ASC) AS rn
  FROM m
)
SELECT doc_id, cluster, n_tokens, kept, rn = 1 AS retained FROM r"""

  /** Mirror of [[graft.operators.TextAnalysis.repetitionStats]] —
    * the row-local run fold re-expressed as gaps-and-islands
    * (DuckDB's list_reduce mishandles struct accumulators, so the
    * mirror uses bog-standard window SQL; values are identical). */
  def repetitionStats: String =
    """WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), t AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
  FROM d
), b AS (
  SELECT doc_id, pos, tok,
         CASE WHEN lag(tok) OVER win = tok THEN 0 ELSE 1 END AS brk
  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
), i AS (
  SELECT doc_id, tok, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM b
), runs AS (
  SELECT doc_id, grp, COUNT(*) AS len FROM i GROUP BY doc_id, grp
), mr AS (
  SELECT doc_id, MAX(len) AS max_run FROM runs GROUP BY doc_id
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok
), tw AS (
  SELECT doc_id, MAX(c) AS top_c FROM tf GROUP BY doc_id
), g AS (
  SELECT doc_id, len(w) AS n_tok,
         CASE WHEN len(w) >= 2 THEN
           1.0 - CAST(len(list_distinct(list_transform(
             range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
             / (len(w) - 1)
         ELSE NULL END AS dup_2gram_frac
  FROM d
)
SELECT mr.doc_id, mr.max_run,
       CAST(tw.top_c AS DOUBLE) / g.n_tok AS top_word_frac,
       g.dup_2gram_frac
FROM mr
JOIN tw ON mr.doc_id = tw.doc_id
JOIN g ON mr.doc_id = g.doc_id"""

  /** Mirror of [[graft.operators.Pipeline.preprocessingFunnel]] —
    * composes the component operators' oracle SQL verbatim (dedup,
    * textStats, langId, trainSplit) so the formulas cannot drift from
    * their individually-graded twins. DuckDB SUMs of ints are
    * HUGEINT; cast back. */
  def pipelineFunnel: String = {
    import graft.operators.Pipeline._
    s"""WITH dd AS ($dedupExact),
cl AS (SELECT * FROM ($dedupClusters)),
ts AS ($textStats),
li AS ($langId),
sp AS ($trainSplit),
f AS (
  SELECT dd.doc_id,
         NOT dd.is_duplicate AS keep_dedup,
         NOT dd.is_duplicate
           AND COALESCE(cl.canonical_id = dd.doc_id, TRUE) AS keep_nd,
         ts.quality_score >= $QualityThreshold AS keep_quality,
         li.lang_guess = '$KeepLang' AS keep_lang,
         sp.split AS split
  FROM dd
  LEFT JOIN cl ON dd.doc_id = cl.doc_id
  JOIN ts ON dd.doc_id = ts.doc_id
  JOIN li ON dd.doc_id = li.doc_id
  JOIN sp ON dd.doc_id = sp.doc_id
)
SELECT COUNT(*) AS n_raw,
  CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_dedup,
  CAST(SUM(CASE WHEN keep_nd THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_neardup,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after_quality,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_lang,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND split = 'validation' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_validation,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
FROM f"""
  }

  /** Mirror of [[graft.operators.Pipeline.decontaminatedFunnel]]
    * (q223): the q36 funnel SQL extended with a decontamination
    * stage whose two screens are [[benchmarkContamination]] (q43)
    * and [[semanticContamination]] (q219) EMBEDDED VERBATIM as CTE
    * subqueries — the composed gate is graded against exactly the
    * member oracles, plus the benchmark-membership cut
    * (doc_id < bench bound). */
  def decontaminatedFunnel: String = {
    import graft.operators.Pipeline._
    import graft.operators.Similarity.SemDecontamBenchBelow
    s"""WITH dd AS ($dedupExact),
cl AS (SELECT * FROM ($dedupClusters)),
ts AS ($textStats),
li AS ($langId),
sp AS ($trainSplit),
ng AS (
  SELECT doc_id FROM ($benchmarkContamination)
  WHERE frac_shared >= $ContamFracThreshold
),
sem AS (
  SELECT DISTINCT corpus_vec AS doc_id FROM ($semanticContamination)
),
f AS (
  SELECT dd.doc_id,
         NOT dd.is_duplicate AS keep_dedup,
         NOT dd.is_duplicate
           AND COALESCE(cl.canonical_id = dd.doc_id, TRUE) AS keep_nd,
         ts.quality_score >= $QualityThreshold AS keep_quality,
         li.lang_guess = '$KeepLang' AS keep_lang,
         dd.doc_id >= $SemDecontamBenchBelow
           AND ng.doc_id IS NULL AND sem.doc_id IS NULL AS keep_decontam,
         sp.split AS split
  FROM dd
  LEFT JOIN cl ON dd.doc_id = cl.doc_id
  JOIN ts ON dd.doc_id = ts.doc_id
  JOIN li ON dd.doc_id = li.doc_id
  JOIN sp ON dd.doc_id = sp.doc_id
  LEFT JOIN ng ON dd.doc_id = ng.doc_id
  LEFT JOIN sem ON dd.doc_id = sem.doc_id
)
SELECT COUNT(*) AS n_raw,
  CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_dedup,
  CAST(SUM(CASE WHEN keep_nd THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_neardup,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after_quality,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_lang,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND keep_decontam THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_decontam,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND keep_decontam AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_train,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND keep_decontam AND split = 'validation' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_validation,
  CAST(SUM(CASE WHEN keep_nd AND keep_quality AND keep_lang
    AND keep_decontam AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_test
FROM f"""
  }

  /** Mirror of [[graft.operators.Sampling.packSequences]] — identical
    * split arithmetic, shard = doc_id mod shards, prefix-sum window
    * per (split, shard) ordered by doc_id; DuckDB window SUM(BIGINT)
    * is HUGEINT, so the derived pack columns cast back. `//` and
    * Spark `DIV` agree on the non-negative domain. */
  def packSequences: String = {
    import graft.operators.Sampling._
    import graft.operators.TextAnalysis.TokenPattern
    val b = s"${mixedSql("doc_id")} % 1000"
    s"""WITH t AS (
  SELECT doc_id,
         CASE WHEN $b < $TrainPerMille THEN 'train'
              WHEN $b < $ValPerMille THEN 'validation'
              ELSE 'test' END AS split,
         doc_id % $PackShards AS shard,
         CAST(len(regexp_extract_all(lower(text), '$TokenPattern'))
           AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, split, shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY split, shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, split, shard, n_tok,
       CAST((cum - n_tok) // $PackBudget AS BIGINT) AS pack_id,
       CAST((cum - n_tok) % $PackBudget AS BIGINT) AS pack_offset
FROM c"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.unigramNll]]: same
    * tokenization as tfidf, ctf/total aggregations (HUGEINT→BIGINT
    * casts), avg NLL = Σ tf·−ln(ctf/total) / n_tok — the sum is
    * order-scrambled double addition absorbed by the compare's %.9g,
    * and ln/exp agree with the JVM within ulps far below it. */
  def unigramNll: String = {
    val pat = graft.operators.TextAnalysis.WordPattern
    s"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), ctf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY term
), tot AS (
  SELECT CAST(SUM(ctf) AS BIGINT) AS total FROM ctf
), d AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tok,
         SUM(CAST(tf.tf AS DOUBLE) *
             -ln(CAST(ctf.ctf AS DOUBLE) / tot.total)) AS nll_sum
  FROM tf JOIN ctf USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tok,
       nll_sum / n_tok AS avg_nll,
       exp(nll_sum / n_tok) AS perplexity
FROM d"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.knBigramNll]] (q111):
    * identical bigram construction (adjacent regexp-token pairs
    * joined by one space), the same KN closed form with every double
    * term in the Spark expressions' evaluation order, and BIGINT
    * casts on the HUGEINT-prone sums. */
  def knBigramNll: String = {
    val pat = graft.operators.TextAnalysis.WordPattern
    val d = graft.operators.TextAnalysis.KnDiscount
    s"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '$pat') AS toks
  FROM documents
), bgl AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i + 1]) AS bgs
  FROM tok
), bg AS (
  SELECT doc_id, bigram, COUNT(*) AS bf FROM (
    SELECT doc_id, unnest(bgs) AS bigram FROM bgl)
  GROUP BY doc_id, bigram
), cb AS (
  SELECT bigram, CAST(SUM(bf) AS BIGINT) AS cb,
         string_split(bigram, ' ')[1] AS u,
         string_split(bigram, ' ')[2] AS v
  FROM bg GROUP BY bigram
), lc AS (
  SELECT u, CAST(SUM(cb) AS BIGINT) AS cu, COUNT(*) AS n1u
  FROM cb GROUP BY u
), rc AS (
  SELECT v, COUNT(*) AS n1v FROM cb GROUP BY v
), ty AS (
  SELECT COUNT(*) AS n_types FROM cb
), sc AS (
  SELECT bg.doc_id, bg.bf,
         (GREATEST(CAST(cb.cb AS DOUBLE) - $d, 0.0) / lc.cu)
           + (($d * lc.n1u / lc.cu)
              * (CAST(rc.n1v AS DOUBLE) / ty.n_types)) AS p_kn
  FROM bg
  JOIN cb USING (bigram)
  JOIN lc ON cb.u = lc.u
  JOIN rc ON cb.v = rc.v
  CROSS JOIN ty
), agg AS (
  SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
         SUM(CAST(bf AS DOUBLE) * -ln(p_kn)) AS nll_sum
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       nll_sum / n_bigrams AS avg_nll,
       exp(nll_sum / n_bigrams) AS perplexity
FROM agg"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.blocklistScreen]]
    * (q113): per-phrase occurrence counts by brute-force START
    * positions — substr probe at every offset — which equals the
    * automaton's per-END-position count. */
  def blocklistScreen: String = {
    val ps = graft.operators.TextAnalysis.Blocklist
    val cnts = ps.zipWithIndex.map { case (p, i) =>
      val pl = p.length
      s"len(list_filter(range(1, length(text) - ${pl} + 2), i -> substr(text, CAST(i AS INT), $pl) = '$p')) AS c$i"
    }.mkString(",\n         ")
    val total = ps.indices.map(i => s"c$i").mkString(" + ")
    val matched = ps.indices.map(i => s"CAST(c$i > 0 AS BIGINT)").mkString(" + ")
    s"""WITH c AS (
  SELECT doc_id,
         $cnts
  FROM documents
), s AS (
  SELECT doc_id,
         CAST($total AS BIGINT) AS total_hits,
         CAST($matched AS BIGINT) AS n_phrases
  FROM c
)
SELECT doc_id, total_hits, n_phrases,
       total_hits = 0 AS keep
FROM s"""
  }

  /** Mirror of [[graft.operators.Sampling.quantileNormalize]]
    * (q122): identical percent_rank definition ((rank−1)/(n−1),
    * integer-derived) over the same (score ASC, id ASC) total order
    * per source. */
  def quantileNormalize: String = {
    import graft.operators.Sampling.QnormKeepFrac
    s"""SELECT doc_id, source, CAST(n_chars AS BIGINT) AS raw_score,
       percent_rank() OVER (PARTITION BY source
         ORDER BY n_chars ASC, doc_id ASC) AS pct,
       percent_rank() OVER (PARTITION BY source
         ORDER BY n_chars ASC, doc_id ASC) >= 1.0 - $QnormKeepFrac AS keep
FROM documents"""
  }

  /** Mirror of [[graft.operators.Pipeline.snapshotDiffDerived]]
    * (q120): the same deterministic two-version derivation and the
    * same full-outer digest compare — DuckDB md5() and Spark md5()
    * agree byte-for-byte on the identical text. */
  def snapshotDiff: String = {
    import graft.operators.Pipeline.{DiffAddedMod, DiffRemovedMod, DiffChangedMod}
    s"""WITH v1 AS (
  SELECT doc_id, md5(text) AS old_hash FROM documents
  WHERE doc_id % 10 <> $DiffAddedMod
), v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = $DiffChangedMod
             THEN text || ' v2' ELSE text END) AS new_hash
  FROM documents
  WHERE doc_id % 10 <> $DiffRemovedMod
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.old_hash IS NULL THEN 'added'
            WHEN v2.new_hash IS NULL THEN 'removed'
            WHEN v1.old_hash = v2.new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       v1.old_hash, v2.new_hash
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.repetitionSignals]]
    * (q117): per n the n-gram strings (space-joined token windows,
    * identical to WordShingles), duckdb GROUP BY counts, the same
    * (tf DESC, gram ASC) top pick / tf≥2 beyond-first mass, integer
    * masses over integer total chars. */
  def repetitionSignals: String = {
    import graft.operators.TextAnalysis.{RepTopThresholds, RepDupThresholds, WordPattern}
    def gramExpr(n: Int): String =
      (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    def gramCtes(n: Int): String =
      s""", g$n AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${n - 1} + 1),
    i -> ${gramExpr(n)})) AS g
  FROM base
), c$n AS (
  SELECT doc_id, g, COUNT(*) AS tf FROM g$n GROUP BY doc_id, g
)"""
    val topCtes = RepTopThresholds.map { case (n, _) =>
      gramCtes(n) + s""", m$n AS (
  SELECT doc_id, tf * length(g) AS mass FROM (
    SELECT doc_id, g, tf, row_number() OVER (PARTITION BY doc_id
      ORDER BY tf DESC, g ASC) AS rn
    FROM c$n) WHERE rn = 1
)"""
    }.mkString
    val dupCtes = RepDupThresholds.map { case (n, _) =>
      gramCtes(n) + s""", m$n AS (
  SELECT doc_id, CAST(SUM((tf - 1) * length(g)) AS BIGINT) AS mass
  FROM c$n WHERE tf >= 2 GROUP BY doc_id
)"""
    }.mkString
    val allNs = RepTopThresholds.map(_._1) ++ RepDupThresholds.map(_._1)
    val joins = allNs.map(n =>
      s"LEFT JOIN m$n ON m$n.doc_id = base.doc_id").mkString("\n")
    def fracSql(n: Int): String =
      s"CASE WHEN total_chars = 0 THEN 0.0 ELSE " +
        s"CAST(COALESCE(m$n.mass, 0) AS DOUBLE) / total_chars END"
    val fracCols = (RepTopThresholds.map { case (n, _) =>
      s"${fracSql(n)} AS top${n}_frac"
    } ++ RepDupThresholds.map { case (n, _) =>
      s"${fracSql(n)} AS dup${n}_frac"
    }).mkString(",\n       ")
    val keep = (RepTopThresholds.map { case (n, t) =>
      s"${fracSql(n)} <= $t"
    } ++ RepDupThresholds.map { case (n, t) =>
      s"${fracSql(n)} <= $t"
    }).mkString("(", ")\n   AND (", ")")
    s"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '$WordPattern') AS toks
  FROM documents
), base AS MATERIALIZED (
  SELECT doc_id, toks,
         CAST(length(array_to_string(toks, ' ')) AS BIGINT) AS total_chars
  FROM tok
)$topCtes$dupCtes
SELECT base.doc_id, total_chars,
       $fracCols,
       $keep AS kept
FROM base
$joins"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.chunkDocs]] — identical
    * integer chunk arithmetic (non-negative ceil-div numerator, so
    * `//` and Spark's `DIV` agree) and 1-based substring windows. */
  def chunkDocs: String = {
    import graft.operators.TextAnalysis.{ChunkChars, ChunkStride}
    s"""WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents
), n AS (
  SELECT doc_id, text, len,
         1 + (GREATEST(0, len - $ChunkChars) + ${ChunkStride - 1})
           // $ChunkStride AS n_chunks
  FROM d
), c AS (
  SELECT doc_id, text, unnest(range(n_chunks)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id,
       chunk_id * $ChunkStride + 1 AS chunk_start,
       substr(text, CAST(chunk_id * $ChunkStride + 1 AS INTEGER),
         $ChunkChars) AS chunk_text,
       CAST(length(substr(text,
         CAST(chunk_id * $ChunkStride + 1 AS INTEGER), $ChunkChars))
         AS BIGINT) AS chunk_len
FROM c"""
  }

  /** Mirror of [[graft.operators.Sampling.mixtureResample]] —
    * identical operation order for the ratio/α/keep-rate doubles
    * (all inputs are identical integers, so the hash-threshold keep
    * decision is bit-deterministic in both engines). */
  def mixtureResample: String = {
    import graft.operators.Sampling._
    val tf = MixtureTargets.map { case (l, f) =>
      s"WHEN lang = '$l' THEN $f"
    }.mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH tot AS (
  SELECT COUNT(*) AS n_total FROM documents
), cnt AS (
  SELECT lang, COUNT(*) AS n_lang, ($tf) AS tf
  FROM documents GROUP BY lang
), r AS (
  SELECT lang, n_lang, tf, n_total,
         n_lang / (tf * n_total) AS ratio
  FROM cnt CROSS JOIN tot
), a AS (
  SELECT MIN(ratio) AS alpha FROM r
), k AS (
  SELECT lang, a.alpha * tf * n_total / n_lang AS keep_rate
  FROM r CROSS JOIN a
)
SELECT doc_id, d.lang, ${mixedSql("doc_id")} % 1048576 AS h, keep_rate
FROM documents d JOIN k ON d.lang = k.lang
WHERE ${mixedSql("doc_id")} % 1048576 < keep_rate * 1048576.0"""
  }

  /** Mirror of [[graft.operators.Sampling.temperatureMix]] (q110):
    * same per-source counts, pow(p, α) weights, the normalizer Z as
    * an ascending-source left fold from 0.0 (the reduceCellSums
    * discipline — a plain SUM's order would leak into every rate),
    * identical least/ratio expression tree and the q49 hash-band
    * keep comparison. */
  def temperatureMix: String = {
    import graft.operators.Sampling.{MixBudgetFrac, MixTemperature, mixedSql}
    s"""WITH tot AS (
  SELECT COUNT(*) AS n_total FROM documents
), st AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
), pw AS (
  SELECT source, n_src, n_total,
         pow(CAST(n_src AS DOUBLE) / n_total, $MixTemperature) AS pw
  FROM st CROSS JOIN tot
), z AS (
  SELECT list_reduce(list_prepend(0.0, list(pw ORDER BY source)),
    (a, b) -> a + b) AS z
  FROM pw
), kr AS (
  SELECT source,
         least(1.0, $MixBudgetFrac * n_total * (pw / z) / n_src)
           AS keep_rate
  FROM pw CROSS JOIN z
)
SELECT doc_id, d.source, ${mixedSql("doc_id")} % 1048576 AS h, keep_rate
FROM documents d JOIN kr ON d.source = kr.source
WHERE ${mixedSql("doc_id")} % 1048576 < keep_rate * 1048576.0"""
  }

  /** Mirror of [[graft.operators.Sampling.epochSchedule]] (q180):
    * exact LONG per-source token mass, the same α-power weights and
    * ascending-source left folds for the three scalar reductions,
    * identical least/greatest/CASE expression trees for the two
    * waterfill passes. */
  def epochSchedule: String = {
    import graft.operators.Sampling.{EpochBudgetFrac, EpochCap,
      MixTemperature}
    s"""WITH t AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS src_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS tot_tokens FROM t
), pw AS (
  SELECT source, n_docs, src_tokens, tot_tokens,
         pow(CAST(src_tokens AS DOUBLE) / tot_tokens, $MixTemperature)
           AS pw
  FROM t CROSS JOIN tot
), z AS (
  SELECT list_reduce(list_prepend(0.0, list(pw ORDER BY source)),
    (a, b) -> a + b) AS z
  FROM pw
), w0 AS (
  SELECT source, n_docs, src_tokens, pw / z.z AS weight,
         $EpochBudgetFrac * tot_tokens AS budget
  FROM pw CROSS JOIN z
), w AS (
  SELECT *, least($EpochCap, budget * weight / src_tokens) AS e1
  FROM w0
), a2 AS (
  SELECT list_reduce(list_prepend(0.0,
           list(e1 * src_tokens ORDER BY source)),
           (a, b) -> a + b) AS achieved1,
         list_reduce(list_prepend(0.0,
           list(CASE WHEN e1 < $EpochCap THEN weight ELSE 0.0 END
                ORDER BY source)),
           (a, b) -> a + b) AS wu
  FROM w
), fin AS (
  SELECT source, n_docs, src_tokens, weight, e1,
         CASE WHEN e1 >= $EpochCap OR wu <= 0.0 THEN e1
              ELSE least($EpochCap, e1 +
                greatest(0.0, budget - achieved1) * (weight / wu)
                  / src_tokens) END AS epochs
  FROM w CROSS JOIN a2
)
SELECT source, n_docs, src_tokens, weight, e1 AS epochs_pass1,
       epochs, epochs * src_tokens AS planned_tokens
FROM fin"""
  }

  /** Mirror of [[graft.operators.Sampling.uniMaxAllocation]] (q198):
    * the same ascending-capacity prefix-capped closed form — LONG
    * cross-multiplied cap test, one water level, identical
    * double-division order. */
  def uniMaxAllocation: String = {
    import graft.operators.Sampling.{UniMaxBudgetDen, UniMaxEpochCap}
    s"""WITH t AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS src_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS tot_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_src
  FROM t
), caps AS (
  SELECT source, n_docs, src_tokens, n_src,
         tot_tokens // $UniMaxBudgetDen AS budget,
         src_tokens * $UniMaxEpochCap AS capacity,
         CAST(row_number() OVER w AS BIGINT) AS idx,
         COALESCE(CAST(SUM(src_tokens * $UniMaxEpochCap) OVER (
           w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0) AS pfx
  FROM t CROSS JOIN tot
  WINDOW w AS (ORDER BY src_tokens * $UniMaxEpochCap ASC, source ASC)
), cp AS (
  SELECT *, capacity * (n_src - idx + 1) <= budget - pfx AS capped
  FROM caps
), kf AS (
  SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
         CAST(SUM(CASE WHEN capped THEN capacity ELSE 0 END)
           AS BIGINT) AS capped_tokens
  FROM cp
), lv AS (
  SELECT cp.*,
         CAST(budget - capped_tokens AS DOUBLE) /
           CAST(greatest(n_src - k, 1) AS DOUBLE) AS level
  FROM cp CROSS JOIN kf
)
SELECT source, n_docs, src_tokens, capacity, capped,
       CASE WHEN capped THEN CAST(capacity AS DOUBLE)
            ELSE level END AS alloc_tokens,
       (CASE WHEN capped THEN CAST(capacity AS DOUBLE)
             ELSE level END) / CAST(src_tokens AS DOUBLE) AS epochs
FROM lv"""
  }

  /** Mirror of [[graft.operators.Pipeline.kAnonymize]] (q181): the
    * same three cohort aggregations — each coarser level counting
    * only rows NOT released at a finer one — identical band floor
    * arithmetic, CASE precedence, and level-prefixed released key. */
  def kAnonymize: String = {
    import graft.operators.Pipeline.{AnonBandCoarse, AnonBandFine,
      AnonK}
    s"""WITH base AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal / $AnonBandFine) AS BIGINT) AS band0,
         CAST(floor(c_acctbal / $AnonBandCoarse) AS BIGINT) AS band1
  FROM customer
), g0 AS (
  SELECT nation, segment, band0, CAST(COUNT(*) AS BIGINT) AS n0
  FROM base GROUP BY nation, segment, band0
), b0 AS (
  SELECT b.*, g0.n0, g0.n0 >= $AnonK AS rel0
  FROM base b JOIN g0 USING (nation, segment, band0)
), g1 AS (
  SELECT nation, segment, band1,
         CAST(SUM(CASE WHEN NOT rel0 THEN 1 ELSE 0 END) AS BIGINT)
           AS r1
  FROM b0 GROUP BY nation, segment, band1
), b1 AS (
  SELECT b0.*, g1.r1, (NOT rel0) AND g1.r1 >= $AnonK AS rel1
  FROM b0 JOIN g1 USING (nation, segment, band1)
), g2 AS (
  SELECT segment, band1,
         CAST(SUM(CASE WHEN NOT rel0 AND NOT rel1 THEN 1 ELSE 0 END)
           AS BIGINT) AS r2
  FROM b1 GROUP BY segment, band1
), b2 AS (
  SELECT b1.*, g2.r2,
         (NOT rel0) AND (NOT rel1) AND g2.r2 >= $AnonK AS rel2
  FROM b1 JOIN g2 USING (segment, band1)
)
SELECT c_custkey,
       CASE WHEN rel0 THEN 0 WHEN rel1 THEN 1 WHEN rel2 THEN 2
            ELSE 3 END AS anon_level,
       CASE WHEN rel0 THEN concat_ws('|', 'L0', nation, segment, band0)
            WHEN rel1 THEN concat_ws('|', 'L1', nation, segment, band1)
            WHEN rel2 THEN concat_ws('|', 'L2', segment, band1)
            ELSE '*' END AS released_key,
       CASE WHEN rel0 THEN n0 WHEN rel1 THEN r1 WHEN rel2 THEN r2
            ELSE NULL END AS cohort_size
FROM b2"""
  }

  /** Mirror of [[graft.operators.Pipeline.lDiversityAudit]] (q197):
    * same two-level rollup (per-sensitive counts, then per-class
    * size/distinct/modal) and the same exact-integer cross-multiplied
    * frequency cap. */
  def lDiversityAudit: String = {
    import graft.operators.Pipeline.{AnonBandFine, AnonFreqDen,
      AnonFreqNum, AnonK, AnonL}
    s"""WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal / $AnonBandFine) AS BIGINT) AS sens
  FROM customer
), per_sens AS (
  SELECT nation, segment, sens, CAST(COUNT(*) AS BIGINT) AS n_sens
  FROM base GROUP BY nation, segment, sens
)
SELECT nation, segment,
       CAST(SUM(n_sens) AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(MAX(n_sens) AS BIGINT) AS modal_count,
       (SUM(n_sens) >= $AnonK AND COUNT(*) >= $AnonL AND
        MAX(n_sens) * $AnonFreqDen <= SUM(n_sens) * $AnonFreqNum)
         AS released
FROM per_sens GROUP BY nation, segment"""
  }

  /** q60 oracle — mirror of
    * [[graft.operators.Sampling.upsampleMixture]]: identical CASE
    * weights, Knuth-hash fractional copy, lateral range fan-out. */
  def upsampleMixture: String = {
    import graft.operators.Sampling._
    val w = UpsampleWeights.map { case (l, f) =>
      s"WHEN lang = '$l' THEN $f"
    }.mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH w AS (
  SELECT doc_id, lang, ($w) AS weight,
         ${mixedSql("doc_id")} % 1048576 AS h
  FROM documents
), c AS (
  SELECT doc_id, lang,
         CAST(FLOOR(weight) AS BIGINT) +
           (CASE WHEN h < (weight - FLOOR(weight)) * 1048576.0
             THEN 1 ELSE 0 END) AS n_copies
  FROM w
)
SELECT c.doc_id, c.lang, c.n_copies, r.i AS copy,
       c.doc_id * $UpsampleIdStride + r.i AS sample_id
FROM c, LATERAL (SELECT unnest(range(0, c.n_copies)) AS i) r
WHERE c.n_copies > 0"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.piiScrub]] over the
    * [[graft.operators.TextAnalysis.withSyntheticPii]] corpus: the
    * PII synthesis is pure integer arithmetic on doc_id (both engines
    * build byte-identical text), the patterns are shared ASCII-class
    * constants (Java and RE2 agree), and DuckDB's regexp_replace
    * needs the explicit 'g' flag to match Spark's replace-all. */
  def piiScrub: String = {
    import graft.operators.TextAnalysis.{EmailPattern, PhonePattern}
    s"""WITH p AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 3 = 0
      THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
      ELSE '' END ||
    CASE WHEN doc_id % 5 = 0
      THEN ' call ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
        || CAST((doc_id * 7) % 900 + 100 AS VARCHAR) || '-'
        || CAST(doc_id % 9000 + 1000 AS VARCHAR)
      ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '$EmailPattern')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(text, '$PhonePattern')) AS BIGINT)
    AS n_phones,
  regexp_replace(regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g'),
    '$PhonePattern', '<PHONE>', 'g') AS clean_text
FROM p"""
  }

  /** q58 oracle — mirror of
    * [[graft.operators.Dedup.duplicatedSpans]]: per-doc-distinct
    * sampled k-gram rolling hashes (positions 0, stride, 2·stride …),
    * spans in ≥ 2 docs are duplicated, counts re-aggregated per doc. */
  def dupSpans: String = {
    val k = Dedup.DupSpanK
    val s = Dedup.DupSpanStride
    val b = Dedup.WinnowBase
    val m = Dedup.P
    s"""WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= $k
), h AS (
  SELECT doc_id,
    list_distinct(list_transform(range(0, (length(text) - $k) // $s + 1),
      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, ${k + 1}),
          j -> CAST(ord(substr(text, CAST(i * $s + j AS INT), 1)) AS BIGINT))),
        (a, c) -> (a * $b + c) % $m))) AS hs
  FROM d
), ex AS (
  SELECT doc_id, unnest(hs) AS g FROM h
), dup AS (
  SELECT g FROM ex GROUP BY g HAVING COUNT(*) >= 2
), dc AS (
  SELECT ex.doc_id, COUNT(*) AS n_dup_grams
  FROM ex JOIN dup USING (g) GROUP BY ex.doc_id
)
SELECT h.doc_id, CAST(len(h.hs) AS BIGINT) AS n_grams,
       COALESCE(dc.n_dup_grams, 0) AS n_dup_grams,
       CAST(COALESCE(dc.n_dup_grams, 0) AS DOUBLE) / len(h.hs)
         AS dup_ratio
FROM h LEFT JOIN dc USING (doc_id)"""
  }

  /** Mirror of [[graft.operators.Dedup.removeDuplicatedSpans]]
    * (q102): same positioned rolling span hashes, the same
    * min-doc-keeper rule, and a character-set rebuild that equals the
    * Spark side's interval-merge fold (both compute the complement of
    * the union of [pos, pos+K) cut ranges). */
  def removeDupSpans: String = {
    val k = Dedup.DupSpanK
    val s = Dedup.DupSpanStride
    val b = Dedup.WinnowBase
    val m = Dedup.P
    s"""WITH d AS (
  SELECT doc_id, text FROM documents
), sp AS (
  SELECT doc_id,
    unnest(list_transform(range(0, (length(text) - $k) // $s + 1),
      i -> {'pos': i * $s, 'g': list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, ${k + 1}),
          j -> CAST(ord(substr(text, CAST(i * $s + j AS INT), 1)) AS BIGINT))),
        (a, c) -> (a * $b + c) % $m)})) AS sg
  FROM d WHERE length(text) >= $k
), spf AS (
  SELECT doc_id, sg.pos AS pos, sg.g AS g FROM sp
), dup AS (
  SELECT g, MIN(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, g FROM spf)
  GROUP BY g HAVING COUNT(*) >= 2
), cuts AS (
  SELECT DISTINCT spf.doc_id, spf.pos
  FROM spf JOIN dup ON spf.g = dup.g AND spf.doc_id <> dup.keeper
), cutchars AS (
  SELECT DISTINCT cuts.doc_id, cuts.pos + j.j AS c
  FROM cuts, unnest(range(1, ${k + 1})) AS j(j)
), chars AS (
  SELECT d.doc_id, t.c AS c, substr(d.text, CAST(t.c AS INT), 1) AS ch
  FROM d, unnest(range(1, length(d.text) + 1)) AS t(c)
), kept AS (
  SELECT chars.doc_id, chars.c, chars.ch
  FROM chars LEFT JOIN cutchars
    ON chars.doc_id = cutchars.doc_id AND chars.c = cutchars.c
  WHERE cutchars.c IS NULL
), rb AS (
  SELECT doc_id, string_agg(ch, '' ORDER BY c) AS cleaned
  FROM kept GROUP BY doc_id
), nc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cut_spans
  FROM cuts GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(rb.cleaned, '') AS cleaned_text,
       COALESCE(nc.n_cut_spans, 0) AS n_cut_spans,
       CAST(length(d.text) - length(COALESCE(rb.cleaned, ''))
         AS BIGINT) AS n_chars_removed
FROM d LEFT JOIN rb ON d.doc_id = rb.doc_id
       LEFT JOIN nc ON d.doc_id = nc.doc_id"""
  }

  /** q61 oracle — one UNION ALL arm per profiled column, mirroring
    * [[graft.operators.Profiling.numericProfile]]'s long format. */
  def numericProfile: String =
    graft.operators.Profiling.ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name,
  COUNT(*) AS n_rows,
  COUNT(*) - COUNT($c) AS n_nulls,
  COUNT(DISTINCT $c) AS n_distinct,
  CAST(MIN($c) AS DOUBLE) AS min_value,
  CAST(MAX($c) AS DOUBLE) AS max_value
FROM lineitem"""
    }.mkString("\nUNION ALL\n")

  /** q79 oracle — the q61 arms plus a literal-TRUE `hll_ok` bound
    * boolean (the engine side asserts the HLL estimate within 3×rsd
    * of the exact distinct; see
    * [[graft.operators.Profiling.numericProfileChecked]]). */
  def numericProfileChecked: String =
    graft.operators.Profiling.ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name,
  COUNT(*) AS n_rows,
  COUNT(*) - COUNT($c) AS n_nulls,
  COUNT(DISTINCT $c) AS n_distinct,
  TRUE AS hll_ok,
  CAST(MIN($c) AS DOUBLE) AS min_value,
  CAST(MAX($c) AS DOUBLE) AS max_value
FROM lineitem"""
    }.mkString("\nUNION ALL\n")

  /** q62 oracle — mirror of
    * [[graft.operators.Profiling.gapFillHourly]]: integer hour
    * buckets, per-user lateral grid, IGNORE NULLS forward fill. */
  def gapFillHourly: String =
    """WITH o AS (
  SELECT user_id, (epoch_ns(ts) // 1000000) // 3600000 AS hour,
         SUM(value) / COUNT(*) AS hour_avg
  FROM events GROUP BY 1, 2
), s AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM o GROUP BY 1
), g AS (
  SELECT s.user_id, r.h AS hour
  FROM s, LATERAL (SELECT unnest(range(s.h0, s.h1 + 1)) AS h) r
)
SELECT g.user_id, g.hour,
       last_value(o.hour_avg IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       o.hour_avg IS NOT NULL AS is_observed
FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.hour = o.hour"""

  /** q54 oracle — recomputes the WAV decoder's sample-exact facts
    * from the same doc_id arithmetic that synthesized the PCM stream
    * ([[graft.operators.Multimodal.wavSamplesOf]]): n = 64 + id%64
    * samples, sample i = ((id*31 + i*7) % 2048) - 1024, 8 kHz mono
    * 16-bit (duration_us = n * 125 exactly). */
  def wavDecode: String = {
    val rate = graft.operators.Multimodal.WavRate
    s"""WITH au AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
amps AS (
  SELECT a.doc_id, a.n,
         ABS(((a.doc_id * 31 + r.i * 7) % 2048) - 1024) AS amp
  FROM au a, LATERAL (SELECT unnest(range(0, a.n)) AS i) r
)
SELECT doc_id, $rate AS sample_rate, n AS n_samples,
       n * (1000000 // $rate) AS duration_us,
       MAX(amp) AS peak_abs, CAST(SUM(amp) AS BIGINT) AS sum_abs
FROM amps GROUP BY doc_id, n"""
  }

  /** Mirror of [[graft.operators.Multimodal.audioFrameFeatures]]
    * (q213): frames and features recomputed from the q54 synthesis
    * arithmetic; the previous sample is the closed-form formula at
    * i−1 (no window needed), crossings only within a frame. */
  def audioFrameFeatures: String = {
    val fl = graft.operators.Multimodal.AudioFrameLen
    s"""WITH au AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
), s AS (
  SELECT a.doc_id, r.i,
         ((a.doc_id * 31 + r.i * 7) % 2048) - 1024 AS s,
         CASE WHEN r.i % $fl = 0 THEN NULL
              ELSE ((a.doc_id * 31 + (r.i - 1) * 7) % 2048) - 1024
         END AS sp
  FROM au a, LATERAL (SELECT unnest(range(0, a.n)) AS i) r
)
SELECT doc_id, CAST(i // $fl AS BIGINT) AS frame,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(s * s) AS BIGINT) AS sumsq,
       CAST(SUM(CASE WHEN sp IS NOT NULL AND sp * s < 0
                THEN 1 ELSE 0 END) AS BIGINT) AS zc,
       sqrt(CAST(SUM(s * s) AS DOUBLE) / COUNT(*)) AS rms
FROM s GROUP BY doc_id, i // $fl"""
  }

  /** Mirror of [[graft.operators.Multimodal.exifStats]] (q258):
    * recomputes the expected EXIF fields from
    * [[graft.operators.Multimodal.exifFieldsOf]]'s arithmetic (the
    * q54 discipline — the engine side must round-trip the real
    * marker/IFD byte stream to match). */
  def exifStats: String =
    """SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
       CAST(5 AS BIGINT) AS n_entries,
       'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
       'Model-' || CAST(doc_id % 13 AS VARCHAR) AS model,
       1 + doc_id % 8 AS orientation,
       640 + doc_id % 1024 AS width,
       '2024:04:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
         ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') ||
         ':00:00' AS datetime
FROM documents"""

  /** Mirror of [[graft.operators.Multimodal.shotBoundaries]]
    * (q280): frame sums recomputed in closed form from the fixture
    * arithmetic (the engine must round-trip the real raw-RGB track
    * to match), cuts and shot ids from the same step rule. */
  def shotBoundaries: String =
    """WITH d AS (
  SELECT doc_id, doc_id % 5 AS r, 4 + doc_id % 4 AS w,
         4 + doc_id % 3 AS h, 8 + doc_id % 5 AS n
  FROM documents
), fr AS (
  SELECT doc_id, r, w * h * 3 AS npx, q.f
  FROM d, LATERAL (SELECT unnest(range(0, n)) AS f) q
)
SELECT doc_id, CAST(f AS BIGINT) AS frame,
       CAST(npx * (50 * ((f + r) // 5) + f) +
            (npx // 7) * 21 +
            (npx % 7) * (npx % 7 - 1) // 2 AS BIGINT) AS frame_sum,
       f > 0 AND (f + r) % 5 = 0 AS is_cut,
       CAST((f + r) // 5 AS BIGINT) AS shot_id
FROM fr"""

  /** Mirror of [[graft.operators.Multimodal.shotSampledFrames]]
    * (q281): the q280 frame CTE rolled up per shot, middle frame
    * sampled. */
  def shotSampledFrames: String =
    s"""WITH fr0 AS ($shotBoundaries
), sh AS (
  SELECT doc_id, shot_id, MIN(frame) AS first_frame,
         MAX(frame) AS last_frame,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST((MIN(frame) + MAX(frame)) // 2 AS BIGINT)
           AS sampled_frame
  FROM fr0 GROUP BY doc_id, shot_id
)
SELECT sh.doc_id, sh.shot_id, sh.first_frame, sh.last_frame,
       sh.n_frames, sh.sampled_frame, f2.frame_sum AS sampled_sum
FROM sh JOIN fr0 f2
  ON f2.doc_id = sh.doc_id AND f2.frame = sh.sampled_frame"""

  /** Mirror of [[graft.operators.Multimodal.interleaveMultimodal]]
    * (q282): the q274 and q281 mirrors unioned on the same clocks,
    * same (t, modality, ref) order, running token sum. */
  def interleaveMultimodal: String = {
    val cost = graft.operators.Multimodal.ImageTokenCost
    s"""WITH tx AS (
  SELECT doc_id, CAST(sent_idx * 500 AS BIGINT) AS t_ms,
         'text' AS modality, sentence AS ref, n_words AS n_tokens
  FROM ($sentenceSegments)
), im AS (
  SELECT doc_id, CAST(sampled_frame * 700 AS BIGINT) AS t_ms,
         'image' AS modality,
         'frame:' || CAST(sampled_frame AS VARCHAR) AS ref,
         CAST($cost AS BIGINT) AS n_tokens
  FROM ($shotSampledFrames)
), u AS (
  SELECT * FROM tx UNION ALL SELECT * FROM im
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
         ORDER BY t_ms, modality, ref) - 1 AS BIGINT) AS seq_idx,
       t_ms, modality, ref, n_tokens,
       CAST(SUM(n_tokens) OVER (PARTITION BY doc_id
         ORDER BY t_ms, modality, ref
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
FROM u"""
  }

  /** Mirror of [[graft.operators.Multimodal.vadSegments]] (q257):
    * frames from the q213 arithmetic, the same integer energy
    * test, hangover max, and gaps-and-islands collapse. */
  def vadSegments: String = {
    import graft.operators.Multimodal.{AudioFrameLen => FL,
      VadEnergyPerSample => T, VadHangoverFrames => H, WavRate}
    val frameMs = FL * 1000L / WavRate
    s"""WITH au AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
), s AS (
  SELECT a.doc_id, r.i,
         ((a.doc_id * 31 + r.i * 7) % 2048) - 1024 AS s
  FROM au a, LATERAL (SELECT unnest(range(0, a.n)) AS i) r
), fr AS (
  SELECT doc_id, CAST(i // $FL AS BIGINT) AS frame,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(s * s) AS BIGINT) AS sumsq
  FROM s GROUP BY doc_id, i // $FL
), raw AS (
  SELECT doc_id, frame, sumsq,
         CASE WHEN sumsq > n * $T THEN 1 ELSE 0 END AS raw
  FROM fr
), sm AS (
  SELECT doc_id, frame, sumsq,
         MAX(raw) OVER (PARTITION BY doc_id ORDER BY frame
           ROWS BETWEEN $H PRECEDING AND CURRENT ROW) AS speech
  FROM raw
), isl AS (
  SELECT doc_id, frame, sumsq,
         frame - row_number() OVER (PARTITION BY doc_id
           ORDER BY frame) AS island
  FROM sm WHERE speech = 1
), seg AS (
  SELECT doc_id, island, MIN(frame) AS start_frame,
         MAX(frame) AS end_frame,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(sumsq) AS BIGINT) AS energy
  FROM isl GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
         ORDER BY start_frame) - 1 AS BIGINT) AS seg_idx,
       start_frame, end_frame, n_frames,
       start_frame * $frameMs AS start_ms,
       (end_frame + 1) * $frameMs AS end_ms, energy
FROM seg"""
  }

  /** q55 oracle — recomputes the PPM decode + ×2 nearest-neighbor
    * resize facts from [[graft.operators.Multimodal.ppmOf]]'s pixel
    * arithmetic: w = 4 + id%8, h = 3 + id%5, channel c of pixel
    * (x, y) = (id + 3x + 7y + 11c) % 256; the resized raster samples
    * source pixel (2x, 2y) with dims ceil(w/2) × ceil(h/2). */
  def ppmDecode: String =
    """WITH im AS (
  SELECT doc_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT i.doc_id, i.w, i.h,
         (i.doc_id + 3 * x.x + 7 * y.y) % 256 AS r,
         (i.doc_id + 3 * x.x + 7 * y.y + 11) % 256 AS g,
         (i.doc_id + 3 * x.x + 7 * y.y + 22) % 256 AS b
  FROM im i,
       LATERAL (SELECT unnest(range(0, i.w)) AS x) x,
       LATERAL (SELECT unnest(range(0, i.h)) AS y) y
),
base AS (
  SELECT doc_id, w, h,
         CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(g) AS BIGINT) AS sum_g,
         CAST(SUM(b) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id, w, h
),
rim AS (
  SELECT doc_id, (w + 1) // 2 AS rw, (h + 1) // 2 AS rh FROM im
),
rpx AS (
  SELECT i.doc_id, i.rw, i.rh,
         (i.doc_id + 3 * (2 * x.x) + 7 * (2 * y.y)) % 256 AS r
  FROM rim i,
       LATERAL (SELECT unnest(range(0, i.rw)) AS x) x,
       LATERAL (SELECT unnest(range(0, i.rh)) AS y) y
),
rbase AS (
  SELECT doc_id, rw, rh, CAST(SUM(r) AS BIGINT) AS r_sum_r
  FROM rpx GROUP BY doc_id, rw, rh
)
SELECT b.doc_id, b.w AS width, b.h AS height,
       b.sum_r, b.sum_g, b.sum_b,
       r.rw AS r_width, r.rh AS r_height, r.r_sum_r
FROM base b JOIN rbase r USING (doc_id)"""

  /** q67 oracle — recomputes the PNG decode facts from
    * [[graft.operators.Multimodal.pngOf]]'s raster arithmetic:
    * w = 4 + id%7, h = 5 + id%6, channel c of pixel (x, y) =
    * (id*7 + 5x + 3y + 13c) % 256. The engine side round-trips the
    * raster through a real zlib+filtered PNG encode/decode; equality
    * with this direct recomputation proves the codec inverted it. */

  /** Mirror of [[graft.operators.Sampling.leakageSafeSplit]] (q90):
    * the q42 recursive-CTE clustering supplies canonical ids, docs in
    * no pair are their own representative, and the split is q32's
    * Knuth-hash assignment computed on the canonical id. */
  def leakageSafeSplit: String = {
    import graft.operators.Sampling._
    val b = s"${mixedSql("canonical_id")} % 1000"
    s"""WITH c AS (
  SELECT doc_id, canonical_id FROM ($dedupClusters)
), a AS (
  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
)
SELECT doc_id, canonical_id,
       $b AS bucket,
       CASE WHEN $b < $TrainPerMille THEN 'train'
            WHEN $b < $ValPerMille THEN 'validation'
            ELSE 'test' END AS split
FROM a"""
  }

  /** Mirror of [[graft.operators.Sampling.importanceWeights]] (q91):
    * same whitespace bigrams, same 60-bit digest buckets, identical
    * smoothed log-ratio expression tree (ln of a double division,
    * target term minus corpus term), per-doc weight as Σ n·logratio,
    * global rank tie-broken by doc_id. */
  def importanceWeights: String = {
    import graft.operators.Sampling._
    s"""WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w)),
           i -> w[i] || ' ' || w[i+1])) AS bg
  FROM d WHERE len(w) >= 2
), f AS (
  SELECT doc_id, source, ${digest60Sql("bg")} % $DsirBuckets AS b
  FROM bg
), st AS (
  SELECT b, COUNT(*) AS s_n,
         SUM(CASE WHEN source = '$DsirTargetSource' THEN 1 ELSE 0 END)
           AS t_n
  FROM f GROUP BY b
), tot AS (
  SELECT SUM(s_n) AS s_tot, SUM(t_n) AS t_tot FROM st
), lr AS (
  SELECT b,
         ln(CAST(t_n + 1 AS DOUBLE) / (t_tot + $DsirBuckets)) -
         ln(CAST(s_n + 1 AS DOUBLE) / (s_tot + $DsirBuckets)) AS logratio
  FROM st, tot
), db AS (
  SELECT doc_id, b, COUNT(*) AS n FROM f GROUP BY doc_id, b
), wgt AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_features,
         SUM(n * logratio) AS log_w
  FROM db JOIN lr USING (b) GROUP BY doc_id
), r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY log_w DESC, doc_id ASC)
    AS BIGINT) AS rank FROM wgt
)
SELECT doc_id, n_features, log_w, rank FROM r WHERE rank <= $DsirTopK"""
  }

  def pngDecode: String =
    """WITH im AS (
  SELECT doc_id, 4 + doc_id % 7 AS w, 5 + doc_id % 6 AS h FROM documents
),
px AS (
  SELECT i.doc_id, i.w, i.h,
         (i.doc_id * 7 + 5 * x.x + 3 * y.y) % 256 AS r,
         (i.doc_id * 7 + 5 * x.x + 3 * y.y + 13) % 256 AS g,
         (i.doc_id * 7 + 5 * x.x + 3 * y.y + 26) % 256 AS b
  FROM im i,
       LATERAL (SELECT unnest(range(0, i.w)) AS x) x,
       LATERAL (SELECT unnest(range(0, i.h)) AS y) y
)
SELECT doc_id, w AS width, h AS height,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h"""

  /** q126 oracle — mirror of
    * [[graft.operators.Multimodal.imageNearDups]]: replays the
    * variant-raster arithmetic of
    * [[graft.operators.Multimodal.ppmVariantOf]] at the 9×8 dHash
    * grid's sampled source pixels only (the q55 recompute-the-pixels
    * pattern — the decode itself is proven by the Spark side going
    * through the REAL PPM codec), packs the 64 comparison bits with
    * bit 63 as the signed constant (the q121 sign trick; the sum of
    * distinct signed powers equals the kernel's OR accumulation),
    * and mirrors the 4×16-bit block banding + exact popcount verify.
    * Banding is lossless at Hamming ≤ 3 (pigeonhole over 4 blocks),
    * so this also equals the all-pairs answer. Integer arithmetic
    * end to end — no FP mirror risk. */
  def imageNearDups: String = {
    import graft.operators.Multimodal.{ImageBlocks, ImageHammingMax,
      ImageVariants}
    s"""WITH d2 AS (
  SELECT doc_id, doc_id // $ImageVariants AS g, doc_id % $ImageVariants AS v,
         12 + (doc_id // $ImageVariants) % 5 AS w,
         9 + (doc_id // $ImageVariants) % 4 AS h
  FROM documents
), grid AS (
  SELECT d.doc_id, d.g, d.v, gy.gy, gx.gx,
         (gx.gx * d.w) // 9 AS sx, (gy.gy * d.h) // 8 AS sy
  FROM d2 d,
       LATERAL (SELECT unnest(range(0, 9)) AS gx) gx,
       LATERAL (SELECT unnest(range(0, 8)) AS gy) gy
), gray AS (
  SELECT doc_id, gy, gx,
         (((xor(xor(g * 73856093, sx * 19349663), sy * 83492791)
            + CASE WHEN sx = 0 AND sy = 0 THEN v ELSE 0 END) % 256)
          + ((xor(xor(xor(g * 73856093, sx * 19349663), sy * 83492791),
                  15485863)
            + CASE WHEN sx = 0 AND sy = 0 THEN v ELSE 0 END) % 256)
          + ((xor(xor(xor(g * 73856093, sx * 19349663), sy * 83492791),
                  30971726)
            + CASE WHEN sx = 0 AND sy = 0 THEN v ELSE 0 END) % 256)) // 3
           AS gray
  FROM grid
), bits AS (
  SELECT a.doc_id, a.gy * 8 + a.gx AS i
  FROM gray a JOIN gray b ON a.doc_id = b.doc_id AND a.gy = b.gy
    AND b.gx = a.gx + 1
  WHERE a.gx < 8 AND b.gray > a.gray
), codes AS (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(CASE WHEN s.i = 63
             THEN -9223372036854775807 - 1
             ELSE CAST(1 AS BIGINT) << s.i END), 0) AS BIGINT) AS code
  FROM d2 d LEFT JOIN bits s USING (doc_id) GROUP BY d.doc_id
), bandrows AS (
  SELECT doc_id, j.j, (code >> (16 * j.j)) & 65535 AS key
  FROM codes, LATERAL (SELECT unnest(range(0, $ImageBlocks)) AS j) j
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandrows a JOIN bandrows b
    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ca.code, cb.code)) AS BIGINT) AS hamming
FROM cand c
JOIN codes ca ON ca.doc_id = c.doc_a
JOIN codes cb ON cb.doc_id = c.doc_b
WHERE bit_count(xor(ca.code, cb.code)) <= $ImageHammingMax"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.pmiCollocations]]
    * (q128): bigram strings are the same space-joined token windows
    * as WordShingles, corpus counts are occurrence COUNT(*)s (equal
    * to Spark's Σ per-doc tf by construction), and the PMI ln operand
    * chain is written in the identical evaluation order so the graded
    * doubles hash-match (the q33 tf·ln precedent). The same
    * (pmi DESC, w1, w2) ranking decides the top-k in both engines. */
  def pmiCollocations: String = {
    import graft.operators.TextAnalysis.{PmiMinCount, PmiTopK, WordPattern}
    s"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '$WordPattern') AS toks
  FROM documents
), occ AS (
  SELECT unnest(toks) AS t FROM tok
), uni AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cu FROM occ GROUP BY t
), bocc AS (
  SELECT unnest(list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM tok
), bg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS cb FROM bocc GROUP BY g
), n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM occ),
n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bg FROM bocc),
scored AS (
  SELECT b.w1, b.w2, b.cb, u1.cu AS cu1, u2.cu AS cu2,
         ln((CAST(b.cb AS DOUBLE) * n_tok * n_tok) /
            (CAST(n_bg AS DOUBLE) * u1.cu * u2.cu)) AS pmi
  FROM (SELECT string_split(g, ' ')[1] AS w1,
               string_split(g, ' ')[2] AS w2, cb
        FROM bg WHERE cb >= $PmiMinCount) b
  JOIN uni u1 ON u1.t = b.w1
  JOIN uni u2 ON u2.t = b.w2
  CROSS JOIN n1 CROSS JOIN n2
)
SELECT w1, w2, cb, cu1, cu2, pmi, rank FROM (
  SELECT *, CAST(row_number() OVER (
    ORDER BY pmi DESC, w1 ASC, w2 ASC) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= $PmiTopK"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.c4LineClean]] (q129):
    * the identical deterministic line derivation (width-w token
    * windows + the mod-keyed punctuation/poison schedule) and the
    * identical C4 rules — list_slice/list_filter replay
    * slice/filter, chr(10) is the same newline Spark's array_join
    * emits. */
  def c4LineClean: String = {
    import graft.operators.TextAnalysis.{C4LineWords => W,
      C4MinLineWords, C4MinKeptLines}
    s"""WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), d AS (
  SELECT doc_id,
    CAST((len(w) + ${W - 1}) // $W AS BIGINT) AS n_lines,
    list_transform(range(0, (len(w) + ${W - 1}) // $W), i ->
      array_to_string(list_slice(w, $W * i + 1, $W * i + $W), ' ')
      || CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' lorem ipsum' ELSE '' END
      || CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' {' ELSE '' END
      || CASE WHEN (doc_id + i) % 7 = 2 THEN ' javascript' ELSE '' END
      || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END) AS lines
  FROM base
), k AS (
  SELECT doc_id, n_lines,
    list_filter(lines, x ->
      substring(x, length(x), 1) IN ('.', '!', '?', '"')
      AND len(string_split(x, ' ')) >= $C4MinLineWords
      AND NOT contains(x, 'javascript')) AS kept_lines,
    array_to_string(lines, chr(10)) AS full_text
  FROM d
)
SELECT doc_id, n_lines,
       CAST(len(kept_lines) AS BIGINT) AS n_kept,
       (NOT contains(full_text, 'lorem ipsum')
        AND NOT contains(full_text, '{')
        AND len(kept_lines) >= $C4MinKeptLines) AS kept,
       COALESCE(array_to_string(kept_lines, chr(10)), '') AS clean_text
FROM k"""
  }

  /** Mirror of [[graft.operators.Similarity.mmrRerankTopK]] (q131):
    * the same exact-cosine pool (identical dot/norm arithmetic), the
    * same pool-pairwise sims, and the greedy UNROLLED — one
    * (cand, sel, all) CTE triple per step, each MATERIALIZED (the
    * q115 anti-inlining discipline: cand_s reads all_{s-1} twice).
    * The λ/(1−λ) literals are the Scala doubles printed exactly, so
    * both engines fold the identical constants. */
  def mmrRerank: String = {
    import graft.operators.Similarity.{MmrLambda, MmrPoolK, MmrTopK}
    val om = 1 - MmrLambda
    val steps = (2 to MmrTopK).map { s =>
      s""", cand$s AS MATERIALIZED (
  SELECT p.query_id, p.vec_id, p.rel, max(pr.sim) AS ms
  FROM pool p
  JOIN pairs pr ON pr.query_id = p.query_id AND pr.b = p.vec_id
  JOIN all${s - 1} se ON se.query_id = pr.query_id AND se.vec_id = pr.a
  WHERE NOT EXISTS (SELECT 1 FROM all${s - 1} x
    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
  GROUP BY p.query_id, p.vec_id, p.rel
), sel$s AS (
  SELECT query_id, vec_id, CAST($s AS BIGINT) AS step, rel, mmr FROM (
    SELECT query_id, vec_id, rel, $MmrLambda * rel - $om * ms AS mmr,
           row_number() OVER (PARTITION BY query_id
             ORDER BY ($MmrLambda * rel - $om * ms) DESC, vec_id ASC) AS rn2
    FROM cand$s) WHERE rn2 = 1
), all$s AS MATERIALIZED (
  SELECT * FROM all${s - 1} UNION ALL SELECT * FROM sel$s
)"""
    }.mkString
    s"""$embCtes
, scored AS (
  SELECT query_id, vec_id, v, nrm,
         ${dotSql("qv", "v")} / (qn * nrm) AS rel
  FROM q, n WHERE vec_id <> query_id
), pool AS MATERIALIZED (
  SELECT query_id, vec_id, v, nrm, rel, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY rel DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= $MmrPoolK
), pairs AS MATERIALIZED (
  SELECT p1.query_id, p1.vec_id AS a, p2.vec_id AS b,
         ${dotSql("p1.v", "p2.v")} / (p1.nrm * p2.nrm) AS sim
  FROM pool p1 JOIN pool p2
    ON p1.query_id = p2.query_id AND p1.vec_id <> p2.vec_id
), all1 AS MATERIALIZED (
  SELECT query_id, vec_id, CAST(1 AS BIGINT) AS step, rel,
         $MmrLambda * rel - $om * 0.0 AS mmr
  FROM pool WHERE rn = 1
)$steps
SELECT query_id, vec_id, step, rel, mmr FROM all$MmrTopK"""
  }

  /** Mirror of [[graft.operators.Dedup.paragraphDedup]] (q130):
    * identical width-P windows and md5 paragraph digests; the
    * canonical pick (min (doc_id,pos) per hash) is a row_number
    * window — equal to Spark's min-struct selection; the rebuild
    * replays the same sorted-position slice join. */
  def paragraphDedup: String = {
    import graft.operators.Dedup.{ParaWords => P}
    s"""WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id, w, (len(w) + ${P - 1}) // $P AS n_paras FROM b
), p AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice(w, $P * i + 1, $P * i + $P), ' '))
           AS phash
  FROM base, LATERAL (SELECT unnest(range(0, n_paras)) AS i) t
), k AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY phash
           ORDER BY doc_id ASC, pos ASC) AS rn
  FROM p
), kept AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         list_sort(list(pos)) AS keep_pos
  FROM k WHERE rn = 1 GROUP BY doc_id
)
SELECT base.doc_id, CAST(n_paras AS BIGINT) AS n_paras,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(array_to_string(list_transform(keep_pos,
         i -> array_to_string(list_slice(w, $P * i + 1, $P * i + $P), ' ')),
         ' '), '') AS clean_text
FROM base LEFT JOIN kept ON kept.doc_id = base.doc_id"""
  }

  /** Mirror of [[graft.operators.Dedup.boilerplateStrip]] (q200):
    * q130's paragraph digests with the df-cap keep rule — every copy
    * of an over-cap paragraph cut via anti-join, all copies of rare
    * paragraphs kept. */
  def boilerplateStrip: String = {
    import graft.operators.Dedup.{BoilerplateDfCap, ParaWords => P}
    s"""WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), ${boilerplateTailCtes(BoilerplateDfCap, P)}"""
  }

  /** The q200 chain AFTER tokenization (expects a CTE `b` providing
    * (doc_id, w)) — shared by the direct mirror above and q240's
    * extraction-headed funnel, which swaps the `b` source for
    * extracted text. CTEs base/p/boiler/kept plus the rebuild
    * SELECT, which [[boilerplateStrip]] uses directly and the
    * funnel wraps as a subquery. */
  private def boilerplateTailCtes(dfCap: Long, P: Int): String =
    s"""base AS (
  SELECT doc_id, w, (len(w) + ${P - 1}) // $P AS n_paras FROM b
), p AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice(w, $P * i + 1, $P * i + $P), ' '))
           AS phash
  FROM base, LATERAL (SELECT unnest(range(0, n_paras)) AS i) t
), boiler AS (
  SELECT phash FROM p GROUP BY phash
  HAVING COUNT(*) > $dfCap
), kept AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         list_sort(list(pos)) AS keep_pos
  FROM p ANTI JOIN boiler USING (phash)
  GROUP BY doc_id
)
SELECT base.doc_id, CAST(n_paras AS BIGINT) AS n_paras,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(array_to_string(list_transform(keep_pos,
         i -> array_to_string(list_slice(w, $P * i + 1, $P * i + $P), ' ')),
         ' '), '') AS clean_text
FROM base LEFT JOIN kept ON kept.doc_id = base.doc_id"""

  /** Shared CTEs of the q241/q242 ExactSubstr mirrors — these state
    * the Lee et al. rule DIRECTLY: the duplicate key is the literal
    * k-token window TEXT (the engine's md5 prefix-doubling digests
    * are its scalable stand-in; a digest collision would fail this
    * gate). Maximal spans = runs of duplicated window starts merged
    * while each start is ≤ k past the previous (union of length-k
    * intervals). */
  private def exactSubstrCtes(k: Int): String =
    s"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), win AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(w, i + 1, i + $k), ' ') AS s
  FROM t, LATERAL (SELECT unnest(range(0, len(w) - ${k - 1})) AS i) u
), dup AS (
  SELECT s FROM win GROUP BY s HAVING COUNT(*) >= 2
), starts AS (
  SELECT doc_id, pos FROM win SEMI JOIN dup USING (s)
), g AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                IS NULL
              OR pos - lag(pos) OVER (PARTITION BY doc_id
                ORDER BY pos) > $k
              THEN 1 ELSE 0 END AS brk
  FROM starts
), runs AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS rid
  FROM g
), spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + $k AS span_end
  FROM runs GROUP BY doc_id, rid
)"""

  /** Mirror of [[graft.operators.ExactSubstr.exactSubstrSpans]]
    * (q241). */
  def exactSubstrSpans: String = {
    import graft.operators.ExactSubstr.ExactSubstrK
    s"""${exactSubstrCtes(ExactSubstrK)}
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start AS BIGINT) AS n_tokens
FROM spans"""
  }

  /** Mirror of [[graft.operators.ExactSubstr.exactSubstrRemoval]]
    * (q242): every covered token cut (all copies — the published
    * tool's behavior), text rebuilt from survivors. */
  def exactSubstrRemoval: String = {
    import graft.operators.ExactSubstr.ExactSubstrK
    s"""${exactSubstrCtes(ExactSubstrK)}, covered AS (
  SELECT DISTINCT doc_id, pos + j AS i
  FROM starts, LATERAL (SELECT unnest(range(0, $ExactSubstrK)) AS j) v
), toks AS (
  SELECT doc_id, i, w[CAST(i AS INT) + 1] AS tk
  FROM t, LATERAL (SELECT unnest(range(0, len(w))) AS i) u
), keptt AS (
  SELECT doc_id, i, tk FROM toks ANTI JOIN covered USING (doc_id, i)
), rb AS (
  SELECT doc_id,
         COALESCE(array_to_string(list(tk ORDER BY i), ' '), '')
           AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM keptt GROUP BY doc_id
), ns AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(clean_text, '') AS clean_text,
       COALESCE(n_spans, 0) AS n_spans,
       CAST(len(w) - COALESCE(n_kept, 0) AS BIGINT) AS n_tokens_removed
FROM t LEFT JOIN rb ON rb.doc_id = t.doc_id
       LEFT JOIN ns ON ns.doc_id = t.doc_id"""
  }

  /** Shared CTEs of the q243/q244 URL mirrors — fixture built from
    * [[graft.operators.UrlCanonical]]'s U0..U3 pieces, then the six
    * canonicalization rules applied with the SAME regex literals.
    * Yields CTE `norm` = (doc_id, url, canonical_url, host). */
  private def urlCtes: String = {
    import graft.operators.UrlCanonical._
    val strip = StripParams.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END ||
    '$U0' || CAST(doc_id % 7 AS VARCHAR) || '$U1' ||
    CASE WHEN doc_id % 3 = 0 THEN
           CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
         WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
    '$U2' || CAST(doc_id % 5 AS VARCHAR) ||
    '$U3' || CAST(doc_id % 11 AS VARCHAR) ||
    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 2 = 0
         THEN '?b=2&utm_source=news&a=' || CAST(doc_id % 4 AS VARCHAR)
         ELSE '?a=' || CAST(doc_id % 4 AS VARCHAR) || '&fbclid=xyz&b=2'
    END ||
    CASE WHEN doc_id % 4 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
         ELSE '' END AS url
  FROM documents
), nf AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS nofrag FROM u
), parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
    regexp_extract(nofrag, '^[A-Za-z]+://([^/?]+)', 1) AS hostport,
    regexp_extract(nofrag, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path,
    regexp_extract(nofrag, '\\?(.*)$$', 1) AS query
  FROM nf
), np AS (
  SELECT doc_id, url, scheme,
    lower(regexp_replace(hostport, ':[0-9]+$$', '')) AS host,
    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
    regexp_replace(path, '/+$$', '') AS pathn,
    list_sort(list_filter(string_split(query, '&'),
      p -> length(p) > 0 AND NOT list_contains($strip,
        string_split(p, '=')[1]))) AS kept
  FROM parts
), norm AS (
  SELECT doc_id, url,
    scheme || '://' || host ||
    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
              AND NOT (scheme = 'https' AND port = '443')
         THEN ':' || port ELSE '' END ||
    pathn ||
    CASE WHEN len(kept) > 0
         THEN '?' || array_to_string(kept, '&') ELSE '' END
      AS canonical_url,
    host
  FROM np
)"""
  }

  /** Mirror of [[graft.operators.Robots.robotsWildcardGate]]
    * (q296): the same shared rule tuples, the same published
    * pattern→regex translation, the q249 tie-break ordering over
    * pattern length. */
  def robotsWildcardGate: String = {
    val values = graft.operators.Robots.WildcardRuleTuples
      .map { case (h, a, p) =>
        s"('$h', $a, '$p', '${graft.operators.Robots.wildcardToRegex(p)}')"
      }.mkString(",\n    ")
    s"""$urlCtes, pages AS (
  SELECT doc_id, host,
         regexp_extract(canonical_url,
           '^[a-z]+://[^/?]+([^?]*)', 1) AS path
  FROM norm
), rules(host, is_allow, pattern, rx) AS (
  VALUES
    $values
), m AS (
  SELECT p.doc_id, r.is_allow, r.pattern,
         row_number() OVER (PARTITION BY p.doc_id
           ORDER BY length(r.pattern) DESC, r.is_allow DESC,
                    r.pattern DESC) AS rn
  FROM pages p
  JOIN rules r ON r.host = p.host AND regexp_matches(p.path, r.rx)
)
SELECT p.doc_id, p.host, p.path,
       COALESCE(m.pattern, '') AS rule,
       COALESCE(m.is_allow = 1, TRUE) AS allowed
FROM pages p
LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.doc_id = p.doc_id"""
  }

  /** Shared CTEs of the q293/q294 mirrors: the pct fixture, the
    * RFC 6.2.2.2 normalization (decode unreserved %XX via
    * chr(hex), uppercase the rest), and the q243 canonical
    * arithmetic re-applied to the normalized string. Yields CTE
    * `pnorm` = (doc_id, url, pct_url, canonical_url, host). */
  private def urlPctCtes: String = {
    import graft.operators.UrlCanonical._
    val strip = StripParams.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH u AS (
  SELECT doc_id,
    'https://www.pct' || CAST((doc_id // 2) % 7 AS VARCHAR) ||
    '.example.com' ||
    CASE WHEN doc_id % 2 = 0 THEN '/~user' ELSE '/%7euser' END ||
    CAST((doc_id // 2) % 5 AS VARCHAR) || '/f' ||
    CASE WHEN doc_id % 2 = 0 THEN '%2fx?q=%41&x=%2f'
         ELSE '%2Fx?q=A&x=%2F' END AS url
  FROM documents
), pct AS (
  SELECT doc_id, url,
    string_split(url, '%')[1] || array_to_string(
      list_transform(string_split(url, '%')[2:], p ->
        CASE WHEN chr(CAST('0x' || upper(p[1:2]) AS INT))
                  SIMILAR TO '[A-Za-z0-9._~-]'
             THEN chr(CAST('0x' || upper(p[1:2]) AS INT)) || p[3:]
             ELSE '%' || upper(p[1:2]) || p[3:] END), '') AS pct_url
  FROM u
), pparts AS (
  SELECT doc_id, url, pct_url,
    lower(regexp_extract(pct_url, '^([A-Za-z]+)://', 1)) AS scheme,
    regexp_extract(pct_url, '^[A-Za-z]+://([^/?]+)', 1) AS hostport,
    regexp_extract(pct_url, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path,
    regexp_extract(pct_url, '\\?(.*)$$', 1) AS query
  FROM pct
), pnp AS (
  SELECT doc_id, url, pct_url, scheme,
    lower(regexp_replace(hostport, ':[0-9]+$$', '')) AS host,
    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
    regexp_replace(path, '/+$$', '') AS pathn,
    list_sort(list_filter(string_split(query, '&'),
      p -> length(p) > 0 AND NOT list_contains($strip,
        string_split(p, '=')[1]))) AS kept
  FROM pparts
), pnorm AS (
  SELECT doc_id, url, pct_url,
    scheme || '://' || host ||
    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
              AND NOT (scheme = 'https' AND port = '443')
         THEN ':' || port ELSE '' END ||
    pathn ||
    CASE WHEN len(kept) > 0
         THEN '?' || array_to_string(kept, '&') ELSE '' END
      AS canonical_url,
    host
  FROM pnp
)"""
  }

  /** Mirror of [[graft.operators.UrlCanonical.urlPctCanonical]]
    * (q293). */
  def urlPctCanonical: String =
    s"""$urlPctCtes
SELECT doc_id, url, pct_url, canonical_url, host FROM pnorm"""

  /** Mirror of [[graft.operators.UrlCanonical.urlPctCollapse]]
    * (q294). */
  def urlPctCollapse: String = {
    val quota = graft.operators.UrlCanonical.HostQuota
    s"""$urlPctCtes
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
       CAST(least(COUNT(DISTINCT canonical_url), $quota) AS BIGINT)
         AS n_quota_kept
FROM pnorm GROUP BY host"""
  }

  /** Mirror of [[graft.operators.UrlCanonical.urlCanonical]]
    * (q243). */
  def urlCanonical: String =
    s"""$urlCtes
SELECT doc_id, url, canonical_url, host FROM norm"""

  /** Mirror of [[graft.operators.Robots.robotsGate]] (q249): the
    * REP longest-prefix rule over the SHARED RuleTuples (rendered as
    * a VALUES list so the rule set cannot drift), Allow winning
    * length ties, default allow. */
  def robotsGate: String = {
    val values = graft.operators.Robots.RuleTuples
      .map { case (h, a, p) => s"('$h', $a, '$p')" }
      .mkString(",\n    ")
    s"""$urlCtes, pages AS (
  SELECT doc_id, host,
         regexp_extract(canonical_url,
           '^[a-z]+://[^/?]+([^?]*)', 1) AS path
  FROM norm
), rules(host, is_allow, prefix) AS (
  VALUES
    $values
), m AS (
  SELECT p.doc_id, r.is_allow, r.prefix,
         row_number() OVER (PARTITION BY p.doc_id
           ORDER BY length(r.prefix) DESC, r.is_allow DESC,
                    r.prefix DESC) AS rn
  FROM pages p
  JOIN rules r ON r.host = p.host AND starts_with(p.path, r.prefix)
)
SELECT p.doc_id, p.host, p.path,
       COALESCE(m.prefix, '') AS rule,
       COALESCE(m.is_allow = 1, TRUE) AS allowed
FROM pages p
LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.doc_id = p.doc_id"""
  }

  /** Mirror of [[graft.operators.UrlCanonical.hostQuota]] (q244):
    * the q34 quota logic keyed on the canonical host. */
  def hostQuota: String = {
    import graft.operators.Sampling.mixedSql
    import graft.operators.UrlCanonical.HostQuota
    s"""$urlCtes, h AS (
  SELECT doc_id, host, ${mixedSql("doc_id")} % 1048576 AS h FROM norm
), r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY host ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rn
  FROM h
)
SELECT doc_id, host, h, rn FROM r WHERE rn <= $HostQuota"""
  }

  /** SQL string literal with single-quote escaping (for regex
    * patterns / entity replacements embedded in the HTML mirrors). */
  private def sqlLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** Shared wrap+extract CTEs of q239/q240 — the byte-for-byte
    * mirror of [[graft.operators.HtmlExtract]]: the fixture skeleton
    * is built from the SAME F0..F7 string constants, and the
    * extraction chain applies the SAME pattern literals in the same
    * order (RE2 and Java regex agree on every construct used:
    * inline (?s), non-greedy .*?, explicit char classes — the
    * operator scaladoc states the intersection discipline).
    * Newlines are produced as chr(10) (DuckDB quoted strings do not
    * interpret escapes); patterns carry backslash-n, which BOTH
    * regex engines read as the newline escape. Yields CTE `x` =
    * (doc_id, text). */
  /** The q239 fixture-wrap expression over a CTE exposing
    * (doc_id, w, n, n1) — shared by the HTML and WARC mirrors. */
  private def htmlWrapSql: String = {
    import graft.operators.HtmlExtract._
    s"""${sqlLit(F0)} || CAST(doc_id AS VARCHAR) ||
      ${sqlLit(F1)} || CAST(doc_id AS VARCHAR) ||
      ${sqlLit(F2)} || CAST(doc_id % 7 AS VARCHAR) ||
      ${sqlLit(F3)} ||
      COALESCE(array_to_string(list_slice(w, 1, n1), ' '), '') ||
      ${sqlLit(F4)} ||
      COALESCE(array_to_string(list_slice(w, n1 + 1, n), ' '), '') ||
      ${sqlLit(F5)} || CAST(doc_id % 3 AS VARCHAR) ||
      ${sqlLit(F6)} || CAST(doc_id % 5 AS VARCHAR) || ${sqlLit(F7)}"""
  }

  /** The q239 extraction chain applied to the given SQL expr —
    * shared by the HTML mirrors and q248's web funnel. */
  private def htmlChainSql(src: String): String = {
    import graft.operators.HtmlExtract._
    var e = src
    for (p <- Seq(ScriptPat, StylePat, CommentPat))
      e = s"regexp_replace($e, ${sqlLit(p)}, '', 'g')"
    e = s"regexp_replace($e, ${sqlLit(BlockPat)}, chr(10), 'g')"
    e = s"regexp_replace($e, ${sqlLit(InlinePat)}, '', 'g')"
    for ((k, v) <- Entities)
      e = s"replace($e, ${sqlLit(k)}, ${sqlLit(v)})"
    e = s"regexp_replace($e, ${sqlLit(SpaceRunPat)}, ' ', 'g')"
    e = s"regexp_replace($e, ${sqlLit(AroundNlPat)}, chr(10), 'g')"
    e = s"regexp_replace($e, ${sqlLit(NlRunPat)}, chr(10), 'g')"
    s"regexp_replace($e, ${sqlLit(TrimPat)}, '', 'g')"
  }

  private def htmlCtes: String =
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sized AS (
  SELECT doc_id, w, len(w) AS n, len(w) // 2 AS n1 FROM d
), wrapped AS (
  SELECT doc_id, $htmlWrapSql AS html FROM sized
), x AS (
  SELECT doc_id, ${htmlChainSql("html")} AS text FROM wrapped
)"""

  /** Mirror of [[graft.operators.Sitemap.sitemapIndexResolved]]
    * (q300): both levels recomputed from the fixture arithmetic —
    * (doc × child j × entry i) cross join, k = doc + 3j + i. */
  def sitemapIndexResolved: String =
    """WITH j AS (SELECT * FROM (VALUES (0), (1)) AS t(j)),
  i AS (SELECT * FROM (VALUES (0), (1)) AS t(i)),
  x AS (
  SELECT d.doc_id, j.j, i.i,
         d.doc_id + 3 * j.j + i.i AS k,
         d.doc_id + 7 * j.j AS kr,
         'https://www.site' || CAST(d.doc_id % 7 AS VARCHAR) ||
           '.example.com' AS h
  FROM documents d CROSS JOIN j CROSS JOIN i
)
SELECT doc_id, CAST(j AS BIGINT) AS sitemap_idx,
       h || '/sitemap-' || CAST(doc_id AS VARCHAR) || '-' ||
         CAST(j AS VARCHAR) || '.xml' AS sitemap_loc,
       '2024-04-' || lpad(CAST(kr % 28 + 1 AS VARCHAR), 2, '0')
         AS sitemap_lastmod,
       CAST(i AS BIGINT) AS entry_idx,
       h || '/Cat' || CAST(doc_id % 5 AS VARCHAR) || '/s' ||
         CAST(j AS VARCHAR) || '/p' || CAST(k % 11 AS VARCHAR)
         AS loc,
       '2024-05-' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0')
         AS lastmod,
       CASE WHEN k % 3 = 0 THEN 'daily'
            WHEN k % 3 = 1 THEN 'weekly' ELSE 'monthly' END
         AS changefreq,
       CAST('0.' || CAST(k % 10 AS VARCHAR) AS DOUBLE) AS priority
FROM x"""

  /** Mirror of [[graft.operators.Warc.warcGzipBodies]] (q298): the
    * engine gunzips real compressed bytes; what must come out is
    * the q239 wrap text, reconstructed here independently. */
  def warcGzipBodies: String =
    s"""$htmlCtes
SELECT doc_id, 'gzip' AS coding,
       CAST(length(html) AS BIGINT) AS n_payload_chars,
       md5(html) AS payload_md5, TRUE AS valid
FROM wrapped"""

  /** Mirror of [[graft.operators.Warc.warcDeflateBodies]] (q302) —
    * the q298 shape with the deflate coding label. */
  def warcDeflateBodies: String =
    s"""$htmlCtes
SELECT doc_id, 'deflate' AS coding,
       CAST(length(html) AS BIGINT) AS n_payload_chars,
       md5(html) AS payload_md5, TRUE AS valid
FROM wrapped"""

  /** Mirror of [[graft.operators.Warc.httpCodingStack]] (q316): the
    * coding label from the doc_id % 4 mix arithmetic; the decoded
    * payload must equal the q239 wrap text, reconstructed
    * independently — one digest gate across all four wire shapes
    * (incl. chunked WRAPPING gzip). */
  def httpCodingStack: String =
    s"""$htmlCtes
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'identity' WHEN 1 THEN 'gzip'
            WHEN 2 THEN 'chunked' ELSE 'chunked+gzip' END AS coding,
       CAST(length(html) AS BIGINT) AS n_payload_chars,
       md5(html) AS payload_md5, TRUE AS valid
FROM wrapped"""

  /** Mirror of [[graft.operators.Warc.warcGzPaired]] (q317): one
    * row per response — request fields from the fixture arithmetic
    * (method GET, path /doc<id>, the crawl-sharded User-Agent),
    * `paired` literally TRUE (a broken Concurrent-To join flips
    * it), blob bookkeeping recomputed (1 warcinfo + 2 records per
    * capture in the blob), and the q247 parse fields from the
    * shared `parsed` mirror. */
  def warcGzPaired: String = {
    val per = graft.operators.Warc.GzRecordsPerBlob
    s"""$warcCtes, blobbed AS (
  SELECT doc_id, doc_id // $per AS blob_id,
         1 + 2 * COUNT(*) OVER (PARTITION BY doc_id // $per)
           AS n_records
  FROM documents
)
SELECT p.doc_id, b.blob_id, CAST(b.n_records AS BIGINT) AS n_records,
       TRUE AS paired, 'GET' AS req_method,
       '/doc' || CAST(p.doc_id AS VARCHAR) AS req_path,
       'graftbot/1.0 (+crawl' || CAST(p.doc_id % 3 AS VARCHAR) || ')'
         AS req_user_agent,
       p.status,
       CAST(length(p.payload) AS BIGINT) AS n_payload_chars,
       md5(p.payload) AS payload_md5, TRUE AS valid
FROM parsed p JOIN blobbed b ON b.doc_id = p.doc_id"""
  }

  /** Mirror of [[graft.operators.Warc.cdxRangeFetch]] (q301): the
    * q251 locator arithmetic joined back to the q247 parse — the
    * digest a byte-accurate range fetch must recover. */
  def cdxRangeFetch: String = {
    val per = graft.operators.Warc.CdxRecordsPerFile
    s"""$warcCtes, lens AS (
  SELECT doc_id, CAST(strlen(warc) AS BIGINT) AS record_len,
         'crawl-' || lpad(CAST(doc_id // $per AS VARCHAR), 5, '0')
           || '.warc' AS warc_file
  FROM wrec
), loc AS (
  SELECT doc_id, record_len, warc_file,
         COALESCE(SUM(record_len) OVER (PARTITION BY warc_file
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS "offset"
  FROM lens
)
SELECT p.doc_id, l.warc_file, CAST(l."offset" AS BIGINT) AS "offset",
       l.record_len, p.status, md5(p.payload) AS payload_md5,
       TRUE AS fetched_ok
FROM parsed p JOIN loc l ON l.doc_id = p.doc_id"""
  }

  /** Mirror of [[graft.operators.Warc.warcChunkedBodies]] (q299):
    * dechunked text plus the exact coded size — full chunks cost
    * hexlen(100)=2 + CRLF + 100 + CRLF = 106 octets, the remainder
    * chunk hexlen(rem) + 4 + rem, the 0-terminator 5. */
  def warcChunkedBodies: String = {
    val cs = graft.operators.Warc.ChunkSize
    s"""$htmlCtes, sz AS (
  SELECT doc_id, html, strlen(html) AS len FROM wrapped
)
SELECT doc_id, 'chunked' AS coding,
       CAST(len // $cs * 106 +
            CASE WHEN len % $cs > 0
                 THEN (CASE WHEN len % $cs < 16 THEN 1 ELSE 2 END)
                      + 4 + len % $cs
                 ELSE 0 END + 5 AS BIGINT) AS n_coded_octets,
       CAST(length(html) AS BIGINT) AS n_payload_chars,
       md5(html) AS payload_md5, TRUE AS valid
FROM sz"""
  }

  /** Shared CTEs of the q247/q248 WARC mirrors — fixture and parse
    * rules mirror [[graft.operators.Warc]] verbatim (CRLFs as E''
    * escape strings, same regex literals, same total-length
    * equation). Yields CTE `parsed` = (doc_id, target_uri,
    * warc_date, status, content_type, payload, valid). */
  private def warcCtes: String = {
    val crlf = "E'\\r\\n'"
    val sep = "E'\\r\\n\\r\\n'"
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sized AS (
  SELECT doc_id, w, len(w) AS n, len(w) // 2 AS n1 FROM d
), blocked AS (
  SELECT doc_id,
    CASE WHEN doc_id % 13 = 0 THEN
      'HTTP/1.1 404 Not Found' || $crlf ||
      'Content-Type: text/plain' || $sep ||
      'not found ' || CAST(doc_id AS VARCHAR)
    ELSE
      'HTTP/1.1 200 OK' || $crlf || 'Content-Type: text/html' ||
      $crlf || 'X-Served-By: w' || CAST(doc_id % 3 AS VARCHAR) ||
      $sep || $htmlWrapSql
    END AS block
  FROM sized
), wrec AS (
  SELECT doc_id,
    'WARC/1.0' || $crlf || 'WARC-Type: response' || $crlf ||
    'WARC-Target-URI: https://site' || CAST(doc_id % 7 AS VARCHAR) ||
    '.example.com/doc' || CAST(doc_id AS VARCHAR) || $crlf ||
    'WARC-Date: 2024-01-' ||
    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T' ||
    lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':00:00Z' ||
    $crlf || 'Content-Length: ' ||
    CAST(length(block) AS VARCHAR) || $sep || block || $sep AS warc
  FROM blocked
), hdr AS (
  SELECT doc_id, warc,
    substr(warc, 1, strpos(warc, $crlf) - 1) AS version,
    strpos(warc, $sep) AS h,
    TRY_CAST(regexp_extract(warc,
      '(?i)\\r\\nContent-Length: ([0-9]+)\\r\\n', 1) AS BIGINT)
      AS clen
  FROM wrec
), rec AS (
  SELECT doc_id,
    regexp_extract(warc,
      '(?i)\\r\\nWARC-Target-URI: ([^\\r]*)\\r\\n', 1) AS target_uri,
    regexp_extract(warc,
      '(?i)\\r\\nWARC-Date: ([^\\r]*)\\r\\n', 1) AS warc_date,
    substr(warc, h + 4, CAST(clen AS INT)) AS block,
    version = 'WARC/1.0' AND h > 0 AND clen IS NOT NULL
      AND length(warc) = h + 7 + clen
      AND substr(warc, length(warc) - 3, 4) = $sep AS valid
  FROM hdr
), parsed AS (
  SELECT doc_id, target_uri, warc_date,
    TRY_CAST(regexp_extract(block, '^HTTP/1\\.[01] ([0-9]{3}) ', 1)
      AS BIGINT) AS status,
    regexp_extract(block,
      '(?i)\\r\\nContent-Type: ([^\\r]*)\\r\\n', 1) AS content_type,
    CASE WHEN strpos(block, $sep) > 0
         THEN substr(block, strpos(block, $sep) + 4)
         ELSE '' END AS payload,
    valid
  FROM rec
)"""
  }

  /** Mirror of [[graft.operators.Warc.warcParsed]] (q247). */
  def warcParsed: String =
    s"""$warcCtes
SELECT doc_id, target_uri, warc_date, status, content_type,
       CAST(length(payload) AS BIGINT) AS n_payload_chars,
       md5(payload) AS payload_md5, valid
FROM parsed"""

  /** Mirror of [[graft.operators.Warc.warcGzParsed]] (q290): the
    * gzip member framing is TRANSPARENT to the parsed field values
    * (the engine side does the real gunzip + Content-Length hops;
    * what must come out is q247's parse of each member), so the
    * mirror is the q247 CTEs plus the blob bookkeeping arithmetic:
    * blob = doc_id // 3, rec_idx = position within the blob, and
    * every blob carries exactly one skipped warcinfo record. */
  def warcGzParsed: String = {
    val per = graft.operators.Warc.GzRecordsPerBlob
    s"""$warcCtes, blobs AS (
  SELECT doc_id // $per AS blob_id,
         CAST(COUNT(*) + 1 AS BIGINT) AS n_records
  FROM documents GROUP BY 1
)
SELECT p.doc_id, p.doc_id // $per AS blob_id,
       p.doc_id % $per + 1 AS rec_idx,
       b.n_records, CAST(1 AS BIGINT) AS n_skipped,
       p.target_uri, p.warc_date, p.status, p.content_type,
       CAST(length(p.payload) AS BIGINT) AS n_payload_chars,
       md5(p.payload) AS payload_md5, p.valid
FROM parsed p JOIN blobs b ON b.blob_id = p.doc_id // $per"""
  }

  /** Mirror of [[graft.operators.Warc.warcIntlParsed]] (q292): the
    * decoded text, octet counts and sniffed encoding recomputed
    * from the fixture arithmetic — DuckDB strlen counts UTF-8
    * octets (exactly variant 0's payload bytes), Latin-1 octets =
    * char count, UTF-16LE octets = 2 per BMP char + the 2-byte
    * BOM. */
  def warcIntl: String =
    """WITH v AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'utf-8'
              WHEN 1 THEN 'iso-8859-1' ELSE 'utf-16le' END AS enc
  FROM documents
), h AS (
  SELECT doc_id, enc,
         '<html><head><meta charset="' || enc ||
         '"></head><body>«café n° ' || CAST(doc_id AS VARCHAR) ||
         '»</body></html>' AS html
  FROM v
)
SELECT doc_id, enc AS encoding,
       CASE doc_id % 3
         WHEN 0 THEN CAST(strlen(html) AS BIGINT)
         WHEN 1 THEN CAST(length(html) AS BIGINT)
         ELSE CAST(2 + 2 * length(html) AS BIGINT)
       END AS n_payload_octets,
       CAST(length(html) AS BIGINT) AS n_payload_chars,
       doc_id % 3 <> 1 AS multibyte,
       md5(html) AS text_md5, TRUE AS valid
FROM h"""

  /** Mirror of [[graft.operators.Warc.webFunnel]] (q248): keep
    * valid 200 text/html captures, run the q239 extraction chain on
    * the payload, score with the q6 quality expression over the
    * flattened text. */
  def webFunnel: String = {
    val stops = sqlList(graft.operators.TextAnalysis.stopwords)
      .replace("(", "[").replace(")", "]")
    s"""$warcCtes, x AS (
  SELECT doc_id, ${htmlChainSql("payload")} AS text
  FROM parsed
  WHERE valid AND status = 200 AND content_type = 'text/html'
), f AS (
  SELECT doc_id, text,
    string_split(replace(text, chr(10), ' '), ' ') AS w2
  FROM x
)
SELECT doc_id,
       CASE WHEN text = '' THEN CAST(0 AS BIGINT)
            ELSE CAST(length(text) -
                      length(replace(text, chr(10), '')) + 1 AS BIGINT)
       END AS n_lines,
       CAST(length(text) AS BIGINT) AS n_chars,
       LEAST(len(w2) / 50.0, 1.0) *
         (CAST(len(list_distinct(w2)) AS DOUBLE) / len(w2)) *
         (1.0 - 0.5 * CAST(len(list_filter(w2,
            t -> list_contains($stops, t))) AS DOUBLE) / len(w2))
         AS quality_score
FROM f"""
  }

  /** Mirror of [[graft.operators.Warc.webHostReport]] (q250): the
    * q247 parse + q248 funnel rolled up per capture host; the mean
    * quality mirrors the micros quantizer exactly (exact integer
    * sum, one fixed-order division). */
  def webHostReport: String = {
    val stops = sqlList(graft.operators.TextAnalysis.stopwords)
      .replace("(", "[").replace(")", "]")
    s"""$warcCtes, x AS (
  SELECT doc_id, ${htmlChainSql("payload")} AS text
  FROM parsed
  WHERE valid AND status = 200 AND content_type = 'text/html'
), f AS (
  SELECT doc_id,
    CASE WHEN text = '' THEN CAST(0 AS BIGINT)
         ELSE CAST(length(text) -
                   length(replace(text, chr(10), '')) + 1 AS BIGINT)
    END AS n_lines,
    CAST(FLOOR(
      LEAST(len(w2) / 50.0, 1.0) *
        (CAST(len(list_distinct(w2)) AS DOUBLE) / len(w2)) *
        (1.0 - 0.5 * CAST(len(list_filter(w2,
           t -> list_contains($stops, t))) AS DOUBLE) / len(w2))
      * 1000000.0 + 0.5) AS BIGINT) AS qmicros
  FROM (SELECT doc_id, text,
          string_split(replace(text, chr(10), ' '), ' ') AS w2
        FROM x)
), cap AS (
  SELECT p.doc_id,
    regexp_extract(p.target_uri, '^https://([^/]+)/', 1) AS host,
    p.valid AND p.status = 200 AND p.content_type = 'text/html'
      AS ok,
    length(p.payload) AS plen, f.n_lines, f.qmicros
  FROM parsed p LEFT JOIN f ON f.doc_id = p.doc_id
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_captures,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(SUM(CASE WHEN ok THEN plen ELSE 0 END) AS BIGINT)
         AS sum_payload_chars,
       CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS n_lines_total,
       CASE WHEN SUM(CASE WHEN ok THEN 1 ELSE 0 END) > 0
            THEN CAST(SUM(COALESCE(qmicros, 0)) AS DOUBLE) /
                 1000000.0 / SUM(CASE WHEN ok THEN 1 ELSE 0 END)
            ELSE CAST(NULL AS DOUBLE) END AS mean_quality
FROM cap GROUP BY host"""
  }

  /** Mirror of [[graft.operators.Warc.cdxIndex]] (q251): the
    * capture index recomputed from the same WARC CTEs — SURT
    * urlkey, 14-digit timestamp, and file-local offsets as the
    * partitioned prefix sum of record lengths. */
  def cdxIndex: String = {
    val per = graft.operators.Warc.CdxRecordsPerFile
    s"""$warcCtes, lens AS (
  SELECT doc_id, CAST(strlen(warc) AS BIGINT) AS record_len,
         'crawl-' || lpad(CAST(doc_id // $per AS VARCHAR), 5, '0')
           || '.warc' AS warc_file
  FROM wrec
), loc AS (
  SELECT doc_id, record_len, warc_file,
         COALESCE(SUM(record_len) OVER (PARTITION BY warc_file
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS "offset"
  FROM lens
)
SELECT p.doc_id,
       array_to_string(list_reverse(string_split(
         regexp_extract(p.target_uri, '^https://([^/]+)/', 1), '.')),
         ',') || ')' ||
         regexp_extract(p.target_uri, '^https://[^/]+(/.*)$$', 1)
         AS urlkey,
       regexp_replace(p.warc_date, '[-T:Z]', '', 'g') AS ts14,
       p.target_uri AS original, p.content_type AS mime, p.status,
       md5(p.payload) AS digest, l.record_len, l.warc_file,
       CAST(l."offset" AS BIGINT) AS "offset"
FROM parsed p JOIN loc l ON l.doc_id = p.doc_id"""
  }

  /** Mirror of [[graft.operators.Warc.warcRevisits]] (q252): the
    * two-run recrawl with digest-addressed revisit records. */
  def warcRevisits: String = {
    val runs = graft.operators.Warc.RevisitRuns
    s"""WITH s AS (
  SELECT doc_id, r.run,
    CASE WHEN r.run > 0 AND doc_id % 3 = 0
         THEN text || ' updated v2' ELSE text END AS snap_text
  FROM documents,
       LATERAL (SELECT unnest(range(0, $runs)) AS run) r
), d AS (
  SELECT doc_id, run, md5(snap_text) AS digest,
         CAST(length(snap_text) AS BIGINT) AS len,
         first_value(md5(snap_text)) OVER (PARTITION BY doc_id
           ORDER BY run) AS first_digest
  FROM s
)
SELECT doc_id, CAST(run AS BIGINT) AS run,
       'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
         '.example.com/doc' || CAST(doc_id AS VARCHAR) AS target_uri,
       '2024-02-0' || CAST(run + 1 AS VARCHAR) || 'T00:00:00Z'
         AS capture_ts,
       digest,
       CASE WHEN run > 0 AND digest = first_digest THEN 'revisit'
            ELSE 'response' END AS record_type,
       CASE WHEN run > 0 AND digest = first_digest THEN len
            ELSE CAST(0 AS BIGINT) END AS saved_chars
FROM d"""
  }

  /** Shared CTEs of the q253/q254 sitemap mirrors — the fixture is
    * rebuilt from [[graft.operators.Sitemap]]'s shared constants and
    * arithmetic, then split and field-parsed with the SAME regex
    * literals. Yields CTE `ent` = (doc_id, entry_idx, loc, lastmod,
    * changefreq, priority). */
  private def sitemapCtes: String = {
    import graft.operators.Sitemap._
    s"""WITH e AS (
  SELECT doc_id, r.i,
    '<url><loc>https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
    '.example.com' ||
    CASE r.i WHEN 0 THEN '/Cat' || CAST(doc_id % 5 AS VARCHAR) ||
                        '/page' || CAST(doc_id % 11 AS VARCHAR)
             WHEN 1 THEN '/Cat' || CAST(doc_id % 5 AS VARCHAR)
             ELSE '/about' END ||
    '</loc><lastmod>2024-03-' ||
    lpad(CAST((doc_id + r.i) % 28 + 1 AS VARCHAR), 2, '0') ||
    '</lastmod><changefreq>' ||
    CASE (doc_id + r.i) % 3 WHEN 0 THEN 'daily'
                            WHEN 1 THEN 'weekly'
                            ELSE 'monthly' END ||
    '</changefreq><priority>0.' ||
    CAST((doc_id + r.i) % 10 AS VARCHAR) ||
    '</priority></url>' || chr(10) AS block
  FROM documents,
       LATERAL (SELECT unnest(range(0, $EntriesPerMap)) AS i) r
), x AS (
  SELECT doc_id, ${sqlLit(X0)} || string_agg(block, '' ORDER BY i) ||
         ${sqlLit(X1)} AS xml
  FROM e GROUP BY doc_id
), sp AS (
  SELECT doc_id,
         regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS blocks
  FROM x
), u AS (
  SELECT doc_id, r.i AS entry_idx, blocks[r.i + 1] AS block
  FROM sp, LATERAL (SELECT unnest(range(0, len(blocks))) AS i) r
), ent AS (
  SELECT doc_id, CAST(entry_idx AS BIGINT) AS entry_idx,
         regexp_extract(block, '<loc>(.*?)</loc>', 1) AS loc,
         regexp_extract(block, '<lastmod>(.*?)</lastmod>', 1)
           AS lastmod,
         regexp_extract(block, '<changefreq>(.*?)</changefreq>', 1)
           AS changefreq,
         CAST(regexp_extract(block, '<priority>(.*?)</priority>', 1)
           AS DOUBLE) AS priority
  FROM u
)"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.codeSwitchStats]]
    * (q318): every column re-derived from the fixture arithmetic —
    * profiles are pairwise token-disjoint, so paragraph j's guess
    * is provably its planted language index (doc_id + j (mod 4),
    * with j pinned to 0 for the monolingual doc_id ≡ 0 (mod 5)
    * docs); majority = count DESC then profile order ASC. */
  def codeSwitchStats: String = {
    val codes = TextAnalysis.langProfiles.map(_._1)
    val codeArr = codes.map(c => s"'$c'").mkString("[", ", ", "]")
    s"""WITH p AS (
  SELECT d.doc_id, r.j,
         CAST((d.doc_id + CASE WHEN d.doc_id % 5 = 0 THEN 0
                               ELSE r.j END) % 4 AS INTEGER) AS li
  FROM documents d,
       LATERAL (SELECT unnest(range(0, 4)) AS j) r
  WHERE r.j < d.doc_id % 3 + 2
), lc AS (
  SELECT doc_id, li, CAST(COUNT(*) AS BIGINT) AS c
  FROM p GROUP BY doc_id, li
), m AS (
  SELECT doc_id, li,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY c DESC, li ASC) AS rn
  FROM lc
)
SELECT l.doc_id,
       CAST(SUM(l.c) AS BIGINT) AS n_paras,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       MAX(CASE WHEN m.rn = 1
                THEN $codeArr[m.li + 1] END) AS majority_lang,
       COUNT(*) > 1 AS is_mixed
FROM lc l JOIN m ON m.doc_id = l.doc_id AND m.li = l.li
GROUP BY l.doc_id"""
  }

  /** Mirror of [[graft.operators.Sitemap.sitemapDiscovery]] (q319):
    * hosts from the distinct doc_id % 7 rollup, each host's
    * discovered sitemap URL from the q269 fixture's global Sitemap
    * line, entries re-derived with the q253 arithmetic keyed by the
    * HOST id. */
  def sitemapDiscovery: String = {
    import graft.operators.Sitemap._
    s"""WITH hosts AS (
  SELECT DISTINCT doc_id % 7 AS h FROM documents
), e AS (
  SELECT h,
         'www.site' || CAST(h AS VARCHAR) || '.example.com' AS host,
         'https://www.site' || CAST(h AS VARCHAR) ||
           '.example.com/sitemap.xml' AS sitemap_url,
         r.i,
         'https://www.site' || CAST(h % 7 AS VARCHAR) ||
         '.example.com' ||
         CASE r.i WHEN 0 THEN '/Cat' || CAST(h % 5 AS VARCHAR) ||
                             '/page' || CAST(h % 11 AS VARCHAR)
                  WHEN 1 THEN '/Cat' || CAST(h % 5 AS VARCHAR)
                  ELSE '/about' END AS loc,
         '2024-03-' || lpad(CAST((h + r.i) % 28 + 1 AS VARCHAR),
           2, '0') AS lastmod,
         CASE (h + r.i) % 3 WHEN 0 THEN 'daily'
                            WHEN 1 THEN 'weekly'
                            ELSE 'monthly' END AS changefreq,
         CAST('0.' || CAST((h + r.i) % 10 AS VARCHAR) AS DOUBLE)
           AS priority
  FROM hosts,
       LATERAL (SELECT unnest(range(0, $EntriesPerMap)) AS i) r
)
SELECT host, sitemap_url, CAST(i AS BIGINT) AS entry_idx,
       loc, lastmod, changefreq, priority
FROM e"""
  }

  /** Mirror of [[graft.operators.HtmlExtract.jsonLdExtract]]
    * (q320): the page reconstructed from the same arithmetic, the
    * ld+json blocks located by the same regex, and the JSON parsed
    * by DuckDB's OWN json machinery — two independent JSON parsers
    * (Jackson inside Spark's get_json_object, yyjson inside DuckDB)
    * must agree on every field, escaped quotes included. */
  def jsonLdExtract: String =
    s"""WITH h AS (
  SELECT doc_id,
    '<html><head><title>ld ' || CAST(doc_id AS VARCHAR) ||
    '</title><script type="application/ld+json">' ||
    '{"@context":"https://schema.org","@type":"' ||
    CASE doc_id % 3 WHEN 0 THEN 'Article' WHEN 1 THEN 'Product'
         ELSE 'NewsArticle' END ||
    '","name":"Item \\"deal\\" ' || CAST(doc_id AS VARCHAR) ||
    '","url":"https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
    '.example.com/doc' || CAST(doc_id AS VARCHAR) ||
    '","datePublished":"2024-06-' ||
    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
    '","aggregateRating":{"@type":"AggregateRating","ratingValue":' ||
    CAST(doc_id % 4 + 1 AS VARCHAR) || '.' ||
    CAST(doc_id % 10 AS VARCHAR) || ',"reviewCount":' ||
    CAST(doc_id % 50 + 1 AS VARCHAR) || '}}</script>' ||
    '<script type="application/ld+json">' ||
    '{"@context":"https://schema.org","@type":"BreadcrumbList",' ||
    '"numberOfItems":' || CAST(doc_id % 5 + 1 AS VARCHAR) ||
    '}</script>' ||
    '<script type="text/javascript">var x = ' ||
    '{"@type": "NotData"};</script>' ||
    '</head><body><p>body ' || CAST(doc_id AS VARCHAR) ||
    '</p></body></html>' AS html
  FROM documents
), b AS (
  SELECT doc_id,
    regexp_extract_all(html,
      '(?s)<script type="application/ld\\+json">(.*?)</script>', 1)
      AS blocks
  FROM h
), m AS (
  SELECT doc_id, blocks,
    list_filter(blocks, x -> json_extract_string(x, '$$."@type"') IN
      ('Article', 'Product', 'NewsArticle'))[1] AS main
  FROM b
)
SELECT doc_id, CAST(len(blocks) AS BIGINT) AS n_ld_blocks,
       json_extract_string(main, '$$."@type"') AS ld_type,
       json_extract_string(main, '$$.name') AS name,
       json_extract_string(main, '$$.url') AS url,
       json_extract_string(main, '$$.datePublished') AS date_published,
       CAST(json_extract(main, '$$.aggregateRating.ratingValue')
         AS DOUBLE) AS rating_value,
       CAST(json_extract(main, '$$.aggregateRating.reviewCount')
         AS BIGINT) AS review_count
FROM m"""

  /** Mirror of [[graft.operators.Sitemap.feedEntries]] (q321):
    * every field re-derived from the fixture arithmetic; the RSS
    * month-name normalization collapses back to the same ISO form
    * the Atom side carries (mm == the month index by
    * construction — the engine must PROVE it by mapping the name). */
  def feedEntries: String =
    """WITH e AS (
  SELECT doc_id, r.k, doc_id + r.k AS kk
  FROM documents,
       LATERAL (SELECT unnest(range(0, 3)) AS k) r
  WHERE r.k < doc_id % 3 + 1
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS format,
       CAST(k AS BIGINT) AS entry_idx,
       'Post ' || CAST(doc_id AS VARCHAR) || '-' ||
         CAST(k AS VARCHAR) AS title,
       'https://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
         '.example.com/p/' || CAST(doc_id AS VARCHAR) || '-' ||
         CAST(k AS VARCHAR) AS link,
       'urn:p:' || CAST(doc_id AS VARCHAR) || '-' ||
         CAST(k AS VARCHAR) AS guid,
       '2024-' || lpad(CAST(kk % 12 + 1 AS VARCHAR), 2, '0') ||
         '-' || lpad(CAST(kk % 28 + 1 AS VARCHAR), 2, '0') ||
         'T10:' || lpad(CAST(kk % 60 AS VARCHAR), 2, '0') ||
         ':00Z' AS published_iso
FROM e"""

  /** Mirror of [[graft.operators.Warc.httpCachePlan]] (q322): the
    * RFC 9111 arithmetic and plan CASE re-derived; the engine side
    * must read the same numbers out of real header fields. */
  def httpCachePlan: String =
    """SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'max-age'
            WHEN 1 THEN 'heuristic' ELSE 'none' END AS policy,
       CAST(CASE doc_id % 3
            WHEN 0 THEN (doc_id % 10 + 1) * 60
            WHEN 1 THEN (doc_id % 27 + 1) * 8640
            ELSE 0 END AS BIGINT) AS freshness_s,
       CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 7) * 90
            ELSE (doc_id % 5) * 3600 END AS BIGINT) AS age_s,
       CASE
         WHEN (CASE WHEN doc_id % 3 = 0 THEN (doc_id % 7) * 90
                    ELSE (doc_id % 5) * 3600 END) <
              (CASE doc_id % 3 WHEN 0 THEN (doc_id % 10 + 1) * 60
                    WHEN 1 THEN (doc_id % 27 + 1) * 8640
                    ELSE 0 END)
           THEN 'serve-cached'
         WHEN doc_id % 3 = 2 THEN 'revalidate'
         WHEN doc_id % 3 = 1 THEN 'revalidate'
         ELSE 'refetch' END AS plan,
       CASE
         WHEN (CASE WHEN doc_id % 3 = 0 THEN (doc_id % 7) * 90
                    ELSE (doc_id % 5) * 3600 END) <
              (CASE doc_id % 3 WHEN 0 THEN (doc_id % 10 + 1) * 60
                    WHEN 1 THEN (doc_id % 27 + 1) * 8640
                    ELSE 0 END) THEN ''
         WHEN doc_id % 3 = 2
           THEN 'If-None-Match: "v' || CAST(doc_id % 9 AS VARCHAR) || '"'
         WHEN doc_id % 3 = 1
           THEN 'If-Modified-Since: Mon, ' ||
                lpad(CAST(28 - (doc_id % 27 + 1) AS VARCHAR), 2, '0') ||
                ' Jun 2024 10:00:00 GMT'
         ELSE '' END AS conditional_header
FROM documents"""

  /** Mirror of [[graft.operators.HtmlExtract.headingOutline]]
    * (q323): the page reconstructed from the same arithmetic, the
    * SAME chunk regex, and the ancestor tracking mirrored with
    * DuckDB's last_value IGNORE NULLS window. */
  def headingOutline: String =
    """WITH h AS (
  SELECT doc_id,
    '<html><body><h1>Title ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
    '<h2>Sec 0 doc ' || CAST(doc_id AS VARCHAR) || '</h2><p>body ' ||
      CAST(doc_id AS VARCHAR) || ' s0' ||
      (CASE WHEN doc_id % 3 = 0 THEN ' extra words here'
            ELSE ' w' END) || '</p>' ||
    (CASE WHEN doc_id % 3 + 1 > 1 THEN
      '<h2>Sec 1 doc ' || CAST(doc_id AS VARCHAR) || '</h2><p>body ' ||
        CAST(doc_id AS VARCHAR) || ' s1' ||
        (CASE WHEN (doc_id + 1) % 3 = 0 THEN ' extra words here'
              ELSE ' w' END) || '</p>' ||
      '<h3>Sub 1 of doc ' || CAST(doc_id AS VARCHAR) ||
        '</h3><p>deep ' || CAST(doc_id AS VARCHAR) || '-1</p>'
     ELSE '' END) ||
    (CASE WHEN doc_id % 3 + 1 > 2 THEN
      '<h2>Sec 2 doc ' || CAST(doc_id AS VARCHAR) || '</h2><p>body ' ||
        CAST(doc_id AS VARCHAR) || ' s2' ||
        (CASE WHEN (doc_id + 2) % 3 = 0 THEN ' extra words here'
              ELSE ' w' END) || '</p>'
     ELSE '' END) ||
    '</body></html>' AS html
  FROM documents
), x AS (
  SELECT doc_id,
    regexp_extract_all(html,
      '<h([123])>.*?</h[123]>(?:<p>.*?</p>)?', 0) AS chunks
  FROM h
), c AS (
  SELECT doc_id, r.i AS sec_idx, chunks[r.i + 1] AS chunk
  FROM x, LATERAL (SELECT unnest(range(0, len(chunks))) AS i) r
), p AS (
  SELECT doc_id, sec_idx,
    CAST(regexp_extract(chunk, '^<h([123])>', 1) AS INTEGER)
      AS level,
    regexp_extract(chunk, '^<h[123]>(.*?)</h[123]>', 1) AS heading,
    regexp_extract(chunk, '<p>(.*?)</p>', 1) AS para
  FROM c
), q AS (
  SELECT *,
    last_value(CASE WHEN level = 1 THEN heading END IGNORE NULLS)
      OVER w AS h1,
    last_value(CASE WHEN level = 2 THEN heading END IGNORE NULLS)
      OVER w AS h2
  FROM p
  WINDOW w AS (PARTITION BY doc_id ORDER BY sec_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, CAST(sec_idx AS BIGINT) AS sec_idx,
       CAST(level AS BIGINT) AS level, heading,
       CASE level WHEN 1 THEN heading
            WHEN 2 THEN h1 || ' > ' || heading
            ELSE h1 || ' > ' || h2 || ' > ' || heading END AS path,
       CAST(CASE WHEN para = '' THEN 0
            ELSE len(string_split(para, ' ')) END AS BIGINT)
         AS n_words
FROM q"""

  /** Mirror of [[graft.operators.Warc.snapshotNovelty]] (q324):
    * counts re-derived from the fixture structure — run r carries
    * 3 + r paragraphs; novel = all 3 at run 0, the one addition per
    * later run, +1 at run 2 for the doc_id ≡ 0 (mod 4) rewrite
    * (hashes of distinct texts are distinct; the index prefixes
    * make base paragraphs distinct even on degenerate docs). */
  def snapshotNovelty: String =
    """WITH r AS (SELECT unnest(range(0, 4)) AS run)
SELECT d.doc_id, CAST(r.run AS BIGINT) AS run,
       CAST(3 + r.run AS BIGINT) AS n_paras,
       CAST(CASE WHEN r.run = 0 THEN 3
            WHEN r.run = 2 AND d.doc_id % 4 = 0 THEN 2
            ELSE 1 END AS BIGINT) AS n_novel,
       CAST(CASE WHEN r.run = 0 THEN 3
            WHEN r.run = 2 AND d.doc_id % 4 = 0 THEN 2
            ELSE 1 END AS DOUBLE) /
         CAST(3 + r.run AS DOUBLE) AS novelty
FROM documents d CROSS JOIN r"""

  /** Mirror of [[graft.operators.HtmlExtract.sectionChunks]]
    * (q325): the q323 mirror's content sections + the same
    * cumulative-bucketing window. */
  def sectionChunks: String = {
    val budget = graft.operators.HtmlExtract.SectionChunkBudget
    // reuse the q323 mirror as a subquery and bucket it
    s"""WITH outline AS (${headingOutline}),
sec AS (
  SELECT doc_id, sec_idx, path, n_words FROM outline WHERE n_words > 0
), run AS (
  SELECT doc_id, sec_idx, path, n_words,
    COALESCE(SUM(n_words) OVER (PARTITION BY doc_id ORDER BY sec_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS words_before
  FROM sec
)
SELECT doc_id, sec_idx, path, n_words,
       CAST(words_before // $budget AS BIGINT) AS chunk_id,
       n_words > $budget AS overflow
FROM run"""
  }

  /** Mirror of [[graft.operators.HtmlExtract.metaResolution]]
    * (q326): ladder CASE + titles re-derived from the fixture
    * arithmetic (the engine must REACH them through a JSON parse /
    * attribute regex / element regex). */
  def metaResolution: String =
    """SELECT doc_id,
       CASE WHEN doc_id % 4 IN (0, 3) THEN 'jsonld'
            WHEN doc_id % 4 = 1 THEN 'og' ELSE 'title' END AS source,
       CASE WHEN doc_id % 4 IN (0, 3)
              THEN 'LD title ' || CAST(doc_id AS VARCHAR)
            WHEN doc_id % 4 = 1
              THEN 'OG title ' || CAST(doc_id AS VARCHAR)
            ELSE 'Page ' || CAST(doc_id AS VARCHAR) END
         AS resolved_title,
       doc_id % 4 IN (0, 3) AS has_jsonld,
       doc_id % 4 IN (0, 1) AS has_og
FROM documents"""

  /** Mirror of [[graft.operators.Sitemap.sitemapEntries]] (q253). */
  def sitemapEntries: String =
    s"""$sitemapCtes
SELECT doc_id, entry_idx, loc, lastmod, changefreq, priority
FROM ent"""

  /** Mirror of [[graft.operators.Sitemap.crawlFrontier]] (q254):
    * robots gate (the q249 longest-prefix/Allow-wins rules), URL
    * collapse with best-hint semantics, per-host top-k politeness
    * schedule. */
  def crawlFrontier: String = {
    import graft.operators.Sitemap.{CrawlDelayMs, FrontierSlots}
    val values = graft.operators.Robots.RuleTuples
      .map { case (h, a, p) => s"('$h', $a, '$p')" }
      .mkString(",\n    ")
    s"""$sitemapCtes, g AS (
  SELECT doc_id, entry_idx, loc, lastmod, priority,
         regexp_extract(loc, '^https://([^/]+)/', 1) AS host,
         regexp_extract(loc, '^https://[^/]+(/.*)$$', 1) AS path
  FROM ent
), rules(host, is_allow, prefix) AS (
  VALUES
    $values
), m AS (
  SELECT g.doc_id, g.entry_idx, r.is_allow,
         row_number() OVER (PARTITION BY g.doc_id, g.entry_idx
           ORDER BY length(r.prefix) DESC, r.is_allow DESC,
                    r.prefix DESC) AS rn
  FROM g JOIN rules r
    ON r.host = g.host AND starts_with(g.path, r.prefix)
), allowed AS (
  SELECT g.* FROM g
  LEFT JOIN (SELECT doc_id, entry_idx, is_allow FROM m WHERE rn = 1) w
    ON w.doc_id = g.doc_id AND w.entry_idx = g.entry_idx
  WHERE COALESCE(w.is_allow = 1, TRUE)
), c AS (
  SELECT host, loc, path, MAX(priority) AS priority,
         MAX(lastmod) AS lastmod,
         CAST(COUNT(*) AS BIGINT) AS n_refs
  FROM allowed GROUP BY host, loc, path
), rk AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY host
    ORDER BY priority DESC, loc ASC) AS BIGINT) AS rank
  FROM c
)
SELECT host, rank - 1 AS slot, loc, path, priority, lastmod, n_refs,
       (rank - 1) * $CrawlDelayMs AS fetch_at_ms
FROM rk WHERE rank <= $FrontierSlots"""
  }

  /** HH:MM:SS.mmm formatter over a BIGINT-ms SQL expression —
    * the q255 fixture's timestamp writer, mirrored. */
  private def vttTsSql(ms: String): String =
    s"""lpad(CAST(($ms) // 3600000 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(($ms) % 3600000 // 60000 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(($ms) % 60000 // 1000 AS VARCHAR), 2, '0') || '.' ||
    lpad(CAST(($ms) % 1000 AS VARCHAR), 3, '0')"""

  /** One parsed timing-line field group re-weighted to ms — the
    * q255 parse arithmetic, mirrored. */
  private def vttParseSql(line: String, base: Int): String = {
    val pat = "'^([0-9]{2}):([0-9]{2}):([0-9]{2})\\.([0-9]{3}) --> " +
      "([0-9]{2}):([0-9]{2}):([0-9]{2})\\.([0-9]{3})$'"
    s"""CAST(regexp_extract($line, $pat, $base) AS BIGINT) * 3600000 +
    CAST(regexp_extract($line, $pat, ${base + 1}) AS BIGINT) * 60000 +
    CAST(regexp_extract($line, $pat, ${base + 2}) AS BIGINT) * 1000 +
    CAST(regexp_extract($line, $pat, ${base + 3}) AS BIGINT)"""
  }

  /** Shared CTEs of the q255/q256 WebVTT mirrors — fixture rebuilt
    * from [[graft.operators.Subtitles]]'s arithmetic, re-split and
    * re-parsed with the same regex. Yields CTE `cues` = (doc_id,
    * cue_idx, t_start_ms, t_end_ms, text). */
  private def vttCtes: String = {
    val nl = "chr(10)"
    s"""WITH c AS (
  SELECT doc_id, r.i,
         r.i * (1000 + (doc_id % 5) * 100) AS s,
         600 + ((doc_id + r.i) % 5) * 100 AS dur
  FROM documents,
       LATERAL (SELECT unnest(range(0, 2 + doc_id % 4)) AS i) r
), b AS (
  SELECT doc_id, i,
    CAST(i AS VARCHAR) || $nl ||
    ${vttTsSql("s")} || ' --> ' || ${vttTsSql("s + dur")} || $nl ||
    'cue ' || CAST(i AS VARCHAR) || ' line one' || $nl ||
    'doc ' || CAST(doc_id AS VARCHAR) || ' line two' AS block
  FROM c
), v AS (
  SELECT doc_id,
         'WEBVTT' || string_agg($nl || $nl || block, '' ORDER BY i)
           AS vtt
  FROM b GROUP BY doc_id
), sp AS (
  SELECT doc_id, string_split(vtt, $nl || $nl) AS blocks FROM v
), u AS (
  SELECT doc_id, r.i - 2 AS cue_idx,
         string_split(blocks[r.i], $nl) AS lines
  FROM sp, LATERAL (SELECT unnest(range(2, len(blocks) + 1)) AS i) r
), cues AS (
  SELECT doc_id, CAST(cue_idx AS BIGINT) AS cue_idx,
         ${vttParseSql("lines[2]", 1)} AS t_start_ms,
         ${vttParseSql("lines[2]", 5)} AS t_end_ms,
         array_to_string(list_slice(lines, 3, len(lines)), ' ')
           AS text
  FROM u
)"""
  }

  /** Mirror of [[graft.operators.Subtitles.vttCues]] (q255). */
  def vttCues: String =
    s"""$vttCtes
SELECT doc_id, cue_idx, t_start_ms, t_end_ms, text FROM cues"""

  /** Mirror of [[graft.operators.Subtitles.frameCueAlign]] (q256):
    * the frame clock LEFT-joined to the parsed cues on
    * containment. */
  def frameCueAlign: String = {
    val step = graft.operators.Subtitles.FrameStepMs
    s"""$vttCtes, fr AS (
  SELECT doc_id, CAST(r.f AS BIGINT) AS frame_idx,
         r.f * $step AS frame_ms
  FROM documents,
       LATERAL (SELECT unnest(range(0, 2 + doc_id % 5)) AS f) r
)
SELECT fr.doc_id, fr.frame_idx, fr.frame_ms, q.cue_idx,
       q.text AS caption, q.cue_idx IS NOT NULL AS aligned
FROM fr LEFT JOIN cues q
  ON q.doc_id = fr.doc_id AND fr.frame_ms >= q.t_start_ms
     AND fr.frame_ms < q.t_end_ms"""
  }

  /** Shared CTEs of the q264/q265 link mirrors — the fixture
    * rebuilt from [[graft.operators.WebGraph]]'s arithmetic, parsed
    * with the same regex, resolved with the same rule. Yields CTE
    * `res` = (doc_id, page_host, link_idx, href, anchor, url). */
  private def linkCtes: String = {
    val pat = """<a href="([^"]*)">(.*?)</a>"""
    s"""WITH d AS (
  SELECT doc_id,
    'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
      AS page_host,
    '<html><body><p>intro ' || CAST(doc_id AS VARCHAR) || '</p> ' ||
    '<a href="https://www.site' || CAST((doc_id + 2) % 7 AS VARCHAR)
      || '.example.com/Cat' || CAST((doc_id + 1) % 5 AS VARCHAR) ||
      '">read site ' || CAST((doc_id + 2) % 7 AS VARCHAR) ||
      ' category ' || CAST((doc_id + 1) % 5 AS VARCHAR) || '</a> ' ||
    '<a href="/Cat' || CAST(doc_id % 5 AS VARCHAR) || '/page' ||
      CAST((doc_id + 7) % 11 AS VARCHAR) || '">more page ' ||
      CAST((doc_id + 7) % 11 AS VARCHAR) || '</a> ' ||
    '<a href="https://www.site' || CAST((doc_id + 4) % 7 AS VARCHAR)
      || '.example.com/about">about site ' ||
      CAST((doc_id + 4) % 7 AS VARCHAR) || '</a></body></html>'
      AS html
  FROM documents
), x AS (
  SELECT doc_id, page_host,
    regexp_extract_all(html, '$pat', 1) AS hrefs,
    regexp_extract_all(html, '$pat', 2) AS anchors
  FROM d
), u AS (
  SELECT doc_id, page_host, r.i AS link_idx, hrefs[r.i + 1] AS href,
         anchors[r.i + 1] AS anchor
  FROM x, LATERAL (SELECT unnest(range(0, len(hrefs))) AS i) r
), res AS (
  SELECT doc_id, page_host, link_idx, href, anchor,
    CASE WHEN starts_with(href, 'https://') THEN href
         ELSE 'https://' || page_host || href END AS url
  FROM u
)"""
  }

  /** Mirror of [[graft.operators.WebGraph.linkExtract]] (q264). */
  def linkExtract: String =
    s"""$linkCtes
SELECT doc_id, CAST(link_idx AS BIGINT) AS link_idx, page_host,
       href, anchor, url,
       regexp_extract(url, '^https://([^/]+)/', 1) AS target_host,
       regexp_extract(url, '^https://([^/]+)/', 1) <> page_host
         AS is_external
FROM res"""

  /** Mirror of [[graft.operators.WebGraph.anchorIndex]] (q265). */
  def anchorIndex: String = {
    val k = graft.operators.WebGraph.AnchorTopK
    s"""$linkCtes, t AS (
  SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS target_host,
         unnest(string_split(anchor, ' ')) AS term
  FROM res
), tc AS (
  SELECT target_host, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t WHERE length(term) > 0 GROUP BY target_host, term
), rk AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY target_host
    ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank
  FROM tc
)
SELECT target_host, term, cnt, rank FROM rk WHERE rank <= $k"""
  }

  /** Mirror of [[graft.operators.UrlCanonical.registrableDomain]]
    * (q273): same host fixture, same suffix list, same longest-
    * match rule (label count, then length), same +1-label
    * registrable rule. */
  def registrableDomain: String = {
    import graft.operators.UrlCanonical.{PslHosts, PslSuffixes}
    val hostCase = PslHosts.zipWithIndex
      .map { case (h, i) => s"WHEN $i THEN '$h'" }
      .mkString("CASE doc_id % 8 ", " ", " END")
    val values = PslSuffixes.map(s => s"('$s')").mkString(", ")
    s"""WITH d AS (
  SELECT doc_id, $hostCase AS host FROM documents
), c AS (
  SELECT doc_id, host, s.sfx,
         len(string_split(s.sfx, '.')) AS nl,
         length(s.sfx) AS l
  FROM d, (VALUES $values) s(sfx)
  WHERE host = s.sfx OR ends_with(host, '.' || s.sfx)
), w AS (
  SELECT doc_id, host, sfx, nl,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY nl DESC, l DESC, sfx DESC) AS rn
  FROM c
)
SELECT doc_id, host, sfx AS public_suffix,
       CASE WHEN host = sfx THEN NULL
            ELSE array_to_string(list_slice(string_split(host, '.'),
              len(string_split(host, '.')) - nl,
              len(string_split(host, '.'))), '.') END
         AS registrable_domain
FROM w WHERE rn = 1"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.corpusDatasheet]]
    * (q275): same kernels, exact sums, the q169 ordered HHI fold,
    * modal language by (count desc, lang asc). */
  def corpusDatasheet: String = {
    val stops = sqlList(TextAnalysis.stopwords)
      .replace("(", "[").replace(")", "]")
    s"""WITH d AS (
  SELECT doc_id, text, source, string_split(text, ' ') AS w
  FROM documents
), scored AS (
  SELECT doc_id, text, source, w,
    $langScoreColsSql
  FROM d
), base AS (
  SELECT source, $langGuessSql AS lang, md5(text) AS digest,
         CAST(len(w) AS BIGINT) AS ws,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(FLOOR(
           LEAST(len(w) / 50.0, 1.0) *
             (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) *
             (1.0 - 0.5 * CAST(len(list_filter(w,
                t -> list_contains($stops, t))) AS DOUBLE) / len(w))
           * 1000000.0 + 0.5) AS BIGINT) AS qmicros
  FROM scored
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(ws) AS BIGINT) AS n_words,
         CAST(SUM(chars) AS BIGINT) AS n_chars,
         CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_texts,
         CAST(SUM(qmicros) AS BIGINT) AS qsum
  FROM base
), lc AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY lang
), ln AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_langs FROM lc
), lm AS (
  SELECT lang AS modal_lang, c AS modal_c
  FROM lc ORDER BY c DESC, lang ASC LIMIT 1
), sc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY source
), sa AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list((CAST(c AS DOUBLE) / t.n_docs) *
                (CAST(c AS DOUBLE) / t.n_docs) ORDER BY source)),
           (a, b) -> a + b) AS source_hhi
  FROM sc CROSS JOIN tot t GROUP BY t.n_docs
)
SELECT t.n_docs, t.n_words, t.n_chars, t.n_unique_texts,
       1.0 - CAST(t.n_unique_texts AS DOUBLE) /
             CAST(t.n_docs AS DOUBLE) AS exact_dup_rate,
       CAST(t.qsum AS DOUBLE) / 1000000.0 /
         CAST(t.n_docs AS DOUBLE) AS mean_quality,
       ln.n_langs, lm.modal_lang,
       CAST(lm.modal_c AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
         AS modal_lang_share,
       sa.n_sources, sa.source_hhi
FROM tot t, ln, lm, sa"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.sentenceSegments]]
    * (q274): same index-arithmetic fixture, same replace-then-split
    * rule (backreference spelled per-dialect: \\1 here, $$1 in the
    * engine — the stated intersection workaround for the missing
    * common lookbehind). */
  def sentenceSegments: String =
    """WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), p AS (
  SELECT doc_id, array_to_string(list_transform(range(1, len(w) + 1),
    i -> w[i] ||
      CASE WHEN ((i - 1) % 28 + 1) IN (4, 11, 14, 23, 28)
                OR i = len(w)
        THEN ['.', '!', '?'][CAST(((i - 1) // 28) * 5 +
          CASE WHEN (i - 1) % 28 + 1 <= 4 THEN 0
               WHEN (i - 1) % 28 + 1 <= 11 THEN 1
               WHEN (i - 1) % 28 + 1 <= 14 THEN 2
               WHEN (i - 1) % 28 + 1 <= 23 THEN 3
               ELSE 4 END AS INT) % 3 + 1]
        ELSE '' END), ' ') AS punct
  FROM d
), sp AS (
  SELECT doc_id, string_split(
    regexp_replace(punct, '([.!?]) ', '\1' || chr(10), 'g'),
    chr(10)) AS s
  FROM p
), u AS (
  SELECT doc_id, q.i - 1 AS sent_idx, s[q.i] AS sentence
  FROM sp, LATERAL (SELECT unnest(range(1, len(s) + 1)) AS i) q
)
SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence,
       CAST(len(string_split(sentence, ' ')) AS BIGINT) AS n_words,
       substr(sentence, CAST(length(sentence) AS INT), 1)
         AS terminator
FROM u WHERE length(sentence) > 0"""

  /** Mirror of
    * [[graft.operators.UrlCanonical.crawlBudgetAllocation]] (q283):
    * same √pages weights, ordered-fold total, largest-remainder
    * ranks by (frac desc, domain asc). */
  def crawlBudgetAllocation: String = {
    val b = graft.operators.UrlCanonical.CrawlBudget
    s"""WITH dom AS (
  SELECT registrable_domain AS domain,
         CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM ($registrableDomain)
  WHERE registrable_domain IS NOT NULL
  GROUP BY registrable_domain
), w AS (
  SELECT domain, n_pages,
         sqrt(CAST(n_pages AS DOUBLE)) AS weight
  FROM dom
), t AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(weight ORDER BY domain)), (a, b) -> a + b)
           AS w_total
  FROM w
), a AS (
  SELECT w.domain, w.n_pages, w.weight,
         w.weight / t.w_total AS share,
         w.weight / t.w_total * $b.0 AS ideal
  FROM w, t
), bs AS (
  SELECT *, CAST(FLOOR(ideal) AS BIGINT) AS base,
         ideal - FLOOR(ideal) AS frac
  FROM a
), r AS (
  SELECT $b - CAST(SUM(base) AS BIGINT) AS rem FROM bs
), rk AS (
  SELECT *, CAST(row_number() OVER (ORDER BY frac DESC, domain ASC)
    AS BIGINT) AS rnk
  FROM bs
)
SELECT rk.domain, rk.n_pages, rk.weight, rk.share, rk.base,
       CAST(CASE WHEN rk.rnk <= r.rem THEN 1 ELSE 0 END AS BIGINT)
         AS extra,
       rk.base + CASE WHEN rk.rnk <= r.rem THEN 1 ELSE 0 END
         AS budget_slots
FROM rk, r"""
  }

  /** Mirror of [[graft.operators.TextAnalysis.phraseSearch]]
    * (q268): same bigram stream, same (count desc, phrase asc)
    * top-k, same posting rollup. */
  def phraseSearch: String = {
    val k = TextAnalysis.PhraseTopK
    s"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), bg AS (
  SELECT doc_id, w[r.i] || ' ' || w[r.i + 1] AS phrase
  FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
), cnt AS (
  SELECT phrase, COUNT(*) AS c FROM bg GROUP BY phrase
), top AS (
  SELECT phrase FROM cnt ORDER BY c DESC, phrase ASC LIMIT $k
)
SELECT b.doc_id, b.phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM bg b JOIN top USING (phrase)
GROUP BY b.doc_id, b.phrase"""
  }

  /** Mirror of [[graft.operators.Robots.robotsParse]] (q269): the
    * fixture text rebuilt per host, re-split, group-attributed with
    * the same last-User-agent rule, same directive filter. */
  def robotsParse: String = {
    val pat = """^([A-Za-z-]+):\s*(.*)$"""
    s"""WITH hs AS (
  SELECT DISTINCT doc_id % 7 AS h FROM documents
), r AS (
  SELECT h, 'www.site' || CAST(h AS VARCHAR) || '.example.com'
    AS host
  FROM hs
), t AS (
  SELECT host,
    '# robots for ' || host || chr(10) ||
    'User-agent: *' || chr(10) ||
    'Disallow: /Cat' || CAST(h AS VARCHAR) || chr(10) ||
    'Allow: /Cat' || CAST(h AS VARCHAR) || '/page' ||
      CAST(h AS VARCHAR) || chr(10) ||
    'Crawl-delay: ' || CAST(h % 5 + 1 AS VARCHAR) || chr(10) ||
    'Disallow: /private' || chr(10) ||
    'Sitemap: https://' || host || '/sitemap.xml' || chr(10) ||
    chr(10) ||
    'User-agent: badbot' || chr(10) ||
    'Disallow: /' AS txt
  FROM r
), lx AS (
  SELECT host, string_split(txt, chr(10)) AS l FROM t
), e AS (
  SELECT host, l, CAST(q.i - 1 AS BIGINT) AS line_no,
         l[q.i] AS line,
         list_max(list_filter(range(1, q.i + 1),
           j -> starts_with(lower(l[j]), 'user-agent:'))) AS ua_i
  FROM lx, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) q
), g AS (
  SELECT host, line_no, line,
    CASE WHEN ua_i IS NOT NULL
         THEN trim(regexp_extract(l[CAST(ua_i AS INT)], '$pat', 2))
         ELSE '' END AS group_agent,
    lower(regexp_extract(line, '$pat', 1)) AS name,
    trim(regexp_extract(line, '$pat', 2)) AS value
  FROM e
)
SELECT host,
       CASE WHEN name = 'sitemap' THEN '' ELSE group_agent END
         AS agent,
       name AS directive, value, line_no
FROM g
WHERE name IN ('disallow', 'allow', 'crawl-delay', 'sitemap')"""
  }

  /** Mirror of [[graft.operators.Sitemap.crawlFrontierDelayed]]
    * (q270): the q254 schedule re-timed by the per-host
    * crawl-delay (arithmetic recompute — the engine must PARSE the
    * directive to match it). */
  def crawlFrontierDelayed: String = {
    import graft.operators.Sitemap.FrontierSlots
    val values = graft.operators.Robots.RuleTuples
      .map { case (h, a, p) => s"('$h', $a, '$p')" }
      .mkString(",\n    ")
    s"""$sitemapCtes, g AS (
  SELECT doc_id, entry_idx, loc, lastmod, priority,
         regexp_extract(loc, '^https://([^/]+)/', 1) AS host,
         regexp_extract(loc, '^https://[^/]+(/.*)$$', 1) AS path
  FROM ent
), rules(host, is_allow, prefix) AS (
  VALUES
    $values
), m AS (
  SELECT g.doc_id, g.entry_idx, r.is_allow,
         row_number() OVER (PARTITION BY g.doc_id, g.entry_idx
           ORDER BY length(r.prefix) DESC, r.is_allow DESC,
                    r.prefix DESC) AS rn
  FROM g JOIN rules r
    ON r.host = g.host AND starts_with(g.path, r.prefix)
), allowed AS (
  SELECT g.* FROM g
  LEFT JOIN (SELECT doc_id, entry_idx, is_allow FROM m WHERE rn = 1) w
    ON w.doc_id = g.doc_id AND w.entry_idx = g.entry_idx
  WHERE COALESCE(w.is_allow = 1, TRUE)
), c AS (
  SELECT host, loc, path, MAX(priority) AS priority,
         MAX(lastmod) AS lastmod,
         CAST(COUNT(*) AS BIGINT) AS n_refs
  FROM allowed GROUP BY host, loc, path
), rk AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY host
    ORDER BY priority DESC, loc ASC) AS BIGINT) AS rank
  FROM c
), dl AS (
  SELECT 'www.site' || CAST(h AS VARCHAR) || '.example.com' AS host,
         CAST(h % 5 + 1 AS BIGINT) AS delay_s
  FROM (SELECT DISTINCT doc_id % 7 AS h FROM documents)
)
SELECT rk.host, rank - 1 AS slot, loc, path, priority, lastmod,
       n_refs, COALESCE(dl.delay_s, 1) AS delay_s,
       (rank - 1) * COALESCE(dl.delay_s, 1) * 1000 AS fetch_at_ms
FROM rk LEFT JOIN dl ON dl.host = rk.host
WHERE rank <= $FrontierSlots"""
  }

  /** Mirror of [[graft.operators.Charset.charsetStats]] (q267):
    * the expected sniff verdicts and the md5 of the decoded text
    * recomputed from the fixture arithmetic — the engine side must
    * round-trip real BOM'd bytes to match. */
  def charsetStats: String =
    """WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 4 = 3
         THEN '<html><head><meta charset="iso-8859-1"></head>' ||
              '<body>charset doc ' || CAST(doc_id AS VARCHAR) ||
              '</body></html>'
         ELSE 'charset doc ' || CAST(doc_id AS VARCHAR) END AS txt
  FROM documents
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
            WHEN 2 THEN 'utf-16be' ELSE 'iso-8859-1' END AS encoding,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 3 THEN 0 ELSE 2 END
         AS BIGINT) AS bom_bytes,
       CASE WHEN doc_id % 4 = 3 THEN 'iso-8859-1' ELSE '' END
         AS declared,
       CAST(length(txt) AS BIGINT) AS n_chars,
       md5(txt) AS digest
FROM t"""

  /** Mirror of [[graft.operators.WebGraph.hostGraph]] (q266). */
  def hostGraph: String =
    s"""$linkCtes, e AS (
  SELECT page_host AS src_host,
         regexp_extract(url, '^https://([^/]+)/', 1) AS target_host,
         CAST(COUNT(*) AS BIGINT) AS n_links,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM res GROUP BY src_host, target_host
), t AS (
  SELECT src_host, CAST(SUM(n_links) AS BIGINT) AS out_total
  FROM e GROUP BY src_host
)
SELECT e.src_host, e.target_host, e.n_links, e.n_docs,
       CAST(e.n_links AS DOUBLE) / CAST(t.out_total AS DOUBLE)
         AS out_share
FROM e JOIN t USING (src_host)"""

  /** Mirror of [[graft.operators.Warc.recrawlSchedule]] (q276):
    * same accumulated-edit snapshots, digest lag-compare, rate and
    * interval arithmetic. */
  def recrawlSchedule: String = {
    val runs = graft.operators.Warc.RecrawlRuns
    s"""WITH s AS (
  SELECT doc_id, r.run,
    text || COALESCE(array_to_string(list_transform(
      list_filter(range(1, r.run + 1),
        k -> (doc_id * 7 + k * 3) % 5 < 2),
      k -> ' edit ' || CAST(k AS VARCHAR)), ''), '') AS snap_text
  FROM documents,
       LATERAL (SELECT unnest(range(0, $runs)) AS run) r
), dg AS (
  SELECT doc_id, run, md5(snap_text) AS digest,
         lag(md5(snap_text), 1) OVER (PARTITION BY doc_id
           ORDER BY run) AS prev_digest
  FROM s
), ch AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_captures,
         CAST(SUM(CASE WHEN run > 0 AND digest <> prev_digest
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
  FROM dg GROUP BY doc_id
)
SELECT doc_id,
       'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
         '.example.com/doc' || CAST(doc_id AS VARCHAR)
         AS target_uri,
       n_captures, n_changes,
       CAST(n_changes AS DOUBLE) / ${runs - 1}.0 AS change_rate,
       CAST(FLOOR(24.0 / (2.0 *
         (CAST(n_changes AS DOUBLE) / ${runs - 1}.0) + 0.5))
         AS BIGINT) AS next_interval_h
FROM ch"""
  }

  /** Mirror of [[graft.operators.Warc.waybackLookup]] (q278): same
    * capture clock, same (dt, run) closest pick. */
  def waybackLookup: String = {
    val runs = graft.operators.Warc.RevisitRuns
    s"""WITH caps AS (
  SELECT doc_id, r.run,
    CASE WHEN r.run > 0 AND doc_id % 3 = 0
         THEN text || ' updated v2' ELSE text END AS snap_text
  FROM documents,
       LATERAL (SELECT unnest(range(0, $runs)) AS run) r
), c2 AS (
  SELECT doc_id, CAST(run AS BIGINT) AS run,
         CAST(run * 86400 AS BIGINT) AS cap_ts,
         md5(snap_text) AS digest
  FROM caps
), q AS (
  SELECT doc_id, CAST((doc_id % 3) * 43200 AS BIGINT) AS q_ts
  FROM documents
), j AS (
  SELECT q.doc_id, q.q_ts, c.run, c.cap_ts, c.digest,
         CAST(abs(c.cap_ts - q.q_ts) AS BIGINT) AS dt_s,
         row_number() OVER (PARTITION BY q.doc_id
           ORDER BY abs(c.cap_ts - q.q_ts), c.run) AS rn
  FROM q JOIN c2 c USING (doc_id)
)
SELECT doc_id,
       'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
         '.example.com/doc' || CAST(doc_id AS VARCHAR)
         AS target_uri,
       q_ts, run AS best_run, cap_ts AS best_ts, dt_s, digest
FROM j WHERE rn = 1"""
  }

  /** Mirror of [[graft.operators.Redirects.resolveRedirects]]
    * (q279): same redirect table, [[graft.operators.Redirects.MaxHops]]
    * unrolled left-join steps, same terminal verdict. */
  def resolveRedirects: String = {
    def u(e: String) =
      s"'https://www.site' || CAST(($e) % 7 AS VARCHAR) || " +
        s"'.example.com/r/' || CAST($e AS VARCHAR)"
    val steps = (1 to graft.operators.Redirects.MaxHops).map { i =>
      s"""s$i AS (
  SELECT p.doc_id, p.src_url, COALESCE(r.target, p.cur) AS cur,
         p.hops + CASE WHEN r.target IS NULL THEN 0 ELSE 1 END
           AS hops
  FROM s${i - 1} p LEFT JOIN r ON r.url = p.cur
)"""
    }.mkString(", ")
    val last = s"s${graft.operators.Redirects.MaxHops}"
    s"""WITH r AS (
  SELECT * FROM (
    SELECT ${u("doc_id")} AS url,
      CASE WHEN doc_id % 100 = 98 THEN ${u("doc_id + 1")}
           WHEN doc_id % 100 = 99 THEN ${u("doc_id - 1")}
           WHEN doc_id % 4 <> 0 THEN ${u("doc_id - 1")}
           ELSE NULL END AS target
    FROM documents
  ) WHERE target IS NOT NULL
), s0 AS (
  SELECT doc_id, ${u("doc_id")} AS src_url, ${u("doc_id")} AS cur,
         CAST(0 AS BIGINT) AS hops
  FROM documents
), $steps
SELECT f.doc_id, f.src_url, f.cur AS final_url,
       CAST(f.hops AS BIGINT) AS hops,
       r2.url IS NULL AS terminal
FROM $last f LEFT JOIN r r2 ON r2.url = f.cur"""
  }

  /** Mirror of [[graft.operators.HtmlExtract.htmlExtracted]]
    * (q239). */
  def htmlExtract: String =
    s"""$htmlCtes
SELECT doc_id, text,
       CASE WHEN text = '' THEN CAST(0 AS BIGINT)
            ELSE CAST(length(text) -
                      length(replace(text, chr(10), '')) + 1 AS BIGINT)
       END AS n_lines,
       CAST(length(text) AS BIGINT) AS n_chars
FROM x"""

  /** Mirror of [[graft.operators.HtmlExtract.htmlFunnel]] (q240):
    * extract → flatten line breaks → the UNCHANGED q200 boilerplate
    * chain → the q6 quality-score expression over the cleaned
    * text. */
  def htmlFunnel: String = {
    import graft.operators.Dedup.{BoilerplateDfCap, ParaWords => P}
    val stops = sqlList(graft.operators.TextAnalysis.stopwords)
      .replace("(", "[").replace(")", "]")
    s"""$htmlCtes, b AS (
  SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS w
  FROM x
), rebuilt AS (
  ${boilerplateTailCtes(BoilerplateDfCap, P).replaceFirst("^base", "WITH base")}
)
SELECT doc_id, n_paras, n_kept,
       LEAST(len(w2) / 50.0, 1.0) *
         (CAST(len(list_distinct(w2)) AS DOUBLE) / len(w2)) *
         (1.0 - 0.5 * CAST(len(list_filter(w2,
            t -> list_contains($stops, t))) AS DOUBLE) / len(w2))
         AS quality_score
FROM (SELECT *, string_split(clean_text, ' ') AS w2 FROM rebuilt)"""
  }

  /** Mirror of
    * [[graft.streaming.StreamingIntervalJoin.clickPurchasePairs]]
    * (q187): the batch range join the watermarked stream-stream
    * inner join provably equals over ascending-time waves. Times
    * compare at ms precision in both engines (`epoch_ns // 1e6` ≡
    * the Spark side's ms-truncated event_time), so the horizon
    * boundary is bit-identical. */
  def intervalJoinPairs: String = {
    import graft.streaming.StreamingIntervalJoin.HorizonMs
    s"""WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ns(ts) // 1000000 AS ms
  FROM events)
SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
       b.ms - a.ms AS gap_ms, b.value
FROM e a JOIN e b ON b.user_id = a.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ms >= a.ms AND b.ms - a.ms <= $HorizonMs"""
  }

  /** Mirror of
    * [[graft.streaming.StreamingIntervalJoin.clickPurchasePairsOuter]]
    * (q196): the LEFT range join — unmatched clicks carry NULL
    * purchase columns, exactly the rows the streaming side emits at
    * state expiry once the sentinel flush wave has driven the
    * watermark past every real click's horizon. */
  def intervalJoinOuter: String = {
    import graft.streaming.StreamingIntervalJoin.HorizonMs
    s"""WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ns(ts) // 1000000 AS ms
  FROM events)
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       p.ms - c.ms AS gap_ms, p.value
FROM (SELECT * FROM e WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ms >= c.ms AND p.ms - c.ms <= $HorizonMs"""
  }
}
