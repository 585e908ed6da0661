package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching: the edit-distance self-join behind entity
  * resolution and near-identical record detection (customer names, product
  * titles, URLs) — the string-similarity member of the dedup family, next
  * to the set-similarity (Jaccard/MinHash) and vector (SimHash, embedding)
  * members in [[Dedup]]/[[graft.ops.Similarity]].
  */
object Fuzzy {

  /** All pairs of rows whose strings are within Levenshtein distance
    * `maxDist` — exact (lossless candidate generation + exact verify),
    * never a quadratic scan.
    *
    * Shape (Ed-Join's prefix filtering, Xiao/Wang/Lin VLDB'08, re-expressed
    * relationally):
    *  1. positional q-gram MULTISET per string, computed per row with
    *     array HOFs (occurrence index distinguishes repeated grams) — no
    *     shuffle, no UDF;
    *  2. global gram frequencies (vocabulary-sized → broadcast back);
    *  3. each string keeps only its `q·maxDist + 1` RAREST (gram, occ)
    *     elements under the (freq, gram, occ) total order — the prefix.
    *     Two strings within distance `maxDist` differ in at most `q·maxDist`
    *     gram positions, so their prefixes must share an element: joining
    *     prefixes on (gram, occ) loses no true pair, while the rarest-first
    *     order keeps join buckets small (a hot gram lands in a prefix only
    *     when a string has nothing rarer). The rank compiles to
    *     WindowGroupLimit (pre-shuffle top-k, same machinery as
    *     [[graft.ops.Relational.topKPerGroup]]);
    *  4. candidates (equi-join on (gram, occ) + length band) are verified
    *     with the codegen'd `levenshtein` — the filter is for cost only,
    *     correctness comes from the verify.
    * Strings too short to carry `q·maxDist + 1` grams can defeat the count
    * bound (two 2-char strings at distance 2 share nothing), so they pair
    * through a LENGTH-BUCKET equi-join instead (each short string explodes
    * to its `2·maxDist + 1` admissible partner lengths — the intervalJoin
    * bucket trick, still never a nested loop). A corpus of ONLY such
    * strings degenerates to the per-length quadratic problem it inherently
    * is.
    *
    * Output: (id_a, id_b, dist), id_a < id_b, one row per qualifying pair.
    *
    * Scale: the gram explode is O(total chars) map work; the only
    * corpus-sized shuffles are the prefix self-join (rarest-gram buckets)
    * and the pair distinct. Gram frequencies are |Σ|^q rows — broadcast.
    * Same skew posture as the shingle joins in [[Dedup]]: a pathological
    * gram distribution shows up as a hot (gram, occ) bucket; the lever is
    * raising q (rarer grams), since dropping buckets would break
    * losslessness.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 2): DataFrame =
    prefixJoin(gramPrefix(df, idCol, strCol, maxDist, q), maxDist)

  /** The normalized inputs and rarest-gram prefix table shared by
    * [[editDistanceJoin]], [[edJoinAudit]], and [[editDistanceJoinAuto]].
    */
  private case class EdParts(base: DataFrame, long: DataFrame,
                             short: DataFrame, prefix: DataFrame,
                             prefixLen: Int, maxDist: Int, q: Int,
                             freq: DataFrame)

  /** Steps 1-2 of the Ed-Join shape: normalized inputs, the long/short
    * split, and the positional gram multiset — everything BEFORE an
    * ordering is chosen. Shared by the symmetric df-ordered prefix
    * ([[gramPrefix]]), the asymmetric probe (incoming side ordered by
    * the CORPUS df), and the hash-ordered registry ([[edIndex]]).
    */
  private case class EdRaw(base: DataFrame, long: DataFrame,
                           short: DataFrame, exploded: DataFrame)

  private def gramExplode(df: DataFrame, idCol: String, strCol: String,
                          maxDist: Int, q: Int): EdRaw = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val id = col(idCol)
    val s = col(strCol)

    val base = df.select(id.as("_id"), s.as("_s"), length(s).as("_len"),
      (length(s) - lit(q) + lit(1)).as("_ng"))
    // strings with at most q·maxDist grams can share zero grams yet still
    // be within maxDist — they go through the length-bucket path
    val long = base.filter(col("_ng") > lit(q * maxDist))
    val short = base.filter(col("_ng") <= lit(q * maxDist))

    // positional gram multiset: (gram, occurrence-within-string); occ is
    // computed against the prefix of the gram array so repeats are
    // distinguished without any shuffle
    val grams = transform(sequence(lit(1), col("_ng")),
      i => col("_s").substr(i, lit(q)))
    val gramOcc = transform(grams, (g, i) =>
      struct(g.as("g"),
        size(filter(slice(grams, lit(1), i + lit(1)), y => y === g)).as("occ")))
    val exploded = long
      .select(col("_id"), col("_len"), explode(gramOcc).as("go"))
      .select(col("_id"), col("_len"),
        col("go.g").as("g"), col("go.occ").as("occ"))
    EdRaw(base, long, short, exploded)
  }

  /** Step 3 of the Ed-Join shape (gram multiset → global frequencies
    * → rarest-gram prefix) — the part whose OUTPUT is also the cost
    * signal the auto dispatcher reads.
    */
  private def gramPrefix(df: DataFrame, idCol: String, strCol: String,
                         maxDist: Int, q: Int): EdParts = {
    val prefixLen = q * maxDist + 1
    val r = gramExplode(df, idCol, strCol, maxDist, q)
    val freq = r.exploded.groupBy("g").agg(count(lit(1)).as("_gdf"))
    val prefix = graft.ops.Relational.topKPerGroup(
      r.exploded.join(broadcast(freq), Seq("g")),
      Seq("_id"), Seq(asc("_gdf"), asc("g"), asc("occ")), prefixLen)
      .drop("rank", "_gdf")
    EdParts(r.base, r.long, r.short, prefix, prefixLen, maxDist, q, freq)
  }

  /** Step 4: the prefix self-join + verify tail over a prepared
    * [[EdParts]].
    */
  private def prefixJoin(p: EdParts, maxDist: Int): DataFrame = {
    // candidates carry IDS ONLY: on a gram-poor corpus the prefix filter
    // can pass millions of pairs, and hashing/deduping (id, id) longs is
    // several times cheaper than dragging both 20+-char strings through
    // the join and the distinct — strings rejoin exactly once, after the
    // pair set is deduped (two more keyed joins; at corpus scale that is
    // the standard trade against materializing strings per candidate)
    val a = p.prefix.select(col("_id").as("id_a"), col("_len").as("_la"),
      col("g"), col("occ"))
    val b = p.prefix.select(col("_id").as("id_b"), col("_len").as("_lb"),
      col("g"), col("occ"))
    val longCand = a.join(b.hint("shuffle_hash"), Seq("g", "occ"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("_la") - col("_lb")) <= maxDist)
      .select("id_a", "id_b")

    // short strings: short-long pairs once from the short side,
    // short-short pairs twice then distinct'd in the verify tail
    val shortCand = lengthBucketCand(p.short, p.base, maxDist)

    verifyCandidates(p.base, longCand.unionByName(shortCand), maxDist)
  }

  /** Shared verify tail: dedupe candidate id pairs, rejoin the strings
    * exactly once, and keep pairs the banded Levenshtein confirms.
    * Correctness of both join variants lives HERE — candidate generation
    * is cost-only pruning.
    */
  private def verifyCandidates(base: DataFrame, cand: DataFrame,
                               maxDist: Int): DataFrame = {
    val strings = base.select(col("_id"), col("_s"))
    cand.distinct()
      .join(strings.select(col("_id").as("id_a"), col("_s").as("_sa")), Seq("id_a"))
      .join(strings.select(col("_id").as("id_b"), col("_s").as("_sb")), Seq("id_b"))
      // threshold form = banded DP, O(maxDist·n) per pair instead of
      // O(n²); returns -1 when the distance exceeds the threshold
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), maxDist))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }

  /** Length-bucket pairing for strings too short for a variant's count
    * bound: each short string explodes to its `2·maxDist + 1` admissible
    * partner lengths and equi-joins EVERY string in the band — still
    * never a nested loop.
    */
  private def lengthBucketCand(short: DataFrame, base: DataFrame,
                               maxDist: Int): DataFrame =
    short
      .select(col("_id").as("id_s"),
        explode(sequence(col("_len") - lit(maxDist),
          col("_len") + lit(maxDist))).as("_tl"))
      .join(base.select(col("_id").as("id_o"), col("_len").as("_tl")),
        Seq("_tl"))
      .filter(col("id_s") =!= col("id_o"))
      .select(least(col("id_s"), col("id_o")).as("id_a"),
        greatest(col("id_s"), col("id_o")).as("id_b"))

  /** The same edit-distance self-join contract as [[editDistanceJoin]],
    * with PARTITION-based candidate generation (Li/Deng/Feng, "PASS-JOIN:
    * a partition-based method for similarity joins", PVLDB 5(3), 2011 —
    * re-expressed relationally): split every string into `maxDist + 1`
    * contiguous segments; by pigeonhole, two strings within distance
    * `maxDist` must agree EXACTLY on at least one whole segment, shifted
    * by at most `maxDist` positions. So each string indexes its own
    * segments, probes every admissible partner length's segment scheme at
    * every in-window start, and candidates come from an equi-join on
    * (partner_len, segment_idx, segment_value) — the value keys are
    * segment-length substrings (≈ len/(maxDist+1) chars), far more
    * selective than q-grams when the alphabet/vocabulary is small.
    *
    * WHEN TO PREFER which variant: [[editDistanceJoin]]'s rarest-gram
    * prefix filter wins on high-entropy strings (names, URLs — rare grams
    * exist, prefixes barely collide). On a LOW-entropy corpus its gram
    * buckets grow linearly with n and candidates quadratically — the sf1
    * sweep measured 476M candidate rows over 50k 20-char fixture-vocab
    * strings, vs 41M for the segment join (11×): segments span ~7 chars,
    * and specificity grows exponentially with matched length. Probe
    * fan-out is the price: (2d+1) lengths × (d+1) segments × ≤(2d+1)
    * starts ≈ 75 probe rows per string at d=2 — pure map-side explode,
    * cheap next to a candidate explosion.
    *
    * Both variants are lossless (candidate superset + exact verify) and
    * return identical rows: (id_a, id_b, dist), id_a < id_b.
    */
  def editDistanceJoinPartitioned(df: DataFrame, idCol: String, strCol: String,
                                  maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val nseg = maxDist + 1
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    // every segment must be nonempty for the pigeonhole bound; shorter
    // strings go through the length buckets
    val long = base.filter(col("_len") >= nseg)
    val short = base.filter(col("_len") < nseg)

    val index = segIndexRows(long, maxDist)
      .withColumnRenamed("_id", "id_i")
    val probes = segProbeRows(long, maxDist)
      .withColumnRenamed("_id", "id_p")

    // the (_li, si, sv) equi-join bakes the length band in: a probe row
    // exists only FOR partner length _li. Ids only, like the prefix join.
    val longCand = index.join(probes.hint("shuffle_hash"), Seq("_li", "si", "sv"))
      .filter(col("id_i") =!= col("id_p"))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))

    verifyCandidates(base,
      longCand.unionByName(lengthBucketCand(short, base, maxDist)), maxDist)
  }

  /** Deterministic PASS-JOIN scheme for length l: segment i (0-based)
    * has length floor(l/nseg) + (i < l mod nseg ? 1 : 0), start
    * 1 + i·floor(l/nseg) + min(i, l mod nseg) — index and probe sides
    * derive it from the SAME arithmetic.
    */
  private def segLenC(l: Column, i: Int, nseg: Int): Column =
    floor(l / nseg).cast("int") + when(lit(i) < l % nseg, 1).otherwise(0)
  private def segStartC(l: Column, i: Int, nseg: Int): Column =
    lit(1) + lit(i) * floor(l / nseg).cast("int") + least(lit(i), l % nseg)

  /** Own-scheme segment rows for long strings: (_id, _li = own length,
    * si, sv) — nseg rows per string. A string's rows are a pure function
    * of the string alone (no corpus statistics), which is what makes the
    * persisted [[segIndex]] append-stable.
    */
  private def segIndexRows(long: DataFrame, maxDist: Int): DataFrame = {
    val nseg = maxDist + 1
    long
      .select(col("_id"), col("_len").as("_li"), explode(array(
        (0 until nseg).map(i => struct(lit(i).as("si"),
          col("_s").substr(segStartC(col("_len"), i, nseg),
            segLenC(col("_len"), i, nseg)).as("sv"))): _*)).as("seg"))
      .select(col("_id"), col("_li"),
        col("seg.si").as("si"), col("seg.sv").as("sv"))
  }

  /** Probe rows: for each partner length l within ±maxDist, each segment
    * of scheme(l), each start within the ±maxDist edit-shift window
    * (clamped to the string) — one flattened array per row, a single
    * explode. ≈ (2d+1)·(d+1)·(2d+1) rows per string at distance d.
    */
  private def segProbeRows(long: DataFrame, maxDist: Int): DataFrame = {
    val nseg = maxDist + 1
    val K = maxDist
    val emptyProbe = array().cast("array<struct<l:int,si:int,sv:string>>")
    val probeArr = flatten(transform(
      sequence(col("_len") - K, col("_len") + K), l => concat(
        (0 until nseg).map { i =>
          val sl = segLenC(l, i, nseg)
          val lo = greatest(lit(1), segStartC(l, i, nseg) - K)
          val hi = least(col("_len") - sl + 1, segStartC(l, i, nseg) + K)
          when(l >= nseg && sl > 0 && lo <= hi,
            transform(sequence(lo, hi), st => struct(l.cast("int").as("l"),
              lit(i).as("si"), col("_s").substr(st, sl).as("sv"))))
            .otherwise(emptyProbe)
        }: _*)))
    long
      .select(col("_id"), explode(probeArr).as("pr"))
      .select(col("_id"), col("pr.l").as("_li"),
        col("pr.si").as("si"), col("pr.sv").as("sv"))
  }

  /** Pre-flight cost audit of [[editDistanceJoin]]'s candidate volume,
    * BOTH paths:
    *  - prefix path: the exact number of (unordered, pre-length-band)
    *    candidate pairs its (gram, occ) buckets would emit —
    *    Σ c·(c−1)/2 over bucket sizes c. Because every long string
    *    carries exactly `prefixLen` prefix elements, the pair count and
    *    the long-string count fall out of ONE aggregation over the
    *    prefix table;
    *  - short-string path: strings below the gram-count bound pair
    *    through LENGTH buckets — quadratic within a ±maxDist length
    *    band — so a short-dominated corpus (SKUs, airport codes) can
    *    explode with an empty prefix census. Estimated from the length
    *    histogram (≤ max-length rows, collected): Σ over short lengths
    *    of n_l · (band(l) − 1) — candidate ROWS from the short side,
    *    short-short pairs counted from both ends (a deliberate upper
    *    bound; the dispatcher errs toward the segment regime, which
    *    handles the same strings with selective segment keys down to
    *    maxDist+1 chars).
    * The whole audit costs the gram explode + two key shuffles (freq,
    * top-k) + one tiny histogram — work the prefix regime does anyway,
    * and orders of magnitude less than a candidate explosion it
    * predicts (the sf1 sweep's 476M-row case).
    *
    * `nStrings` counts ALL strings; `candidatesPerString` is the regime
    * signal: high-entropy corpora (names, URLs) sit in the single
    * digits; the 50k fixture-vocab sweep measured ~9 500.
    */
  case class EdJoinAudit(nStrings: Long, candidatePairs: Long) {
    def candidatesPerString: Double =
      if (nStrings == 0) 0.0 else candidatePairs.toDouble / nStrings
  }

  /** Run the audit standalone (observability: log it from a pipeline the
    * same way [[graft.ops.Distribution.skewAudit]] is used, BEFORE paying
    * for a join on an unknown corpus).
    */
  def edJoinAudit(df: DataFrame, idCol: String, strCol: String,
                  maxDist: Int, q: Int = 2): EdJoinAudit =
    auditPrefix(gramPrefix(df, idCol, strCol, maxDist, q))

  private def auditPrefix(p: EdParts): EdJoinAudit = {
    val r = p.prefix.groupBy("g", "occ").agg(count(lit(1)).as("c"))
      .agg(
        // c·(c−1) is even, and the double sum is exact far past any
        // real bucket census (< 2^53) — cast back to long after
        coalesce(sum(col("c") * (col("c") - lit(1)) / lit(2)), lit(0.0))
          .cast("long").as("pairs"),
        coalesce(sum(col("c")), lit(0L)).as("rows"))
      .head()
    val prefixPairs = r.getLong(0)
    val nLong = r.getLong(1) / p.prefixLen
    // length histogram: one combinable aggregate, ≤ max-string-length
    // rows to the driver (the skewAudit boundedness argument)
    val lens = p.base.groupBy("_len").agg(count(lit(1)).as("n"))
      .collect().filterNot(_.isNullAt(0))
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    val shortBound = p.q * p.maxDist + p.q - 1 // _ng <= q·maxDist
    def band(l: Int): Long =
      (l - p.maxDist to l + p.maxDist).iterator
        .map(lens.getOrElse(_, 0L)).sum
    val shortPairs = lens.iterator
      .collect { case (l, n) if l <= shortBound => n * (band(l) - 1) }
      .sum
    EdJoinAudit(nLong + lens.iterator
      .collect { case (l, n) if l <= shortBound => n }.sum,
      prefixPairs + shortPairs)
  }

  /** Pre-flight cost audit of [[editDistanceJoinPartitioned]]'s
    * candidate volume — [[edJoinAudit]]'s twin at the SEGMENT regime, so
    * a dispatcher can detect the corpus where BOTH lossless regimes
    * flood (the boilerplate signature: a tiny effective alphabet makes
    * even the rarest grams common AND segment values collide).
    * Candidate pairs = Σ over (partner-length, segment-index, segment-
    * value) keys of index-count × probe-count, halved (each true pair
    * can hit from both directions; self-hits are left in — the audit
    * errs toward predicting MORE flood, the cautious direction), plus
    * the short-string length-bucket rows (shorter than maxDist+1 — the
    * segment regime's short bound). Costs the two explodes + two
    * key-grain censuses + one key-grain join — work the regime's own
    * join pays anyway, minus the verify.
    */
  def segJoinAudit(df: DataFrame, idCol: String, strCol: String,
                   maxDist: Int): EdJoinAudit = {
    val nseg = maxDist + 1
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    val long = base.filter(col("_len") >= nseg)
    val idx = segIndexRows(long, maxDist)
      .groupBy("_li", "si", "sv").agg(count(lit(1)).as("ci"))
    val prb = segProbeRows(long, maxDist)
      .groupBy("_li", "si", "sv").agg(count(lit(1)).as("cp"))
    val joinRows = idx.join(prb.hint("shuffle_hash"), Seq("_li", "si", "sv"))
      // per-key products summed in double (exact past any real census),
      // cast back — the auditPrefix convention
      .agg(coalesce(sum((col("ci") * col("cp")).cast("double")), lit(0.0))
        .cast("long").as("rows"))
      .head().getLong(0)
    val lens = base.groupBy("_len").agg(count(lit(1)).as("n"))
      .collect().filterNot(_.isNullAt(0))
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    def band(l: Int): Long =
      (l - maxDist to l + maxDist).iterator
        .map(lens.getOrElse(_, 0L)).sum
    val shortPairs = lens.iterator
      .collect { case (l, n) if l < nseg => n * (band(l) - 1) }
      .sum
    EdJoinAudit(lens.valuesIterator.sum, joinRows / 2 + shortPairs)
  }

  /** A tiered dispatch result: the qualifying pairs, the regime that
    * produced them ("prefix" | "partition" | "snm"), and — on the lossy
    * SNM tier ONLY — the freshly-computed recall certificate that MUST
    * accompany any lossy output (None on the lossless tiers, where
    * recall is a theorem, not a measurement).
    */
  case class EdDispatch(pairs: DataFrame, regime: String,
                        certificate: Option[DataFrame])

  /** [[editDistanceJoinAuto]] extended with the CERTIFIED LOSSY third
    * tier: when the prefix census floods AND [[segJoinAudit]] shows the
    * segment regime flooding too (the both-regimes boilerplate
    * signature), an `allowLossy = true` caller is routed to
    * [[sortedNeighborhoodPairs]] — O(n·window) by construction,
    * gram-skew-immune — and the result carries a fresh
    * [[snmRecallEval]] certificate over `certSlice` computed IN THE SAME
    * RUN: SNM has no losslessness theorem, so an uncertified SNM output
    * is not a result, and the dispatcher refuses to produce one
    * (`require`). The default is unchanged: `allowLossy = false` picks
    * the less-bad lossless regime exactly as [[editDistanceJoinAuto]]
    * does, whatever the segment census says.
    */
  def editDistanceJoinTiered(df: DataFrame, idCol: String, strCol: String,
                             maxDist: Int, q: Int = 2,
                             maxCandidatesPerString: Double = 64.0,
                             allowLossy: Boolean = false,
                             snmWindow: Int = 10,
                             certSlice: Option[DataFrame] = None): EdDispatch = {
    require(!allowLossy || certSlice.isDefined,
      "allowLossy = true requires certSlice: the SNM tier must emit a " +
        "recall certificate over a bounded eval slice alongside its output")
    val p0 = gramPrefix(df, idCol, strCol, maxDist, q)
    val p = p0.copy(prefix = graft.CacheScope.pin(p0.prefix))
    if (auditPrefix(p).candidatesPerString <= maxCandidatesPerString)
      EdDispatch(prefixJoin(p, maxDist), "prefix", None)
    else {
      graft.CacheScope.unpin(p.prefix)
      val segFloods = allowLossy &&
        segJoinAudit(df, idCol, strCol, maxDist).candidatesPerString >
          maxCandidatesPerString
      if (!segFloods)
        EdDispatch(
          editDistanceJoinPartitioned(df, idCol, strCol, maxDist),
          "partition", None)
      else
        EdDispatch(
          sortedNeighborhoodPairs(df, idCol, strCol, snmWindow, maxDist),
          "snm",
          Some(snmRecallEval(certSlice.get, idCol, strCol, snmWindow,
            maxDist)))
    }
  }

  /** [[editDistanceJoin]]'s contract with AUTOMATIC regime selection —
    * the dispatcher the r8 verdict asked for: measure the prefix
    * filter's candidate volume with [[edJoinAudit]]'s aggregate, and
    * fall over to the segment join when it predicts an explosion.
    *
    * Threshold rationale: the segment join's price is its fixed probe
    * fan-out — ≈ (2·maxDist+1)²·(maxDist+1) ≈ 75 probe rows per string
    * at maxDist=2 — while its segment keys (≈ len/(maxDist+1)-char
    * substrings) keep candidates an order of magnitude below gram
    * buckets on low-entropy corpora (41M vs 476M at sf1). So once
    * predicted prefix candidates per string clear the same order as
    * that fan-out (default 64), the segment regime wins; far below it,
    * rare grams exist and the prefix regime's near-zero fan-out wins.
    * The decision costs one scalar aggregate over the prefix table the
    * chosen-or-not prefix regime needed anyway; when it dispatches to
    * the segment join, that inspection work is the (documented) price
    * of not guessing.
    *
    * Both regimes are lossless, so the OUTPUT is identical either way:
    * (id_a, id_b, dist), id_a < id_b.
    */
  def editDistanceJoinAuto(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int, q: Int = 2,
                           maxCandidatesPerString: Double = 64.0): DataFrame = {
    val p0 = gramPrefix(df, idCol, strCol, maxDist, q)
    // persist the prefix table across census + (possibly) join — without
    // it the prefix path pays the explode/freq/top-k pipeline TWICE
    // (once materializing the census, once in the join job). Same
    // pattern as embeddingNearDup's bucketed cache; MEMORY_AND_DISK so
    // a corpus-scale prefix spills instead of evicting. Released
    // immediately when the segment regime wins (nothing downstream
    // references it); on the prefix path the returned plan holds it,
    // and the caller's session owns the cache lifetime as with any
    // pinned operator intermediate (release with
    // graft.CacheScope.release(spark) between corpora — the pipeline
    // runners here clearCache, which works too; a per-call unpersist
    // handle would force eager materialization and break the locked
    // lazy-plan contract in FuzzySpec).
    val p = p0.copy(prefix = graft.CacheScope.pin(p0.prefix))
    if (auditPrefix(p).candidatesPerString > maxCandidatesPerString) {
      // unpin, not bare unpersist: the segment regime abandons the
      // prefix table entirely, so its CacheScope entry must go with the
      // blocks (a long-lived session repeatedly hitting this branch
      // would otherwise accumulate dead plan references until release())
      graft.CacheScope.unpin(p.prefix)
      editDistanceJoinPartitioned(df, idCol, strCol, maxDist)
    } else
      prefixJoin(p, maxDist) // reuses the cached, already-censused prefix
  }

  /** The regime [[editDistanceJoinAuto]] would dispatch to for this
    * corpus — `"prefix"` (Ed-Join) or `"partition"` (PASS-JOIN) — as a
    * testable/loggable decision.
    */
  def autoRegime(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int, q: Int = 2,
                 maxCandidatesPerString: Double = 64.0): String =
    if (edJoinAudit(df, idCol, strCol, maxDist, q).candidatesPerString >
      maxCandidatesPerString) "partition" else "prefix"

  /** ASYMMETRIC Ed-Join — the ingest form of [[editDistanceJoin]]: every
    * (incoming, corpus) pair within Levenshtein `maxDist`, with no
    * corpus self-pairing (the [[Dedup.nearDupAgainst]] /
    * [[Dedup.containmentAgainst]] economics at the string-similarity
    * member of the dedup family). The batch side's prefix is ordered by
    * the CORPUS gram frequencies, with grams the corpus has never seen
    * ranked rarest (df 0) — a consistent extension of the corpus total
    * order, so the cross-side prefix lemma holds: any two strings within
    * `maxDist` share a positional gram inside both `q·maxDist+1` prefixes
    * drawn from ONE total order, whatever that order is. The order only
    * prices pruning; correctness lives in the verify.
    *
    * Short strings pair through batch-side length-bucket explodes in
    * BOTH directions (incoming shorts × any corpus length, incoming
    * longs × corpus shorts) — the explode always rides the batch, so
    * per-batch work stays batch-proportional plus the corpus prefix
    * build (which [[editDistanceAgainstIndex]] amortizes into a
    * committed artifact).
    *
    * Output: (id_inc, id_corp, dist) — one row per qualifying cross
    * pair; a re-ingested identical string surfaces as dist 0.
    */
  def editDistanceAgainst(corpus: DataFrame, incoming: DataFrame,
                          idCol: String, strCol: String,
                          maxDist: Int, q: Int = 2): DataFrame =
    asymPrefixJoin(gramPrefix(corpus, idCol, strCol, maxDist, q),
      corpus, incoming, idCol, strCol, maxDist, q)

  /** [[editDistanceAgainst]]'s body over a prepared corpus [[EdParts]] —
    * split out so [[editDistanceAgainstAuto]] can reuse its pinned,
    * already-censused prefix table. */
  private def asymPrefixJoin(cp: EdParts, corpus: DataFrame,
                             incoming: DataFrame, idCol: String,
                             strCol: String, maxDist: Int,
                             q: Int): DataFrame = {
    val ir = gramExplode(incoming, idCol, strCol, maxDist, q)
    val iPrefix = graft.ops.Relational.topKPerGroup(
      ir.exploded.join(broadcast(cp.freq), Seq("g"), "left")
        .withColumn("_gdf", coalesce(col("_gdf"), lit(0L))),
      Seq("_id"), Seq(asc("_gdf"), asc("g"), asc("occ")), cp.prefixLen)
      .drop("rank", "_gdf")
    asymVerify(
      asymCandidates(iPrefix, ir,
        cp.prefix.select(col("_id").as("id_corp"), col("_len").as("_lb"),
          col("g"), col("occ")),
        cp.base.select(col("_id").as("id_corp"), col("_len")),
        cp.short.select(col("_id").as("id_corp"), col("_len")),
        maxDist),
      ir.base, corpus, idCol, strCol, maxDist)
  }

  /** The corpus side of [[editDistanceAgainst]] as a persistable
    * registry relation — the signature-table move for the FIFTH
    * asymmetric-ingest family (after text signatures, embedding bands,
    * IVF cells, and containment shingles): one row per corpus string
    * per prefix gram, plus one `g`-NULL row per short string (they
    * carry no prefix but must stay reachable through the length
    * buckets).
    *
    * The prefix here is ordered by GRAM HASH, not df: any total order
    * shared by both sides is lossless (see [[editDistanceAgainst]]),
    * and a df-free order makes the committed relation SELF-CONTAINED
    * and append-stable — [[edIndexUpdate]] appends a batch's rows
    * computed in isolation and the result is bit-identical to a full
    * rebuild (no stale-frequency contract at all, unlike the
    * containment index's once-kept stop shingles). The price is pruning
    * quality: hash order ignores rarity, so candidate volume runs above
    * the df-ordered inline form on skewed gram distributions — the
    * inline/served sf1 sweep rows price exactly that trade, and the
    * verify keeps outputs identical either way.
    *
    * Schema: (doc_id, len, g, occ, max_dist, gram_q) — `g` NULL marks a
    * short string; max_dist/gram_q stamp the BUILD parameters into the
    * committed relation (constant columns, RLE'd to nothing in parquet)
    * so a serve-time parameter mismatch fails loudly instead of
    * silently under-recalling ([[requireStamp]]).
    */
  def edIndex(corpus: DataFrame, idCol: String, strCol: String,
              maxDist: Int, q: Int = 2): DataFrame = {
    val r = gramExplode(corpus, idCol, strCol, maxDist, q)
    val prefix = graft.ops.Relational.topKPerGroup(
      r.exploded.withColumn("_h", xxhash64(col("g"))),
      Seq("_id"), Seq(asc("_h"), asc("g"), asc("occ")), q * maxDist + 1)
      .drop("rank", "_h")
      .select(col("_id").as("doc_id"), col("_len").as("len"),
        col("g"), col("occ"))
    val shorts = r.short.select(col("_id").as("doc_id"),
      col("_len").as("len"), lit(null).cast("string").as("g"),
      lit(null).cast("int").as("occ"))
    prefix.unionByName(shorts)
      .withColumn("max_dist", lit(maxDist))
      .withColumn("gram_q", lit(q))
  }

  /** Row-level registry PARAMETER guard: the serve call's (maxDist, q)
    * must equal the build's — a registry built at maxDist=2 but served
    * at 3 silently under-recalls (its prefixes are one gram too short
    * for the larger radius). The build params are stamped into every
    * index row and this filter raises on the first mismatched row,
    * riding the registry scan the probe join pays anyway — zero extra
    * jobs, and a mixed-parameter registry (a buggy union of two builds)
    * is caught wherever the mismatch sits.
    */
  private def requireStamp(registry: DataFrame, what: String,
                           params: (String, Int)*): DataFrame = {
    requireStampColumns(registry, what, params.map(_._1))
    val ok = params.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
    val expect = params.map { case (c, v) => s"$c=$v" }.mkString(", ")
    val fmt = s"$what registry was built with different parameters than " +
      s"it is served with: serve expects $expect, row carries " +
      params.map(p => s"${p._1}=%d").mkString(", ") +
      " — rebuild the registry or serve with the build parameters"
    registry.filter(when(ok, lit(true)).otherwise(
      raise_error(format_string(fmt, params.map(p => col(p._1)): _*))
        .cast("boolean")))
  }

  /** MIGRATION guard for the stamp columns: a registry committed BEFORE
    * parameter stamping (r14) has no max_dist/gram_q columns, and every
    * serve/update/retract would otherwise die with an unresolved-column
    * AnalysisException that never names the remedy. Fail with the
    * remedy instead: rebuild via the family's `*Refresh`.
    */
  private def requireStampColumns(registry: DataFrame, what: String,
                                  cols: Seq[String]): Unit = {
    val missing = cols.filterNot(registry.columns.contains)
    require(missing.isEmpty,
      s"$what registry predates parameter stamping (missing column(s) " +
        s"${missing.mkString(", ")}): it was committed by a version " +
        "without build-parameter stamps — rebuild it with the family's " +
        "refresh (segIndexRefresh / edIndexRefresh) before serving, " +
        "updating, or retracting")
  }

  /** Build-and-commit [[edIndex]] as a versioned Manifest snapshot.
    * Returns the version. */
  def edIndexRefresh(corpus: DataFrame, table: String, idCol: String,
                     strCol: String, maxDist: Int, q: Int = 2): Int =
    graft.io.Manifest.write(edIndex(corpus, idCol, strCol, maxDist, q), table)

  /** Registry MAINTENANCE: append an accepted batch's rows and commit
    * the next version. The hash order is corpus-independent, so append
    * IS the merge — update(v, batch) reads bit-identical to a rebuild
    * over corpus ∪ batch (FuzzySpec pins it; same maxDist/q required).
    * Returns the new version. */
  def edIndexUpdate(table: String, accepted: DataFrame, idCol: String,
                    strCol: String, maxDist: Int, q: Int = 2): Int = {
    val spark = accepted.sparkSession
    // VALUE-checked, not just presence-checked: an update at different
    // parameters than the build would commit a mixed-stamp registry
    // that bricks every later serve — the per-row guard rides the scan
    // the union's write pays anyway
    val cur = requireStamp(graft.io.Manifest.read(spark, table), "ed-gram",
      "max_dist" -> maxDist, "gram_q" -> q)
    graft.io.Manifest.write(
      cur.unionByName(edIndex(accepted, idCol, strCol, maxDist, q)),
      table)
  }

  /** Registry DELETE — [[edIndexUpdate]]'s inverse: drop removed ids'
    * rows and commit. Returns the new version. */
  def edIndexRetract(table: String, removedIds: DataFrame,
                     idCol: String): Int = {
    val spark = removedIds.sparkSession
    val cur = graft.io.Manifest.read(spark, table)
    requireStampColumns(cur, "ed-gram", Seq("max_dist", "gram_q"))
    graft.io.Manifest.write(
      cur.join(broadcast(removedIds.select(col(idCol).as("doc_id"))),
          Seq("doc_id"), "left_anti")
        .select("doc_id", "len", "g", "occ", "max_dist", "gram_q"),
      table)
  }

  /** [[editDistanceAgainst]] served from a PERSISTED [[edIndex]] — only
    * the incoming batch is grammed and prefixed (in the registry's hash
    * order); corpus strings are touched exactly for candidate ids (one
    * semi join), so per-batch cost is O(batch + candidates) regardless
    * of corpus size. Output is IDENTICAL to the inline form: both
    * candidate generations are lossless and the verify is shared, so
    * the oracle is the naive cross statement verbatim.
    */
  def editDistanceAgainstIndex(registry0: DataFrame, corpus: DataFrame,
                               incoming: DataFrame, idCol: String,
                               strCol: String, maxDist: Int,
                               q: Int = 2): DataFrame = {
    val registry = requireStamp(registry0, "ed-gram",
      "max_dist" -> maxDist, "gram_q" -> q)
    val ir = gramExplode(incoming, idCol, strCol, maxDist, q)
    val iPrefix = graft.ops.Relational.topKPerGroup(
      ir.exploded.withColumn("_h", xxhash64(col("g"))),
      Seq("_id"), Seq(asc("_h"), asc("g"), asc("occ")), q * maxDist + 1)
      .drop("rank", "_h")
    val cand = asymCandidates(iPrefix, ir,
      registry.filter(col("g").isNotNull)
        .select(col("doc_id").as("id_corp"), col("len").as("_lb"),
          col("g"), col("occ")),
      registry.select(col("doc_id").as("id_corp"), col("len").as("_len"))
        .distinct(),
      registry.filter(col("g").isNull)
        .select(col("doc_id").as("id_corp"), col("len").as("_len")),
      maxDist)
    // corpus text only for candidate ids — the serve economics
    val candCorpus = corpus.join(
      cand.select(col("id_corp").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    asymVerify(cand, ir.base, candCorpus, idCol, strCol, maxDist)
  }

  /** Cross-side candidate generation shared by the inline and served
    * asymmetric forms: prefix equi-join on (gram, occ) + length band
    * for long×long, batch-side length-bucket explodes for every pair
    * involving a short string. `corpusLens`/`corpusShortLens` are
    * (id_corp, _len) relations.
    */
  private def asymCandidates(iPrefix: DataFrame, ir: EdRaw,
                             corpusPrefix: DataFrame,
                             corpusLens: DataFrame,
                             corpusShortLens: DataFrame,
                             maxDist: Int): DataFrame = {
    val a = iPrefix.select(col("_id").as("id_inc"), col("_len").as("_la"),
      col("g"), col("occ"))
    val longCand = a.join(corpusPrefix.hint("shuffle_hash"), Seq("g", "occ"))
      .filter(abs(col("_la") - col("_lb")) <= maxDist)
      .select("id_inc", "id_corp")
    longCand.unionByName(
      asymShortBuckets(ir.short, ir.long, corpusLens, corpusShortLens, maxDist))
  }

  /** Cross-side length-bucket pairing shared by both asymmetric regimes:
    * incoming shorts pair with EVERY corpus length in band, incoming
    * longs pair with corpus shorts — the explode always rides the batch.
    * `corpusLens`/`corpusShortLens` are (id_corp, _len) relations; each
    * regime supplies its own short/long split (gram-count bound for the
    * prefix regime, len < maxDist+1 for the segment regime).
    */
  private def asymShortBuckets(incShort: DataFrame, incLong: DataFrame,
                               corpusLens: DataFrame,
                               corpusShortLens: DataFrame,
                               maxDist: Int): DataFrame = {
    val shortIncCand = incShort
      .select(col("_id").as("id_inc"),
        explode(sequence(col("_len") - lit(maxDist),
          col("_len") + lit(maxDist))).as("_tl"))
      .join(corpusLens.withColumnRenamed("_len", "_tl"), Seq("_tl"))
      .select("id_inc", "id_corp")
    val shortCorpCand = incLong
      .select(col("_id").as("id_inc"),
        explode(sequence(col("_len") - lit(maxDist),
          col("_len") + lit(maxDist))).as("_tl"))
      .join(corpusShortLens.withColumnRenamed("_len", "_tl"), Seq("_tl"))
      .select("id_inc", "id_corp")
    shortIncCand.unionByName(shortCorpCand)
  }

  /** Asymmetric verify tail: dedupe cross pairs, rejoin each side's
    * string exactly once, keep pairs the banded Levenshtein confirms.
    */
  private def asymVerify(cand: DataFrame, incBase: DataFrame,
                         corpusStrings: DataFrame, idCol: String,
                         strCol: String, maxDist: Int): DataFrame =
    cand.distinct()
      .join(incBase.select(col("_id").as("id_inc"), col("_s").as("_sa")),
        Seq("id_inc"))
      .join(corpusStrings.select(col(idCol).as("id_corp"),
        col(strCol).as("_sb")), Seq("id_corp"))
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), maxDist))
      .filter(col("dist") >= 0)
      .select("id_inc", "id_corp", "dist")

  /** ASYMMETRIC PASS-JOIN — [[editDistanceAgainst]]'s contract via the
    * segment pigeonhole, and naturally index/probe shaped: the CORPUS
    * partitions each string into `maxDist + 1` own-scheme segments (the
    * index), the BATCH probes every admissible corpus length's scheme at
    * every in-window start. One direction suffices: if ed(inc, corp) ≤ d
    * then ≤ d of the corpus string's d+1 segments are touched by edits,
    * so at least one appears EXACTLY in the incoming string within shift
    * d — every true pair is a (corpus index row ⋈ incoming probe row)
    * hit. Pairs involving a sub-scheme-length short string go through
    * the shared length buckets ([[asymShortBuckets]]).
    *
    * WHEN TO PREFER over [[editDistanceAgainst]]: the same regime split
    * as the symmetric family, but sharper — the sf1 sweep measured the
    * gram-prefix asym at 132.6 s on the 50k fixture-vocab corpus (hot
    * gram buckets) vs ~20 s for segment keys; on high-entropy corpora
    * the gram prefix's near-zero fan-out wins. [[editDistanceAgainstAuto]]
    * reads the corpus census and dispatches.
    *
    * Output: (id_inc, id_corp, dist) — identical to the gram-prefix
    * asym (both candidate generations are lossless, verify is shared).
    */
  def editDistanceAgainstPartitioned(corpus: DataFrame, incoming: DataFrame,
                                     idCol: String, strCol: String,
                                     maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val nseg = maxDist + 1
    val cb = corpus.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    val ib = incoming.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    val cLong = cb.filter(col("_len") >= nseg)
    val cShort = cb.filter(col("_len") < nseg)
    val iLong = ib.filter(col("_len") >= nseg)
    val iShort = ib.filter(col("_len") < nseg)
    val longCand = segIndexRows(cLong, maxDist)
      .select(col("_id").as("id_corp"), col("_li"), col("si"), col("sv"))
      .join(segProbeRows(iLong, maxDist)
        .select(col("_id").as("id_inc"), col("_li"), col("si"), col("sv"))
        .hint("shuffle_hash"), Seq("_li", "si", "sv"))
      .select("id_inc", "id_corp")
    val cand = longCand.unionByName(asymShortBuckets(
      iShort, iLong,
      cb.select(col("_id").as("id_corp"), col("_len")),
      cShort.select(col("_id").as("id_corp"), col("_len")),
      maxDist))
    asymVerify(cand, ib, corpus, idCol, strCol, maxDist)
  }

  /** The corpus side of [[editDistanceAgainstPartitioned]] as a
    * persistable registry — the segment twin of [[edIndex]], and the
    * BETTER registry on low-entropy corpora: a string's segment rows are
    * a pure function of the string alone (no frequency ordering AT ALL),
    * so append-stability needs no hash-order compromise — the committed
    * relation keeps the full selectivity of ≈ len/(maxDist+1)-char
    * segment keys that hash-ordered grams give up (sf1: the gram
    * registry serve ran 188.8 s where segment keys run ~20 s).
    *
    * Schema: (doc_id, len, si, sv, max_dist) — si/sv NULL marks a short
    * string; max_dist stamps the build parameter ([[requireStamp]] —
    * segment schemes are a function of maxDist, so a serve-time
    * mismatch would silently miss pairs).
    */
  def segIndex(corpus: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val nseg = maxDist + 1
    val cb = corpus.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    val longRows = segIndexRows(cb.filter(col("_len") >= nseg), maxDist)
      .select(col("_id").as("doc_id"), col("_li").as("len"),
        col("si"), col("sv"))
    val shortRows = cb.filter(col("_len") < nseg)
      .select(col("_id").as("doc_id"), col("_len").as("len"),
        lit(null).cast("int").as("si"), lit(null).cast("string").as("sv"))
    longRows.unionByName(shortRows)
      .withColumn("max_dist", lit(maxDist))
  }

  /** Build-and-commit [[segIndex]] as a versioned Manifest snapshot. */
  def segIndexRefresh(corpus: DataFrame, table: String, idCol: String,
                      strCol: String, maxDist: Int): Int =
    graft.io.Manifest.write(segIndex(corpus, idCol, strCol, maxDist), table)

  /** Registry MAINTENANCE: append an accepted batch's segment rows —
    * trivially append==rebuild (rows are per-string functions; same
    * maxDist required). `tag` stamps the commit for streaming replay
    * detection (the [[graft.io.Manifest.writeTagged]] contract).
    * Returns the new version. */
  def segIndexUpdate(table: String, accepted: DataFrame, idCol: String,
                     strCol: String, maxDist: Int,
                     tag: Option[String] = None): Int = {
    val spark = accepted.sparkSession
    // value-checked (edIndexUpdate's rationale): a maxDist-3 update on
    // a maxDist-2 registry must fail HERE, not corrupt a version
    val cur = requireStamp(graft.io.Manifest.read(spark, table),
      "ed-segment", "max_dist" -> maxDist)
    val next = cur.unionByName(segIndex(accepted, idCol, strCol, maxDist))
    tag match {
      case Some(t) => graft.io.Manifest.writeTagged(next, table, t)
      case None    => graft.io.Manifest.write(next, table)
    }
  }

  /** Registry DELETE — drop removed ids' rows and commit. */
  def segIndexRetract(table: String, removedIds: DataFrame,
                      idCol: String): Int = {
    val spark = removedIds.sparkSession
    val cur = graft.io.Manifest.read(spark, table)
    requireStampColumns(cur, "ed-segment", Seq("max_dist"))
    graft.io.Manifest.write(
      cur.join(broadcast(removedIds.select(col(idCol).as("doc_id"))),
          Seq("doc_id"), "left_anti")
        .select("doc_id", "len", "si", "sv", "max_dist"),
      table)
  }

  /** [[editDistanceAgainstPartitioned]] served from a persisted
    * [[segIndex]]: only the batch is probed (its own explode); corpus
    * strings are touched exactly for candidate ids. Output identical to
    * the inline form — the oracle is the naive cross statement verbatim.
    */
  def editDistanceAgainstSegIndex(registry0: DataFrame, corpus: DataFrame,
                                  incoming: DataFrame, idCol: String,
                                  strCol: String, maxDist: Int): DataFrame = {
    val registry = requireStamp(registry0, "ed-segment",
      "max_dist" -> maxDist)
    val nseg = maxDist + 1
    val ib = incoming.select(col(idCol).as("_id"), col(strCol).as("_s"),
      length(col(strCol)).as("_len"))
    val iLong = ib.filter(col("_len") >= nseg)
    val iShort = ib.filter(col("_len") < nseg)
    val longCand = registry.filter(col("sv").isNotNull)
      .select(col("doc_id").as("id_corp"), col("len").as("_li"),
        col("si"), col("sv"))
      .join(segProbeRows(iLong, maxDist)
        .select(col("_id").as("id_inc"), col("_li"), col("si"), col("sv"))
        .hint("shuffle_hash"), Seq("_li", "si", "sv"))
      .select("id_inc", "id_corp")
    val cand = longCand.unionByName(asymShortBuckets(
      iShort, iLong,
      registry.select(col("doc_id").as("id_corp"), col("len").as("_len"))
        .distinct(),
      registry.filter(col("sv").isNull)
        .select(col("doc_id").as("id_corp"), col("len").as("_len")),
      maxDist))
    val candCorpus = corpus.join(
      cand.select(col("id_corp").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    asymVerify(cand, ib, candCorpus, idCol, strCol, maxDist)
  }

  /** [[editDistanceAgainst]]'s contract with AUTOMATIC regime selection
    * — [[editDistanceJoinAuto]]'s dispatcher at the ingest form: census
    * the CORPUS side's prefix buckets (the corpus determines gram-bucket
    * skew; the batch only probes them) and fall over to the segment
    * regime past the same candidates-per-string threshold. On the prefix
    * path the censused prefix table is pinned and reused by the join;
    * on the segment path it is unpinned and abandoned (the documented
    * inspection price of not guessing).
    */
  def editDistanceAgainstAuto(corpus: DataFrame, incoming: DataFrame,
                              idCol: String, strCol: String,
                              maxDist: Int, q: Int = 2,
                              maxCandidatesPerString: Double = 64.0): DataFrame = {
    val cp0 = gramPrefix(corpus, idCol, strCol, maxDist, q)
    val cp = cp0.copy(prefix = graft.CacheScope.pin(cp0.prefix))
    if (auditPrefix(cp).candidatesPerString > maxCandidatesPerString) {
      graft.CacheScope.unpin(cp.prefix)
      editDistanceAgainstPartitioned(corpus, incoming, idCol, strCol, maxDist)
    } else
      asymPrefixJoin(cp, corpus, incoming, idCol, strCol, maxDist, q)
  }

  /** Multi-pass SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo,
    * SIGMOD'95) — the third candidate-generation regime for the
    * edit-distance family, next to the gram prefix ([[editDistanceJoin]])
    * and segment pigeonhole ([[editDistanceJoinPartitioned]]): per pass,
    * rows are totally ordered by a sort key (default: the string and its
    * reversal — two passes, so a corrupted head OR tail still sorts the
    * pair together) and every pair within `window` positions is a
    * candidate; the union of all passes' candidates goes through the
    * shared exact verify. DELIBERATELY NOT LOSSLESS: a pair whose
    * difference sits mid-string in both orders can fall outside every
    * window — cost is O(n·w·passes) by construction, INDEPENDENT of gram
    * skew (the regime to reach for when a boilerplate-gram corpus defeats
    * prefix buckets and segment schemes alike), and the recall trade is
    * priced on an eval slice by [[snmRecallEval]], never assumed.
    *
    * Scale shape — the global rank WITHOUT a global window (the repo's
    * §8 rule): rows rank inside key-prefix BLOCKS (a partitioned window;
    * a string prefix is monotone in the full key, so (block, key, id)
    * order IS (key, id) order), block offsets come from one cumulative
    * sum over the tiny ≤|Σ|^blockLen block-census relation (the
    * class-relation window idiom) broadcast back, and the within-window
    * self-join bands global positions into width-`window` buckets (each
    * right row probes its own and its predecessor bucket — the
    * intervalJoin trick, never a nested loop).
    *
    * Output: (id_a, id_b, dist), id_a < id_b — pairs within `maxDist`
    * that sit within `window` positions in AT LEAST ONE pass order (a
    * deterministic pure function of the corpus: ties break by id).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
                              window: Int, maxDist: Int,
                              blockLen: Int = 2): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
    val cand = snmCandidates(base, window, blockLen)
    verifyCandidates(base, cand, maxDist)
  }

  /** The two default pass orders (string, reversed string) unioned —
    * shared by the join and the certificate. */
  private def snmCandidates(base: DataFrame, window: Int,
                            blockLen: Int): DataFrame =
    Seq(col("_s"), reverse(col("_s")))
      .map(k => snmPassCandidates(base, k, window, blockLen))
      .reduce(_ unionByName _)

  /** Per-pair MINIMUM position distance across both pass orders, for
    * pairs within `maxWindow` in at least one — the window-independent
    * quantity behind [[snmWindowSweep]]: a pair is a window-w candidate
    * iff its min distance ≤ w, so ONE position build prices every
    * window in the grid. */
  private def snmPairDists(base: DataFrame, maxWindow: Int,
                           blockLen: Int): DataFrame =
    Seq(col("_s"), reverse(col("_s")))
      .map(k => snmPassDists(base, k, maxWindow, blockLen))
      .reduce(_ unionByName _)
      .groupBy("id_a", "id_b").agg(min(col("_d")).as("_d"))

  /** One pass of [[snmPairDists]]: the banded self-join keeping the
    * position distance. */
  private def snmPassDists(base: DataFrame, key: Column,
                           window: Int, blockLen: Int): DataFrame =
    snmPassJoin(base, key, window, blockLen)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        (col("_rb") - col("_ra")).as("_d"))

  /** One pass: block-partitioned ranks + tiny-offset cumsum → global
    * position, then the banded within-`window` self-join. */
  private def snmPassCandidates(base: DataFrame, key: Column,
                                window: Int, blockLen: Int): DataFrame =
    snmPassJoin(base, key, window, blockLen)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))

  /** The pass's position build + banded self-join, positions kept:
    * (id_x, id_y, _ra, _rb) with 1 ≤ _rb − _ra ≤ window. */
  private def snmPassJoin(base: DataFrame, key: Column,
                          window: Int, blockLen: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val keyed = base.select(col("_id"), key.as("_k"))
      .withColumn("_blk", substring(col("_k"), 1, blockLen))
    val wBlk = org.apache.spark.sql.expressions.Window
      .partitionBy("_blk").orderBy(col("_k"), col("_id"))
    val ranked = keyed.withColumn("_brn", row_number().over(wBlk).cast("long"))
    // block census is ≤ |Σ|^blockLen rows — the cumulative-sum window
    // runs over THAT relation, never the corpus, and broadcasts back
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy("_blk").rowsBetween(Long.MinValue, -1)
    val offsets = keyed.groupBy("_blk").agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum("_c").over(wOff), lit(0L)))
      .select("_blk", "_off")
    val pos = ranked.join(broadcast(offsets), Seq("_blk"))
      .select(col("_id"), (col("_off") + col("_brn")).as("_rn"))
    // |ra - rb| <= window straddles at most adjacent width-`window`
    // buckets: the left row sits in its own bucket, the right row probes
    // its own and its predecessor — equi-join, bounded fan-out
    val a = pos.select(col("_id").as("id_x"), col("_rn").as("_ra"),
      floor(col("_rn") / window).as("_bkt"))
    val b = pos.select(col("_id").as("id_y"), col("_rn").as("_rb"),
      explode(array(floor(col("_rn") / window),
        floor(col("_rn") / window) - 1)).as("_bkt"))
    a.join(b.hint("shuffle_hash"), Seq("_bkt"))
      .filter(col("_rb") - col("_ra") >= 1 && col("_rb") - col("_ra") <= window)
      .select("id_x", "id_y", "_ra", "_rb")
  }

  /** [[snmRecallEval]] over a WINDOW GRID — and cheaper than it looks:
    * pass positions are window-independent, so ONE position build + one
    * banded join at max(windows) prices every window (a pair is a
    * window-w candidate iff its min cross-pass position distance ≤ w),
    * and the exact truth is paid once ([[Dedup.minhashConfigSweep]]'s
    * economics). Read with a recall floor and take the smallest window
    * above it — n_cand is the verify bill the corpus-wide run pays.
    * One row per window: (window, max_dist, n_docs, n_truth, n_cand,
    * n_hit, recall, precision).
    */
  def snmWindowSweep(evalSlice: DataFrame, idCol: String, strCol: String,
                     windows: Seq[Int], maxDist: Int,
                     blockLen: Int = 2): DataFrame = {
    require(windows.nonEmpty, "windows must be non-empty")
    windows.foreach(w => require(w >= 1, s"window must be >= 1, got $w"))
    val base = graft.CacheScope.pin(
      evalSlice.select(col(idCol).as("_id"), col(strCol).as("_s")))
    val truth = graft.CacheScope.pin(base.toDF("doc_a", "s_a")
      .crossJoin(base.toDF("doc_b", "s_b"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(levenshtein(col("s_a"), col("s_b"), maxDist) >= 0)
      .select("doc_a", "doc_b"))
    val dists = graft.CacheScope.pin(
      snmPairDists(base, windows.max, blockLen))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val rows = windows.sorted.map { w =>
      val cand = dists.filter(col("_d") <= w)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      val nHit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nDocs.crossJoin(nTruth).crossJoin(nCand).crossJoin(nHit)
        .select(lit(w).as("window"), lit(maxDist).as("max_dist"),
          col("n_docs"), col("n_truth"), col("n_cand"), col("n_hit"),
          when(col("n_truth") > 0,
            col("n_hit").cast("double") / col("n_truth")).as("recall"),
          when(col("n_cand") > 0,
            col("n_hit").cast("double") / col("n_cand")).as("precision"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Recall certificate for the sorted-neighborhood regime — the
    * [[Dedup.minhashRecallEval]] instrument at the edit-distance family:
    * exact all-pairs Levenshtein truth on a FIXED eval slice vs the
    * two-pass window candidates. SNM is the one candidate regime here
    * with NO losslessness theorem, so this certificate is not a formality
    * — it is the only evidence a (window, passes) config catches the
    * corpus's true pairs, measured BEFORE a corpus-wide run commits.
    * One row: (window, max_dist, n_docs, n_truth, n_cand, n_hit, recall,
    * precision), NULL on empty denominators.
    */
  def snmRecallEval(evalSlice: DataFrame, idCol: String, strCol: String,
                    window: Int, maxDist: Int,
                    blockLen: Int = 2): DataFrame = {
    val base = graft.CacheScope.pin(
      evalSlice.select(col(idCol).as("_id"), col(strCol).as("_s")))
    val truth = base.toDF("doc_a", "s_a")
      .crossJoin(base.toDF("doc_b", "s_b"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(levenshtein(col("s_a"), col("s_b"), maxDist) >= 0)
      .select("doc_a", "doc_b")
    val cand = snmCandidates(base, window, blockLen)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .distinct()
    val truthHit = truth
      .join(cand.withColumn("is_cand", lit(1)),
        Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("is_cand")).as("n_hit"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    nDocs.crossJoin(truthHit).crossJoin(nCand)
      .select(lit(window).as("window"), lit(maxDist).as("max_dist"),
        col("n_docs"), col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth")).as("recall"),
        when(col("n_cand") > 0,
          col("n_hit").cast("double") / col("n_cand")).as("precision"))
  }
}
