package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.text.TextFns.tokens

/** Domain-grain curation (r17) — the gate real web pipelines (C4,
  * RefinedWeb) run BEFORE any content pass: extract each document's
  * registrable domain from its URL, roll the existing per-doc signals
  * up to the domain grain, decide per-domain keep/drop once, and serve
  * that decision table at ingest. The point of the grain: a mirror
  * farm or SEO spam network is one DOMAIN decision, not a million
  * per-document classifier calls — and the decision table is a
  * dim-sized relation a 1000-executor ingest broadcast-joins for free.
  *
  * Scope of the suffix handling, stated honestly: registrable domain
  * ("eTLD+1") needs the public suffix list. This implementation ships
  * a SUBSET — the multi-label suffixes in [[DefaultTwoLabelSuffixes]]
  * (all two-label; the list is a compile-time literal, so matching is
  * a codegen'd IN, no shuffle, no UDF) — and applies the PSL's
  * prevailing-`*` rule to everything else (unknown TLD ⇒ eTLD is the
  * last label). Wildcard (`*.ck`) and exception (`!www.ck`) rules are
  * out of scope. At full-PSL scale (~9k suffixes) the same algorithm
  * runs as a broadcast join against a suffix dim keyed by the host's
  * candidate suffixes; the subset keeps the whole path expressible in
  * the SQL oracle.
  */
object Domains {

  /** Multi-label public suffixes recognized by [[registrableDomain]] —
    * the high-traffic two-label entries. A compile-time literal by
    * design: see the object scaladoc for the full-PSL scale path.
    */
  val DefaultTwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.ar", "co.za")

  /** The URL's lowercased host: scheme stripped, authority cut at the
    * first `/ ? #`, userinfo stripped, port stripped. Pure regex —
    * codegen'd, and replayed verbatim by the oracle.
    */
  def hostOf(url: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(
        regexp_replace(url, "^[a-z][a-zA-Z0-9+.-]*://", ""),
        "^([^/?#]*)", 1),
      "^.*@", ""), ":\\d+$", ""))

  /** The registrable domain ("eTLD+1") of `url` under the suffix
    * subset: IPv4 literals and dotless bare hosts gate as themselves
    * (an IP mirror is still one domain decision); a host that IS a
    * public suffix returns itself; otherwise the label left of the
    * matched suffix joins it. CASE branches evaluate lazily, so the
    * negative label indexing never runs on too-short hosts.
    */
  def registrableDomain(
      url: Column,
      twoLabelSuffixes: Seq[String] = DefaultTwoLabelSuffixes): Column = {
    val host = hostOf(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val isIp = host.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$")
    when(isIp || n <= 1, host)
      .when(last2.isin(twoLabelSuffixes: _*),
        when(n >= 3, last3).otherwise(host))
      .otherwise(last2)
  }

  /** Full public-suffix-list rule set for [[withRegistrableDomainPsl]]
    * (r17) — the scale path the [[registrableDomain]] scaladoc
    * documents: PSL syntax verbatim, including the rule kinds the
    * literal-IN subset declares out of scope. `name.tld` is a normal
    * rule, `*.parent` a wildcard (matches exactly one extra label),
    * `!host` an exception (the host is registrable even though a
    * wildcard covers it). The default promotes the two-label subset to
    * rules and adds the PSL's canonical wildcard/exception families
    * (`*.ck`/`!www.ck`, `*.kawasaki.jp`/`!city.kawasaki.jp`) plus a
    * three-label suffix (`k12.ma.us`) so every rule kind and depth is
    * live; a production deployment passes the ~9k-entry published list
    * through the same parser.
    */
  val DefaultPslRules: Seq[String] =
    DefaultTwoLabelSuffixes ++ Seq(
      "k12.ma.us", "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp")

  /** PSL rules parsed to joinable dim rows
    * (join_key, is_exception, matched_labels, ps_labels): normal and
    * exception rules key on the full matched suffix (`s:` prefix),
    * wildcards on their parent (`w:` prefix) because the candidate that
    * matches `*.parent` is any (parent_labels+1)-label suffix whose
    * tail IS the parent. `ps_labels` is the public-suffix length the
    * rule implies when it prevails — the matched length, except an
    * exception rule, which declares its own match registrable (public
    * suffix = the match minus its leftmost label, PSL semantics).
    */
  def parsedPslRules(rules: Seq[String]): Seq[(String, Int, Int, Int)] =
    rules.map { r =>
      val parsed =
        if (r.startsWith("!")) {
          val s = r.stripPrefix("!"); val ml = s.count(_ == '.') + 1
          (s"s:$s", 1, ml, ml - 1)
        } else if (r.startsWith("*.")) {
          val p = r.stripPrefix("*."); val ml = p.count(_ == '.') + 2
          (s"w:$p", 0, ml, ml)
        } else {
          val ml = r.count(_ == '.') + 1
          (s"s:$r", 0, ml, ml)
        }
      require(parsed._3 >= 2, s"PSL rule too short: $r")
      parsed
    }

  private val Ipv4HostRe = "^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$"

  /** The (host → registrable domain) relation for every distinct host
    * in `df.urlCol` under the FULL PSL algorithm: candidate suffixes of
    * each host (lengths 2..max rule depth) equi-join the broadcast rule
    * dim on their `s:`/`w:` keys; the prevailing rule is the PSL's —
    * any exception beats any other match, else most labels — taken as
    * one max over a (is_exception, matched_labels, ps_labels) struct;
    * hosts no rule matches fall to the prevailing `*` default (last
    * label is the suffix). IPv4 literals and dotless hosts map to
    * themselves, and a host that IS a suffix returns itself, exactly
    * [[registrableDomain]]'s conventions.
    *
    * Scale: the intermediate is HOST-cardinality, not corpus-
    * cardinality — one distinct on the host, ≤ (maxDepth−1)·2 candidate
    * keys per host against a broadcast dim of |rules| rows, and a
    * host-keyed combinable max. No corpus-sized shuffle beyond the
    * distinct, which a 100 TB ingest amortizes across every downstream
    * domain consumer.
    */
  def pslDomainMap(df: DataFrame, urlCol: String = "url",
                   rules: Seq[String] = DefaultPslRules): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parsed = parsedPslRules(rules)
    val maxL = parsed.map(_._3).max
    val ruleDf = parsed.toDF("r_key", "r_exc", "r_ml", "r_psl")
    val hosts = df
      .select(hostOf(col(urlCol)).as("host")).distinct()
      .withColumn("ls", split(col("host"), "\\."))
      .withColumn("n", size(col("ls")))
      .withColumn("is_ip", col("host").rlike(Ipv4HostRe))
    val cand = hosts
      .filter(!col("is_ip") && col("n") >= 2)
      .withColumn("keys", flatten(transform(
        sequence(lit(2), least(col("n"), lit(maxL))),
        i => array(
          concat(lit("s:"), array_join(slice(col("ls"), -i, i), ".")),
          concat(lit("w:"),
            array_join(slice(col("ls"), lit(1) - i, i - lit(1)), "."))))))
      .select(col("host"), explode(col("keys")).as("key"))
    val prevailing = cand
      .join(broadcast(ruleDf), col("key") === col("r_key"))
      .groupBy("host")
      .agg(max(struct(col("r_exc"), col("r_ml"), col("r_psl"))).as("p"))
      .select(col("host"), col("p.r_psl").as("psl"))
    hosts.join(prevailing, Seq("host"), "left")
      .withColumn("eff", coalesce(col("psl"), lit(1)))
      .select(col("host"),
        when(col("is_ip") || col("n") <= 1, col("host"))
          .when(col("n") > col("eff"),
            array_join(
              slice(col("ls"), -(col("eff") + lit(1)), col("eff") + lit(1)),
              "."))
          .otherwise(col("host")).as("domain"))
  }

  /** `df` + a `domain` column under the full-PSL rules — the drop-in
    * upgrade of `withColumn("domain", registrableDomain(url))` for
    * deployments carrying the published list. The host→domain map is
    * host-cardinality (see [[pslDomainMap]]); the back-join keys on the
    * host and broadcasts whenever the map is dim-sized.
    */
  def withRegistrableDomainPsl(df: DataFrame, urlCol: String = "url",
                               rules: Seq[String] = DefaultPslRules): DataFrame = {
    val dom = pslDomainMap(df, urlCol, rules)
      .withColumnRenamed("host", "__psl_host")
    df.withColumn("__psl_host", hostOf(col(urlCol)))
      .join(dom, Seq("__psl_host"), "left")
      .drop("__psl_host")
  }

  /** Per-domain corpus health — [[TextStats.sourceStats]] re-keyed to
    * the registrable domain of `urlCol`: document and token volume,
    * mean quality through the exact-decimal sum policy, and the
    * exact-duplicate rate (non-minimum members of CORPUS-wide
    * fingerprint groups, so a domain mirroring another domain's
    * content is charged for it — the cross-domain mirror signal the
    * source grain cannot see). Scale: one window shuffle on the
    * fingerprint, one doc_id join, one domain-cardinality aggregate —
    * all map-side combinable.
    */
  def domainStats(documents: DataFrame, urlCol: String = "url",
                  twoLabelSuffixes: Seq[String] =
                    DefaultTwoLabelSuffixes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextStats.qualityScore(documents)
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("fp")
    val flagged = documents
      .select(col("doc_id"),
        registrableDomain(col(urlCol), twoLabelSuffixes).as("domain"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5(lower(col("text"))).as("fp"))
      .withColumn("is_drop",
        count(lit(1)).over(w) > 1 && col("doc_id") =!= min("doc_id").over(w))
    val nDrop = sum(when(col("is_drop"), 1L).otherwise(0L))
    flagged.join(scored, "doc_id")
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(graft.dec6(col("quality_score"))).cast("double") /
          count(lit(1))).as("avg_quality"),
        nDrop.as("n_dup_docs"),
        (nDrop.cast("double") / count(lit(1))).as("dup_ratio"))
  }

  /** Fold a [[domainStats]] relation into ONE keep/drop decision per
    * domain — (domain, allowed, reason), precedence blocklist >
    * allowlist > dup-ratio threshold > quality threshold (first match
    * names the reason, so the table doubles as the audit). The lists
    * are exact registrable domains (operator-curated); the thresholds
    * act on the rolled-up signals, which are hash-stable doubles, so
    * both engines decide identically. List entries ABSENT from the
    * stats still receive their row (r17): a curated blocklist must
    * bind before the domain is ever crawled — without this, a
    * never-seen blocked domain would ride [[domainGateWith]]'s
    * unknown-domain-kept rule straight through the gate.
    */
  def domainDecisions(stats: DataFrame,
                      maxDupRatio: Double = 0.5,
                      minAvgQuality: Double = 0.0,
                      blocklist: Seq[String] = Nil,
                      allowlist: Seq[String] = Nil): DataFrame = {
    val spark = stats.sparkSession
    import spark.implicits._
    val blocked =
      if (blocklist.isEmpty) lit(false) else col("domain").isin(blocklist: _*)
    val allowed =
      if (allowlist.isEmpty) lit(false) else col("domain").isin(allowlist: _*)
    val fromStats = stats.select(col("domain"),
      when(blocked, lit("blocklist"))
        .when(allowed, lit("allowlist"))
        .when(col("dup_ratio") > maxDupRatio, lit("dup_ratio"))
        .when(col("avg_quality") < minAvgQuality, lit("quality"))
        .otherwise(lit("ok")).as("reason"))
      .withColumn("allowed",
        col("reason").isin("allowlist", "ok"))
      .select(col("domain"), col("allowed"), col("reason"))
    def unseen(entries: Seq[String], keep: Boolean, reason: String) =
      entries.toDF("domain")
        .join(stats.select("domain"), Seq("domain"), "left_anti")
        .select(col("domain"), lit(keep).as("allowed"),
          lit(reason).as("reason"))
    fromStats
      .unionByName(unseen(blocklist, keep = false, "blocklist"))
      .unionByName(unseen(allowlist, keep = true, "allowlist"))
  }

  /** Build-and-commit the domain decision table as a versioned
    * Manifest snapshot (the quantileGateWith serve posture: decide
    * once per corpus snapshot, gate every ingest batch against the
    * committed version). Returns the version.
    */
  def domainRefresh(documents: DataFrame, table: String,
                    urlCol: String = "url",
                    maxDupRatio: Double = 0.5,
                    minAvgQuality: Double = 0.0,
                    blocklist: Seq[String] = Nil,
                    allowlist: Seq[String] = Nil): Int =
    graft.io.Manifest.write(
      domainDecisions(domainStats(documents, urlCol), maxDupRatio,
        minAvgQuality, blocklist, allowlist), table)

  /** Per-domain share cap (r17) — RefinedWeb/C4's anti-monoculture
    * resample: no registrable domain may contribute more than ~`cap`
    * documents in expectation, so an SEO farm or wiki mirror cannot
    * dominate the mixture however large it crawls. Each row keeps with
    * probability `min(1, cap / n_domain_docs)`, decided by the stable
    * md5 uniform of [[Corpus.weightedSample]] — stable under corpus
    * growth ONLY through the rate (a domain that doubles halves its
    * rate; kept ids within a rate are order- and partition-independent),
    * engine-portable, and shuffle-free at decision time. Output: the
    * input plus `domain`, `n_domain_docs`, `keep_rate`, `sample_u`,
    * `is_sampled` (flag form — filter on it for the sample; the flag
    * keeps audits and oracles row-count stable).
    *
    * Scale: one domain-keyed combinable count (domain-cardinality
    * result, broadcast back), then a map-side decision in the scan — no
    * corpus-sized shuffle, no coordination state, the
    * [[domainGateWith]] ingest posture.
    */
  def domainCapResample(df: DataFrame, cap: Long, urlCol: String = "url",
                        idCol: String = "doc_id", salt: String = "dcap",
                        twoLabelSuffixes: Seq[String] =
                          DefaultTwoLabelSuffixes): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val withDom = df.withColumn("domain",
      registrableDomain(col(urlCol), twoLabelSuffixes))
    val counts = withDom.groupBy("domain")
      .agg(count(lit(1)).as("n_domain_docs"))
    val rated = withDom.join(broadcast(counts), Seq("domain"))
      .withColumn("keep_rate",
        least(lit(1.0), lit(cap.toDouble) / col("n_domain_docs")))
    Corpus.weightedSample(rated, "keep_rate", idCol, salt)
  }

  /** Gate documents through a served decision table: keep rows whose
    * registrable domain is allowed — or UNKNOWN to the table (the gate
    * blocks known-bad domains; a domain the snapshot never scored must
    * not be silently dropped, it has no evidence against it). The
    * decision table is domain-cardinality — a broadcastable dim at any
    * corpus scale, so the gate adds no shuffle to ingest.
    */
  def domainGateWith(documents: DataFrame, decisions: DataFrame,
                     urlCol: String = "url",
                     twoLabelSuffixes: Seq[String] =
                       DefaultTwoLabelSuffixes): DataFrame = {
    val withDom = documents.withColumn("domain",
      registrableDomain(col(urlCol), twoLabelSuffixes))
    withDom.join(
      broadcast(decisions.select(col("domain"), col("allowed"))),
      Seq("domain"), "left")
      .filter(col("allowed").isNull || col("allowed"))
      .drop("allowed")
  }
}
