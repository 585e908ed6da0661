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
    * both engines decide identically.
    */
  def domainDecisions(stats: DataFrame,
                      maxDupRatio: Double = 0.5,
                      minAvgQuality: Double = 0.0,
                      blocklist: Seq[String] = Nil,
                      allowlist: Seq[String] = Nil): DataFrame = {
    val blocked =
      if (blocklist.isEmpty) lit(false) else col("domain").isin(blocklist: _*)
    val allowed =
      if (allowlist.isEmpty) lit(false) else col("domain").isin(allowlist: _*)
    stats.select(col("domain"),
      when(blocked, lit("blocklist"))
        .when(allowed, lit("allowlist"))
        .when(col("dup_ratio") > maxDupRatio, lit("dup_ratio"))
        .when(col("avg_quality") < minAvgQuality, lit("quality"))
        .otherwise(lit("ok")).as("reason"))
      .withColumn("allowed",
        col("reason").isin("allowlist", "ok"))
      .select(col("domain"), col("allowed"), col("reason"))
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
